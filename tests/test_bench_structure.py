"""Structure tests for bench.py's timeout-proofing (VERDICT r3 weak #1:
BENCH_r03.json was rc=124/parsed=null because the single JSON line only
printed at the very end). These verify, without any real training, that:

- a cumulative JSON line is emitted after EVERY section (so a driver
  timeout loses at most the section in flight),
- a failing section does not suppress emission or later sections,
- the payload is well-formed (parseable, stable keys) even when every
  section is skipped/empty.
"""

import json

import pytest

import bench


def _emitted_lines(capsys):
    out = capsys.readouterr().out.strip().splitlines()
    return [json.loads(ln) for ln in out if ln.strip()]


def test_emission_after_every_section_and_failure_isolation(
        monkeypatch, capsys):
    monkeypatch.setattr(bench, "bench_static", lambda sys, dl: dict(
        rays_per_sec=1.0e5, steps_per_sec=24.0, warmup_s=40.0, psnr=29.0,
        ssim=0.95, psnr_cp_800=27.0, psnr_steps=3000))
    def boom(sys, dl):
        raise RuntimeError("boom")
    monkeypatch.setattr(bench, "bench_bound2", boom)
    monkeypatch.setattr(bench, "run_dyn", lambda *a, **k: dict(
        rate=2.0e5, best=22.3, t20=60.0, t_target=120.0, psnr_2048=22.1,
        steps=2048, diverged=False))
    monkeypatch.setattr(bench, "bench_oracle",
                        lambda sys, dl, target_steps=None: dict(
                            psnr_ngp_800=27.7, oracle_steps=800))
    monkeypatch.setattr(bench, "bench_dynoracle", lambda sys, dl: dict(
        psnr=23.5, steps=2048, n_views=4))
    monkeypatch.setattr(
        "sealdnerf_tpu.data.synthetic.make_synthetic_scene",
        lambda *a, **k: (None, None, None))

    bench.main()
    lines = _emitted_lines(capsys)
    assert len(lines) == 6, "one cumulative line per section"

    # line 1: static only; dynamic fields still null but keys present
    assert lines[0]["value"] == pytest.approx(1.0e5)
    assert lines[0]["vs_baseline"] == pytest.approx(
        1.0e5 / bench.BASELINE_TRAIN_RAYS_PER_SEC, abs=1e-3)
    assert lines[0]["aux"]["dnerf_best_psnr"] is None

    # line 2: bound-2 raised -> its fields stay null, static preserved
    assert lines[1]["aux"]["bound2_rays_per_sec"] is None
    assert lines[1]["value"] == pytest.approx(1.0e5)

    # lines 3-6: dynamic + mono + oracle + dyn-oracle accumulate (the
    # oracle runs LAST among driver-window sections: its band-eval
    # compile can stall unboundedly on a cold host, see SECTION_ORDER)
    assert lines[2]["aux"]["dnerf_psnr_at_2048_steps"] == pytest.approx(
        22.1)
    assert lines[3]["aux"]["dnerf_monocular_best_psnr"] == pytest.approx(
        22.3)
    assert lines[3]["aux"]["psnr_ngp_oracle_band"] is None
    assert lines[4]["aux"]["psnr_ngp_oracle_band"] == pytest.approx(27.7)
    assert lines[5]["aux"]["dnerf_oracle_psnr_band"] == pytest.approx(23.5)
    # the final (last-wins) line carries everything that completed
    assert lines[5]["aux"]["psnr_at_3000_steps_hard_scene"] == \
        pytest.approx(29.0)
    assert lines[5]["aux"]["dnerf_diverged"] is False


def test_zero_budget_still_emits_parseable_lines(monkeypatch, capsys):
    """With no budget left every section is skipped, but each emitted
    line must still parse with the full key schema (value null)."""
    monkeypatch.setattr(bench, "TOTAL_BUDGET_S", 0.0)
    bench.main()
    lines = _emitted_lines(capsys)
    assert len(lines) == 6
    for ln in lines:
        assert ln["metric"] == "train_rays_per_sec_per_chip"
        assert ln["value"] is None
        assert "dnerf_monocular_psnr_at_2048_steps" in ln["aux"]


def test_dyn_oracle_artifact_surfaced_when_section_skipped(monkeypatch):
    """Driver-window runs never reach the dyn-oracle section (~25 min of
    hash-gather training); the payload must surface the committed
    artifact under *_artifact keys, and a LIVE section result must take
    precedence over the artifact."""
    monkeypatch.setattr(bench, "_dyn_oracle_artifact",
                        lambda: dict(psnr=23.41, steps=2048, n_views=4))
    p = bench._payload({}, {}, {}, {}, {}, {})
    assert p["aux"]["dnerf_oracle_psnr_band"] is None
    assert p["aux"]["dnerf_oracle_psnr_band_artifact"] == pytest.approx(
        23.41)
    assert p["aux"]["dnerf_oracle_steps_artifact"] == 2048

    live = dict(psnr=22.9, steps=1024, n_views=2)
    p = bench._payload({}, {}, {}, {}, {}, live)
    assert p["aux"]["dnerf_oracle_psnr_band"] == pytest.approx(22.9)
    assert p["aux"]["dnerf_oracle_psnr_band_artifact"] == pytest.approx(
        22.9)
    assert p["aux"]["dnerf_oracle_steps_artifact"] == 1024


def test_cp_at_picks_largest_step_not_above_oracle_stop():
    """The CP-vs-NGP comparison must never score CP from MORE steps than
    the oracle ran (the round-4 payload compared CP@1024 to NGP@800
    under a key that said 800 for both)."""
    st = dict(psnr_cp_band_curve={"384": 22.0, "1024": 26.5, "1152": 27.0})
    assert bench._cp_at(st, dict(oracle_steps=1024)) == (26.5, 1024)
    assert bench._cp_at(st, dict(oracle_steps=1000)) == (22.0, 384)
    assert bench._cp_at(st, dict(oracle_steps=200)) == (None, None)
    assert bench._cp_at({}, dict(oracle_steps=800)) == (None, None)
    assert bench._cp_at(st, {}) == (None, None)


def test_dyn_oracle_artifact_missing_file_is_empty(tmp_path, monkeypatch):
    monkeypatch.setattr(bench.os.path, "dirname",
                        lambda p: str(tmp_path))
    assert bench._dyn_oracle_artifact() == {}


def test_deadline_over_and_remaining():
    dl = bench.Deadline(1e6)
    assert not dl.over()
    assert dl.remaining() > 1e5
    dl = bench.Deadline(-1.0)
    assert dl.over()


def test_band_view_crop_matches_full_render_rows():
    """bench's center-band eval (cy-shifted intrinsics) must render
    exactly the same pixels as the corresponding rows of the full
    render -- the NGP-oracle PSNR anchor is scored on this band."""
    import jax
    from sealdnerf_tpu.data.synthetic import make_synthetic_scene
    from sealdnerf_tpu.models.cp import CPConfig, make_cp_field
    from sealdnerf_tpu.train.trainer import TrainOptions
    from sealdnerf_tpu.train.fast import FastTrainer
    import numpy as np

    _, train, val = make_synthetic_scene(n_train=2, n_val=1, res=64)
    opt = TrainOptions(iters=8, num_rays=256, bound=1.0, dt_gamma=0.0,
                       grid_size=32, march_res=16, n_intervals=4,
                       steps_per_interval=2, segment_steps=4,
                       workspace="/tmp/band_ws")
    field = make_cp_field(jax.random.PRNGKey(0),
                          CPConfig(bound=1.0, scales=((16, 4),), planes=()))
    tr = FastTrainer("cp", opt, field, workspace="/tmp/band_ws",
                     use_checkpoint="scratch")
    tr.mark_untrained_grid(train.poses, train.intrinsics)
    full, _ = tr.render_image(val.poses[0], val.intrinsics, val.h, val.w)

    import bench
    bench_rows = bench.BAND_ROWS
    try:
        bench.BAND_ROWS = (16, 48)  # scale the band to the 64px test view
        pose, intr, bh, bw = bench._band_view(val)
        band, _ = tr.render_image(pose, intr, bh, bw)
        gt_band = bench._band_gt(val)
    finally:
        bench.BAND_ROWS = bench_rows
    assert gt_band.shape[0] == 32
    np.testing.assert_allclose(np.asarray(band),
                               np.asarray(full)[16:48], atol=2e-3)
