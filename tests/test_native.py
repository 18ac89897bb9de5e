"""Native extension parity tests (native/*.cpp vs numpy references)."""

import numpy as np
import pytest


def _numpy_unpack(out, rh, rw, with_depth):
    """Force FastTrainer._unpack_frame_yuv420 down its numpy fallback."""
    from unittest import mock
    from sealdnerf_tpu.train.fast import FastTrainer
    with mock.patch("sealdnerf_tpu.utils.native.load_frames",
                    side_effect=RuntimeError("forced fallback")):
        return FastTrainer._unpack_frame_yuv420(out, rh, rw, with_depth)


@pytest.mark.parametrize("with_depth", [True, False])
def test_frame_decode_parity(with_depth):
    """frames.cpp yuv420_to_rgb must match the numpy reference decode
    bit-for-bit-ish (<= 1 ulp of f32 math reordering) on random wires."""
    from sealdnerf_tpu.utils.native import load_frames
    rh = rw = 32
    n, q = rh * rw, (rh // 2) * (rw // 2)
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, n + 2 * q, dtype=np.uint8)
    if with_depth:
        dep16 = rng.uniform(0, 8, q).astype(np.float16)
        raw = np.concatenate([raw, dep16.view(np.uint8)])

    rgb_c, dep_c = load_frames().yuv420_to_rgb(raw, rh, rw, int(with_depth))
    rgb_np, dep_np = _numpy_unpack(raw, rh, rw, with_depth)

    assert rgb_c.shape == (rh, rw, 3) and rgb_c.dtype == np.float32
    np.testing.assert_allclose(rgb_c, rgb_np, atol=1e-6)
    if with_depth:
        np.testing.assert_allclose(dep_c, dep_np, atol=0)
        assert dep_c.shape == (rh, rw)
    else:
        assert dep_c is None and dep_np is None


def test_frame_decode_f16_specials():
    """Half->float covers subnormals and zero (depth wires are f16)."""
    from sealdnerf_tpu.utils.native import load_frames
    rh = rw = 2
    n, q = rh * rw, 1
    vals = np.array([6e-8], dtype=np.float16)  # subnormal
    raw = np.concatenate([np.zeros(n + 2 * q, np.uint8),
                          vals.view(np.uint8)])
    _, dep = load_frames().yuv420_to_rgb(raw, rh, rw, 1)
    np.testing.assert_allclose(dep[0, 0], float(vals[0]), rtol=1e-3)

    raw = np.concatenate([np.zeros(n + 2 * q, np.uint8),
                          np.zeros(1, np.float16).view(np.uint8)])
    _, dep = load_frames().yuv420_to_rgb(raw, rh, rw, 1)
    assert dep[0, 0] == 0.0
