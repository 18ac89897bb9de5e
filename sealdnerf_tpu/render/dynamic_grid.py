"""Time-conditioned occupancy grid (D-NeRF).

Parity with reference dnerf/renderer.py:61-105, 453-555:
- density grid grows a leading time axis: [T=64, CAS, H^3]; per-render the
  slice t = floor(time * T) is used (dnerf/renderer.py:285).
- update sweeps every time bin with time-perturbed density queries
  (+-0.5/T, :490-497); full sweeps for the first 16 updates, partial until
  update #100, then frozen (:465-501 -- "just update 100 times should be
  enough").
- same EMA max / mean-density threshold / per-slice packbits semantics.

Partial updates draw uniform random cells (same deviation as the static grid,
see grid.py docstring).
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.marching import MarchConfig
from .grid import GridConfig, _cell_coords, _cas_bound


@dataclass(frozen=True)
class DynGridConfig:
    march: MarchConfig
    time_size: int = 64
    density_thresh: float = 0.01
    density_scale: float = 1.0
    decay: float = 0.95
    freeze_after: int = 100   # full-grid passes before freezing (reference)

    @property
    def freeze_calls(self) -> int:
        """Update CALLS before freezing. The reference's 100-update freeze
        (dnerf/renderer.py:465-501) counts full 64-bin sweeps; a
        round-robin call covers only bins_per_call bins, so the call
        threshold scales by time_size/bins_per_call (round-1/2 bug:
        freezing at 100 raw calls froze the grid at ~12 passes with
        warmup-quality occupancy and capped dynamic PSNR)."""
        import math
        return self.freeze_after * max(
            1, math.ceil(self.time_size / self.bins_per_call))
    bins_per_call: int = 8    # time bins refreshed per update call: the
    # reference sweeps all 64 bins per update (dnerf/renderer.py:471); on TPU
    # that graph is ~130M field queries -- it OOMs/crashes the worker and
    # would stall training for minutes. Round-robin over bins_per_call bins
    # per call at a proportionally shorter interval gives identical coverage
    # per step with bounded memory.

    @property
    def cascades(self):
        return self.march.cascades

    @property
    def grid_size(self):
        return self.march.grid_size

    @property
    def bound(self):
        return self.march.bound

    def static_view(self) -> GridConfig:
        return GridConfig(march=self.march, density_thresh=self.density_thresh,
                          density_scale=self.density_scale, decay=self.decay)


def init_dyn_grid_state(cfg: DynGridConfig):
    h3 = cfg.grid_size ** 3
    return {
        "density_grid": jnp.zeros((cfg.time_size, cfg.cascades, h3),
                                  dtype=jnp.float32),
        "occ": jnp.zeros((cfg.time_size, cfg.cascades) +
                         (cfg.grid_size,) * 3, dtype=bool),
        "mean_density": jnp.zeros((), dtype=jnp.float32),
        "iter_density": jnp.zeros((), dtype=jnp.int32),  # completed passes
        "bin_cursor": jnp.zeros((), dtype=jnp.int32),
    }


def grid_times(cfg: DynGridConfig):
    """Bin-center times, (arange(T) + 0.5) / T (dnerf/renderer.py:98)."""
    return (jnp.arange(cfg.time_size, dtype=jnp.float32) + 0.5) / cfg.time_size


def time_slice_index(time, cfg: DynGridConfig):
    """t = clamp(floor(time * T), 0, T-1) (dnerf/renderer.py:285)."""
    t = jnp.floor(jnp.reshape(time, ()) * cfg.time_size)
    return jnp.clip(t, 0, cfg.time_size - 1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("cfg",))
def mark_untrained_dyn_grid(state, poses, intrinsics, cfg: DynGridConfig):
    """Static camera-coverage mask broadcast over the time axis
    (dnerf/renderer.py:449: count expanded over T)."""
    from .grid import mark_untrained_grid, init_grid_state
    scfg = cfg.static_view()
    s = init_grid_state(scfg)
    s = mark_untrained_grid(s, poses, intrinsics, scfg)
    untrained = s["density_grid"] < 0  # [CAS, H^3]
    grid = jnp.where(untrained[None], -1.0, state["density_grid"])
    return {**state, "density_grid": grid}


def _query_chunked_t(density_fn, params, xyzs, t, chunk=2 ** 15):
    n = xyzs.shape[0]
    chunk = min(chunk, n)
    pad = (-n) % chunk
    x = jnp.concatenate([xyzs, jnp.zeros((pad, 3), xyzs.dtype)], axis=0)
    x = x.reshape(-1, chunk, 3)
    sig = jax.lax.map(lambda c: density_fn(params, c, t)[0], x)
    return sig.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("density_fn", "cfg", "full"))
def update_dyn_density_grid(state, params, density_fn, rng,
                            cfg: DynGridConfig, full: bool):
    """Refresh the next `bins_per_call` time bins of the [T, CAS, H^3] grid
    (round-robin over the bin cursor; see DynGridConfig.bins_per_call).

    density_fn(params, x, t) -> (sigma, ...). `full` sweeps every cell of the
    selected bins; otherwise H^3/2 random cells per bin. Freezing after
    `freeze_after` completed passes is the caller's (trainer's) job.
    """
    h = cfg.grid_size
    h3 = h ** 3
    nb = min(cfg.bins_per_call, cfg.time_size)
    grid = state["density_grid"]
    half_time = 0.5 / cfg.time_size
    cursor = state["bin_cursor"]
    bin_ids = (cursor + jnp.arange(nb)) % cfg.time_size  # [nb]
    times = (bin_ids.astype(jnp.float32) + 0.5) / cfg.time_size
    rngs = jax.random.split(rng, nb)

    if full:
        n_pts = h3
        base_coords = _cell_coords(cfg.static_view())
    else:
        n_pts = h3 // 2
        base_coords = None

    def one_bin(args):
        t, key = args
        tmp_bin = jnp.full((cfg.cascades, h3), -1.0)
        for cas in range(cfg.cascades):
            key, kc, k1, k2 = jax.random.split(key, 4)
            if full:
                coords = base_coords
                indices = jnp.arange(h3, dtype=jnp.int32)
            else:
                coords = jax.random.randint(kc, (n_pts, 3), 0, h,
                                            dtype=jnp.int32)
                indices = (coords[:, 0] * h + coords[:, 1]) * h + \
                    coords[:, 2]
            bound = _cas_bound(cfg.static_view(), cas)
            half = bound / h
            xyz01 = 2.0 * coords.astype(jnp.float32) / (h - 1) - 1.0
            noise = (jax.random.uniform(k1, (n_pts, 3)) * 2 - 1) * half
            tq = t + (jax.random.uniform(k2, ()) * 2 - 1) * half_time
            pts = xyz01 * (bound - half) + noise
            sig = _query_chunked_t(density_fn, params, pts, tq)
            tmp_bin = tmp_bin.at[cas, indices].set(sig * cfg.density_scale)
        return tmp_bin

    tmp = jax.lax.map(one_bin, (times, rngs))  # [nb, CAS, H^3]

    old = grid[bin_ids]  # [nb, CAS, H^3]
    valid = (old >= 0) & (tmp >= 0)
    new = jnp.where(valid, jnp.maximum(old * cfg.decay, tmp), old)
    grid = grid.at[bin_ids].set(new)

    mean_density = jnp.mean(jnp.clip(grid, 0.0, None))
    thresh = jnp.minimum(mean_density, cfg.density_thresh)
    occ = (grid > thresh).reshape(
        (cfg.time_size, cfg.cascades) + (h,) * 3)
    new_cursor = (cursor + nb) % cfg.time_size
    passes = state["iter_density"] + ((cursor + nb) // cfg.time_size)
    return {
        "density_grid": grid,
        "occ": occ,
        "mean_density": mean_density,
        "iter_density": passes,
        "bin_cursor": new_cursor,
    }
