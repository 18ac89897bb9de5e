"""Fast scatter-add for embedding-table gradients.

XLA's TPU scatter runs at ~12M updates/s flat (measured on v5e; sortedness /
uniqueness / dtype flags change nothing) -- it serializes per update row. The
hash-encoder backward needs ~25M updates/step, i.e. ~2s/step: the single
dominant cost of training.

`sorted_chunk_scatter_add` replaces it with a sort-and-accumulate scheme that
never executes an XLA scatter:

1. sort updates by table index (TPU sort: 25M keys in ~94ms), carrying the
   payload columns through lax.sort's multi-operand path (no reorder gather).
2. scan over fixed-size update chunks; each chunk, being sorted, spans a
   narrow contiguous index range (~ table_size * chunk/num_updates rows).
   The chunk's partial histogram over a padded [span] window is computed as a
   one-hot matmul (MXU work, no scatter), then added into the dense gradient
   carried through the scan with a dynamic-update-slice (contiguous write).

Chunks whose updates straddle the window edge are handled by sizing the
window to 2x the expected span and clamping: indices beyond the window are
redirected to the overflow row of a small spill buffer and handled by a final
(tiny) true scatter. With hash-style uniformly distributed indices the spill
is ~0.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("table_rows", "chunk", "window",
                                   "force_histogram"))
def sorted_chunk_scatter_add(idx, vals, table_rows: int, chunk: int = 4096,
                             window: int = 0,
                             force_histogram: bool = False):
    """Compute zeros([table_rows, C]).at[idx].add(vals) without XLA scatter.

    Args:
      idx: [M] int32 indices in [0, table_rows).
      vals: [M, C] float updates.
      table_rows: static output row count.
      chunk: updates per scan step.
      window: dense window rows per chunk (0 -> auto: next multiple of 256 of
        4x the mean span). Updates falling outside their chunk's window go
        through a small fallback scatter at the end.

    Returns [table_rows, C] float32.
    """
    m, c = vals.shape
    # The histogram path is a TPU optimization; on CPU/GPU the native XLA
    # scatter is already fast (and the chunked one-hot matmuls are not).
    if jax.default_backend() != "tpu" and not force_histogram:
        return jnp.zeros((table_rows, c), jnp.float32).at[idx].add(
            vals.astype(jnp.float32))
    pad = (-m) % chunk
    if pad:
        idx = jnp.concatenate([idx, jnp.full((pad,), table_rows - 1,
                                             idx.dtype)])
        vals = jnp.concatenate([vals, jnp.zeros((pad, c), vals.dtype)])
        m = idx.shape[0]
    n_chunks = m // chunk

    if window == 0:
        mean_span = max(1, int(table_rows * chunk / m))
        window = -((-4 * mean_span) // 256) * 256
    window = min(window, table_rows)

    # multi-operand sort carries the payload with the keys
    sorted_ops = jax.lax.sort((idx,) + tuple(vals[:, i] for i in range(c)),
                              num_keys=1)
    s_idx = sorted_ops[0].reshape(n_chunks, chunk)
    s_vals = jnp.stack(sorted_ops[1:], axis=-1).reshape(n_chunks, chunk, c)

    # per-chunk window base: the chunk's first index, aligned down
    bases = (s_idx[:, 0] // 128) * 128
    bases = jnp.minimum(bases, max(table_rows - window, 0))

    col = jax.lax.broadcasted_iota(jnp.int32, (chunk, window), 1)

    def body(carry, args):
        grad, spill_count = carry
        sidx, svals, base = args
        rel = sidx - base  # [chunk]
        in_win = (rel >= 0) & (rel < window)
        relc = jnp.clip(rel, 0, window - 1)
        onehot = (relc[:, None] == col).astype(jnp.float32)
        onehot = onehot * in_win[:, None].astype(jnp.float32)
        part = jax.lax.dot_general(
            onehot, svals.astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [window, C]
        win = jax.lax.dynamic_slice_in_dim(grad, base, window, 0)
        grad = jax.lax.dynamic_update_slice_in_dim(grad, win + part, base, 0)
        spill_count = spill_count + jnp.sum(~in_win)
        return (grad, spill_count), (jnp.where(in_win, -1, sidx),
                                     svals * (~in_win)[:, None])

    init = (jnp.zeros((table_rows, c), jnp.float32), jnp.zeros((), jnp.int32))
    (grad, n_spill), (spill_idx, spill_vals) = jax.lax.scan(
        body, init, (s_idx, s_vals, bases))

    # Fallback for the (rare) out-of-window updates: compact the spills into
    # a small fixed buffer (cumsum pack, like ops/marching.py) so the true
    # scatter touches only ~spill_budget rows instead of M.
    spill_budget = 1 << 14
    spill_idx = spill_idx.reshape(-1)
    spill_vals = spill_vals.reshape(-1, c)
    is_spill = spill_idx >= 0

    def compacted(grad):
        slot = jnp.cumsum(is_spill.astype(jnp.int32)) - 1
        keep = is_spill & (slot < spill_budget)
        tgt = jnp.where(keep, slot, spill_budget)
        src = jnp.full((spill_budget + 1,), m, jnp.int32).at[tgt].set(
            jnp.arange(m, dtype=jnp.int32))[:spill_budget]
        valid = src < m
        src2 = jnp.minimum(src, m - 1)
        cidx = jnp.where(valid, spill_idx[src2], table_rows)
        cval = spill_vals[src2] * valid[:, None]
        return jnp.concatenate([grad, jnp.zeros((1, c), grad.dtype)]) \
            .at[cidx].add(cval)[:table_rows]

    def full_scatter(grad):
        # Overflow-safe path: scatter every spill directly. Costs a full
        # M-update scatter but loses no gradient mass (round-1 silently
        # dropped spills past the budget -- ADVICE.md).
        cidx = jnp.where(is_spill, spill_idx, table_rows)
        cval = spill_vals * is_spill[:, None]
        return jnp.concatenate([grad, jnp.zeros((1, c), grad.dtype)]) \
            .at[cidx].add(cval)[:table_rows]

    return jax.lax.cond(n_spill > spill_budget, full_scatter, compacted,
                        grad)
