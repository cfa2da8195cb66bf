"""Binned segment scatter-add: the TPU replacement for atomic scatter.

The reference accumulates gradient tables with CUDA atomics (tiny-cuda-nn's
hash-table backward; /root/reference/render/renderutils/c_src/texture.cu's
MipGrad path).  XLA's TPU scatter is effectively serial (~95 ns/row measured,
tools/bench_scatter*.py), which makes the hash-grid backward (~67M corner
updates/step at 512^2) cost seconds.  This kernel rebuilds the op TPU-first:

  1. sort updates by target row (lax.sort carrying the value columns —
     1-D operands, so nothing hits the (8,128) minor-dim padding),
  2. cut the output into `tile`-row bins; each bin's updates are a
     contiguous run of the sorted array,
  3. a Pallas kernel walks a (bin, update-block) work list; each step
     builds a one-hot [tile, sub] match matrix and accumulates the bin
     with an MXU matmul `vals @ onehot^T`; consecutive same-bin steps
     keep the accumulator tile resident in VMEM (Pallas revisiting).

The work list is skew-proof: its length is bounded by n_blocks + n_bins
regardless of how updates distribute (a bin with many updates just owns a
longer run of blocks), so adversarial collisions (e.g. every sample in one
hash cell at a coarse level) degrade throughput, never correctness or
memory.  Work items are packed (bin << 16 | block) into one int32 scalar-
prefetch array to stay well under the ~1 MB SMEM budget (pallas_tracer.py
lesson).

Values travel and return TRANSPOSED [C, N] (lane-major row axis): [N, C]
temps with small C are padded to (8, 128) tiles by XLA:TPU (42x blowup
measured for C=3 int32 at nerf scale, PERF_NOTES round-2 session 6).
"""

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GBITS = 16          # low bits of a packed work item = update-block id
_EMPTY = (1 << _GBITS) - 1   # block-id sentinel: zero the tile, no compute


def _kernel(work_ref, sidx_ref, vals_ref, out_ref, *, tile, blk):
    i = pl.program_id(0)
    w = work_ref[i]
    t = w >> _GBITS
    prev_t = work_ref[jnp.maximum(i - 1, 0)] >> _GBITS
    first = jnp.logical_or(i == 0, t != prev_t)

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # Block id _EMPTY marks a zero-only visit (bin with no updates): the
    # tile still must be zeroed (unvisited Pallas output blocks are
    # undefined memory), but the one-hot + matmul would be pure waste —
    # with tile-sized bins most grid steps are empty (nt >> nblk).
    @pl.when((w & (1 << _GBITS) - 1) != _EMPTY)
    def _():
        base = t * tile
        # float32 compare: Mosaic can't sublane-broadcast an i32 (1, blk)
        # row (and rejects any lane-offset slice as a broadcast source, so
        # no sub-chunk loop); integers stay exact in f32 far beyond any
        # bin-local offset.  The (tile, blk) one-hot lives once in VMEM
        # (~4 MB at 512x2048) and feeds one MXU matmul.
        s = (sidx_ref[...] - base).astype(jnp.float32)  # (1, blk)
        rows = lax.broadcasted_iota(
            jnp.int32, (tile, blk), 0).astype(jnp.float32)
        oh = (rows == s).astype(jnp.float32)      # out-of-bin rows match 0
        out_ref[...] += lax.dot_general(
            vals_ref[...], oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            # default MXU precision is bf16 passes — the one-hot side is
            # exact but the value mantissas are not (5e-3 rel err on chip)
            precision=lax.Precision.HIGHEST)


def sorted_scatter_add_t(sidx, vals_t, out_rows, *, tile=512, blk=2048,
                         interpret=False):
    """Scatter-add pre-sorted updates into a fresh [C, out_rows] array.

    sidx: [M] int32, ASCENDING; entries >= out_rows are dropped (use
    out_rows + tile as the pad sentinel so it clears the trash bin too).
    vals_t: [C, M] float32 value columns (transposed).
    Returns out_t [C, out_rows] float32.
    """
    M = sidx.shape[0]
    C = vals_t.shape[0]
    if M == 0:
        return jnp.zeros((C, out_rows), jnp.float32)
    nt = -(-out_rows // tile)                    # bins
    m_pad = -(-M // blk) * blk
    nblk = m_pad // blk
    if nt + 1 >= (1 << (31 - _GBITS)) or nblk >= _EMPTY:
        raise ValueError('scatter too large for packed work items: '
                         'nt=%d nblk=%d (tile=%d blk=%d)'
                         % (nt, nblk, tile, blk))
    sentinel = jnp.int32(nt * tile + tile)
    if m_pad != M:
        sidx = jnp.concatenate(
            [sidx, jnp.full((m_pad - M,), sentinel, jnp.int32)])
        vals_t = jnp.concatenate(
            [vals_t, jnp.zeros((C, m_pad - M), vals_t.dtype)], axis=1)

    # --- work list: (bin, block) pairs, bins in ascending order ----------
    bounds = jnp.arange(nt + 1, dtype=jnp.int32) * tile
    b = jnp.searchsorted(sidx, bounds, side='left').astype(jnp.int32)
    starts, ends = b[:-1], b[1:]
    has = ends > starts
    # Empty bins still get ONE work item: a Pallas output block that no
    # grid step visits is never written (undefined memory on TPU), so the
    # bin must be visited once to be zeroed.  It carries the _EMPTY block
    # sentinel so the kernel skips the one-hot + matmul (with tile-sized
    # bins most grid steps are empty zero-visits: nt >> nblk).
    gs = jnp.minimum(starts // blk, nblk - 1)
    nb = jnp.where(has, (ends - 1) // blk - gs + 1, 1)
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(nb).astype(jnp.int32)])
    W = nblk + nt + 1                            # static skew-proof bound
    slot = jnp.arange(W, dtype=jnp.int32)
    t_of = (jnp.searchsorted(offs, slot, side='right') - 1).astype(jnp.int32)
    t_cl = jnp.minimum(t_of, nt - 1)
    g_of = gs[t_cl] + (slot - offs[t_cl])
    skip = jnp.logical_or(t_of >= nt, ~has[t_cl])  # trash slots, empty bins
    t_of = jnp.where(t_of >= nt, nt, t_of)
    g_of = jnp.where(skip, _EMPTY, g_of)
    work = (t_of << _GBITS) | g_of

    def _blk_of(i, wk, _n=nblk - 1):
        # _EMPTY visits still need an in-range (unused) input block
        return jnp.minimum(wk[i] & (1 << _GBITS) - 1, _n)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(W,),
        in_specs=[
            # sidx travels [1, M]: a (1, blk) lane-axis block is tileable
            # ((1, M) second-minor dim equals the array dim); a (1, blk)
            # block of an [nblk, blk] array is not (sublane dim 1 < 8).
            pl.BlockSpec((1, blk), lambda i, wk: (0, _blk_of(i, wk))),
            pl.BlockSpec((C, blk), lambda i, wk: (0, _blk_of(i, wk))),
        ],
        out_specs=pl.BlockSpec((C, tile), lambda i, wk: (0, wk[i] >> _GBITS)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, tile=tile, blk=blk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, (nt + 1) * tile), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        interpret=interpret,
    )(work, sidx.reshape(1, m_pad), vals_t)
    return out[:, :out_rows]


@jax.custom_vjp
def rows_gather(table, idx):
    """table[idx] with the table cotangent routed through the binned Pallas
    scatter instead of the XLA serial scatter AD emits for a gather
    transpose (~12 ms per 262k-row vertex-attribute scatter measured in the
    pass-2 profile; the binned kernel does the same in ~2 ms).

    table: [V, C]; idx: any int shape; returns idx.shape + (C,)."""
    return table[idx]


def _rows_gather_fwd(table, idx):
    return table[idx], (idx, table.shape[0])


def _rows_gather_bwd(res, dout):
    idx, V = res
    C = dout.shape[-1]
    d_t = scatter_add_t(idx.reshape(-1),
                        dout.reshape(-1, C).T.astype(jnp.float32), V)
    return d_t.T.astype(dout.dtype), jnp.zeros(idx.shape, jax.dtypes.float0)


rows_gather.defvjp(_rows_gather_fwd, _rows_gather_bwd)


def rows_gather_b(table, idx):
    """Batched rows_gather: table [N, V, C], idx [N, ...] — folds the batch
    into the row index so the adjoint is ONE scatter over N*V rows (also
    sidesteps vmap-of-custom_vjp batching)."""
    N, V, C = table.shape
    offs = (jnp.arange(N, dtype=jnp.int32) * V).reshape(
        (N,) + (1,) * (idx.ndim - 1))
    return rows_gather(table.reshape(N * V, C), idx + offs)


def scatter_add_t_ref(idx, vals_t, out_rows):
    """jnp twin (and CPU path): XLA scatter-add, same [C, N] convention."""
    out = jnp.zeros((out_rows, vals_t.shape[0]), vals_t.dtype)
    return out.at[idx].add(vals_t.T, mode='drop').T


def scatter_add_t(idx, vals_t, out_rows, *, tile=512, blk=2048,
                  interpret=False):
    """Unsorted convenience wrapper: argsorts the keys and permutes the
    value columns with one lane-axis gather ([C, M] take is bandwidth-bound,
    ~0.2 ms at 524k x 52 on v5e — a C-operand variadic sort is not), then
    runs the binned kernel.  CPU falls back to the XLA twin."""
    # f32 accumulation contract: every path (kernel, CPU twin, M==0)
    # returns float32 so the output dtype never depends on dispatch.
    vals_t = vals_t.astype(jnp.float32)
    if jax.default_backend() == 'cpu' and not interpret:
        return scatter_add_t_ref(idx, vals_t, out_rows)
    M = idx.shape[0]
    if M == 0:
        return jnp.zeros((vals_t.shape[0], out_rows), jnp.float32)
    # Auto-raise the bin size when out_rows would overflow the 15-bit bin
    # budget of the packed work items (tile=512 caps out_rows at ~16.7M —
    # a 4096^2 texture pyramid adjoint needs ~22M).  Lane-dim blocks only
    # need tile % 128 == 0; cap at 1024, halving blk in step so the
    # kernel's (tile, blk) one-hot VMEM footprint stays at the ~4 MB it
    # was sized for (512x2048), and fall back to the XLA twin beyond that.
    while (-(-out_rows // tile) + 1 >= (1 << (31 - _GBITS))
           and tile < 1024):
        tile *= 2
        blk = max(blk // 2, 512)
    if (-(-out_rows // tile) + 1 >= (1 << (31 - _GBITS))
            or -(-M // blk) >= _EMPTY):
        return scatter_add_t_ref(idx, vals_t, out_rows)  # beyond packing
    idx = jnp.where((idx >= 0) & (idx < out_rows), idx,
                    out_rows + tile)             # drop -> past trash bin
    ks, perm = lax.sort((idx, jnp.arange(M, dtype=jnp.int32)), num_keys=1)
    return sorted_scatter_add_t(
        ks, jnp.take(vals_t, perm, axis=1), out_rows,
        tile=tile, blk=blk, interpret=interpret)
