"""Pallas TPU kernel for wavefront shadow-ray any-hit tracing.

Replaces the jnp compaction pipeline in tracer.py on TPU.  Design:

- grid over ray blocks (RB rays); each block keeps its rays in VMEM as an
  [RB, 8] feature matrix (ox,oy,oz,dx,dy,dz,1,0).
- the whole leaf table lives in VMEM: AABBs [C, 8] and per-leaf triangle
  intersection matrices [C, 8, 8L] (see bvh.py for the 7x8 construction; row
  7 is zero padding so the matmul operand is 8-row aligned).
- per block, a while_loop walks leaves in Morton order: a vectorized slab
  test picks the rays whose AABB test passes; if none (or every ray is
  already occluded) the leaf's triangle test is skipped, otherwise the
  block does one [RB, 8] @ [8, 8L] MXU matmul and ORs the hits into the
  per-ray occlusion accumulator.  The loop exits early once every ray in
  the block is occluded (any-hit semantics == OPTIX_RAY_FLAG_TERMINATE_ON_
  FIRST_HIT, reference kernel.cu:112).

VMEM budget: C*8*8L*4 bytes for fp32 triangles — up to ~48k triangles at
L=32; build with dtype=bfloat16 for larger scenes (tri data is re-centered
per leaf upstream if precision becomes an issue).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bvh import LeafBVH

BIG = 3e37


def _kernel(rayf_ref, aabb_ref, trimat_ref, occ_ref, *, n_leaves, leaf_size,
            tmin, tmax):
    rayf = rayf_ref[:]                      # [RB, 8]
    RB = rayf.shape[0]
    L = leaf_size

    ox, oy, oz = rayf[:, 0], rayf[:, 1], rayf[:, 2]
    dx, dy, dz = rayf[:, 3], rayf[:, 4], rayf[:, 5]

    def inv(d):
        return jnp.where(jnp.abs(d) > 1e-12, 1.0 / jnp.where(d == 0, 1.0, d),
                         2e12)
    ix, iy, iz = inv(dx), inv(dy), inv(dz)

    occ_ref[:, 0] = jnp.zeros((RB,), jnp.float32)

    CHUNK = 2                               # leaves per pl.when guard
    n_chunks = (n_leaves + CHUNK - 1) // CHUNK

    def slab(c):
        lo0, lo1, lo2 = aabb_ref[c, 0], aabb_ref[c, 1], aabb_ref[c, 2]
        hi0, hi1, hi2 = aabb_ref[c, 3], aabb_ref[c, 4], aabb_ref[c, 5]
        t0x = (lo0 - ox) * ix
        t1x = (hi0 - ox) * ix
        t0y = (lo1 - oy) * iy
        t1y = (hi1 - oy) * iy
        t0z = (lo2 - oz) * iz
        t1z = (hi2 - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.maximum(jnp.minimum(t0z, t1z), tmin))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.minimum(jnp.maximum(t0z, t1z), tmax))
        return tf >= tn

    def tri_test(c, alive):
        """Division-free any-hit against leaf c for rays in `alive`.
        With t = -b/a: t>0 <=> -b*a > 0; q_i = alpha_i + t*beta_i >= 0
        <=> s_i * a >= 0 where s_i = a*alpha_i - b*beta_i."""
        M = trimat_ref[c]                             # [8, 8L] field-major
        E = jnp.dot(rayf.astype(M.dtype), M,
                    preferred_element_type=jnp.float32)
        b_ = E[:, 0 * L:1 * L]
        a = E[:, 1 * L:2 * L]
        ba = (b_ + tmin * a) * a          # t > tmin  <=>  ba < 0
        s0 = a * E[:, 2 * L:3 * L] - b_ * E[:, 5 * L:6 * L]
        s1 = a * E[:, 3 * L:4 * L] - b_ * E[:, 6 * L:7 * L]
        s2 = a * E[:, 4 * L:5 * L] - b_ * E[:, 7 * L:8 * L]
        hit = (ba < 0.0) & (s0 * a >= 0.0) & (s1 * a >= 0.0) & (s2 * a >= 0.0)
        return jnp.any(hit, axis=-1) & alive

    def body(ci, _):
        occ = occ_ref[:, 0] > 0.0
        not_occ = jnp.logical_not(occ)
        base = ci * CHUNK
        alive = [slab(jnp.minimum(base + k, n_leaves - 1)) & not_occ
                 for k in range(CHUNK)]
        any_alive = alive[0]
        for k in range(1, CHUNK):
            any_alive = any_alive | alive[k]

        @pl.when(jnp.any(any_alive))
        def _():
            acc = occ_ref[:, 0]
            for k in range(CHUNK):
                c = jnp.minimum(base + k, n_leaves - 1)
                h = tri_test(c, alive[k])
                acc = jnp.maximum(acc, h.astype(jnp.float32))
            occ_ref[:, 0] = acc

        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _mask_kernel(rayf_ref, aabbt_ref, mask_ref, *, tmin, tmax, n_lane_groups):
    """Per-block leaf visit mask, pure vector code (no scalar reductions).

    rays on sublanes (8 at a time), leaves on lanes (128 per group):
    slab-test every (ray, leaf) pair and OR-reduce over the block's rays.
    aabbt: [8, Cpad] rows = (lo0,lo1,lo2,hi0,hi1,hi2,0,0)."""
    RB = rayf_ref.shape[0]
    Cpad = aabbt_ref.shape[1]

    acc = jnp.zeros((1, Cpad), jnp.float32)
    n_groups = RB // 8

    lo0 = aabbt_ref[0:1, :]
    lo1 = aabbt_ref[1:2, :]
    lo2 = aabbt_ref[2:3, :]
    hi0 = aabbt_ref[3:4, :]
    hi1 = aabbt_ref[4:5, :]
    hi2 = aabbt_ref[5:6, :]

    def group(g, acc):
        r = rayf_ref[pl.ds(g * 8, 8), :]          # [8, 8]
        ox, oy, oz = r[:, 0:1], r[:, 1:2], r[:, 2:3]
        dx, dy, dz = r[:, 3:4], r[:, 4:5], r[:, 5:6]

        def inv(d):
            return jnp.where(jnp.abs(d) > 1e-12,
                             1.0 / jnp.where(d == 0, 1.0, d), 2e12)
        ix, iy, iz = inv(dx), inv(dy), inv(dz)
        t0x = (lo0 - ox) * ix
        t1x = (hi0 - ox) * ix
        t0y = (lo1 - oy) * iy
        t1y = (hi1 - oy) * iy
        t0z = (lo2 - oz) * iz
        t1z = (hi2 - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.maximum(jnp.minimum(t0z, t1z), tmin))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.minimum(jnp.maximum(t0z, t1z), tmax))
        hit = (tf >= tn).astype(jnp.float32)       # [8, Cpad]
        return jnp.maximum(acc, jnp.max(hit, axis=0, keepdims=True))

    acc = jax.lax.fori_loop(0, n_groups, group, acc)
    mask_ref[0, :, :] = jnp.broadcast_to(acc.astype(jnp.int32), (8, Cpad))


def _main_kernel_v3(count_ref, list_ref, rayf_ref, trimat_ref, occ_ref, *,
                    leaf_size, tmin):
    """Occlusion accumulation for one (ray-block, k-th visited leaf) grid
    cell.  Leaf ids come from a scalar-prefetch visit list, so the triangle
    DMA and the compute run only for leaves this block actually visits
    (padding entries repeat the last visited leaf -> consecutive equal
    index_map results skip the re-DMA, and the count guard skips compute)."""
    RB = rayf_ref.shape[0]
    L = leaf_size
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        occ_ref[:, 0] = jnp.zeros((RB,), jnp.float32)

    @pl.when(j < count_ref[i])
    def _():
        rayf = rayf_ref[:]
        M = trimat_ref[0]
        E = jnp.dot(rayf.astype(M.dtype), M,
                    preferred_element_type=jnp.float32)
        b_ = E[:, 0 * L:1 * L]
        a = E[:, 1 * L:2 * L]
        ba = (b_ + tmin * a) * a
        s0 = a * E[:, 2 * L:3 * L] - b_ * E[:, 5 * L:6 * L]
        s1 = a * E[:, 3 * L:4 * L] - b_ * E[:, 6 * L:7 * L]
        s2 = a * E[:, 4 * L:5 * L] - b_ * E[:, 7 * L:8 * L]
        hit = ((ba < 0.0) & (s0 * a >= 0.0) & (s1 * a >= 0.0)
               & (s2 * a >= 0.0))
        occ_ref[:, 0] = jnp.maximum(
            occ_ref[:, 0], jnp.any(hit, axis=-1).astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=('ray_block', 'tmin', 'tmax',
                                             'interpret'))
def any_hit_pallas_v3(ro, rd, bvh: LeafBVH, tmin=0.0, tmax=1e16,
                      ray_block=1024, interpret=False):
    """Two-phase any-hit: vector-only leaf-mask prepass + mask-guarded
    triangle kernel.  Removes the per-leaf scalar-reduction syncs of
    any_hit_pallas (PERF_NOTES.md)."""
    R = ro.shape[0]
    C = bvh.aabb_lo.shape[0]
    L = bvh.leaf_size
    Cpad = ((C + 127) // 128) * 128

    pad = (-R) % ray_block
    if pad:
        ro = jnp.concatenate([ro, jnp.full((pad, 3), BIG, ro.dtype)])
        rd = jnp.concatenate([rd, jnp.zeros((pad, 3), rd.dtype)])
    Rp = R + pad
    NB = Rp // ray_block

    rayf = jnp.concatenate(
        [ro, rd, jnp.ones((Rp, 1), ro.dtype), jnp.zeros((Rp, 1), ro.dtype)],
        axis=-1)
    trimat = jnp.pad(bvh.tri_mat, ((0, 0), (0, 1), (0, 0)))
    # transposed AABBs padded on lanes; padding leaves get inverted boxes
    aabbt = jnp.full((8, Cpad), BIG, jnp.float32)
    aabbt = aabbt.at[0:3, :C].set(bvh.aabb_lo.T)
    aabbt = aabbt.at[3:6, :C].set(bvh.aabb_hi.T)
    aabbt = aabbt.at[3:6, C:].set(-BIG)

    mask = pl.pallas_call(
        functools.partial(_mask_kernel, tmin=tmin, tmax=tmax,
                          n_lane_groups=Cpad // 128),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((ray_block, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Cpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, Cpad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, 8, Cpad), jnp.int32),
        interpret=interpret,
    )(rayf, aabbt)

    mask_rows = mask[:, 0, :C]                     # [NB, C] int32
    counts, lists = _mask_to_lists(mask_rows)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NB, C),
        in_specs=[
            pl.BlockSpec((ray_block, 8), lambda i, j, cnt, lst: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 8 * L),
                         lambda i, j, cnt, lst: (lst[i, j], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ray_block, 1), lambda i, j, cnt, lst: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    occ = pl.pallas_call(
        functools.partial(_main_kernel_v3, leaf_size=L, tmin=tmin),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Rp, 1), jnp.float32),
        interpret=interpret,
    )(counts, lists, rayf, trimat)
    return occ.reshape(-1)[:R] > 0.0


def _mask_to_lists(mask_rows):
    """[NB, C] 0/1 -> (counts [NB], lists [NB, C]) with visited leaves first
    (ascending) and padding entries clamped to the last visited leaf."""
    NB, C = mask_rows.shape
    counts = jnp.sum(mask_rows, axis=1).astype(jnp.int32)
    pos = jnp.arange(C, dtype=jnp.int32)[None, :]
    key = mask_rows * (C - pos)          # visited leaves get keys C-j > 0
    _, idx = jax.lax.top_k(key, C)       # visited (ascending) first
    k = jnp.arange(C, dtype=jnp.int32)[None, :]
    last = jnp.take_along_axis(
        idx, jnp.maximum(counts - 1, 0)[:, None], axis=1)
    lists = jnp.where(k < counts[:, None], idx, last).astype(jnp.int32)
    return counts, lists


def counting_sort_perm(key, n_bins):
    """Stable counting-sort permutation (cheaper than argsort for few bins).
    Returns (perm, dest): sorted = x[perm]; dest[i] is i's sorted position."""
    R = key.shape[0]
    oneh = (key[:, None] == jnp.arange(n_bins, dtype=key.dtype)[None, :])
    ranks = jnp.cumsum(oneh.astype(jnp.int32), axis=0)
    rank = jnp.take_along_axis(ranks, key[:, None].astype(jnp.int32),
                               axis=1)[:, 0] - 1
    counts = ranks[-1]
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts)[:-1]])
    dest = starts[key] + rank
    perm = jnp.zeros((R,), jnp.int32).at[dest].set(
        jnp.arange(R, dtype=jnp.int32))
    return perm, dest


@functools.partial(jax.jit, static_argnames=('ray_block', 'tmin', 'tmax',
                                             'interpret'))
def any_hit_pallas(ro, rd, bvh: LeafBVH, tmin=0.0, tmax=1e16,
                   ray_block=1024, interpret=False):
    """Pallas any-hit over a LeafBVH.  ro/rd: [R, 3].  Returns bool [R].

    Note: tmax is accepted for interface parity but shadow rays are treated
    as infinite (reference uses tmax=1e16, torch_bindings.cpp:109)."""
    R = ro.shape[0]
    C = bvh.aabb_lo.shape[0]
    L = bvh.leaf_size

    pad = (-R) % ray_block
    if pad:
        ro = jnp.concatenate([ro, jnp.full((pad, 3), BIG, ro.dtype)])
        rd = jnp.concatenate([rd, jnp.zeros((pad, 3), rd.dtype)])
    Rp = R + pad

    rayf = jnp.concatenate(
        [ro, rd, jnp.ones((Rp, 1), ro.dtype), jnp.zeros((Rp, 1), ro.dtype)],
        axis=-1)
    # [C, 8, 8L]: pad the 7-row intersection matrix to 8 rows
    trimat = jnp.pad(bvh.tri_mat, ((0, 0), (0, 1), (0, 0)))
    if trimat.dtype == jnp.bfloat16:
        rayf = rayf  # cast happens per-block inside the kernel
    aabb = jnp.concatenate([bvh.aabb_lo, bvh.aabb_hi], axis=-1)  # [C, 6]

    kern = functools.partial(_kernel, n_leaves=C, leaf_size=L,
                             tmin=tmin, tmax=tmax)
    occ = pl.pallas_call(
        kern,
        grid=(Rp // ray_block,),
        in_specs=[
            pl.BlockSpec((ray_block, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 6), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((C, 8, 8 * L), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ray_block, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, 1), jnp.float32),
        interpret=interpret,
    )(rayf, aabb, trimat)
    return occ.reshape(-1)[:R] > 0.0
