"""Pallas TPU kernels for wavefront shadow-ray any-hit tracing (v4).

Role of OptiX ray traversal (reference kernel.cu:101-118, any-hit with
TERMINATE_ON_FIRST_HIT) rebuilt for a vector machine:

1. **Mask prepass** (vector-only Pallas kernel): per (ray-block, leaf) AABB
   slab tests, OR-reduced over the block's rays -> visit mask [NB, C].
   No scalar syncs: rays ride the sublanes, leaves ride the lanes.
2. **Visit lists** (jnp): compacted per-block leaf lists + counts from the
   mask (top_k trick), so the main kernel's control flow is pure SMEM
   scalars — the expensive vector->scalar reductions that throttled the
   round-1 kernels (PERF_NOTES.md) are gone entirely.
3. **Main kernel**: per ray block, a fori_loop walks the block's visit list;
   each leaf's Plücker matrix [16, 5L] is DMA'd HBM->VMEM with double
   buffering (compute on leaf j overlaps the fetch of leaf j+1), then tested
   with one [RB, 16] @ [16, 5L] MXU matmul + sign-test epilogue
   (bvh.decode_hits).  Keeping triangle data in HBM removes the round-1
   VMEM scene-size ceiling: scenes are bounded by HBM, not the 16 MB VMEM.

Any-hit semantics: the occlusion accumulator is monotone (max), so visit
order is irrelevant and early termination is an optimization, not a
correctness requirement.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bvh import LeafBVH, K_FEATS, N_FIELDS, ray_features, decode_hits

BIG = 3e37
EXIT_GROUP = 8   # leaves per all-occluded early-exit check

# All-occluded early exit in the streaming trace loops.  The check is a
# vector->scalar sync AND a pipeline serialization point every EXIT_GROUP
# leaves; with the pixel coherence sort (pallas_shade) visit lists are
# short for coherent AND incoherent G-buffers, so the exit rarely pays for
# its sync.  Env-switchable for A/B (read at trace time).
def _early_exit_on():
    import os
    return os.environ.get('NVDR_EARLY_EXIT', '0') not in ('0', 'false', '')


# ---------------------------------------------------------------------------
# Mask prepass: per-(block, leaf) AABB visit mask
# ---------------------------------------------------------------------------

def visit_masks_od(o, d, aabb_lo, aabb_hi, ray_block, tmin, tmax):
    """[NB, C] int32 visit masks from ray origins/directions [Rp, 3]
    (Rp % ray_block == 0).  Plain jnp: the [rays, C] slab-test broadcast
    fuses into its any-reduce under XLA, using all 1024 VPU lanes —
    measured faster than the round-1 Pallas mask kernel, which walked rays
    8 at a time on the sublanes (C leaves rarely fill the lanes).

    Two memory rules learned the hard way (HBM OOM at 512^2 x 768 leaves):
    the per-axis loop keeps temps at [G*RB, C] instead of [G*RB, C, 3],
    and an outer lax.map over block groups bounds the live set to
    ~_MASK_BUDGET floats regardless of image size."""
    Rp = o.shape[0]
    NB = Rp // ray_block
    C = aabb_lo.shape[0]

    inv = jnp.where(jnp.abs(d) > 1e-12,
                    1.0 / jnp.where(d == 0.0, 1.0, d), 2e12)

    def slab(og, ig):
        # og/ig [G, RB, 3] -> [G, C] visit mask; per-axis accumulation
        tn = jnp.full((og.shape[0], og.shape[1], C), tmin, jnp.float32)
        tf = jnp.full((og.shape[0], og.shape[1], C), tmax, jnp.float32)
        for ax in range(3):
            t0 = (aabb_lo[None, None, :, ax] - og[:, :, None, ax]) \
                * ig[:, :, None, ax]
            t1 = (aabb_hi[None, None, :, ax] - og[:, :, None, ax]) \
                * ig[:, :, None, ax]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        return jnp.any(tf >= tn, axis=1).astype(jnp.int32)

    _MASK_BUDGET = 1 << 24                      # floats live per map step
    G = max(1, min(NB, _MASK_BUDGET // max(1, ray_block * C)))
    while NB % G:
        G -= 1
    o3 = o.reshape(NB // G, G, ray_block, 3)
    i3 = inv.reshape(NB // G, G, ray_block, 3)
    if NB // G == 1:
        return slab(o3[0], i3[0])
    m = jax.lax.map(lambda a: slab(a[0], a[1]), (o3, i3))
    return m.reshape(NB, C)


def _mask_kernel(rayf_ref, aabbt_ref, mask_ref, *, tmin, tmax):
    """rays on sublanes (8 at a time), leaves on lanes (128 per group):
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
        r = rayf_ref[pl.ds(g * 8, 8), :]          # [8, 16]
        dx, dy, dz = r[:, 0:1], r[:, 1:2], r[:, 2:3]
        ox, oy, oz = r[:, 6:7], r[:, 7:8], r[:, 8:9]

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


def visit_masks(rayf, aabb_lo, aabb_hi, ray_block, tmin, tmax,
                interpret=False):
    """[NB, C] int32 visit masks for a padded ray-feature array
    [NB*ray_block, 16]."""
    Rp = rayf.shape[0]
    NB = Rp // ray_block
    C = aabb_lo.shape[0]
    Cpad = ((C + 127) // 128) * 128

    aabbt = jnp.full((8, Cpad), BIG, jnp.float32)
    aabbt = aabbt.at[0:3, :C].set(aabb_lo.T)
    aabbt = aabbt.at[3:6, :C].set(aabb_hi.T)
    aabbt = aabbt.at[3:6, C:].set(-BIG)   # padding leaves: inverted boxes

    mask = pl.pallas_call(
        functools.partial(_mask_kernel, tmin=tmin, tmax=tmax),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((ray_block, K_FEATS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Cpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, Cpad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, 8, Cpad), jnp.int32),
        interpret=interpret,
    )(rayf, aabbt)
    return mask[:, 0, :C]


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


# ---------------------------------------------------------------------------
# Main kernel: list-driven leaf walk with double-buffered HBM DMA
# ---------------------------------------------------------------------------

def _trace_kernel(lists_hbm, rayf_ref, trimat_hbm, occ_ref,
                  tri_vmem, lst, sems, lsem, *, leaf_size, tmin, tri_dtype,
                  leaf_batch):
    """Visit lists live in HBM (SMEM on this chip is ~1 MB — whole-array
    scalar prefetch does not scale); each block DMAs its own list row into
    an SMEM scratch, then walks it with pure scalar control flow.

    Round-5 epilogue diet: (a) occlusion accumulates as an [RB, L] lane
    mask with ONE elementwise or per visit; the cross-lane max-reduce
    (log2(L) shuffle steps per visit in the old kernel) runs once after
    the loop — bit-identical for a monotone accumulator.  (b) leaves are
    fetched leaf_batch (KL) at a time into lane slices of one buffer, so
    the fori_loop trip count and DMA waits amortize over KL leaves; the
    matmul stays per-leaf to keep the E temporary at [RB, 5L]."""
    RB = rayf_ref.shape[0]
    L = leaf_size
    FL = N_FIELDS * L
    KL = leaf_batch
    i = pl.program_id(0)

    ldma = pltpu.make_async_copy(lists_hbm.at[i], lst, lsem)
    ldma.start()

    occ_ref[:, 0] = jnp.zeros((RB,), jnp.float32)
    rayf = rayf_ref[:].astype(tri_dtype)

    ldma.wait()
    W = lst.shape[1]
    n = lst[0, 0]

    def leaf_id(j):
        k = 1 + j
        return lst[jax.lax.div(k, W), jax.lax.rem(k, W)]

    def dma(slot, j):
        # early-exit path (leaf_batch forced to 1): whole-buffer copies
        return pltpu.make_async_copy(
            trimat_hbm.at[leaf_id(j)], tri_vmem.at[slot], sems.at[slot, 0])

    def dma_k(slot, r, k):
        # leaf k of round r -> lane slice k of buffer `slot`
        return pltpu.make_async_copy(
            trimat_hbm.at[leaf_id(r * KL + k)],
            tri_vmem.at[slot, :, pl.ds(k * FL, FL)],
            sems.at[slot, k])

    @pl.when(n > 0)
    def _():
        if KL >= 1 and not _early_exit_on():
            n_r = jax.lax.div(n + (KL - 1), KL)
            for k in range(KL):
                dma_k(0, 0, k).start()

            def visit(r, acc):
                slot = jax.lax.rem(r, 2)

                @pl.when(r + 1 < n_r)
                def _():
                    for k in range(KL):
                        dma_k(1 - slot, r + 1, k).start()

                for k in range(KL):
                    dma_k(slot, r, k).wait()
                    E = jnp.dot(rayf,
                                tri_vmem[slot, :, k * FL:(k + 1) * FL],
                                preferred_element_type=jnp.float32)
                    hit = decode_hits(E, L, tmin=tmin)
                    acc = jnp.maximum(acc, hit.astype(jnp.float32))
                return acc

            acc = jax.lax.fori_loop(0, n_r, visit,
                                    jnp.zeros((RB, L), jnp.float32))
            occ_ref[:, 0] = jnp.max(acc, axis=-1)
            return

        def visit(j, oc):
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < n_lim)
            def _():
                dma(1 - slot, j + 1).start()

            dma(slot, j).wait()
            E = jnp.dot(rayf, tri_vmem[slot, :, 0:FL],
                        preferred_element_type=jnp.float32)   # [RB, 5L]
            hit = decode_hits(E, L, tmin=tmin)
            return jnp.maximum(
                oc, jnp.max(hit.astype(jnp.float32), axis=-1,
                            keepdims=True))

        dma(0, 0).start()

        if not _early_exit_on():
            # legacy path (NVDR_LEAF_BATCH=0 kill-switch): the round-4
            # kernel verbatim — whole-buffer DMA, per-visit reduce
            n_lim = n
            occ_col = jax.lax.fori_loop(
                0, n, visit, jnp.zeros((RB, 1), jnp.float32))
            occ_ref[:, 0] = occ_col[:, 0]
            return

        # Early exit on all-occluded, checked once per group of G
        # leaves: any-hit is monotone, so once every ray in the block
        # is occluded the remaining leaves cannot change the answer.
        # The check is a vector->scalar sync (~2.3 us) AND a
        # serialization point for the software pipeline, so it must
        # NOT be per-leaf (measured: per-leaf checks cost 26% tracer
        # throughput).  The visit count is padded to a multiple of G
        # with clamped/zero list entries — redundant leaf re-visits
        # are harmless for a monotone accumulator and cheaper than a
        # tail loop.
        n_g = jax.lax.div(n + (EXIT_GROUP - 1), EXIT_GROUP)
        n_lim = n_g * EXIT_GROUP

        def cond(c):
            g, done, _ = c
            return (g < n_g) & (done == 0)

        def gbody(c):
            g, _, occ_col = c
            occ_col = jax.lax.fori_loop(
                0, EXIT_GROUP,
                lambda i, oc: visit(g * EXIT_GROUP + i, oc), occ_col)
            done = (jnp.sum(occ_col) >= RB).astype(jnp.int32)
            return (g + 1, done, occ_col)

        g_end, done, occ_col = jax.lax.while_loop(
            cond, gbody, (jnp.int32(0), jnp.int32(0),
                          jnp.zeros((RB, 1), jnp.float32)))
        occ_ref[:, 0] = occ_col[:, 0]

        # drain the prefetch issued for the next group's first leaf
        # when we exited early
        j_next = g_end * EXIT_GROUP

        @pl.when(j_next < n_lim)
        def _():
            dma(jax.lax.rem(j_next, 2), j_next).wait()


@functools.partial(jax.jit, static_argnames=('ray_block', 'tmin', 'tmax',
                                             'interpret', 'sort_rays'))
def any_hit_pallas(ro, rd, bvh: LeafBVH, tmin=0.0, tmax=1e16,
                   ray_block=1024, interpret=False, sort_rays=False):
    """Pallas any-hit over a LeafBVH.  ro/rd: [R, 3].  Returns bool [R].

    sort_rays: stable counting-sort by (origin cell PRIMARY, direction
    octant secondary) before blocking, unsorted on return.  Exact (a
    permutation of a per-ray computation) but default OFF: measured on
    the 5856-tri spot bench at 2M incoherent rays, the sort+permute
    overhead HALVES throughput (14.9 -> 7.8 Mrays/s) — at 46 leaves the
    visit-union saving cannot amortize two counting sorts plus a [R,16]
    permute.  Worth revisiting for large scenes; the in-train shade path
    does its own pixel sort either way.

    Note: tmax is accepted for interface parity but shadow rays are treated
    as infinite (reference uses tmax=1e16, torch_bindings.cpp:109)."""
    R = ro.shape[0]
    pad = (-R) % ray_block
    if pad:
        ro = jnp.concatenate([ro, jnp.full((pad, 3), BIG, ro.dtype)])
        rd = jnp.concatenate([rd, jnp.zeros((pad, 3), rd.dtype)])
    dest = None
    if sort_rays and R > ray_block:
        okey = ((rd[:, 0] > 0) * 4 + (rd[:, 1] > 0) * 2
                + (rd[:, 2] > 0)).astype(jnp.int32)
        okey = jnp.where(jnp.any(ro >= BIG, axis=-1), 8, okey)
        perm1, _ = counting_sort_perm(okey, 9)
        # 3^3 origin cells (counting_sort_perm materializes an [R, bins]
        # one-hot cumsum — 28 bins keeps it ~230 MB at 2M rays)
        lo = jnp.min(bvh.aabb_lo, axis=0)
        ex = jnp.maximum(jnp.max(bvh.aabb_hi, axis=0) - lo, 1e-9)
        c3 = jnp.clip(((ro - lo) / ex * 3.0).astype(jnp.int32), 0, 2)
        cid = (c3[:, 0] * 3 + c3[:, 1]) * 3 + c3[:, 2]
        cid = jnp.where(jnp.any(ro >= BIG, axis=-1), 27, cid)
        perm2, _ = counting_sort_perm(cid[perm1], 28)
        perm = perm1[perm2]
        dest = jnp.zeros_like(perm).at[perm].set(
            jnp.arange(perm.shape[0], dtype=jnp.int32))
        ro, rd = ro[perm], rd[perm]
    rayf = ray_features(ro, rd)
    occ = trace_rayf(rayf, bvh, tmin=tmin, tmax=tmax, ray_block=ray_block,
                     interpret=interpret)
    if dest is not None:
        occ = occ[dest]
    return occ[:R]


def default_leaf_batch():
    """Leaves fetched per DMA round in the streaming trace loops
    (NVDR_LEAF_BATCH to A/B; must divide into the EXIT_GROUP slack).
    0 = the round-4 loop shape (whole-buffer DMA, per-visit reduce).

    Default 0: the on-chip A/B (tools/bench_tracer_ab.py, 2026-08-21,
    v5e) measured the KL=4 sliced-DMA variant SLOWER than the legacy
    loop — 11.39 vs 13.72 Mrays/s standalone, 678 vs 502 ms incoherent
    fused-shade fwd — the per-round DMA-slice setup costs more than the
    sync amortization saves at leaf_size=128.  Kept as an env knob for
    future hardware where the trade may flip."""
    import os
    return max(0, min(8, int(os.environ.get('NVDR_LEAF_BATCH', '0'))))


def trace_rayf(rayf, bvh: LeafBVH, tmin=0.0, tmax=1e16, ray_block=1024,
               interpret=False):
    """Core any-hit on prebuilt ray features [Rp, 16] (Rp % ray_block == 0).
    Returns bool [Rp]."""
    Rp = rayf.shape[0]
    NB = Rp // ray_block
    C = bvh.n_leaves
    L = bvh.leaf_size
    KL = 1 if _early_exit_on() else default_leaf_batch()

    mask_rows = visit_masks_od(rayf[:, 6:9], rayf[:, 0:3], bvh.aabb_lo,
                               bvh.aabb_hi, ray_block, tmin, tmax)
    counts, lists = _mask_to_lists(mask_rows)
    merged = jnp.concatenate([counts[:, None], lists], axis=1)  # [NB, 1+C]
    # DMA slices need (8, 128k) tile alignment: lay each block's list out as
    # an [8, Cl/8] tile (row-major entries; kernel reads lst[k//W, k%W]).
    # + EXIT_GROUP slack: the kernel rounds visits up to a group/leaf-batch
    # multiple (padding entries are zeros -> redundant leaf-0 visits,
    # harmless)
    Cl = ((merged.shape[1] + EXIT_GROUP + 1023) // 1024) * 1024
    merged = jnp.pad(merged, ((0, 0), (0, Cl - merged.shape[1])))
    merged = merged.reshape(NB, 8, Cl // 8)

    occ = pl.pallas_call(
        functools.partial(_trace_kernel, leaf_size=L, tmin=tmin,
                          tri_dtype=bvh.tri_mat.dtype, leaf_batch=KL),
        grid=(NB,),
        out_shape=jax.ShapeDtypeStruct((Rp, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # lists stay in HBM
            pl.BlockSpec((ray_block, K_FEATS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),   # trimat stays in HBM
        ],
        out_specs=pl.BlockSpec((ray_block, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, K_FEATS, max(KL, 1) * N_FIELDS * L),
                       bvh.tri_mat.dtype),
            pltpu.SMEM((8, Cl // 8), jnp.int32),
            pltpu.SemaphoreType.DMA((2, max(KL, 1))),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(merged, rayf, bvh.tri_mat)
    return occ.reshape(-1) > 0.0


# ---------------------------------------------------------------------------
# Ray ordering helper
# ---------------------------------------------------------------------------

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
