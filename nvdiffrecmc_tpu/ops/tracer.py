"""Wavefront any-hit shadow-ray tracer (pure-jnp reference backend).

Replaces the OptiX shadow-ray launch (OPTIX_RAY_FLAG_TERMINATE_ON_FIRST_HIT,
/root/reference/render/optixutils/c_src/envsampling/kernel.cu:101-118) with a
TPU-native wavefront pipeline over the LeafBVH from bvh.py:

1. dense ray x leaf-AABB slab tests (static [Rc, C] vectorized compute),
2. (ray, leaf) pair compaction via sized-nonzero, leaf-major order,
3. leaf-aligned padding so every work block of PB pairs shares one leaf —
   triangle data is then fetched per block and the L-triangle any-hit test
   is a batched [PB, 16] @ [16, 5L] Plücker matmul on the MXU,
4. scatter-max of per-pair hits back to rays.

Fully static shapes; per-ray candidate pairs are capped (k_pairs).  Overflow
beyond the cap is *counted* and surfaced (any_hit_counted) so callers can
detect missed occlusion instead of silently losing it (the cap only matters
for rays crossing more than k_pairs leaf AABBs).  The Pallas TPU backend
(pallas_tracer.py) visits every leaf and has no cap.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .bvh import LeafBVH, ray_features, decode_hits

BIG = 3e37


def _slab_test(o, d, lo, hi, tmin, tmax):
    """[Rc, C] AABB intersection mask."""
    inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, jnp.sign(d) * 1e12 + 1e12)
    tn = jnp.full((o.shape[0], lo.shape[0]), tmin, o.dtype)
    tf = jnp.full((o.shape[0], lo.shape[0]), tmax, o.dtype)
    for ax in range(3):
        t0 = (lo[None, :, ax] - o[:, None, ax]) * inv[:, None, ax]
        t1 = (hi[None, :, ax] - o[:, None, ax]) * inv[:, None, ax]
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    return tf >= tn


def _any_hit_chunk(o, d, bvh: LeafBVH, tmin, tmax, k_pairs, pair_block):
    Rc = o.shape[0]
    C = bvh.aabb_lo.shape[0]
    L = bvh.leaf_size
    PB = pair_block

    hit_lc = _slab_test(o, d, bvh.aabb_lo, bvh.aabb_hi, tmin, tmax)  # [Rc, C]

    # --- pair compaction, leaf-major ---
    flat = hit_lc.T.reshape(-1)                      # [C * Rc], leaf-major
    n_pairs_cap = Rc * k_pairs
    dropped = jnp.maximum(
        jnp.sum(flat.astype(jnp.int32)) - n_pairs_cap, 0)
    (pair_idx,) = jnp.nonzero(flat, size=n_pairs_cap, fill_value=C * Rc)
    pair_leaf = (pair_idx // Rc).astype(jnp.int32)   # C for fill entries
    pair_ray = (pair_idx % Rc).astype(jnp.int32)
    pair_valid = pair_idx < C * Rc

    counts = jnp.sum(hit_lc, axis=0).astype(jnp.int32)          # [C]
    start = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                             jnp.cumsum(counts)[:-1]])
    counts_pad = ((counts + PB - 1) // PB) * PB
    pad_off = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(counts_pad)[:-1]])

    padded_cap = ((n_pairs_cap + C * PB + PB - 1) // PB) * PB
    rank = jnp.arange(n_pairs_cap, dtype=jnp.int32) - start[jnp.clip(pair_leaf, 0, C - 1)]
    dest = pad_off[jnp.clip(pair_leaf, 0, C - 1)] + rank
    dest = jnp.where(pair_valid, dest, padded_cap)   # dropped -> out of range

    padded_ray = jnp.full((padded_cap,), -1, jnp.int32)
    padded_ray = padded_ray.at[dest].set(pair_ray, mode='drop')

    # --- block -> leaf mapping ---
    n_blocks = padded_cap // PB
    block_start = jnp.arange(n_blocks, dtype=jnp.int32) * PB
    block_leaf = jnp.searchsorted(pad_off, block_start, side='right').astype(jnp.int32) - 1
    block_leaf = jnp.clip(block_leaf, 0, C - 1)

    # --- batched triangle tests ---
    rays_b = padded_ray.reshape(n_blocks, PB)
    rmask = rays_b >= 0
    ridx = jnp.clip(rays_b, 0)
    feats = ray_features(o, d)                       # [Rc, 16]
    bf = feats[ridx] * rmask[..., None]              # [NB, PB, 16]
    bm = bvh.tri_mat[block_leaf]                     # [NB, 16, 5L]

    E = jnp.einsum('bpf,bfk->bpk', bf.astype(bm.dtype), bm,
                   preferred_element_type=jnp.float32)
    hit = decode_hits(E, L, tmin=tmin)               # [NB, PB, L]
    hit_ray = jnp.any(hit, axis=-1) & rmask          # [NB, PB]

    occluded = jnp.zeros((Rc,), bool)
    occluded = occluded.at[ridx.reshape(-1)].max(hit_ray.reshape(-1), mode='drop')
    return occluded, dropped


@partial(jax.jit, static_argnames=('ray_chunk', 'k_pairs', 'pair_block'))
def any_hit_counted(ro, rd, bvh: LeafBVH, tmin=1e-4, tmax=1e16,
                    ray_chunk=65536, k_pairs=16, pair_block=512):
    """Like any_hit but also returns the number of (ray, leaf) candidate
    pairs dropped past the k_pairs cap (0 == exact result)."""
    R = ro.shape[0]
    # ray_chunk is an upper bound on wavefront width, not a launch quantum:
    # small launches (tests, tiny renders) must not pay a 65536-wide slab
    # test + pair compaction (measured: a 4096-ray trace padded to 65536
    # costs ~16x, turning a 16^2 CPU train step into seconds)
    ray_chunk = min(ray_chunk, max(512, -(-R // 512) * 512))
    pad = (-R) % ray_chunk
    if pad:
        ro = jnp.concatenate([ro, jnp.full((pad, 3), BIG, ro.dtype)])
        rd = jnp.concatenate([rd, jnp.zeros((pad, 3), rd.dtype)])
    n_chunks = (R + pad) // ray_chunk

    o_c = ro.reshape(n_chunks, ray_chunk, 3)
    d_c = rd.reshape(n_chunks, ray_chunk, 3)

    def chunk(args):
        o, d = args
        return _any_hit_chunk(o, d, bvh, tmin, tmax, k_pairs, pair_block)

    occ, dropped = jax.lax.map(chunk, (o_c, d_c))
    return occ.reshape(-1)[:R], jnp.sum(dropped)


def any_hit(ro, rd, bvh: LeafBVH, tmin=1e-4, tmax=1e16,
            ray_chunk=65536, k_pairs=16, pair_block=512):
    """Boolean occlusion test for rays (origins [R,3], directions [R,3]).

    Rays with zero direction or origin at BIG never hit (used to disable
    masked pixels)."""
    occ, _ = any_hit_counted(ro, rd, bvh, tmin=tmin, tmax=tmax,
                             ray_chunk=ray_chunk, k_pairs=k_pairs,
                             pair_block=pair_block)
    return occ


# (ray, leaf) candidate pairs dropped past the k_pairs cap by the jnp
# occlusion path, accumulated host-side via jax.debug.callback — a dropped
# pair can silently un-shadow a pixel, so overflow must be loud.  Tests
# reset/inspect this; production prints a warning per offending launch.
OCCLUSION_DROPPED_PAIRS = [0]


def _note_dropped(dropped):
    d = int(dropped)
    if d > 0:
        OCCLUSION_DROPPED_PAIRS[0] += d
        print('WARNING: jnp occlusion dropped %d (ray, leaf) candidate '
              'pairs past the k_pairs cap — shadows may be missing; raise '
              'k_pairs (tracer.make_occlusion_fn)' % d, flush=True)


def make_occlusion_fn(backend='jnp', tmin=0.0, ray_chunk=65536, k_pairs=16):
    """Return a custom-vjp occlusion function occ(ro, rd, bvh) -> bool [R]
    with an explicitly-zero backward pass.

    Visibility is binary and the reference deliberately ignores the shadow
    boundary gradient (kernel.cu:96-99); defining the VJP explicitly also
    lets jax.checkpoint linearize through the Pallas kernel, which has no
    JVP rule of its own."""

    @jax.custom_vjp
    def occlusion(ro, rd, bvh):
        if backend == 'pallas':
            from .pallas_tracer import any_hit_pallas
            return any_hit_pallas(ro, rd, bvh, tmin=tmin)
        occ, dropped = any_hit_counted(ro, rd, bvh, tmin=tmin,
                                       ray_chunk=ray_chunk, k_pairs=k_pairs)
        jax.debug.callback(_note_dropped, dropped)
        return occ

    def fwd(ro, rd, bvh):
        return occlusion(ro, rd, bvh), (ro, rd, bvh)

    def bwd(res, g):
        ro, rd, bvh = res
        zeros = jax.tree.map(jnp.zeros_like, (ro, rd, bvh))
        return zeros

    occlusion.defvjp(fwd, bwd)
    return occlusion


def any_hit_bruteforce(ro, rd, v0, v1, v2, tmin=1e-4, tmax=1e16):
    """Reference twin: O(R*T) Moller-Trumbore any-hit in plain jnp, for
    correctness tests (the dual-implementation strategy of the reference,
    SURVEY.md section 4)."""
    e1 = v1 - v0
    e2 = v2 - v0

    def one_ray(o, d):
        p = jnp.cross(d[None, :], e2)
        det = jnp.sum(e1 * p, -1)
        det_safe = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
        tvec = o[None, :] - v0
        u = jnp.sum(tvec * p, -1) / det_safe
        qv = jnp.cross(tvec, e1)
        v = jnp.sum(d[None, :] * qv, -1) / det_safe
        t = jnp.sum(e2 * qv, -1) / det_safe
        hit = ((jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1)
               & (t > tmin) & (t < tmax))
        return jnp.any(hit)

    return jax.vmap(one_ray)(ro, rd)
