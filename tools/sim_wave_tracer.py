"""Offline economics simulation for the per-ray wave-compaction tracer
(PERF_NOTES round-5 plan) on the real pass-1 workload.

Builds the DMTet random-SDF blob scene on CPU, samples shadow rays from its
G-buffer the way the fused shade does, computes per-ray ground truth (which
leaves each ray overlaps, and the nearest leaf at which it is occluded),
then compares total ROW-VISITS (the unit the stage-C kernel pays for:
one ray-row x one leaf) under:

  A. current per-block scheme: every ray pays its block's visit-list union
  B. wave rounds of W leaves, near-to-far, with generation re-blocking:
     alive rays compacted (stable, by original block) after every round;
     merged blocks pay the union of their constituents' next segments
  C. oracle per-ray: every ray pays exactly its own leaves up to its
     occlusion leaf (lower bound)

Run: JAX_PLATFORMS=cpu python tools/sim_wave_tracer.py [n_rays]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import numpy as np
import jax

# the axon TPU plugin ignores JAX_PLATFORMS (registers via sitecustomize);
# jax.config is the only switch that works on this machine (tests/conftest)
jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp


def build_scene():
    import train as train_mod
    from nvdiffrecmc_tpu.geometry import DMTetGeometry
    from nvdiffrecmc_tpu.render import render as render_mod
    import bench

    res = 256  # smaller G-buffer than train (CPU): same geometry though
    FLAGS = train_mod.parse_flags([])
    FLAGS.update(dict(train_res=[res, res], n_samples=1, batch=1, iter=8,
                      layers=1, spp=1, dmtet_grid=64, mesh_scale=2.1))
    geometry = DMTetGeometry(64, 2.1, FLAGS)
    mat_params, mat_static = train_mod.initial_guess_material(
        geometry, True, FLAGS)
    mat_static['no_perturbed_nrm'] = True
    material = train_mod.make_material(mat_params, mat_static)
    mesh, bvh = geometry.getMesh(geometry.init_params, material)
    target = bench._spot_target(res, rng_seed=3)
    _, layers = render_mod.render_gbuffer(
        dict(FLAGS), mesh, target['mvp'], target['campos'], (res, res), 1,
        1, False, 'pbr', jax.random.PRNGKey(0))
    pre = layers[0][0]
    P = res * res
    mask = np.asarray(pre['rast_id'] > 0).reshape(P)
    pos = np.asarray(pre['gb_pos']).reshape(P, 3)
    nrm = np.asarray(pre['gb_normal_shaded']).reshape(P, 3)
    return mesh, bvh, mask, pos, nrm


def ray_leaf_ground_truth(bvh, ro, rd, chunk=512):
    """For each ray: leaf overlap mask [R, C] and index of its occluding
    leaf in near-to-far order (C if never occluded)."""
    from nvdiffrecmc_tpu.ops.bvh import ray_features, decode_hits, N_FIELDS
    lo = np.asarray(bvh.aabb_lo)
    hi = np.asarray(bvh.aabb_hi)
    C = lo.shape[0]
    L = bvh.leaf_size
    tri_mat = np.asarray(bvh.tri_mat, np.float32)      # [C, 16, 5L]
    R = ro.shape[0]

    inv = np.where(np.abs(rd) > 1e-12, 1.0 / np.where(rd == 0, 1, rd), 2e12)
    overlap = np.zeros((R, C), bool)
    occ_at = np.full((R,), C, np.int32)

    cen = (lo + hi) * 0.5
    rayf = np.asarray(ray_features(jnp.asarray(ro), jnp.asarray(rd)),
                      np.float32)

    for s in range(0, R, chunk):
        e = min(s + chunk, R)
        o, d, ig = ro[s:e], rd[s:e], inv[s:e]
        tn = np.zeros((e - s, C), np.float32)
        tf = np.full((e - s, C), 1e16, np.float32)
        for ax in range(3):
            t0 = (lo[None, :, ax] - o[:, None, ax]) * ig[:, None, ax]
            t1 = (hi[None, :, ax] - o[:, None, ax]) * ig[:, None, ax]
            tn = np.maximum(tn, np.minimum(t0, t1))
            tf = np.minimum(tf, np.maximum(t0, t1))
        ov = tf >= tn
        overlap[s:e] = ov

        # per-ray near-to-far leaf order by entry distance tn
        order = np.argsort(np.where(ov, tn, 3e38), axis=1)
        # triangle test per (ray, overlapped leaf) — chunk the leaves
        rf = rayf[s:e]                                   # [r, 16]
        hit_leaf = np.zeros((e - s, C), bool)
        for c0 in range(0, C, 64):
            c1 = min(c0 + 64, C)
            # [r, 16] @ [c, 16, 5L] -> [c, r, 5L]
            E = np.einsum('rk,ckf->crf', rf, tri_mat[c0:c1])
            h = np.asarray(decode_hits(jnp.asarray(E), L))   # [c, r, L]
            hit_leaf[:, c0:c1] = h.any(-1).T & ov[:, c0:c1]
        # first (near-to-far) position whose leaf has a hit
        hit_sorted = np.take_along_axis(hit_leaf, order, axis=1)
        first = np.argmax(hit_sorted, axis=1)
        has = hit_sorted.any(axis=1)
        occ_at[s:e] = np.where(has, first, C)
    return overlap, occ_at


def simulate(overlap, occ_at, mask, block=2048, W=16):
    R, C = overlap.shape
    Rb = (R // block) * block
    overlap, occ_at, mask = overlap[:Rb], occ_at[:Rb], mask[:Rb]
    NB = Rb // block

    # ground-truth per-ray need (oracle): leaves until occlusion (or all
    # its overlapped leaves for sky rays)
    n_ov = overlap.sum(1)
    need = np.where(occ_at < C, occ_at + 1, n_ov)
    oracle = int(need[mask].sum())

    # A: current — every MASKED ray pays its block's union size
    blk_union = overlap.reshape(NB, block, C).any(1).sum(1)   # [NB]
    alive_rows = mask.reshape(NB, block).sum(1)
    cur = int((blk_union * alive_rows).sum())

    # B: wave rounds with generation re-blocking.  Rays sorted stable by
    # original block each round; a new block's cost = union of its
    # members' next W-leaf segments (approximated as W * number of
    # distinct original blocks present, capped by that union's true size
    # bound C).  Death schedule from occ_at (near-to-far lists).
    alive = mask.copy()
    rounds = 0
    total = 0
    orig_block = np.repeat(np.arange(NB), block)
    seg = np.zeros(Rb, np.int32)            # per-ray current segment id
    while alive.any() and rounds < (C + W - 1) // W:
        idx = np.nonzero(alive)[0]
        # stable grouping by original block
        idx = idx[np.argsort(orig_block[idx], kind='stable')]
        nblocks = (len(idx) + block - 1) // block
        for b in range(nblocks):
            members = idx[b * block:(b + 1) * block]
            # distinct (orig block, segment) pairs in this new block
            pairs = set(zip(orig_block[members].tolist(),
                            seg[members].tolist()))
            union = min(len(pairs) * W, C)
            total += union * len(members)
        # kill rays whose occlusion leaf falls inside their current segment
        kill = (occ_at < (seg + 1) * W) & alive
        alive = alive & ~kill
        seg = seg + 1
        rounds += 1
    return cur, total, oracle, rounds


def main():
    n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    print('building blob scene (CPU)...', flush=True)
    mesh, bvh, mask, pos, nrm = build_scene()
    rng = np.random.RandomState(0)
    sel = rng.choice(pos.shape[0], n_rays, replace=False)
    mask, pos, nrm = mask[sel], pos[sel], nrm[sel]
    # bsdf-style rays: cosine-ish hemisphere around the (noisy) normal
    d = rng.randn(n_rays, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    flip = (d * nrm).sum(1) < 0
    d[flip] = -d[flip]
    ro = (pos + nrm * 1e-3).astype(np.float32)

    # emulate the coherence sort: order rays by normal octant (stable)
    okey = ((nrm[:, 0] > 0) * 4 + (nrm[:, 1] > 0) * 2 + (nrm[:, 2] > 0))
    okey = np.where(mask, okey, 8)
    order = np.argsort(okey, kind='stable')
    mask, ro, d = mask[order], ro[order], d[order]

    print('computing per-ray ground truth...', flush=True)
    overlap, occ_at = ray_leaf_ground_truth(bvh, ro, d)
    occl = (occ_at < overlap.shape[1])[mask].mean()
    print('rays %d  leaves %d  occluded %.2f  mean overlap %.1f' %
          (n_rays, overlap.shape[1], occl, overlap.sum(1)[mask].mean()),
          flush=True)
    for W in (8, 16, 32):
        for block in (1024, 2048):
            cur, wave, oracle, rounds = simulate(overlap, occ_at, mask,
                                                 block=block, W=W)
            print('block %4d W %2d: current %.2fM  wave %.2fM (%.1fx)  '
                  'oracle %.2fM (%.1fx)  rounds %d' %
                  (block, W, cur / 1e6, wave / 1e6, cur / max(wave, 1),
                   oracle / 1e6, cur / max(oracle, 1), rounds), flush=True)


if __name__ == '__main__':
    main()
