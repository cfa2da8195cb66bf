"""Shadow tracer correctness: wavefront BVH any-hit vs brute-force
Moller-Trumbore twin on random meshes and rays."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from nvdiffrecmc_tpu.ops import bvh as bvh_mod
from nvdiffrecmc_tpu.ops import tracer


def icosphere_like(n_tri=400, seed=0):
    """Random triangle soup on a unit sphere surface (small tangent tris)."""
    rng = np.random.RandomState(seed)
    c = rng.randn(n_tri, 3)
    c /= np.linalg.norm(c, axis=-1, keepdims=True)
    # two tangent directions
    a = np.cross(c, [0, 0, 1.0])
    a /= np.linalg.norm(a, axis=-1, keepdims=True) + 1e-9
    b = np.cross(c, a)
    s = 0.15
    v0 = c + s * (rng.randn(n_tri, 1) * a + rng.randn(n_tri, 1) * b)
    v1 = c + s * (rng.randn(n_tri, 1) * a + rng.randn(n_tri, 1) * b)
    v2 = c + s * (rng.randn(n_tri, 1) * a + rng.randn(n_tri, 1) * b)
    verts = np.concatenate([v0, v1, v2], 0).astype(np.float32)
    tris = np.arange(3 * n_tri, dtype=np.int32).reshape(3, n_tri).T
    return jnp.asarray(verts), jnp.asarray(tris)


def test_any_hit_matches_bruteforce():
    v, t = icosphere_like(400)
    bvh = bvh_mod.build(v, t, leaf_size=16)

    rng = np.random.RandomState(1)
    R = 2048
    ro = jnp.asarray(rng.uniform(-2, 2, (R, 3)).astype(np.float32))
    rd = rng.randn(R, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd)

    got = np.asarray(tracer.any_hit(ro, rd, bvh, ray_chunk=2048, k_pairs=32))
    want = np.asarray(tracer.any_hit_bruteforce(
        ro, rd, v[t[:, 0]], v[t[:, 1]], v[t[:, 2]]))
    agree = (got == want).mean()
    assert agree > 0.999, f"agreement {agree}, diffs={np.sum(got != want)}"
    assert want.mean() > 0.04  # sanity: some rays do hit


def test_any_hit_origin_on_surface():
    """Rays leaving a closed-ish surface outward shouldn't self-hit with
    tmin epsilon; rays inward must hit."""
    # single big triangle; rays start just above it
    v = jnp.array([[-1.0, -1.0, 0.0], [1.0, -1.0, 0.0], [0.0, 1.0, 0.0]])
    t = jnp.array([[0, 1, 2]], dtype=jnp.int32)
    bvh = bvh_mod.build(v, t, leaf_size=16)
    ro = jnp.array([[0.0, -0.2, 0.01]] * 8)
    up = jnp.array([[0.0, 0.0, 1.0]] * 8)
    down = -up
    assert not np.any(np.asarray(tracer.any_hit(ro, up, bvh, ray_chunk=8)))
    assert np.all(np.asarray(tracer.any_hit(ro, down, bvh, ray_chunk=8)))


def test_any_hit_masked_triangles_ignored():
    v, t = icosphere_like(128, seed=3)
    mask = jnp.zeros((t.shape[0],), bool)  # everything masked out
    bvh = bvh_mod.build(v, t, tri_mask=mask, leaf_size=16)
    rng = np.random.RandomState(2)
    ro = jnp.asarray(rng.uniform(-2, 2, (256, 3)).astype(np.float32))
    rd = jnp.asarray(rng.randn(256, 3).astype(np.float32))
    occ = np.asarray(tracer.any_hit(ro, rd, bvh, ray_chunk=256))
    assert not occ.any()


def test_disabled_rays_never_hit():
    v, t = icosphere_like(64, seed=4)
    bvh = bvh_mod.build(v, t, leaf_size=16)
    ro = jnp.full((16, 3), tracer.BIG)
    rd = jnp.zeros((16, 3))
    occ = np.asarray(tracer.any_hit(ro, rd, bvh, ray_chunk=16))
    assert not occ.any()


def test_pallas_kernel_interpret_matches_bruteforce():
    """Pallas kernel in interpreter mode (CPU) vs brute-force twin."""
    from nvdiffrecmc_tpu.ops.pallas_tracer import any_hit_pallas
    v, t = icosphere_like(96, seed=7)
    bvh = bvh_mod.build(v, t, leaf_size=16)
    rng = np.random.RandomState(5)
    R = 256
    ro = jnp.asarray(rng.uniform(-2, 2, (R, 3)).astype(np.float32))
    rd = rng.randn(R, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd)
    got = np.asarray(any_hit_pallas(ro, rd, bvh, ray_block=128, interpret=True))
    want = np.asarray(tracer.any_hit_bruteforce(
        ro, rd, v[t[:, 0]], v[t[:, 1]], v[t[:, 2]], tmin=0.0))
    assert (got == want).mean() > 0.99


@pytest.mark.parametrize('leaf_batch,early_exit',
                         [('0', '0'), ('1', '0'), ('2', '0'), ('8', '0'),
                          ('4', '1')])
def test_pallas_kernel_leaf_batch_variants(monkeypatch, leaf_batch,
                                           early_exit):
    """The streaming-loop variants (leaf_batch rounds with deferred lane
    reduce; early-exit groups) all agree with the one-leaf result."""
    from nvdiffrecmc_tpu.ops import pallas_tracer
    v, t = icosphere_like(96, seed=7)
    bvh = bvh_mod.build(v, t, leaf_size=16)
    rng = np.random.RandomState(6)
    R = 256
    ro = jnp.asarray(rng.uniform(-2, 2, (R, 3)).astype(np.float32))
    rd = rng.randn(R, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd)
    want = np.asarray(tracer.any_hit_bruteforce(
        ro, rd, v[t[:, 0]], v[t[:, 1]], v[t[:, 2]], tmin=0.0))

    monkeypatch.setenv('NVDR_LEAF_BATCH', leaf_batch)
    monkeypatch.setenv('NVDR_EARLY_EXIT', early_exit)
    # trace_rayf reads the env at trace time; bypass any_hit_pallas's jit
    # cache (same static args would otherwise reuse the old trace)
    rayf = bvh_mod.ray_features(ro, rd)
    pad = (-R) % 128
    rayf = jnp.pad(rayf, ((0, pad), (0, 0)))
    got = np.asarray(pallas_tracer.trace_rayf(
        rayf, bvh, ray_block=128, interpret=True))[:R]
    assert (got == want).mean() > 0.99


def test_xor_epilogue_matches_bruteforce(monkeypatch):
    """NVDR_XOR_EPILOGUE sign-bit decode vs brute force (and vs the
    product-form decode away from measure-zero edges)."""
    v, t = icosphere_like(400, seed=13)
    bvh = bvh_mod.build(v, t, leaf_size=16)
    rng = np.random.RandomState(14)
    R = 1024
    ro = jnp.asarray(rng.uniform(-2, 2, (R, 3)).astype(np.float32))
    rd = rng.randn(R, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd)
    want = np.asarray(tracer.any_hit_bruteforce(
        ro, rd, v[t[:, 0]], v[t[:, 1]], v[t[:, 2]]))

    monkeypatch.setenv('NVDR_XOR_EPILOGUE', '1')
    jax.clear_caches()  # env is read at trace time
    try:
        got = np.asarray(tracer.any_hit(ro, rd, bvh, ray_chunk=1024,
                                        k_pairs=32))
    finally:
        monkeypatch.delenv('NVDR_XOR_EPILOGUE')
        jax.clear_caches()
    agree = (got == want).mean()
    assert agree > 0.999, f"agreement {agree}"


def test_overflow_counter_surfaces_dropped_pairs():
    """k_pairs cap overflow must be counted, not silent (the Pallas backend
    has no cap; this guards the jnp reference backend)."""
    v, t = icosphere_like(400, seed=8)
    bvh = bvh_mod.build(v, t, leaf_size=16)
    rng = np.random.RandomState(9)
    R = 512
    ro = jnp.asarray(rng.uniform(-2, 2, (R, 3)).astype(np.float32))
    rd = rng.randn(R, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd)
    _, dropped_big = tracer.any_hit_counted(ro, rd, bvh, ray_chunk=512,
                                            k_pairs=32)
    assert int(dropped_big) == 0
    _, dropped_tiny = tracer.any_hit_counted(ro, rd, bvh, ray_chunk=512,
                                             k_pairs=1)
    assert int(dropped_tiny) > 0


def test_any_hit_large_scene_stress():
    """~100k-triangle scene vs brute force (VERDICT: cap behavior must be
    validated at scale; Pallas path visits every leaf so the jnp twin with a
    generous cap is the reference here)."""
    v, t = icosphere_like(100_000, seed=11)
    bvh = bvh_mod.build(v, t, leaf_size=128)
    rng = np.random.RandomState(12)
    R = 256
    ro = jnp.asarray(rng.uniform(-2, 2, (R, 3)).astype(np.float32))
    rd = rng.randn(R, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd)
    got, dropped = tracer.any_hit_counted(ro, rd, bvh, ray_chunk=256,
                                          k_pairs=512)
    assert int(dropped) == 0
    want = np.asarray(tracer.any_hit_bruteforce(
        ro, rd, v[t[:, 0]], v[t[:, 1]], v[t[:, 2]]))
    agree = (np.asarray(got) == want).mean()
    assert agree > 0.995, f"agreement {agree}"
    assert want.mean() > 0.1  # sanity: a nontrivial fraction of rays hit
