"""Monte-Carlo env shading: unbiasedness against brute-force integration
(replaces the missing tracer test in the reference, per SURVEY.md section 4),
shadow correctness, and gradient flow into the light probe."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from nvdiffrecmc_tpu.ops import bvh as bvh_mod
from nvdiffrecmc_tpu.ops import envshade
from nvdiffrecmc_tpu.ops.bsdf import pbr_bsdf_demodulated
from nvdiffrecmc_tpu.render import light as light_mod


def far_bvh():
    """BVH with one distant tiny triangle (never occludes)."""
    v = jnp.array([[100.0, 100.0, 100.0], [100.1, 100.0, 100.0],
                   [100.0, 100.1, 100.0]])
    t = jnp.array([[0, 1, 2]], dtype=jnp.int32)
    return bvh_mod.build(v, t, leaf_size=16)


def random_env(h=16, w=32, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.rand(h, w, 3).astype(np.float32) ** 2 * 2 + 0.05
    return jnp.asarray(base)


def texel_dirs_solid_angles(h, w):
    ys = (np.arange(h) + 0.5) / h
    xs = (np.arange(w) + 0.5) / w
    uu, vv = np.meshgrid(xs, ys)
    phi = (uu * 2 - 1) * np.pi
    theta = vv * np.pi
    d = np.stack([np.sin(theta) * np.sin(phi), np.cos(theta),
                  -np.sin(theta) * np.cos(phi)], -1)
    dOmega = np.sin(theta) * (np.pi / h) * (2 * np.pi / w)
    return d.reshape(-1, 3), dOmega.reshape(-1)


def setup_pixels():
    """A few surface points with varied normals/materials."""
    B, H, W = 1, 2, 2
    mask = jnp.ones((B, H, W))
    nrm = jnp.asarray(np.array([[0, 0, 1], [0, 1, 0], [0.577, 0.577, 0.577],
                                [1, 0, 0]], np.float32).reshape(B, H, W, 3))
    pos = jnp.zeros((B, H, W, 3))
    view = pos + nrm * 2.0 + jnp.asarray([0.1, 0.2, 0.05])
    kd = jnp.asarray(np.array([[0.8, 0.4, 0.2], [0.2, 0.7, 0.3],
                               [0.5, 0.5, 0.5], [0.9, 0.1, 0.6]],
                              np.float32).reshape(B, H, W, 3))
    ks = jnp.asarray(np.array([[0, 0.4, 0.1], [0, 0.6, 0.0], [0, 0.3, 0.8],
                               [0, 0.9, 0.5]], np.float32).reshape(B, H, W, 3))
    ro = pos + nrm * 1e-3
    return mask, ro, pos, nrm, view, kd, ks


def brute_force_reference(base, pos, nrm, view, kd, ks):
    """Riemann-sum direct lighting over all texels (no shadows)."""
    h, w = base.shape[:2]
    dirs, dom = texel_dirs_solid_angles(h, w)
    dirs = jnp.asarray(dirs)

    P = pos.shape[0]
    diff = np.zeros((P, 3))
    spec = np.zeros((P, 3))
    L = np.asarray(base.reshape(-1, 3))
    for i in range(P):
        d_, s_ = pbr_bsdf_demodulated(
            kd[i][None], ks[i][None], pos[i][None], nrm[i][None],
            view[i][None], dirs)
        diff[i] = np.sum(np.asarray(d_) * L * dom[:, None], axis=0)
        spec[i] = np.sum(np.asarray(s_) * L * dom[:, None], axis=0)
    return diff, spec


def run_mc(base, n_seeds=6, n_samples_x=8, shadow_scale=1.0, bvh=None):
    tables = light_mod.update_pdf(base)
    mask, ro, pos, nrm, view, kd, ks = setup_pixels()
    perms = envshade.make_perms(n_samples_x, n_tables=512)
    bvh = far_bvh() if bvh is None else bvh
    acc_d, acc_s = 0.0, 0.0
    for seed in range(n_seeds):
        d, s = envshade.env_shade(
            mask, ro, pos, nrm, view, kd, ks,
            base, tables.pdf, tables.rows,
            tables.cols, bvh, perms, jnp.int32(seed), jnp.float32(shadow_scale),
            BSDF=0, n_samples_x=n_samples_x, ray_chunk=2048, k_pairs=8)
        acc_d = acc_d + np.asarray(d)
        acc_s = acc_s + np.asarray(s)
    return acc_d.reshape(-1, 3) / n_seeds, acc_s.reshape(-1, 3) / n_seeds


def test_mc_unbiased_vs_bruteforce():
    base = random_env()
    mask, ro, pos, nrm, view, kd, ks = setup_pixels()
    P = 4
    ref_d, ref_s = brute_force_reference(
        base, pos.reshape(P, 3), nrm.reshape(P, 3), view.reshape(P, 3),
        kd.reshape(P, 3), ks.reshape(P, 3))
    mc_d, mc_s = run_mc(base, n_seeds=8, n_samples_x=8)
    np.testing.assert_allclose(mc_d, ref_d, rtol=0.08, atol=0.02)
    np.testing.assert_allclose(mc_s, ref_s, rtol=0.15, atol=0.03)


def test_constant_env_diffuse_equals_radiance():
    """For constant L0 and no occlusion, demodulated diffuse == L0."""
    base = jnp.ones((16, 32, 3)) * 0.7
    mc_d, _ = run_mc(base, n_seeds=4, n_samples_x=8)
    np.testing.assert_allclose(mc_d, 0.7, rtol=0.05)


def test_shadowed_hemisphere():
    """A large blocking quad above the surface kills (almost) all light."""
    v = jnp.array([[-50.0, -50.0, 0.5], [50.0, -50.0, 0.5], [50.0, 50.0, 0.5],
                   [-50.0, 50.0, 0.5]])
    t = jnp.array([[0, 1, 2], [0, 2, 3]], dtype=jnp.int32)
    blocker = bvh_mod.build(v, t, leaf_size=16)
    base = jnp.ones((16, 32, 3)) * 1.0
    mc_d, _ = run_mc(base, n_seeds=2, n_samples_x=8, bvh=blocker)
    # pixel 0 has normal +z -> fully blocked above
    assert mc_d[0].max() < 0.02

    # shadow_scale = 0 disables shadows entirely
    mc_d2, _ = run_mc(base, n_seeds=2, n_samples_x=8, shadow_scale=0.0,
                      bvh=blocker)
    np.testing.assert_allclose(mc_d2[0], 1.0, rtol=0.06)


def test_light_gradient_flows():
    base = random_env()
    tables = light_mod.update_pdf(base)
    mask, ro, pos, nrm, view, kd, ks = setup_pixels()
    perms = envshade.make_perms(4, n_tables=64)
    bvh = far_bvh()

    def f(b):
        d, s = envshade.env_shade(
            mask, ro, pos, nrm, view, kd, ks, b,
            tables.pdf, tables.rows, tables.cols,
            bvh, perms, jnp.int32(0), jnp.float32(1.0), BSDF=0, n_samples_x=4,
            ray_chunk=512, k_pairs=8)
        return jnp.sum(d) + jnp.sum(s)

    g = jax.grad(f)(base)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0

    # gbuffer gradients too
    def f2(n):
        d, s = envshade.env_shade(
            mask, ro, pos, n, view, kd, ks, base,
            tables.pdf, tables.rows, tables.cols,
            bvh, perms, jnp.int32(0), jnp.float32(1.0), BSDF=0, n_samples_x=4,
            ray_chunk=512, k_pairs=8)
        return jnp.sum(d * jnp.array([0.2, 0.3, 0.5]))

    g2 = jax.grad(f2)(nrm)
    assert np.all(np.isfinite(np.asarray(g2)))
    assert float(jnp.abs(g2).sum()) > 0
