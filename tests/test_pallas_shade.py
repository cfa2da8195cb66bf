"""Fused MC-shade pipeline: stage-A sampling kernel vs its jnp twin, and
semantic checks against the envshade reference math."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvdiffrecmc_tpu.ops import envshade
from nvdiffrecmc_tpu.ops import pallas_shade as ps


HL, WL = 32, 64
N_SAMPLES_X = 2
N2 = N_SAMPLES_X * N_SAMPLES_X
P = 256  # one small ray block


def dyadic_probe(seed=0):
    """Light probe whose pdf/cdf tables are exactly representable in
    bfloat16, so the kernel's bf16 one-hot gathers are bit-exact against
    the fp32 twin."""
    rng = np.random.RandomState(seed)
    base = (rng.randint(1, 9, (HL, WL, 3)) / 8.0).astype(np.float32)
    return jnp.asarray(base)


def make_tables(base):
    from nvdiffrecmc_tpu.render import light as light_mod
    t = light_mod.update_pdf(base)
    # round tables to bf16-exact values (keeps them valid CDFs: monotone,
    # final entry 1.0 survives rounding since 1.0 is exact)
    rnd = lambda x: jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32)
    return rnd(t.pdf), rnd(t.rows), rnd(t.cols)


def make_inputs(seed=1):
    rng = np.random.RandomState(seed)
    nrm = rng.randn(3, P).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=0, keepdims=True)
    wo = rng.randn(3, P).astype(np.float32)
    wo /= np.linalg.norm(wo, axis=0, keepdims=True)
    # flip wo into the normal hemisphere for most pixels (leave a few back)
    flip = (np.sum(nrm * wo, 0) < 0) & (rng.rand(P) < 0.9)
    wo = np.where(flip[None], -wo, wo)
    alpha = rng.uniform(0.08, 0.7, (1, P)).astype(np.float32) ** 2
    p_diffuse = rng.uniform(0.0, 1.0, (1, P)).astype(np.float32)
    gb8 = jnp.asarray(np.concatenate([nrm, wo, alpha, p_diffuse], 0))
    u8 = ps.make_uniforms(jax.random.PRNGKey(seed), N2, P, N_SAMPLES_X)
    return u8, gb8


def test_stage_a_kernel_matches_twin():
    base = dyadic_probe()
    pdf, rows, cols = make_tables(base)
    u8, gb8 = make_inputs()
    got = ps.sample_all(u8, gb8, rows, cols, pdf, base, N_SAMPLES_X,
                        ray_block=P, interpret=True)
    want = ps.sample_all_jnp(u8, gb8, rows, cols, pdf, base, N_SAMPLES_X)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_stage_a_light_sampling_unbiased():
    """E[L(d)/pdf(d)] over light-importance samples must equal the
    analytically-integrated probe radiance."""
    base = dyadic_probe(seed=3)
    pdf, rows, cols = make_tables(base)
    Pbig = 8192
    rng = np.random.RandomState(4)
    nrm = np.tile(np.array([[0.0], [1.0], [0.0]], np.float32), (1, Pbig))
    wo = nrm.copy()
    gb8 = jnp.asarray(np.concatenate(
        [nrm, wo, np.full((1, Pbig), 0.2, np.float32),
         np.full((1, Pbig), 0.5, np.float32)], 0))
    u8 = ps.make_uniforms(jax.random.PRNGKey(5), N2, Pbig, N_SAMPLES_X)
    samp = ps.sample_all_jnp(u8, gb8, rows, cols, pdf, base, N_SAMPLES_X)

    # exclude the bsdf-lobe MIS term: divide radiance by the pure light pdf
    # (recompute from tables at the sampled texel)
    tex = np.asarray(samp[:, ps.S_LTEX]).astype(np.int64).reshape(-1)
    y, x = tex // WL, tex % WL
    pdf_np = np.asarray(pdf)
    vv = (np.asarray(samp[:, ps.S_LDIR + 1]).reshape(-1))  # dir y component
    theta_w = (WL * HL) / (2 * math.pi ** 2
                           * np.maximum(np.sin(np.arccos(
                               np.clip(vv, -1, 1))), 1e-4))
    pure_pdf = pdf_np[y, x] * theta_w
    lum = np.asarray(samp[:, ps.S_LRAD:ps.S_LRAD + 3]).transpose(
        0, 2, 1).reshape(-1, 3).mean(-1)
    est = (lum / np.maximum(pure_pdf, 1e-12)).mean()

    HH = np.arange(HL)
    sin_th = np.sin((HH + 0.5) / HL * math.pi)
    d_omega = (math.pi / HL) * (2 * math.pi / WL) * sin_th
    want = float((np.asarray(base).mean(-1) * d_omega[:, None]).sum())
    assert abs(est - want) / want < 0.05, (est, want)


def test_component_math_matches_envshade_arrays():
    """bsdf_pdf_c / bsdf_sample_c (component form) vs envshade's array
    implementations on random inputs."""
    rng = np.random.RandomState(7)
    K = 512
    nrm = rng.randn(K, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, -1, keepdims=True)
    wo = rng.randn(K, 3).astype(np.float32)
    wo /= np.linalg.norm(wo, -1, keepdims=True)
    wi = rng.randn(K, 3).astype(np.float32)
    wi /= np.linalg.norm(wi, -1, keepdims=True)
    alpha = rng.uniform(0.08, 0.9, K).astype(np.float32) ** 2
    pd = rng.uniform(0, 1, K).astype(np.float32)
    u = rng.uniform(0, 1, K).astype(np.float32)
    v = rng.uniform(0, 1, K).astype(np.float32)
    z = rng.uniform(0, 1, K).astype(np.float32)

    rows = lambda a: tuple(jnp.asarray(a[:, i]) for i in range(3))
    want_pdf = envshade.bsdf_pdf_fn(jnp.asarray(pd), jnp.asarray(nrm),
                                    jnp.asarray(wo), jnp.asarray(wi),
                                    jnp.asarray(alpha))
    got_pdf = ps.bsdf_pdf_c(jnp.asarray(pd), rows(nrm), rows(wo), rows(wi),
                            jnp.asarray(alpha))
    # component form uses rsqrt-based normalize: ~2e-3 rel rounding skew
    np.testing.assert_allclose(np.asarray(got_pdf), np.asarray(want_pdf),
                               rtol=5e-3, atol=5e-4)

    want_dir, want_spdf = envshade.bsdf_sample(
        jnp.asarray(pd), jnp.asarray(nrm), jnp.asarray(wo), jnp.asarray(u),
        jnp.asarray(v), jnp.asarray(z), jnp.asarray(alpha))
    got_dir, got_spdf = ps.bsdf_sample_c(
        jnp.asarray(pd), rows(nrm), rows(wo), jnp.asarray(u),
        jnp.asarray(v), jnp.asarray(z), jnp.asarray(alpha))
    got_dir = np.stack([np.asarray(c) for c in got_dir], -1)
    np.testing.assert_allclose(got_dir, np.asarray(want_dir),
                               rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got_spdf), np.asarray(want_spdf),
                               rtol=5e-3, atol=1e-3)


def test_poly_transcendentals():
    x = jnp.linspace(-1, 1, 1001)
    np.testing.assert_allclose(np.asarray(ps.acos_poly(x)),
                               np.arccos(np.asarray(x)), atol=1.5e-4)
    rng = np.random.RandomState(8)
    a = rng.randn(1000).astype(np.float32)
    b = rng.randn(1000).astype(np.float32)
    # ~2e-4 rad max error; a light-probe texel spans 2*pi/W >~ 0.01 rad
    np.testing.assert_allclose(
        np.asarray(ps.atan2_poly(jnp.asarray(a), jnp.asarray(b))),
        np.arctan2(a, b), atol=3e-4)


# ---------------------------------------------------------------------------
# Integrated fused env_shade vs jnp twin (values + gradients)
# ---------------------------------------------------------------------------

def _scene(P_side=16, seed=21):
    """Fabricated G-buffer over a ground plane with a triangle blocker
    overhead: clear geometry so fp32 visibility agrees between backends."""
    from nvdiffrecmc_tpu.ops import bvh as bvh_mod
    rng = np.random.RandomState(seed)
    B, H, W = 1, P_side, P_side
    xs = np.linspace(-1, 1, W, dtype=np.float32)
    zs = np.linspace(-1, 1, H, dtype=np.float32)
    gx, gz = np.meshgrid(xs, zs)
    pos = np.stack([gx, np.zeros_like(gx), gz], -1)[None]
    nrm = np.zeros_like(pos)
    nrm[..., 1] = 1.0
    view = pos + np.array([0.3, 2.0, 0.1], np.float32)
    kd = rng.uniform(0.2, 0.9, pos.shape).astype(np.float32)
    ks = np.stack([np.zeros_like(gx),
                   rng.uniform(0.3, 0.8, gx.shape),
                   rng.uniform(0.0, 1.0, gx.shape)], -1)[None].astype(
                       np.float32)
    mask = np.ones((B, H, W), np.float32)
    mask[:, :2, :2] = 0.0
    ro = pos + nrm * 1e-3

    # blocker: big triangle hovering over one quadrant
    v = jnp.asarray(np.array([[-1.0, 0.5, -1.0], [0.0, 0.5, -1.0],
                              [-1.0, 0.5, 0.0]], np.float32))
    t = jnp.asarray(np.array([[0, 1, 2]], np.int32))
    bvh = bvh_mod.build(v, t, leaf_size=16)
    j = jnp.asarray
    return (j(mask), j(ro), j(pos), j(nrm), j(view), j(kd), j(ks)), bvh


def _light_setup():
    base = dyadic_probe(seed=9)
    pdf, rows, cols = make_tables(base)
    return base, pdf, rows, cols


def test_fused_fwd_matches_twin():
    from nvdiffrecmc_tpu.ops.pallas_shade import (env_shade_fused,
                                                  env_shade_fused_jnp)
    (mask, ro, pos, nrm, view, kd, ks), bvh = _scene()
    base, pdf, rows, cols = _light_setup()
    args = (mask, ro, pos, nrm, view, kd, ks, base, pdf, rows, cols, bvh,
            None, 7, 0.75)
    kw = dict(BSDF=0, n_samples_x=2)
    d1, s1 = env_shade_fused(*args, ray_block=64, interpret=True, **kw)
    d2, s2 = env_shade_fused_jnp(*args, **kw)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-4, atol=1e-5)
    assert float(jnp.abs(d1).sum()) > 0.1  # sanity: non-trivial image


def test_fused_grads_match_twin():
    from nvdiffrecmc_tpu.ops.pallas_shade import (env_shade_fused,
                                                  env_shade_fused_jnp)
    (mask, ro, pos, nrm, view, kd, ks), bvh = _scene()
    base, pdf, rows, cols = _light_setup()
    rng = np.random.RandomState(31)
    gd = jnp.asarray(rng.randn(*pos.shape).astype(np.float32))
    gs = jnp.asarray(rng.randn(*pos.shape).astype(np.float32))

    def loss(fn, base_, pos_, nrm_, view_, kd_, ks_, **kw):
        d, s = fn(mask, ro, pos_, nrm_, view_, kd_, ks_, base_, pdf, rows,
                  cols, bvh, None, 7, 0.75, BSDF=0, n_samples_x=2, **kw)
        return jnp.sum(d * gd) + jnp.sum(s * gs)

    g1 = jax.grad(lambda *a: loss(env_shade_fused, *a, ray_block=64,
                                  interpret=True),
                  argnums=(0, 1, 2, 3, 4, 5))(base, pos, nrm, view, kd, ks)
    g2 = jax.grad(lambda *a: loss(env_shade_fused_jnp, *a),
                  argnums=(0, 1, 2, 3, 4, 5))(base, pos, nrm, view, kd, ks)
    names = ['base', 'pos', 'nrm', 'view', 'kd', 'ks']
    for n, a, b in zip(names, g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=n)


def test_fused_grads_through_shared_upstream():
    """In the train step, ro = pos + n*eps shares upstream params with pos —
    the custom_vjp must not be differentiated w.r.t. closed-over values
    (regression: CustomVJPException on TPU bench)."""
    from nvdiffrecmc_tpu.ops.pallas_shade import env_shade_fused
    (mask, ro, pos, nrm, view, kd, ks), bvh = _scene(P_side=8)
    base, pdf, rows, cols = _light_setup()

    from nvdiffrecmc_tpu.ops import bvh as bvh_mod
    v0 = jnp.asarray(np.array([[-1.0, 0.5, -1.0], [0.0, 0.5, -1.0],
                               [-1.0, 0.5, 0.0]], np.float32))
    t0 = jnp.asarray(np.array([[0, 1, 2]], np.int32))

    def loss(pos0, verts):
        p = pos0 * 1.0
        r = p + nrm * 1e-3
        bv = bvh_mod.build(verts, t0, leaf_size=16)  # bvh from diff'd verts
        d, s = env_shade_fused(mask, r, p, nrm, view, kd, ks, base, pdf,
                               rows, cols, bv, None, 3, 1.0, BSDF=0,
                               n_samples_x=2, ray_block=64, interpret=True)
        return jnp.sum(d) + jnp.sum(s)

    g, gv = jax.grad(loss, argnums=(0, 1))(pos, v0)
    assert np.all(np.isfinite(np.asarray(g)))
    np.testing.assert_array_equal(np.asarray(gv), 0.0)


def test_fused_grads_under_outer_jit():
    """grad(jit-traced loss) — the bench/train pattern.  Regression for
    leaked closure tracers ("No constant handler for DynamicJaxprTracer")."""
    from nvdiffrecmc_tpu.ops.pallas_shade import env_shade_fused
    (mask, ro, pos, nrm, view, kd, ks), bvh = _scene(P_side=8)
    base, pdf, rows, cols = _light_setup()

    @jax.jit
    def gradfn(pos0, base0):
        def loss(p, b):
            r = p + nrm * 1e-3
            d, s = env_shade_fused(mask, r, p, nrm, view, kd, ks, b, pdf,
                                   rows, cols, bvh, None, 3, 0.5, BSDF=0,
                                   n_samples_x=2, ray_block=64,
                                   interpret=True)
            return jnp.sum(d) + jnp.sum(s)
        return jax.grad(loss, argnums=(0, 1))(pos0, base0)

    g_pos, g_base = gradfn(pos, base)
    assert np.all(np.isfinite(np.asarray(g_pos)))
    assert np.all(np.isfinite(np.asarray(g_base)))
