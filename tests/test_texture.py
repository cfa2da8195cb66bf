"""Texture sampling + patch-scatter adjoint tests.

The backward of bilinear/trilinear texture taps is restructured on TPU
(one 4C-row patch scatter + rolls instead of 4/8 row scatter-adds); these
tests pin it to the plain-autodiff formulation on random pyramids, for
wrap and clamp boundaries, square and non-square textures, batch > 1, and
out-of-range uv.  Mirrors the gradient checks of
/root/reference/render/renderutils/tests/test_mip.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvdiffrecmc_tpu.ops import texture as tex_ops


def _ref_bilinear(tex, uv, boundary_mode):
    """Plain-autodiff bilinear tap (the pre-patch-adjoint formulation)."""
    n, H, W, C = tex.shape
    x = uv[..., 0] * W - 0.5
    y = uv[..., 1] * H - 0.5
    x0f, y0f = jnp.floor(x), jnp.floor(y)
    fx, fy = (x - x0f)[..., None], (y - y0f)[..., None]
    wrap = boundary_mode == 'wrap'

    def w_(u, m):
        return jnp.mod(u, m) if wrap else jnp.clip(u, 0, m - 1)

    x0 = w_(x0f.astype(jnp.int32), W)
    y0 = w_(y0f.astype(jnp.int32), H)
    x1 = w_(x0f.astype(jnp.int32) + 1, W)
    y1 = w_(y0f.astype(jnp.int32) + 1, H)
    bidx = jnp.arange(n)[:, None, None]
    a, b = tex[bidx, y0, x0], tex[bidx, y0, x1]
    c, d = tex[bidx, y1, x0], tex[bidx, y1, x1]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
            + c * fy * (1 - fx) + d * fy * fx)


def _ref_trilinear(mips, uv, uv_da, boundary_mode):
    """Plain-autodiff trilinear mip sample (pre-patch-adjoint formulation)."""
    n, H, W, C = mips[0].shape
    n_levels = len(mips)
    dx = jnp.stack([uv_da[..., 0] * W, uv_da[..., 1] * H], axis=-1)
    dy = jnp.stack([uv_da[..., 2] * W, uv_da[..., 3] * H], axis=-1)
    footprint = jnp.maximum(jnp.sum(dx * dx, -1), jnp.sum(dy * dy, -1))
    lod = 0.5 * jnp.log2(jnp.clip(footprint, min=1e-20))
    lod = jax.lax.stop_gradient(jnp.clip(lod, 0.0, n_levels - 1.0))
    l0 = jnp.clip(jnp.floor(lod).astype(jnp.int32), 0, n_levels - 1)
    l1 = jnp.clip(l0 + 1, 0, n_levels - 1)
    frac = (lod - l0.astype(jnp.float32))[..., None]

    flat, sizes, offsets = tex_ops._pack_mips(mips)
    sizes_j, offsets_j = jnp.asarray(sizes), jnp.asarray(offsets)
    bidx = jnp.arange(n)[:, None, None]
    x, y = uv[..., 0], uv[..., 1]
    wrap = boundary_mode == 'wrap'

    def tap(lvl):
        h, w, off = sizes_j[lvl, 0], sizes_j[lvl, 1], offsets_j[lvl]
        xs = x * w.astype(jnp.float32) - 0.5
        ys = y * h.astype(jnp.float32) - 0.5
        x0f, y0f = jnp.floor(xs), jnp.floor(ys)
        fx, fy = (xs - x0f)[..., None], (ys - y0f)[..., None]
        if wrap:
            x0 = jnp.mod(x0f.astype(jnp.int32), w)
            x1 = jnp.mod(x0f.astype(jnp.int32) + 1, w)
            y0 = jnp.mod(y0f.astype(jnp.int32), h)
            y1 = jnp.mod(y0f.astype(jnp.int32) + 1, h)
        else:
            x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
            x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w - 1)
            y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
            y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h - 1)
        a = flat[bidx, off + y0 * w + x0]
        b = flat[bidx, off + y0 * w + x1]
        c = flat[bidx, off + y1 * w + x0]
        d = flat[bidx, off + y1 * w + x1]
        return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
                + c * fy * (1 - fx) + d * fy * fx)

    return tap(l0) * (1 - frac) + tap(l1) * frac


def _rand_case(rng, n, h, w, c, ph, pw):
    tex = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    uv = jnp.asarray((rng.rand(n, ph, pw, 2) * 1.6 - 0.3)
                     .astype(np.float32))
    dout = jnp.asarray(rng.randn(n, ph, pw, c).astype(np.float32))
    return tex, uv, dout


@pytest.mark.parametrize('boundary', ['wrap', 'clamp'])
@pytest.mark.parametrize('shape', [(1, 16, 16, 3), (2, 8, 32, 5)])
def test_bilinear_patch_adjoint(boundary, shape):
    rng = np.random.RandomState(7)
    n, h, w, c = shape
    tex, uv, dout = _rand_case(rng, n, h, w, c, 13, 11)

    out = tex_ops.bilinear_sample(tex, uv, boundary)
    ref = _ref_bilinear(tex, uv, boundary)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    f = lambda t, u: jnp.vdot(tex_ops.bilinear_sample(t, u, boundary), dout)
    g = lambda t, u: jnp.vdot(_ref_bilinear(t, u, boundary), dout)
    dt, du = jax.grad(f, argnums=(0, 1))(tex, uv)
    rt, ru = jax.grad(g, argnums=(0, 1))(tex, uv)
    np.testing.assert_allclose(dt, rt, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(du, ru, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize('boundary', ['wrap', 'clamp'])
@pytest.mark.parametrize('shape', [(1, 32, 32, 3), (2, 16, 64, 4)])
def test_trilinear_patch_adjoint(boundary, shape):
    rng = np.random.RandomState(11)
    n, h, w, c = shape
    base = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    mips = tex_ops.build_mip_chain(base)
    ph, pw = 9, 17
    uv = jnp.asarray((rng.rand(n, ph, pw, 2) * 1.4 - 0.2)
                     .astype(np.float32))
    # footprints spanning several lods, incl. out-of-range extremes
    uv_da = jnp.asarray((rng.randn(n, ph, pw, 4) *
                         np.exp(rng.uniform(-8, 2, (n, ph, pw, 1))))
                        .astype(np.float32))
    dout = jnp.asarray(rng.randn(n, ph, pw, c).astype(np.float32))

    out = tex_ops.texture_sample(mips, uv, uv_da, boundary_mode=boundary)
    ref = _ref_trilinear(mips, uv, uv_da, boundary)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    def loss_new(b, u):
        m = tex_ops.build_mip_chain(b)
        return jnp.vdot(
            tex_ops.texture_sample(m, u, uv_da, boundary_mode=boundary),
            dout)

    def loss_ref(b, u):
        m = tex_ops.build_mip_chain(b)
        return jnp.vdot(_ref_trilinear(m, u, uv_da, boundary), dout)

    dt, du = jax.grad(loss_new, argnums=(0, 1))(base, uv)
    rt, ru = jax.grad(loss_ref, argnums=(0, 1))(base, uv)
    np.testing.assert_allclose(dt, rt, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(du, ru, rtol=1e-5, atol=1e-4)


def test_trilinear_under_jit_and_vjp_twice():
    """The packed op must survive jit + being differentiated from an outer
    trace (the session-2 closed-over-tracer lesson)."""
    rng = np.random.RandomState(3)
    base = jnp.asarray(rng.randn(1, 16, 16, 3).astype(np.float32))
    uv = jnp.asarray(rng.rand(1, 5, 7, 2).astype(np.float32))
    uv_da = jnp.asarray((rng.randn(1, 5, 7, 4) * 0.05).astype(np.float32))

    @jax.jit
    def loss(b, u):
        m = tex_ops.build_mip_chain(b)
        return jnp.sum(tex_ops.texture_sample(m, u, uv_da) ** 2)

    g1 = jax.grad(loss)(base, uv)
    g2 = jax.grad(loss)(base, uv)
    assert np.all(np.isfinite(g1))
    np.testing.assert_allclose(g1, g2, rtol=1e-6, atol=1e-6)
