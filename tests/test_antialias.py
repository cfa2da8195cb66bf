"""Antialias tests: silhouette blending behavior and — critically — that
coverage gradients w.r.t. vertex positions match finite differences of the
antialiased coverage sum (the signal that drives shape optimization)."""

import jax
import jax.numpy as jnp
import numpy as np

from nvdiffrecmc_tpu.ops import rasterizer as ras
from nvdiffrecmc_tpu.ops.antialias import antialias


def make_quad(half=0.3, z=0.0):
    v = jnp.array([[-half, -half, z, 1.0], [half, -half, z, 1.0],
                   [half, half, z, 1.0], [-half, half, z, 1.0]])
    t = jnp.array([[0, 1, 2], [0, 2, 3]], dtype=jnp.int32)
    return v[None], t


def render_coverage(v, t, res=32):
    rast, _ = ras.rasterize(v, t, (res, res))
    mask = (rast[..., 3:4] > 0).astype(jnp.float32)
    color = jnp.concatenate([mask, mask, mask], axis=-1)
    return antialias(color, rast, v, t)


def test_aa_blends_silhouette():
    v, t = make_quad(0.3)
    out = np.asarray(render_coverage(v, t, 32))
    # without AA coverage is binary; with AA some boundary pixels are fractional
    frac = ((out[..., 0] > 0.01) & (out[..., 0] < 0.99)).sum()
    assert frac > 0


def test_aa_coverage_gradient_matches_fd():
    """d(total coverage)/d(quad half-size) should approximate the analytic
    perimeter growth, and must match finite differences of the AA output."""
    t = jnp.array([[0, 1, 2], [0, 2, 3]], dtype=jnp.int32)
    res = 64

    def total_cov(half):
        v = jnp.stack([
            jnp.stack([-half, -half, jnp.float32(0.0), jnp.float32(1.0)]),
            jnp.stack([half, -half, jnp.float32(0.0), jnp.float32(1.0)]),
            jnp.stack([half, half, jnp.float32(0.0), jnp.float32(1.0)]),
            jnp.stack([-half, half, jnp.float32(0.0), jnp.float32(1.0)]),
        ])[None]
        out = render_coverage(v, t, res)
        return jnp.sum(out[..., 0])

    g_ad = float(jax.grad(total_cov)(jnp.float32(0.3)))
    # AA coverage is continuous piecewise-linear; average the slope over many
    # kink segments (wide eps) when comparing against finite differences.
    eps = 8e-3
    g_fd = float((total_cov(jnp.float32(0.3 + eps)) - total_cov(jnp.float32(0.3 - eps))) / (2 * eps))
    # analytic: coverage = (half*res)^2 px -> d/dhalf = 2*half*res^2 = 2457.6
    analytic = 2 * 0.3 * res * res
    assert g_fd > 0 and g_ad > 0
    np.testing.assert_allclose(g_ad, analytic, rtol=0.05)
    np.testing.assert_allclose(g_fd, analytic, rtol=0.5)


def test_aa_no_change_in_interior():
    v, t = make_quad(0.5)
    rast, _ = ras.rasterize(v, t, (32, 32))
    color = jnp.ones((1, 32, 32, 3)) * 0.7
    out = antialias(color, rast, v, t)
    # constant color: corrections are (cq - cp) = 0 everywhere
    np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-6)


def test_aa_translation_gradient_direction():
    """Moving the quad right should increase coverage-weighted x moment."""
    t = jnp.array([[0, 1, 2], [0, 2, 3]], dtype=jnp.int32)
    res = 32

    def moment(dx):
        v = jnp.array([[-0.3, -0.3, 0.0, 1.0], [0.3, -0.3, 0.0, 1.0],
                       [0.3, 0.3, 0.0, 1.0], [-0.3, 0.3, 0.0, 1.0]])
        v = v.at[:, 0].add(dx)[None]
        out = render_coverage(v, t, res)
        xw = jnp.arange(res, dtype=jnp.float32)[None, None, :, None]
        return jnp.sum(out[..., 0:1] * xw)

    g = float(jax.grad(moment)(jnp.float32(0.0)))
    assert g > 0
