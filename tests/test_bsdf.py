"""BSDF value + gradient tests.

Replaces the role of /root/reference/render/renderutils/tests/test_bsdf.py:
instead of CUDA-vs-python twins we check values against independent numpy
formulas and gradients against finite differences (JAX AD replaces the
hand-written adjoints)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvdiffrecmc_tpu.ops import bsdf
from nvdiffrecmc_tpu.ops.vecmath import safe_normalize


def rand_vec(key, shape, lo=-1.0, hi=1.0):
    return jax.random.uniform(key, shape, minval=lo, maxval=hi)


def finite_diff_grad(f, x, eps=1e-3):
    x = np.asarray(x, dtype=np.float64)
    g = np.zeros_like(x)
    it = np.nditer(x, flags=['multi_index'])
    while not it.finished:
        idx = it.multi_index
        xp, xm = x.copy(), x.copy()
        xp[idx] += eps
        xm[idx] -= eps
        g[idx] = (f(xp) - f(xm)) / (2 * eps)
        it.iternext()
    return g


def test_lambert_value():
    n = jnp.array([[0.0, 0.0, 1.0]])
    wi = safe_normalize(jnp.array([[0.0, 1.0, 1.0]]))
    out = bsdf.lambert(n, wi)
    np.testing.assert_allclose(out, np.cos(np.pi / 4) / np.pi, rtol=1e-5)
    # below horizon -> 0
    out = bsdf.lambert(n, jnp.array([[0.0, 0.0, -1.0]]))
    np.testing.assert_allclose(out, 0.0)


def test_ndf_ggx_normalization():
    """Integral of D(h) cos(h) over the hemisphere should be ~1."""
    alpha = 0.3
    n_theta = 4096
    theta = (np.arange(n_theta) + 0.5) * (np.pi / 2) / n_theta
    ct = np.cos(theta)
    d = np.asarray(bsdf.ndf_ggx(alpha ** 2, jnp.asarray(ct, dtype=jnp.float32)))
    integral = np.sum(d * ct * np.sin(theta)) * (np.pi / 2 / n_theta) * 2 * np.pi
    assert abs(integral - 1.0) < 2e-2


def test_fresnel_bounds():
    f = bsdf.fresnel_schlick(0.04, 1.0, jnp.array([1.0 - 1e-4]))
    np.testing.assert_allclose(f, 0.04, atol=1e-5)
    f = bsdf.fresnel_schlick(0.04, 1.0, jnp.array([1e-4]))
    assert float(f[0]) > 0.95


@pytest.mark.parametrize("fn_name", ["lambert", "specular", "pbr"])
def test_grads_match_finite_difference(fn_name):
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 8)
    nrm = safe_normalize(rand_vec(keys[0], (4, 3)) + jnp.array([0.0, 0.0, 1.5]))
    wi = safe_normalize(rand_vec(keys[1], (4, 3)) + jnp.array([0.0, 0.0, 1.5]))
    wo = safe_normalize(rand_vec(keys[2], (4, 3)) + jnp.array([0.0, 0.0, 1.5]))
    col = rand_vec(keys[3], (4, 3), 0.1, 0.9)
    alpha = rand_vec(keys[4], (4, 1), 0.2, 0.8)

    if fn_name == "lambert":
        f = lambda n: jnp.sum(bsdf.lambert(n, wi))
        arg = nrm
    elif fn_name == "specular":
        f = lambda a: jnp.sum(bsdf.pbr_specular(col, nrm, wo, wi, a))
        arg = alpha
    else:
        kd = col
        arm = jnp.concatenate([jnp.zeros((4, 1)), alpha, rand_vec(keys[5], (4, 1), 0.1, 0.9)], axis=-1)
        pos = rand_vec(keys[6], (4, 3))
        view_pos = pos + wo * 2.0
        light_pos = pos + wi * 2.0
        f = lambda k: jnp.sum(bsdf.pbr_bsdf(k, arm, pos, nrm, view_pos, light_pos))
        arg = kd

    g_ad = jax.grad(f)(arg)
    g_fd = finite_diff_grad(lambda x: float(f(jnp.asarray(x, dtype=jnp.float32))),
                            arg, eps=1e-2)
    np.testing.assert_allclose(g_ad, g_fd, rtol=5e-2, atol=5e-3)


def test_demodulated_bsdf_consistency():
    """diffuse_demod * kd*(1-metal) + spec_demod == pbr_bsdf for spec_str=0."""
    key = jax.random.PRNGKey(1)
    keys = jax.random.split(key, 8)
    nrm = safe_normalize(rand_vec(keys[0], (16, 3)) + jnp.array([0.0, 0.0, 1.5]))
    wi = safe_normalize(rand_vec(keys[1], (16, 3)) + jnp.array([0.0, 0.0, 1.5]))
    pos = rand_vec(keys[2], (16, 3))
    view_pos = pos + safe_normalize(rand_vec(keys[3], (16, 3)) + jnp.array([0.0, 0.0, 1.5])) * 2
    kd = rand_vec(keys[4], (16, 3), 0.1, 0.9)
    arm = jnp.concatenate([
        jnp.zeros((16, 1)),
        rand_vec(keys[5], (16, 1), 0.3, 0.9),
        rand_vec(keys[6], (16, 1), 0.0, 1.0)], axis=-1)

    diff, spec = bsdf.pbr_bsdf_demodulated(kd, arm, pos, nrm, view_pos, wi)
    remod = diff * kd * (1.0 - arm[..., 2:3]) + spec
    light_pos = pos + wi * 2.0
    full = bsdf.pbr_bsdf(kd, arm, pos, nrm, view_pos, light_pos)
    np.testing.assert_allclose(remod, full, rtol=1e-4, atol=1e-5)
