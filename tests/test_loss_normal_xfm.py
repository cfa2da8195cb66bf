"""Tests for image losses, shading-normal preparation, and transforms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvdiffrecmc_tpu.ops import loss as loss_ops
from nvdiffrecmc_tpu.ops import normal as normal_ops
from nvdiffrecmc_tpu.ops import xfm
from nvdiffrecmc_tpu.ops.vecmath import safe_normalize


@pytest.mark.parametrize("loss", ["l1", "mse", "smape", "relmse", "n2n"])
@pytest.mark.parametrize("tonemapper", ["none", "log_srgb"])
def test_image_loss_reference_formulas(loss, tonemapper):
    rng = np.random.RandomState(0)
    img = rng.uniform(0, 4, size=(2, 8, 8, 3)).astype(np.float32)
    tgt = rng.uniform(0, 4, size=(2, 8, 8, 3)).astype(np.float32)

    out = float(loss_ops.image_loss(jnp.asarray(img), jnp.asarray(tgt), loss, tonemapper))

    i, t = np.clip(img, 0, 65535), np.clip(tgt, 0, 65535)
    if tonemapper == "log_srgb":
        def srgb(x):
            return np.where(x > 0.0031308, np.clip(x, 0.0031308, None) ** (1 / 2.4) * 1.055 - 0.055, 12.92 * x)
        i, t = srgb(np.log(i + 1)), srgb(np.log(t + 1))
    eps = 0.01
    ref = {
        "l1": np.abs(i - t),
        "mse": (i - t) ** 2,
        "smape": np.abs(i - t) / (i + t + eps),
        "relmse": (i - t) ** 2 / (i * i + t * t + eps),
        "n2n": (i - t) ** 2 / (i * i + eps),
    }[loss].mean()
    assert abs(out - ref) < 1e-5


def test_image_loss_grad_finite():
    img = jnp.asarray(np.random.RandomState(1).uniform(0, 2, (1, 4, 4, 3)), dtype=jnp.float32)
    tgt = jnp.zeros_like(img) + 0.5
    g = jax.grad(lambda x: loss_ops.image_loss(x, tgt, "l1", "log_srgb"))(img)
    assert np.all(np.isfinite(np.asarray(g)))


def test_prepare_shading_normal_identity():
    """Frontfacing, no perturbation -> smooth normal."""
    pos = jnp.zeros((4, 3))
    view_pos = jnp.array([[0.0, 0.0, 3.0]]).repeat(4, 0)
    nrm = safe_normalize(jnp.array([[0.1, 0.2, 1.0]]).repeat(4, 0))
    tng = jnp.array([[1.0, 0.0, 0.0]]).repeat(4, 0)
    geom = jnp.array([[0.0, 0.0, 1.0]]).repeat(4, 0)
    out = normal_ops.prepare_shading_normal(pos, view_pos, None, nrm, tng, geom)
    np.testing.assert_allclose(out, nrm, atol=1e-6)

    # identity perturbation (0,0,1) should be equivalent
    pert = jnp.array([[0.0, 0.0, 1.0]]).repeat(4, 0)
    out2 = normal_ops.prepare_shading_normal(pos, view_pos, pert, nrm, tng, geom)
    np.testing.assert_allclose(out2, nrm, atol=1e-6)


def test_prepare_shading_normal_two_sided_flip():
    """Backfacing geometry flips the normal toward the viewer."""
    pos = jnp.zeros((1, 3))
    view_pos = jnp.array([[0.0, 0.0, 3.0]])
    nrm = jnp.array([[0.0, 0.0, -1.0]])
    tng = jnp.array([[1.0, 0.0, 0.0]])
    geom = jnp.array([[0.0, 0.0, -1.0]])
    out = normal_ops.prepare_shading_normal(pos, view_pos, None, nrm, tng, geom,
                                            two_sided_shading=True)
    assert float(out[0, 2]) > 0.9


def test_prepare_shading_normal_grazing_bend():
    """At grazing angles the shading normal bends toward the geometric one."""
    pos = jnp.zeros((1, 3))
    view_pos = jnp.array([[1.0, 0.0, 0.02]])  # nearly parallel to surface
    nrm = safe_normalize(jnp.array([[-0.4, 0.0, 1.0]]))  # tilted away from view
    tng = jnp.array([[1.0, 0.0, 0.0]])
    geom = jnp.array([[0.0, 0.0, 1.0]])
    out = normal_ops.prepare_shading_normal(pos, view_pos, None, nrm, tng, geom)
    # blended result sits between nrm and geom
    assert float(out[0, 0]) > float(nrm[0, 0])


def test_xfm_points_matches_matmul():
    rng = np.random.RandomState(2)
    pts = rng.randn(2, 16, 3).astype(np.float32)
    mtx = rng.randn(2, 4, 4).astype(np.float32)
    out = xfm.xfm_points(jnp.asarray(pts), jnp.asarray(mtx))
    hom = np.concatenate([pts, np.ones_like(pts[..., :1])], axis=-1)
    ref = np.einsum('nij,nvj->nvi', mtx, hom)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    vec = xfm.xfm_vectors(jnp.asarray(pts), jnp.asarray(mtx))
    ref_v = np.einsum('nij,nvj->nvi', mtx[:, :3, :3], pts)
    np.testing.assert_allclose(vec, ref_v, rtol=1e-4, atol=1e-5)
