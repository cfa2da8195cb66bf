"""Cubemap pre-filter ops (reference renderutils/ops.py:391-458 parity;
the reference ships those wrappers without their CUDA kernels, so the
checks here are physical invariants rather than cross-implementation
diffs)."""

import numpy as np
import jax
import jax.numpy as jnp

from nvdiffrecmc_tpu.ops import cubemap as cm


RES = 16


def test_solid_angles_sum_to_sphere():
    sa = np.asarray(cm.cubemap_solid_angles(RES))
    assert np.isclose(sa.sum(), 4 * np.pi, rtol=1e-5)
    assert (sa > 0).all()


def test_dirs_unit_and_cover_octants():
    d = np.asarray(cm.cubemap_dirs(RES)).reshape(-1, 3)
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-6)
    signs = set(map(tuple, np.sign(d[np.abs(d).min(-1) > 0.05]).astype(int)))
    assert len(signs) == 8  # all octants reached


def test_diffuse_white_furnace():
    """A constant cubemap is a fixed point of the normalized cosine
    convolution."""
    c = jnp.ones((6, RES, RES, 3)) * 0.7
    out = np.asarray(cm.diffuse_cubemap(c, chunk=512))
    assert np.allclose(out, 0.7, atol=1e-4)


def test_diffuse_cosine_falloff():
    """A single bright texel convolves to ~max(cos, 0) of the angle to it."""
    c = jnp.zeros((6, RES, RES, 3))
    # center texel of face +z
    c = c.at[4, RES // 2, RES // 2, :].set(100.0)
    out = np.asarray(cm.diffuse_cubemap(c, chunk=512))
    dirs = np.asarray(cm.cubemap_dirs(RES))
    src = dirs[4, RES // 2, RES // 2]
    ct = (dirs * src).sum(-1)
    # monotone in cos(theta): aligned >> orthogonal == opposite == 0
    assert out[4, RES // 2, RES // 2, 0] > out[0, RES // 2, RES // 2, 0]
    assert np.allclose(out[5][ct[5] < -0.3], 0.0, atol=1e-6)
    # shape matches max(cos, 0) up to the common normalization
    w = np.maximum(ct, 0.0).reshape(-1)
    o = out[..., 0].reshape(-1)
    nz = w > 0.05
    ratio = o[nz] / w[nz]
    assert ratio.std() / ratio.mean() < 0.05


def test_specular_sharpens_with_low_roughness():
    c = jnp.zeros((6, RES, RES, 3))
    c = c.at[4, RES // 2, RES // 2, :].set(100.0)
    sharp = np.asarray(cm.specular_cubemap(c, 0.1, chunk=512))
    blurry = np.asarray(cm.specular_cubemap(c, 0.8, chunk=512))
    # energy concentrates at the source direction for low roughness
    assert sharp[4, RES // 2, RES // 2, 0] > 5 * blurry[4, RES // 2, RES // 2, 0]
    # far-away response is larger for high roughness
    far = blurry[0].mean() >= sharp[0].mean()
    assert far


def test_specular_white_furnace():
    c = jnp.ones((6, RES, RES, 3)) * 0.3
    out = np.asarray(cm.specular_cubemap(c, 0.5, chunk=512))
    assert np.allclose(out, 0.3, atol=1e-3)


def test_gradients_flow():
    c = jnp.ones((6, 8, 8, 3)) * 0.5

    def loss(x):
        return jnp.sum(cm.diffuse_cubemap(x, chunk=128) ** 2)

    g = jax.grad(loss)(c)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0
