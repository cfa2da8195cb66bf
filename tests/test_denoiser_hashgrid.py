"""Bilateral denoiser vs independent roll-based oracle (reference
filter_test.py pattern) + color-only VJP; hash-grid encoding properties."""

import jax
import jax.numpy as jnp
import numpy as np

from nvdiffrecmc_tpu.ops import denoiser
from nvdiffrecmc_tpu.ops import hashgrid


def make_buffers(h=24, w=24, seed=0):
    rng = np.random.RandomState(seed)
    col = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    nrm = rng.randn(1, h, w, 3).astype(np.float32) + np.array([0, 0, 2.0])
    nrm = jnp.asarray(nrm / np.linalg.norm(nrm, axis=-1, keepdims=True))
    z = rng.rand(1, h, w, 1).astype(np.float32) * 2
    dz = rng.rand(1, h, w, 1).astype(np.float32) * 0.05 + 0.01
    zdz = jnp.asarray(np.concatenate([z, dz], -1))
    return col, nrm, zdz


def test_denoiser_matches_roll_oracle():
    col, nrm, zdz = make_buffers()
    for sigma in (0.3, 1.0, 2.0):
        out = denoiser.bilateral_denoiser(col, nrm, zdz, jnp.float32(sigma))
        ref = denoiser.bilateral_reference_jnp(col, nrm, zdz, sigma)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


def test_denoiser_constant_image_preserved():
    col, nrm, zdz = make_buffers()
    col = jnp.ones_like(col) * 0.42
    out = denoiser.bilateral_denoiser(col, nrm, zdz, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(out), 0.42, atol=1e-4)


def test_denoiser_vjp_color_only():
    col, nrm, zdz = make_buffers(h=12, w=12)

    def f(c, n, z):
        return jnp.sum(denoiser.bilateral_denoiser(c, n, z, jnp.float32(0.8)) ** 2)

    gc, gn, gz = jax.grad(f, argnums=(0, 1, 2))(col, nrm, zdz)
    assert float(jnp.abs(gc).sum()) > 0
    # custom VJP: normals and depth are treated as constants
    assert float(jnp.abs(gn).sum()) == 0.0
    assert float(jnp.abs(gz).sum()) == 0.0


def test_denoiser_reduces_noise():
    rng = np.random.RandomState(1)
    clean = np.ones((1, 32, 32, 3), np.float32) * 0.5
    noisy = clean + rng.randn(1, 32, 32, 3).astype(np.float32) * 0.2
    nrm = jnp.asarray(np.tile(np.array([0, 0, 1.0], np.float32), (1, 32, 32, 1)))
    zdz = jnp.asarray(np.tile(np.array([1.0, 0.01], np.float32), (1, 32, 32, 1)))
    out = denoiser.bilateral_denoiser(jnp.asarray(noisy), nrm, zdz,
                                      jnp.float32(2.0))
    err_in = np.abs(noisy - clean).mean()
    err_out = np.abs(np.asarray(out) - clean).mean()
    assert err_out < err_in * 0.3


def test_hashgrid_interpolation_continuity():
    cfg = hashgrid.HashEncodingConfig(n_levels=4, log2_hashmap_size=12,
                                      base_resolution=4,
                                      desired_resolution=32)
    key = jax.random.PRNGKey(0)
    table = hashgrid.init_encoding(key, cfg) * 1e4  # scale up for visibility
    x = jnp.asarray(np.random.RandomState(0).rand(64, 3).astype(np.float32))
    f0 = hashgrid.encode(table, x, cfg)
    f1 = hashgrid.encode(table, x + 1e-5, cfg)
    # trilinear interpolation is continuous
    assert float(jnp.abs(f1 - f0).max()) < 1e-2


def test_hashgrid_encode_matches_ref_and_grads():
    """Vectorized single-gather encode + custom VJP vs the per-level jnp
    twin under plain JAX AD: values, table cotangent, position cotangent."""
    cfg = hashgrid.HashEncodingConfig(n_levels=6, log2_hashmap_size=10,
                                      base_resolution=4,
                                      desired_resolution=64)
    key = jax.random.PRNGKey(3)
    table = hashgrid.init_encoding(key, cfg) * 1e4
    rng = np.random.RandomState(7)
    # interior points: floor() kinks make FD/AD comparison fragile exactly
    # on lattice planes, and both impls treat boundaries identically anyway
    x = jnp.asarray((rng.rand(257, 3) * 0.96 + 0.02).astype(np.float32))

    f_new = hashgrid.encode(table, x, cfg)
    f_ref = hashgrid.encode_ref(table, x, cfg)
    np.testing.assert_allclose(np.asarray(f_new), np.asarray(f_ref),
                               rtol=1e-5, atol=1e-6)

    ct = jnp.asarray(rng.randn(*f_new.shape).astype(np.float32))

    def loss_new(t, p):
        return jnp.sum(hashgrid.encode(t, p, cfg) * ct)

    def loss_ref(t, p):
        return jnp.sum(hashgrid.encode_ref(t, p, cfg) * ct)

    gt_new, gx_new = jax.grad(loss_new, argnums=(0, 1))(table, x)
    gt_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(table, x)
    np.testing.assert_allclose(np.asarray(gt_new), np.asarray(gt_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_new), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-3)


def test_hashgrid_encode_grad_under_jit():
    """The custom VJP must trace under jit+grad with batched pixel shapes
    (the shade path calls it on [B*H*W, 3])."""
    cfg = hashgrid.HashEncodingConfig(n_levels=4, log2_hashmap_size=8,
                                      base_resolution=4,
                                      desired_resolution=16)
    table = hashgrid.init_encoding(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(1).rand(64, 3).astype(np.float32))

    @jax.jit
    def g(t, p):
        return jax.grad(
            lambda t_, p_: jnp.sum(hashgrid.encode(t_, p_, cfg) ** 2),
            argnums=(0, 1))(t, p)

    gt, gx = g(table, x)
    assert np.all(np.isfinite(np.asarray(gt)))
    assert np.all(np.isfinite(np.asarray(gx)))
    assert float(jnp.abs(gt).sum()) > 0


def test_mlp_texture_range_and_grads():
    cfg = hashgrid.HashEncodingConfig(n_levels=4, log2_hashmap_size=12,
                                      base_resolution=4,
                                      desired_resolution=32)
    key = jax.random.PRNGKey(1)
    params = hashgrid.init_mlp_texture(key, cfg, channels=6)
    aabb = (jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]))
    mn = jnp.array([0.0, 0.0, 0.0, 0.0, 0.08, 0.0])
    mx = jnp.array([1.0, 1.0, 1.0, 0.0, 1.0, 1.0])
    x = jnp.asarray(np.random.RandomState(2).uniform(-1, 1, (2, 8, 8, 3))
                    .astype(np.float32))
    out = hashgrid.sample_mlp_texture(params, cfg, aabb, (mn, mx), x)
    assert out.shape == (2, 8, 8, 6)
    o = np.asarray(out)
    assert (o >= np.asarray(mn) - 1e-5).all() and (o <= np.asarray(mx) + 1e-5).all()

    def loss(p):
        return jnp.sum(hashgrid.sample_mlp_texture(p, cfg, aabb, (mn, mx), x) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g.table).sum()) > 0
    assert all(float(jnp.abs(w).sum()) > 0 for w in g.weights)


# ---------------------------------------------------------------------------
# Fused pair kernel (pallas_denoise) vs the single-buffer reference
# ---------------------------------------------------------------------------

def test_pair_denoiser_matches_single_cpu():
    from nvdiffrecmc_tpu.ops import pallas_denoise as pd
    col, nrm, zdz = make_buffers()
    col2, _, _ = make_buffers(seed=3)
    a, b = pd.bilateral_denoiser_pair(col, col2, nrm, zdz, jnp.float32(1.2))
    ra = denoiser.bilateral_denoiser(col, nrm, zdz, jnp.float32(1.2))
    rb = denoiser.bilateral_denoiser(col2, nrm, zdz, jnp.float32(1.2))
    np.testing.assert_allclose(np.asarray(a), np.asarray(ra), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b), np.asarray(rb), atol=1e-5)


def test_pair_kernel_interpret_matches_twin():
    from nvdiffrecmc_tpu.ops import pallas_denoise as pd
    h = w = 64
    col, nrm, zdz = make_buffers(h, w)
    col2, _, _ = make_buffers(h, w, seed=5)
    col6 = jnp.concatenate([col, col2], -1)
    for sigma in (0.6, 2.0):
        got = pd._denoise_call(col6, nrm, zdz, jnp.float32(sigma),
                               interpret=True)
        a, wsum = denoiser._taps(col, nrm, zdz, jnp.float32(sigma), False)
        b, _ = denoiser._taps(col2, nrm, zdz, jnp.float32(sigma), False)
        ref = jnp.concatenate([a, b, wsum], -1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_pair_kernel_interpret_grad_matches_twin():
    from nvdiffrecmc_tpu.ops import pallas_denoise as pd
    h = w = 64
    col, nrm, zdz = make_buffers(h, w)
    g, _, _ = make_buffers(h, w, seed=9)
    g6 = jnp.concatenate([g, g * 0.5], -1)
    got = pd._denoise_call(g6, nrm, zdz, jnp.float32(1.0), grad_mode=True,
                           interpret=True)[..., 0:6]
    ra, _ = denoiser._taps(g, nrm, zdz, jnp.float32(1.0), grad_mode=True,
                           out_grad=g)
    rb, _ = denoiser._taps(g, nrm, zdz, jnp.float32(1.0), grad_mode=True,
                           out_grad=g * 0.5)
    ref = jnp.concatenate([ra, rb], -1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pair_vjp_matches_per_buffer_vjp():
    from nvdiffrecmc_tpu.ops import pallas_denoise as pd
    col, nrm, zdz = make_buffers()
    col2, _, _ = make_buffers(seed=3)

    def loss_pair(a, b):
        da, db = pd.bilateral_denoiser_pair(a, b, nrm, zdz, jnp.float32(0.8))
        return jnp.sum(da ** 2) + jnp.sum(db ** 2)

    def loss_single(a, b):
        da = denoiser.bilateral_denoiser(a, nrm, zdz, jnp.float32(0.8))
        db = denoiser.bilateral_denoiser(b, nrm, zdz, jnp.float32(0.8))
        return jnp.sum(da ** 2) + jnp.sum(db ** 2)

    ga = jax.grad(loss_pair, argnums=(0, 1))(col, col2)
    gb = jax.grad(loss_single, argnums=(0, 1))(col, col2)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-5)
