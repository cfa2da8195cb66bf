"""Binned Pallas segment scatter-add (ops/pallas_scatter.py) vs the XLA
scatter twin.  The kernel is the TPU-first replacement for the CUDA atomics
the reference leans on for gradient-table accumulation
(/root/reference/render/optixutils/c_src/envsampling/kernel.cu:203-211,
tiny-cuda-nn hash backward); on CPU pallas runs in interpret mode here."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvdiffrecmc_tpu.ops import pallas_scatter as ps


def _case(M, C, N, dup_frac=0.5, seed=0, skew=False):
    rng = np.random.RandomState(seed)
    if skew:
        # adversarial: most updates land in one tile's worth of rows
        idx = np.where(rng.rand(M) < 0.9,
                       rng.randint(0, 32, M),
                       rng.randint(0, N, M)).astype(np.int32)
    else:
        idx = rng.randint(0, N, M).astype(np.int32)
    # force duplicates so the add path is exercised
    idx[: int(M * dup_frac)] = idx[rng.randint(0, M, int(M * dup_frac))]
    vals = rng.randn(C, M).astype(np.float32)
    return jnp.asarray(idx), jnp.asarray(vals)


@pytest.mark.parametrize("M,C,N,tile,blk", [
    (5000, 4, 2048, 256, 512),
    (4096, 2, 512, 128, 1024),     # M multiple of blk, N multiple of tile
    (333, 7, 1000, 256, 512),      # ragged everything
])
def test_scatter_matches_xla(M, C, N, tile, blk):
    idx, vals = _case(M, C, N)
    ref = ps.scatter_add_t_ref(idx, vals, N)
    out = ps.scatter_add_t(idx, vals, N, tile=tile, blk=blk, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)


def test_scatter_skewed_and_oob():
    """Heavy collision skew + out-of-range indices (must be dropped)."""
    idx, vals = _case(8192, 3, 4096, skew=True, seed=1)
    idx = idx.at[::17].set(-1)
    idx = idx.at[::23].set(99999)
    ref = ps.scatter_add_t_ref(
        jnp.where((idx >= 0) & (idx < 4096), idx, 4096 + 256), vals, 4096)
    out = ps.scatter_add_t(idx, vals, 4096, tile=256, blk=512,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)


def test_scatter_empty_bins():
    """Bins with zero updates must come back zero, not uninitialized: all
    updates land in one tile, every other output tile gets no natural work
    item.  (Interpret mode zero-fills, so the on-chip variant is also
    exercised by tools/bench_pallas_scatter.py --check.)"""
    rng = np.random.RandomState(3)
    idx = jnp.asarray(rng.randint(768, 1024, 4096).astype(np.int32))
    vals = jnp.asarray(rng.randn(3, 4096).astype(np.float32))
    ref = ps.scatter_add_t_ref(idx, vals, 8192)
    out = ps.scatter_add_t(idx, vals, 8192, tile=256, blk=512,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)
    assert float(jnp.abs(out[:, :768]).max()) == 0.0
    assert float(jnp.abs(out[:, 1024:]).max()) == 0.0


@pytest.mark.tpu
def test_scatter_empty_bins_on_chip():
    """Same empty-bin case WITHOUT interpret: interpret mode zero-fills
    output buffers, so only a real-device run exercises the
    undefined-memory bug class the _EMPTY work items exist to prevent."""
    if jax.default_backend() == 'cpu':
        pytest.skip('needs real TPU (interpret mode cannot catch this)')
    rng = np.random.RandomState(3)
    idx = jnp.asarray(rng.randint(768, 1024, 4096).astype(np.int32))
    vals = jnp.asarray(rng.randn(3, 4096).astype(np.float32))
    ref = ps.scatter_add_t_ref(idx, vals, 8192)
    out = ps.scatter_add_t(idx, vals, 8192, tile=256, blk=512)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)
    assert float(jnp.abs(out[:, :768]).max()) == 0.0
    assert float(jnp.abs(out[:, 1024:]).max()) == 0.0


def test_scatter_m_zero_and_huge_rows():
    """M=0 returns zeros; out_rows beyond the 15-bit bin budget at the
    default tile auto-raises tile (or falls back to the XLA twin) instead
    of raising (ADVICE r3)."""
    out = ps.scatter_add_t(jnp.zeros((0,), jnp.int32),
                           jnp.zeros((3, 0), jnp.float32), 256)
    assert out.shape == (3, 256) and float(jnp.abs(out).max()) == 0.0
    # 22M rows at tile=512 -> nt ~ 43k >= 2^15: must not raise (trace-only;
    # 21k interpret-mode grid steps would take minutes on this host)
    idx, vals = _case(512, 2, 22_000_000, seed=4)
    shape = jax.eval_shape(
        lambda i, v: ps.scatter_add_t(i, v, 22_000_000, tile=512, blk=512,
                                      interpret=True),
        idx, vals)
    assert shape.shape == (2, 22_000_000)


def test_scatter_under_jit():
    """The op runs inside jitted VJP bodies — must trace/compile cleanly."""
    idx, vals = _case(2048, 4, 1024, seed=2)

    @jax.jit
    def f(v):
        return ps.scatter_add_t(idx, v, 1024, tile=256, blk=512,
                                interpret=True)

    ref = ps.scatter_add_t_ref(idx, vals, 1024)
    np.testing.assert_allclose(np.asarray(f(vals)), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)
