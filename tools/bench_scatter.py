"""Micro-benchmark: strategies for the texture-pyramid gradient scatter.

The trilinear texture-sample backward accumulates M ~= 2.1M per-tap gradient
rows (C=13 channels after texture_sample_multi stacking) into the packed
L ~= 1.4M-texel mip pyramid.  XLA lowers scatter-add on TPU to an effectively
serial loop (measured 153 ms inside the train step).  Candidate replacement:
sort-by-texel + cumsum + searchsorted gather-diff — a scatter-free segment
sum built entirely from sorts/gathers/cumsum, which TPU runs well.

Run on the real chip: python tools/bench_scatter.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

M = 512 * 512 * 8           # taps: 512^2 pixels x (2 mip levels x 4 corners)
C = 13                      # kd(4) + ks(3) + normal(3) + ... stacked channels
L = (1024 * 1024 * 4) // 3  # packed 1024^2 mip pyramid texels

rng = np.random.RandomState(0)
# Realistic index distribution: bilinear taps cluster 4-around a point, and
# the finest level receives most taps.
pix = rng.randint(0, L - 1025, size=(M // 4,))
idx = (pix[:, None] + np.array([0, 1, 1024, 1025])[None, :]).reshape(-1)
idx = idx.astype(np.int32)
val = rng.randn(M, C).astype(np.float32)

idx_d = jnp.asarray(idx)
val_d = jnp.asarray(val)


@jax.jit
def scatter_add(idx, val):
    return jnp.zeros((L, C), jnp.float32).at[idx].add(val)


@jax.jit
def sorted_segsum(idx, val):
    order = jnp.argsort(idx)
    idx_s = idx[order]
    val_s = val[order]
    csum = jnp.cumsum(val_s, axis=0)
    S = jnp.concatenate([jnp.zeros((1, C), csum.dtype), csum], axis=0)
    r = jnp.searchsorted(idx_s, jnp.arange(L, dtype=idx.dtype), side='right',
                         method='sort')
    r0 = jnp.concatenate([jnp.zeros((1,), r.dtype), r[:-1]])
    return S[r] - S[r0]


@jax.jit
def sorted_segsum_scan(idx, val):
    order = jnp.argsort(idx)
    idx_s = idx[order]
    val_s = val[order]
    csum = jnp.cumsum(val_s, axis=0)
    S = jnp.concatenate([jnp.zeros((1, C), csum.dtype), csum], axis=0)
    r = jnp.searchsorted(idx_s, jnp.arange(L, dtype=idx.dtype), side='right',
                         method='scan')
    r0 = jnp.concatenate([jnp.zeros((1,), r.dtype), r[:-1]])
    return S[r] - S[r0]


def timeit(f, *a, n=5):
    # block_until_ready does not synchronize through the axon tunnel; a
    # host transfer does (see PERF_NOTES.md round-2 methodology).
    out = f(*a)
    _ = float(out.sum())
    t0 = time.time()
    for _ in range(n):
        out = f(*a)
        _ = float(out.sum())
    return (time.time() - t0) / n, out


if __name__ == '__main__':
    print('devices:', jax.devices(), flush=True)
    t_b, out_b = timeit(sorted_segsum, idx_d, val_d)
    print('sorted_segsum(sort):  %.1f ms' % (t_b * 1e3), flush=True)
    t_c, out_c = timeit(sorted_segsum_scan, idx_d, val_d)
    print('sorted_segsum(scan):  %.1f ms' % (t_c * 1e3), flush=True)
    t_a, out_a = timeit(scatter_add, idx_d, val_d, n=2)
    print('xla scatter-add:      %.1f ms' % (t_a * 1e3), flush=True)
    err = float(jnp.max(jnp.abs(out_a - out_b)))
    rel = err / float(jnp.max(jnp.abs(out_a)))
    print('max abs err vs scatter: %.3e (rel %.3e)' % (err, rel), flush=True)
