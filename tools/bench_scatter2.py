"""Component timings for the sort-based segment-sum scatter replacement."""
import time

import jax
import jax.numpy as jnp
import numpy as np

M = 512 * 512 * 8
C = 13
L = (1024 * 1024 * 4) // 3

rng = np.random.RandomState(0)
pix = rng.randint(0, L - 1025, size=(M // 4,))
idx = (pix[:, None] + np.array([0, 1, 1024, 1025])[None, :]).reshape(-1)
idx = idx.astype(np.int32)
val = rng.randn(M, C).astype(np.float32)

idx_d = jnp.asarray(idx)
val_d = jnp.asarray(val)


@jax.jit
def nullop(idx, val):
    return idx[0] + val[0, 0]


@jax.jit
def just_sort(idx, val):
    k, p = jax.lax.sort_key_val(idx, jnp.arange(M, dtype=jnp.int32))
    return k[0] + p[0]


@jax.jit
def sort_gather(idx, val):
    k, p = jax.lax.sort_key_val(idx, jnp.arange(M, dtype=jnp.int32))
    vs = val[p]
    return vs.sum()


@jax.jit
def sort_gather_cumsum(idx, val):
    k, p = jax.lax.sort_key_val(idx, jnp.arange(M, dtype=jnp.int32))
    vs = val[p]
    cs = jnp.cumsum(vs, axis=0)
    return cs[-1].sum()


@jax.jit
def full_segsum(idx, val):
    k, p = jax.lax.sort_key_val(idx, jnp.arange(M, dtype=jnp.int32))
    vs = val[p]
    cs = jnp.cumsum(vs, axis=0)
    S = jnp.concatenate([jnp.zeros((1, C), cs.dtype), cs], axis=0)
    r = jnp.searchsorted(k, jnp.arange(L, dtype=idx.dtype), side='right',
                         method='sort')
    r0 = jnp.concatenate([jnp.zeros((1,), r.dtype), r[:-1]])
    out = S[r] - S[r0]
    return out.sum()


@jax.jit
def hist_variant(idx, val):
    # r via histogram+cumsum instead of searchsorted: hist is a 1-channel
    # scatter-add of ones (narrow scatter may be much cheaper than wide).
    k, p = jax.lax.sort_key_val(idx, jnp.arange(M, dtype=jnp.int32))
    vs = val[p]
    cs = jnp.cumsum(vs, axis=0)
    S = jnp.concatenate([jnp.zeros((1, C), cs.dtype), cs], axis=0)
    hist = jnp.zeros((L,), jnp.int32).at[idx].add(1)
    r = jnp.cumsum(hist)
    r0 = jnp.concatenate([jnp.zeros((1,), r.dtype), r[:-1]])
    out = S[r] - S[r0]
    return out.sum()


def timeit(f, *a, n=5):
    out = f(*a)
    _ = float(np.asarray(out))
    t0 = time.time()
    for _ in range(n):
        out = f(*a)
        _ = float(np.asarray(out))
    return (time.time() - t0) / n


if __name__ == '__main__':
    for name, f in [('nullop', nullop), ('sort', just_sort),
                    ('sort+gather', sort_gather),
                    ('sort+gather+cumsum', sort_gather_cumsum),
                    ('full segsum', full_segsum),
                    ('hist variant', hist_variant)]:
        t = timeit(f, idx_d, val_d)
        print('%-20s %7.1f ms' % (name, t * 1e3), flush=True)
