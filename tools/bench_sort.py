"""Microbench: lax.sort + scatter costs for the binned-scatter design.

The hashgrid backward needs ~67M (corner-index, grad0, grad1) updates
scatter-added into the [16, 512k, 2] table.  The binned Pallas scatter
needs them SORTED by index.  Measure on the real chip:

  A) batched sort [16, 4.2M] key-only / +2 f32 value operands
  B) XLA scatter-add of all 67M rows (status quo cost inside the bwd)
  C) gather of 67M rows (forward cost scale)
  D) searchsorted of tile boundaries in the sorted keys
  E) argsort+permutation-gather alternative

All inputs are runtime args (donated fresh each rep) — constant-folded
variants measure nothing (PERF_NOTES round 3 session 1).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import numpy as np
import jax

jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('JAX_CACHE_DIR', '/root/.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)

import jax.numpy as jnp
from jax import lax

LVLS = 16
M_LVL = 4 * 1024 * 1024 + 2 * 65536   # ~4.3M per level
T = 1 << 19

rng = np.random.RandomState(0)
keys_np = rng.randint(0, T, (LVLS, M_LVL)).astype(np.int32)
v0_np = rng.rand(LVLS, M_LVL).astype(np.float32)
v1_np = rng.rand(LVLS, M_LVL).astype(np.float32)


def timeit(name, fn, make_args, reps=3):
    out = fn(*make_args())
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        args = make_args()
        jax.block_until_ready(args)
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    print('%-42s %8.1f ms  (min of %d)' % (name, min(ts) * 1e3, reps))
    return out


def fresh():
    return (jnp.asarray(keys_np), jnp.asarray(v0_np), jnp.asarray(v1_np))


@jax.jit
def sort_key_only(k, v0, v1):
    return lax.sort((k,), num_keys=1)[0]


@jax.jit
def sort_3op(k, v0, v1):
    return lax.sort((k, v0, v1), num_keys=1)


@jax.jit
def sort_flat_3op(k, v0, v1):
    off = (jnp.arange(LVLS, dtype=jnp.int32) * T)[:, None]
    kf = (k + off).reshape(-1)
    return lax.sort((kf, v0.reshape(-1), v1.reshape(-1)), num_keys=1)


@jax.jit
def argsort_gather(k, v0, v1):
    ar = jnp.broadcast_to(jnp.arange(M_LVL, dtype=jnp.int32)[None],
                          k.shape)
    ks, perm = lax.sort((k, ar), num_keys=1)
    return ks, jnp.take_along_axis(v0, perm, axis=1), \
        jnp.take_along_axis(v1, perm, axis=1)


@jax.jit
def xla_scatter(k, v0, v1):
    off = (jnp.arange(LVLS, dtype=jnp.int32) * T)[:, None]
    kf = (k + off).reshape(-1)
    vals = jnp.stack([v0.reshape(-1), v1.reshape(-1)], axis=-1)
    out = jnp.zeros((LVLS * T, 2), jnp.float32)
    return out.at[kf].add(vals)


@jax.jit
def xla_gather(k, v0, v1):
    off = (jnp.arange(LVLS, dtype=jnp.int32) * T)[:, None]
    kf = (k + off).reshape(-1)
    tab = jnp.zeros((LVLS * T, 2), jnp.float32) + v0.reshape(-1)[0]
    return tab[kf].sum()


@jax.jit
def tile_bounds(k, v0, v1):
    ks = lax.sort((k.reshape(-1),), num_keys=1)[0]
    tile = 512
    nt = (LVLS * T) // tile
    bounds = jnp.arange(nt + 1, dtype=jnp.int32) * tile
    return jnp.searchsorted(ks, bounds)


if __name__ == '__main__':
    print('device:', jax.devices()[0], ' M_total = %.1fM' %
          (LVLS * M_LVL / 1e6))
    timeit('A1 batched sort [16,4.3M] key only', sort_key_only, fresh)
    timeit('A2 batched sort [16,4.3M] key+2f32', sort_3op, fresh)
    timeit('A3 flat sort [69M] key+2f32', sort_flat_3op, fresh)
    timeit('E  argsort + take_along_axis x2', argsort_gather, fresh)
    timeit('C  gather 69M rows from [8.4M,2]', xla_gather, fresh)
    timeit('D  sort + searchsorted 16k bounds', tile_bounds, fresh)
    timeit('B  XLA scatter-add 69M rows', xla_scatter, fresh, reps=1)
