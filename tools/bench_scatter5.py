"""Scatter microbench #5: isolate why 16 derived-index scatters cost 27 ms
(bench #3 A) while 8 independent-index scatters cost 197 ms (bench #4 G).

Variables: index arrays derived-with-shared-base vs independent; update
arrays shared vs independent.
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

P = 512 * 512
C = 9
L = 1238400
W = 1032

rng = np.random.RandomState(0)
y0 = jnp.asarray(rng.randint(0, 1198, (P,)).astype(np.int32))
x0 = jnp.asarray(rng.randint(0, 1030, (P,)).astype(np.int32))
base_idx = y0 * W + x0
idx8 = [jnp.asarray(rng.randint(0, L - 2 - W, (P,)).astype(np.int32))
        for _ in range(8)]
idx8_sorted = [jnp.sort(ix) for ix in idx8]
dout = jnp.asarray(rng.rand(P, C).astype(np.float32))
wt8 = [jnp.asarray(rng.rand(P, 1).astype(np.float32)) for _ in range(8)]


def sync(x):
    return float(jnp.asarray(x).sum())


def timeit(name, fn, *args, reps=4):
    sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        sync(fn(*args))
        ts.append(time.time() - t0)
    print('%-56s %8.1f ms' % (name, sorted(ts)[len(ts) // 2] * 1e3))


@jax.jit
def v_a():  # derived indices, shared update (bench3-A shape, 8 scatters)
    flat = jnp.zeros((L, C))
    for k, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        upd = dout * wt8[k]
        flat = flat.at[base_idx + dy * W + dx].add(upd)
        flat = flat.at[base_idx + dy * W + dx + 7].add(upd * 0.5)
    return flat


@jax.jit
def v_b():  # independent indices, independent updates (bench4-G)
    flat = jnp.zeros((L, C))
    for k in range(8):
        flat = flat.at[idx8[k]].add(dout * wt8[k])
    return flat


@jax.jit
def v_c():  # independent SORTED indices, independent updates
    flat = jnp.zeros((L, C))
    for k in range(8):
        flat = flat.at[idx8_sorted[k]].add(dout * wt8[k])
    return flat


@jax.jit
def v_d():  # derived indices but 8 distinct bases? no — single scatter of one idx8
    flat = jnp.zeros((L, C))
    return flat.at[idx8[0]].add(dout * wt8[0])


@jax.jit
def v_e():  # single scatter, derived base_idx
    flat = jnp.zeros((L, C))
    return flat.at[base_idx].add(dout * wt8[0])


if __name__ == '__main__':
    print('backend:', jax.default_backend())
    timeit('a: 8 scatters, derived idx (y0*W+x0 + const)', v_a)
    timeit('b: 8 scatters, independent idx', v_b)
    timeit('c: 8 scatters, independent sorted idx', v_c)
    timeit('d: 1 scatter, independent idx', v_d)
    timeit('e: 1 scatter, derived idx', v_e)
