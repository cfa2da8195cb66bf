"""Scatter microbench #4: replicate the exact in-train texture-adjoint
pattern and test layout/indexing fixes.

In-train: flat [N=1, L, C] packed pyramid; 8 gathers flat[bidx, idx] with
bidx [1,1,1] broadcast against idx [1,H,W]; the grad step's transpose
generates scatter-adds whose output XLA lays out as [C, L] (profile
fusion.303/.305 = f32[9,1398101], 150 ms/step total).  Hypothesis: the
batch-dim gather/scatter + layout choice is the cost, not the row count
(microbench #3: 4.2M flat row scatters = 25 ms).
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

B, H, W = 1, 512, 512
C = 9
L = 1398101

rng = np.random.RandomState(0)
idx8 = [jnp.asarray(rng.randint(0, L, (B, H, W)).astype(np.int32))
        for _ in range(8)]
wt8 = [jnp.asarray(rng.rand(B, H, W, 1).astype(np.float32)) for _ in range(8)]
flat3 = jnp.asarray(rng.rand(B, L, C).astype(np.float32))
dout = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
bidx = jnp.arange(B)[:, None, None]


def sync(x):
    return float(jnp.asarray(x).sum())


def timeit(name, fn, *args, reps=4):
    fn(*args)
    sync(jax.tree_util.tree_leaves(fn(*args))[0])
    ts = []
    for _ in range(reps):
        t0 = time.time()
        sync(jax.tree_util.tree_leaves(fn(*args))[0])
        ts.append(time.time() - t0)
    print('%-52s %8.1f ms' % (name, sorted(ts)[len(ts) // 2] * 1e3))


# E: the current code path — taps with batch indexing, vjp w.r.t. flat
def tap_sum(flat):
    out = 0.
    for i in range(8):
        out = out + flat[bidx, idx8[i]] * wt8[i]
    return out


@jax.jit
def grad_E(flat, dout):
    _, vjp = jax.vjp(tap_sum, flat)
    return vjp(dout)[0]


# F: flattened indexing — no batch dim in the gather
def tap_sum_flat(flat2):
    out = 0.
    for i in range(8):
        out = out + (flat2[idx8[i].reshape(-1)] * wt8[i].reshape(-1, 1))
    return out


@jax.jit
def grad_F(flat2, dout2):
    _, vjp = jax.vjp(tap_sum_flat, flat2)
    return vjp(dout2)[0]


# G: hand-written adjoint — 8 explicit .at[].add into [L, C]
@jax.jit
def grad_G(dout2):
    g = jnp.zeros((L, C))
    for i in range(8):
        g = g.at[idx8[i].reshape(-1)].add(dout2 * wt8[i].reshape(-1, 1))
    return g


# H: hand-written adjoint with one concatenated scatter (8M rows, 1 call)
@jax.jit
def grad_H(dout2):
    g = jnp.zeros((L, C))
    allidx = jnp.concatenate([ix.reshape(-1) for ix in idx8])
    allupd = jnp.concatenate([dout2 * w.reshape(-1, 1) for w in wt8])
    return g.at[allidx].add(allupd)


if __name__ == '__main__':
    print('backend:', jax.default_backend())
    dout2 = dout.reshape(-1, C)
    flat2 = flat3[0]
    timeit('E: vjp of batch-indexed taps (train pattern)', grad_E, flat3, dout)
    timeit('F: vjp of flat-indexed taps', grad_F, flat2, dout2)
    timeit('G: hand adjoint, 8 x .at[].add', grad_G, dout2)
    timeit('H: hand adjoint, 1 concat scatter (8M rows)', grad_H, dout2)
