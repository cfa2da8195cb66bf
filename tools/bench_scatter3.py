"""Scatter strategy microbench #3: row scatters vs windowed-block scatters.

The texture-pyramid adjoint currently issues 8 scatter-adds of [P, C] rows
(4 bilinear taps x 2 mip levels) into the packed pyramid — 150 ms/step in
the r3 profile.  If XLA TPU scatter cost is dominated by the serial
per-update loop, scattering 4x fewer [2,2,C] window updates into a 2D
canvas should approach a 4x win.  Measure:

  A) 8 scatters of [M/8, C] rows into [L, C]           (status quo shape)
  B) 2 scatters of [M/8, 2, C] row-pair windows        (x-contiguous)
  C) 1 scatter of [M/8, 2, 2, C] blocks into 2D canvas (full window)
  D) 1 scatter of [M/8, C] rows (lower bound: fewest rows, no window)
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

P = 512 * 512          # pixels
C = 9
H, W = 1200, 1032      # canvas approximating the packed pyramid (1024^2 base)
L = H * W

rng = np.random.RandomState(0)
# clustered indices: screen tiles map to texture neighborhoods
y0 = jnp.asarray(rng.randint(0, H - 2, (P,)).astype(np.int32))
x0 = jnp.asarray(rng.randint(0, W - 2, (P,)).astype(np.int32))
dout = jnp.asarray(rng.rand(P, C).astype(np.float32))
wts = jnp.asarray(rng.rand(P, 4).astype(np.float32))


def sync(x):
    return float(jnp.asarray(x).sum())


def timeit(name, fn, reps=4):
    fn()
    sync(fn())
    ts = []
    for _ in range(reps):
        t0 = time.time()
        sync(fn())
        ts.append(time.time() - t0)
    print('%-44s %8.1f ms' % (name, sorted(ts)[len(ts) // 2] * 1e3))


@jax.jit
def scatter_rows_8():
    flat = jnp.zeros((L, C))
    for ky in (0, 1):
        for kx in (0, 1):
            idx = (y0 + ky) * W + (x0 + kx)
            upd = dout * wts[:, 2 * ky + kx:2 * ky + kx + 1]
            flat = flat.at[idx].add(upd)
            flat = flat.at[idx + 7].add(upd * 0.5)  # second "level"
    return flat


@jax.jit
def scatter_rowpairs():
    flat = jnp.zeros((L, C))
    for ky in (0, 1):
        idx = (y0 + ky) * W + x0
        upd = jnp.stack([dout * wts[:, 2 * ky:2 * ky + 1],
                         dout * wts[:, 2 * ky + 1:2 * ky + 2]], axis=1)
        dnums = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2), inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0,))
        flat = jax.lax.scatter_add(flat, idx[:, None], upd, dnums)
        flat = jax.lax.scatter_add(flat, idx[:, None] + 7, upd * 0.5, dnums)
    return flat


@jax.jit
def scatter_blocks_2d():
    canvas = jnp.zeros((H, W, C))
    upd = (wts.reshape(P, 2, 2, 1) * dout[:, None, None, :])
    starts = jnp.stack([y0, x0], axis=-1)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 1))
    canvas = jax.lax.scatter_add(canvas, starts, upd, dnums)
    starts2 = jnp.stack([y0, x0 + 1], axis=-1)
    canvas = jax.lax.scatter_add(canvas, starts2, upd * 0.5, dnums)
    return canvas


@jax.jit
def scatter_rows_1():
    flat = jnp.zeros((L, C))
    idx = y0 * W + x0
    return flat.at[idx].add(dout)


@jax.jit
def scatter_blocks_2d_single():
    canvas = jnp.zeros((H, W, C))
    upd = (wts.reshape(P, 2, 2, 1) * dout[:, None, None, :])
    starts = jnp.stack([y0, x0], axis=-1)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2, 3), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 1))
    return jax.lax.scatter_add(canvas, starts, upd, dnums)


if __name__ == '__main__':
    print('backend:', jax.default_backend())
    timeit('A: 8 row scatters [P,C] (status quo)', scatter_rows_8)
    timeit('B: 4 row-pair window scatters [P,2,C]', scatter_rowpairs)
    timeit('C: 2 block window scatters [P,2,2,C]', scatter_blocks_2d)
    timeit('C1: 1 block window scatter [P,2,2,C]', scatter_blocks_2d_single)
    timeit('D: 1 row scatter [P,C] (lower bound)', scatter_rows_1)
