"""On-chip microbench: binned Pallas scatter vs XLA scatter-add at the two
scales that matter (texture-pyramid adjoint, hash-grid table adjoint).

All inputs are runtime args (fresh device puts per rep) — constant-folded
variants measure nothing (PERF_NOTES round 3 session 1)."""
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
import functools
from nvdiffrecmc_tpu.ops import pallas_scatter as ps


def timeit(name, fn, make_args, reps=3):
    args = make_args()
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        args = make_args()
        jax.block_until_ready(args)
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    print('%-52s %8.1f ms (min of %d)' % (name, min(ts) * 1e3, reps))
    return out


def run_case(tag, M, C, N, tile, blk, check=True):
    rng = np.random.RandomState(0)
    idx_np = rng.randint(0, N, M).astype(np.int32)
    vals_np = rng.randn(C, M).astype(np.float32)

    def fresh():
        return (jnp.asarray(idx_np), jnp.asarray(vals_np))

    pl_fn = jax.jit(functools.partial(ps.scatter_add_t, out_rows=N,
                                      tile=tile, blk=blk))
    ref_fn = jax.jit(functools.partial(ps.scatter_add_t_ref, out_rows=N))
    out_pl = timeit('%s pallas tile=%d blk=%d' % (tag, tile, blk),
                    pl_fn, fresh)
    out_ref = timeit('%s XLA scatter' % tag, ref_fn, fresh)
    if check:
        a = np.asarray(out_pl)
        b = np.asarray(out_ref)
        err = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-8)
        print('   max rel err %.2e' % err)


def check_empty_bins():
    """On-chip correctness: output tiles with no updates must be zero
    (interpret mode zero-fills and can hide an unvisited-block bug)."""
    rng = np.random.RandomState(3)
    idx = jnp.asarray(rng.randint(768, 1024, 4096).astype(np.int32))
    vals = jnp.asarray(rng.randn(3, 4096).astype(np.float32))
    out = ps.scatter_add_t(idx, vals, 8192, tile=256, blk=512)
    ref = ps.scatter_add_t_ref(idx, vals, 8192)
    err = float(jnp.max(jnp.abs(out - ref)))
    tail = float(jnp.max(jnp.abs(out[:, 1024:])))
    print('empty-bin check: max abs err %.2e, untouched-tile max %.2e'
          % (err, tail))
    assert err < 1e-4 and tail == 0.0


if __name__ == '__main__':
    print('device:', jax.devices()[0])
    check_empty_bins()
    # texture-pyramid adjoint: 2 taps x 512^2 pixels, 4*13 chans, 1024^2 pyramid
    run_case('tex-adj  M=524k C=52 N=1.4M', 524288, 52, 1398101, 512, 2048)
    # hash-grid adjoint, flattened 16 levels: 8 corners x 262k pts x 16 lvls
    run_case('hash-adj M=33.5M C=2 N=8.4M', 33554432, 2, 8388608, 512, 2048,
             check=False)
    run_case('hash-adj M=33.5M C=2 N=8.4M (big blk)', 33554432, 2, 8388608,
             512, 8192, check=False)
