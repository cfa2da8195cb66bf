"""On-chip A/B of the streaming-trace loop variants (round 5).

Measures the standalone tracer microbench (bench.bench_tracer) and the
fused-shade forward on an incoherent G-buffer under each variant:

  NVDR_LEAF_BATCH in {0 (legacy), 1, 2, 4, 8}  x  NVDR_XOR_EPILOGUE {0, 1}

Each variant runs in a SUBPROCESS so trace-time env reads are honored and
one Mosaic rejection cannot kill the sweep.  Usage:

  python tools/bench_tracer_ab.py            # full sweep
  python tools/bench_tracer_ab.py quick      # KL in {0, 4} only
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, statistics, sys, time
sys.path.insert(0, %(repo)r)
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

import bench
mrays = bench.bench_tracer()

# fused shade fwd on a random-normal (incoherent) G-buffer, spot-scale
from nvdiffrecmc_tpu.ops import bvh as bvh_mod
from nvdiffrecmc_tpu.ops.pallas_shade import env_shade_fused
from nvdiffrecmc_tpu.render import obj as obj_mod
m = obj_mod.load_obj('/root/reference/data/spot/spot.obj')
bvh = bvh_mod.build(m.v_pos, m.t_pos_idx, leaf_size=128)
rng = np.random.RandomState(0)
B, H, W = 1, 512, 512
nrm = rng.randn(B, H, W, 3).astype(np.float32)
nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
pos = rng.uniform(-0.5, 0.5, (B, H, W, 3)).astype(np.float32)
mask = jnp.ones((B, H, W), jnp.float32)
base = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (64, 128, 3))) + 0.1
from nvdiffrecmc_tpu.render import light as light_mod
tab = light_mod.update_pdf(base)
args = (mask, jnp.asarray(pos), jnp.asarray(pos), jnp.asarray(nrm),
        jnp.asarray(pos + 1.0), jnp.ones((B, H, W, 3)) * 0.6,
        jnp.ones((B, H, W, 3)) * 0.4, base, tab.pdf, tab.rows, tab.cols,
        bvh, None, 5, 1.0)
f = jax.jit(lambda *a: env_shade_fused(*a, BSDF=0, n_samples_x=4))
d, s = f(*args)
float(d.sum())  # warm
ts = []
for i in range(5):
    t0 = time.time()
    d, s = f(*args)
    float(d.sum())
    ts.append(time.time() - t0)
print(json.dumps({'mrays': round(mrays, 2),
                  'shade_fwd_ms': round(1000 * statistics.median(ts), 1)}))
"""


def run_variant(kl, xor):
    env = dict(os.environ, NVDR_LEAF_BATCH=str(kl),
               NVDR_XOR_EPILOGUE=str(xor))
    r = subprocess.run([sys.executable, '-c', CHILD % {'repo': REPO}],
                       env=env, capture_output=True, text=True, timeout=900)
    line = (r.stdout.strip().splitlines() or ['{}'])[-1]
    try:
        out = json.loads(line)
    except Exception:
        out = {'error': (r.stderr[-400:] or r.stdout[-400:])}
    return out


def main():
    quick = 'quick' in sys.argv[1:]
    kls = [0, 4] if quick else [0, 1, 2, 4, 8]
    xors = [0] if quick else [0, 1]
    for xor in xors:
        for kl in kls:
            res = run_variant(kl, xor)
            print('KL=%d XOR=%d -> %s' % (kl, xor, json.dumps(res)),
                  flush=True)


if __name__ == '__main__':
    main()
