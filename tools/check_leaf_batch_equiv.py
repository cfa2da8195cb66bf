"""On-chip occlusion-equality check: NVDR_LEAF_BATCH variants must agree.

The sliced-DMA trace loop (KL>0) was validated against the jnp twin only in
interpret mode, which cannot surface Mosaic lowering differences on real
hardware.  This runs the SAME rays through the kernel in two subprocesses
(env is read at trace time) and compares the occlusion bits exactly.

Usage: python tools/check_leaf_batch_equiv.py [KL_A KL_B]
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys
sys.path.insert(0, %(repo)r)
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
from nvdiffrecmc_tpu.ops import bvh as bvh_mod
from nvdiffrecmc_tpu.ops.pallas_tracer import any_hit_pallas
from nvdiffrecmc_tpu.render import obj as obj_mod

m = obj_mod.load_obj('/root/reference/data/spot/spot.obj')
bvh = bvh_mod.build(m.v_pos, m.t_pos_idx, leaf_size=128)
rng = np.random.RandomState(7)
N = 1 << 18
# mix of surface-origin rays (occlusion-prone) and box-exterior rays
o = rng.uniform(-1.0, 1.0, (N, 3)).astype(np.float32)
d = rng.randn(N, 3).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
occ = np.asarray(any_hit_pallas(jnp.asarray(o), jnp.asarray(d), bvh))
np.save(%(out)r, occ)
print('occluded frac', float(occ.mean()))
"""


def run(kl, out):
    env = dict(os.environ, NVDR_LEAF_BATCH=str(kl))
    r = subprocess.run(
        [sys.executable, '-c', CHILD % {'repo': REPO, 'out': out}],
        env=env, capture_output=True, text=True, timeout=900)
    print('KL=%s: %s %s' % (kl, r.stdout.strip()[-200:],
                            r.stderr.strip()[-200:] if r.returncode else ''))
    return r.returncode


def main():
    import numpy as np
    kl_a, kl_b = (sys.argv[1:3] or ['0', '4'])
    ra = run(kl_a, '/tmp/occ_a.npy')
    rb = run(kl_b, '/tmp/occ_b.npy')
    if ra or rb:
        print('CHILD FAILURE'); sys.exit(2)
    a, b = np.load('/tmp/occ_a.npy'), np.load('/tmp/occ_b.npy')
    n = int((a != b).sum())
    print('mismatched rays: %d / %d (%.4f%%)'
          % (n, a.size, 100.0 * n / a.size))
    sys.exit(0 if n == 0 else 1)


if __name__ == '__main__':
    main()
