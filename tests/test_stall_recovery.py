"""Killed-tunnel simulation (VERDICT round-4 item 5): a training run whose
device->host sync blocks forever must exit cleanly with a checkpoint, and a
rerun must resume from it and complete — no hang, no lost run.

The dead tunnel is simulated with NVDR_TEST_STALL_AT=<iter> (the per-iter
loss sync sleeps indefinitely at that iteration), the watchdog deadline is
shrunk with NVDR_STALL_FLOOR so the test is fast.  Two subprocess
invocations of the real CLI driver (python train.py), tiny CPU config."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPOT = '/root/reference/data/spot/spot.obj'


def _run(cfg_path, extra_env):
    env = dict(os.environ)
    env.update({
        'JAX_PLATFORMS': 'cpu',
        'PYTHONPATH': REPO + os.pathsep + env.get('PYTHONPATH', ''),
    })
    env.update(extra_env)
    return subprocess.run(
        [sys.executable, 'train.py', '--config', cfg_path,
         '--validate', 'false', '--checkpoint-interval', '1'],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)


@pytest.mark.skipif(not os.path.exists(SPOT), reason='spot asset missing')
def test_stall_exits_nonzero_then_resume_completes(tmp_path):
    cfg = {
        'ref_mesh': SPOT,
        'iter': 6,
        'batch': 1,
        'spp': 1,
        'train_res': [64, 64],
        'texture_res': [64, 64],
        'dmtet_grid': 16,
        'n_samples': 2,
        'probe_res': 32,
        'save_interval': 0,
        'display_interval': 0,
        'denoiser': 'bilateral',
        'background': 'black',
        'out_root': str(tmp_path),
        'out_dir': 'stall_sim',
    }
    cfg_path = str(tmp_path / 'stall_sim.json')
    with open(cfg_path, 'w') as f:
        json.dump(cfg, f)

    # run 1: the sync wedges at iteration 3 -> watchdog fires -> rc 3
    r1 = _run(cfg_path, {'NVDR_TEST_STALL_AT': '3', 'NVDR_STALL_FLOOR': '3'})
    assert r1.returncode == 3, r1.stdout[-2000:] + r1.stderr[-2000:]
    assert 'STALL at iter 3' in r1.stdout
    ckpt = tmp_path / 'stall_sim' / 'checkpoint_dmtet_pass1.pkl'
    assert ckpt.exists(), 'no checkpoint left behind by the stall exit'

    # run 2: no stall injected -> resumes from the checkpoint, completes
    # both passes and the export (resume is default-on)
    r2 = _run(cfg_path, {})
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
    assert 'Resumed' in r2.stdout
    assert (tmp_path / 'stall_sim' / 'mesh' / 'mesh.obj').exists()
