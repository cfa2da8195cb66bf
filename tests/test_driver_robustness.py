"""Round-5 driver robustness: budget-scaled schedules, the stall watchdog,
and the jnp occlusion path's k_pairs overflow warning.

Reference anchors: schedule constants /root/reference/train.py:340-343 and
/root/reference/geometry/dmtet.py:220-223 (tuned for the 5000-iter budget);
the watchdog addresses the round-4 dead-tunnel hang (QUALITY.md)."""

import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nvdiffrecmc_tpu import config as config_mod
from nvdiffrecmc_tpu.ops import tracer, bvh as bvh_mod

import train as train_mod


# ---------------------------------------------------------------------------
# Budget-scaled schedules
# ---------------------------------------------------------------------------

def test_schedule_scaling_exact_at_reference_budget():
    F = {'iter': 5000, 'scale_schedules': True}
    config_mod.apply_schedule_scaling(F)
    assert F['shadow_ramp_iters'] == 1750.0
    assert F['lr_decay_rate'] == 0.0002


def test_schedule_scaling_proportional():
    F = {'iter': 300, 'scale_schedules': True}
    config_mod.apply_schedule_scaling(F)
    # shadow ramp completes at the same fraction of the budget (35%)
    assert np.isclose(F['shadow_ramp_iters'], 1750.0 * 300 / 5000)
    # lr decay reaches the same terminal value (0.1x) at end of budget
    assert np.isclose(10.0 ** (-F['lr_decay_rate'] * 300), 0.1)


def test_schedule_scaling_gate_off():
    F = {'iter': 300, 'scale_schedules': False}
    config_mod.apply_schedule_scaling(F)
    assert F['shadow_ramp_iters'] == 1750.0
    assert F['lr_decay_rate'] == 0.0002


def test_parse_flags_derives_schedule_constants():
    F = config_mod.parse_flags(['-i', '500'])
    assert np.isclose(F['shadow_ramp_iters'], 175.0)
    assert np.isclose(10.0 ** (-F['lr_decay_rate'] * 500), 0.1)


def test_strtobool_strict():
    assert config_mod.strtobool('true') and config_mod.strtobool('1')
    assert not config_mod.strtobool('no') and not config_mod.strtobool('0')
    with pytest.raises(Exception):
        config_mod.strtobool('maybe')


# ---------------------------------------------------------------------------
# Stall watchdog
# ---------------------------------------------------------------------------

def test_watchdog_passes_through_fast_sync():
    assert train_mod.sync_with_watchdog(lambda: 42, timeout=5.0) == 42


def test_watchdog_raises_on_stall_and_recovers():
    with pytest.raises(train_mod.StallError):
        train_mod.sync_with_watchdog(lambda: time.sleep(30), timeout=0.2)
    # the pool is replaced after a stall: the next sync is not queued
    # behind the orphaned blocking worker
    t0 = time.time()
    assert train_mod.sync_with_watchdog(lambda: 'ok', timeout=5.0) == 'ok'
    assert time.time() - t0 < 5.0


def test_stall_timeout_scales_with_median(monkeypatch):
    monkeypatch.delenv('NVDR_STALL_FLOOR', raising=False)
    assert train_mod._stall_timeout([]) == 1800.0           # compile window
    assert train_mod._stall_timeout([0.1] * 20) == 120.0    # floor
    assert np.isclose(train_mod._stall_timeout([60.0] * 20), 600.0)
    monkeypatch.setenv('NVDR_STALL_FLOOR', '3')
    assert train_mod._stall_timeout([]) == 3.0              # test hook
    assert train_mod._stall_timeout([0.1] * 20) == 3.0


# ---------------------------------------------------------------------------
# jnp occlusion k_pairs overflow surfaces a warning (VERDICT round-4 item 7)
# ---------------------------------------------------------------------------

def _stacked_quads(n, z0=1.0, dz=0.01):
    """n parallel unit quads stacked in z: a ray through the stack crosses
    every one, forcing n (ray, leaf) candidate pairs."""
    v, f = [], []
    for i in range(n):
        z = z0 + i * dz
        b = 4 * i
        v += [[-1, -1, z], [1, -1, z], [1, 1, z], [-1, 1, z]]
        f += [[b, b + 1, b + 2], [b, b + 2, b + 3]]
    return jnp.asarray(v, jnp.float32), jnp.asarray(f, jnp.int32)


def test_occlusion_overflow_warns_not_silently_unshadows(capsys):
    verts, faces = _stacked_quads(40)
    # leaf_size=2 -> each quad-pair is its own leaf: 40 candidate leaves
    # per ray.  The cap is per-chunk (Rc * k_pairs with Rc >= 512), so use
    # a full 512-ray chunk: 512 * 40 = 20480 pairs >> 512 * 4 = 2048.
    bvh = bvh_mod.build(verts, faces, leaf_size=2)
    ro = jnp.zeros((512, 3), jnp.float32)
    rd = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (512, 1))

    occ_fn = tracer.make_occlusion_fn(backend='jnp', k_pairs=4)
    tracer.OCCLUSION_DROPPED_PAIRS[0] = 0
    occ = occ_fn(ro, rd, bvh)
    jax.block_until_ready(occ)
    jax.effects_barrier()
    # rays still register as occluded (first hits fit under the cap)...
    assert bool(occ.all())
    # ...and the dropped candidates are surfaced loudly, not swallowed
    assert tracer.OCCLUSION_DROPPED_PAIRS[0] > 0
    assert 'k_pairs' in capsys.readouterr().out


def test_occlusion_no_overflow_is_silent():
    verts, faces = _stacked_quads(2)
    bvh = bvh_mod.build(verts, faces, leaf_size=128)
    ro = jnp.zeros((4, 3), jnp.float32)
    rd = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (4, 1))
    occ_fn = tracer.make_occlusion_fn(backend='jnp', k_pairs=16)
    tracer.OCCLUSION_DROPPED_PAIRS[0] = 0
    jax.block_until_ready(occ_fn(ro, rd, bvh))
    jax.effects_barrier()
    assert tracer.OCCLUSION_DROPPED_PAIRS[0] == 0


def test_prune_small_components():
    """Floater pruning at the bake boundary: small disconnected components
    drop, the main component and t_tex alignment survive, 0 disables."""
    import numpy as np
    from train import prune_small_components

    f_big = np.array([[0, 1, 2], [0, 2, 3], [0, 3, 1], [1, 3, 2]])
    f_small = np.array([[4, 5, 6]])
    f = np.concatenate([f_big, f_small])
    ft = np.arange(15).reshape(5, 3)

    f2, ft2, n = prune_small_components(f, ft, 0.3)
    assert n == 1 and len(f2) == 4
    np.testing.assert_array_equal(ft2, ft[:4])  # tex rows stay aligned

    f3, ft3, n3 = prune_small_components(f, ft, 0.0)
    assert n3 == 0 and len(f3) == 5

    # equal-size components below threshold are all kept relative to total
    fa = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8]])
    f4, _, n4 = prune_small_components(fa, fa, 0.3)
    assert n4 == 0  # each component is 1/3 of faces >= 0.3 threshold
