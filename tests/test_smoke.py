"""Trace-only full-pipeline smoke tests (the pre-commit gate).

These trace BOTH training passes end to end — fwd AND bwd — with
``jax.eval_shape``, which runs jax's abstract interpreter over every line of
the step without compiling or executing anything.  That catches the entire
class of "refactor left a dangling name / wrong arity / bad shape" break in
a few seconds (round 3 shipped with a NameError in render.py that 8 minutes
of compiled tests would have caught; this file catches it in ~5 s).

Run before every commit: ``python -m pytest -m smoke -q``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as graft
import train as train_mod
from nvdiffrecmc_tpu.geometry import DLMesh, DMTetGeometry
from nvdiffrecmc_tpu.ops import envshade
from nvdiffrecmc_tpu.render import light as light_mod

RES, N_SAMPLES, BATCH = 16, 2, 2


def _flags(**kw):
    FLAGS = dict(train_mod.parse_flags([]))
    FLAGS.update(dict(n_samples=N_SAMPLES, train_res=[RES, RES], iter=10,
                      batch=BATCH, layers=1, spp=1, texture_res=[16, 16]))
    FLAGS.update(kw)
    return FLAGS


def _target(mvp, campos):
    return {
        'img': jnp.zeros((BATCH, RES, RES, 4)),
        'mvp': mvp, 'campos': campos,
        'background': jnp.zeros((BATCH, RES, RES, 3)),
        'resolution': (RES, RES), 'spp': 1,
    }


def _trace_step(geometry, params_geo, mat_params, mat_static, FLAGS,
                target, perms):
    """eval_shape through value_and_grad of the full tick."""
    image_loss_fn = train_mod.createLoss(FLAGS)
    params = {'geo': params_geo, 'mat': mat_params, 'light':
              jnp.ones((8, 16, 3)) * 0.5}

    def loss(p):
        tables = light_mod.update_pdf(p['light'])
        lgt = {'base': p['light'], 'pdf': tables.pdf, 'rows': tables.rows,
               'cols': tables.cols}
        material = train_mod.make_material(p['mat'], mat_static)
        img_loss, reg_loss = geometry.tick(
            p['geo'], material, lgt, target, image_loss_fn,
            jnp.float32(5.0), FLAGS, jnp.float32(1.0), perms,
            jax.random.PRNGKey(0), rnd_seed=jnp.int32(5))
        return img_loss + reg_loss

    out = jax.eval_shape(jax.value_and_grad(loss), params)
    loss_shape, grads_shape = out
    assert loss_shape.shape == ()
    # every parameter leaf must receive a gradient of its own shape
    for (pl, gl) in zip(jax.tree.leaves(params),
                        jax.tree.leaves(grads_shape)):
        assert np.asarray(pl).shape == gl.shape


@pytest.mark.smoke
def test_trace_dlmesh_pass2_step():
    """Pass-2 step (DLMesh + 2D textures + denoiser): trace fwd+bwd."""
    m, _, perms, mvp, campos = graft._make_scene(
        RES, N_SAMPLES, batch=BATCH, sub=1, light_res=16)
    FLAGS = _flags()
    geometry = DLMesh(m, FLAGS)
    mat_params, mat_static = train_mod.initial_guess_material(
        geometry, False, FLAGS)
    _trace_step(geometry, geometry.parameters(), mat_params, mat_static,
                FLAGS, _target(mvp, campos), perms)


@pytest.mark.smoke
def test_trace_dmtet_pass1_step():
    """Pass-1 step (DMTet + hash-grid MLP material): trace fwd+bwd."""
    _, _, perms, mvp, campos = graft._make_scene(
        RES, N_SAMPLES, batch=BATCH, sub=1, light_res=16)
    FLAGS = _flags(no_perturbed_nrm=True)
    geometry = DMTetGeometry(8, 1.0, FLAGS, max_tris=1024)
    mat_params, mat_static = train_mod.initial_guess_material(
        geometry, True, FLAGS)
    _trace_step(geometry, geometry.parameters(), mat_params, mat_static,
                FLAGS, _target(mvp, campos), perms)


@pytest.mark.smoke
def test_render_eval_staged_runs():
    """render_eval (staged K-seed protocol) executes end to end and is
    finite; covers the fn_g/fn_mc/fn_fin jit split and display overrides."""
    m, _, perms, mvp, campos = graft._make_scene(
        RES, N_SAMPLES, batch=1, sub=1, light_res=16)
    FLAGS = _flags(batch=1)
    geometry = DLMesh(m, FLAGS)
    mat_params, mat_static = train_mod.initial_guess_material(
        geometry, False, FLAGS)
    light_base = jnp.ones((8, 16, 3)) * 0.5
    target = {'mvp': mvp[:1], 'campos': campos[:1],
              'background': jnp.zeros((1, RES, RES, 3)),
              'resolution': (RES, RES)}
    buffers = train_mod.render_eval(
        geometry, geometry.parameters(), mat_params, mat_static, light_base,
        target, FLAGS, n_samples=8)
    assert np.all(np.isfinite(np.asarray(buffers['shaded'])))
    kd = train_mod.render_eval(
        geometry, geometry.parameters(), mat_params, mat_static, light_base,
        target, FLAGS, n_samples=8, bsdf="kd")
    assert np.all(np.isfinite(np.asarray(kd['shaded'])))

    # grouped on-device stage accumulation (STAGES_PER_PROG) must equal
    # the one-dispatch-per-seed path: same seeds, different sum order
    import unittest.mock as mock
    train_mod._EVAL_JIT_CACHE.clear()
    with mock.patch.object(train_mod, 'STAGES_PER_PROG', 2):
        grouped = train_mod.render_eval(
            geometry, geometry.parameters(), mat_params, mat_static,
            light_base, target, FLAGS, n_samples=8)
    train_mod._EVAL_JIT_CACHE.clear()
    np.testing.assert_allclose(np.asarray(grouped['shaded']),
                               np.asarray(buffers['shaded']),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.smoke
def test_pass_boundary_bake():
    """DMTet -> static mesh extraction -> UV unwrap -> MLP->2D texture bake
    with seam dilation (the pass-1/pass-2 artifact handoff,
    reference train.py:108-152)."""
    FLAGS = _flags(no_perturbed_nrm=True, texture_res=[32, 32])
    geometry = DMTetGeometry(6, 1.0, FLAGS, max_tris=512)
    mat_params, mat_static = train_mod.initial_guess_material(
        geometry, True, FLAGS)
    base, baked = train_mod.bake_textures(
        geometry, geometry.parameters(), mat_params, mat_static, FLAGS)
    assert baked['kd'].shape == (1, 32, 32, 3)
    assert baked['ks'].shape == (1, 32, 32, 3)
    assert baked['normal'].shape[-1] == 3
    for k, v in baked.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    # unwrap produced a usable atlas: uvs in [0,1], some chart coverage
    uv = np.asarray(base.v_tex)
    assert uv.min() >= -1e-5 and uv.max() <= 1 + 1e-5
    # baked kd respects the configured range (sigmoid-scaled MLP output)
    kd = np.asarray(baked['kd'])
    assert kd.min() >= -1e-4 and kd.max() <= 1.0 + 1e-4
