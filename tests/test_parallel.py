"""Multi-device data-parallel training step on the 8-virtual-device CPU mesh.

Validates the SPMD story of SURVEY.md section 2.3: batch sharded over a 1-D
'data' mesh axis, parameters replicated, XLA inserting the gradient
all-reduces.  The sharded step must (a) run, (b) produce a finite loss,
(c) keep updated parameters replicated, and (d) agree numerically with the
same step executed on a single device.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import __graft_entry__ as graft
import train as train_mod
from nvdiffrecmc_tpu.geometry import DLMesh
from nvdiffrecmc_tpu.parallel import make_mesh, replicate, shard_batch
from nvdiffrecmc_tpu.render import light as light_mod


RES, N_SAMPLES, BATCH = 16, 1, 8


def _setup():
    m, light_base, perms, mvp, campos = graft._make_scene(
        RES, N_SAMPLES, batch=BATCH, sub=1, light_res=16)
    FLAGS = dict(train_mod.parse_flags([]))
    FLAGS.update(dict(n_samples=N_SAMPLES, train_res=[RES, RES], iter=10,
                      batch=BATCH, layers=1, spp=1,
                      # tiny trainable textures: at the default 1024^2 the
                      # per-step mip-pyramid rebuild + texture regularizers
                      # cost ~2 s/step on a 1-core CPU host regardless of
                      # image size, and 8 staggered device threads then blow
                      # the collective rendezvous budget
                      texture_res=[32, 32]))
    geometry = DLMesh(m, FLAGS)
    mat_params, mat_static = train_mod.initial_guess_material(
        geometry, False, FLAGS)
    image_loss_fn = train_mod.createLoss(FLAGS)
    opt = optax.adam(1e-2)
    params = {'geo': geometry.parameters(), 'mat': mat_params,
              'light': light_base}
    opt_state = opt.init(params)

    def step(params, opt_state, target, key):
        tables = light_mod.update_pdf(params['light'])
        tgt = dict(target, resolution=(RES, RES), spp=1)

        def loss_fn(p):
            lgt_p = {'base': p['light'], 'pdf': tables.pdf,
                     'rows': tables.rows, 'cols': tables.cols}
            material = train_mod.make_material(p['mat'], mat_static)
            img_loss, reg_loss = geometry.tick(
                p['geo'], material, lgt_p, tgt, image_loss_fn,
                jnp.float32(0.0), FLAGS, jnp.float32(1.0), perms, key,
                rnd_seed=jnp.int32(0))
            return img_loss + reg_loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss, grads

    rng = np.random.RandomState(0)
    target = {
        'img': jnp.asarray(rng.rand(BATCH, RES, RES, 4).astype(np.float32)),
        'mvp': mvp,
        'campos': campos,
        'background': jnp.ones((BATCH, RES, RES, 3)),
    }
    return step, params, opt_state, target


@pytest.fixture(scope='module')
def sharded_and_single():
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices (tests/conftest.py)')
    step, params, opt_state, target = _setup()
    key = jax.random.PRNGKey(0)

    mesh = make_mesh(8)
    with mesh:
        p_sh = replicate(mesh, params)
        o_sh = replicate(mesh, opt_state)
        t_sh = shard_batch(mesh, target)
        new_p, _, loss_sh, g_sh = jax.jit(step)(p_sh, o_sh, t_sh, key)
        loss_sh = float(loss_sh)

    # same step, single device
    dev = jax.devices()[0]
    p1 = jax.device_put(params, dev)
    o1 = jax.device_put(opt_state, dev)
    t1 = jax.device_put(target, dev)
    new_p1, _, loss_1, g_1 = jax.jit(step)(p1, o1, t1, key)
    return new_p, loss_sh, g_sh, new_p1, float(loss_1), g_1


def test_sharded_step_finite(sharded_and_single):
    new_p, loss_sh, *_ = sharded_and_single
    assert np.isfinite(loss_sh), loss_sh
    for leaf in jax.tree.leaves(new_p):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_params_stay_replicated(sharded_and_single):
    new_p, *_ = sharded_and_single
    for path, leaf in jax.tree_util.tree_flatten_with_path(new_p)[0]:
        assert leaf.sharding.is_fully_replicated, (path, leaf.sharding)


def test_sharded_matches_single_device(sharded_and_single):
    new_p, loss_sh, g_sh, new_p1, loss_1, g_1 = sharded_and_single
    assert abs(loss_sh - loss_1) < 1e-4 * max(1.0, abs(loss_1)), \
        (loss_sh, loss_1)
    # gradients: tight — the 8-way psum vs single-device reduce must agree
    # to summation-order noise
    for a, b in zip(jax.tree.leaves(g_sh), jax.tree.leaves(g_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)
    # updated params: loose — adam normalizes by sqrt(v), so for near-zero
    # gradients the update approaches lr*sign(g) and reduce-order noise in
    # g flips to an O(lr) param difference (observed: 4/3072 texels at
    # ~4e-4 with lr 1e-2).  Bound it by lr/10 instead of chasing it.
    for a, b in zip(jax.tree.leaves(new_p), jax.tree.leaves(new_p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# Sharded DMTet pass-1 step (geo_consts as jit args under the mesh)
# ---------------------------------------------------------------------------

def _setup_dmtet():
    from nvdiffrecmc_tpu.geometry import DMTetGeometry
    m, light_base, perms, mvp, campos = graft._make_scene(
        RES, N_SAMPLES, batch=BATCH, sub=1, light_res=16)
    FLAGS = dict(train_mod.parse_flags([]))
    FLAGS.update(dict(n_samples=N_SAMPLES, train_res=[RES, RES], iter=10,
                      batch=BATCH, layers=1, spp=1, no_perturbed_nrm=True))
    geometry = DMTetGeometry(6, 1.0, FLAGS, max_tris=512)
    mat_params, mat_static = train_mod.initial_guess_material(
        geometry, True, FLAGS)
    image_loss_fn = train_mod.createLoss(FLAGS)
    geo_consts = geometry.consts()

    def step(params, target, key, gconsts):
        """Gradients only (no optimizer): the sharding-critical piece is
        the psum of the tick's grads with the big geometry tables riding
        as replicated jit ARGUMENTS (train.py's compute_grads protocol)."""
        with geometry.bind_consts(gconsts):
            tables = light_mod.update_pdf(params['light'])
            tgt = dict(target, resolution=(RES, RES), spp=1)

            def loss_fn(p):
                lgt_p = {'base': p['light'], 'pdf': tables.pdf,
                         'rows': tables.rows, 'cols': tables.cols}
                material = train_mod.make_material(p['mat'], mat_static)
                img_loss, reg_loss = geometry.tick(
                    p['geo'], material, lgt_p, tgt, image_loss_fn,
                    jnp.float32(5.0), FLAGS, jnp.float32(1.0), perms, key,
                    rnd_seed=jnp.int32(5))
                return img_loss + reg_loss

            return jax.value_and_grad(loss_fn)(params)

    params = {'geo': geometry.parameters(),
              'mat': mat_params, 'light': light_base}
    rng = np.random.RandomState(0)
    target = {
        'img': jnp.asarray(rng.rand(BATCH, RES, RES, 4).astype(np.float32)),
        'mvp': mvp, 'campos': campos,
        'background': jnp.ones((BATCH, RES, RES, 3)),
    }
    return step, params, target, geo_consts


def test_sharded_dmtet_pass1_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices (tests/conftest.py)')
    step, params, target, geo_consts = _setup_dmtet()
    key = jax.random.PRNGKey(0)

    mesh = make_mesh(8)
    with mesh:
        p_sh = replicate(mesh, params)
        c_sh = replicate(mesh, geo_consts)
        t_sh = shard_batch(mesh, target)
        loss_sh, g_sh = jax.jit(step)(p_sh, t_sh, key, c_sh)
        loss_sh = float(loss_sh)

    dev = jax.devices()[0]
    loss_1, g_1 = jax.jit(step)(jax.device_put(params, dev),
                                jax.device_put(target, dev), key,
                                jax.device_put(geo_consts, dev))
    loss_1 = float(loss_1)

    assert np.isfinite(loss_sh)
    assert abs(loss_sh - loss_1) < 1e-4 * max(1.0, abs(loss_1)), \
        (loss_sh, loss_1)
    for a, b in zip(jax.tree.leaves(g_sh), jax.tree.leaves(g_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)
