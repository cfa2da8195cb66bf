"""Component-level timing of the north-star train step on the current
accelerator.  Each stage is timed with a forced host transfer (the axon
tunnel does not block on block_until_ready; see PERF_NOTES.md).

Usage: python tools/perf_breakdown.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('JAX_CACHE_DIR', '/root/.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)

import jax.numpy as jnp


def sync(x):
    return float(jnp.asarray(x).sum())


def timeit(name, fn, *args, reps=4):
    fn(*args)  # warm/compile
    sync(jax.tree_util.tree_leaves(fn(*args))[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        sync(jax.tree_util.tree_leaves(out)[0])
    dt = (time.time() - t0) / reps
    print("%-34s %8.1f ms" % (name, dt * 1e3))
    return dt


def main():
    import train as train_mod
    from nvdiffrecmc_tpu.geometry import DLMesh
    from nvdiffrecmc_tpu.render import mesh as mesh_mod
    from nvdiffrecmc_tpu.render import light as light_mod
    from nvdiffrecmc_tpu.render import render as render_mod
    from nvdiffrecmc_tpu.ops import envshade, bvh as bvh_mod
    from nvdiffrecmc_tpu.ops import rasterizer as ras
    from nvdiffrecmc_tpu.ops import denoiser as den
    from nvdiffrecmc_tpu.ops import xfm
    from nvdiffrecmc_tpu.ops import vecmath
    import optax

    res, n_samples = 512, 4
    FLAGS = train_mod.parse_flags([])
    FLAGS.update(dict(train_res=[res, res], n_samples=n_samples, batch=1,
                      iter=12, layers=1, spp=1, denoiser='bilateral'))
    base_mesh = mesh_mod.load_mesh('/root/reference/data/spot/spot.obj')
    geometry = DLMesh(base_mesh, FLAGS)
    mat_params, mat_static = train_mod.initial_guess_material(
        geometry, False, FLAGS)
    light_base = light_mod.create_trainable_env_rnd(256, 0.0, 0.5)
    image_loss_fn = train_mod.createLoss(FLAGS)
    perms = envshade.make_perms(n_samples)

    mvp = (vecmath.perspective(0.7854, 1, 0.1, 1000)
           @ vecmath.translate(0, 0, -3) @ vecmath.rotate_y(0.5))
    rng = np.random.RandomState(2)
    target = {
        'img': jnp.asarray(rng.rand(1, res, res, 4).astype(np.float32)),
        'mvp': jnp.asarray(mvp[None].astype(np.float32)),
        'campos': jnp.asarray(np.array([[0, 0, 3]], np.float32)),
        'background': jnp.ones((1, res, res, 3)) * 0.5,
        'resolution': (res, res), 'spp': 1,
    }
    key = jax.random.PRNGKey(0)

    opt = optax.adam(1e-2)
    params = {'geo': geometry.parameters(), 'mat': mat_params,
              'light': light_base}
    opt_state = opt.init(params)

    # --- full step ---
    def step(params, opt_state, it):
        tables = light_mod.update_pdf(params['light'])
        lgt = {'base': params['light'], 'pdf': tables.pdf,
               'rows': tables.rows, 'cols': tables.cols}

        def loss_fn(p):
            lgt_p = dict(lgt, base=p['light'])
            material = train_mod.make_material(p['mat'], mat_static)
            img_loss, reg_loss = geometry.tick(
                p['geo'], material, lgt_p, target, image_loss_fn, it,
                FLAGS, jnp.float32(2.0), perms, key,
                rnd_seed=it.astype(jnp.int32))
            return img_loss + reg_loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state2 = opt.update(grads, opt_state)
        return optax.apply_updates(params, upd), opt_state2, loss

    step_j = jax.jit(step)
    timeit("full train step", lambda: step_j(params, opt_state,
                                             jnp.float32(1.0))[2])

    # --- forward-only loss ---
    def fwd_loss(p, it):
        tables = light_mod.update_pdf(p['light'])
        lgt = {'base': p['light'], 'pdf': tables.pdf,
               'rows': tables.rows, 'cols': tables.cols}
        material = train_mod.make_material(p['mat'], mat_static)
        img_loss, reg_loss = geometry.tick(
            p['geo'], material, lgt, target, image_loss_fn, it, FLAGS,
            jnp.float32(2.0), perms, key, rnd_seed=it.astype(jnp.int32))
        return img_loss + reg_loss

    fwd_j = jax.jit(fwd_loss)
    timeit("forward loss only", lambda: fwd_j(params, jnp.float32(1.0)))

    # --- pieces ---
    material = train_mod.make_material(mat_params, mat_static)
    mesh_built, bvh = jax.jit(
        lambda p: geometry.getMesh(p, material))(params['geo'])

    timeit("BVH build + normals (getMesh)",
           lambda: jax.jit(lambda p: geometry.getMesh(p, material)[0].v_nrm)(
               params['geo']))

    v_clip = jax.jit(lambda m: xfm.xfm_points(m, target['mvp']))(
        mesh_built.v_pos)

    timeit("rasterize 512^2",
           lambda: jax.jit(lambda vc: ras.rasterize(
               vc, mesh_built.t_pos_idx, (res, res))[0])(v_clip))

    tables = light_mod.update_pdf(light_base)
    lgt = {'base': light_base, 'pdf': tables.pdf, 'rows': tables.rows,
           'cols': tables.cols}

    def full_render(p_geo, lb):
        tb = light_mod.update_pdf(lb)
        lg = {'base': lb, 'pdf': tb.pdf, 'rows': tb.rows, 'cols': tb.cols}
        m, bv = geometry.getMesh(p_geo, material)
        return render_mod.render_mesh(
            FLAGS, m, target['mvp'], target['campos'], lg, (res, res), bv,
            perms, key, denoiser_sigma=jnp.float32(2.0), shadow_scale=0.5,
            rnd_seed=1)['shaded']

    timeit("render_mesh fwd (full pipeline)",
           lambda: jax.jit(full_render)(params['geo'], light_base))

    # denoiser alone
    img = jnp.ones((1, res, res, 3)) * 0.5
    nrm = jnp.tile(jnp.asarray([0., 0., 1.])[None, None, None], (1, res, res, 1))
    depth = jnp.ones((1, res, res, 2))
    timeit("bilateral denoiser (1x fwd)",
           lambda: jax.jit(den.bilateral_denoiser)(img, nrm, depth,
                                                   jnp.float32(2.0)))


if __name__ == '__main__':
    main()
