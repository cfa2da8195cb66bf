"""Diagnose train-step time variance: per-iteration host-synced timing.

Usage: python tools/bench_diag.py [iters]
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


def main(iters=8):
    import train as train_mod
    from nvdiffrecmc_tpu.geometry import DLMesh
    from nvdiffrecmc_tpu.render import mesh as mesh_mod
    from nvdiffrecmc_tpu.render import light as light_mod
    from nvdiffrecmc_tpu.ops import envshade
    import optax

    res = 512
    n_samples = 4
    FLAGS = train_mod.parse_flags([])
    FLAGS.update(dict(train_res=[res, res], n_samples=n_samples, batch=1,
                      iter=iters, layers=1, spp=1, denoiser='bilateral'))

    base_mesh = mesh_mod.load_mesh('/root/reference/data/spot/spot.obj')
    geometry = DLMesh(base_mesh, FLAGS)
    mat_params, mat_static = train_mod.initial_guess_material(
        geometry, False, FLAGS)
    light_base = light_mod.create_trainable_env_rnd(256, 0.0, 0.5)
    image_loss_fn = train_mod.createLoss(FLAGS)
    perms = envshade.make_perms(n_samples)

    opt = optax.adam(1e-2)
    params = {'geo': geometry.parameters(), 'mat': mat_params,
              'light': light_base}
    opt_state = opt.init(params)

    def step(params, opt_state, target, it, key):
        tables = light_mod.update_pdf(params['light'])
        lgt = {'base': params['light'], 'pdf': tables.pdf,
               'rows': tables.rows, 'cols': tables.cols}
        tgt = dict(target, resolution=(res, res), spp=1)

        def loss_fn(p):
            lgt_p = dict(lgt, base=p['light'])
            material = train_mod.make_material(p['mat'], mat_static)
            img_loss, reg_loss = geometry.tick(
                p['geo'], material, lgt_p, tgt, image_loss_fn, it, FLAGS,
                jnp.float32(2.0), perms, key, rnd_seed=it.astype(jnp.int32))
            return img_loss + reg_loss, img_loss

        grads, img_loss = jax.grad(loss_fn, has_aux=True)(params)
        upd, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, upd), opt_state, img_loss

    step = jax.jit(step, donate_argnums=(0, 1))

    rng = np.random.RandomState(2)
    from nvdiffrecmc_tpu.ops import vecmath
    mvp = (vecmath.perspective(0.7854, 1, 0.1, 1000)
           @ vecmath.translate(0, 0, -3)
           @ vecmath.rotate_y(0.5))
    target = {
        'img': jnp.asarray(rng.rand(1, res, res, 4).astype(np.float32)),
        'mvp': jnp.asarray(mvp[None].astype(np.float32)),
        'campos': jnp.asarray(np.array([[0, 0, 3]], np.float32)),
        'background': jnp.ones((1, res, res, 3)) * 0.5,
    }

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    params, opt_state, l = step(params, opt_state, target, jnp.float32(0), key)
    print('compile+first: %.1f s (loss=%.5f)' % (time.time() - t0, float(l)),
          flush=True)
    for it in range(1, iters):
        t0 = time.time()
        params, opt_state, l = step(params, opt_state, target,
                                    jnp.float32(it),
                                    jax.random.fold_in(key, it))
        lv = float(l)  # per-iter host sync
        print('iter %d: %.3f s  loss=%.5f' % (it, time.time() - t0, lv),
              flush=True)

    # A/B: chained dispatch (old bench.py protocol), sync once at the end
    t0 = time.time()
    for it in range(iters, 2 * iters):
        params, opt_state, l = step(params, opt_state, target,
                                    jnp.float32(it),
                                    jax.random.fold_in(key, it))
    float(l)
    print('chained protocol: %.3f s/iter over %d iters'
          % ((time.time() - t0) / iters, iters), flush=True)

    if '--profile' in sys.argv:
        with jax.profiler.trace('/tmp/nvdr_trace'):
            for it in range(2 * iters, 2 * iters + 3):
                params, opt_state, l = step(params, opt_state, target,
                                            jnp.float32(it),
                                            jax.random.fold_in(key, it))
                float(l)
        print('trace written to /tmp/nvdr_trace', flush=True)


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
