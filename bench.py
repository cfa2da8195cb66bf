"""Benchmark: end-to-end training throughput + tracer ray throughput on the
current accelerator.  Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Protocol (north star in BASELINE.json): train iters/sec at batch 1, 512^2,
n_samples 4 on the bundled spot scene (fixed topology pass, the steady-state
workload), plus shadow-ray Mrays/s.  vs_baseline is measured against an
estimated reference A6000 figure of 3.3 iter/s for this workload (the
reference publishes no numbers — see BASELINE.md; estimate derived from its
~0.3 s/iter scale on similar configs) — update when a measured reference
number exists.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax

jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('JAX_CACHE_DIR', '/root/.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)

import jax.numpy as jnp

REF_A6000_ITERS_PER_SEC_ESTIMATE = 3.3


def bench_tracer(n_rays=2 ** 21):
    """Shadow-ray throughput on the bundled spot mesh (5856 tris)."""
    from nvdiffrecmc_tpu.ops import bvh as bvh_mod
    from nvdiffrecmc_tpu.ops.pallas_tracer import any_hit_pallas
    from nvdiffrecmc_tpu.ops import tracer
    from nvdiffrecmc_tpu.render import obj as obj_mod

    spot = '/root/reference/data/spot/spot.obj'
    if os.path.exists(spot):
        m = obj_mod.load_obj(spot)
        v, f = m.v_pos, m.t_pos_idx
    else:
        rng = np.random.RandomState(0)
        v = jnp.asarray(rng.randn(3000, 3).astype(np.float32))
        f = jnp.asarray(rng.randint(0, 3000, (6000, 3)).astype(np.int32))
    bvh = bvh_mod.build(v, f, leaf_size=128)

    rng = np.random.RandomState(1)
    # surface-ish rays: origins on the mesh AABB sphere, outward hemisphere
    n_ = rng.randn(n_rays, 3).astype(np.float32)
    n_ /= np.linalg.norm(n_, axis=-1, keepdims=True)
    d = rng.randn(n_rays, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ro = jnp.asarray(n_ * 0.6)
    rd = jnp.asarray(d)

    use_pallas = jax.default_backend() != 'cpu'
    def run(o):
        if use_pallas:
            return any_hit_pallas(o, rd, bvh)
        return tracer.any_hit(o, rd, bvh, ray_chunk=65536)

    float(run(ro).sum())  # warm
    t0 = time.time()
    n_rep = 3
    for i in range(n_rep):
        float(run(ro + 1e-6 * i).sum())  # host sync each rep
    dt = (time.time() - t0) / n_rep
    return n_rays / dt / 1e6


def bench_train(iters=12):
    """Steady-state train step rate: spot fixed-topology, batch 1, 512^2,
    n_samples 4 (the north-star protocol)."""
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

    spot = '/root/reference/data/spot/spot.obj'
    if os.path.exists(spot):
        base_mesh = mesh_mod.load_mesh(spot)
    else:
        import __graft_entry__ as g
        base_mesh, *_ = g._make_scene()
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
    # warm (compile)
    params, opt_state, l = step(params, opt_state, target, jnp.float32(0), key)
    float(l)
    # steady-state protocol: iterations are chained through donated params
    # (strictly sequential on device); sync once at the end.  A per-iter
    # host sync would add the ~72 ms tunnel round-trip to every iteration —
    # real training only syncs at save intervals.
    t0 = time.time()
    for it in range(1, iters):
        params, opt_state, l = step(params, opt_state, target,
                                    jnp.float32(it), jax.random.fold_in(key, it))
    float(l)  # one host sync for the whole chain
    dt = (time.time() - t0) / (iters - 1)
    return 1.0 / dt


def profile_step(trace_dir='/tmp/nvdiffrecmc_tpu_trace'):
    """Capture a jax.profiler trace of a few steady-state train steps.
    View with Perfetto (ui.perfetto.dev) or tensorboard --logdir.
    Usage: python bench.py --profile [trace_dir]."""
    # warm up compile outside the trace window
    bench_train(iters=3)
    with jax.profiler.trace(trace_dir):
        bench_train(iters=4)
    print("trace written to", trace_dir)


def main():
    if '--profile' in sys.argv:
        idx = sys.argv.index('--profile')
        args = sys.argv[idx + 1:idx + 2]
        profile_step(*args)
        return
    t_start = time.time()
    mrays = bench_tracer()
    iters_per_sec = bench_train()
    out = {
        "metric": "train_iters_per_sec_spot_b1_512_n4",
        "value": round(iters_per_sec, 4),
        "unit": "iter/s",
        "vs_baseline": round(iters_per_sec / REF_A6000_ITERS_PER_SEC_ESTIMATE, 4),
        "extra": {
            "shadow_Mrays_per_sec": round(mrays, 2),
            "backend": jax.default_backend(),
            "bench_wall_s": round(time.time() - t_start, 1),
            "baseline_note": "vs estimated A6000 3.3 iter/s (reference publishes no numbers)",
        },
    }
    print(json.dumps(out))


if __name__ == '__main__':
    main()
