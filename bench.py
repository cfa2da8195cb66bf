"""Benchmark: end-to-end training throughput + tracer ray throughput on the
current accelerator.  Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Protocol (north star in BASELINE.json): train iters/sec at batch 1, 512^2,
n_samples 4 on the bundled spot scene (fixed topology pass, the steady-state
workload), plus the DMTet+hashgrid pass-1 rate and shadow-ray Mrays/s.
vs_baseline is measured against an estimated reference A6000 figure of
3.3 iter/s for this workload (the reference publishes no numbers — see
BASELINE.md) — update when a measured reference number exists.

Timing protocol: ONE host sync per iteration (float(loss)), matching the
reference's per-iteration torch.cuda.synchronize (train.py:481-492), and the
MEDIAN of per-iteration times.  Round 2 chained N dispatches and synced once;
that protocol is unstable under the axon tunnel (measured 0.14-1.47 iter/s
for the identical program across runs while per-iter-synced timing of the
same step held at 0.70 s) — the tunnel sporadically stalls a deep dispatch
queue, and a tail sync folds the stall into the average.  The median of
synced iterations is robust to a single worker hiccup and includes the same
per-iteration host round-trip the reference pays.
"""

import contextlib
import json
import os
import statistics
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
    times = []
    for i in range(3):
        t0 = time.time()
        float(run(ro + 1e-6 * i).sum())  # host sync each rep
        times.append(time.time() - t0)
    return n_rays / statistics.median(times) / 1e6


# v5e peak: 197 TFLOP/s bf16 MXU (f32 analysis FLOPs counted against the
# bf16 peak understates achievable f32 MFU ~2x; stated in extras.mfu_note)
PEAK_FLOPS_V5E_BF16 = 197e12


def _step_cost(jitted, *args):
    """XLA's own FLOP/byte model for one compiled step (auditable MFU
    basis).  Returns {} if the backend doesn't expose cost analysis."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return {'flops': float(ca.get('flops', 0.0)),
                'bytes': float(ca.get('bytes accessed', 0.0))}
    except Exception as e:  # axon tunnel may not expose cost analysis
        print('cost_analysis unavailable: %r' % (e,), file=sys.stderr)
        return {}


def _median_iter_rate(step_fn, params, opt_state, target, key, iters,
                      trace_dir=None):
    """Median per-iteration rate with one host sync per iteration.
    With trace_dir, the post-warmup iterations run under jax.profiler
    (same warmed jit — tracing a separate rebuild misses the step)."""
    # warm (compile + first run)
    params, opt_state, l = step_fn(params, opt_state, target,
                                   jnp.float32(0), key)
    float(l)
    ctx = (jax.profiler.trace(trace_dir) if trace_dir
           else contextlib.nullcontext())
    times = []
    with ctx:
        for it in range(1, iters):
            t0 = time.time()
            params, opt_state, l = step_fn(params, opt_state, target,
                                           jnp.float32(it),
                                           jax.random.fold_in(key, it))
            float(l)  # host sync: per-iteration, like the reference
            times.append(time.time() - t0)
    return 1.0 / statistics.median(times)


def _spot_target(res, rng_seed=2, batch=1):
    from nvdiffrecmc_tpu.ops import vecmath
    rng = np.random.RandomState(rng_seed)
    mvp = (vecmath.perspective(0.7854, 1, 0.1, 1000)
           @ vecmath.translate(0, 0, -3)
           @ vecmath.rotate_y(0.5))
    return {
        'img': jnp.asarray(rng.rand(batch, res, res, 4).astype(np.float32)),
        'mvp': jnp.asarray(np.tile(mvp[None], (batch, 1, 1)).astype(np.float32)),
        'campos': jnp.asarray(np.tile([[0, 0, 3]], (batch, 1)).astype(np.float32)),
        'background': jnp.ones((batch, res, res, 3)) * 0.5,
    }


def bench_train(iters=12, trace_dir=None):
    """Steady-state pass-2 train step rate: spot fixed topology, batch 1,
    512^2, n_samples 4 (the north-star protocol)."""
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
    target = _spot_target(res)
    cost = _step_cost(step, params, opt_state, target, jnp.float32(0),
                      jax.random.PRNGKey(0))
    rate = _median_iter_rate(step, params, opt_state, target,
                             jax.random.PRNGKey(0), iters,
                             trace_dir=trace_dir)
    return rate, cost


def bench_pass1(iters=8, trace_dir=None, annealed=False):
    """Pass-1 (DMTet + hashgrid MLP texture) train step rate at 512^2,
    batch 1, n_samples 4 on a bob-like setup (VERDICT r2 item 5): the other
    half of every real training run, exercising marching tets + the hash
    encoding + per-iteration BVH rebuild.

    annealed=True replaces the random-SDF init with a sphere SDF — the
    mid-training geometry state.  The random init is a volume-filling
    77k-triangle noise cloud whose per-block visit-list unions degenerate
    the tracer to brute force (PERF_NOTES round-4 addendum); it dominates
    only the first ~10% of a real run, so both phases are reported."""
    import train as train_mod
    from nvdiffrecmc_tpu.geometry import DMTetGeometry
    from nvdiffrecmc_tpu.render import light as light_mod
    from nvdiffrecmc_tpu.ops import envshade
    import optax

    res = 512
    n_samples = 4
    FLAGS = train_mod.parse_flags([])
    FLAGS.update(dict(train_res=[res, res], n_samples=n_samples, batch=1,
                      iter=iters, layers=1, spp=1, denoiser='bilateral',
                      dmtet_grid=64, mesh_scale=2.1))

    geometry = DMTetGeometry(64, 2.1, FLAGS)
    mat_params, mat_static = train_mod.initial_guess_material(
        geometry, True, FLAGS)
    mat_static['no_perturbed_nrm'] = True
    light_base = light_mod.create_trainable_env_rnd(256, 0.0, 0.5)
    image_loss_fn = train_mod.createLoss(FLAGS)
    perms = envshade.make_perms(n_samples)
    geo_consts = geometry.consts() if hasattr(geometry, 'consts') else None

    opt = optax.adam(1e-2)
    geo_params = geometry.parameters()
    if annealed:
        # sphere of radius 0.35*scale centered at the origin: a smooth
        # closed surface like a mid-training shape (~10-15k triangles)
        geo_params = dict(geo_params)
        geo_params['sdf'] = (jnp.linalg.norm(geometry.verts, axis=-1)
                             - 0.35 * 2.1)
    params = {'geo': geo_params, 'mat': mat_params,
              'light': light_base}
    opt_state = opt.init(params)

    def step(params, opt_state, target, it, key, gconsts):
        import contextlib
        ctx = (geometry.bind_consts(gconsts) if gconsts is not None
               else contextlib.nullcontext())
        with ctx:
            tables = light_mod.update_pdf(params['light'])
            lgt = {'base': params['light'], 'pdf': tables.pdf,
                   'rows': tables.rows, 'cols': tables.cols}
            tgt = dict(target, resolution=(res, res), spp=1)

            def loss_fn(p):
                lgt_p = dict(lgt, base=p['light'])
                material = train_mod.make_material(p['mat'], mat_static)
                img_loss, reg_loss = geometry.tick(
                    p['geo'], material, lgt_p, tgt, image_loss_fn, it, FLAGS,
                    jnp.float32(1.0), perms, key, rnd_seed=it.astype(jnp.int32))
                return img_loss + reg_loss, img_loss

            grads, img_loss = jax.grad(loss_fn, has_aux=True)(params)
            upd, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, upd), opt_state, img_loss

    jstep = jax.jit(step, donate_argnums=(0, 1))

    def step_bound(params, opt_state, target, it, key):
        return jstep(params, opt_state, target, it, key, geo_consts)

    target = _spot_target(res, rng_seed=3)
    cost = _step_cost(jstep, params, opt_state, target, jnp.float32(0),
                      jax.random.PRNGKey(1), geo_consts)
    rate = _median_iter_rate(step_bound, params, opt_state, target,
                             jax.random.PRNGKey(1), iters,
                             trace_dir=trace_dir)
    return rate, cost


def profile_step(trace_dir='/tmp/nvdiffrecmc_tpu_trace', which='pass2'):
    """Capture a jax.profiler trace of a few steady-state train steps.
    View with Perfetto (ui.perfetto.dev) or tensorboard --logdir.
    Usage: python bench.py --profile [trace_dir] | --profile-pass1 [dir]."""
    fn = bench_pass1 if which == 'pass1' else bench_train
    fn(iters=5, trace_dir=trace_dir)
    print("trace written to", trace_dir)


def _mfu(rate, cost):
    if not cost or not cost.get('flops'):
        return None
    return round(100.0 * rate * cost['flops'] / PEAK_FLOPS_V5E_BF16, 3)


def _note(msg, t0):
    print('[bench +%5.0fs] %s' % (time.time() - t0, msg),
          file=sys.stderr, flush=True)


def _probe_device(max_wait_s=600.0):
    """Fail fast (nonzero exit + message) instead of hanging forever when
    the axon tunnel is dead: a blocked first device op sits in tcp recv
    indefinitely (see PERF_NOTES round 5 / tools/run_quality_spot.sh)."""
    import concurrent.futures
    deadline = time.time() + max_wait_s
    pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
    while True:
        fut = pool.submit(lambda: float(jnp.ones(()).sum()))
        try:
            fut.result(timeout=min(120.0, max(5.0, deadline - time.time())))
            return
        except concurrent.futures.TimeoutError:
            pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        except Exception as e:
            print('bench: device probe error: %r' % (e,), file=sys.stderr)
        if time.time() >= deadline:
            print('bench: device unreachable for %.0f s (dead tunnel?) — '
                  'aborting instead of hanging' % max_wait_s,
                  file=sys.stderr, flush=True)
            sys.exit(4)
        time.sleep(15)


def main():
    for flag, which in (('--profile', 'pass2'), ('--profile-pass1', 'pass1')):
        if flag in sys.argv:
            idx = sys.argv.index(flag)
            args = sys.argv[idx + 1:idx + 2]
            profile_step(*args, which=which)
            return
    _probe_device()
    t_start = time.time()
    _note('tracer bench...', t_start)
    mrays = bench_tracer()
    _note('tracer %.2f Mrays/s; pass-2 train bench...' % mrays, t_start)
    iters_per_sec, cost2 = bench_train()
    _note('pass-2 %.3f iter/s; pass-1 train bench...' % iters_per_sec, t_start)
    pass1_rate, cost1 = bench_pass1()
    _note('pass-1 %.3f iter/s; pass-1 annealed bench...' % pass1_rate,
          t_start)
    pass1_ann_rate, _ = bench_pass1(annealed=True)
    _note('pass-1 annealed %.3f iter/s' % pass1_ann_rate, t_start)
    out = {
        "metric": "train_iters_per_sec_spot_b1_512_n4",
        "value": round(iters_per_sec, 4),
        "unit": "iter/s",
        "vs_baseline": round(iters_per_sec / REF_A6000_ITERS_PER_SEC_ESTIMATE, 4),
        "extra": {
            "pass1_dmtet_hashgrid_iters_per_sec": round(pass1_rate, 4),
            "pass1_annealed_iters_per_sec": round(pass1_ann_rate, 4),
            "pass1_note": "pass1 = random-SDF init (blob transient, worst "
                          "case); pass1_annealed = sphere SDF (mid-training "
                          "geometry, the steady state of a real run)",
            "shadow_Mrays_per_sec": round(mrays, 2),
            "backend": jax.default_backend(),
            "bench_wall_s": round(time.time() - t_start, 1),
            "timing": "median per-iter, one host sync per iter (ref protocol)",
            "baseline_note": "vs estimated A6000 3.3 iter/s (reference publishes no numbers)",
            "step_gflops_pass2": round(cost2['flops'] / 1e9, 2) if cost2 else None,
            "step_gbytes_pass2": round(cost2['bytes'] / 1e9, 2) if cost2 else None,
            "step_gflops_pass1": round(cost1['flops'] / 1e9, 2) if cost1 else None,
            "step_gbytes_pass1": round(cost1['bytes'] / 1e9, 2) if cost1 else None,
            "mfu_pct": _mfu(iters_per_sec, cost2),
            "mfu_pct_pass1": _mfu(pass1_rate, cost1),
            "mfu_note": "XLA cost-analysis FLOPs vs 197 TFLOP/s v5e bf16 peak; "
                        "this workload is gather/latency-bound, not MXU-bound, "
                        "so low MFU is expected — trend matters",
        },
    }
    print(json.dumps(out))


if __name__ == '__main__':
    main()
