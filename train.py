"""nvdiffrecmc_tpu training driver.

End-to-end two-pass shape/material/light decomposition with the same CLI and
config surface as the reference (/root/reference/train.py): pass 1 optimizes
a DMTet SDF + neural material, pass 2 a fixed-topology mesh with baked 2D
textures.  The whole training iteration (render, Monte-Carlo shading with
shadow rays, denoiser, losses, three Adam updates, parameter projections)
compiles into a single XLA program.

Usage: python train.py --config configs/bob.json
"""

import argparse
import contextlib
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax

# persistent compilation cache: full-step programs are large and the remote
# TPU compile path is slow; cache across runs.  Host-fingerprinted: CPU AOT
# artifacts from another machine poison the loader (see utils/hostcache.py).
from nvdiffrecmc_tpu.utils.hostcache import host_cache_dir  # noqa: E402
jax.config.update('jax_compilation_cache_dir', host_cache_dir(
    os.environ.get('JAX_CACHE_DIR', '/root/.jax_cache')))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)

# the axon TPU plugin registers via sitecustomize and ignores the
# JAX_PLATFORMS env var; honor it here so CPU runs (tests, debugging)
# never dial the tunnel (see tests/conftest.py for the same workaround)
if os.environ.get('JAX_PLATFORMS') == 'cpu':
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import optax

from nvdiffrecmc_tpu.config import parse_flags, resolve_path
from nvdiffrecmc_tpu.dataset import DatasetMesh, DatasetNERF, DatasetLLFF
from nvdiffrecmc_tpu.dataset.dataset import batch_iterator
from nvdiffrecmc_tpu.dataset.dataset_mesh import load_env_or_procedural
from nvdiffrecmc_tpu.geometry import DMTetGeometry, DLMesh
from nvdiffrecmc_tpu.ops import envshade, hashgrid, loss as loss_ops, vecmath
from nvdiffrecmc_tpu.ops import bvh as bvh_mod
from nvdiffrecmc_tpu.render import light as light_mod
from nvdiffrecmc_tpu.render import material as material_mod
from nvdiffrecmc_tpu.render import mesh as mesh_mod
from nvdiffrecmc_tpu.render import obj as obj_mod
from nvdiffrecmc_tpu.render import render as render_mod
from nvdiffrecmc_tpu.render import texture as texture_mod
from nvdiffrecmc_tpu.render.texture import save_image

RADIUS = 3.0


###############################################################################
# Stall watchdog (round-4 post-mortem, QUALITY.md: a dead tunnel blocked the
# per-iteration host sync forever and the run hung 25 minutes until killed
# by hand.  Every blocking device->host transfer in the train loop now runs
# under a timeout; on expiry the run exits nonzero so a supervisor loop can
# restart it — resume is default-on, so the rerun continues from the last
# checkpoint instead of hanging.)
###############################################################################

class StallError(RuntimeError):
    """A device->host sync exceeded its watchdog deadline."""


_SYNC_POOL = None


def sync_with_watchdog(fn, timeout):
    """Run fn() (a blocking host sync) in a worker thread; raise StallError
    if it does not complete within `timeout` seconds.  The abandoned thread
    keeps blocking on the dead transfer — the pool is replaced so later
    syncs are not queued behind it."""
    global _SYNC_POOL
    import concurrent.futures
    if _SYNC_POOL is None:
        _SYNC_POOL = concurrent.futures.ThreadPoolExecutor(max_workers=1)
    fut = _SYNC_POOL.submit(fn)
    try:
        return fut.result(timeout=timeout)
    except concurrent.futures.TimeoutError:
        _SYNC_POOL = None  # orphan the blocked worker; fresh pool next call
        raise StallError('host sync exceeded %.0f s watchdog' % timeout)


def _stall_timeout(iter_dur_vec, floor=120.0, factor=10.0):
    """Watchdog deadline: 10x the median recent iteration time, floored so
    cold compiles (20-40 s) and tunnel hiccups never trip it.
    NVDR_STALL_FLOOR overrides the floor (test hook)."""
    floor = float(os.environ.get('NVDR_STALL_FLOOR', floor))
    if iter_dur_vec:
        med = float(np.median(iter_dur_vec[-20:]))
        return max(floor, factor * med)
    # first iteration includes the full-step remote compile
    return max(floor, 1800.0 if 'NVDR_STALL_FLOOR' not in os.environ
               else floor)


def display_image(image, title=None, out_dir='.'):
    """Live display: GLFW/OpenGL window when available (reference
    util.py:316-353); headless fallback writes out_dir/display.png."""
    try:
        import glfw  # noqa: F401
        import OpenGL.GL  # noqa: F401
        from nvdiffrecmc_tpu.utils.gl_display import gl_display
        return gl_display(image, title)
    except Exception:
        save_image(os.path.join(out_dir, 'display.png'), image)
        return True


###############################################################################
# Loss setup (reference train.py:52-66)
###############################################################################

def createLoss(FLAGS):
    table = {
        'smape': ('smape', 'none'),
        'mse': ('mse', 'none'),
        'logl1': ('l1', 'log_srgb'),
        'logl2': ('mse', 'log_srgb'),
        'relativel2': ('relmse', 'none'),
        'n2n': ('n2n', 'none'),
    }
    lo, tm = table[FLAGS['loss']]
    return lambda img, ref: loss_ops.image_loss(img, ref, loss=lo, tonemapper=tm)


###############################################################################
# Background mixing (reference train.py:73-101)
###############################################################################

def prepare_batch(target, train_res, bg_type, key, FLAGS):
    img = jnp.asarray(target['img'])
    if (train_res[0] != img.shape[1]) or (train_res[1] != img.shape[2]):
        img = vecmath.scale_img_nhwc(img, train_res)
    B, H, W = img.shape[0:3]
    if bg_type == 'checker':
        background = jnp.asarray(
            vecmath.checkerboard((H, W), 8))[None].repeat(B, 0)
    elif bg_type == 'black':
        background = jnp.zeros((B, H, W, 3))
    elif bg_type == 'white':
        background = jnp.ones((B, H, W, 3))
    elif bg_type == 'reference':
        background = img[..., 0:3]
    elif bg_type == 'random':
        background = jax.random.uniform(key, (B, H, W, 3))
    else:
        raise AssertionError("Unknown background type %s" % bg_type)
    mixed = jnp.concatenate(
        (background * (1 - img[..., 3:4]) + img[..., 0:3] * img[..., 3:4],
         img[..., 3:4]), axis=-1)
    out = dict(target)
    out['img'] = mixed
    out['background'] = background
    out['resolution'] = tuple(train_res)
    out['mvp'] = jnp.asarray(target['mvp'])
    out['campos'] = jnp.asarray(target['campos'])
    return out


###############################################################################
# Materials
###############################################################################

def initial_guess_material(geometry, mlp, FLAGS, init_mat=None, seed=0):
    """Returns (mat_params pytree, mat_static dict) — reference
    train.py:158-199 split into trainable arrays + static config."""
    kd_min = jnp.asarray(FLAGS['kd_min'], jnp.float32)
    kd_max = jnp.asarray(FLAGS['kd_max'], jnp.float32)
    ks_min = jnp.asarray(FLAGS['ks_min'], jnp.float32)
    ks_max = jnp.asarray(FLAGS['ks_max'], jnp.float32)
    nrm_min = jnp.asarray(FLAGS['nrm_min'], jnp.float32)
    nrm_max = jnp.asarray(FLAGS['nrm_max'], jnp.float32)

    if mlp:
        mlp_min = jnp.concatenate((kd_min[0:3], ks_min), axis=0)
        mlp_max = jnp.concatenate((kd_max[0:3], ks_max), axis=0)
        cfg = hashgrid.HashEncodingConfig()
        params = hashgrid.init_mlp_texture(jax.random.PRNGKey(seed), cfg,
                                           channels=6)
        static = {
            'kind': 'mlp', 'cfg': cfg, 'aabb': geometry.getAABB(),
            'min_max': (mlp_min, mlp_max), 'bsdf': FLAGS['bsdf'],
            'no_perturbed_nrm': bool(FLAGS['no_perturbed_nrm']),
        }
        return {'kd_ks': params}, static

    rng = np.random.RandomState(seed)
    tex_res = FLAGS['texture_res']
    if init_mat is None:
        num_ch = 4 if FLAGS['layers'] > 1 else 3
        kd_init = (jnp.ones(tuple(tex_res) + (num_ch,))
                   * (kd_max - kd_min)[None, None, 0:num_ch]
                   + kd_min[None, None, 0:num_ch])
        ksR = rng.uniform(0.0, 0.01, size=tuple(tex_res) + (1,))
        ksG = rng.uniform(float(ks_min[1]), float(ks_max[1]),
                          size=tuple(tex_res) + (1,))
        ksB = rng.uniform(float(ks_min[2]), float(ks_max[2]),
                          size=tuple(tex_res) + (1,))
        ks_init = jnp.asarray(np.concatenate((ksR, ksG, ksB), axis=2),
                              jnp.float32)
        kd_data = kd_init[None]
        ks_data = ks_init[None]
    else:
        kd_data = texture_mod.create_trainable(
            init_mat['kd'], tex_res, not FLAGS['custom_mip']).data
        ks_data = texture_mod.create_trainable(
            init_mat['ks'], tex_res, not FLAGS['custom_mip']).data

    if init_mat is None or 'normal' not in init_mat:
        nrm_data = texture_mod.create_trainable(
            np.array([0, 0, 1], np.float32), tex_res,
            not FLAGS['custom_mip']).data
    else:
        nrm_data = texture_mod.create_trainable(
            init_mat['normal'], tex_res, not FLAGS['custom_mip']).data

    params = {'kd': kd_data, 'ks': ks_data, 'normal': nrm_data}
    static = {
        'kind': 'tex',
        'min_max': {'kd': (kd_min, kd_max), 'ks': (ks_min, ks_max),
                    'normal': (nrm_min, nrm_max)},
        'bsdf': FLAGS['bsdf'],
        'no_perturbed_nrm': bool(FLAGS['no_perturbed_nrm']),
    }
    return params, static


def make_material(mat_params, mat_static):
    """Build the material dict the shader consumes from trainable params +
    static config."""
    mat = {'bsdf': mat_static['bsdf'],
           'no_perturbed_nrm': mat_static['no_perturbed_nrm']}
    if mat_static['kind'] == 'mlp':
        cfg = mat_static['cfg']
        aabb = mat_static['aabb']
        mm = mat_static['min_max']

        def sample_fn(pos):
            return hashgrid.sample_mlp_texture(mat_params['kd_ks'], cfg, aabb,
                                               mm, pos)
        mat['kd_ks'] = sample_fn
    else:
        for k in ('kd', 'ks', 'normal'):
            if k in mat_params:
                mat[k] = texture_mod.Texture2D(
                    data=mat_params[k], min_max=mat_static['min_max'][k])
    return mat


def clamp_material(mat_params, mat_static):
    """Post-step projections (reference train.py:467-474)."""
    if mat_static['kind'] == 'mlp':
        return mat_params
    out = dict(mat_params)
    for k in ('kd', 'ks', 'normal'):
        if k in out:
            mn, mx = mat_static['min_max'][k]
            C = (out[k][0] if isinstance(out[k], list) else out[k]).shape[-1]
            mn, mx = mn[:C], mx[:C]
            if isinstance(out[k], list):
                out[k] = [jnp.clip(m, mn, mx) for m in out[k]]
            else:
                out[k] = jnp.clip(out[k], mn, mx)
    if 'normal' in out:
        if isinstance(out['normal'], list):
            out['normal'] = [vecmath.safe_normalize(m) for m in out['normal']]
        else:
            out['normal'] = vecmath.safe_normalize(out['normal'])
    return out


###############################################################################
# UV bake at the pass-1 -> pass-2 boundary (reference train.py:108-152)
###############################################################################

def _component_labels(faces, n_verts):
    """Connected components over faces sharing vertices (union-find with
    path halving; host-side, ~60k faces in well under a second)."""
    parent = np.arange(n_verts, dtype=np.int64)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for tri in faces:
        r0 = find(tri[0])
        for b in (tri[1], tri[2]):
            rb = find(b)
            if rb != r0:
                parent[rb] = r0
    return np.fromiter((find(tri[0]) for tri in faces),
                       np.int64, len(faces))


def prune_small_components(f, ft, min_frac):
    """Drop connected components with fewer than min_frac * total faces.

    DMTet extraction under a reduced iteration budget leaves small floater
    components around the subject (isolated sign islands the optimizer has
    not yet carved; see QUALITY.md round-5).  They are frozen into the
    fixed-topology pass at the bake boundary, where pass 2 can only
    camouflage them.  The reference has no equivalent (its 5000-iter budget
    carves floaters away in pass 1); this is a deliberate TPU-framework
    extension, flag-gated (--prune-components 0 disables)."""
    if min_frac <= 0 or len(f) == 0:
        return f, ft, 0
    labels = _component_labels(f, int(f.max()) + 1)
    uniq, counts = np.unique(labels, return_counts=True)
    small = set(uniq[counts < min_frac * len(f)].tolist())
    if not small:
        return f, ft, 0
    keep = ~np.isin(labels, list(small))
    return f[keep], ft[keep], int((~keep).sum())


def extract_static_mesh(geometry, params, FLAGS):
    """Pull the DMTet mesh to host, drop padded triangles, compact vertices."""
    m, _ = geometry.getMesh(params, material=None, build_bvh=False)
    v = np.asarray(m.v_pos)
    f = np.asarray(m.t_pos_idx)
    vt = np.asarray(m.v_tex)
    ft = np.asarray(m.t_tex_idx)
    keep = np.asarray(m.tri_mask) > 0
    f, ft = f[keep], ft[keep]
    f, ft, n_pruned = prune_small_components(
        f, ft, float(FLAGS.get('prune_components', 0.0)))
    if n_pruned:
        print('prune_small_components: dropped %d floater triangles '
              '(< %.2f%% of %d faces per component)'
              % (n_pruned, 100 * float(FLAGS.get('prune_components', 0.0)),
                 len(f) + n_pruned))
    used = np.unique(f)
    remap = np.full(v.shape[0], -1, np.int64)
    remap[used] = np.arange(used.shape[0])
    v = v[used]
    f = remap[f]
    used_t = np.unique(ft)
    remap_t = np.full(vt.shape[0], -1, np.int64)
    remap_t[used_t] = np.arange(used_t.shape[0])
    vt = vt[used_t]
    ft = remap_t[ft]
    return mesh_mod.Mesh(
        v_pos=jnp.asarray(v.astype(np.float32)),
        t_pos_idx=jnp.asarray(f.astype(np.int32)),
        v_tex=jnp.asarray(vt.astype(np.float32)),
        t_tex_idx=jnp.asarray(ft.astype(np.int32)))


def uv_unwrap(v_pos, t_pos_idx, v_tex, t_tex_idx):
    """UV atlas for the pass-1 -> pass-2 bake (reference train.py:108-152):
    xatlas when importable, else the native chart-grown unwrapper
    (nvdiffrecmc_tpu/native/uv_unwrap.cpp), else the per-tet atlas."""
    try:
        import xatlas
        vmapping, indices, uvs = xatlas.parametrize(
            np.asarray(v_pos), np.asarray(t_pos_idx))
        return (jnp.asarray(uvs.astype(np.float32)),
                jnp.asarray(indices.astype(np.int64).astype(np.int32)))
    except ImportError:
        pass
    from nvdiffrecmc_tpu import native
    out = native.uv_unwrap(np.asarray(v_pos), np.asarray(t_pos_idx))
    if out is not None:
        uvs, tidx = out
        return jnp.asarray(uvs), jnp.asarray(tidx)
    return v_tex, t_tex_idx


def bake_textures(geometry, params, mat_params, mat_static, FLAGS):
    """DMTet MLP material -> 2D textures on a UV atlas with seam dilation."""
    base = extract_static_mesh(geometry, params, FLAGS)
    v_tex, t_tex_idx = uv_unwrap(base.v_pos, base.t_pos_idx, base.v_tex,
                                 base.t_tex_idx)
    import dataclasses
    base = dataclasses.replace(base, v_tex=v_tex, t_tex_idx=t_tex_idx)

    mat = make_material(mat_params, mat_static)
    mask, kd, ks = render_mod.render_uv(base, FLAGS['texture_res'],
                                        mat['kd_ks'])

    def dilate_tex(x):
        avg = (jnp.sum(x * mask, axis=(0, 1, 2))
               / jnp.clip(jnp.sum(mask, axis=(0, 1, 2)), min=1e-6))
        return vecmath.dilate(x, avg[None, None, None, :], mask, 7)

    kd = dilate_tex(kd)
    ks = dilate_tex(ks)
    if FLAGS['transparency']:
        kd = jnp.concatenate(
            (kd, jax.random.uniform(jax.random.PRNGKey(0), kd[..., 0:1].shape)),
            axis=-1)
    normal = jnp.tile(jnp.asarray([0.0, 0.0, 1.0])[None, None, None, :],
                      (kd.shape[0], kd.shape[1], kd.shape[2], 1))
    return base, {'kd': kd, 'ks': ks, 'normal': normal}


###############################################################################
# Optimization loop (reference train.py:313-494)
###############################################################################

def optimize_mesh(geometry, mat_params, mat_static, light_base, dataset_train,
                  dataset_validate, FLAGS, warmup_iter=0, log_interval=10,
                  pass_idx=0, pass_name="", optimize_light=True,
                  optimize_geometry=True):
    lr = FLAGS['learning_rate']
    lr = lr[pass_idx] if isinstance(lr, (list, tuple)) else lr
    if isinstance(lr, (list, tuple)):
        lr_pos, lr_mat = lr[0], lr[1]
        lr_lgt = lr[2] if len(lr) > 2 else lr[1] * 3.0
    else:
        lr_pos = lr_mat = lr
        lr_lgt = lr * 3.0

    # budget-scaled schedule constants (config.apply_schedule_scaling):
    # reference values at iter==5000, proportional otherwise
    lr_decay_rate = FLAGS.get('lr_decay_rate', 0.0002)
    shadow_ramp_iters = FLAGS.get('shadow_ramp_iters', 1750.0)

    def lr_schedule(count):
        warm = jnp.where(warmup_iter > 0,
                         jnp.clip(count / max(warmup_iter, 1), 0.0, 1.0), 1.0)
        decay = jnp.power(10.0, -(jnp.maximum(count - warmup_iter, 0))
                          * lr_decay_rate)
        return jnp.where(count < warmup_iter, warm, decay)

    def adam(base_lr):
        return optax.adam(lambda c: base_lr * lr_schedule(c),
                          b1=0.9, b2=0.999, eps=1e-8)

    opt_geo = adam(lr_pos)
    opt_mat = adam(lr_mat)
    opt_lgt = adam(lr_lgt)

    params = {'geo': geometry.parameters(), 'mat': mat_params,
              'light': light_base}
    opt_state = {
        'geo': opt_geo.init(params['geo']),
        'mat': opt_mat.init(params['mat']),
        'light': opt_lgt.init(params['light']),
    }

    image_loss_fn = createLoss(FLAGS)
    perms = envshade.make_perms(FLAGS['n_samples'])
    denoiser_on = FLAGS['denoiser'] == 'bilateral'

    # Big geometry tables (DMTet grid/edge/uv arrays, ~1 GB at grid 128) must
    # be jit *arguments*, not closure constants: embedded constants blow the
    # remote-compile body limit (HTTP 413) and would be replicated per-program
    # under multi-chip (PERF_NOTES.md session 5).
    geo_consts = geometry.consts() if hasattr(geometry, 'consts') else None

    def compute_grads(params, target, it, key, gconsts):
        ctx = (geometry.bind_consts(gconsts) if gconsts is not None
               else contextlib.nullcontext())
        with ctx:
            return _compute_grads_body(params, target, it, key)

    def _compute_grads_body(params, target, it, key):
        tables = light_mod.update_pdf(params['light'])
        lgt = {'base': params['light'], 'pdf': tables.pdf,
               'rows': tables.rows, 'cols': tables.cols}
        shadow_ramp = jnp.minimum(it / shadow_ramp_iters, 1.0)
        # denoiser influence ramps with the shadow ramp in pass 1
        # (dmtet.py:220-221); pass 2 inherits full influence.
        if denoiser_on:
            sigma = (jnp.maximum(2.0 * shadow_ramp, 1e-4)
                     if isinstance(geometry, DMTetGeometry) else
                     jnp.float32(2.0))
        else:
            sigma = None

        target_full = dict(target, resolution=tuple(FLAGS['train_res']),
                           spp=FLAGS['spp'])

        def loss_fn(p):
            lgt_p = dict(lgt, base=p['light'])
            material = make_material(p['mat'], mat_static)
            img_loss, reg_loss = geometry.tick(
                p['geo'], material, lgt_p, target_full, image_loss_fn, it,
                FLAGS, sigma, perms, key, rnd_seed=it.astype(jnp.int32))
            return img_loss + reg_loss, (img_loss, reg_loss)

        grads, (img_loss, reg_loss) = jax.grad(loss_fn, has_aux=True)(params)
        return grads, img_loss, reg_loss

    def apply_grads(params, opt_state, grads):
        # gradient-scale conventions (reference train.py:439-443 + the tcnn
        # backward hooks, see hashgrid.py docstring)
        if FLAGS['learn_lighting'] and optimize_light:
            grads['light'] = grads['light'] * 64.0
        if mat_static['kind'] == 'mlp':
            g = grads['mat']['kd_ks']
            grads['mat']['kd_ks'] = g._replace(
                table=g.table * (128.0 / 8.0),
                weights=tuple(w * 1.0 for w in g.weights))

        if FLAGS['clip_max_norm'] > 0.0:
            clip_tree = {'geo': grads['geo'], 'mat': grads['mat']}
            norm = optax.global_norm(clip_tree)
            scale = jnp.minimum(1.0, FLAGS['clip_max_norm']
                                / jnp.maximum(norm, 1e-12))
            grads['geo'] = jax.tree.map(lambda x: x * scale, grads['geo'])
            grads['mat'] = jax.tree.map(lambda x: x * scale, grads['mat'])

        new_params = dict(params)
        new_opt = dict(opt_state)

        upd, new_opt['mat'] = opt_mat.update(grads['mat'], opt_state['mat'])
        new_params['mat'] = optax.apply_updates(params['mat'], upd)
        if optimize_geometry:
            upd, new_opt['geo'] = opt_geo.update(grads['geo'],
                                                 opt_state['geo'])
            new_params['geo'] = optax.apply_updates(params['geo'], upd)
        if optimize_light:
            upd, new_opt['light'] = opt_lgt.update(grads['light'],
                                                   opt_state['light'])
            new_params['light'] = optax.apply_updates(params['light'], upd)

        # projections (reference train.py:467-476)
        new_params['mat'] = clamp_material(new_params['mat'], mat_static)
        new_params['light'] = jnp.clip(new_params['light'], min=0.01)
        return new_params, new_opt

    compute_grads = jax.jit(compute_grads)
    apply_grads = jax.jit(apply_grads, donate_argnums=(0, 1, 2))
    _acc = jax.jit(lambda a, g: jax.tree.map(jnp.add, a, g),
                   donate_argnums=(0,))
    _avg = jax.jit(lambda g, n: jax.tree.map(lambda x: x / n, g),
                   donate_argnums=(0,))

    micro = int(FLAGS.get('micro_batch') or 0)
    use_micro = micro > 0 and FLAGS['batch'] > micro
    if use_micro:
        assert FLAGS['batch'] % micro == 0, (FLAGS['batch'], micro)

    def train_step(params, opt_state, target, it, key):
        """One optimizer step.  With micro_batch set, gradients are
        accumulated over batch/micro_batch small XLA programs (each under
        the TPU worker watchdog, PERF_NOTES.md) — the mean gradient is
        identical to the single-program batch gradient."""
        if use_micro:
            B = FLAGS['batch']
            n = B // micro
            acc, il, rl = None, 0.0, 0.0
            for i in range(n):
                sl = {k: (v[i * micro:(i + 1) * micro]
                          if hasattr(v, 'ndim') and v.ndim > 0
                          and v.shape[0] == B else v)
                      for k, v in target.items()}
                g, a, b = compute_grads(params, sl, it,
                                        jax.random.fold_in(key, i),
                                        geo_consts)
                acc = g if acc is None else _acc(acc, g)
                il = il + a
                rl = rl + b
            grads = _avg(acc, jnp.float32(n))
            img_loss, reg_loss = il / n, rl / n
        else:
            grads, img_loss, reg_loss = compute_grads(params, target, it,
                                                      key, geo_consts)
        params, opt_state = apply_grads(params, opt_state, grads)
        return params, opt_state, img_loss, reg_loss

    it_batches = batch_iterator(dataset_train, FLAGS['batch'], shuffle=True)
    key = jax.random.PRNGKey(42 + pass_idx)

    ckpt_path = os.path.join(FLAGS['out_dir'],
                             'checkpoint_%s.pkl' % pass_name)
    start_it = 0
    if FLAGS.get('resume') and os.path.exists(ckpt_path):
        loaded = load_checkpoint(ckpt_path)
        if loaded is not None:
            params, opt_state, start_it = loaded
            start_it = int(start_it) + 1
            print('Resumed %s from iteration %d' % (ckpt_path, start_it))

    img_loss_vec, reg_loss_vec, iter_dur_vec = [], [], []
    img_cnt = 0
    v_it = batch_iterator(dataset_validate, 1, shuffle=False)

    ckpt_interval = FLAGS.get('checkpoint_interval', 0)
    for it in range(start_it, FLAGS['iter']):
        target_np = next(it_batches)
        key, kb, ks_ = jax.random.split(key, 3)
        prepared = prepare_batch(target_np, FLAGS['train_res'], 'random', kb,
                                 FLAGS)
        target = {k: prepared[k]
                  for k in ('img', 'mvp', 'campos', 'background')}

        display_now = FLAGS['display_interval'] and \
            (it % FLAGS['display_interval'] == 0)
        save_image_now = FLAGS['save_interval'] and \
            (it % FLAGS['save_interval'] == 0)
        if save_image_now or display_now:
            vt = prepare_batch(next(v_it), FLAGS['train_res'],
                               FLAGS['background'], kb, FLAGS)

            def probe():
                result_image, rd_probe = validate_itr(
                    vt, dataset_validate.getMesh(), geometry, params['geo'],
                    params['mat'], mat_static, params['light'], FLAGS)
                p_mse = float(np.mean(
                    (np.clip(np.asarray(rd_probe['opt']), 0, 1)
                     - np.clip(np.asarray(rd_probe['ref']), 0, 1)) ** 2))
                return np.asarray(result_image), p_mse

            # convergence probe: PSNR of this one validation view, logged
            # so a diverging run is visible at the first snapshot instead
            # of after the full budget (QUALITY.md round-4 post-mortem).
            # Watchdogged: the K-stage eval render is also a host-sync
            # chain that hangs forever on a dead tunnel (first probe pays
            # the eval-program compile, so the deadline is generous).
            try:
                result_image, p_mse = sync_with_watchdog(probe, 1800.0)
            except StallError as e:
                print('STALL in validation probe at iter %d (%s); exiting '
                      'for supervised restart' % (it, e), flush=True)
                os._exit(3)
            print('[probe] iter=%d val-view PSNR %.2f dB'
                  % (it, float(vecmath.mse_to_psnr(p_mse))), flush=True)
            if display_now:
                display_image(np.asarray(result_image),
                              title='%d / %d' % (it, FLAGS['iter']),
                              out_dir=FLAGS['out_dir'])
            if save_image_now:
                save_image(os.path.join(
                    FLAGS['out_dir'],
                    'img_%s_%06d.png' % (pass_name, img_cnt)),
                    np.asarray(result_image))
                img_cnt += 1

        t0 = time.time()
        params, opt_state, img_loss, reg_loss = train_step(
            params, opt_state, target, jnp.float32(it), ks_)
        # host sync (forces completion) under the stall watchdog: a dead
        # tunnel raises StallError instead of blocking forever.
        # NVDR_TEST_STALL_AT=<iter> simulates the dead tunnel (the sync
        # blocks indefinitely at that iteration) for the recovery test.
        def _sync():
            if it == int(os.environ.get('NVDR_TEST_STALL_AT', -1)):
                time.sleep(3600)  # simulated dead tunnel
            return float(img_loss), float(reg_loss)
        try:
            img_loss_f, reg_loss_f = sync_with_watchdog(
                _sync, _stall_timeout(iter_dur_vec))
        except StallError as e:
            print('STALL at iter %d (%s): attempting checkpoint, then '
                  'exiting for supervised restart' % (it, e), flush=True)
            # best effort: the previous iteration's params may still be
            # fetchable if only this step's program wedged; bound the
            # attempt so a fully dead tunnel cannot re-hang the exit.
            try:
                # if the params materialize, the step finished (only the
                # sync path wedged) — label the checkpoint with this iter
                sync_with_watchdog(
                    lambda: save_checkpoint(ckpt_path, params, opt_state,
                                            it),
                    timeout=60.0)
                print('checkpoint saved to %s' % ckpt_path, flush=True)
            except Exception as ce:
                print('checkpoint attempt failed (%s); resume will use the '
                      'last periodic checkpoint' % ce, flush=True)
            os._exit(3)

        if os.environ.get('NVDR_DEBUG_NAN'):
            flat = jax.tree_util.tree_flatten_with_path(params)[0]
            bad = [jax.tree_util.keystr(k) for k, v in flat
                   if bool(jnp.isnan(v).any())]
            tgt_bad = [k for k, v in target.items()
                       if bool(jnp.isnan(jnp.asarray(v)).any())]
            if bad or tgt_bad or np.isnan(img_loss_f):
                print('NAN at iter %d: params=%s target=%s img_loss=%s'
                      % (it, bad, tgt_bad, img_loss_f), flush=True)
                if it > 3:
                    raise SystemExit(1)
        iter_dur_vec.append(time.time() - t0)
        img_loss_vec.append(img_loss_f)
        reg_loss_vec.append(reg_loss_f)

        if ckpt_interval and it > 0 and it % ckpt_interval == 0:
            save_checkpoint(ckpt_path, params, opt_state, it)

        if log_interval and (it % log_interval == 0):
            rem = (FLAGS['iter'] - it) * np.mean(iter_dur_vec[-log_interval:])
            print("iter=%5d, img_loss=%.6f, reg_loss=%.6f, time=%.1f ms, rem=%s"
                  % (it, np.mean(img_loss_vec[-log_interval:]),
                     np.mean(reg_loss_vec[-log_interval:]),
                     np.mean(iter_dur_vec[-log_interval:]) * 1000,
                     vecmath.time_to_text(rem)), flush=True)
            # marching-tets truncation is a silent wrong-gradient failure
            # (dropped triangles simply vanish) — poll the count at this
            # host-sync point and shout (reference dmtet.py:126-137 never
            # truncates; our static shapes can)
            if hasattr(geometry, 'tri_count'):
                n_tris, cap = geometry.tri_count(params['geo'])
                if n_tris > cap:
                    print('WARNING: marching tets OVERFLOW: %d surface '
                          'triangles > %d slots — geometry is being '
                          'truncated; raise dmtet max_tris' % (n_tris, cap),
                          flush=True)

    return params


###############################################################################
# Checkpointing (new capability vs the reference, which persists nothing
# mid-pass — SURVEY.md section 5)
###############################################################################

def save_checkpoint(path, params, opt_state, it):
    """Atomic checkpoint write: dump to a tmp file and rename over the old
    checkpoint only once the dump completed.  The round-5 spot run lost 650
    iterations to the non-atomic version: the stall handler's last-gasp
    checkpoint attempt pulled params through a WEDGED device sync, died
    mid-write, and left a 0-byte file over the good iteration-650
    checkpoint."""
    import pickle
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # device->host pulls happen BEFORE the old checkpoint is touched; if the
    # device is wedged this hangs/dies with the old file intact.
    flat, treedef = jax.tree_util.tree_flatten((params, opt_state, it))
    leaves = [np.asarray(x) for x in flat]
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        pickle.dump({'treedef': treedef, 'leaves': leaves}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def load_checkpoint(path):
    """Returns (params, opt_state, it), or None when the checkpoint is
    corrupt/unreadable (resume falls back to a fresh start instead of
    crash-looping the supervisor)."""
    import pickle
    try:
        with open(path, 'rb') as f:
            d = pickle.load(f)
        return jax.tree_util.tree_unflatten(
            d['treedef'], [jnp.asarray(x) for x in d['leaves']])
    except Exception as e:  # EOFError, UnpicklingError, KeyError, OSError
        print('WARNING: checkpoint %s unreadable (%s: %s) — ignoring it'
              % (path, type(e).__name__, e))
        return None


###############################################################################
# Validation (reference train.py:205-307)
###############################################################################

STAGES_PER_PROG = 8   # eval MC seed stages summed per device program

_EVAL_JIT_CACHE = {}


def render_eval(geometry, geo_params, mat_params, mat_static, light_base,
                target, FLAGS, n_samples=32, bsdf=None):
    """Jitted eval render (reference validate protocol: n_samples=32, no
    denoiser, train.py:260-264).  One compiled program per (geometry
    instance, material kind, n_samples, bsdf-override).

    The 32x32-stratified estimator is evaluated as the average of K
    independent 4x4-stratified renders with distinct seeds (same total MC
    sample count, unbiased).  One n2=1024 device program both exceeds the
    fused pipeline's memory envelope (envshade._FUSED_MAX_N2) and runs long
    enough to trip the TPU worker's execution watchdog (measured on the
    axon v5e tunnel: a 21 s device program survives, a ~74 s one kills the
    worker; an incoherent-ray n2=64 shade alone is 18.5 s); K bounded
    programs do neither.  All composition downstream of the MC estimate
    (alpha blend, antialias) is linear in the shade values, so averaging K
    full renders equals rendering with the averaged estimate."""
    # id() can be recycled after GC — use a per-instance uid (geometry
    # classes assign one at construction) so a new geometry never hits a
    # stale compiled closure over a dead instance.
    res = tuple(target.get('resolution', FLAGS['train_res']))
    chunk = min(n_samples, 4)
    K = max(1, (n_samples * n_samples) // (chunk * chunk))
    bsdf_r = bsdf if bsdf is not None else mat_static['bsdf']
    if bsdf in ('kd', 'ks', 'normal', 'tangent'):
        K = 1  # deterministic G-buffer displays: no MC averaging needed
    ck = (geometry.uid, mat_static['kind'], chunk, bsdf, res)
    geo_consts = geometry.consts() if hasattr(geometry, 'consts') else None
    if ck not in _EVAL_JIT_CACHE:
        F = dict(FLAGS)
        F['n_samples'] = chunk
        perms = envshade.make_perms(chunk)
        spp = FLAGS['spp']

        # Staged protocol: geometry extraction + rasterization + G-buffer
        # run ONCE per frame; only the MC shade re-runs per seed (the
        # reference renders n_samples=32 in one launch, train.py:260-264;
        # the K seed-split that the TPU worker watchdog forces used to
        # repeat the full render K times — raster/G-buffer/AA are
        # seed-independent, so stage them out).  Composition downstream of
        # the MC estimate is linear with denoising off, so averaging the
        # accumulators equals averaging K full renders.
        def fn_g(gconsts, geo_params, mat_params, mvp, campos, key):
            ctx = (geometry.bind_consts(gconsts) if gconsts is not None
                   else contextlib.nullcontext())
            with ctx:
                material = make_material(mat_params, mat_static)
                opt_mesh, bvh = geometry.getMesh(geo_params, material)
                v_pos_clip, layers = render_mod.render_gbuffer(
                    F, opt_mesh, mvp, campos, res, spp, FLAGS['layers'],
                    False, bsdf_r, key)
                # material holds static strings/callables (not JAX types);
                # render_finish only reads t_pos_idx from the mesh
                out_mesh = dataclasses.replace(opt_mesh, material=None)
                return out_mesh, bvh, v_pos_clip, layers

        def fn_mc(layers, light_base, bvh, rnd_seed):
            tables = light_mod.update_pdf(light_base)
            lgt = {'base': light_base, 'pdf': tables.pdf,
                   'rows': tables.rows, 'cols': tables.cols}
            return render_mod.render_mc(F, layers, lgt, bvh, bsdf_r, 1.0,
                                        rnd_seed, perms)

        # STAGES_PER_PROG seed stages summed on device in one program:
        # each fn_mc dispatch costs a ~72 ms tunnel round trip, so K=64
        # separate dispatches were mostly latency.  Groups stay small so
        # one program never approaches the TPU worker's ~20 s kill
        # (PERF_NOTES.md): 8 stages x ~0.1-0.5 s/stage.
        def fn_mc_group(layers, light_base, bvh, seed0):
            tables = light_mod.update_pdf(light_base)
            lgt = {'base': light_base, 'pdf': tables.pdf,
                   'rows': tables.rows, 'cols': tables.cols}

            def one(seed):
                return render_mod.render_mc(F, layers, lgt, bvh, bsdf_r,
                                            1.0, seed, perms)

            def body(acc, k):
                return jax.tree.map(jnp.add, acc, one(seed0 + k)), None

            acc, _ = jax.lax.scan(
                body, one(seed0),
                jnp.arange(1, STAGES_PER_PROG, dtype=jnp.int32))
            return acc

        def fn_fin(opt_mesh, v_pos_clip, layers, mc, background):
            return render_mod.render_finish(
                F, opt_mesh, v_pos_clip, layers, mc, res, spp, False,
                background, bsdf_r, None)

        _EVAL_JIT_CACHE[ck] = (jax.jit(fn_g), jax.jit(fn_mc),
                               jax.jit(fn_mc_group), jax.jit(fn_fin),
                               jax.jit(lambda a, b: jax.tree.map(
                                   jnp.add, a, b)))
    fn_g, fn_mc, fn_mc_group, fn_fin, fn_acc = _EVAL_JIT_CACHE[ck]
    opt_mesh, bvh, v_pos_clip, layers = fn_g(
        geo_consts, geo_params, mat_params, target['mvp'], target['campos'],
        jax.random.PRNGKey(0))
    mc = fn_mc(layers, light_base, bvh, jnp.int32(1000))
    has_mc = any(x is not None for pair in mc for x in pair)
    if K > 1 and has_mc:
        k_i = 1
        while k_i < K:
            if K - k_i >= STAGES_PER_PROG:
                # STAGES_PER_PROG seeds summed in one device program
                mc = fn_acc(mc, fn_mc_group(layers, light_base, bvh,
                                            jnp.int32(1000 + k_i)))
                k_i += STAGES_PER_PROG
            else:
                mc = fn_acc(mc, fn_mc(layers, light_base, bvh,
                                      jnp.int32(1000 + k_i)))
                k_i += 1
        mc = jax.tree.map(lambda x: x / K, mc)
    return fn_fin(opt_mesh, v_pos_clip, layers, mc, target['background'])


def validate_itr(target, ref_mesh, geometry, geo_params, mat_params,
                 mat_static, light_base, FLAGS, n_samples=32):
    buffers = render_eval(geometry, geo_params, mat_params, mat_static,
                          light_base, target, FLAGS, n_samples)
    result_dict = {
        'ref': vecmath.rgb_to_srgb(target['img'][0, ..., 0:3]),
        'opt': vecmath.rgb_to_srgb(buffers['shaded'][0, ..., 0:3]),
    }
    result_image = jnp.concatenate([result_dict['opt'], result_dict['ref']],
                                   axis=1)
    if FLAGS.get('display') is not None:
        for layer in FLAGS['display']:
            if 'latlong' in layer and layer['latlong']:
                img = light_mod.generate_image(light_base,
                                               FLAGS['display_res'])
                img = vecmath.rgb_to_srgb(img / (1 + img))
                result_dict['light_image'] = img
                result_image = jnp.concatenate([result_image, img], axis=1)
            elif 'bsdf' in layer:
                img = render_eval(geometry, geo_params, mat_params,
                                  mat_static, light_base, target, FLAGS,
                                  n_samples, bsdf=layer['bsdf'])['shaded']
                img = img[0, ..., 0:3]
                if layer['bsdf'] == 'kd':
                    img = vecmath.rgb_to_srgb(img)
                result_dict[layer['bsdf']] = img
                result_image = jnp.concatenate([result_image, img], axis=1)
            elif 'normals' in layer and not FLAGS['no_perturbed_nrm'] \
                    and 'perturbed_nrm' in buffers:
                img = (buffers['perturbed_nrm'][0, ..., 0:3] + 1.0) * 0.5
                result_image = jnp.concatenate([result_image, img], axis=1)
            elif 'diffuse_light' in layer and 'diffuse_light' in buffers:
                img = vecmath.rgb_to_srgb(buffers['diffuse_light'][..., 0:3])[0]
                result_image = jnp.concatenate([result_image, img], axis=1)
            elif 'specular_light' in layer and 'specular_light' in buffers:
                img = vecmath.rgb_to_srgb(buffers['specular_light'][..., 0:3])[0]
                result_image = jnp.concatenate([result_image, img], axis=1)
    return result_image, result_dict


def validate(geometry, geo_params, mat_params, mat_static, light_base,
             dataset_validate, out_dir, FLAGS, max_frames=None):
    os.makedirs(out_dir, exist_ok=True)
    mse_values, psnr_values = [], []
    n = len(dataset_validate) if max_frames is None \
        else min(max_frames, len(dataset_validate))
    key = jax.random.PRNGKey(7)
    with open(os.path.join(out_dir, 'metrics.txt'), 'w') as fout:
        fout.write('ID, MSE, PSNR\n')
        print("Running validation")
        for it in range(n):
            batch = dataset_validate.collate([dataset_validate[it]])
            # Validate at dataset-native resolution (the reference's
            # prepare_batch never rescales, train.py:260-307) so PSNR is
            # comparable when dataset res != train_res.
            native_res = tuple(np.asarray(batch['img']).shape[1:3])
            target = prepare_batch(batch, native_res,
                                   FLAGS['background'], key, FLAGS)
            result_image, rd = validate_itr(
                target, dataset_validate.getMesh(), geometry, geo_params,
                mat_params, mat_static, light_base, FLAGS)
            opt = np.clip(np.asarray(rd['opt']), 0, 1)
            ref = np.clip(np.asarray(rd['ref']), 0, 1)
            mse = float(np.mean((opt - ref) ** 2))
            psnr = float(vecmath.mse_to_psnr(mse))
            mse_values.append(mse)
            psnr_values.append(psnr)
            fout.write("%d, %1.8f, %1.8f \n" % (it, mse, psnr))
            for k in rd:
                save_image(os.path.join(out_dir, 'val_%06d_%s.png' % (it, k)),
                           np.asarray(rd[k]))
        avg_mse = float(np.mean(mse_values))
        avg_psnr = float(np.mean(psnr_values))
        fout.write("AVERAGES: %1.4f, %2.3f\n" % (avg_mse, avg_psnr))
        print("MSE,      PSNR")
        print("%1.8f, %2.3f" % (avg_mse, avg_psnr))
    return avg_psnr


###############################################################################
# Main
###############################################################################

def main(argv=None):
    FLAGS = parse_flags(argv)
    # fail fast if the device tunnel is wedged at startup: a dead axon
    # worker blocks the first device op in tcp recv forever (observed
    # pre-main, before the in-loop watchdog can help) — probe it under a
    # bounded sync so the supervisor can restart instead of hanging.
    try:
        sync_with_watchdog(lambda: float(jnp.ones(()).sum()), 300.0)
    except StallError as e:
        print('STALL during device startup probe (%s); exiting for '
              'supervised restart' % e, flush=True)
        os._exit(3)
    print("Config / Flags:")
    print("---------")
    for key in sorted(FLAGS):
        print(key, FLAGS[key])
    print("---------")
    os.makedirs(FLAGS['out_dir'], exist_ok=True)

    # -- data pipeline (reference train.py:590-605)
    ref_mesh_path = resolve_path(FLAGS, FLAGS['ref_mesh'])
    if os.path.splitext(ref_mesh_path)[1] == '.obj':
        ref_mesh = mesh_mod.load_mesh(
            ref_mesh_path, resolve_path(FLAGS, FLAGS['mtl_override']))
        dataset_train = DatasetMesh(ref_mesh, RADIUS, FLAGS, validate=False)
        dataset_validate = DatasetMesh(ref_mesh, RADIUS, FLAGS, validate=True,
                                       seed=1)
    elif os.path.isdir(ref_mesh_path):
        if os.path.isfile(os.path.join(ref_mesh_path, 'poses_bounds.npy')):
            dataset_train = DatasetLLFF(ref_mesh_path, FLAGS,
                                        examples=(FLAGS['iter'] + 1) * FLAGS['batch'])
            dataset_validate = DatasetLLFF(ref_mesh_path, FLAGS)
        elif os.path.isfile(os.path.join(ref_mesh_path, 'transforms_train.json')):
            dataset_train = DatasetNERF(
                os.path.join(ref_mesh_path, 'transforms_train.json'), FLAGS,
                examples=(FLAGS['iter'] + 1) * FLAGS['batch'])
            dataset_validate = DatasetNERF(
                os.path.join(ref_mesh_path, 'transforms_test.json'), FLAGS)
        else:
            raise AssertionError("Invalid dataset format")
    else:
        raise AssertionError("Invalid dataset format %s" % ref_mesh_path)

    # -- trainable light (reference train.py:610-614)
    if FLAGS['learn_lighting']:
        light_base = light_mod.create_trainable_env_rnd(
            FLAGS['probe_res'], scale=0.0, bias=0.5)
    else:
        light_base = load_env_or_procedural(
            resolve_path(FLAGS, FLAGS['envlight']), FLAGS['env_scale'])

    denoiser_on = FLAGS['denoiser'] == 'bilateral'

    if FLAGS['base_mesh'] is None:
        # ---- pass 1: DMTet
        geometry = DMTetGeometry(FLAGS['dmtet_grid'], FLAGS['mesh_scale'],
                                 FLAGS, max_tris=FLAGS['max_tris'])
        mat_params, mat_static = initial_guess_material(geometry, True, FLAGS)
        mat_static['no_perturbed_nrm'] = True

        params = optimize_mesh(geometry, mat_params, mat_static, light_base,
                               dataset_train, dataset_validate, FLAGS,
                               pass_idx=0, pass_name="dmtet_pass1",
                               optimize_light=FLAGS['learn_lighting'])
        pass_idx = 1

        if FLAGS['validate']:
            validate(geometry, params['geo'], params['mat'], mat_static,
                     params['light'], dataset_validate,
                     os.path.join(FLAGS['out_dir'], "dmtet_validate"), FLAGS,
                     max_frames=8)

        # ---- pass boundary: extract mesh + bake textures
        base_mesh, baked = bake_textures(geometry, params['geo'],
                                         params['mat'], mat_static, FLAGS)
        light_base = params['light']

        mat_params, mat_static = initial_guess_material(
            None, False, FLAGS,
            init_mat={k: texture_mod.Texture2D(data=v)
                      for k, v in baked.items()})
        mat_static['no_perturbed_nrm'] = False
        base_mesh.material = make_material(mat_params, mat_static)

        os.makedirs(os.path.join(FLAGS['out_dir'], "dmtet_mesh"),
                    exist_ok=True)
        obj_mod.write_obj(os.path.join(FLAGS['out_dir'], "dmtet_mesh/"),
                          base_mesh)
        if FLAGS['learn_lighting']:
            light_mod.save_env_map(
                os.path.join(FLAGS['out_dir'], "dmtet_mesh/probe.hdr"),
                light_base)

        # ---- pass 2: fixed topology
        if FLAGS['transparency']:
            FLAGS['layers'] = 8
        geometry = DLMesh(base_mesh, FLAGS)
        params = optimize_mesh(geometry, mat_params, mat_static, light_base,
                               dataset_train, dataset_validate, FLAGS,
                               pass_idx=pass_idx, pass_name="mesh_pass",
                               warmup_iter=100,
                               optimize_light=not FLAGS['lock_light'],
                               optimize_geometry=not FLAGS['lock_pos'])
    else:
        base_mesh = mesh_mod.load_mesh(resolve_path(FLAGS, FLAGS['base_mesh']))
        geometry = DLMesh(base_mesh, FLAGS)
        mat_params, mat_static = initial_guess_material(
            geometry, False, FLAGS, init_mat=base_mesh.material)
        params = optimize_mesh(geometry, mat_params, mat_static, light_base,
                               dataset_train, dataset_validate, FLAGS,
                               pass_idx=0, pass_name="mesh_pass",
                               warmup_iter=0,
                               optimize_light=not FLAGS['lock_light'],
                               optimize_geometry=not FLAGS['lock_pos'])

    if FLAGS['validate']:
        validate(geometry, params['geo'], params['mat'], mat_static,
                 params['light'], dataset_validate,
                 os.path.join(FLAGS['out_dir'], "validate"), FLAGS,
                 max_frames=16)

    # -- export (reference train.py:693-697)
    final_mesh, _ = geometry.getMesh(
        params['geo'], make_material(params['mat'], mat_static),
        build_bvh=False)
    os.makedirs(os.path.join(FLAGS['out_dir'], "mesh"), exist_ok=True)
    obj_mod.write_obj(os.path.join(FLAGS['out_dir'], "mesh/"), final_mesh)
    light_mod.save_env_map(os.path.join(FLAGS['out_dir'], "mesh/probe.hdr"),
                           params['light'])
    return params


if __name__ == "__main__":
    main()
