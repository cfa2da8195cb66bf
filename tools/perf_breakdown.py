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


def timeit(name, fn, *args, reps=8):
    """Dispatch `reps` calls back-to-back and sync once: the ~72 ms tunnel
    round-trip is amortized to ~9 ms/rep instead of inflating every rep."""
    fn(*args)  # warm/compile
    sync(jax.tree_util.tree_leaves(fn(*args))[0])
    t0 = time.time()
    outs = [fn(*args) for _ in range(reps)]
    sync(jax.tree_util.tree_leaves(outs[-1])[0])
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
    mesh_built, bvh = geometry.getMesh(params['geo'], material)

    getmesh_j = jax.jit(lambda p: geometry.getMesh(p, material)[1].tri_mat)
    timeit("BVH build + normals (getMesh)", lambda: getmesh_j(params['geo']))

    v_clip = jax.jit(lambda m: xfm.xfm_points(m, target['mvp']))(
        mesh_built.v_pos)

    rast_j = jax.jit(lambda vc: ras.rasterize(vc, mesh_built.t_pos_idx,
                                              (res, res))[0])
    timeit("rasterize 512^2", lambda: rast_j(v_clip))

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

    full_render_j = jax.jit(full_render)
    timeit("render_mesh fwd (full pipeline)",
           lambda: full_render_j(params['geo'], light_base))

    # denoiser alone
    img = jnp.ones((1, res, res, 3)) * 0.5
    nrm = jnp.tile(jnp.asarray([0., 0., 1.])[None, None, None], (1, res, res, 1))
    depth = jnp.ones((1, res, res, 2))
    timeit("bilateral denoiser (1x fwd)",
           lambda: jax.jit(den.bilateral_denoiser)(img, nrm, depth,
                                                   jnp.float32(2.0)))

    # --- fused shade isolation on the real spot G-buffer ---
    from nvdiffrecmc_tpu.ops import normal as normal_ops
    from nvdiffrecmc_tpu.ops import mesh_ops

    @jax.jit
    def make_gbuf(p_geo, p_mat):
        material2 = train_mod.make_material(p_mat, mat_static)
        m, bv = geometry.getMesh(p_geo, material2)
        vc = xfm.xfm_points(m.v_pos, target['mvp'])
        rast, _ = ras.rasterize(vc, m.t_pos_idx, (res, res))
        gb_pos, _ = ras.interpolate(m.v_pos, rast, m.t_pos_idx)
        fn = mesh_ops.face_normals(m.v_pos, m.t_pos_idx)
        fn_idx = jnp.tile(jnp.arange(fn.shape[0], dtype=jnp.int32)[:, None],
                          (1, 3))
        gb_gn, _ = ras.interpolate(fn, rast, fn_idx)
        gb_n, _ = ras.interpolate(m.v_nrm, rast, m.t_nrm_idx)
        gb_t, _ = ras.interpolate(m.v_tng, rast, m.t_tng_idx)
        view_b = jnp.broadcast_to(target['campos'][:, None, None, :],
                                  gb_pos.shape)
        ns = normal_ops.prepare_shading_normal(
            gb_pos, view_b, None, gb_n, gb_t, gb_gn,
            two_sided_shading=True, opengl=True)
        if 'kd_ks' in material2:
            tex = material2['kd_ks'](gb_pos)
            kd, ks = tex[..., 0:3], tex[..., 3:6]
        else:
            gb_texc, gb_texc_deriv = ras.interpolate(
                m.v_tex, rast, m.t_tex_idx, rast_db=jnp.zeros_like(rast))
            kd = material2['kd'].sample(gb_texc, gb_texc_deriv)[..., 0:3]
            ks = material2['ks'].sample(gb_texc, gb_texc_deriv)[..., 0:3]
        return (rast[..., -1], gb_pos + ns * 0.001, gb_pos, ns, view_b,
                kd, ks, bv)

    mask_g, ro_g, pos_g, ns_g, view_g, kd_g, ks_g, bvh_g = make_gbuf(
        params['geo'], params['mat'])

    def shade_fwd(lb, pos_, ns_, kd_, ks_):
        tb = light_mod.update_pdf(lb)
        d, s = envshade.env_shade(
            mask_g, ro_g, pos_, ns_, view_g, kd_, ks_, lb, tb.pdf,
            tb.rows, tb.cols, bvh_g, perms, 7, jnp.float32(0.5),
            BSDF=0, n_samples_x=n_samples)
        return d, s

    sf = jax.jit(shade_fwd)
    timeit("env_shade fused fwd (n%d)" % n_samples,
           lambda: sf(light_base, pos_g, ns_g, kd_g, ks_g))

    def shade_loss(lb, pos_, ns_, kd_, ks_):
        d, s = shade_fwd(lb, pos_, ns_, kd_, ks_)
        return jnp.sum(d) + jnp.sum(s)

    sg = jax.jit(jax.grad(shade_loss, argnums=(0, 1, 2, 3, 4)))
    timeit("env_shade fused fwd+bwd",
           lambda: sg(light_base, pos_g, ns_g, kd_g, ks_g))

    # stage A alone
    from nvdiffrecmc_tpu.ops import pallas_shade as psh
    B_, H_, W_ = mask_g.shape
    P = B_ * H_ * W_
    Pp = P + ((-P) % 1024)
    n2 = n_samples * n_samples
    u8 = psh.make_uniforms(jax.random.PRNGKey(7), n2, P, n_samples, perms)
    u8 = psh._pad_to(u8, 1024, axis=2)
    wo = (view_g - pos_g).reshape(P, 3)
    wo = wo / jnp.maximum(jnp.linalg.norm(wo, axis=-1, keepdims=True), 1e-20)
    gb8 = jnp.concatenate(
        [ns_g.reshape(P, 3).T, wo.T,
         (ks_g.reshape(P, 3)[:, 1] ** 2)[None],
         jnp.full((1, P), 0.5)], axis=0)
    gb8 = psh._pad_to(gb8, 1024, axis=1)
    tb = light_mod.update_pdf(light_base)

    samp_j = jax.jit(lambda u, g: psh.sample_all(
        u, g, tb.rows, tb.cols, tb.pdf, light_base, n_samples))
    timeit("  stage A (sample_all)", lambda: samp_j(u8, gb8))

    samp_v = samp_j(u8, gb8)
    ro_p = psh._pad_to(ro_g.reshape(P, 3), 1024, axis=0)
    m_p = psh._pad_to(mask_g.reshape(P) > 0, 1024, axis=0, value=False)
    ro_m = jnp.where(m_p[:, None], ro_p, psh.BIG)
    listb_j = jax.jit(lambda s, r, m, bv: psh._build_lists(s, r, m, bv,
                                                           1024, 0.0, False))
    timeit("  stage B (visit lists)",
           lambda: listb_j(samp_v, ro_m, m_p, bvh_g))

    # --- backward-side pieces ---
    den_g = jax.jit(jax.grad(
        lambda c: jnp.sum(den.bilateral_denoiser(c, nrm, depth,
                                                 jnp.float32(2.0)))))
    timeit("bilateral denoiser fwd+bwd", lambda: den_g(img))

    def render_display(p_geo, which):
        m, bv = geometry.getMesh(p_geo, material)
        return render_mod.render_mesh(
            FLAGS, m, target['mvp'], target['campos'], lgt, (res, res), bv,
            perms, key, denoiser_sigma=None, bsdf=which,
            rnd_seed=1)['shaded']

    nrm_fwd_j = jax.jit(lambda p: render_display(p, 'normal'))
    timeit("raster+interp+AA fwd (bsdf=normal)",
           lambda: nrm_fwd_j(params['geo']))
    nrm_g_j = jax.jit(jax.grad(
        lambda p: jnp.sum(render_display(p, 'normal'))))
    timeit("raster+interp+AA fwd+bwd",
           lambda: nrm_g_j(params['geo']))

    rfull_g_j = jax.jit(jax.grad(
        lambda pg, lb: jnp.sum(full_render(pg, lb)), argnums=(0, 1)))
    timeit("render_mesh fwd+bwd (geo,light)",
           lambda: rfull_g_j(params['geo'], light_base))

    # same graph but ALSO differentiating the material (the real step does:
    # hash-grid table backward = HBM scatter-adds, candidate bottleneck)
    def full_render_m(p_geo, p_mat, lb):
        tb = light_mod.update_pdf(lb)
        lg = {'base': lb, 'pdf': tb.pdf, 'rows': tb.rows, 'cols': tb.cols}
        mt = train_mod.make_material(p_mat, mat_static)
        m, bv = geometry.getMesh(p_geo, mt)
        return render_mod.render_mesh(
            FLAGS, m, target['mvp'], target['campos'], lg, (res, res), bv,
            perms, key, denoiser_sigma=jnp.float32(2.0), shadow_scale=0.5,
            rnd_seed=1)['shaded']

    rfullm_g_j = jax.jit(jax.grad(
        lambda pg, pm, lb: jnp.sum(full_render_m(pg, pm, lb)),
        argnums=(0, 1, 2)))
    timeit("render_mesh fwd+bwd (geo,mat,light)",
           lambda: rfullm_g_j(params['geo'], params['mat'], light_base))

    # hash-grid neural texture isolated at P = res^2
    if 'kd_ks' in material:
        pts = jnp.asarray(
            np.random.RandomState(5).rand(res * res, 3).astype(np.float32)
        ) * 2.0 - 1.0
        mt_of = lambda pm: train_mod.make_material(pm, mat_static)
        hg_f = jax.jit(lambda pm: mt_of(pm)['kd_ks'](pts))
        timeit("hash-grid MLP fwd (262k pts)", lambda: hg_f(params['mat']))
        hg_g = jax.jit(jax.grad(
            lambda pm: jnp.sum(mt_of(pm)['kd_ks'](pts) ** 2)))
        timeit("hash-grid MLP fwd+bwd", lambda: hg_g(params['mat']))

    # light-probe CDF table build
    up_f = jax.jit(light_mod.update_pdf)
    timeit("update_pdf fwd", lambda: up_f(light_base).pdf)
    up_g = jax.jit(jax.grad(lambda lb: jnp.sum(update_pdf_sum(lb))))
    timeit("update_pdf fwd+bwd", lambda: up_g(light_base))


def update_pdf_sum(lb):
    from nvdiffrecmc_tpu.render import light as light_mod
    t = light_mod.update_pdf(lb)
    return t.pdf.sum() + t.rows.sum() + t.cols.sum()


if __name__ == '__main__':
    main()
