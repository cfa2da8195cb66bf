"""Differentiable render pipeline: rasterize -> G-buffer -> Monte-Carlo shade
-> denoise -> composite.  Parity with /root/reference/render/render.py.

All functions here are pure and jit-friendly: static topology, static layer
count / spp, RNG threaded explicitly.  `lgt` is a dict with keys
'base' [Hl,Wl,3] (trainable) and stop-gradient sampling tables
'pdf' [Hl,Wl], 'rows' [Hl], 'cols' [Hl,Wl] (see light.update_pdf)."""

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops import envshade
from ..ops import denoiser as denoiser_ops
from ..ops import rasterizer as ras
from ..ops import xfm
from ..ops.antialias import antialias
from ..ops.normal import prepare_shading_normal
from ..ops.texture import bilinear_sample
from ..ops.vecmath import pixel_grid, safe_normalize, scale_img_nhwc, avg_pool_nhwc
from ..ops import mesh_ops
from . import texture as texture_mod


def shade_pre(FLAGS, rast, gb_depth, gb_pos, gb_geometric_normal, gb_normal,
              gb_tangent, gb_texc, gb_texc_deriv, view_pos, material, bsdf,
              key):
    """Seed-independent half of the pixel shader (reference render.py:30-99):
    texture taps, jitter smoothness gradients, shading-normal preparation.
    Returns the `pre` dict consumed by shade_mc / shade_post — splitting here
    lets eval rasterize once and re-shade K times with fresh MC seeds
    (validate runs n_samples=32 as K seed-split passes under the worker
    watchdog; everything in `pre` is identical across those passes)."""
    B, H, W = gb_depth.shape[:3]
    kj, km, kn = jax.random.split(key, 3)

    offset = jax.random.normal(kj, (B, H, W, 2)) * 0.005
    jitter = pixel_grid(W, H)[None] + offset

    mask = (rast[..., -1:] > 0).astype(jnp.float32)

    # All jitter taps share the SAME coordinates, so they are evaluated as
    # ONE channel-stacked bilinear_sample (gathers are latency-bound per
    # row: 5 separate taps cost 5x one wide tap).  The stack is assembled
    # after the textures are sampled; see _jitter_taps below.
    def _jitter_taps(buffers):
        cat = jnp.concatenate(buffers, axis=-1)
        taps = bilinear_sample(cat, jitter, boundary_mode='clamp')
        outs, off = [], 0
        for b in buffers:
            outs.append(taps[..., off:off + b.shape[-1]])
            off += b.shape[-1]
        return outs

    # --- texture lookups ---
    kd_grad = ks_grad = None
    perturbed_nrm = None
    mlp_material = 'kd_ks' in material
    if mlp_material:
        sample_fn = material['kd_ks']
        noise = jax.random.normal(km, gb_pos.shape) * 0.01
        # one encode over the stacked (jittered, clean) points: halves the
        # fixed costs of the hash-grid path (one sort/scatter backward over
        # 2P updates instead of two over P)
        both = sample_fn(jnp.concatenate(
            [gb_pos + noise, gb_pos], axis=0))
        all_tex_jitter, all_tex = jnp.split(both, 2, axis=0)
        kd, ks = all_tex[..., 0:3], all_tex[..., 3:6]
        kd_grad = jnp.abs(all_tex_jitter[..., 0:3] - kd)
        ks_grad = jnp.abs(all_tex_jitter[..., 3:6] - ks) * jnp.array([0., 1., 1.])
    else:
        # Fuse same-resolution texture lookups into one tap set: the tap
        # indices/weights depend only on (texc, deriv), so one channel-
        # concatenated sample turns the backward's per-texture scatter-adds
        # into a single scatter (XLA scatter is serial on TPU; this was the
        # largest single cost of the train step backward).
        tex_keys = ['kd', 'ks'] + (['normal'] if 'normal' in material else [])
        mips_per = [material[k].buildMips() for k in tex_keys]
        shapes = {tuple(m.shape[1:3] for m in mips) for mips in mips_per}
        if len(shapes) == 1:
            outs = texture_mod.tex_ops.texture_sample_multi(
                mips_per, gb_texc, gb_texc_deriv)
            kd = outs[0]
            ks = outs[1][..., 0:3]
            if 'normal' in material:
                perturbed_nrm = outs[2]
        else:
            kd = material['kd'].sample(gb_texc, gb_texc_deriv)
            ks = material['ks'].sample(gb_texc, gb_texc_deriv)[..., 0:3]
            if 'normal' in material:
                perturbed_nrm = material['normal'].sample(gb_texc,
                                                          gb_texc_deriv)

    if material.get('no_perturbed_nrm', False):
        perturbed_nrm = None

    # --- one stacked jitter tap for every screen-space smoothness term ---
    tap_bufs = [mask, gb_normal]
    if not mlp_material:
        tap_bufs += [kd, ks]
    if perturbed_nrm is not None:
        tap_bufs.append(perturbed_nrm)
    taps = iter(_jitter_taps(tap_bufs))
    mask_tap = next(taps)
    grad_weight = mask * mask_tap
    nrm_jitter = next(taps)
    if not mlp_material:
        kd_jitter = next(taps)
        ks_jitter = next(taps)
        kd_grad = jnp.abs(kd_jitter[..., 0:3] - kd[..., 0:3]) * grad_weight
        ks_grad = (jnp.abs(ks_jitter - ks) * jnp.array([0., 1., 1.])
                   * grad_weight)

    alpha = kd[..., 3:4] if kd.shape[-1] == 4 else jnp.ones_like(kd[..., 0:1])
    kd = kd[..., 0:3]

    nrm_grad = jnp.abs(nrm_jitter - gb_normal) * grad_weight

    perturbed_nrm_grad = None
    if perturbed_nrm is not None:
        pn_jitter = next(taps)
        perturbed_nrm_grad = 1.0 - safe_normalize(
            safe_normalize(pn_jitter) + safe_normalize(perturbed_nrm))[..., 2:3]
        perturbed_nrm_grad = jnp.repeat(perturbed_nrm_grad, 3, axis=-1) * grad_weight

    gb_normal_shaded = prepare_shading_normal(
        gb_pos, view_pos, perturbed_nrm, gb_normal, gb_tangent,
        gb_geometric_normal, two_sided_shading=True, opengl=True)

    return {
        'rast_id': rast[..., -1],
        'gb_depth': gb_depth,
        'gb_pos': gb_pos,
        'gb_geometric_normal': gb_geometric_normal,
        'gb_normal': gb_normal,
        'gb_tangent': gb_tangent,
        'gb_normal_shaded': gb_normal_shaded,
        'view_pos': view_pos,
        'kd': kd, 'ks': ks, 'alpha': alpha,
        'kd_grad': kd_grad, 'ks_grad': ks_grad, 'nrm_grad': nrm_grad,
        'perturbed_nrm': perturbed_nrm,
        'perturbed_nrm_grad': perturbed_nrm_grad,
    }


def shade_mc(FLAGS, pre, lgt, bvh, bsdf, shadow_scale, rnd_seed, perms):
    """Seed-dependent MC env shading on a prepared G-buffer (the
    ou.optix_env_shade launch of reference render.py:110-116).  Returns
    (diffuse_accum, specular_accum) or (None, None) for non-MC bsdf modes."""
    if bsdf not in ('pbr', 'diffuse', 'white'):
        return None, None
    kd, ks = pre['kd'], pre['ks']
    gb_pos = pre['gb_pos']
    gb_normal_shaded = pre['gb_normal_shaded']
    kd_shade = jnp.ones_like(kd) if bsdf == 'white' else kd
    ro = gb_pos + gb_normal_shaded * 0.001
    ibsdf = ['pbr', 'diffuse', 'white'].index(bsdf)
    view_pos_b = jnp.broadcast_to(pre['view_pos'], gb_pos.shape)
    if FLAGS.get('decorrelated', False):
        return envshade.env_shade_decorrelated(
            pre['rast_id'], ro, gb_pos, gb_normal_shaded, view_pos_b,
            kd_shade, ks, lgt['base'], lgt['pdf'], lgt['rows'],
            lgt['cols'], bvh, perms, rnd_seed, rnd_seed + 0x77777,
            shadow_scale, BSDF=ibsdf, n_samples_x=FLAGS['n_samples'])
    return envshade.env_shade(
        pre['rast_id'], ro, gb_pos, gb_normal_shaded, view_pos_b,
        kd_shade, ks, lgt['base'], lgt['pdf'], lgt['rows'],
        lgt['cols'], bvh, perms, rnd_seed, shadow_scale, BSDF=ibsdf,
        n_samples_x=FLAGS['n_samples'])


def shade_post(FLAGS, pre, diffuse_accum, specular_accum, bsdf,
               denoiser_sigma):
    """Combine the MC estimate with the prepared G-buffer into the aux
    buffer dict (reference render.py:118-163), each [B,H,W,4] with alpha
    in the last channel.  Linear in (diffuse_accum, specular_accum) when
    denoising is off, which is what licenses eval's mean-of-K-seeds."""
    kd, ks, alpha = pre['kd'], pre['ks'], pre['alpha']
    gb_depth = pre['gb_depth']
    gb_normal_shaded = pre['gb_normal_shaded']
    if bsdf in ('pbr', 'diffuse', 'white'):
        kd_shade = jnp.ones_like(kd) if bsdf == 'white' else kd
        if denoiser_sigma is not None and FLAGS.get('denoiser_demodulate', True):
            # one fused launch for both buffers (they share guide planes)
            from ..ops.pallas_denoise import bilateral_denoiser_pair
            diffuse_accum, specular_accum = bilateral_denoiser_pair(
                diffuse_accum, specular_accum, gb_normal_shaded, gb_depth,
                denoiser_sigma)

        if bsdf in ('white', 'diffuse'):
            shaded_col = diffuse_accum * kd_shade
        else:
            kd = kd * (1.0 - ks[..., 2:3])  # kd * (1 - metalness)
            shaded_col = diffuse_accum * kd + specular_accum

        if denoiser_sigma is not None and not FLAGS.get('denoiser_demodulate', True):
            shaded_col = denoiser_ops.bilateral_denoiser(
                shaded_col, gb_normal_shaded, gb_depth, denoiser_sigma)
    elif bsdf == 'normal':
        shaded_col = (gb_normal_shaded + 1.0) * 0.5
    elif bsdf == 'tangent':
        shaded_col = (pre['gb_tangent'] + 1.0) * 0.5
    elif bsdf == 'kd':
        shaded_col = kd
    elif bsdf == 'ks':
        shaded_col = ks
    else:
        raise AssertionError("Invalid BSDF '%s'" % bsdf)

    buffers = {
        'shaded': jnp.concatenate((shaded_col, alpha), axis=-1),
        'z_grad': jnp.concatenate((gb_depth, jnp.zeros_like(alpha), alpha), -1),
        'normal': jnp.concatenate((gb_normal_shaded, alpha), -1),
        'geometric_normal': jnp.concatenate(
            (pre['gb_geometric_normal'], alpha), -1),
        'kd': jnp.concatenate((kd, alpha), -1),
        'ks': jnp.concatenate((ks, alpha), -1),
        'kd_grad': jnp.concatenate((pre['kd_grad'], alpha), -1),
        'ks_grad': jnp.concatenate((pre['ks_grad'], alpha), -1),
        'normal_grad': jnp.concatenate((pre['nrm_grad'], alpha), -1),
    }
    if diffuse_accum is not None:
        buffers['diffuse_light'] = jnp.concatenate((diffuse_accum, alpha), -1)
        buffers['specular_light'] = jnp.concatenate((specular_accum, alpha), -1)
    if pre['perturbed_nrm'] is not None:
        buffers['perturbed_nrm'] = jnp.concatenate(
            (pre['perturbed_nrm'], alpha), -1)
        buffers['perturbed_nrm_grad'] = jnp.concatenate(
            (pre['perturbed_nrm_grad'], alpha), -1)
    return buffers


def gbuffer_layer(v_pos_clip, rast, rast_deriv, mesh, resolution, spp, msaa):
    """Interpolate one depth layer's G-buffer (reference render.py:189-234).
    Returns (rast_out_s, gb_depth, gb_pos, gb_geometric_normal, gb_normal,
    gb_tangent, gb_texc, gb_texc_deriv) — everything `shade` consumes that
    depends only on geometry + camera, not materials/light/seed."""
    if spp > 1 and msaa:
        rast_out_s = scale_img_nhwc(rast, resolution, mag='nearest', min='nearest')
        rast_out_deriv_s = scale_img_nhwc(rast_deriv, resolution,
                                          mag='nearest', min='nearest') * spp
    else:
        rast_out_s = rast
        rast_out_deriv_s = rast_deriv

    face_normals = mesh_ops.face_normals(mesh.v_pos, mesh.t_pos_idx)
    gb_geometric_normal = ras.interpolate_face(face_normals, rast_out_s)

    # Stack every batch-shared attribute indexed by the same buffer into
    # ONE gather (and one scatter-add in the backward): pos(3) nrm(3)
    # tng(3).  Gathers/scatters are serial on TPU, so 3 separate
    # interpolates cost 3x this one.  auto_normals/compute_tangents share
    # t_pos_idx by construction (mesh.py:55,62); OBJ meshes with distinct
    # index buffers take the generic path below.  Clip positions are
    # PER-CAMERA ([N,V,4]) so they get their own batched interpolate —
    # round 3 interpolated v_pos_clip[0] for every batch element, which
    # fed camera-0 depths to the denoiser's depth guide on items 1..N-1.
    clip_pos, clip_pos_deriv = ras.interpolate(
        jax.lax.stop_gradient(v_pos_clip), rast_out_s, mesh.t_pos_idx,
        rast_db=rast_out_deriv_s)
    if (mesh.t_nrm_idx is mesh.t_pos_idx
            and mesh.t_tng_idx is mesh.t_pos_idx):
        attr_cat = jnp.concatenate(
            [mesh.v_pos, mesh.v_nrm, mesh.v_tng], axis=-1)
        out, _ = ras.interpolate(attr_cat, rast_out_s, mesh.t_pos_idx)
        gb_pos = out[..., 0:3]
        gb_normal = out[..., 3:6]
        gb_tangent = out[..., 6:9]
    else:
        gb_pos, _ = ras.interpolate(mesh.v_pos, rast_out_s, mesh.t_pos_idx)
        gb_normal, _ = ras.interpolate(mesh.v_nrm, rast_out_s, mesh.t_nrm_idx)
        gb_tangent, _ = ras.interpolate(mesh.v_tng, rast_out_s,
                                        mesh.t_tng_idx)

    gb_texc, gb_texc_deriv = ras.interpolate(
        mesh.v_tex, rast_out_s, mesh.t_tex_idx, rast_db=rast_out_deriv_s)

    # depth & depth gradient (stop-gradient, reference render.py:228-234)
    eps = 1e-5
    clip_pos = jax.lax.stop_gradient(clip_pos)
    clip_pos_deriv = jax.lax.stop_gradient(clip_pos_deriv)
    # screen-derivative magnitude of (z, w): deriv output is (dA/dX, dA/dY)
    dz = jnp.abs(clip_pos_deriv[..., 2:3]) + jnp.abs(clip_pos_deriv[..., 6:7])
    dw = jnp.abs(clip_pos_deriv[..., 3:4]) + jnp.abs(clip_pos_deriv[..., 7:8])
    z0 = jnp.clip(clip_pos[..., 2:3], min=eps) / jnp.clip(clip_pos[..., 3:4], min=eps)
    z1 = (jnp.clip(clip_pos[..., 2:3] + dz, min=eps)
          / jnp.clip(clip_pos[..., 3:4] + dw, min=eps))
    gb_depth = jnp.concatenate((z0, jnp.abs(z1 - z0)), axis=-1)

    return (rast_out_s, gb_depth, gb_pos, gb_geometric_normal, gb_normal,
            gb_tangent, gb_texc, gb_texc_deriv)


def render_gbuffer(FLAGS, mesh, mtx_in, view_pos, resolution, spp,
                   num_layers, msaa, bsdf, key):
    """Stage 1 (seed-independent): clip transform, depth-peeled
    rasterization, per-layer G-buffer interpolation and `shade_pre`.
    Returns (v_pos_clip, layers) with layers = [(pre_dict, rast), ...].

    Splitting here is what lets eval rasterize ONCE and re-run only the
    MC stage per seed (reference validate runs n_samples=32 in one launch,
    train.py:260-264; the TPU worker watchdog forces K smaller programs —
    see train.render_eval)."""
    full_res = [resolution[0] * spp, resolution[1] * spp]
    view_pos = view_pos[:, None, None, :]
    v_pos_clip = xfm.xfm_points(mesh.v_pos, mtx_in)

    layers = []
    prev_rast = None
    keys = jax.random.split(key, num_layers)
    for i in range(num_layers):
        rast, rast_db = ras.rasterize(v_pos_clip, mesh.t_pos_idx, full_res,
                                      prev_rast=prev_rast)
        prev_rast = rast
        (rast_out_s, gb_depth, gb_pos, gb_geometric_normal, gb_normal,
         gb_tangent, gb_texc, gb_texc_deriv) = gbuffer_layer(
            v_pos_clip, rast, rast_db, mesh, resolution, spp, msaa)
        pre = shade_pre(FLAGS, rast_out_s, gb_depth, gb_pos,
                        gb_geometric_normal, gb_normal, gb_tangent, gb_texc,
                        gb_texc_deriv, view_pos, mesh.material, bsdf,
                        keys[i])
        layers.append((pre, rast))
    return v_pos_clip, layers


def render_mc(FLAGS, layers, lgt, bvh, bsdf, shadow_scale, rnd_seed, perms):
    """Stage 2 (seed-dependent): MC env shading per depth layer.  Returns
    [(diffuse_accum, specular_accum), ...] aligned with `layers`."""
    return [shade_mc(FLAGS, pre, lgt, bvh, bsdf, shadow_scale,
                     rnd_seed + i, perms)
            for i, (pre, _) in enumerate(layers)]


def render_finish(FLAGS, mesh, v_pos_clip, layers, mc, resolution, spp,
                  msaa, background, bsdf, denoiser_sigma):
    """Stage 3: `shade_post` per layer, MSAA upscale, front-to-back
    composite with per-layer antialiasing, spp pooling.  Linear in the MC
    accumulators when denoising is off (what licenses eval's
    mean-of-K-seeds: alpha/AA blend weights depend only on stage-1
    state)."""
    full_res = [resolution[0] * spp, resolution[1] * spp]
    buf_layers = []
    for (pre, rast), (da, sa) in zip(layers, mc):
        buffers = shade_post(FLAGS, pre, da, sa, bsdf, denoiser_sigma)
        if spp > 1 and msaa:
            buffers = {k: scale_img_nhwc(v, full_res, mag='nearest',
                                         min='nearest')
                       for k, v in buffers.items()}
        buf_layers.append((buffers, rast))
    return _composite(FLAGS, mesh, v_pos_clip, buf_layers, full_res, spp,
                      background)


def render_mesh(FLAGS, mesh, mtx_in, view_pos, lgt, resolution, bvh, perms,
                key, spp=1, num_layers=1, msaa=False, background=None,
                bsdf=None, denoiser_sigma=None, shadow_scale=1.0, rnd_seed=0):
    """Depth-peeled differentiable render (reference render.py:262-332).

    mtx_in: [B,4,4]; view_pos: [B,3]; returns dict of [B,H*spp,W*spp,4]
    buffers composited front-to-back with per-layer antialiasing.
    Composed from the three stages above so train and eval share one code
    path."""
    bsdf = mesh.material['bsdf'] if bsdf is None else bsdf
    v_pos_clip, layers = render_gbuffer(FLAGS, mesh, mtx_in, view_pos,
                                        resolution, spp, num_layers, msaa,
                                        bsdf, key)
    mc = render_mc(FLAGS, layers, lgt, bvh, bsdf, shadow_scale, rnd_seed,
                   perms)
    return render_finish(FLAGS, mesh, v_pos_clip, layers, mc, resolution,
                         spp, msaa, background, bsdf, denoiser_sigma)


def _composite(FLAGS, mesh, v_pos_clip, layers, full_res, spp, background):
    if background is not None:
        if spp > 1:
            background = scale_img_nhwc(background, full_res,
                                        mag='nearest', min='nearest')
        background = jnp.concatenate(
            (background, jnp.zeros_like(background[..., 0:1])), axis=-1)
    else:
        B = layers[0][1].shape[0]
        background = jnp.zeros((B, full_res[0], full_res[1], 4))

    # Composite every buffer per layer, then antialias ALL buffers with ONE
    # stacked-channel antialias call per layer.  The AA blend weights depend
    # only on (rast, v_pos_clip, tri) — shared across buffers — so stacking
    # is mathematically identical to per-buffer AA (the reference antialiases
    # every buffer, render.py:284-291,325-327) but runs the expensive
    # vertex-cotangent backward once instead of once per buffer
    # (measured 328 ms -> ~60 ms at 512^2 x 11 buffers).
    key_list = list(layers[0][0].keys())
    chans = {k: layers[0][0][k].shape[-1] for k in key_list}
    accums = {k: (background if k == 'shaded'
                  else jnp.zeros_like(layers[0][0][k])) for k in key_list}
    for buffers, rast in reversed(layers):
        for k in key_list:
            alpha = (rast[..., -1:] > 0).astype(jnp.float32) * buffers[k][..., -1:]
            src = jnp.concatenate(
                (buffers[k][..., :-1], jnp.ones_like(buffers[k][..., -1:])), -1)
            accums[k] = accums[k] * (1.0 - alpha) + src * alpha
        stacked = jnp.concatenate([accums[k] for k in key_list], axis=-1)
        stacked = antialias(stacked, rast, v_pos_clip, mesh.t_pos_idx)
        off = 0
        for k in key_list:
            accums[k] = stacked[..., off:off + chans[k]]
            off += chans[k]

    out_buffers = {k: (avg_pool_nhwc(accums[k], spp) if spp > 1 else accums[k])
                   for k in key_list}
    return out_buffers


def render_uv(mesh, resolution, mlp_sample_fn):
    """Rasterize in UV space to bake the neural material into 2D textures
    (reference render.py:337-354).  Returns (mask, kd, ks)."""
    uv_clip = mesh.v_tex[None] * 2.0 - 1.0
    uv_clip4 = jnp.concatenate(
        (uv_clip, jnp.zeros_like(uv_clip[..., 0:1]),
         jnp.ones_like(uv_clip[..., 0:1])), axis=-1)
    rast, _ = ras.rasterize(uv_clip4, mesh.t_tex_idx, resolution)
    gb_pos, _ = ras.interpolate(mesh.v_pos, rast, mesh.t_pos_idx)
    all_tex = mlp_sample_fn(gb_pos)
    assert all_tex.shape[-1] == 6, "Combined kd_ks must be 6 channels"
    mask = (rast[..., -1:] > 0).astype(jnp.float32)
    return mask, all_tex[..., 0:3], all_tex[..., 3:6]
