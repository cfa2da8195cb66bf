"""Render-pipeline feature coverage: spp supersampling with MSAA, multi-layer
depth peeling (transparency path), background modes, custom mip chains."""

import jax
import jax.numpy as jnp
import numpy as np

from nvdiffrecmc_tpu.ops import bvh as bvh_mod, envshade, vecmath
from nvdiffrecmc_tpu.render import light as light_mod
from nvdiffrecmc_tpu.render import mesh as mesh_mod
from nvdiffrecmc_tpu.render import render as render_mod
from nvdiffrecmc_tpu.render import texture as texture_mod


def two_quads():
    """Two stacked transparent-able quads facing +z."""
    v = jnp.array([
        [-0.5, -0.5, 0.2], [0.5, -0.5, 0.2], [0.5, 0.5, 0.2], [-0.5, 0.5, 0.2],
        [-0.7, -0.7, -0.2], [0.7, -0.7, -0.2], [0.7, 0.7, -0.2], [-0.7, 0.7, -0.2],
    ])
    t = jnp.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], jnp.int32)
    uv = (v[:, :2] + 1.0) / 2.0
    m = mesh_mod.Mesh(v_pos=v, t_pos_idx=t, v_tex=uv, t_tex_idx=t)
    m = mesh_mod.auto_normals(m)
    m = mesh_mod.compute_tangents(m)
    return m


def setup_scene(kd_channels=3, custom_mip=False):
    m = two_quads()
    kd_init = jnp.ones((16, 16, kd_channels)) * 0.6
    if kd_channels == 4:
        kd_init = kd_init.at[..., 3].set(0.5)  # semi-transparent
    kd = texture_mod.create_trainable(kd_init, [16, 16],
                                      auto_mipmaps=not custom_mip)
    ks = texture_mod.create_trainable(
        jnp.ones((16, 16, 3)) * jnp.asarray([0.0, 0.5, 0.0]), [16, 16],
        auto_mipmaps=not custom_mip)
    m.material = {'bsdf': 'pbr', 'no_perturbed_nrm': True, 'kd': kd, 'ks': ks}
    bvh = bvh_mod.build(m.v_pos, m.t_pos_idx, leaf_size=16)
    base = jnp.ones((8, 16, 3)) * 0.5
    tables = light_mod.update_pdf(base)
    lgt = {'base': base, 'pdf': tables.pdf, 'rows': tables.rows,
           'cols': tables.cols}
    perms = envshade.make_perms(2)
    mvp = jnp.asarray((vecmath.perspective(0.7854, 1, 0.1, 100)
                       @ vecmath.translate(0, 0, -2.0))[None])
    campos = jnp.asarray(np.array([[0, 0, 2.0]], np.float32))
    return m, bvh, lgt, perms, mvp, campos


def render(m, bvh, lgt, perms, mvp, campos, spp=1, layers=1, res=32):
    FLAGS = {'n_samples': 2, 'denoiser_demodulate': True}
    return render_mod.render_mesh(
        FLAGS, m, mvp, campos, lgt, (res, res), bvh, perms,
        jax.random.PRNGKey(0), spp=spp, num_layers=layers, msaa=True,
        background=jnp.ones((1, res * spp, res * spp, 3)) * 0.1,
        denoiser_sigma=None, shadow_scale=1.0, rnd_seed=0)


def test_spp_msaa_antialiasing():
    scene = setup_scene()
    b1 = render(*scene, spp=1)
    b2 = render(*scene, spp=2)
    assert b1['shaded'].shape == b2['shaded'].shape == (1, 32, 32, 4)
    for k in (b1, b2):
        assert np.all(np.isfinite(np.asarray(k['shaded'])))
    # spp=2 produces strictly more intermediate coverage values at edges
    e1 = np.asarray(b1['shaded'][..., 3])
    e2 = np.asarray(b2['shaded'][..., 3])
    frac2 = ((e2 > 0.05) & (e2 < 0.95)).sum()
    assert frac2 >= ((e1 > 0.05) & (e1 < 0.95)).sum()


def test_depth_peeling_transparency():
    scene = setup_scene(kd_channels=4)
    b1 = render(*scene, layers=1)
    b2 = render(*scene, layers=2)
    # with 2 layers the back quad contributes where the front one is
    # semi-transparent: center pixels differ
    c1 = np.asarray(b1['shaded'][0, 16, 16])
    c2 = np.asarray(b2['shaded'][0, 16, 16])
    assert np.isfinite(c1).all() and np.isfinite(c2).all()
    assert abs(float(c2[3]) - float(c1[3])) > 1e-3 or \
        np.abs(c2[:3] - c1[:3]).max() > 1e-3


def test_custom_mip_chain_trainable():
    scene = setup_scene(custom_mip=True)
    m = scene[0]
    assert isinstance(m.material['kd'].data, list)
    assert len(m.material['kd'].data) == 5  # 16 -> 8 -> 4 -> 2 -> 1
    b = render(*scene)
    assert np.all(np.isfinite(np.asarray(b['shaded'])))


def test_background_modes():
    import train as train_mod
    rng = np.random.RandomState(0)
    target = {'img': rng.rand(1, 16, 16, 4).astype(np.float32),
              'mvp': np.eye(4, dtype=np.float32)[None],
              'campos': np.zeros((1, 3), np.float32)}
    for bg in ('checker', 'black', 'white', 'reference', 'random'):
        out = train_mod.prepare_batch(target, [16, 16], bg,
                                      jax.random.PRNGKey(0), {})
        assert out['background'].shape == (1, 16, 16, 3)
        assert np.all(np.isfinite(np.asarray(out['img'])))


def test_staged_eval_mean_equals_mean_of_full_renders():
    """The staged eval protocol (rasterize once, average K MC stages,
    finish once) must equal the mean of K full renders with the same
    seeds: everything downstream of the MC accumulators is linear when
    denoising is off (train.render_eval relies on this)."""
    m, bvh, lgt, perms, mvp, campos = setup_scene()
    FLAGS = {'n_samples': 2, 'denoiser_demodulate': True}
    res, K = 32, 3
    bg = jnp.ones((1, res, res, 3)) * 0.1
    key = jax.random.PRNGKey(0)

    full = []
    for s in range(K):
        full.append(render_mod.render_mesh(
            FLAGS, m, mvp, campos, lgt, (res, res), bvh, perms, key,
            background=bg, denoiser_sigma=None, rnd_seed=s * 100))
    mean_full = np.mean([np.asarray(b['shaded']) for b in full], axis=0)

    v_clip, layers = render_mod.render_gbuffer(
        FLAGS, m, mvp, campos, (res, res), 1, 1, False, 'pbr', key)
    mcs = [render_mod.render_mc(FLAGS, layers, lgt, bvh, 'pbr', 1.0,
                                s * 100, perms) for s in range(K)]
    mc_avg = jax.tree.map(lambda *xs: sum(xs) / K, *mcs)
    staged = render_mod.render_finish(FLAGS, m, v_clip, layers, mc_avg,
                                      (res, res), 1, False, bg, 'pbr', None)
    np.testing.assert_allclose(np.asarray(staged['shaded']), mean_full,
                               rtol=1e-5, atol=1e-5)


def test_batched_render_matches_per_camera():
    """Batch of 2 cameras must equal the two single-camera renders — in
    particular z_grad (depth guide): round 3 interpolated camera 0's clip
    positions for every batch element."""
    m, bvh, lgt, perms, mvp1, campos1 = setup_scene()
    mvp2 = jnp.asarray((vecmath.perspective(0.7854, 1, 0.1, 100)
                        @ vecmath.translate(0.15, -0.1, -2.6))[None])
    campos2 = jnp.asarray(np.array([[-0.15, 0.1, 2.6]], np.float32))
    FLAGS = {'n_samples': 2, 'denoiser_demodulate': True}
    res = 32
    bg1 = jnp.ones((1, res, res, 3)) * 0.1

    def render_one(mvp, campos):
        return render_mod.render_mesh(
            FLAGS, m, mvp, campos, lgt, (res, res), bvh, perms,
            jax.random.PRNGKey(3), background=bg1, denoiser_sigma=None,
            rnd_seed=5)

    b1 = render_one(mvp1, campos1)
    b2 = render_one(mvp2, campos2)
    both = render_mod.render_mesh(
        FLAGS, m, jnp.concatenate([mvp1, mvp2]),
        jnp.concatenate([campos1, campos2]), lgt, (res, res), bvh, perms,
        jax.random.PRNGKey(3),
        background=jnp.concatenate([bg1, bg1]), denoiser_sigma=None,
        rnd_seed=5)
    for k_name in ('z_grad', 'normal', 'kd'):
        np.testing.assert_allclose(
            np.asarray(both[k_name][1]), np.asarray(b2[k_name][0]),
            rtol=1e-4, atol=1e-5, err_msg=k_name + ' cam2')
