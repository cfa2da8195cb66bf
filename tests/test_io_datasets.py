"""IO + dataset parser tests: OBJ/MTL roundtrip, Radiance HDR codec,
NeRF/LLFF parsers on synthetic data, checkpoint roundtrip, decorrelated
shading mode."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_obj_mtl_roundtrip(tmp_path):
    from nvdiffrecmc_tpu.render import obj as obj_mod
    from nvdiffrecmc_tpu.render import mesh as mesh_mod
    from nvdiffrecmc_tpu.render import texture as texture_mod

    m = obj_mod.load_obj('/root/reference/data/spot/spot.obj')
    assert m.v_pos.shape[0] > 1000 and m.t_pos_idx.shape[0] > 1000
    assert m.v_tex is not None and m.material is not None
    assert m.material['bsdf'] == 'pbr'
    # ks occlusion channel zeroed on load (clear_ks)
    assert float(m.material['ks'].getMips()[0][..., 0].max()) == 0.0

    m2 = mesh_mod.auto_normals(m)
    out = str(tmp_path / 'exp')
    os.makedirs(out, exist_ok=True)
    obj_mod.write_obj(out, m2)
    m3 = obj_mod.load_obj(os.path.join(out, 'mesh.obj'))
    assert m3.t_pos_idx.shape == m.t_pos_idx.shape
    np.testing.assert_allclose(np.asarray(m3.v_pos), np.asarray(m.v_pos),
                               atol=1e-4)


def test_hdr_codec_roundtrip(tmp_path):
    from nvdiffrecmc_tpu.render import light as light_mod
    rng = np.random.RandomState(0)
    img = (rng.rand(32, 64, 3).astype(np.float32) ** 2) * 100 + 0.01
    fn = str(tmp_path / 't.hdr')
    light_mod._write_hdr(fn, img)
    back = light_mod._read_hdr(fn)
    # RGBE error model: quantum = 2^(e-136) shared across channels, so the
    # bound is one quantum of the per-pixel max (not per-channel relative)
    quantum = img.max(axis=-1, keepdims=True) / 128.0
    assert np.all(np.abs(back - img) <= quantum + 1e-5)


def test_nerf_dataset_parser(tmp_path):
    from nvdiffrecmc_tpu.dataset import DatasetNERF
    import imageio.v2 as imageio
    d = tmp_path / 'scene'
    os.makedirs(d / 'train', exist_ok=True)
    frames = []
    rng = np.random.RandomState(0)
    for i in range(3):
        img = (rng.rand(32, 32, 4) * 255).astype(np.uint8)
        imageio.imwrite(str(d / 'train' / ('r_%d.png' % i)), img)
        xf = np.eye(4)
        xf[2, 3] = 3.0
        frames.append({'file_path': './train/r_%d' % i,
                       'transform_matrix': xf.tolist()})
    cfg = {'camera_angle_x': 0.7, 'frames': frames}
    json.dump(cfg, open(d / 'transforms_train.json', 'w'))

    FLAGS = {'pre_load': True, 'cam_near_far': [0.1, 1000.0],
             'train_res': [32, 32], 'spp': 1}
    ds = DatasetNERF(str(d / 'transforms_train.json'), FLAGS)
    assert len(ds) == 3
    item = ds[1]
    assert item['img'].shape == (1, 32, 32, 4)
    assert item['mvp'].shape == (1, 4, 4)
    assert np.isfinite(item['campos']).all()


def test_llff_dataset_parser(tmp_path):
    from nvdiffrecmc_tpu.dataset import DatasetLLFF
    import imageio.v2 as imageio
    d = tmp_path / 'llff'
    os.makedirs(d / 'images', exist_ok=True)
    os.makedirs(d / 'masks', exist_ok=True)
    rng = np.random.RandomState(1)
    n = 3
    pb = np.zeros((n, 17))
    for i in range(n):
        imageio.imwrite(str(d / 'images' / ('im_%d.png' % i)),
                        (rng.rand(24, 32, 3) * 255).astype(np.uint8))
        imageio.imwrite(str(d / 'masks' / ('im_%d.png' % i)),
                        (rng.rand(24, 32) * 255).astype(np.uint8))
        # LLFF pose: 3x5 [R|t|hwf] rows flattened + 2 bounds
        R = np.eye(3)
        t = np.array([np.cos(i), np.sin(i), 4.0])
        hwf = np.array([24, 32, 30.0])
        pose = np.concatenate([R, t[:, None], hwf[:, None]], axis=1)
        pb[i, :15] = pose.reshape(-1)
        pb[i, 15:] = [2.0, 6.0]
    np.save(str(d / 'poses_bounds.npy'), pb)

    FLAGS = {'pre_load': True, 'cam_near_far': [0.1, 1000.0], 'spp': 1}
    ds = DatasetLLFF(str(d), FLAGS)
    assert len(ds) == 3
    item = ds[0]
    assert item['img'].shape == (1, 24, 32, 4)  # alpha from mask
    assert np.isfinite(item['mvp']).all()


def test_checkpoint_roundtrip(tmp_path):
    import sys
    sys.path.insert(0, '/root/repo')
    import train as train_mod
    params = {'a': jnp.arange(5.0), 'b': {'c': jnp.ones((2, 3))}}
    opt_state = (jnp.zeros(3),)
    p = str(tmp_path / 'ck' / 'x.pkl')
    train_mod.save_checkpoint(p, params, opt_state, 42)
    p2, o2, it = train_mod.load_checkpoint(p)
    assert int(it) == 42
    np.testing.assert_allclose(np.asarray(p2['a']), np.arange(5.0))
    np.testing.assert_allclose(np.asarray(p2['b']['c']), 1.0)


def test_decorrelated_env_shade_grads():
    """Decorrelated mode: same forward value as env_shade(fwd_seed); backward
    uses an independent seed and still produces finite, nonzero grads."""
    from nvdiffrecmc_tpu.ops import envshade, bvh as bvh_mod
    from nvdiffrecmc_tpu.render import light as light_mod

    B, H, W = 1, 4, 4
    rng = np.random.RandomState(0)
    mask = jnp.ones((B, H, W))
    nrm = jnp.asarray(np.tile([0, 0, 1.0], (B, H, W, 1)).astype(np.float32))
    pos = jnp.zeros((B, H, W, 3))
    view = pos + nrm * 2
    kd = jnp.ones((B, H, W, 3)) * 0.5
    ks = jnp.ones((B, H, W, 3)) * jnp.asarray([0.0, 0.5, 0.2])
    base = jnp.asarray(rng.rand(8, 16, 3).astype(np.float32) + 0.05)
    tables = light_mod.update_pdf(base)
    v = jnp.array([[50.0, 50, 50], [50.1, 50, 50], [50, 50.1, 50]])
    t = jnp.array([[0, 1, 2]], dtype=jnp.int32)
    bvh = bvh_mod.build(v, t, leaf_size=16)
    perms = envshade.make_perms(2, n_tables=16)

    d_ref, s_ref = envshade.env_shade(
        mask, pos + nrm * 1e-3, pos, nrm, view, kd, ks, base, tables.pdf,
        tables.rows, tables.cols, bvh, perms, jnp.int32(5), jnp.float32(1.0),
        BSDF=0, n_samples_x=2, ray_chunk=64)

    def f(b):
        d, s = envshade.env_shade_decorrelated(
            mask, pos + nrm * 1e-3, pos, nrm, view, kd, ks, b, tables.pdf,
            tables.rows, tables.cols, bvh, perms, jnp.int32(5), jnp.int32(99),
            jnp.float32(1.0), BSDF=0, n_samples_x=2)
        return d, s

    (d, s), = [f(base)]
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-5)

    g = jax.grad(lambda b: jnp.sum(f(b)[0]))(base)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0
