"""Generate a NeRF-synthetic-format dataset (transforms_*.json + PNGs) by
rendering a reference OBJ with the framework's own renderer.

Purpose: the real nerf_synthetic scenes (configs/nerf_*.json, e.g.
data/nerf_synthetic/lego) cannot be downloaded in this zero-egress
environment, but the nerf-scale capability claim (dmtet_grid 128 -> 262k
marching-tets triangles, 800^2 training images, DatasetNERF ingestion,
reference dataset/dataset_nerf.py parity) must still be demonstrated end to
end.  This tool produces a drop-in stand-in at the same resolution and format
so `train.py --config configs/nerf_*_synth.json` exercises the identical
code path and scale.

Pose convention matches dataset_nerf.py: mv = inv(transform_matrix) @
rotate_x(-pi/2), so we emit transform_matrix = inv(mv @ rotate_x(pi/2)).

Usage:
  python tools/make_synthetic_nerf.py --mesh /root/reference/data/spot/spot.obj \
      --out data/nerf_synthetic_spot --res 800 --n-train 30 --n-val 4
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--mesh', default='/root/reference/data/spot/spot.obj')
    ap.add_argument('--out', default='data/nerf_synthetic_spot')
    ap.add_argument('--res', type=int, default=800)
    ap.add_argument('--n-train', type=int, default=30)
    ap.add_argument('--n-val', type=int, default=4)
    ap.add_argument('--n-samples', type=int, default=8)
    ap.add_argument('--cam-radius', type=float, default=3.0)
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import imageio.v2 as imageio
    from nvdiffrecmc_tpu.ops import bvh as bvh_mod, envshade, vecmath
    from nvdiffrecmc_tpu.render import light as light_mod
    from nvdiffrecmc_tpu.render import mesh as mesh_mod
    from nvdiffrecmc_tpu.render import render as render_mod
    from nvdiffrecmc_tpu.render import obj as obj_mod
    from nvdiffrecmc_tpu.dataset.dataset_mesh import procedural_env
    from nvdiffrecmc_tpu.config import DEFAULTS

    m = obj_mod.load_obj(args.mesh)
    m = mesh_mod.auto_normals(m) if m.v_nrm is None else m
    if m.v_tng is None:
        m = mesh_mod.compute_tangents(m)
    bvh = bvh_mod.build(m.v_pos, m.t_pos_idx, leaf_size=128)

    env = procedural_env()
    tables = light_mod.update_pdf(env)
    lgt = {'base': env, 'pdf': tables.pdf, 'rows': tables.rows,
           'cols': tables.cols}
    perms = envshade.make_perms(args.n_samples)

    FLAGS = dict(DEFAULTS)
    FLAGS.update(n_samples=args.n_samples, spp=1, layers=1,
                 denoiser='bilateral')

    res = (args.res, args.res)
    fovy = np.deg2rad(45.0)
    fovx = 2.0 * np.arctan(np.tan(fovy / 2.0) * (res[1] / res[0]))
    proj = vecmath.perspective(fovy, res[1] / res[0], 0.1, 1000.0)

    @jax.jit
    def render(mvp, campos, key, seed):
        buffers = render_mod.render_mesh(
            FLAGS, m, mvp, campos, lgt, res, bvh, perms, key,
            spp=1, num_layers=1, msaa=True, background=None, rnd_seed=seed,
            denoiser_sigma=jnp.float32(2.0))
        return buffers['shaded']

    rng = np.random.RandomState(args.seed)
    rx90 = vecmath.rotate_x(np.pi / 2)

    def write_split(split, n, key0):
        frames = []
        img_dir = os.path.join(args.out, split)
        os.makedirs(img_dir, exist_ok=True)
        for i in range(n):
            mv = vecmath.translate(0, 0, -args.cam_radius) \
                @ vecmath.random_rotation_translation(0.25, rng)
            xf = np.linalg.inv(mv @ rx90)
            mvp = (proj @ mv).astype(np.float32)
            campos = np.linalg.inv(mv)[:3, 3].astype(np.float32)
            key = jax.random.PRNGKey(key0 + i * 7919)
            img = np.asarray(render(jnp.asarray(mvp[None]),
                                    jnp.asarray(campos[None]),
                                    key, jnp.int32(key0 + i)))[0]
            rgb = np.clip(img[..., :3], 0.0, 1.0)
            srgb = np.where(rgb <= 0.0031308, rgb * 12.92,
                            1.055 * np.power(np.maximum(rgb, 0.0031308),
                                             1 / 2.4) - 0.055)
            alpha = np.clip(img[..., 3:4], 0.0, 1.0)
            rgba = (np.concatenate([srgb, alpha], -1) * 255 + 0.5
                    ).astype(np.uint8)
            name = 'r_%d' % i
            imageio.imwrite(os.path.join(img_dir, name + '.png'), rgba)
            frames.append({'file_path': './%s/%s' % (split, name),
                           'transform_matrix': xf.tolist()})
            print('%s %d/%d' % (split, i + 1, n), flush=True)
        with open(os.path.join(args.out, 'transforms_%s.json' % split),
                  'w') as f:
            json.dump({'camera_angle_x': float(fovx), 'frames': frames}, f)

    os.makedirs(args.out, exist_ok=True)
    write_split('train', args.n_train, 1000)
    write_split('val', args.n_val, 500000)
    write_split('test', args.n_val, 900000)
    print('done: %s' % args.out)


if __name__ == '__main__':
    main()
