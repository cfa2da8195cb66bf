"""Synthetic-supervision dataset: renders ground-truth images on the fly from
a reference OBJ + fixed HDR probe using the same differentiable renderer —
parity with /root/reference/dataset/dataset_mesh.py.

The GT render is a jitted no-grad closure over static topology; the reference
mesh BVH is built once (the reference rebuilds per item, dataset_mesh.py:41 —
its mesh never changes, so once is equivalent)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bvh as bvh_mod
from ..ops import envshade
from ..ops import vecmath
from ..render import light as light_mod
from ..render import mesh as mesh_mod
from ..render import render as render_mod
from .dataset import Dataset


def procedural_env(res_h=256, res_w=512, seed=0):
    """Deterministic sky+sun probe used when a config's .hdr asset is not
    bundled (the reference repo ships configs pointing at non-bundled HDRs)."""
    ys = (np.arange(res_h) + 0.5) / res_h
    sky = np.stack([
        0.25 + 0.45 * (1 - ys), 0.32 + 0.4 * (1 - ys), 0.5 + 0.35 * (1 - ys)
    ], axis=-1)[:, None, :].repeat(res_w, axis=1)
    ground = np.array([0.18, 0.15, 0.12])
    img = np.where(ys[:, None, None] > 0.55, ground[None, None, :], sky)
    # sun disk
    cy, cx = int(res_h * 0.22), int(res_w * 0.3)
    yy, xx = np.mgrid[0:res_h, 0:res_w]
    d2 = ((yy - cy) / (res_h * 0.015)) ** 2 + ((xx - cx) / (res_w * 0.0075)) ** 2
    img = img + np.exp(-d2)[..., None] * np.array([60.0, 55.0, 45.0])
    return jnp.asarray(np.clip(img, 1e-4, None).astype(np.float32))


def load_env_or_procedural(fn, scale=1.0):
    if fn is not None and os.path.exists(fn):
        return light_mod.load_env(fn, scale=scale)
    print("WARNING: envlight '%s' not found; using procedural sky+sun probe"
          % fn)
    return procedural_env()


class DatasetMesh(Dataset):
    def __init__(self, ref_mesh: mesh_mod.Mesh, cam_radius, FLAGS,
                 validate=False, num_validation_frames=200, seed=0):
        self.cam_radius = cam_radius
        self.FLAGS = FLAGS
        self.validate = validate
        self.fovy = np.deg2rad(45)
        self.aspect = FLAGS['train_res'][1] / FLAGS['train_res'][0]
        self.num_validation_frames = num_validation_frames
        self.rng = np.random.RandomState(seed)

        print("DatasetMesh: ref mesh has %d triangles and %d vertices"
              % (ref_mesh.t_pos_idx.shape[0], ref_mesh.v_pos.shape[0]))

        ref_mesh = mesh_mod.auto_normals(ref_mesh) \
            if ref_mesh.v_nrm is None else ref_mesh
        if ref_mesh.v_tng is None:
            ref_mesh = mesh_mod.compute_tangents(ref_mesh)
        self.ref_mesh = ref_mesh
        self.bvh = bvh_mod.build(ref_mesh.v_pos, ref_mesh.t_pos_idx,
                                 leaf_size=128)

        env_path = FLAGS.get('envlight')
        if env_path is not None and not os.path.isabs(env_path):
            env_path = os.path.join(FLAGS.get('data_root', '.'), env_path)
        self.envlight = load_env_or_procedural(env_path,
                                               FLAGS.get('env_scale', 1.0))
        tables = light_mod.update_pdf(self.envlight)
        self.lgt = {'base': self.envlight, 'pdf': tables.pdf,
                    'rows': tables.rows, 'cols': tables.cols}
        self.perms = envshade.make_perms(FLAGS['n_samples'])

        self._render = jax.jit(self._render_impl, static_argnames=('res',))
        self._frame_count = 0

    def _render_impl(self, mvp, campos, key, rnd_seed, res):
        buffers = render_mod.render_mesh(
            self.FLAGS, self.ref_mesh, mvp, campos, self.lgt, res, self.bvh,
            self.perms, key, spp=self.FLAGS['spp'],
            num_layers=self.FLAGS['layers'], msaa=True, background=None,
            rnd_seed=rnd_seed)
        return buffers['shaded']

    def getMesh(self):
        return self.ref_mesh

    def _rotate_scene(self, itr):
        res = tuple(self.FLAGS['display_res'])
        proj = vecmath.perspective(self.fovy, res[1] / res[0],
                                   self.FLAGS['cam_near_far'][0],
                                   self.FLAGS['cam_near_far'][1])
        ang = (itr / self.num_validation_frames) * np.pi * 2
        mv = vecmath.translate(0, 0, -self.cam_radius) \
            @ (vecmath.rotate_x(-0.4) @ vecmath.rotate_y(ang))
        mvp = proj @ mv
        campos = np.linalg.inv(mv)[:3, 3]
        return mv[None], mvp[None], campos[None], res

    def _random_scene(self):
        res = tuple(self.FLAGS['train_res'])
        proj = vecmath.perspective(self.fovy, res[1] / res[0],
                                   self.FLAGS['cam_near_far'][0],
                                   self.FLAGS['cam_near_far'][1])
        mv = vecmath.translate(0, 0, -self.cam_radius) \
            @ vecmath.random_rotation_translation(0.25, self.rng)
        mvp = proj @ mv
        campos = np.linalg.inv(mv)[:3, 3]
        return mv[None], mvp[None], campos[None], res

    def __len__(self):
        return (self.num_validation_frames if self.validate
                else self.FLAGS['iter'] * self.FLAGS['batch'])

    def __getitem__(self, itr):
        if self.validate:
            mv, mvp, campos, res = self._rotate_scene(itr)
        else:
            mv, mvp, campos, res = self._random_scene()

        self._frame_count += 1
        key = jax.random.PRNGKey(self._frame_count * 7919 + 13)
        img = self._render(jnp.asarray(mvp.astype(np.float32)),
                           jnp.asarray(campos.astype(np.float32)),
                           key, jnp.int32(self._frame_count), res)
        return {
            'mv': mv.astype(np.float32),
            'mvp': mvp.astype(np.float32),
            'campos': campos.astype(np.float32),
            'light': self.lgt,
            'resolution': res,
            'spp': self.FLAGS['spp'],
            'img': np.asarray(img),
        }
