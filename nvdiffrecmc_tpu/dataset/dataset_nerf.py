"""NeRF-synthetic dataset: `transforms_{train,test,val}.json` + one image
per frame.  Capability parity with /root/reference/dataset/dataset_nerf.py
(LDR->linear conversion, fovx->fovy, OpenGL camera convention with the -90deg
x-rotation of the NeRF world frame, index wrapping past n_frames).

Host-side numpy only.  Unlike the reference (which re-derives the camera per
__getitem__), all camera matrices are precomputed VECTORIZED at init: one
[N,4,4] einsum pass over the whole frame table, so the per-item cost is just
the (optional) image decode."""

import glob
import json
import os

import numpy as np

from ..ops import vecmath
from .dataset import Dataset


def _decode_image(stem):
    """Read `stem` (exact path, or any extension of it) as float32 RGBA-ish.

    8-bit files are treated as sRGB-encoded LDR: color channels are
    linearized, alpha (if present) is left untouched."""
    if os.path.isfile(stem):
        path = stem        # exact name first: no glob (metachar-safe)
    else:
        candidates = [c for c in glob.glob(glob.escape(stem) + '.*')
                      if os.path.isfile(c)]
        if not candidates:
            raise FileNotFoundError('no image matches %r' % stem)
        path = candidates[0]
    import imageio.v2 as imageio
    raw = np.asarray(imageio.imread(path))
    if np.issubdtype(raw.dtype, np.floating):
        return raw.astype(np.float32)
    x = raw.astype(np.float32) / np.float32(np.iinfo(raw.dtype).max)
    lo = x[..., :3] / 12.92
    hi = ((np.maximum(x[..., :3], 0.04045) + 0.055) / 1.055) ** 2.4
    x[..., :3] = np.where(x[..., :3] <= 0.04045, lo, hi)
    return x


class DatasetNERF(Dataset):
    """Iterable view over one transforms_*.json split."""

    def __init__(self, cfg_path, FLAGS, examples=None):
        self.FLAGS = FLAGS
        self.examples = examples
        root = os.path.dirname(cfg_path)
        with open(cfg_path) as f:
            meta = json.load(f)

        self._paths = [os.path.join(root, fr['file_path'])
                       for fr in meta['frames']]
        self.n_images = len(self._paths)

        probe = _decode_image(self._paths[0])
        self.resolution = probe.shape[:2]
        self.aspect = self.resolution[1] / self.resolution[0]
        print('DatasetNERF: %d frames at %dx%d from %s'
              % (self.n_images, self.resolution[1], self.resolution[0],
                 cfg_path))

        # --- vectorized camera table -----------------------------------
        # NeRF stores camera-to-world in a z-up world; the renderer wants
        # y-up modelview, so fold a -90deg world x-rotation into every mv.
        c2w = np.array([fr['transform_matrix'] for fr in meta['frames']],
                       np.float32)                           # [N,4,4]
        world_fix = vecmath.rotate_x(-np.pi / 2).astype(np.float32)
        mv = np.linalg.inv(c2w) @ world_fix[None]            # [N,4,4]
        fovy = vecmath.fovx_to_fovy(meta['camera_angle_x'], self.aspect)
        near, far = FLAGS['cam_near_far']
        proj = vecmath.perspective(fovy, self.aspect, near, far)
        self._mv = mv
        self._mvp = (proj[None].astype(np.float32) @ mv).astype(np.float32)
        self._campos = np.linalg.inv(mv)[:, :3, 3].astype(np.float32)

        self._images = None
        if FLAGS['pre_load']:
            self._images = [probe] + [_decode_image(p)
                                      for p in self._paths[1:]]

    def getMesh(self):
        return None  # image-supervised: no reference geometry

    def __len__(self):
        return self.n_images if self.examples is None else self.examples

    def __getitem__(self, itr):
        i = itr % self.n_images
        img = (self._images[i] if self._images is not None
               else _decode_image(self._paths[i]))
        return {
            'mv': self._mv[i][None],
            'mvp': self._mvp[i][None],
            'campos': self._campos[i][None],
            'resolution': self.FLAGS['train_res'],
            'spp': self.FLAGS['spp'],
            'img': img[None],
        }
