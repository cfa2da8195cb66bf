"""LLFF-style real-capture dataset.

Reads the `poses_bounds.npy` camera file produced by the LLFF/colmap
tooling plus an `images/` + `masks/` directory pair, and yields the same
batch dict as the other loaders.  Capability parity with
/root/reference/dataset/dataset_llff.py (format handling is dictated by
the `poses_bounds.npy` layout itself): 3x5 pose rows [down right back |
t | (H W f)] converted to OpenGL-style camera-to-world, per-image
focal-length -> vertical FOV, binary masks appended as the alpha
channel, and auto-centering of the camera rig at the least-squares
focal point of the view rays.
"""

import glob
import os

import numpy as np

from ..ops import vecmath
from .dataset import Dataset
from .dataset_nerf import _decode_image

_IMG_EXTS = ('png', 'jpg', 'jpeg')


def _list_images(d):
    return [f for f in sorted(glob.glob(os.path.join(d, "*")))
            if f.lower().endswith(_IMG_EXTS)]


def _read_ldr(fn):
    return _decode_image(fn)


def _read_mask(fn):
    import imageio.v2 as imageio
    img = np.asarray(imageio.imread(fn))
    if img.dtype != np.float32:
        img = img.astype(np.float32) / 255.0
    if img.ndim == 2:
        img = img[..., None]
    return img.astype(np.float32)


class DatasetLLFF(Dataset):
    def __init__(self, base_dir, FLAGS, examples=None):
        self.FLAGS = FLAGS
        self.base_dir = base_dir
        self.examples = examples
        self.image_files = _list_images(os.path.join(base_dir, "images"))
        self.mask_files = _list_images(os.path.join(base_dir, "masks"))

        probe = _read_ldr(self.image_files[0])
        self.resolution = probe.shape[0:2]
        self.aspect = self.resolution[1] / self.resolution[0]

        raw = np.load(os.path.join(base_dir, 'poses_bounds.npy'))
        # rows: 3x5 blocks [R|t|hwf] per image, stored flattened + 2 bounds
        blocks = raw[:, :-2].reshape([-1, 3, 5]).astype(np.float32)
        n_views = blocks.shape[0]
        assert len(self.image_files) == n_views, \
            (len(self.image_files), n_views)
        assert len(self.mask_files) == n_views, (len(self.mask_files), n_views)

        # LLFF stores axes as [down, right, back]; re-order columns to the
        # OpenGL camera convention [right, up, back] = [r, -d, b].
        rot_t = blocks[:, :, 0:4]                      # [n, 3, 4]
        c2w3 = np.concatenate([rot_t[:, :, 1:2], -rot_t[:, :, 0:1],
                               rot_t[:, :, 2:4]], axis=2)
        bottom = np.zeros((n_views, 1, 4), np.float32)
        bottom[:, 0, 3] = 1.0
        self.cam_to_world = np.concatenate([c2w3, bottom], axis=1)

        hwf = blocks[:, :, 4]                          # [n, 3] = (H, W, f)
        self.fovy = vecmath.focal_length_to_fovy(hwf[:, 2], hwf[:, 0])

        # Recenter the rig: put the least-squares intersection of all view
        # rays (the point everyone is looking at) at the origin.
        eyes = self.cam_to_world[:, :3, 3]
        gaze = -self.cam_to_world[:, :3, 2]
        pivot = vecmath.lines_focal(eyes, gaze)
        self.cam_to_world[:, :3, 3] -= pivot[None]
        print("DatasetLLFF: %d views at %dx%d, recentered by %s" % (
            n_views, self.resolution[1], self.resolution[0],
            np.array2string(-pivot, precision=3)))

        self.preloaded_data = None
        if FLAGS['pre_load']:
            self.preloaded_data = [self._parse_frame(i)
                                   for i in range(n_views)]

    def _parse_frame(self, idx):
        rgb = _read_ldr(self.image_files[idx])
        alpha = _read_mask(self.mask_files[idx])
        img = np.concatenate((rgb[..., :3], alpha[..., 0:1]), axis=-1)

        proj = vecmath.perspective(self.fovy[idx], self.aspect,
                                   self.FLAGS['cam_near_far'][0],
                                   self.FLAGS['cam_near_far'][1])
        mv = np.linalg.inv(self.cam_to_world[idx])
        campos = self.cam_to_world[idx][:3, 3]
        mvp = proj @ mv
        return (img[None], mv[None].astype(np.float32),
                mvp[None].astype(np.float32), campos[None].astype(np.float32))

    def getMesh(self):
        return None

    def __len__(self):
        n = self.cam_to_world.shape[0]
        return n if self.examples is None else self.examples

    def __getitem__(self, itr):
        n = self.cam_to_world.shape[0]
        if self.preloaded_data is not None:
            img, mv, mvp, campos = self.preloaded_data[itr % n]
        else:
            img, mv, mvp, campos = self._parse_frame(itr % n)
        return {'mv': mv, 'mvp': mvp, 'campos': campos,
                'resolution': self.resolution, 'spp': self.FLAGS['spp'],
                'img': img}
