"""LLFF dataset (poses_bounds.npy real photogrammetry) — parity with
/root/reference/dataset/dataset_llff.py including the NeRF axis swizzle,
per-image focal->fovy, mask alpha concat and auto-centering."""

import glob
import os

import numpy as np

from ..ops import vecmath
from .dataset import Dataset
from .dataset_nerf import _srgb_to_rgb_np


def _img_files(d):
    return [f for f in sorted(glob.glob(os.path.join(d, "*")))
            if f.lower().endswith(('png', 'jpg', 'jpeg'))]


def _load_img(fn):
    import imageio.v2 as imageio
    img = np.asarray(imageio.imread(fn))
    if img.dtype != np.float32:
        img = img.astype(np.float32) / 255.0
        img[..., 0:3] = _srgb_to_rgb_np(img[..., 0:3])
    return img.astype(np.float32)


def _load_mask(fn):
    import imageio.v2 as imageio
    img = np.asarray(imageio.imread(fn))
    if img.dtype != np.float32:
        img = img.astype(np.float32) / 255.0
    if img.ndim == 2:
        img = np.tile(img[..., None], (1, 1, 3))
    return img.astype(np.float32)


class DatasetLLFF(Dataset):
    def __init__(self, base_dir, FLAGS, examples=None):
        self.FLAGS = FLAGS
        self.base_dir = base_dir
        self.examples = examples

        all_img = _img_files(os.path.join(base_dir, "images"))
        self.resolution = _load_img(all_img[0]).shape[0:2]
        print("DatasetLLFF: %d images with shape [%d, %d]"
              % (len(all_img), self.resolution[0], self.resolution[1]))

        poses_bounds = np.load(os.path.join(base_dir, 'poses_bounds.npy'))
        poses = poses_bounds[:, :-2].reshape([-1, 3, 5]).transpose([1, 2, 0])
        poses = np.concatenate(
            [poses[:, 1:2, :], -poses[:, 0:1, :], poses[:, 2:, :]], 1)
        poses = np.moveaxis(poses, -1, 0).astype(np.float32)

        lcol = np.tile(np.array([0, 0, 0, 1], np.float32)[None, None, :],
                       (poses.shape[0], 1, 1))
        self.imvs = np.concatenate((poses[:, :, 0:4], lcol), axis=1)
        self.aspect = self.resolution[1] / self.resolution[0]
        self.fovy = vecmath.focal_length_to_fovy(poses[:, 2, 4], poses[:, 0, 4])

        center = vecmath.lines_focal(self.imvs[:, :3, 3],
                                     -self.imvs[:, :3, 2])
        self.imvs[:, :3, 3] = self.imvs[:, :3, 3] - center[None]
        print("DatasetLLFF: auto-centering at %s" % center)

        self.preloaded_data = None
        if FLAGS['pre_load']:
            self.preloaded_data = [self._parse_frame(i)
                                   for i in range(self.imvs.shape[0])]

    def _parse_frame(self, idx):
        all_img = _img_files(os.path.join(self.base_dir, "images"))
        all_mask = _img_files(os.path.join(self.base_dir, "masks"))
        assert len(all_img) == self.imvs.shape[0] \
            and len(all_mask) == self.imvs.shape[0]

        img = _load_img(all_img[idx])
        mask = _load_mask(all_mask[idx])
        img = np.concatenate((img[..., :3], mask[..., 0:1]), axis=-1)

        proj = vecmath.perspective(self.fovy[idx], self.aspect,
                                   self.FLAGS['cam_near_far'][0],
                                   self.FLAGS['cam_near_far'][1])
        mv = np.linalg.inv(self.imvs[idx])
        campos = np.linalg.inv(mv)[:3, 3]
        mvp = proj @ mv
        return (img[None], mv[None].astype(np.float32),
                mvp[None].astype(np.float32), campos[None].astype(np.float32))

    def getMesh(self):
        return None

    def __len__(self):
        return self.imvs.shape[0] if self.examples is None else self.examples

    def __getitem__(self, itr):
        if self.preloaded_data is not None:
            img, mv, mvp, campos = self.preloaded_data[itr % self.imvs.shape[0]]
        else:
            img, mv, mvp, campos = self._parse_frame(itr % self.imvs.shape[0])
        return {'mv': mv, 'mvp': mvp, 'campos': campos,
                'resolution': self.resolution, 'spp': self.FLAGS['spp'],
                'img': img}
