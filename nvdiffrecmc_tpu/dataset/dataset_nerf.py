"""NeRF-synthetic dataset (transforms_*.json) — parity with
/root/reference/dataset/dataset_nerf.py.  Host-side numpy only."""

import glob
import json
import os

import numpy as np

from ..ops import vecmath
from ..render.texture import load_image
from .dataset import Dataset


def _srgb_to_rgb_np(f):
    return np.where(f <= 0.04045, f / 12.92,
                    np.power((np.clip(f, 0.04045, None) + 0.055) / 1.055, 2.4))


def _load_img(path):
    files = glob.glob(path + '.*') or glob.glob(path)
    assert len(files) > 0, \
        "Tried to find image file for: %s, but found 0 files" % path
    import imageio.v2 as imageio
    img = np.asarray(imageio.imread(files[0]))
    if img.dtype != np.float32:  # LDR -> linear
        img = img.astype(np.float32) / 255.0
        img[..., 0:3] = _srgb_to_rgb_np(img[..., 0:3])
    return img.astype(np.float32)


class DatasetNERF(Dataset):
    def __init__(self, cfg_path, FLAGS, examples=None):
        self.FLAGS = FLAGS
        self.examples = examples
        self.base_dir = os.path.dirname(cfg_path)
        self.cfg = json.load(open(cfg_path, 'r'))
        self.n_images = len(self.cfg['frames'])

        ref = _load_img(os.path.join(self.base_dir,
                                     self.cfg['frames'][0]['file_path']))
        self.resolution = ref.shape[0:2]
        self.aspect = self.resolution[1] / self.resolution[0]
        print("DatasetNERF: %d images with shape [%d, %d]"
              % (self.n_images, self.resolution[0], self.resolution[1]))

        self.preloaded_data = None
        if FLAGS['pre_load']:
            self.preloaded_data = [self._parse_frame(i)
                                   for i in range(self.n_images)]

    def _parse_frame(self, idx):
        cfg = self.cfg
        fovy = vecmath.fovx_to_fovy(cfg['camera_angle_x'], self.aspect)
        proj = vecmath.perspective(fovy, self.aspect,
                                   self.FLAGS['cam_near_far'][0],
                                   self.FLAGS['cam_near_far'][1])
        img = _load_img(os.path.join(self.base_dir,
                                     cfg['frames'][idx]['file_path']))
        xf = np.array(cfg['frames'][idx]['transform_matrix'], np.float32)
        mv = np.linalg.inv(xf) @ vecmath.rotate_x(-np.pi / 2)
        campos = np.linalg.inv(mv)[:3, 3]
        mvp = proj @ mv
        return (img[None], mv[None].astype(np.float32),
                mvp[None].astype(np.float32), campos[None].astype(np.float32))

    def getMesh(self):
        return None

    def __len__(self):
        return self.n_images if self.examples is None else self.examples

    def __getitem__(self, itr):
        if self.preloaded_data is not None:
            img, mv, mvp, campos = self.preloaded_data[itr % self.n_images]
        else:
            img, mv, mvp, campos = self._parse_frame(itr % self.n_images)
        return {'mv': mv, 'mvp': mvp, 'campos': campos,
                'resolution': self.FLAGS['train_res'],
                'spp': self.FLAGS['spp'], 'img': img}
