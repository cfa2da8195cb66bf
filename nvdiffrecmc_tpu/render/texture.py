"""2D texture container with auto/custom mip chains.

Parity with /root/reference/render/texture.py: a Texture2D holds either a
single [1,H,W,C] array (auto mips built per-evaluation through the custom
mip op so gradients reach the base level) or an explicit mip list (custom
mips, each independently trainable).  Post-step clamp/normalize projections
operate on the raw arrays.
"""

import dataclasses
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import texture as tex_ops
from ..ops import vecmath


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Texture2D:
    data: Any                       # [1,H,W,C] array or list of them (mips)
    min_max: Any = None             # (min [C], max [C]) or None

    def getRes(self):
        return self.getMips()[0].shape[1:3]

    def getChannels(self):
        return self.getMips()[0].shape[3]

    def getMips(self):
        return self.data if isinstance(self.data, list) else [self.data]

    def buildMips(self):
        """The effective mip list (auto chain built through the custom mip
        op so gradients reach the base level)."""
        if isinstance(self.data, list):
            return self.data
        d = self.data
        if d.shape[1] > 1 and d.shape[2] > 1:
            return tex_ops.build_mip_chain(d)
        return [d]

    def sample(self, texc, texc_deriv=None, filter_mode='linear-mipmap-linear'):
        return tex_ops.texture_sample(self.buildMips(), texc, texc_deriv,
                                      filter_mode)

    def clamp(self):
        """Out-of-place projection (returns a clamped copy; applied after each
        optimizer step, matching the in-place clamp_ at train.py:467-473)."""
        if self.min_max is None:
            return self
        mn, mx = self.min_max
        C = self.getChannels()
        mn, mx = mn[:C], mx[:C]
        new = [jnp.clip(m, mn, mx) for m in self.getMips()]
        return dataclasses.replace(
            self, data=new if isinstance(self.data, list) else new[0])

    def normalize(self):
        new = [vecmath.safe_normalize(m) for m in self.getMips()]
        return dataclasses.replace(
            self, data=new if isinstance(self.data, list) else new[0])


def _to_nhwc(init):
    init = jnp.asarray(init, dtype=jnp.float32)
    if init.ndim == 1:
        init = init[None, None, None, :]
    elif init.ndim == 3:
        init = init[None]
    return init


def create_trainable(init, res=None, auto_mipmaps=True, min_max=None):
    """Build a trainable Texture2D (reference texture.py:103-131)."""
    if isinstance(init, Texture2D):
        min_max = init.min_max if min_max is None else min_max
        init = init.getMips()[0]
    init = _to_nhwc(init)
    if res is not None:
        init = vecmath.scale_img_nhwc(init, res)
    if auto_mipmaps:
        return Texture2D(data=init, min_max=min_max)
    chain = [init]
    while chain[-1].shape[1] > 1 or chain[-1].shape[2] > 1:
        size = [max(chain[-1].shape[1] // 2, 1), max(chain[-1].shape[2] // 2, 1)]
        chain.append(vecmath.scale_img_nhwc(chain[-1], size))
    return Texture2D(data=chain, min_max=min_max)


def srgb_to_rgb(texture: Texture2D):
    new = [vecmath.srgb_to_rgb(m) for m in texture.getMips()]
    return dataclasses.replace(
        texture, data=new if isinstance(texture.data, list) else new[0])


def rgb_to_srgb(texture: Texture2D):
    new = [vecmath.rgb_to_srgb(m) for m in texture.getMips()]
    return dataclasses.replace(
        texture, data=new if isinstance(texture.data, list) else new[0])


# ---------------------------------------------------------------------------
# IO
# ---------------------------------------------------------------------------

def load_image(fn):
    import imageio.v2 as imageio
    img = np.asarray(imageio.imread(fn))
    if img.dtype == np.float32:
        return img
    return img.astype(np.float32) / 255.0


def save_image(fn, x):
    import imageio.v2 as imageio
    x = np.asarray(x)
    try:
        imageio.imwrite(fn, np.clip(np.rint(x * 255.0), 0, 255).astype(np.uint8))
    except Exception:
        print("WARNING: FAILED to save image %s" % fn)


def _load_mip2D(fn, lambda_fn=None, channels=None):
    img = load_image(fn)
    if channels is not None:
        img = img[..., 0:channels]
    if lambda_fn is not None:
        img = lambda_fn(img)
    return jnp.asarray(img)


def load_texture2D(fn, lambda_fn=None, channels=None):
    import os
    base, ext = os.path.splitext(fn)
    if os.path.exists(base + "_0" + ext):
        mips = []
        while os.path.exists(base + ("_%d" % len(mips)) + ext):
            mips.append(_to_nhwc(_load_mip2D(base + ("_%d" % len(mips)) + ext,
                                             lambda_fn, channels)))
        return Texture2D(data=mips)
    return Texture2D(data=_to_nhwc(_load_mip2D(fn, lambda_fn, channels)))


def save_texture2D(fn, tex: Texture2D, lambda_fn=None):
    import os

    def _save(path, mip):
        data = np.asarray(lambda_fn(mip) if lambda_fn is not None else mip)
        save_image(path, data)

    if isinstance(tex.data, list):
        base, ext = os.path.splitext(fn)
        for i, mip in enumerate(tex.data):
            _save(base + ("_%d" % i) + ext, mip[0])
    else:
        _save(fn, tex.data[0])
