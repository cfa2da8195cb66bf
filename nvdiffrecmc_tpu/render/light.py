"""Trainable HDR lat-long environment light with the PDF/CDF tables used by
the Monte-Carlo importance sampler.

Capability parity with /root/reference/render/light.py.  The probe is a plain
JAX array pytree; `update_pdf` is a pure function evaluated (under
stop_gradient) inside the training step each iteration, mirroring
lgt.update_pdf() at train.py:421-422.
"""

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import vecmath
from ..ops.texture import bilinear_sample

LIGHT_MIN_RES = 16
MIN_ROUGHNESS = 0.08
MAX_ROUGHNESS = 0.5


class LightTables(NamedTuple):
    pdf: jnp.ndarray    # [H, W] normalized sampling pdf (sums to 1)
    rows: jnp.ndarray   # [H] row CDF
    cols: jnp.ndarray   # [H, W] per-row column CDFs


def update_pdf(base):
    """Build sampling tables from the probe (reference light.py:46-59):
    pdf = max(base, channel) * sin(theta), normalized; cols = per-row
    cumsum; rows = cumsum of row sums; both CDFs normalized."""
    base = jax.lax.stop_gradient(base)
    H, W = base.shape[0], base.shape[1]
    Y = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
    pdf = jnp.max(base, axis=-1) * jnp.sin(Y * math.pi)[:, None]
    pdf = pdf / jnp.maximum(jnp.sum(pdf), 1e-20)

    cols = jnp.cumsum(pdf, axis=1)
    rows = jnp.cumsum(jnp.repeat(cols[:, -1:], 1, axis=1), axis=0)[:, 0]

    col_tot = cols[:, -1:]
    cols = cols / jnp.where(col_tot > 0, col_tot, 1.0)
    row_tot = rows[-1]
    rows = rows / jnp.where(row_tot > 0, row_tot, 1.0)
    return LightTables(pdf=pdf, rows=rows, cols=cols)


def pdf_scale(base):
    return (base.shape[0] * base.shape[1]) / (2.0 * math.pi * math.pi)


def generate_image(base, res):
    """Bilinear-resampled lat-long image [res0, res1, 3] of the probe."""
    texcoord = vecmath.pixel_grid(res[1], res[0])
    return bilinear_sample(base[None], texcoord[None])[0]


def create_trainable_env_rnd(base_res, scale=0.5, bias=0.25, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.rand(base_res, base_res, 3).astype(np.float32) * scale + bias
    return jnp.asarray(base)


# ---------------------------------------------------------------------------
# Radiance .hdr IO (pure numpy codec — no native plugins required)
# ---------------------------------------------------------------------------

def _read_hdr(path):
    with open(path, 'rb') as f:
        data = f.read()
    if not (data.startswith(b'#?RADIANCE') or data.startswith(b'#?RGBE')):
        raise ValueError('not a Radiance HDR file: %s' % path)
    # header ends at blank line; next line is resolution
    pos = data.find(b'\n\n')
    if pos < 0:
        raise ValueError('bad HDR header')
    res_end = data.find(b'\n', pos + 2)
    res = data[pos + 2:res_end].split()
    if res[0] != b'-Y' or res[2] != b'+X':
        raise ValueError('unsupported HDR orientation %r' % b' '.join(res))
    H, W = int(res[1]), int(res[3])
    payload_bytes = data[res_end + 1:]
    payload = np.frombuffer(payload_bytes, dtype=np.uint8)

    from ..native import hdr_decode_scanlines
    img = hdr_decode_scanlines(payload_bytes, H, W)
    if img is None:
        img = _decode_scanlines_py(payload, H, W)
    rgbe = img.astype(np.float32)
    e = rgbe[..., 3]
    scale = np.where(e > 0, np.ldexp(1.0, e.astype(np.int32) - 136), 0.0)
    # +0.5: mantissas are floor-quantized, decode at bin centers (Radiance
    # colr_color convention)
    return np.where(e[..., None] > 0, (rgbe[..., :3] + 0.5) * scale[..., None],
                    0.0)


def _decode_scanlines_py(payload, H, W):
    """Pure-python fallback scanline decoder."""
    img = np.zeros((H, W, 4), dtype=np.uint8)
    p = 0
    for y in range(H):
        if (payload[p] == 2 and payload[p + 1] == 2
                and (int(payload[p + 2]) << 8 | int(payload[p + 3])) == W):
            # adaptive RLE scanline
            p += 4
            for c in range(4):
                x = 0
                while x < W:
                    cnt = int(payload[p]); p += 1
                    if cnt > 128:  # run
                        img[y, x:x + cnt - 128, c] = payload[p]
                        p += 1
                        x += cnt - 128
                    else:          # literal
                        img[y, x:x + cnt, c] = payload[p:p + cnt]
                        p += cnt
                        x += cnt
        else:  # flat scanline
            img[y] = payload[p:p + 4 * W].reshape(W, 4)
            p += 4 * W
    return img


def _write_hdr(path, img):
    img = np.asarray(img, dtype=np.float32)
    H, W, _ = img.shape
    maxc = np.max(img, axis=-1)
    e = np.zeros((H, W), np.int32)
    m = maxc > 1e-32
    e[m] = np.ceil(np.log2(maxc[m])).astype(np.int32) + 1
    scale = np.ldexp(1.0, -e + 8)
    rgbe = np.zeros((H, W, 4), np.uint8)
    with np.errstate(invalid='ignore'):
        q = np.clip(np.floor(img * scale[..., None]), 0, 255).astype(np.uint8)
    rgbe[..., :3] = np.where(m[..., None], q, 0)
    rgbe[..., 3] = np.where(m, e + 128, 0).astype(np.uint8)
    from ..native import hdr_encode_scanlines
    encoded = hdr_encode_scanlines(rgbe)
    with open(path, 'wb') as f:
        f.write(b'#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n')
        f.write(('-Y %d +X %d\n' % (H, W)).encode())
        f.write(encoded if encoded is not None else rgbe.tobytes())


def load_env(fn, scale=1.0, res=None):
    """Load an .hdr probe, optionally resampled to `res` (clamped >= 1e-4)."""
    import os
    ext = os.path.splitext(fn)[1].lower()
    assert ext == '.hdr', 'Unknown envlight extension %s' % ext
    img = _read_hdr(fn) * scale
    base = jnp.asarray(img, dtype=jnp.float32)
    if res is not None:
        texcoord = vecmath.pixel_grid(res[1], res[0])
        base = jnp.clip(bilinear_sample(base[None], texcoord[None])[0],
                        min=1e-4)
    print("EnvProbe,", base.shape, ", min/max", float(base.min()),
          float(base.max()))
    return base


def save_env_map(fn, base):
    color = generate_image(base, [512, 1024])
    _write_hdr(fn, np.asarray(color))
