"""Small vector / image math helpers shared across the framework.

Semantics mirror the reference utilities (/root/reference/render/util.py:20-153)
but are written for JAX: pure functions, NHWC layouts, static shapes.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np


def dot(x, y):
    """Channelwise dot product over the last axis, keepdims."""
    return jnp.sum(x * y, axis=-1, keepdims=True)


def reflect(x, n):
    return 2.0 * dot(x, n) * n - x


def length(x, eps=1e-20):
    # Clamp to avoid NaN gradients: d/dx sqrt(0) = inf.
    return jnp.sqrt(jnp.clip(dot(x, x), min=eps))


def safe_normalize(x, eps=1e-20):
    return x / length(x, eps)


def pixel_grid(width, height, center_x=0.5, center_y=0.5):
    """[H, W, 2] grid of normalized pixel-center coordinates (x, y) in [0,1]."""
    y = (jnp.arange(height, dtype=jnp.float32) + center_y) / height
    x = (jnp.arange(width, dtype=jnp.float32) + center_x) / width
    xx, yy = jnp.meshgrid(x, y)
    return jnp.stack((xx, yy), axis=-1)


# ---------------------------------------------------------------------------
# sRGB transforms
# ---------------------------------------------------------------------------

def _rgb_to_srgb(f):
    return jnp.where(f <= 0.0031308,
                     f * 12.92,
                     jnp.power(jnp.clip(f, min=0.0031308), 1.0 / 2.4) * 1.055 - 0.055)


def rgb_to_srgb(f):
    if f.shape[-1] == 4:
        return jnp.concatenate((_rgb_to_srgb(f[..., 0:3]), f[..., 3:4]), axis=-1)
    return _rgb_to_srgb(f)


def _srgb_to_rgb(f):
    return jnp.where(f <= 0.04045,
                     f / 12.92,
                     jnp.power((jnp.clip(f, min=0.04045) + 0.055) / 1.055, 2.4))


def srgb_to_rgb(f):
    if f.shape[-1] == 4:
        return jnp.concatenate((_srgb_to_rgb(f[..., 0:3]), f[..., 3:4]), axis=-1)
    return _srgb_to_rgb(f)


def reinhard(f):
    return f / (1.0 + f)


# ---------------------------------------------------------------------------
# Metrics (jaxNeRF PSNR convention, /root/reference/render/util.py:123-129)
# ---------------------------------------------------------------------------

def mse_to_psnr(mse):
    return -10.0 / np.log(10.0) * np.log(mse)


def psnr_to_mse(psnr):
    return np.exp(-0.1 * np.log(10.0) * psnr)


# ---------------------------------------------------------------------------
# Image scaling (NHWC)
# ---------------------------------------------------------------------------

def avg_pool_nhwc(x, size):
    """Average pooling with window `size` (int or (h, w))."""
    if isinstance(size, int):
        size = (size, size)
    n, h, w, c = x.shape
    x = x.reshape(n, h // size[0], size[0], w // size[1], size[1], c)
    return x.mean(axis=(2, 4))


def scale_img_nhwc(x, size, mag='bilinear', min='area'):
    """Resize NHWC image to `size` = (H, W).  Minification uses area averaging,
    magnification bilinear (align_corners) or nearest, mirroring the reference
    (/root/reference/render/util.py:138-148)."""
    n, h, w, c = x.shape
    H, W = int(size[0]), int(size[1])
    if h == H and w == W:
        return x
    if h > H and w > W:  # minification
        if min == 'nearest':
            return _nearest_resize(x, H, W)
        if h % H == 0 and w % W == 0:
            return avg_pool_nhwc(x, (h // H, w // W))
        return _area_resize(x, H, W)
    # magnification
    if mag == 'nearest':
        return _nearest_resize(x, H, W)
    return _bilinear_resize_align_corners(x, H, W)


def _nearest_resize(x, H, W):
    n, h, w, c = x.shape
    ri = jnp.clip((jnp.arange(H) * h) // H, 0, h - 1)
    ci = jnp.clip((jnp.arange(W) * w) // W, 0, w - 1)
    return x[:, ri][:, :, ci]


def _bilinear_resize_align_corners(x, H, W):
    n, h, w, c = x.shape
    if h == 1 and w == 1:
        return jnp.broadcast_to(x, (n, H, W, c))
    ys = jnp.linspace(0.0, h - 1.0, H)
    xs = jnp.linspace(0.0, w - 1.0, W)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    fy = (ys - y0)[None, :, None, None]
    fx = (xs - x0)[None, None, :, None]
    a = x[:, y0][:, :, x0]
    b = x[:, y0][:, :, x1]
    cc = x[:, y1][:, :, x0]
    d = x[:, y1][:, :, x1]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
            + cc * fy * (1 - fx) + d * fy * fx)


def _overlap_matrix(out_n, in_n):
    """[out_n, in_n] fractional-overlap weights of output cell i with input
    cell j (each row sums to 1): exact area averaging for any ratio."""
    scale = in_n / out_n
    lo = jnp.arange(out_n)[:, None] * scale        # output cell edges in
    hi = lo + scale                                 # input coordinates
    j0 = jnp.arange(in_n)[None, :]
    ov = jnp.minimum(hi, j0 + 1.0) - jnp.maximum(lo, j0)
    return jnp.clip(ov, 0.0) / scale


def _area_resize(x, H, W):
    """True area-average resize for arbitrary (incl. non-integer) ratios:
    out = Wy @ x @ Wx^T with per-axis overlap-weight matrices (two small
    matmuls — MXU-friendly, matches torch 'area' interpolation)."""
    n, h, w, c = x.shape
    wy = _overlap_matrix(H, h)                      # [H, h]
    wx = _overlap_matrix(W, w)                      # [W, w]
    y = jnp.einsum('Hh,nhwc->nHwc', wy, x)
    return jnp.einsum('Ww,nHwc->nHWc', wx, y)


# ---------------------------------------------------------------------------
# Gaussian dilation for texture seam fill (/root/reference/render/util.py:71-89)
# ---------------------------------------------------------------------------

def dilate(x, x_avg, mask, N):
    """Fill unmasked texels with gaussian-weighted neighborhood average (falls
    back to `x_avg` where the neighborhood is empty)."""
    variance = (1.0 / 2.5) ** 2
    g = jnp.linspace(-1.0, 1.0, N)
    gx, gy = jnp.meshgrid(g, g)
    kern = (0.5 * np.pi * variance) * jnp.exp(-(gx ** 2 + gy ** 2) / (2 * variance))
    kern = kern / jnp.sum(kern)

    def conv(img):  # depthwise NHWC conv with `kern`
        c = img.shape[-1]
        k = kern[:, :, None, None] * jnp.eye(c)[None, None, :, :]
        return jax.lax.conv_general_dilated(
            img, k, window_strides=(1, 1), padding='SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    epsilon = 1e-6
    mask_flt = conv(mask)
    x_flt = conv(x * mask)
    x_flt = jnp.where(mask_flt > epsilon, x_flt / jnp.clip(mask_flt, min=epsilon), x_avg)
    return x_flt * (1 - mask) + x * mask


# ---------------------------------------------------------------------------
# Camera / matrix helpers (host-side numpy; match reference conventions,
# /root/reference/render/util.py:178-254)
# ---------------------------------------------------------------------------

def fovx_to_fovy(fovx, aspect):
    return np.arctan(np.tan(fovx / 2) / aspect) * 2.0


def focal_length_to_fovy(focal_length, sensor_height):
    return 2 * np.arctan(0.5 * sensor_height / focal_length)


def perspective(fovy=0.7854, aspect=1.0, n=0.1, f=1000.0):
    y = np.tan(fovy / 2)
    return np.array([[1 / (y * aspect), 0, 0, 0],
                     [0, 1 / -y, 0, 0],
                     [0, 0, -(f + n) / (f - n), -(2 * f * n) / (f - n)],
                     [0, 0, -1, 0]], dtype=np.float32)


def translate(x, y, z):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = (x, y, z)
    return m


def rotate_x(a):
    s, c = np.sin(a), np.cos(a)
    return np.array([[1, 0, 0, 0], [0, c, s, 0], [0, -s, c, 0], [0, 0, 0, 1]],
                    dtype=np.float32)


def rotate_y(a):
    s, c = np.sin(a), np.cos(a)
    return np.array([[c, 0, s, 0], [0, 1, 0, 0], [-s, 0, c, 0], [0, 0, 0, 1]],
                    dtype=np.float32)


def scale_mtx(s):
    m = np.eye(4, dtype=np.float32)
    m[0, 0] = m[1, 1] = m[2, 2] = s
    return m


def lookAt(eye, at, up):
    eye, at, up = (np.asarray(v, dtype=np.float32) for v in (eye, at, up))
    w = eye - at
    w = w / np.linalg.norm(w)
    u = np.cross(up, w)
    u = u / np.linalg.norm(u)
    v = np.cross(w, u)
    tr = np.eye(4, dtype=np.float32)
    tr[:3, 3] = -eye
    rot = np.eye(4, dtype=np.float32)
    rot[0, :3], rot[1, :3], rot[2, :3] = u, v, w
    return rot @ tr


def random_rotation_translation(t, rng=None):
    rng = rng or np.random
    m = rng.normal(size=[3, 3])
    m[1] = np.cross(m[0], m[2])
    m[2] = np.cross(m[0], m[1])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    m = np.pad(m, [[0, 1], [0, 1]], mode='constant')
    m[3, 3] = 1.0
    m[:3, 3] = rng.uniform(-t, t, size=[3])
    return m.astype(np.float32)


def lines_focal(o, d):
    """Least-squares focal point of a set of lines (o + t*d); used for LLFF
    auto-centering (/root/reference/render/util.py:261-266)."""
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    I = np.eye(3, dtype=o.dtype)
    outer = d[..., :, None] @ d[..., None, :] - I[None]
    S = outer.sum(axis=0)
    C = (outer @ o[..., :, None]).sum(axis=0)[:, 0]
    return np.linalg.pinv(S) @ C


def checkerboard(res, checker_size):
    tiles_y = (res[0] + (checker_size * 2) - 1) // (checker_size * 2)
    tiles_x = (res[1] + (checker_size * 2) - 1) // (checker_size * 2)
    check = np.kron([[1, 0] * tiles_x, [0, 1] * tiles_x] * tiles_y,
                    np.ones((checker_size, checker_size))) * 0.33 + 0.33
    check = check[:res[0], :res[1]]
    return np.stack((check, check, check), axis=-1).astype(np.float32)


def time_to_text(x):
    if x > 3600:
        return "%.2f h" % (x / 3600)
    if x > 60:
        return "%.2f m" % (x / 60)
    return "%.2f s" % x
