"""Mip-mapped texture sampling (the nvdiffrast `dr.texture` capability) in
pure JAX, plus the custom mip-pyramid op with linear-gradient upscaling
(/root/reference/render/texture.py:20-30).

Design notes (TPU-first):
- All mip levels are packed into one flat [sum(Hi*Wi), C] buffer with static
  per-level offsets, so trilinear filtering is 8 dynamic gathers per pixel
  with arithmetically computed indices — no per-level branching, one fused
  XLA gather kernel.
- LOD comes from screen-space uv derivatives and is stop-gradient (selection
  is discrete); gradients flow through the bilinear weights and texel values,
  which is what the reference's texture gradients propagate too.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Mip construction: fwd = 2x2 avg pool, bwd = bilinear-upsampled gradient/4
# ---------------------------------------------------------------------------

@jax.custom_vjp
def texture2d_mip(tex):
    """Downsample [N,H,W,C] by 2x2 average pooling."""
    n, h, w, c = tex.shape
    return tex.reshape(n, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def _mip_fwd(tex):
    return texture2d_mip(tex), tex.shape


def _mip_bwd(shape, dout):
    # Reference backward: bilinear sample of (dout * 0.25) at the fine-pixel
    # centers with clamp boundary (/root/reference/render/texture.py:26-30).
    n, h, w, c = shape
    dh, dw = h // 2, w // 2
    g = dout * 0.25
    # fine pixel centers in coarse texel coordinates
    ys = (jnp.arange(h) + 0.5) / h * dh - 0.5
    xs = (jnp.arange(w) + 0.5) / w * dw - 0.5
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, dh - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, dw - 1)
    y1 = jnp.clip(y0 + 1, 0, dh - 1)
    x1 = jnp.clip(x0 + 1, 0, dw - 1)
    fy = jnp.clip(ys - y0, 0.0, 1.0)[None, :, None, None]
    fx = jnp.clip(xs - x0, 0.0, 1.0)[None, None, :, None]
    a = g[:, y0][:, :, x0]
    b = g[:, y0][:, :, x1]
    cc = g[:, y1][:, :, x0]
    d = g[:, y1][:, :, x1]
    return ((a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
             + cc * fy * (1 - fx) + d * fy * fx),)


texture2d_mip.defvjp(_mip_fwd, _mip_bwd)


def build_mip_chain(tex):
    """List of mips [N,H,W,C] down to 1x1 (requires pow2 square-ish dims)."""
    mips = [tex]
    while mips[-1].shape[1] > 1 and mips[-1].shape[2] > 1:
        mips.append(texture2d_mip(mips[-1]))
    return mips


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------

def _wrap_uv(u, n, mode):
    if mode == 'wrap':
        return jnp.mod(u, n)
    return jnp.clip(u, 0, n - 1)


def bilinear_sample(tex, uv, boundary_mode='wrap'):
    """Sample [N,H,W,C] texture at uv [N,h,w,2] in [0,1] texture coords.

    Matches dr.texture(filter_mode='linear'): texel centers at
    (i+0.5)/W, boundary wrap or clamp."""
    n, H, W, C = tex.shape
    x = uv[..., 0] * W - 0.5
    y = uv[..., 1] * H - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = _wrap_uv(x0f.astype(jnp.int32), W, boundary_mode)
    y0 = _wrap_uv(y0f.astype(jnp.int32), H, boundary_mode)
    x1 = _wrap_uv(x0f.astype(jnp.int32) + 1, W, boundary_mode)
    y1 = _wrap_uv(y0f.astype(jnp.int32) + 1, H, boundary_mode)

    bidx = jnp.arange(n)[:, None, None]
    a = tex[bidx, y0, x0]
    b = tex[bidx, y0, x1]
    c = tex[bidx, y1, x0]
    d = tex[bidx, y1, x1]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
            + c * fy * (1 - fx) + d * fy * fx)


def _pack_mips(mips):
    """Flatten a mip list into ([L, C] packed texels, static offset/size arrays)."""
    n = mips[0].shape[0]
    c = mips[0].shape[3]
    flat = jnp.concatenate([m.reshape(n, -1, c) for m in mips], axis=1)
    sizes = np.array([[m.shape[1], m.shape[2]] for m in mips], dtype=np.int32)
    offsets = np.concatenate([[0], np.cumsum(sizes[:, 0] * sizes[:, 1])])[:-1].astype(np.int32)
    return flat, sizes, offsets


def _bilinear_gather(flat, bidx, off, h, w, x, y, boundary_mode):
    """Bilinear tap into a packed mip level with per-pixel resolution h,w."""
    xs = x * w.astype(jnp.float32) - 0.5
    ys = y * h.astype(jnp.float32) - 0.5
    x0f = jnp.floor(xs)
    y0f = jnp.floor(ys)
    fx = (xs - x0f)[..., None]
    fy = (ys - y0f)[..., None]
    if boundary_mode == 'wrap':
        x0 = jnp.mod(x0f.astype(jnp.int32), w)
        x1 = jnp.mod(x0f.astype(jnp.int32) + 1, w)
        y0 = jnp.mod(y0f.astype(jnp.int32), h)
        y1 = jnp.mod(y0f.astype(jnp.int32) + 1, h)
    else:
        x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
        x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w - 1)
        y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
        y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h - 1)
    i00 = off + y0 * w + x0
    i01 = off + y0 * w + x1
    i10 = off + y1 * w + x0
    i11 = off + y1 * w + x1
    a = flat[bidx, i00]
    b = flat[bidx, i01]
    c = flat[bidx, i10]
    d = flat[bidx, i11]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
            + c * fy * (1 - fx) + d * fy * fx)


def texture_sample(mips, uv, uv_da=None, filter_mode='linear-mipmap-linear',
                   boundary_mode='wrap'):
    """Trilinear mip-mapped texture sampling.

    mips: list of [N,H,W,C]; uv: [N,h,w,2]; uv_da: [N,h,w,4] screen-space
    derivatives (du/dX, dv/dX, du/dY, dv/dY).  Returns [N,h,w,C]."""
    if filter_mode == 'linear' or len(mips) == 1 or uv_da is None:
        return bilinear_sample(mips[0], uv, boundary_mode)

    n, H, W, C = mips[0].shape
    n_levels = len(mips)

    # LOD from the longer of the two screen-space footprint axes.
    dx = jnp.stack([uv_da[..., 0] * W, uv_da[..., 1] * H], axis=-1)
    dy = jnp.stack([uv_da[..., 2] * W, uv_da[..., 3] * H], axis=-1)
    footprint = jnp.maximum(jnp.sum(dx * dx, -1), jnp.sum(dy * dy, -1))
    lod = 0.5 * jnp.log2(jnp.clip(footprint, min=1e-20))
    lod = jax.lax.stop_gradient(jnp.clip(lod, 0.0, n_levels - 1.0))

    l0 = jnp.floor(lod).astype(jnp.int32)
    l0 = jnp.clip(l0, 0, n_levels - 1)
    l1 = jnp.clip(l0 + 1, 0, n_levels - 1)
    frac = (lod - l0.astype(jnp.float32))[..., None]

    flat, sizes, offsets = _pack_mips(mips)
    sizes_j = jnp.asarray(sizes)
    offsets_j = jnp.asarray(offsets)

    bidx = jnp.arange(n)[:, None, None]
    x, y = uv[..., 0], uv[..., 1]

    def level_tap(lvl):
        h = sizes_j[lvl, 0]
        w = sizes_j[lvl, 1]
        off = offsets_j[lvl]
        return _bilinear_gather(flat, bidx, off, h, w, x, y, boundary_mode)

    c0 = level_tap(l0)
    c1 = level_tap(l1)
    return c0 * (1 - frac) + c1 * frac


def texture_sample_multi(mips_list, uv, uv_da=None,
                         filter_mode='linear-mipmap-linear',
                         boundary_mode='wrap'):
    """Sample several same-resolution mip pyramids with ONE tap set.

    The trilinear tap indices and weights depend only on (uv, uv_da), so
    channel-concatenating the pyramids makes the whole multi-texture sample
    a single gather — and, critically, its backward a single scatter-add
    into the packed pyramid instead of one scatter set per texture (XLA
    scatters are serial on TPU; measured 253 ms -> ~90 ms per train step at
    512^2 screen, 3x 1024^2 textures).

    mips_list: list of mip lists, all with identical level resolutions.
    Returns a list of sampled [N,h,w,C_i], one per input pyramid.
    """
    chans = [m[0].shape[-1] for m in mips_list]
    cat = [jnp.concatenate([m[k] for m in mips_list], axis=-1)
           for k in range(len(mips_list[0]))]
    out = texture_sample(cat, uv, uv_da, filter_mode, boundary_mode)
    offs = np.concatenate([[0], np.cumsum(chans)])
    return [out[..., offs[i]:offs[i + 1]] for i in range(len(mips_list))]
