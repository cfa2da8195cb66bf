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

from nvdiffrecmc_tpu.ops import pallas_scatter


def _scatter_rows(idx, rows, out_rows):
    """Scatter-add [M, K] rows at idx into a fresh [out_rows, K] array.

    TPU: binned Pallas kernel in the transposed [K, M] convention (XLA TPU
    scatter is serial per row, ~95 ns; the kernel is ~5x faster at the
    texture-adjoint scale).  CPU: XLA scatter twin."""
    dt = rows.dtype
    out_t = pallas_scatter.scatter_add_t(
        idx, rows.astype(jnp.float32).T, out_rows)
    return out_t.T.astype(dt)


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


def _tap_indices(x, y, h, w, boundary_mode):
    """Bilinear tap corner indices + fractional weights at per-pixel level
    resolution (h, w) — shared by forward and the patch-scatter backward so
    both sides compute bit-identical index math."""
    xs = x * jnp.asarray(w, jnp.float32) - 0.5
    ys = y * jnp.asarray(h, jnp.float32) - 0.5
    x0f = jnp.floor(xs)
    y0f = jnp.floor(ys)
    fx = (xs - x0f)[..., None]
    fy = (ys - y0f)[..., None]
    x0 = _wrap_uv(x0f.astype(jnp.int32), w, boundary_mode)
    y0 = _wrap_uv(y0f.astype(jnp.int32), h, boundary_mode)
    x1 = _wrap_uv(x0f.astype(jnp.int32) + 1, w, boundary_mode)
    y1 = _wrap_uv(y0f.astype(jnp.int32) + 1, h, boundary_mode)
    return x0, x1, y0, y1, fx, fy


# ---------------------------------------------------------------------------
# Patch-scatter adjoint machinery.
#
# The VJP of a bilinear tap w.r.t. the texture is 4 scatter-adds (one per
# corner).  XLA TPU scatter is effectively serial (~70-95 ns/row measured on
# v5e), so per-row cost dominates: 8 taps/pixel at 512^2 = 2.1M rows = ~150
# ms/train-step.  But the 4 corners of one pixel's tap form a 2x2 patch at
# base (y0, x0): scatter ONE row of 4C channels [g00|g01|g10|g11] at i00,
# then redistribute the g01/g10/g11 groups with dense jnp.roll shifts on the
# 2D level grid (+1 in x / y / both).  roll IS the wrap-mode index map
# (x1 = (x0+1) mod w); clamp mode folds the rolled-out border line back onto
# the last row/col (x1 = min(x0+1, w-1) keeps border contributions in
# place).  4x fewer scatter rows, and the rolls are bandwidth-cheap.
# ---------------------------------------------------------------------------

def _patch_rows(g, fx, fy, tap, boundary_mode):
    """[...,4C] corner-group row for the patch scatter: order g00|g01|g10|g11.

    The group positions are decoded by +1 rolls, which assumes x1 = x0+1 /
    y1 = y0+1 (mod size).  Wrap satisfies that except at size 1, where the
    roll is an identity onto the right texel anyway.  Clamp violates it on
    both clamped sides (x1 == x0 there), so merge the co-located corner
    groups into the lower group before scattering."""
    g00 = g * (1 - fy) * (1 - fx)
    g01 = g * (1 - fy) * fx
    g10 = g * fy * (1 - fx)
    g11 = g * fy * fx
    if boundary_mode != 'wrap':
        x0, x1, y0, y1 = tap
        mx = (x1 == x0)[..., None].astype(g.dtype)
        my = (y1 == y0)[..., None].astype(g.dtype)
        g00 = g00 + g01 * mx + g10 * my + g11 * mx * my
        g01, g10, g11 = (g01 * (1 - mx) + g11 * (1 - mx) * my,
                         g10 * (1 - my) + g11 * mx * (1 - my),
                         g11 * (1 - mx) * (1 - my))
    return jnp.concatenate([g00, g01, g10, g11], axis=-1)


def _unpatch_level(v):
    """Combine the 4 corner groups of a [N,h,w,4C] patch grid into [N,h,w,C]
    via +1 rolls (the exact inverse of the i00-anchored patch encoding)."""
    C = v.shape[-1] // 4
    return (v[..., :C]
            + jnp.roll(v[..., C:2 * C], 1, axis=2)
            + jnp.roll(v[..., 2 * C:3 * C], 1, axis=1)
            + jnp.roll(v[..., 3 * C:], (1, 1), axis=(1, 2)))


def _duv_terms(dout, a, b, c, d, fx, fy, h, w):
    """uv cotangent of one bilinear tap (chain through fx = x*w-0.5 - floor)."""
    gx = jnp.sum(dout * ((b - a) * (1 - fy) + (d - c) * fy), axis=-1)
    gy = jnp.sum(dout * ((c - a) * (1 - fx) + (d - b) * fx), axis=-1)
    return gx * jnp.asarray(w, jnp.float32), gy * jnp.asarray(h, jnp.float32)


def _patch_tex(tex, boundary_mode):
    """[N,H,W,4C] corner-patch view of a texture: channel groups are
    [v(y,x) | v(y,x+1) | v(y+1,x) | v(y+1,x+1)] with the wrap/clamp
    boundary baked in.  Built with rolls / clamped concats (streaming), so
    ONE gather row at (y0, x0) fetches all 4 corners of a bilinear tap —
    gathers are HBM-latency-bound per ROW, so this quarters the tap cost
    (measured 58 ms -> ~13 ms of jitter taps in the pass-2 step)."""
    if boundary_mode == 'wrap':
        sx = jnp.roll(tex, -1, axis=2)
        sy = jnp.roll(tex, -1, axis=1)
        sxy = jnp.roll(sy, -1, axis=2)
    else:
        sx = jnp.concatenate([tex[:, :, 1:], tex[:, :, -1:]], axis=2)
        sy = jnp.concatenate([tex[:, 1:], tex[:, -1:]], axis=1)
        sxy = jnp.concatenate([sy[:, :, 1:], sy[:, :, -1:]], axis=2)
    return jnp.concatenate([tex, sx, sy, sxy], axis=-1)


def bilinear_sample(tex, uv, boundary_mode='wrap'):
    """Sample [N,H,W,C] texture at uv [N,h,w,2] in [0,1] texture coords.

    Matches dr.texture(filter_mode='linear'): texel centers at (i+0.5)/W,
    boundary wrap or clamp.  Forward is one patch gather; the texture
    cotangent flows through rows_gather's binned pallas scatter and the
    patch view's roll/concat adjoints (same math as a hand-written
    4-corner scatter, all streaming)."""
    from . import pallas_scatter
    n, H, W, C = tex.shape
    x0, x1, y0, y1, fx, fy = _tap_indices(uv[..., 0], uv[..., 1], H, W,
                                          boundary_mode)
    # Collapsed taps (clamp mode beyond the border: true x1 == x0) must
    # ignore the patch's +1 neighbor — zero the fraction instead.
    fx = jnp.where((x1 == x0)[..., None], 0.0, fx)
    fy = jnp.where((y1 == y0)[..., None], 0.0, fy)
    pt = _patch_tex(tex, boundary_mode).reshape(n * H * W, 4 * C)
    rows = jnp.arange(n)[:, None, None] * (H * W) + y0 * W + x0
    abcd = pallas_scatter.rows_gather(pt, rows)        # [n,h,w,4C]
    a, b = abcd[..., 0 * C:1 * C], abcd[..., 1 * C:2 * C]
    c, d = abcd[..., 2 * C:3 * C], abcd[..., 3 * C:4 * C]
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


def _pack_mips_patched(flat, sizes, offsets, boundary_mode):
    """[N,L,4C] corner-patched view of a packed pyramid: each level patched
    independently (its own wrap/clamp boundary)."""
    n, L, C = flat.shape
    parts = []
    for li, (h, w) in enumerate(sizes):
        off = offsets[li]
        lvl = flat[:, off:off + h * w].reshape(n, h, w, C)
        parts.append(_patch_tex(lvl, boundary_mode).reshape(n, h * w, 4 * C))
    return jnp.concatenate(parts, axis=1)


def _level_corners(flat_p, bidx, off, h, w, x, y, boundary_mode):
    """Gather the 4 bilinear corners of a packed-pyramid level tap with ONE
    patch-row gather (gathers are latency-bound per row; 4 separate corner
    gathers cost 4x).  Collapsed taps (clamp beyond the border, where the
    true x1 == x0) are corrected back to the original corner reads so the
    blend AND the uv-cotangent terms stay exact."""
    C4 = flat_p.shape[-1]
    C = C4 // 4
    x0, x1, y0, y1, fx, fy = _tap_indices(x, y, h, w, boundary_mode)
    i00 = off + y0 * w + x0
    row = flat_p[bidx, i00]                            # [..., 4C]
    a, b = row[..., 0 * C:1 * C], row[..., 1 * C:2 * C]
    c, d = row[..., 2 * C:3 * C], row[..., 3 * C:4 * C]
    if boundary_mode != 'wrap':
        mx = (x1 == x0)[..., None]
        my = (y1 == y0)[..., None]
        b = jnp.where(mx, a, b)
        c = jnp.where(my, a, c)
        d = jnp.where(mx, c, jnp.where(my, b, d))
    return a, b, c, d, fx, fy, (i00, (x0, x1, y0, y1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _trilinear_packed(sizes, offsets, boundary_mode, flat, uv, l0f, l1f,
                      frac):
    """Trilinear sample of a packed mip pyramid [N,L,C].

    sizes/offsets are static tuples; l0f/l1f are the (stop-gradient) mip
    levels as float arrays, frac the level blend.  Backward produces the
    texture cotangent with the patch-scatter adjoint: one 4C-channel row
    scatter per level tap + per-level rolls, instead of 8 row scatter-adds
    (the reference does this adjoint with atomics in
    /root/reference/render/renderutils/c_src/texture.cu's MipGrad path;
    serial TPU scatter rows are the analogous cost here)."""
    out, _ = _trilinear_impl(sizes, offsets, boundary_mode, flat, uv,
                             l0f, l1f, frac)
    return out


def _trilinear_impl(sizes, offsets, boundary_mode, flat, uv, l0f, l1f, frac):
    n = flat.shape[0]
    sizes_j = jnp.asarray(np.asarray(sizes, np.int32))
    offsets_j = jnp.asarray(np.asarray(offsets, np.int32))
    bidx = jnp.arange(n)[:, None, None]
    x, y = uv[..., 0], uv[..., 1]
    flat_p = _pack_mips_patched(flat, sizes, offsets, boundary_mode)
    taps = []
    for lf in (l0f, l1f):
        lvl = lf.astype(jnp.int32)
        h = sizes_j[lvl, 0]
        w = sizes_j[lvl, 1]
        off = offsets_j[lvl]
        taps.append(_level_corners(flat_p, bidx, off, h, w, x, y,
                                   boundary_mode))
    def blend(t):
        a, b, c, d, fx, fy = t[:6]
        return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
                + c * fy * (1 - fx) + d * fy * fx)
    out = blend(taps[0]) * (1 - frac) + blend(taps[1]) * frac
    return out, taps


def _trilinear_fwd(sizes, offsets, boundary_mode, flat, uv, l0f, l1f, frac):
    out, _ = _trilinear_impl(sizes, offsets, boundary_mode, flat, uv,
                             l0f, l1f, frac)
    return out, (flat, uv, l0f, l1f, frac)


def _trilinear_bwd(sizes, offsets, boundary_mode, res, dout):
    flat, uv, l0f, l1f, frac = res
    n, L, C = flat.shape
    # recompute index math + corner gathers (gathers are ~20x cheaper than
    # scatters on TPU; residual-storing them would cost more HBM traffic at
    # nerf scale than this recompute)
    _, taps = _trilinear_impl(sizes, offsets, boundary_mode, flat, uv,
                              l0f, l1f, frac)
    sizes_j = jnp.asarray(np.asarray(sizes, np.int32))
    bidx = jnp.arange(n)[:, None, None]
    d_uv_x = 0.0
    d_uv_y = 0.0
    idx_all, rows_all = [], []
    for tap, lf, wl in ((taps[0], l0f, 1 - frac), (taps[1], l1f, frac)):
        a, b, c, d, fx, fy, (i00, corners) = tap
        lvl = lf.astype(jnp.int32)
        h = sizes_j[lvl, 0]
        w = sizes_j[lvl, 1]
        g = dout * wl
        gx, gy = _duv_terms(g, a, b, c, d, fx, fy, h, w)
        d_uv_x = d_uv_x + gx
        d_uv_y = d_uv_y + gy
        tex_b = jnp.broadcast_to(bidx, i00.shape)
        idx_all.append((tex_b * L + i00).reshape(-1))
        rows_all.append(_patch_rows(g, fx, fy, corners, boundary_mode)
                        .reshape(-1, 4 * C))
    s = _scatter_rows(jnp.concatenate(idx_all),
                      jnp.concatenate(rows_all, axis=0), n * L)
    s = s.reshape(n, L, 4 * C)
    parts = []
    for li, (h, w) in enumerate(sizes):
        off = offsets[li]
        v = s[:, off:off + h * w].reshape(n, h, w, 4 * C)
        parts.append(_unpatch_level(v).reshape(n, h * w, C))
    d_flat = jnp.concatenate(parts, axis=1)
    d_uv = jnp.stack([d_uv_x, d_uv_y], axis=-1)
    return (d_flat, d_uv, jnp.zeros_like(l0f), jnp.zeros_like(l1f),
            jnp.zeros_like(frac))


_trilinear_packed.defvjp(_trilinear_fwd, _trilinear_bwd)


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
    return _trilinear_packed(tuple(map(tuple, sizes.tolist())),
                             tuple(int(o) for o in offsets),
                             boundary_mode, flat, uv,
                             l0.astype(jnp.float32), l1.astype(jnp.float32),
                             frac)


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
