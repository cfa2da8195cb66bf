"""Differentiable cross-bilateral denoiser (SVGF-flavored, no temporal or
variance terms) — capability of
/root/reference/render/optixutils/c_src/denoising.cu:14-130 and
/root/reference/denoiser/denoiser.py.

Forward: weights = gaussian(xy; sigma) * pow(clamp(dot(n_tap, n_center)), 128)
* exp(-|z_tap - z_center| / max(c_dz * dist, eps)); output premultiplied
color+weight, normalized by the caller.

Backward (custom VJP): gradients propagate ONLY into color (weights constant),
with the depth-weight denominator transposed center<->tap for adjoint
correctness (denoising.cu:114-118).

TPU design: the (2r+1)^2 tap loop is expressed as shifted adds over padded
NHWC arrays (pure VPU, fully fused by XLA).  The filter radius follows
sigma = max(2*influence, 1e-4) -> radius = 2*ceil(2.5*sigma)+1; since sigma is
a traced value, we compute with a static MAX_RADIUS stencil and zero taps
outside the dynamic radius, keeping one compiled program for the whole
training run (sigma ramps over iterations, dmtet.py:220-221).
"""

from functools import partial

import jax
import jax.numpy as jnp

FLT_EPS = 1e-4
MAX_SIGMA = 2.0  # sigma = max(2 * influence, eps), influence <= 1


def _max_radius(max_sigma=MAX_SIGMA):
    import math
    return 2 * math.ceil(max_sigma * 2.5) + 1  # = 11


def _taps(col, nrm, zdz, sigma, grad_mode, out_grad=None):
    """Shared tap loop.  grad_mode=False: returns (accum_col, accum_w).
    grad_mode=True: returns accum of w_transposed * out_grad taps."""
    N, H, W, _ = col.shape
    R = _max_radius()
    variance = sigma * sigma
    dyn_rad = 2.0 * jnp.ceil(sigma * 2.5) + 1.0

    pad = [(0, 0), (R, R), (R, R), (0, 0)]
    colp = jnp.pad(col, pad)
    nrmp = jnp.pad(nrm, pad)
    zdzp = jnp.pad(zdz, pad)
    validp = jnp.pad(jnp.ones((N, H, W, 1), col.dtype), pad)
    if grad_mode:
        gp = jnp.pad(out_grad, pad)

    c_nrm = nrm
    c_zdz = zdz
    K = 2 * R + 1

    def tap(k, carry):
        acc_col, acc_w = carry
        fy = k // K - R
        fx = k % K - R
        dist_sqr = (fx * fx + fy * fy).astype(col.dtype)
        dist = jnp.sqrt(dist_sqr)
        y0, x0 = fy + R, fx + R
        t_col = jax.lax.dynamic_slice(colp, (0, y0, x0, 0), col.shape)
        t_nrm = jax.lax.dynamic_slice(nrmp, (0, y0, x0, 0), nrm.shape)
        t_zdz = jax.lax.dynamic_slice(zdzp, (0, y0, x0, 0), zdz.shape)
        t_valid = jax.lax.dynamic_slice(validp, (0, y0, x0, 0), (N, H, W, 1))

        w_xy = jnp.exp(-dist_sqr / (2.0 * variance))
        w_xy = jnp.where((jnp.abs(fx) <= dyn_rad) & (jnp.abs(fy) <= dyn_rad),
                         w_xy, 0.0)
        ndot = jnp.sum(t_nrm * c_nrm, -1, keepdims=True)
        w_normal = jnp.clip(ndot, FLT_EPS, 1.0) ** 128.0
        if grad_mode:
            # transposed depth denominator: tap's dz (denoising.cu:118)
            denom = jnp.maximum(t_zdz[..., 1:2] * dist, FLT_EPS)
        else:
            denom = jnp.maximum(c_zdz[..., 1:2] * dist, FLT_EPS)
        w_depth = jnp.exp(-jnp.abs(t_zdz[..., 0:1] - c_zdz[..., 0:1]) / denom)
        w = w_xy * w_normal * w_depth * t_valid

        if grad_mode:
            t_g = jax.lax.dynamic_slice(gp, (0, y0, x0, 0), col.shape)
            acc_col = acc_col + w * t_g
        else:
            acc_col = acc_col + t_col * w
            acc_w = acc_w + w
        return acc_col, acc_w

    init = (jnp.zeros_like(col), jnp.zeros((N, H, W, 1), col.dtype))
    return jax.lax.fori_loop(0, K * K, tap, init)


@jax.custom_vjp
def _bilateral_premul(col, nrm, zdz, sigma):
    acc_col, acc_w = _taps(col, nrm, zdz, sigma, grad_mode=False)
    return jnp.concatenate([acc_col, jnp.maximum(acc_w, 1e-4)], axis=-1)


def _fwd(col, nrm, zdz, sigma):
    return _bilateral_premul(col, nrm, zdz, sigma), (col, nrm, zdz, sigma)


def _bwd(res, dout):
    col, nrm, zdz, sigma = res
    col_grad, _ = _taps(col, nrm, zdz, sigma, grad_mode=True,
                        out_grad=dout[..., 0:3])
    return col_grad, None, None, None


_bilateral_premul.defvjp(_fwd, _bwd)


def bilateral_denoiser(col, nrm, zdz, sigma):
    """col [N,H,W,3], nrm [N,H,W,3], zdz [N,H,W,2], sigma scalar.
    Returns denoised color [N,H,W,3] (normalized), matching
    /root/reference/render/optixutils/ops.py:139-141."""
    col_w = _bilateral_premul(col, nrm, zdz, sigma)
    return col_w[..., 0:3] / col_w[..., 3:4]


def denoise(input_nhwc, sigma):
    """Reference BilateralDenoiser.forward: input = cat(col|nrm|zdz) 8ch
    (/root/reference/denoiser/denoiser.py:24-31)."""
    col = input_nhwc[..., 0:3]
    nrm = input_nhwc[..., 3:6]
    zdz = input_nhwc[..., 6:8]
    return bilateral_denoiser(col, nrm, zdz, sigma)


def sigma_from_influence(f):
    return jnp.maximum(2.0 * f, 1e-4)


def bilateral_reference_jnp(col, nrm, zdz, sigma):
    """Independent roll-based twin (port of the reference's own test oracle
    pattern, filter_test.py:31-74) for unit tests."""
    import math
    R = 2 * math.ceil(float(sigma) * 2.5) + 1
    variance = float(sigma) ** 2
    acc = jnp.zeros_like(col)
    accw = jnp.zeros_like(col[..., :1])
    for fy in range(-R, R + 1):
        for fx in range(-R, R + 1):
            t_col = jnp.roll(col, (-fy, -fx), axis=(1, 2))
            t_nrm = jnp.roll(nrm, (-fy, -fx), axis=(1, 2))
            t_zdz = jnp.roll(zdz, (-fy, -fx), axis=(1, 2))
            inside = jnp.ones_like(col[..., :1])
            H, W = col.shape[1:3]
            ys = jnp.arange(H)[None, :, None, None]
            xs = jnp.arange(W)[None, None, :, None]
            inside = ((ys + fy >= 0) & (ys + fy < H)
                      & (xs + fx >= 0) & (xs + fx < W)).astype(col.dtype)
            dist_sqr = fx * fx + fy * fy
            dist = dist_sqr ** 0.5
            w_xy = math.exp(-dist_sqr / (2 * variance))
            w_n = jnp.clip(jnp.sum(t_nrm * nrm, -1, keepdims=True),
                           FLT_EPS, 1.0) ** 128
            w_d = jnp.exp(-jnp.abs(t_zdz[..., :1] - zdz[..., :1])
                          / jnp.maximum(zdz[..., 1:2] * dist, FLT_EPS))
            w = w_xy * w_n * w_d * inside
            acc = acc + t_col * w
            accw = accw + w
    return acc / jnp.maximum(accw, 1e-4)
