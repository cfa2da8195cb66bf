"""Pallas TPU kernel for the cross-bilateral denoiser.

The jnp stencil in denoiser.py expresses the (2R+1)^2 = 529 tap loop as a
fori_loop of dynamic slices; XLA materializes every tap's shifted reads from
HBM (~59 ms per 512^2 call, measured).  This kernel keeps a row-window of all
input planes VMEM-resident so the whole tap loop runs out of VMEM: each
program DMAs a [56, Wpad] halo window (R = 11 rows/cols), loops fy
dynamically, and unrolls fx statically (static lane offsets — Mosaic
requires lane-dim slice offsets to be static; sublane offsets may be
dynamic).

Semantics are identical to denoiser._taps (same weights, same clamp/eps
choices, the same transposed-denominator backward of the reference's
denoising.cu:114-118), checked by tests against the roll-based oracle.

Both denoised buffers of a shade (demodulated diffuse + specular) share the
same auxiliary planes, so the pair is fused into one kernel launch: weights
are computed once and applied to 6 color channels (the reference launches
its CUDA kernel twice, ops.py:139-141 — sharing is free speed on a
bandwidth-bound stencil).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .denoiser import FLT_EPS, _max_radius

R = _max_radius()          # 11
K = 2 * R + 1              # 23
TH = 16                    # output rows per program (TH=32 tripped the 16 MB
                           # scoped-VMEM ceiling: 23 unrolled fx temporaries)
WIN = TH + 2 * R + 2       # DMA window rows (40; +2 pads to a multiple of 8)


def _pow128(x):
    # x ** 128 via 7 squarings (transcendental pow is ~10x more VPU cycles)
    for _ in range(7):
        x = x * x
    return x


def _denoise_kernel(planes_hbm, sig_ref, out_ref, win, sem, *, CC, W, Wpad,
                    n_rb, grad_mode):
    """planes_hbm [N, NP, Hp, Wpad]: plane order = CC color (or out-grad)
    planes, nrm x3, z, dz, valid.  out [G, CC+1, TH, Wpad]; the +1 plane is
    the weight sum (garbage in grad mode, sliced off by the caller)."""
    i = pl.program_id(0)
    n = jax.lax.div(i, n_rb)
    rb = jax.lax.rem(i, n_rb)

    cp = pltpu.make_async_copy(
        planes_hbm.at[n, :, pl.ds(rb * TH, WIN), :], win, sem)
    cp.start()

    sigma = sig_ref[0, 0]
    variance = sigma * sigma
    dyn_rad = 2.0 * jnp.ceil(sigma * 2.5) + 1.0

    cp.wait()
    NP = win.shape[0]
    w_all = win[:]                                # [NP, WIN, Wpad]
    # Row selection must not use dynamic sublane slicing (Mosaic requires
    # provably 8-aligned starts); pltpu.roll supports dynamic shifts, so
    # "rows [kf, kf+TH)" becomes roll-up-by-kf + static [0:TH) slice.
    # roll semantics: out[i] = x[(i - shift) mod n]; "rows + k" needs
    # shift = WIN - k (non-negative, as pltpu.roll requires)
    c = pltpu.roll(w_all, shift=WIN - R, axis=1)[:, 0:TH, :]  # center rows
    c_nrm = (c[CC + 0], c[CC + 1], c[CC + 2])
    c_z = c[CC + 3]
    c_dz = c[CC + 4]

    x0 = R                                        # center lane offset

    def slc(p2d, fx):
        # fx is a Python int: basic (static) slicing only — Mosaic has no
        # dynamic_slice lowering for values
        return p2d[:, x0 + fx:x0 + fx + W]

    def fy_body(kf, acc):
        fy = kf - R
        fyf = fy.astype(jnp.float32)
        t = pltpu.roll(w_all, shift=WIN - kf, axis=1)[:, 0:TH, :]  # rows+fy

        def one_fx(fx, acc):
            dist_sqr = fyf * fyf + float(fx * fx)
            dist = jnp.sqrt(dist_sqr)
            live = ((jnp.abs(float(fx)) <= dyn_rad)
                    & (jnp.abs(fyf) <= dyn_rad))
            gate = jnp.where(live, 1.0, 0.0)
            wxy_exp = -dist_sqr / (2.0 * variance)

            ndot = (slc(t[CC + 0], fx) * c_nrm[0][:, x0:x0 + W]
                    + slc(t[CC + 1], fx) * c_nrm[1][:, x0:x0 + W]
                    + slc(t[CC + 2], fx) * c_nrm[2][:, x0:x0 + W])
            w_n = _pow128(jnp.clip(ndot, FLT_EPS, 1.0))
            if grad_mode:
                # transposed depth denominator (denoising.cu:118)
                denom = jnp.maximum(slc(t[CC + 4], fx) * dist, FLT_EPS)
            else:
                denom = jnp.maximum(c_dz[:, x0:x0 + W] * dist, FLT_EPS)
            darg = -jnp.abs(slc(t[CC + 3], fx) - c_z[:, x0:x0 + W]) / denom
            w = (jnp.exp(wxy_exp + darg) * w_n * slc(t[CC + 5], fx)
                 * gate)
            accs = [a + w * slc(t[cc], fx) for cc, a in
                    zip(range(CC), acc[:-1])]
            return accs + [acc[-1] + w]

        for fx in range(-R, R + 1):
            acc = one_fx(fx, acc)
        return acc

    z = jnp.zeros((TH, W), jnp.float32)
    acc = jax.lax.fori_loop(0, K, fy_body, [z] * (CC + 1))
    for cc in range(CC + 1):
        out_ref[0, cc, :, :W] = acc[cc]


def _pad_planes(planes, H, W, n_rb):
    """[N, NP, H, W] -> [N, NP, Hp, Wpad] with R-pad + window slack; the
    valid plane must be appended by the caller BEFORE padding (zeros pad)."""
    Hp = n_rb * TH + WIN - TH                    # covers every DMA window
    Wpad = ((W + 2 * R + 127) // 128) * 128
    return jnp.pad(planes, ((0, 0), (0, 0), (R, Hp - H - R),
                            (R, Wpad - W - R)))


@functools.partial(jax.jit, static_argnames=('grad_mode', 'interpret'))
def _denoise_call(cols, nrm, zdz, sigma, grad_mode=False, interpret=False):
    """cols [N, H, W, CC] (colors fwd / out-grads bwd); nrm [N, H, W, 3];
    zdz [N, H, W, 2].  Returns [N, H, W, CC+1] premultiplied accumulators
    (last channel = weight sum; meaningless in grad mode)."""
    N, H, W, CC = cols.shape
    n_rb = (H + TH - 1) // TH
    valid = jnp.ones((N, 1, H, W), jnp.float32)
    planes = jnp.concatenate(
        [cols.transpose(0, 3, 1, 2), nrm.transpose(0, 3, 1, 2),
         zdz.transpose(0, 3, 1, 2), valid], axis=1)
    planes = _pad_planes(planes, H, W, n_rb)
    NP, Hp, Wpad = planes.shape[1:]

    sig = jnp.full((8, 128), sigma, jnp.float32)
    G = N * n_rb
    out = pl.pallas_call(
        functools.partial(_denoise_kernel, CC=CC, W=W, Wpad=Wpad,
                          n_rb=n_rb, grad_mode=grad_mode),
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CC + 1, TH, Wpad), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, CC + 1, TH, Wpad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NP, WIN, Wpad), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(planes, sig)

    out = out.reshape(N, n_rb, CC + 1, TH, Wpad)[:, :, :, :, :W]
    out = out.transpose(0, 1, 3, 4, 2).reshape(N, n_rb * TH, W, CC + 1)
    return out[:, :H]


def _use_pallas():
    return jax.default_backend() == 'tpu'


@jax.custom_vjp
def _premul_pair(col6, nrm, zdz, sigma):
    return _premul_pair_fwd_impl(col6, nrm, zdz, sigma)


def _premul_pair_fwd_impl(col6, nrm, zdz, sigma):
    if _use_pallas():
        return _denoise_call(col6, nrm, zdz, sigma)
    from .denoiser import _taps
    a, w = _taps(col6[..., 0:3], nrm, zdz, sigma, grad_mode=False)
    b, _ = _taps(col6[..., 3:6], nrm, zdz, sigma, grad_mode=False)
    return jnp.concatenate([a, b, w], axis=-1)


def _premul_pair_fwd(col6, nrm, zdz, sigma):
    return _premul_pair_fwd_impl(col6, nrm, zdz, sigma), (nrm, zdz, sigma)


def _premul_pair_bwd(res, dout):
    nrm, zdz, sigma = res
    g6 = dout[..., 0:6]
    # the weight-sum cotangent dout[..., 6] is dropped deliberately: weights
    # (and their sum) carry no color dependence, and the reference's
    # backward propagates into color only (denoising.cu:96-130)
    if _use_pallas():
        grad = _denoise_call(g6, nrm, zdz, sigma, grad_mode=True)[..., 0:6]
    else:
        from .denoiser import _taps
        ga, _ = _taps(g6[..., 0:3], nrm, zdz, sigma, grad_mode=True,
                      out_grad=g6[..., 0:3])
        gb, _ = _taps(g6[..., 3:6], nrm, zdz, sigma, grad_mode=True,
                      out_grad=g6[..., 3:6])
        grad = jnp.concatenate([ga, gb], axis=-1)
    return grad, None, None, None


_premul_pair.defvjp(_premul_pair_fwd, _premul_pair_bwd)


def bilateral_denoiser_pair(col_a, col_b, nrm, zdz, sigma):
    """Denoise two color buffers sharing guide planes (demodulated diffuse +
    specular, render.py shade) with one fused kernel launch.  Exact same
    per-buffer result as denoiser.bilateral_denoiser."""
    cw = _premul_pair(jnp.concatenate([col_a, col_b], axis=-1),
                      nrm, zdz, sigma)
    w = jnp.maximum(cw[..., 6:7], 1e-4)
    return cw[..., 0:3] / w, cw[..., 3:6] / w
