"""Monte-Carlo environment shading with light/BSDF multiple importance
sampling and traced shadow rays — the TPU-native equivalent of the OptiX
env-shade kernel (/root/reference/render/optixutils/c_src/envsampling/
kernel.cu:463-542).

Per unmasked pixel and per stratified sample: draw one light-importance
sample (inverse-CDF over the lat-long probe) and one BSDF sample
(cosine or GGX-VNDF lobe), weight each by the one-sample MIS balance
heuristic 1/(pdf_light+pdf_bsdf), trace a shadow ray for each, and
accumulate *demodulated* diffuse (kd-free Lambert) and specular radiance.

Differentiation strategy (replay backward, matching the reference's
seed-replay adjoint): the whole stratum loop is a lax.scan whose body is
jax.checkpoint'ed — the backward pass re-generates identical sample
directions and re-traces identical shadow rays from the same fold_in key.
Sampled directions, pdfs and visibility are stop_gradient (the reference
discards d(ray_dir), treats the MIS weight as constant, and ignores the
shadow boundary term, kernel.cu:96-99,409); gradients flow into gb_pos,
gb_normal, gb_kd, gb_ks through the BSDF evaluation and into the light
texels through the nearest-texel fetch (scatter-add adjoint == the
reference's atomicAdd, kernel.cu:203-211).

RNG: threefry (jax.random) replaces the reference's PCG hash; stratification
and the 32k-permutation decorrelation tables keep the same variance
structure (semantic, not bitwise, parity).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import tracer
from .vecmath import dot, safe_normalize

TWO_PI = 2.0 * math.pi


# ---------------------------------------------------------------------------
# Lat-long mapping (kernel.cu:124-138)
# ---------------------------------------------------------------------------

def dir_to_tc(d):
    u = jnp.arctan2(d[..., 0], -d[..., 2]) / TWO_PI + 0.5
    v = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) / math.pi
    return jnp.stack([u, v], axis=-1)


def tc_to_dir(uv):
    phi = (uv[..., 0] * 2.0 - 1.0) * math.pi
    theta = uv[..., 1] * math.pi
    sinphi, cosphi = jnp.sin(phi), jnp.cos(phi)
    sintheta, costheta = jnp.sin(theta), jnp.cos(theta)
    return jnp.stack([sintheta * sinphi, costheta, -sintheta * cosphi], axis=-1)


# ---------------------------------------------------------------------------
# CDF inversion (kernel.cu:140-193)
# ---------------------------------------------------------------------------

ONE_MINUS_EPS = 0.99999994


def _kensler_permute_pow2(i, l, p):
    """Pseudorandom bijection on [0, l) for power-of-two l (Kensler,
    'Correlated Multi-Jittered Sampling', masked hash rounds).  Replaces the
    32k-permutation table gathers with pure ALU work."""
    w = jnp.uint32(l - 1)
    i = i.astype(jnp.uint32)
    p = p.astype(jnp.uint32)
    i ^= p
    i *= jnp.uint32(0xe170893d)
    i ^= p >> 16
    i ^= (i & w) >> 4
    i ^= p >> 8
    i *= jnp.uint32(0x0929eb3f)
    i ^= p >> 23
    i ^= (i & w) >> 1
    i *= jnp.uint32(1) | p >> 27
    i *= jnp.uint32(0x6935fa69)
    i ^= (i & w) >> 11
    i *= jnp.uint32(0x74dcca23)
    i ^= (i & w) >> 2
    i *= jnp.uint32(0x9e501cc3)
    i ^= (i & w) >> 2
    i *= jnp.uint32(0xc860a3df)
    i &= w
    return i.astype(jnp.int32)


def _sample_cdf_1d(cdf, x):
    """Invert a normalized 1-D CDF [K] at x [...]; returns (idx, pdf, frac).
    idx by compare-sum (vectorized over the whole CDF: cheaper than the
    gather-based binary search on TPU for K <= a few hundred)."""
    x = jnp.minimum(x, ONE_MINUS_EPS)
    idx = jnp.sum(x[..., None] >= cdf[None, :], axis=-1).astype(jnp.int32)
    idx = jnp.clip(idx, 0, cdf.shape[0] - 1)
    hi = cdf[idx]
    lo = jnp.where(idx > 0, cdf[jnp.maximum(idx - 1, 0)], 0.0)
    pdf = hi - lo
    frac = jnp.minimum((x - lo) / jnp.maximum(pdf, 1e-12), ONE_MINUS_EPS)
    return idx, pdf, frac


def _sample_cdf_rows_of(cols, y, x):
    """Invert per-row CDFs cols [H, W] at rows y [...] and values x [...].

    Two-level exact inversion: each row is decomposed into W/16 superblocks
    of 16 texels; a row-gather of the superblock cumulative values + a
    16-wide compare-sum finds the block, a second contiguous 16-float gather
    + compare-sum finds the texel.  Two 64-byte gathers per sample instead of
    the log2(W)+2 scalar gathers of a binary search (PERF_NOTES.md)."""
    H, W = cols.shape
    x = jnp.minimum(x, ONE_MINUS_EPS)
    B = 16
    if W % B != 0:
        # fallback: gather-based binary search
        flat = cols.reshape(-1)
        lo_i = jnp.zeros_like(y)
        hi_i = jnp.full_like(y, W - 1)
        steps = int(np.ceil(np.log2(max(W - 1, 2)))) + 1
        for _ in range(steps):
            mid = (lo_i + hi_i) // 2
            cm = flat[y * W + mid]
            ge = x >= cm
            lo_i = jnp.where(ge, mid, lo_i)
            hi_i = jnp.where(ge, hi_i, mid)
        idx = hi_i
        hi = flat[y * W + idx]
        lo = jnp.where(idx > 0, flat[y * W + jnp.maximum(idx - 1, 0)], 0.0)
        pdf = hi - lo
        frac = jnp.minimum((x - lo) / jnp.maximum(pdf, 1e-12), ONE_MINUS_EPS)
        return idx, pdf, frac

    S = W // B
    blocks = cols.reshape(H, S, B)
    sup = blocks[..., -1]                               # [H, S]
    sup_rows = sup[y]                                   # [P, S]
    sup_idx = jnp.clip(jnp.sum(x[..., None] >= sup_rows, -1), 0, S - 1)
    blk = blocks[y, sup_idx]                            # [P, B]
    sub = jnp.clip(jnp.sum(x[..., None] >= blk, -1), 0, B - 1)
    idx = (sup_idx * B + sub).astype(jnp.int32)
    hi = jnp.take_along_axis(blk, sub[..., None], axis=-1)[..., 0]
    lo_blk = jnp.take_along_axis(blk, jnp.maximum(sub - 1, 0)[..., None],
                                 axis=-1)[..., 0]
    lo_sup = jnp.take_along_axis(sup_rows,
                                 jnp.maximum(sup_idx - 1, 0)[..., None],
                                 axis=-1)[..., 0]
    lo = jnp.where(sub > 0, lo_blk, jnp.where(sup_idx > 0, lo_sup, 0.0))
    pdf = hi - lo
    frac = jnp.minimum((x - lo) / jnp.maximum(pdf, 1e-12), ONE_MINUS_EPS)
    return idx, pdf, frac


def light_pdf(d, pdf_tex):
    """PDF of the light sampler for direction d (nearest texel,
    kernel.cu:171-182)."""
    H, W = pdf_tex.shape
    coord = dir_to_tc(d)
    x = jnp.clip((coord[..., 0] * W).astype(jnp.int32), 0, W - 1)
    y = jnp.clip((coord[..., 1] * H).astype(jnp.int32), 0, H - 1)
    weight = (W * H) / (2.0 * math.pi * math.pi
                        * jnp.maximum(jnp.sin(coord[..., 1] * math.pi), 1e-4))
    return pdf_tex[y, x] * weight


def light_sample(rows, cols, pdf_tex, u, v):
    """Sample a direction from the env CDFs; returns (dir, pdf)."""
    H, W = cols.shape
    y, _, ry = _sample_cdf_1d(rows, v)
    x, _, rx = _sample_cdf_rows_of(cols, y, u)
    uv = jnp.stack([(x.astype(jnp.float32) + rx) / W,
                    (y.astype(jnp.float32) + ry) / H], axis=-1)
    d = tc_to_dir(uv)
    return d, light_pdf(d, pdf_tex)


def eval_light(light_base, d):
    """Nearest-texel radiance fetch; differentiable w.r.t. light_base
    (adjoint = scatter-add, matching kernel.cu:195-211)."""
    H, W = light_base.shape[0], light_base.shape[1]
    coord = jax.lax.stop_gradient(dir_to_tc(d))
    x = jnp.clip((coord[..., 0] * W).astype(jnp.int32), 0, W - 1)
    y = jnp.clip((coord[..., 1] * H).astype(jnp.int32), 0, H - 1)
    return light_base[y, x]


# ---------------------------------------------------------------------------
# Local frames & lobe sampling (kernel.cu:47-79, 217-332)
# ---------------------------------------------------------------------------

def branchless_onb(n):
    """Pixar orthonormal basis (math_utils.h:155-162)."""
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    b1 = jnp.stack([1.0 + sign * n[..., 0] ** 2 * a, sign * b,
                    -sign * n[..., 0]], axis=-1)
    b2 = jnp.stack([b, sign + n[..., 1] ** 2 * a, -n[..., 1]], axis=-1)
    return b1, b2


def _to_local(a, u, v, w):
    return jnp.stack([dot(a, u)[..., 0], dot(a, v)[..., 0], dot(a, w)[..., 0]], -1)


def _to_world(a, u, v, w):
    return (u * a[..., 0:1] + v * a[..., 1:2] + w * a[..., 2:3])


def cosine_sample(N, u, v):
    """Cosine-hemisphere sample around N; returns (dir, pdf)."""
    N = safe_normalize(N)
    dx, dy = branchless_onb(N)
    phi = TWO_PI * u
    costheta = jnp.sqrt(v)
    sintheta = jnp.sqrt(jnp.clip(1.0 - v, 0.0))
    x = jnp.cos(phi) * sintheta
    y = jnp.sin(phi) * sintheta
    pdf = jnp.maximum(1e-6, costheta / math.pi)
    vec = dx * x[..., None] + dy * y[..., None] + N * costheta[..., None]
    return safe_normalize(vec), pdf


def _ndf_ggx(alpha, cos_theta):
    a2 = alpha * alpha
    d = (cos_theta * a2 - cos_theta) * cos_theta + 1.0
    return a2 / (d * d * math.pi)


def _g1_ggx(alpha_sqr, cos_theta):
    cos_sqr = cos_theta * cos_theta
    tan_sqr = jnp.clip(1.0 - cos_sqr, 0.0) / jnp.maximum(cos_sqr, 1e-12)
    g = 2.0 / (1.0 + jnp.sqrt(1.0 + alpha_sqr * tan_sqr))
    return jnp.where(cos_theta > 0.0, g, 0.0)


def _pdf_ggx_vndf(alpha, wo_l, h_l):
    G1 = _g1_ggx(alpha * alpha, wo_l[..., 2])
    D = _ndf_ggx(alpha, h_l[..., 2])
    return G1 * D * jnp.clip(dot(wo_l, h_l)[..., 0], 0.0) / jnp.maximum(
        wo_l[..., 2], 1e-12)


def ggx_sample(N, wo, u, v, alpha):
    """GGX-VNDF sample; returns (dir, pdf).  pdf = 0 where backfacing."""
    W = safe_normalize(N)
    U, V = branchless_onb(W)
    wo_l = safe_normalize(_to_local(wo, U, V, W))
    cosNO = wo_l[..., 2]

    al = alpha[..., None] if alpha.ndim == wo_l.ndim - 1 else alpha
    Vh = safe_normalize(jnp.stack([al[..., 0] * wo_l[..., 0],
                                   al[..., 0] * wo_l[..., 1],
                                   wo_l[..., 2]], axis=-1))
    z_axis = jnp.zeros_like(Vh).at[..., 2].set(1.0)
    T1 = jnp.where((Vh[..., 2:3] < 0.9999),
                   safe_normalize(jnp.cross(z_axis, Vh)),
                   jnp.zeros_like(Vh).at[..., 0].set(1.0))
    T2 = jnp.cross(Vh, T1)

    r = jnp.sqrt(u)
    phi = TWO_PI * v
    t1 = r * jnp.cos(phi)
    t2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + Vh[..., 2])
    t2 = (1.0 - s) * jnp.sqrt(jnp.clip(1.0 - t1 * t1, 0.0)) + s * t2
    Nh = (T1 * t1[..., None] + T2 * t2[..., None]
          + Vh * jnp.sqrt(jnp.clip(1.0 - t1 * t1 - t2 * t2, 0.0))[..., None])
    h = safe_normalize(jnp.stack([al[..., 0] * Nh[..., 0],
                                  al[..., 0] * Nh[..., 1],
                                  jnp.clip(Nh[..., 2], 0.0)], axis=-1))
    pdf = _pdf_ggx_vndf(al[..., 0], wo_l, h)

    woDotH = dot(wo_l, h)[..., 0]
    wi_l = h * (2.0 * woDotH)[..., None] - wo_l
    pdf = pdf / jnp.maximum(4.0 * woDotH, 1e-12)
    wi = safe_normalize(_to_world(wi_l, U, V, W))

    front = cosNO > 0.0
    return (jnp.where(front[..., None], wi, 0.0), jnp.where(front, pdf, 0.0))


def ggx_pdf(N, wo, wi, alpha):
    """PDF of the GGX-VNDF sampler in a given direction (kernel.cu:301-323)."""
    W = safe_normalize(N)
    U, V = branchless_onb(W)
    wo_l = _to_local(wo, U, V, W)
    wi_l = _to_local(wi, U, V, W)
    m = safe_normalize(wi_l + wo_l)
    woDotH = dot(m, wo_l)[..., 0]
    D = _ndf_ggx(alpha, m[..., 2])
    G1 = _g1_ggx(alpha * alpha, wo_l[..., 2])
    pdf = G1 * D * jnp.clip(woDotH, 0.0) / jnp.maximum(wo_l[..., 2], 1e-12)
    pdf = pdf / jnp.maximum(4.0 * woDotH, 1e-12)
    ok = (wo_l[..., 2] > 0.0) & (wi_l[..., 2] > 0.0)
    return jnp.where(ok, pdf, 0.0)


def _acc_pdf(pdf, opdf, b):
    """update_pdf gate (kernel.cu:325-332)."""
    return pdf + jnp.where(b > 1e-6, opdf * b, 0.0)


def bsdf_pdf_fn(p_diffuse, N, wo, wi, alpha):
    """Combined lobe pdf for MIS of light samples (kernel.cu:374-397)."""
    NdotL = dot(N, wi)[..., 0]
    NdotV = dot(N, wo)[..., 0]
    cosine_pdf = jnp.clip(NdotL, 0.0) / math.pi
    g_pdf = ggx_pdf(N, wo, wi, alpha)
    pdf = _acc_pdf(jnp.zeros_like(NdotL), cosine_pdf, p_diffuse)
    pdf = _acc_pdf(pdf, g_pdf, 1.0 - p_diffuse)
    return jnp.where(jnp.minimum(NdotV, NdotL) < 1e-6, 1.0, pdf)


def bsdf_sample(p_diffuse, N, wo, u, v, z, alpha):
    """Sample the combined diffuse+specular lobe (kernel.cu:334-372)."""
    d_dir, d_pdf = cosine_sample(N, u, v)
    d_pdf = d_pdf * p_diffuse
    d_pdf = _acc_pdf(d_pdf, ggx_pdf(N, wo, d_dir, alpha), 1.0 - p_diffuse)
    # degenerate diffuse lobe (pDiffuse ~ 0 but picked): return N, pdf 1
    d_dir = jnp.where((p_diffuse < 1e-4)[..., None], safe_normalize(N), d_dir)
    d_pdf = jnp.where(p_diffuse < 1e-4, 1.0, d_pdf)

    s_dir, s_pdf = ggx_sample(N, wo, u, v, alpha[..., None])
    s_pdf = s_pdf * (1.0 - p_diffuse)
    cosine_pdf = jnp.clip(dot(N, s_dir)[..., 0], 0.0) / math.pi
    s_pdf = _acc_pdf(s_pdf, cosine_pdf, p_diffuse)

    take_d = (z < p_diffuse)
    return (jnp.where(take_d[..., None], d_dir, s_dir),
            jnp.where(take_d, d_pdf, s_pdf))


def _luminance(c):
    return (c[..., 0] * 0.2126 + c[..., 1] * 0.7152 + c[..., 2] * 0.0722)


def _spec_albedo(col, wo, N):
    """Fresnel-weighted specular albedo for lobe selection (kernel.cu:81-94)."""
    W = safe_normalize(N)
    cosNO = dot(wo, W)[..., 0]
    c = jnp.clip(cosNO, 1e-4, 1.0 - 1e-4)
    scale = (1.0 - c) ** 5
    f = col * (1.0 - scale[..., None]) + scale[..., None]
    return jnp.where(cosNO > 0.0, _luminance(f), 0.0)


# ---------------------------------------------------------------------------
# Demodulated BSDF eval used inside the sample loop (bsdf.h:222-236)
# ---------------------------------------------------------------------------

def _eval_sample_bsdf(gb_kd, gb_ks, gb_pos, gb_normal, gb_view_pos, wi, BSDF):
    from .bsdf import pbr_bsdf_demodulated, lambert
    if BSDF == 0:
        return pbr_bsdf_demodulated(gb_kd, gb_ks, gb_pos, gb_normal,
                                    gb_view_pos, wi, min_roughness=0.08)
    diff = lambert(gb_normal, wi)
    return jnp.broadcast_to(diff, diff.shape[:-1] + (3,)), jnp.zeros(
        diff.shape[:-1] + (3,), diff.dtype)


# ---------------------------------------------------------------------------
# Main entry
# ---------------------------------------------------------------------------

def _default_backend():
    """Fused Pallas pipeline on real TPUs; jnp reference path on CPU
    (tests).  'pallas' selects the standalone tracer kernel with the jnp
    sampling path (round-1 production path, kept for A/B)."""
    return 'fused' if jax.default_backend() not in ('cpu',) else 'jnp'


# The fused pipeline materializes [n2, {8,16}, P] sample/uniform arrays; at
# validation-scale n_samples (32 -> n2=1024) that is tens of GB.  Past this
# stratum count, fall back to the O(P)-memory lax.scan path.
_FUSED_MAX_N2 = 256

_LOGGED_BACKENDS = set()


def _log_backend(eff_backend, n_samples_x, bin_rays, shape):
    """One visible line per traced shade config so every perf/quality number
    is attributable to the pipeline that actually ran (a silent fallback off
    the fused path is a 10x perf cliff).  Runs at trace time — once per
    compiled configuration, not per step."""
    n2 = n_samples_x * n_samples_x
    resolved = eff_backend
    if eff_backend == 'fused' and n2 > _FUSED_MAX_N2:
        resolved = 'pallas (n2=%d > fused max %d)' % (n2, _FUSED_MAX_N2)
    key = (resolved, n2, bin_rays, tuple(shape))
    if key not in _LOGGED_BACKENDS:
        _LOGGED_BACKENDS.add(key)
        print('env_shade: backend=%s n2=%d bin_rays=%s shape=%s platform=%s'
              % (resolved, n2, bin_rays, tuple(shape), jax.default_backend()),
              flush=True)


@partial(jax.jit, static_argnames=('BSDF', 'n_samples_x', 'ray_chunk',
                                   'k_pairs', 'backend', 'bin_rays'))
def env_shade(mask, ro, gb_pos, gb_normal, gb_view_pos, gb_kd, gb_ks,
              light_base, light_pdf_tex, rows, cols, bvh, perms,
              rnd_seed, shadow_scale, BSDF=0, n_samples_x=8,
              ray_chunk=65536, k_pairs=16, backend=None, bin_rays=True):
    """Monte-Carlo direct lighting.

    mask [B,H,W]; ro/gb_* [B,H,W,3]; light_base [Hl,Wl,3];
    light_pdf_tex [Hl,Wl]; rows [Hl]; cols [Hl,Wl]; bvh: LeafBVH;
    perms [NPERM, n^2] int32; rnd_seed scalar int32; shadow_scale scalar.
    Returns (diffuse_accum, specular_accum) [B,H,W,3], demodulated."""
    eff_backend = backend or _default_backend()
    _log_backend(eff_backend, n_samples_x, bin_rays, mask.shape)
    if (eff_backend == 'fused'
            and n_samples_x * n_samples_x <= _FUSED_MAX_N2):
        import os
        from .pallas_shade import env_shade_fused
        rb = int(os.environ.get('NVDR_RAY_BLOCK', '1024'))
        assert rb > 0 and rb % 128 == 0, (
            'NVDR_RAY_BLOCK must be a positive multiple of 128 (lane-dim '
            'block constraint), got %r' % rb)
        return env_shade_fused(
            mask, ro, gb_pos, gb_normal, gb_view_pos, gb_kd, gb_ks,
            light_base, light_pdf_tex, rows, cols, bvh, perms, rnd_seed,
            shadow_scale, BSDF=BSDF, n_samples_x=n_samples_x, ray_block=rb)
    if eff_backend == 'fused':
        eff_backend = 'pallas'
    backend = eff_backend
    B, H, W = mask.shape
    P = B * H * W
    m = mask.reshape(P) > 0
    pos = gb_pos.reshape(P, 3)
    nrm = gb_normal.reshape(P, 3)
    view_pos = gb_view_pos.reshape(P, 3)
    kd = gb_kd.reshape(P, 3)
    ks = gb_ks.reshape(P, 3)
    origins = jnp.where(m[:, None], ro.reshape(P, 3), tracer.BIG)

    alpha = ks[:, 1] * ks[:, 1]
    wo = safe_normalize(view_pos - pos)

    metallic = ks[:, 2]
    spec_col = 0.04 * (1.0 - metallic[:, None]) + kd * metallic[:, None]
    diffuse_weight = (1.0 - metallic) * _luminance(kd)
    specular_weight = _spec_albedo(spec_col, wo, nrm)
    denom = diffuse_weight + specular_weight
    p_diffuse = jnp.where(denom > 0.0,
                          diffuse_weight / jnp.maximum(denom, 1e-20), 1.0)

    n2 = n_samples_x * n_samples_x
    strata_frac = 1.0 / n_samples_x
    sample_frac = 1.0 / n2

    occlusion_fn = tracer.make_occlusion_fn(
        backend or _default_backend(), tmin=0.0, ray_chunk=ray_chunk,
        k_pairs=k_pairs)

    key = jax.random.PRNGKey(rnd_seed)
    kperm, kloop = jax.random.split(key)
    nperm = perms.shape[0]
    n2_pow2 = (n_samples_x * n_samples_x) & (n_samples_x * n_samples_x - 1) == 0
    hi = 2 ** 31 - 1 if n2_pow2 else nperm
    light_perm = jax.random.randint(jax.random.fold_in(kperm, 0), (P,), 0, hi)
    bsdf_perm = jax.random.randint(jax.random.fold_in(kperm, 1), (P,), 0, hi)

    # stop-grad tables for the sampling decisions
    rows_ng = jax.lax.stop_gradient(rows)
    cols_ng = jax.lax.stop_gradient(cols)
    pdf_ng = jax.lax.stop_gradient(light_pdf_tex)
    nrm_ng = jax.lax.stop_gradient(nrm)
    wo_ng = jax.lax.stop_gradient(wo)
    alpha_ng = jax.lax.stop_gradient(alpha)
    p_diffuse_ng = jax.lax.stop_gradient(p_diffuse)

    def process(ray_dir, pdf_sum, vis):
        """Shared per-sample shading (kernel.cu:403-461)."""
        ray_dir = jax.lax.stop_gradient(ray_dir)
        light_col = eval_light(light_base, ray_dir)
        mis = 1.0 / jnp.maximum(jax.lax.stop_gradient(pdf_sum), 1e-4)
        _diff, _spec = _eval_sample_bsdf(kd, ks, pos, nrm, view_pos, ray_dir,
                                         BSDF)
        V = (vis.astype(jnp.float32) * shadow_scale + (1.0 - shadow_scale))
        scale = (light_col * (V * mis)[:, None]) * sample_frac
        return _diff * scale, _spec * scale

    def stratum(carry, i):
        diff_acc, spec_acc = carry
        k = jax.random.fold_in(kloop, i)
        u = jax.random.uniform(k, (P, 5))

        # --- light importance sample ---
        if n2 & (n2 - 1) == 0:  # power-of-two strata: arithmetic permutation
            cell_l = _kensler_permute_pow2(jnp.full((P,), 0, jnp.uint32) + i,
                                           n2, light_perm)
        else:
            cell_l = perms[light_perm, i]
        sx = ((cell_l % n_samples_x).astype(jnp.float32) + u[:, 0]) * strata_frac
        sy = ((cell_l // n_samples_x).astype(jnp.float32) + u[:, 1]) * strata_frac
        l_dir, l_pdf = light_sample(rows_ng, cols_ng, pdf_ng, sx, sy)
        l_bsdf_pdf = bsdf_pdf_fn(p_diffuse_ng, nrm_ng, wo_ng, l_dir, alpha_ng)

        # --- BSDF sample ---
        if n2 & (n2 - 1) == 0:
            cell_b = _kensler_permute_pow2(jnp.full((P,), 0, jnp.uint32) + i,
                                           n2, bsdf_perm)
        else:
            cell_b = perms[bsdf_perm, i]
        bx = ((cell_b % n_samples_x).astype(jnp.float32) + u[:, 2]) * strata_frac
        by = ((cell_b // n_samples_x).astype(jnp.float32) + u[:, 3]) * strata_frac
        b_dir, b_pdf = bsdf_sample(p_diffuse_ng, nrm_ng, wo_ng, bx, by,
                                   u[:, 4], alpha_ng)
        b_light_pdf = light_pdf(b_dir, pdf_ng)

        # --- one wavefront trace for both ray sets ---
        # origins and directions are both stop-gradient: the reference
        # ignores the shadow boundary term entirely (kernel.cu:96-99)
        all_o = jax.lax.stop_gradient(jnp.concatenate([origins, origins], 0))
        all_d = jax.lax.stop_gradient(jnp.concatenate([l_dir, b_dir], 0))
        # direction-octant binning: the wavefront kernel culls per ray *block*
        # (any ray in a block hitting a leaf AABB triggers the whole block's
        # triangle test), so grouping rays with similar directions sharply
        # reduces per-block leaf-hit unions; masked pixels get a zero
        # direction so they cluster into inert blocks (PERF_NOTES.md).
        m2 = jnp.concatenate([m, m], 0)[:, None]
        all_d = jnp.where(m2, all_d, 0.0)
        # NOTE: isolated-fwd A/B suggested binning was net-negative, but the
        # full train-step benchmark is ~10% faster WITH binning (0.173 vs
        # 0.156 iter/s) — the replayed backward amortizes the counting-sort.
        # Keep it on; see PERF_NOTES.md.
        if bin_rays:
            octant = ((all_d[:, 0] > 0) * 4 + (all_d[:, 1] > 0) * 2
                      + (all_d[:, 2] > 0)).astype(jnp.int32)
            octant = jnp.where(m2[:, 0], octant, 8)  # sentinel bin for masked
            from .pallas_tracer import counting_sort_perm
            perm, dest = counting_sort_perm(octant, 9)
            occ_sorted = occlusion_fn(all_o[perm], all_d[perm], bvh)
            occ = occ_sorted[dest]
        else:
            occ = occlusion_fn(all_o, all_d, bvh)
        vis_l = ~occ[:P]
        vis_b = ~occ[P:]

        dl, sl = process(l_dir, l_pdf + l_bsdf_pdf, vis_l)
        db_, sb = process(b_dir, b_light_pdf + b_pdf, vis_b)
        return (diff_acc + dl + db_, spec_acc + sl + sb), None

    init = (jnp.zeros((P, 3)), jnp.zeros((P, 3)))
    (diff, spec), _ = jax.lax.scan(jax.checkpoint(stratum), init,
                                   jnp.arange(n2))

    mf = m[:, None].astype(jnp.float32)
    return (diff * mf).reshape(B, H, W, 3), (spec * mf).reshape(B, H, W, 3)


def env_shade_decorrelated(mask, ro, gb_pos, gb_normal, gb_view_pos, gb_kd,
                           gb_ks, light_base, light_pdf_tex, rows, cols, bvh,
                           perms, fwd_seed, bwd_seed, shadow_scale, BSDF=0,
                           n_samples_x=8):
    """Decorrelated forward/backward sampling (reference FLAGS.decorrelated,
    train.py:547 + ops.py:83,100): the forward estimator uses fwd_seed; the
    backward pass replays the estimator with an independent bwd_seed, so the
    gradient estimate is statistically independent of the rendered value
    (both remain unbiased)."""

    def run(seed, lb, pos, nrm, vp, kd, ks):
        return env_shade(mask, ro, pos, nrm, vp, kd, ks, lb, light_pdf_tex,
                         rows, cols, bvh, perms, seed, shadow_scale,
                         BSDF=BSDF, n_samples_x=n_samples_x)

    @jax.custom_vjp
    def f(lb, pos, nrm, vp, kd, ks):
        return run(fwd_seed, lb, pos, nrm, vp, kd, ks)

    def fwd(lb, pos, nrm, vp, kd, ks):
        return run(fwd_seed, lb, pos, nrm, vp, kd, ks), (lb, pos, nrm, vp,
                                                         kd, ks)

    def bwd(res, g):
        _, vjp = jax.vjp(lambda *a: run(bwd_seed, *a), *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f(light_base, gb_pos, gb_normal, gb_view_pos, gb_kd, gb_ks)


def make_perms(n_samples_x, n_tables=32768, seed=0x5eed):
    """Host-side stratified-permutation tables (ops.py:84-86 capability)."""
    rng = np.random.RandomState(seed)
    n2 = n_samples_x * n_samples_x
    return jnp.asarray(
        np.argsort(rng.rand(n_tables, n2), axis=-1).astype(np.int32))
