"""Fused Pallas Monte-Carlo environment shading (TPU production path).

Replaces the per-stratum jnp pipeline of envshade.py with three stages that
together match the launch economics of the reference's single OptiX kernel
(/root/reference/render/optixutils/c_src/envsampling/kernel.cu:463-542):

  A. **sample kernel** (this file, `sample_all`): grid over (stratum, pixel
     block).  Light tables live in VMEM; the per-pixel CDF inversions and
     table lookups become one-hot MXU matmuls + sublane compare-sums instead
     of HBM gathers (the round-1 bottleneck, PERF_NOTES.md).  Emits, per
     (stratum, pixel): light/BSDF sample directions, MIS pdf sums, fetched
     radiance, and texel indices.
  B. **visit-list prepass** (pallas_tracer.visit_masks + lists) over the
     sample directions -> per (pixel block, stratum) leaf lists.
  C. **trace+shade kernel**: walks the lists with SMEM-scalar control flow
     (zero vector->scalar syncs), tests leaves with Plücker MXU matmuls
     against a VMEM-resident BVH, evaluates the demodulated BSDF, and
     accumulates diffuse/specular radiance.  Visibility bits are saved so
     the backward pass NEVER re-traces (the reference re-traces in its
     replay backward; we trade 33 MB of HBM for half the rays).

Data layout convention: pixels ride the *lanes*; per-pixel scalars are
[1, RB] rows, 3-vectors are three rows.  Table lookups keep the table
dimension on sublanes so one-hot selections are sublane reductions and row
gathers are [T, K] @ [K, RB] matmuls — no per-lane dynamic indexing (which
TPUs lack) anywhere.

RNG: uniforms + stratum cells are precomputed outside ([n2, 8, P] array) so
forward, backward, and the jnp twin consume bit-identical randomness —
replay semantics match ops.py:82-105 and testing is exact.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bvh import LeafBVH, K_FEATS, N_FIELDS, decode_hits
from .pallas_tracer import EXIT_GROUP, counting_sort_perm

TWO_PI = 2.0 * math.pi
ONE_MINUS_EPS = 0.99999994


# ---------------------------------------------------------------------------
# Shared scalar math (used bit-identically by kernels and the jnp twin)
# ---------------------------------------------------------------------------

def acos_poly(x):
    """Hastings acos approximation (max err ~7e-5 rad) — Mosaic-safe
    (sqrt + polynomial; TPUs lack an acos primitive)."""
    ax = jnp.abs(x)
    p = ((-0.0187293 * ax + 0.0742610) * ax - 0.2121144) * ax + 1.5707288
    r = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * p
    return jnp.where(x >= 0.0, r, math.pi - r)


def atan2_poly(y, x):
    """Polynomial atan2 (max err ~1e-5 rad) — Mosaic-safe."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    t = mn / jnp.maximum(mx, 1e-30)
    s = t * t
    r = ((-0.0464964749 * s + 0.15931422) * s - 0.327622764) * s * t + t
    r = jnp.where(ay > ax, 0.5 * math.pi - r, r)
    r = jnp.where(x < 0.0, math.pi - r, r)
    return jnp.where(y < 0.0, -r, r)


def dir_to_uv(dx, dy, dz):
    """Lat-long texcoords of a unit direction (kernel.cu:124-138 mapping),
    with the polynomial transcendentals above."""
    u = atan2_poly(dx, -dz) / TWO_PI + 0.5
    v = acos_poly(jnp.clip(dy, -1.0, 1.0)) / math.pi
    return u, v


def uv_to_dir(u, v):
    phi = (u * 2.0 - 1.0) * math.pi
    theta = v * math.pi
    st = jnp.sin(theta)
    return (st * jnp.sin(phi), jnp.cos(theta), -st * jnp.cos(phi))


# --- component-wise 3-vector helpers (each component any broadcastable) ---

def dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross3(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def normalize3(a, eps=1e-20):
    inv = jax.lax.rsqrt(jnp.maximum(dot3(a, a), eps))
    return (a[0] * inv, a[1] * inv, a[2] * inv)


def onb(n):
    """Pixar branchless ONB (math_utils.h:155-162) on components."""
    nx, ny, nz = n
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    b1 = (1.0 + sign * nx * nx * a, sign * b, -sign * nx)
    b2 = (b, sign + ny * ny * a, -ny)
    return b1, b2


def _ndf_ggx(alpha, ct):
    a2 = alpha * alpha
    d = (ct * a2 - ct) * ct + 1.0
    return a2 / (d * d * math.pi)


def _g1_ggx(alpha_sqr, ct):
    c2 = ct * ct
    t2 = jnp.maximum(1.0 - c2, 0.0) / jnp.maximum(c2, 1e-12)
    g = 2.0 / (1.0 + jnp.sqrt(1.0 + alpha_sqr * t2))
    return jnp.where(ct > 0.0, g, 0.0)


def ggx_pdf_c(n, wo, wi, alpha):
    """GGX-VNDF pdf in direction wi (kernel.cu:301-323), component form."""
    w = normalize3(n)
    u, v = onb(w)

    def to_local(a):
        return (dot3(a, u), dot3(a, v), dot3(a, w))
    wo_l = to_local(wo)
    wi_l = to_local(wi)
    m = normalize3((wi_l[0] + wo_l[0], wi_l[1] + wo_l[1], wi_l[2] + wo_l[2]))
    woDotH = dot3(m, wo_l)
    D = _ndf_ggx(alpha, m[2])
    G1 = _g1_ggx(alpha * alpha, wo_l[2])
    pdf = G1 * D * jnp.maximum(woDotH, 0.0) / jnp.maximum(wo_l[2], 1e-12)
    pdf = pdf / jnp.maximum(4.0 * woDotH, 1e-12)
    ok = (wo_l[2] > 0.0) & (wi_l[2] > 0.0)
    return jnp.where(ok, pdf, 0.0)


def _acc_pdf(pdf, opdf, b):
    return pdf + jnp.where(b > 1e-6, opdf * b, 0.0)


def bsdf_pdf_c(p_diffuse, n, wo, wi, alpha):
    """Combined lobe pdf for MIS of light samples (kernel.cu:374-397)."""
    NdotL = dot3(n, wi)
    NdotV = dot3(n, wo)
    cosine_pdf = jnp.maximum(NdotL, 0.0) / math.pi
    g_pdf = ggx_pdf_c(n, wo, wi, alpha)
    pdf = _acc_pdf(jnp.zeros_like(NdotL), cosine_pdf, p_diffuse)
    pdf = _acc_pdf(pdf, g_pdf, 1.0 - p_diffuse)
    return jnp.where(jnp.minimum(NdotV, NdotL) < 1e-6, 1.0, pdf)


def cosine_sample_c(n, u, v):
    nn = normalize3(n)
    dx, dy = onb(nn)
    phi = TWO_PI * u
    ct = jnp.sqrt(v)
    st = jnp.sqrt(jnp.maximum(1.0 - v, 0.0))
    x = jnp.cos(phi) * st
    y = jnp.sin(phi) * st
    pdf = jnp.maximum(1e-6, ct / math.pi)
    vec = (dx[0] * x + dy[0] * y + nn[0] * ct,
           dx[1] * x + dy[1] * y + nn[1] * ct,
           dx[2] * x + dy[2] * y + nn[2] * ct)
    return normalize3(vec), pdf


def ggx_sample_c(n, wo, u, v, alpha):
    """GGX-VNDF sample (kernel.cu:241-291), component form."""
    w = normalize3(n)
    uax, vax = onb(w)

    def to_local(a):
        return (dot3(a, uax), dot3(a, vax), dot3(a, w))
    wo_l = normalize3(to_local(wo))
    cosNO = wo_l[2]

    Vh = normalize3((alpha * wo_l[0], alpha * wo_l[1], wo_l[2]))
    # T1 = normalize(cross(z, Vh)) or x-axis when Vh ~ +z
    lensq = Vh[0] * Vh[0] + Vh[1] * Vh[1]
    inv_len = jax.lax.rsqrt(jnp.maximum(lensq, 1e-30))
    near_z = Vh[2] >= 0.9999
    T1 = (jnp.where(near_z, 1.0, -Vh[1] * inv_len),
          jnp.where(near_z, 0.0, Vh[0] * inv_len),
          jnp.zeros_like(Vh[2]))
    T2 = cross3(Vh, T1)

    r = jnp.sqrt(u)
    phi = TWO_PI * v
    t1 = r * jnp.cos(phi)
    t2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + Vh[2])
    t2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - t1 * t1, 0.0)) + s * t2
    t3 = jnp.sqrt(jnp.maximum(1.0 - t1 * t1 - t2 * t2, 0.0))
    Nh = (T1[0] * t1 + T2[0] * t2 + Vh[0] * t3,
          T1[1] * t1 + T2[1] * t2 + Vh[1] * t3,
          T1[2] * t1 + T2[2] * t2 + Vh[2] * t3)
    h = normalize3((alpha * Nh[0], alpha * Nh[1],
                    jnp.maximum(Nh[2], 0.0)))

    G1 = _g1_ggx(alpha * alpha, wo_l[2])
    D = _ndf_ggx(alpha, h[2])
    woDotH = dot3(wo_l, h)
    pdf = G1 * D * jnp.maximum(woDotH, 0.0) / jnp.maximum(wo_l[2], 1e-12)

    wi_l = (h[0] * 2.0 * woDotH - wo_l[0],
            h[1] * 2.0 * woDotH - wo_l[1],
            h[2] * 2.0 * woDotH - wo_l[2])
    pdf = pdf / jnp.maximum(4.0 * woDotH, 1e-12)
    wi = normalize3((uax[0] * wi_l[0] + vax[0] * wi_l[1] + w[0] * wi_l[2],
                     uax[1] * wi_l[0] + vax[1] * wi_l[1] + w[1] * wi_l[2],
                     uax[2] * wi_l[0] + vax[2] * wi_l[1] + w[2] * wi_l[2]))

    front = cosNO > 0.0
    z = jnp.zeros_like(pdf)
    return ((jnp.where(front, wi[0], z), jnp.where(front, wi[1], z),
             jnp.where(front, wi[2], z)), jnp.where(front, pdf, 0.0))


def bsdf_sample_c(p_diffuse, n, wo, u, v, z, alpha):
    """Sample the combined diffuse+specular lobe (kernel.cu:334-372)."""
    d_dir, d_pdf = cosine_sample_c(n, u, v)
    d_pdf = d_pdf * p_diffuse
    d_pdf = _acc_pdf(d_pdf, ggx_pdf_c(n, wo, d_dir, alpha), 1.0 - p_diffuse)
    nn = normalize3(n)
    deg = p_diffuse < 1e-4
    d_dir = tuple(jnp.where(deg, nc, dc) for nc, dc in zip(nn, d_dir))
    d_pdf = jnp.where(deg, 1.0, d_pdf)

    s_dir, s_pdf = ggx_sample_c(n, wo, u, v, alpha)
    s_pdf = s_pdf * (1.0 - p_diffuse)
    cosine_pdf = jnp.maximum(dot3(n, s_dir), 0.0) / math.pi
    s_pdf = _acc_pdf(s_pdf, cosine_pdf, p_diffuse)

    take_d = z < p_diffuse
    out = tuple(jnp.where(take_d, dc, sc) for dc, sc in zip(d_dir, s_dir))
    return out, jnp.where(take_d, d_pdf, s_pdf)


# ---------------------------------------------------------------------------
# Stage A: sampling kernel
# ---------------------------------------------------------------------------

# output row indices of the samp array
S_LDIR, S_BDIR, S_LPDF, S_BPDF = 0, 3, 6, 7
S_LRAD, S_BRAD, S_LTEX, S_BTEX = 8, 11, 14, 15


def _onehot_sub(idx_row, K):
    """[K, RB] one-hot of idx [1, RB] along sublanes."""
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (K, idx_row.shape[-1]), 0).astype(jnp.float32)
    return (iota == idx_row).astype(jnp.float32)


def _invert_cdf_sub(cdf_2d, x_row):
    """Invert per-pixel CDF columns: cdf_2d [K, RB] (per-pixel CDF on
    sublanes), x [1, RB].  Returns (idx [1,RB] float, pdf, frac)."""
    K = cdf_2d.shape[0]
    x = jnp.minimum(x_row, ONE_MINUS_EPS)
    idx = jnp.sum((x >= cdf_2d).astype(jnp.float32), axis=0, keepdims=True)
    idx = jnp.minimum(idx, float(K - 1))
    oh = _onehot_sub(idx, K)
    oh_m1 = _onehot_sub(idx - 1.0, K)
    hi = jnp.sum(oh * cdf_2d, axis=0, keepdims=True)
    lo = jnp.sum(oh_m1 * cdf_2d, axis=0, keepdims=True)
    pdf = hi - lo
    frac = jnp.minimum((x - lo) / jnp.maximum(pdf, 1e-12), ONE_MINUS_EPS)
    return idx, pdf, frac, oh


def _sample_body(u8, gb8, rows_col, colsT, pdfT, baseT, n_samples_x, Hl, Wl,
                 mm):
    """Shared stage-A math.  u8 [8, RB]; gb8 [8, RB]; rows_col [Hl, 1];
    colsT/pdfT [Wl, Hl]; baseT [3Wl, Hl].  mm(a, b) = matmul hook (the
    kernel casts to bf16; the twin uses fp32).  Returns [16, RB]."""
    u0, u1, u2, u3, u4 = (u8[k:k + 1] for k in range(5))
    cell_l, cell_b = u8[5:6], u8[6:7]
    nrm = (gb8[0:1], gb8[1:2], gb8[2:3])
    wo = (gb8[3:4], gb8[4:5], gb8[5:6])
    alpha = gb8[6:7]
    p_diffuse = gb8[7:8]

    n = float(n_samples_x)
    cx_l = cell_l - n * jnp.floor(cell_l / n)
    cy_l = jnp.floor(cell_l / n)
    sx = (cx_l + u0) / n
    sy = (cy_l + u1) / n

    # --- light importance sample: rows CDF then this row's cols CDF ---
    rows_b = jnp.broadcast_to(rows_col, (Hl, sx.shape[-1]))
    y, pdf_row, ry, oh_y = _invert_cdf_sub(rows_b, sy)
    crow = mm(colsT, oh_y)                         # [Wl, RB] this row's CDF
    x, pdf_col, rx, oh_x = _invert_cdf_sub(crow, sx)

    uu = (x + rx) / Wl
    vv = (y + ry) / Hl
    l_dir = uv_to_dir(uu, vv)
    w_solid = (Wl * Hl) / (2.0 * math.pi * math.pi
                           * jnp.maximum(jnp.sin(vv * math.pi), 1e-4))
    l_pdf = pdf_row * pdf_col * w_solid
    l_bsdf_pdf = bsdf_pdf_c(p_diffuse, nrm, wo, l_dir, alpha)

    # --- BSDF sample ---
    cx_b = cell_b - n * jnp.floor(cell_b / n)
    cy_b = jnp.floor(cell_b / n)
    bx = (cx_b + u2) / n
    by = (cy_b + u3) / n
    b_dir, b_pdf = bsdf_sample_c(p_diffuse, nrm, wo, bx, by, u4, alpha)

    # light pdf of the BSDF direction: nearest-texel pdf fetch
    ub, vb = dir_to_uv(*b_dir)
    x2 = jnp.minimum(jnp.floor(ub * Wl), float(Wl - 1))
    y2 = jnp.minimum(jnp.floor(vb * Hl), float(Hl - 1))
    x2 = jnp.maximum(x2, 0.0)
    y2 = jnp.maximum(y2, 0.0)
    oh_y2 = _onehot_sub(y2, Hl)
    oh_x2 = _onehot_sub(x2, Wl)
    w2 = (Wl * Hl) / (2.0 * math.pi * math.pi
                      * jnp.maximum(jnp.sin(vb * math.pi), 1e-4))
    prow2 = mm(pdfT, oh_y2)                        # [Wl, RB]
    b_light_pdf = jnp.sum(oh_x2 * prow2, axis=0, keepdims=True) * w2

    # --- radiance fetches (nearest texel), light dir & bsdf dir ---
    grow_l = mm(baseT, oh_y)                       # [3Wl, RB]
    grow_b = mm(baseT, oh_y2)
    rad = []
    for grow, ohx in ((grow_l, oh_x), (grow_b, oh_x2)):
        for c in range(3):
            rad.append(jnp.sum(grow[c * Wl:(c + 1) * Wl] * ohx,
                               axis=0, keepdims=True))
    l_rad, b_rad = rad[0:3], rad[3:6]

    out = jnp.concatenate(
        [l_dir[0], l_dir[1], l_dir[2], b_dir[0], b_dir[1], b_dir[2],
         l_pdf + l_bsdf_pdf, b_light_pdf + b_pdf,
         l_rad[0], l_rad[1], l_rad[2], b_rad[0], b_rad[1], b_rad[2],
         y * Wl + x, y2 * Wl + x2], axis=0)
    return out


def _sample_kernel(u_ref, gb_ref, rows_ref, colsT_ref, pdfT_ref, baseT_ref,
                   out_ref, *, n_samples_x, Hl, Wl):
    def mm(a, b):
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    out_ref[0] = _sample_body(
        u_ref[0], gb_ref[:], rows_ref[:, 0:1], colsT_ref[:], pdfT_ref[:],
        baseT_ref[:], n_samples_x, Hl, Wl, mm)


@functools.partial(jax.jit, static_argnames=('n_samples_x', 'ray_block',
                                             'interpret'))
def sample_all(u8, gb8, rows, cols, pdf_tex, base, n_samples_x,
               ray_block=1024, interpret=False):
    """Stage A.  u8 [n2, 8, P] (rows: u0..u4, cell_l, cell_b, pad);
    gb8 [8, P] (rows: nrm3, wo3, alpha, p_diffuse); rows [Hl];
    cols/pdf_tex [Hl, Wl]; base [Hl, Wl, 3].  Returns samp [n2, 16, P]."""
    n2, _, P = u8.shape
    Hl, Wl = cols.shape
    NB = P // ray_block

    rows_in = jnp.broadcast_to(rows[:, None], (Hl, 8)).astype(jnp.float32)
    colsT = cols.T
    pdfT = pdf_tex.T
    baseT = base.transpose(2, 1, 0).reshape(3 * Wl, Hl)

    return pl.pallas_call(
        functools.partial(_sample_kernel, n_samples_x=n_samples_x,
                          Hl=Hl, Wl=Wl),
        grid=(n2, NB),
        in_specs=[
            pl.BlockSpec((1, 8, ray_block), lambda s, i: (s, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, ray_block), lambda s, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Hl, 8), lambda s, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wl, Hl), lambda s, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wl, Hl), lambda s, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * Wl, Hl), lambda s, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, ray_block), lambda s, i: (s, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n2, 16, P), jnp.float32),
        interpret=interpret,
    )(u8, gb8, rows_in, colsT, pdfT, baseT)


def sample_all_jnp(u8, gb8, rows, cols, pdf_tex, base, n_samples_x):
    """Reference twin of stage A in plain jnp (same math, fp32 matmul
    gathers), for tests and the CPU fallback."""
    n2, _, P = u8.shape
    Hl, Wl = cols.shape
    colsT = cols.T
    pdfT = pdf_tex.T
    baseT = base.transpose(2, 1, 0).reshape(3 * Wl, Hl)
    rows_col = rows[:, None].astype(jnp.float32)

    def mm(a, b):
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

    def one(u_s):
        return _sample_body(u_s, gb8, rows_col, colsT, pdfT, baseT,
                            n_samples_x, Hl, Wl, mm)

    return jax.lax.map(one, u8)


def make_uniforms(key, n2, P, n_samples_x, perms=None):
    """[n2, 8, P]: rows 0-4 uniforms, 5/6 stratified cell ids (Kensler
    arithmetic permutation for power-of-two strata, else table-based),
    row 7 zero.  Matches the replay semantics of envshade.env_shade."""
    from .envshade import _kensler_permute_pow2
    ku, kp = jax.random.split(key)
    u = jax.random.uniform(ku, (n2, 5, P))
    n2i = n_samples_x * n_samples_x
    pow2 = (n2i & (n2i - 1)) == 0
    hi = 2 ** 31 - 1 if pow2 or perms is None else perms.shape[0]
    light_perm = jax.random.randint(jax.random.fold_in(kp, 0), (P,), 0, hi)
    bsdf_perm = jax.random.randint(jax.random.fold_in(kp, 1), (P,), 0, hi)
    idx = jnp.arange(n2, dtype=jnp.uint32)[:, None]
    if pow2 or perms is None:
        cell_l = jax.vmap(lambda i: _kensler_permute_pow2(
            jnp.broadcast_to(i, (P,)), n2i, light_perm))(idx[:, 0])
        cell_b = jax.vmap(lambda i: _kensler_permute_pow2(
            jnp.broadcast_to(i, (P,)), n2i, bsdf_perm))(idx[:, 0])
    else:
        cell_l = perms[light_perm][:, :n2].T
        cell_b = perms[bsdf_perm][:, :n2].T
    cells = jnp.stack([cell_l.astype(jnp.float32),
                       cell_b.astype(jnp.float32)], axis=1)  # [n2, 2, P]
    pad = jnp.zeros((n2, 1, P), jnp.float32)
    return jnp.concatenate([u, cells, pad], axis=1)


# ---------------------------------------------------------------------------
# Demodulated BSDF eval in component form (bsdf.h:222-236 semantics, matching
# ops/bsdf.py clamps exactly so autodiff reproduces clamp-zero gradients)
# ---------------------------------------------------------------------------

SPECULAR_EPSILON = 1e-4
MIN_ROUGHNESS = 0.08


def _clip01(x):
    return jnp.clip(x, SPECULAR_EPSILON, 1.0 - SPECULAR_EPSILON)


def eval_demodulated_c(kd, ks, pos, nrm, view, wi, BSDF):
    """kd/ks/pos/nrm/view/wi: component 3-tuples of [1, RB] rows.
    Returns (diff scalar row, spec 3-tuple).  BSDF: 0=pbr, 1=diffuse,
    2=white (diffuse/white use Lambert only; kd modulation happens outside,
    render.py:112-116)."""
    diff = jnp.maximum(dot3(nrm, wi), 0.0) / math.pi
    if BSDF != 0:
        z = jnp.zeros_like(diff)
        return diff, (z, z, z)

    wo = normalize3((view[0] - pos[0], view[1] - pos[1], view[2] - pos[2]))
    occ, rough, metal = ks
    alpha = jnp.clip(rough * rough, MIN_ROUGHNESS * MIN_ROUGHNESS, 1.0)
    alpha_sqr = alpha * alpha
    spec_col = tuple((0.04 * (1.0 - metal) + kd_c * metal) * (1.0 - occ)
                     for kd_c in kd)

    h = normalize3((wo[0] + wi[0], wo[1] + wi[1], wo[2] + wi[2]))
    woDotN = dot3(wo, nrm)
    wiDotN = dot3(wi, nrm)
    woDotH = dot3(wo, h)
    nDotH = dot3(nrm, h)

    _c = _clip01(nDotH)
    d_ = (_c * alpha_sqr - _c) * _c + 1.0
    D = alpha_sqr / (d_ * d_ * math.pi)

    def lam(ct):
        c2 = _clip01(ct) ** 2
        return 0.5 * (jnp.sqrt(1.0 + alpha_sqr * (1.0 - c2) / c2) - 1.0)

    G = 1.0 / (1.0 + lam(woDotN) + lam(wiDotN))
    fc = (1.0 - _clip01(woDotH)) ** 5.0
    w = D * G * 0.25 / jnp.maximum(woDotN, SPECULAR_EPSILON)
    front = ((woDotN > SPECULAR_EPSILON)
             & (wiDotN > SPECULAR_EPSILON)).astype(diff.dtype)
    spec = tuple((sc + (1.0 - sc) * fc) * w * front for sc in spec_col)
    return diff, spec


def _shade_stratum(samp16, gb, vis_l, vis_b, BSDF, sample_frac):
    """Per-stratum shading accumulation (kernel.cu:403-461 role).
    samp16 [16, RB]; gb: dict of component rows; vis_* [1, RB] in [0,1]
    (may be pre-lerped by shadow_scale in the backward path).
    Returns (diff3, spec3) contribution tuples."""
    l_dir = (samp16[0:1], samp16[1:2], samp16[2:3])
    b_dir = (samp16[3:4], samp16[4:5], samp16[5:6])
    l_mis = 1.0 / jnp.maximum(samp16[6:7], 1e-4)
    b_mis = 1.0 / jnp.maximum(samp16[7:8], 1e-4)
    l_rad = (samp16[8:9], samp16[9:10], samp16[10:11])
    b_rad = (samp16[11:12], samp16[12:13], samp16[13:14])

    out_d = [0.0, 0.0, 0.0]
    out_s = [0.0, 0.0, 0.0]
    for wi, mis, rad, vis in ((l_dir, l_mis, l_rad, vis_l),
                              (b_dir, b_mis, b_rad, vis_b)):
        dd, ss = eval_demodulated_c(gb['kd'], gb['ks'], gb['pos'],
                                    gb['nrm'], gb['view'], wi, BSDF)
        wgt = vis * mis * sample_frac
        for c in range(3):
            out_d[c] = out_d[c] + dd * (rad[c] * wgt)
            out_s[c] = out_s[c] + ss[c] * (rad[c] * wgt)
    return tuple(out_d), tuple(out_s)


def _gb_rows(gb_ref):
    g = gb_ref[:]
    return dict(
        ro=(g[0:1], g[1:2], g[2:3]),
        pos=(g[3:4], g[4:5], g[5:6]),
        nrm=(g[6:7], g[7:8], g[8:9]),
        view=(g[9:10], g[10:11], g[11:12]),
        kd=(g[12:13], g[13:14], g[14:15]),
        ks=(g[15:16], g[16:17], g[17:18]),
        mask=g[18:19],
    )


BIG = 3e37


def _ray_features_rows(samp16, gb, tri_dtype):
    """Plücker ray features for this block's light+bsdf rays: [2RB, 16]."""
    RB = samp16.shape[-1]
    mask = gb['mask'] > 0.0
    o = tuple(jnp.where(mask, c, BIG) for c in gb['ro'])

    def feats(dir3):
        d = tuple(jnp.where(mask, c, 0.0) for c in dir3)
        m = cross3(o, d)
        return [d[0], d[1], d[2], m[0], m[1], m[2], o[0], o[1], o[2],
                jnp.ones_like(d[0])]

    rows = [jnp.concatenate([a, b], axis=-1) for a, b in zip(
        feats((samp16[0:1], samp16[1:2], samp16[2:3])),
        feats((samp16[3:4], samp16[4:5], samp16[5:6])))]
    rows.append(jnp.zeros((6, 2 * RB), rows[0].dtype))
    rayfT = jnp.concatenate(rows, axis=0)            # [16, 2RB]
    return rayfT.T.astype(tri_dtype)                 # [2RB, 16]


def _shade_fwd_kernel(lists_hbm, samp_ref, gb_ref, trimat_hbm, out_ref,
                      vis_ref, tri_vmem, lst, sems, lsem, *, BSDF, n2, L,
                      tri_dtype, tmin, leaf_batch):
    """Leaf matrices stream HBM->VMEM with double-buffered DMA (the v4
    tracer pattern) — no VMEM scene-size ceiling.  Visit lists also live in
    HBM and each (block, stratum) row is DMA'd into SMEM scratch.  vis_ref
    holds the whole [n2, 2RB] slab for this block (Mosaic requires the
    sublane block dim to be 8k or the full array dim); the stratum row is
    written with a one-hot select, not dynamic indexing.

    Round-5 epilogue diet (same as pallas_tracer._trace_kernel): occlusion
    accumulates as a [2RB, L] lane mask with one post-loop reduce, and
    leaves stream leaf_batch (KL) per DMA round."""
    i = pl.program_id(0)
    s = pl.program_id(1)
    RB = gb_ref.shape[-1]
    FL = N_FIELDS * L
    KL = leaf_batch

    ldma = pltpu.make_async_copy(lists_hbm.at[i, s], lst, lsem)
    ldma.start()

    @pl.when(s == 0)
    def _():
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)
        vis_ref[:] = jnp.ones(vis_ref.shape, vis_ref.dtype)

    samp16 = samp_ref[0]
    gb = _gb_rows(gb_ref)
    rayf = _ray_features_rows(samp16, gb, tri_dtype)

    ldma.wait()
    W2 = lst.shape[1]
    n = lst[0, 0]

    def leaf(j):
        k = 1 + j
        return lst[jax.lax.div(k, W2), jax.lax.rem(k, W2)]

    def dma(slot, j):
        # early-exit path (leaf_batch forced to 1): whole-buffer copies
        return pltpu.make_async_copy(
            trimat_hbm.at[leaf(j)], tri_vmem.at[slot], sems.at[slot, 0])

    def dma_k(slot, r, k):
        return pltpu.make_async_copy(
            trimat_hbm.at[leaf(r * KL + k)],
            tri_vmem.at[slot, :, pl.ds(k * FL, FL)],
            sems.at[slot, k])

    @pl.when(n > 0)
    def _():
        from .pallas_tracer import _early_exit_on
        if KL >= 1 and not _early_exit_on():
            n_r = jax.lax.div(n + (KL - 1), KL)
            for k in range(KL):
                dma_k(0, 0, k).start()

            def visit_r(r, acc):
                slot = jax.lax.rem(r, 2)

                @pl.when(r + 1 < n_r)
                def _():
                    for k in range(KL):
                        dma_k(1 - slot, r + 1, k).start()

                for k in range(KL):
                    dma_k(slot, r, k).wait()
                    E = jnp.dot(rayf,
                                tri_vmem[slot, :, k * FL:(k + 1) * FL],
                                preferred_element_type=jnp.float32)
                    hit = decode_hits(E, L, tmin=tmin)
                    acc = jnp.maximum(acc, hit.astype(jnp.float32))
                return acc

            acc = jax.lax.fori_loop(0, n_r, visit_r,
                                    jnp.zeros((2 * RB, L), jnp.float32))
            occ_col = jnp.max(acc, axis=-1, keepdims=True)
            vrow0 = jnp.broadcast_to(1.0 - occ_col.T, (n2, 2 * RB))
            srow0 = jax.lax.broadcasted_iota(jnp.int32, (n2, 2 * RB), 0)
            vis_ref[:] = jnp.where(srow0 == s, vrow0, vis_ref[:])
            return

        def visit(j, oc):
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < n_lim)
            def _():
                dma(1 - slot, j + 1).start()

            dma(slot, j).wait()
            E = jnp.dot(rayf, tri_vmem[slot, :, 0:FL],
                        preferred_element_type=jnp.float32)   # [2RB, 5L]
            hit = decode_hits(E, L, tmin=tmin)
            return jnp.maximum(
                oc, jnp.max(hit.astype(jnp.float32), axis=-1,
                            keepdims=True))

        dma(0, 0).start()

        if not _early_exit_on():
            # legacy path (NVDR_LEAF_BATCH=0 kill-switch): round-4 loop
            n_lim = n
            occ_col = jax.lax.fori_loop(
                0, n, visit, jnp.zeros((2 * RB, 1), jnp.float32))
            vrow1 = jnp.broadcast_to(1.0 - occ_col.T, (n2, 2 * RB))
            srow2 = jax.lax.broadcasted_iota(jnp.int32, (n2, 2 * RB), 0)
            vis_ref[:] = jnp.where(srow2 == s, vrow1, vis_ref[:])
            return

        # group-of-G all-occluded early exit (see
        # pallas_tracer._trace_kernel for the pipelining rationale;
        # per-leaf checks measured 26% slower)
        G = EXIT_GROUP
        n_g = jax.lax.div(n + (G - 1), G)
        n_lim = n_g * G

        def cond(c):
            g, done, _ = c
            return (g < n_g) & (done == 0)

        def gbody(c):
            g, _, occ_col = c
            occ_col = jax.lax.fori_loop(
                0, G, lambda i, oc: visit(g * G + i, oc), occ_col)
            done = (jnp.sum(occ_col) >= 2.0 * RB).astype(jnp.int32)
            return (g + 1, done, occ_col)

        g_end, done, occ_col = jax.lax.while_loop(
            cond, gbody, (jnp.int32(0), jnp.int32(0),
                          jnp.zeros((2 * RB, 1), jnp.float32)))
        j_next = g_end * G

        @pl.when(j_next < n_lim)
        def _():
            dma(jax.lax.rem(j_next, 2), j_next).wait()

        vrow = jnp.broadcast_to(1.0 - occ_col.T, (n2, 2 * RB))
        srow = jax.lax.broadcasted_iota(jnp.int32, (n2, 2 * RB), 0)
        vis_ref[:] = jnp.where(srow == s, vrow, vis_ref[:])

    srow1 = jax.lax.broadcasted_iota(jnp.int32, (n2, 2 * RB), 0)
    visw = jnp.sum(jnp.where(srow1 == s, vis_ref[:], 0.0), axis=0,
                   keepdims=True)                     # this stratum's row
    vis_l, vis_b = visw[:, :RB], visw[:, RB:]

    ones = jnp.ones_like(vis_l)
    d_v, s_v = _shade_stratum(samp16, gb, vis_l, vis_b, BSDF, 1.0 / n2)
    d_a, s_a = _shade_stratum(samp16, gb, ones, ones, BSDF, 1.0 / n2)
    acc = jnp.concatenate([d_v[0], d_v[1], d_v[2], s_v[0], s_v[1], s_v[2],
                           d_a[0], d_a[1], d_a[2], s_a[0], s_a[1], s_a[2],
                           jnp.zeros((4, RB), jnp.float32)], axis=0)
    out_ref[:] = out_ref[:] + acc


def _shade_bwd_kernel(samp_ref, gb_ref, visw_ref, g_ref, dgb_ref, drad_ref,
                      *, BSDF, n2):
    """Backward: given per-ray shadow-lerped visibility weights (visw) and
    output cotangents g [6, RB] (d_diff 3, d_spec 3), produce gradients for
    the G-buffer rows and the per-ray radiance cotangents (for the light
    scatter stage).  Uses jax.vjp *inside* the kernel: the adjoint vector
    ops compile like any other Mosaic code — no hand-derived adjoints."""
    s = pl.program_id(1)
    RB = gb_ref.shape[-1]

    @pl.when(s == 0)
    def _():
        dgb_ref[:] = jnp.zeros(dgb_ref.shape, dgb_ref.dtype)

    samp16 = samp_ref[0]
    gb = _gb_rows(gb_ref)
    srow = jax.lax.broadcasted_iota(jnp.int32, visw_ref.shape, 0)
    visw = jnp.sum(jnp.where(srow == s, visw_ref[:], 0.0), axis=0,
                   keepdims=True)             # this stratum's row [1, 2RB]
    vis_l, vis_b = visw[:, :RB], visw[:, RB:]
    g = g_ref[:]
    g_d = (g[0:1], g[1:2], g[2:3])
    g_s = (g[3:4], g[4:5], g[5:6])

    def f(kd, ks, pos, nrm, view, l_rad, b_rad):
        samp_mod = jnp.concatenate(
            [samp16[0:8], l_rad[0], l_rad[1], l_rad[2],
             b_rad[0], b_rad[1], b_rad[2], samp16[14:16]], axis=0)
        gb2 = dict(gb, kd=kd, ks=ks, pos=pos, nrm=nrm, view=view)
        d3, s3 = _shade_stratum(samp_mod, gb2, vis_l, vis_b, BSDF, 1.0 / n2)
        return d3 + s3

    l_rad = (samp16[8:9], samp16[9:10], samp16[10:11])
    b_rad = (samp16[11:12], samp16[12:13], samp16[13:14])
    _, vjp = jax.vjp(f, gb['kd'], gb['ks'], gb['pos'], gb['nrm'], gb['view'],
                     l_rad, b_rad)
    d_kd, d_ks, d_pos, d_nrm, d_view, d_lrad, d_brad = vjp(g_d + g_s)

    dgb = jnp.concatenate(
        [jnp.zeros((3, RB), jnp.float32),
         d_pos[0], d_pos[1], d_pos[2], d_nrm[0], d_nrm[1], d_nrm[2],
         d_view[0], d_view[1], d_view[2], d_kd[0], d_kd[1], d_kd[2],
         d_ks[0], d_ks[1], d_ks[2],
         jnp.zeros((6, RB), jnp.float32)], axis=0)
    dgb_ref[:] = dgb_ref[:] + dgb
    drad_ref[0] = jnp.concatenate(
        [d_lrad[0], d_lrad[1], d_lrad[2], d_brad[0], d_brad[1], d_brad[2],
         samp16[14:15], samp16[15:16]], axis=0)


# ---------------------------------------------------------------------------
# Stage D: light-gradient scatter kernel (atomicAdd role, kernel.cu:203-211)
# ---------------------------------------------------------------------------

def _light_scatter_kernel(drad_ref, dbase_ref, *, Hl, Wl):
    """Accumulate d_baseT^T [Hl, 3Wl] += onehot_y [Hl, R] @ gx [R, 3Wl]
    where gx[r, c*Wl + x_r] = d_rad_c[r]."""
    s = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when((s == 0) & (i == 0))
    def _():
        dbase_ref[:] = jnp.zeros(dbase_ref.shape, dbase_ref.dtype)

    d = drad_ref[0]                          # [8, RB]
    RB = d.shape[-1]

    def scatter(g3, tex_row):
        y = jnp.floor(tex_row / Wl)
        x = tex_row - y * Wl
        ohy = _onehot_sub(y, Hl).astype(jnp.bfloat16)          # [Hl, RB]
        # gxT [RB, 3Wl] built directly in ray-major layout
        xcol = x.reshape(RB, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (RB, 3 * Wl),
                                        1).astype(jnp.float32)
        lane_mod = lane - Wl * jnp.floor(lane / Wl)
        ohx = (lane_mod == xcol).astype(jnp.float32)
        gcol = jnp.concatenate(
            [jnp.broadcast_to(g3[c].reshape(RB, 1), (RB, Wl))
             for c in range(3)], axis=-1)
        gx = (ohx * gcol).astype(jnp.bfloat16)
        return jnp.dot(ohy, gx, preferred_element_type=jnp.float32)

    acc = scatter((d[0:1], d[1:2], d[2:3]), d[6:7])
    acc = acc + scatter((d[3:4], d[4:5], d[5:6]), d[7:8])
    dbase_ref[:] = dbase_ref[:] + acc


@functools.partial(jax.jit, static_argnames=('Hl', 'Wl', 'ray_block',
                                             'interpret'))
def light_scatter(drad, Hl, Wl, ray_block=1024, interpret=False):
    """drad [n2, 8, P] (rows: d_lrad 3, d_brad 3, tex_l, tex_b) ->
    d_base [Hl, Wl, 3]."""
    n2, _, P = drad.shape
    NB = P // ray_block
    dbT = pl.pallas_call(
        functools.partial(_light_scatter_kernel, Hl=Hl, Wl=Wl),
        grid=(n2, NB),
        in_specs=[pl.BlockSpec((1, 8, ray_block), lambda s, i: (s, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Hl, 3 * Wl), lambda s, i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hl, 3 * Wl), jnp.float32),
        interpret=interpret,
    )(drad)
    return dbT.reshape(Hl, 3, Wl).transpose(0, 2, 1)


def light_scatter_jnp(drad, Hl, Wl):
    """jnp twin of the scatter stage."""
    n2, _, P = drad.shape
    tex_l = drad[:, 6].astype(jnp.int32).reshape(-1)
    tex_b = drad[:, 7].astype(jnp.int32).reshape(-1)
    g_l = drad[:, 0:3].transpose(0, 2, 1).reshape(-1, 3)
    g_b = drad[:, 3:6].transpose(0, 2, 1).reshape(-1, 3)
    out = jnp.zeros((Hl * Wl, 3), jnp.float32)
    out = out.at[tex_l].add(g_l)
    out = out.at[tex_b].add(g_b)
    return out.reshape(Hl, Wl, 3)


# ---------------------------------------------------------------------------
# Full fused env_shade: stages A (sample) -> B (visit lists) -> C (trace +
# shade) forward; C' (shade adjoint, no re-trace) -> D (light scatter)
# backward.  Drop-in replacement for envshade.env_shade on TPU.
# ---------------------------------------------------------------------------

def _pad_to(x, n, axis=0, value=0.0):
    pad = (-x.shape[axis]) % n
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _build_lists(samp, ro_m, mask, bvh, ray_block, tmin, interpret):
    """Stage B: per (pixel block, stratum) leaf visit lists over the union
    of the block's light+bsdf rays (ordered [light RB | bsdf RB] to match
    the trace kernel's rayf layout).  Slab masks per stratum run under a
    lax.map (bounds the [2RB, C] broadcast working set); the list
    compaction's top_k runs ONCE over all (stratum, block) rows."""
    from . import pallas_tracer as pt
    n2, _, Pp = samp.shape
    NB = Pp // ray_block
    C = bvh.n_leaves
    mask_col = mask[:, None]

    def one(samp_s):
        l_dir = jnp.where(mask_col, samp_s[0:3].T, 0.0)
        b_dir = jnp.where(mask_col, samp_s[3:6].T, 0.0)
        d = jnp.stack([l_dir, b_dir], axis=0)        # [2, Pp, 3]
        o = jnp.broadcast_to(ro_m[None], (2, Pp, 3))
        # group as [NB, 2*RB]: light rays then bsdf rays of the same block
        d = d.reshape(2, NB, ray_block, 3).transpose(1, 0, 2, 3)
        o = o.reshape(2, NB, ray_block, 3).transpose(1, 0, 2, 3)
        return pt.visit_masks_od(o.reshape(-1, 3), d.reshape(-1, 3),
                                 bvh.aabb_lo, bvh.aabb_hi, 2 * ray_block,
                                 tmin, 1e16)
    m = jax.lax.map(one, samp)                       # [n2, NB, C]
    counts, lists = pt._mask_to_lists(m.reshape(n2 * NB, C))
    merged = jnp.concatenate(
        [counts.reshape(n2, NB).transpose(1, 0)[:, :, None],
         lists.reshape(n2, NB, C).transpose(1, 0, 2)], axis=-1)
    # [NB, n2, 1 + C]
    # lay each (block, stratum) list out as an [8, Cl/8] int32 tile for the
    # SMEM DMA in the trace kernel (pallas_tracer.py alignment rules)
    Cl = ((1 + C + EXIT_GROUP + 1023) // 1024) * 1024
    merged = _pad_to(merged.astype(jnp.int32), Cl, axis=2)
    return merged.reshape(NB, n2, 8, Cl // 8)


def env_shade_fused(mask, ro, gb_pos, gb_normal, gb_view_pos, gb_kd, gb_ks,
                    light_base, light_pdf_tex, rows, cols, bvh, perms,
                    rnd_seed, shadow_scale, BSDF=0, n_samples_x=8,
                    ray_block=1024, tmin=0.0, interpret=False):
    """Fused-Pallas Monte-Carlo direct lighting; same contract as
    envshade.env_shade (demodulated diffuse/specular, [B,H,W,3] each)."""
    from .envshade import _luminance, _spec_albedo

    B, H, W = mask.shape
    P = B * H * W
    # mask/ro enter only the (deliberately gradient-free) shadow-ray setup:
    # the reference ignores the shadow boundary term and d(ray origin)
    # entirely (kernel.cu:96-99), so they must be stop_gradient here or the
    # custom_vjp would be differentiated w.r.t. closed-over values.
    mask = jax.lax.stop_gradient(mask)
    ro = jax.lax.stop_gradient(ro)
    # the BVH is rebuilt from the optimized vertices every step; visibility
    # is binary with a deliberately-zero gradient (kernel.cu:96-99)
    bvh = jax.tree_util.tree_map(jax.lax.stop_gradient, bvh)
    m_flat = mask.reshape(P) > 0
    n2 = n_samples_x * n_samples_x

    def flat(x):
        return x.reshape(P, 3)

    pos, nrm, view, kd, ks = map(flat, (gb_pos, gb_normal, gb_view_pos,
                                        gb_kd, gb_ks))
    ro_f = flat(ro)
    sg = jax.lax.stop_gradient

    # --- pixel coherence sort ------------------------------------------
    # Stage C culls per ray *block*: a block's leaf-visit list is the UNION
    # over its 2RB rays, so blocks of direction-incoherent rays degenerate
    # to visiting ~every leaf (measured 18.5 s/fwd at 512^2 on a random
    # G-buffer vs 0.4 s coherent — and the slow programs trip the TPU
    # worker's ~20 s watchdog).  Sampled directions cluster around the
    # shading normal (cosine/GGX lobes), so a stable counting-sort of
    # PIXELS by quantized normal (octant x dominant axis = 24 bins; masked
    # pixels last, where their empty lists make whole blocks no-ops)
    # restores block coherence for any G-buffer.  The permutation is exact,
    # not approximate: uniforms travel with their pixel, every per-pixel
    # quantity is gathered by `perm` on the way in and by `dest` on the way
    # out, and no kernel reduces across pixels.
    n_sg = sg(nrm)
    okey = ((n_sg[:, 0] > 0) * 4 + (n_sg[:, 1] > 0) * 2
            + (n_sg[:, 2] > 0)).astype(jnp.int32)
    akey = jnp.argmax(jnp.abs(n_sg), axis=-1).astype(jnp.int32)
    skey = jnp.where(m_flat, okey * 3 + akey, 24)
    # (A position-cell-primary two-pass sort was measured here in round 4:
    # it does NOT shrink the visit unions on the DMTet noise blob — the
    # bsdf half of each block fans its lobes over the whole hemisphere, so
    # local origins still sweep every leaf — and costs pass-2 ~7%.  The
    # blob's ~675-of-768-leaf unions are intrinsic to per-block tracing of
    # incoherent rays; the fix, if needed, is per-ray wave compaction, not
    # a better sort.  PERF_NOTES round 4.)
    perm, dest = counting_sort_perm(skey, 25)
    from .pallas_scatter import rows_gather
    # rows_gather: the sort permute's adjoint (an unsort scatter of each
    # [P,3] cotangent) goes through the binned pallas kernel instead of
    # XLA's serial scatter (6 x ~3.3 ms -> ~1 ms each at 512^2)
    pos, nrm, view, kd, ks, ro_f = (rows_gather(x, perm) for x in
                                    (pos, nrm, view, kd, ks, ro_f))
    m_flat = m_flat[perm]

    # lobe-selection quantities (stop-grad, kernel.cu:495-502)
    wo = sg(view - pos)
    wo = wo / jnp.maximum(jnp.linalg.norm(wo, axis=-1, keepdims=True), 1e-20)
    ks_sg = sg(ks)
    kd_sg = sg(kd)
    nrm_sg = sg(nrm)
    alpha = ks_sg[:, 1] * ks_sg[:, 1]
    metallic = ks_sg[:, 2]
    spec_col = 0.04 * (1.0 - metallic[:, None]) + kd_sg * metallic[:, None]
    dw = (1.0 - metallic) * _luminance(kd_sg)
    sw = _spec_albedo(spec_col, wo, nrm_sg)
    denom = dw + sw
    p_diffuse = jnp.where(denom > 0.0, dw / jnp.maximum(denom, 1e-20), 1.0)

    u8 = make_uniforms(jax.random.PRNGKey(rnd_seed), n2, P, n_samples_x,
                       perms)
    # uniforms travel with their pixel (exactness).  Permute via
    # transpose -> row gather -> transpose: a lane-axis gather of the
    # [n2*8, P] pack costs ~120 ns/row on TPU (32 ms measured); the
    # row-major detour is 3 bandwidth copies + a ~7 ns/row gather.
    n2r = u8.shape[0] * u8.shape[1]
    u8 = jnp.take(u8.reshape(n2r, P).T, perm, axis=0).T.reshape(
        u8.shape[0], u8.shape[1], P)
    # pad the pixel axis to the block size
    Pp = P + ((-P) % ray_block)
    u8 = _pad_to(u8, ray_block, axis=2)
    m_p = _pad_to(m_flat, ray_block, axis=0, value=False)
    gb8 = jnp.concatenate(
        [nrm_sg.T, wo.T, alpha[None], p_diffuse[None]], axis=0)
    gb8 = _pad_to(gb8, ray_block, axis=1)
    NB = Pp // ray_block

    rows_sg, cols_sg, pdf_sg = sg(rows), sg(cols), sg(light_pdf_tex)
    Hl, Wl = cols.shape
    L = bvh.leaf_size
    ro_p = _pad_to(ro_f, ray_block, axis=0)          # [Pp, 3]
    m_row = m_p[None].astype(jnp.float32)            # [1, Pp]

    # All traced arrays the kernels consume are EXPLICIT custom_vjp
    # parameters (zero cotangents in bwd).  Closing over them instead leaks
    # tracers when env_shade is jitted and differentiated from an outer
    # trace ("No constant handler for DynamicJaxprTracer" at lowering).
    def pack_gb(pos_, nrm_, view_, kd_, ks_, ro_pk, m_rowk):
        def padT(x):
            return _pad_to(x.T, ray_block, axis=1)
        g = jnp.concatenate(
            [ro_pk.T, padT(pos_), padT(nrm_), padT(view_), padT(kd_),
             padT(ks_), m_rowk, jnp.zeros((5, Pp), jnp.float32)], axis=0)
        return g                                      # [24, Pp]

    @jax.custom_vjp
    def f(base, pos_, nrm_, view_, kd_, ks_,
          u8k, gb8k, ro_pk, m_rowk, rows_k, cols_k, pdf_k, bvh_k, ss):
        out, _, _, _ = _fwd_impl(base, pos_, nrm_, view_, kd_, ks_, u8k,
                                 gb8k, ro_pk, m_rowk, rows_k, cols_k,
                                 pdf_k, bvh_k, ss)
        return out

    def _fwd_impl(base, pos_, nrm_, view_, kd_, ks_, u8k, gb8k, ro_pk,
                  m_rowk, rows_k, cols_k, pdf_k, bvh_k, ss):
        # Stage A's in-kernel radiance fetch provides the forward values;
        # the gradient into `base` is produced by the stage-D scatter in
        # bwd() from the stored texel indices — the exact adjoint of the
        # nearest-texel fetch (kernel.cu:195-211 semantics).
        samp = sample_all(u8k, gb8k, rows_k, cols_k, pdf_k, sg(base),
                          n_samples_x, ray_block=ray_block,
                          interpret=interpret)
        m_b = m_rowk.reshape(-1) > 0.0
        ro_m = jnp.where(m_b[:, None], ro_pk, BIG)
        lists = _build_lists(jax.lax.stop_gradient(samp), ro_m, m_b, bvh_k,
                             ray_block, tmin, interpret)
        Cl8 = lists.shape[-1]                        # = Cl // 8

        gbC = pack_gb(pos_, nrm_, view_, kd_, ks_, ro_pk, m_rowk)
        from .pallas_tracer import _early_exit_on, default_leaf_batch
        KL = 1 if _early_exit_on() else default_leaf_batch()
        out, visw = pl.pallas_call(
            functools.partial(_shade_fwd_kernel, BSDF=BSDF, n2=n2, L=L,
                              tri_dtype=bvh_k.tri_mat.dtype, tmin=tmin,
                              leaf_batch=KL),
            grid=(NB, n2),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # visit lists in HBM
                pl.BlockSpec((1, 16, ray_block), lambda i, s: (s, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((24, ray_block), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),   # leaf mats stay in HBM
            ],
            out_specs=(
                pl.BlockSpec((16, ray_block), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n2, 2 * ray_block), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((16, Pp), jnp.float32),
                jax.ShapeDtypeStruct((n2, 2 * Pp), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, K_FEATS, max(KL, 1) * N_FIELDS * L),
                           bvh_k.tri_mat.dtype),
                pltpu.SMEM((8, Cl8), jnp.int32),
                pltpu.SemaphoreType.DMA((2, max(KL, 1))),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interpret,
        )(lists, jax.lax.stop_gradient(samp), jax.lax.stop_gradient(gbC),
          bvh_k.tri_mat)

        diff = (ss * out[0:3] + (1.0 - ss) * out[6:9]) * m_rowk
        spec = (ss * out[3:6] + (1.0 - ss) * out[9:12]) * m_rowk
        res = (diff[:, :P].T.reshape(B, H, W, 3),
               spec[:, :P].T.reshape(B, H, W, 3))
        return res, samp, visw, gbC

    def fwd(base, pos_, nrm_, view_, kd_, ks_,
            u8k, gb8k, ro_pk, m_rowk, rows_k, cols_k, pdf_k, bvh_k, ss):
        out, samp, visw, gbC = _fwd_impl(
            base, pos_, nrm_, view_, kd_, ks_, u8k, gb8k, ro_pk, m_rowk,
            rows_k, cols_k, pdf_k, bvh_k, ss)
        del samp  # recomputed in bwd (replay) — not worth n2*16*P of HBM
        return out, (jax.lax.stop_gradient(base), visw, gbC, u8k, gb8k,
                     m_rowk, rows_k, cols_k, pdf_k, bvh_k, ss)

    def bwd(resid, g):
        # Replay backward (the reference re-runs its whole sampling path in
        # the bwd launch, kernel.cu:463-542 with backward=true): stage A is
        # recomputed bit-identically from the same uniforms; only the traced
        # visibility bits (visw) are carried — we re-trace nothing.
        (base_sg, visw, gbC, u8k, gb8k, m_rowk, rows_k, cols_k, pdf_k,
         bvh_k, ss) = resid
        samp = sample_all(u8k, gb8k, rows_k, cols_k, pdf_k, base_sg,
                          n_samples_x, ray_block=ray_block,
                          interpret=interpret)
        g_diff, g_spec = g
        vw = visw * ss + (1.0 - ss)                  # per-ray shadow lerp
        grows = jnp.concatenate(
            [_pad_to(g_diff.reshape(P, 3).T, ray_block, axis=1) * m_rowk,
             _pad_to(g_spec.reshape(P, 3).T, ray_block, axis=1) * m_rowk,
             jnp.zeros((2, Pp), jnp.float32)], axis=0)   # [8, Pp]

        dgb, drad = pl.pallas_call(
            functools.partial(_shade_bwd_kernel, BSDF=BSDF, n2=n2),
            grid=(NB, n2),
            in_specs=[
                pl.BlockSpec((1, 16, ray_block), lambda i, s: (s, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((24, ray_block), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n2, 2 * ray_block), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, ray_block), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((24, ray_block), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, ray_block), lambda i, s: (s, 0, i),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((24, Pp), jnp.float32),
                jax.ShapeDtypeStruct((n2, 8, Pp), jnp.float32),
            ),
            interpret=interpret,
        )(samp, gbC, vw, grows)

        d_base = (light_scatter(drad, Hl, Wl, ray_block=ray_block,
                                interpret=interpret)
                  if not interpret else light_scatter_jnp(drad, Hl, Wl))

        def unrow(lo):
            # cotangent of a [P, 3] primal arg (sorted pixel order)
            return dgb[lo:lo + 3, :P].T

        # cotangents: 6 real + zeros for (u8, gb8, ro_p, m_row, rows, cols,
        # pdf, bvh, ss) — visibility/sampling gradients are deliberately
        # zero (kernel.cu:96-99)
        return (d_base, unrow(3), unrow(6), unrow(9), unrow(12), unrow(15),
                jnp.zeros_like(u8k), jnp.zeros_like(gb8k),
                jnp.zeros((Pp, 3), jnp.float32), jnp.zeros_like(m_rowk),
                jnp.zeros_like(rows_k), jnp.zeros_like(cols_k),
                jnp.zeros_like(pdf_k),
                jax.tree_util.tree_map(jnp.zeros_like, bvh_k),
                jnp.zeros_like(ss))

    f.defvjp(fwd, bwd)
    d_s, s_s = f(light_base, pos, nrm, view, kd, ks, u8, gb8, ro_p, m_row,
                 rows_sg, cols_sg, pdf_sg, bvh,
                 jnp.asarray(shadow_scale, jnp.float32))

    def unsort(x):
        # inverse of the coherence sort (x is in sorted pixel order); the
        # gather's adjoint routes cotangents back through `perm` via the
        # binned pallas scatter
        return rows_gather(x.reshape(P, 3), dest).reshape(B, H, W, 3)

    return unsort(d_s), unsort(s_s)


def env_shade_fused_jnp(mask, ro, gb_pos, gb_normal, gb_view_pos, gb_kd,
                        gb_ks, light_base, light_pdf_tex, rows, cols, bvh,
                        perms, rnd_seed, shadow_scale, BSDF=0, n_samples_x=8,
                        tmin=0.0, ray_chunk=65536, k_pairs=64):
    """jnp twin of env_shade_fused: identical sampling math (sample_all_jnp),
    jnp wavefront tracer, identical shading formulas.  Fully differentiable
    via JAX AD (radiance refetched through a differentiable gather whose
    adjoint is the scatter-add the fused path implements in stage D).  Used
    as the CPU backend and the correctness oracle for the fused kernels."""
    from . import tracer
    from .envshade import _luminance, _spec_albedo

    B, H, W = mask.shape
    P = B * H * W
    n2 = n_samples_x * n_samples_x
    m_flat = mask.reshape(P) > 0

    pos = gb_pos.reshape(P, 3)
    nrm = gb_normal.reshape(P, 3)
    view = gb_view_pos.reshape(P, 3)
    kd = gb_kd.reshape(P, 3)
    ks = gb_ks.reshape(P, 3)
    ro_f = ro.reshape(P, 3)

    sg = jax.lax.stop_gradient
    wo_arr = sg(view - pos)
    wo_arr = wo_arr / jnp.maximum(
        jnp.linalg.norm(wo_arr, axis=-1, keepdims=True), 1e-20)
    ks_sg, kd_sg, nrm_sg = sg(ks), sg(kd), sg(nrm)
    alpha = ks_sg[:, 1] * ks_sg[:, 1]
    metallic = ks_sg[:, 2]
    spec_col = 0.04 * (1.0 - metallic[:, None]) + kd_sg * metallic[:, None]
    dw = (1.0 - metallic) * _luminance(kd_sg)
    sw = _spec_albedo(spec_col, wo_arr, nrm_sg)
    denom = dw + sw
    p_diffuse = jnp.where(denom > 0.0, dw / jnp.maximum(denom, 1e-20), 1.0)

    u8 = make_uniforms(jax.random.PRNGKey(rnd_seed), n2, P, n_samples_x,
                       perms)
    gb8 = jnp.concatenate(
        [nrm_sg.T, wo_arr.T, alpha[None], p_diffuse[None]], axis=0)
    samp = sample_all_jnp(u8, gb8, sg(rows), sg(cols), sg(light_pdf_tex),
                          sg(light_base), n_samples_x)
    samp = sg(samp)

    # differentiable radiance refetch (adjoint == stage-D scatter-add)
    tex = samp[:, 14:16].astype(jnp.int32)           # [n2, 2, P]
    rad = light_base.reshape(-1, 3)[tex.reshape(-1)].reshape(n2, 2, P, 3)
    rad_rows = jnp.concatenate(
        [rad[:, 0].transpose(0, 2, 1), rad[:, 1].transpose(0, 2, 1)],
        axis=1)                                       # [n2, 6, P]
    samp = jnp.concatenate([samp[:, 0:8], rad_rows, samp[:, 14:16]], axis=1)

    ro_m = jnp.where(m_flat[:, None], ro_f, BIG)
    mask_col = m_flat[:, None]

    gb = dict(
        pos=tuple(pos.T[c][None] for c in range(3)),
        nrm=tuple(nrm.T[c][None] for c in range(3)),
        view=tuple(view.T[c][None] for c in range(3)),
        kd=tuple(kd.T[c][None] for c in range(3)),
        ks=tuple(ks.T[c][None] for c in range(3)),
    )

    diff = jnp.zeros((3, P))
    spec = jnp.zeros((3, P))
    for s in range(n2):
        samp_s = samp[s]
        l_dir = jnp.where(mask_col, samp_s[0:3].T, 0.0)
        b_dir = jnp.where(mask_col, samp_s[3:6].T, 0.0)
        occ = tracer.any_hit(
            sg(jnp.concatenate([ro_m, ro_m], 0)),
            sg(jnp.concatenate([l_dir, b_dir], 0)), bvh, tmin=tmin,
            ray_chunk=min(ray_chunk, 2 * P), k_pairs=k_pairs)
        vis = 1.0 - occ.astype(jnp.float32)
        vis = vis * shadow_scale + (1.0 - shadow_scale)
        d3, s3 = _shade_stratum(samp_s, gb, vis[None, :P], vis[None, P:],
                                BSDF, 1.0 / n2)
        diff = diff + jnp.concatenate(d3, axis=0)
        spec = spec + jnp.concatenate(s3, axis=0)

    mrow = m_flat[None].astype(jnp.float32)
    return ((diff * mrow).T.reshape(B, H, W, 3),
            (spec * mrow).T.reshape(B, H, W, 3))
