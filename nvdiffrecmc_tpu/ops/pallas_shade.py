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
    iota = jax.lax.broadcasted_iota(jnp.float32, (K, idx_row.shape[-1]), 0)
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
