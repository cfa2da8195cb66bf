"""Differentiable triangle rasterizer (the nvdiffrast `dr.rasterize` /
`dr.interpolate` capability), TPU-first.

Design
------
Homogeneous-coordinate rasterization (Olano-Greer style): for each triangle,
M = [[x0,x1,x2],[y0,y1,y2],[w0,w1,w2]] from clip coordinates; for pixel NDC
p = (sx, sy, 1), e = adj(M) @ p is proportional to perspective-correct
barycentrics over w.  The per-pixel/per-triangle work is therefore one
[P, 3] @ [3, 5T] matmul (3 edge rows + z row + sum row) — it runs on the MXU.
Coverage resolve is a running argmin over triangle chunks (lax.scan) over
pixel blocks: fully static shapes, no divergence.

Differentiability: the visibility resolve (winning triangle id) is discrete
and wrapped in stop_gradient; barycentrics/depth are then *recomputed*
differentiably for the winning triangle, so interior gradients w.r.t. clip
positions match nvdiffrast's.  Silhouette/coverage gradients are provided by
the antialias op (see antialias.py), like the reference pipeline
(/root/reference/render/render.py:284-291).

Conventions (matching the reference's usage of nvdiffrast with its
y-flipped projection, /root/reference/render/util.py:185-190):
- pixel (row r, col c) center maps to NDC (2(c+.5)/W - 1, 2(r+.5)/H - 1)
- rast output [N, H, W, 4] = (u, v, z/w, float(tri_id + 1)); empty pixels 0.
- u weights vertex 0, v vertex 1, 1-u-v vertex 2 (nvdiffrast convention).

Near-plane handling is clipless: the homogeneous coverage test is exact for
triangles crossing w = 0 (see _tri_setup), and z/w in [-1, 1] performs the
near/far clip — no sub-triangle emission needed (the capability of
nvdiffrast's clipping consumed at reference render/render.py:308-311).
Caveat: the antialias op's edge projection assumes w > 0 endpoints, so
silhouette gradients on edges crossing the camera plane are approximate.
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

W_EPS = 1e-6
TRI_CHUNK = 256
PIX_BLOCK = 32768


def _tri_setup(v_clip, tri):
    """Per-triangle rasterization coefficients.

    v_clip: [V, 4]; tri: [T, 3] int32.
    Returns A [T, 3, 3] (adjugate rows), az [T, 3], asum [T, 3], det [T],
    valid [T]."""
    p = v_clip[tri]                     # [T, 3, 4]
    x, y, z, w = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    # M = [[x0,x1,x2],[y0,y1,y2],[w0,w1,w2]]; adj(M) rows computed explicitly.
    a00 = y[:, 1] * w[:, 2] - y[:, 2] * w[:, 1]
    a01 = x[:, 2] * w[:, 1] - x[:, 1] * w[:, 2]
    a02 = x[:, 1] * y[:, 2] - x[:, 2] * y[:, 1]
    a10 = y[:, 2] * w[:, 0] - y[:, 0] * w[:, 2]
    a11 = x[:, 0] * w[:, 2] - x[:, 2] * w[:, 0]
    a12 = x[:, 2] * y[:, 0] - x[:, 0] * y[:, 2]
    a20 = y[:, 0] * w[:, 1] - y[:, 1] * w[:, 0]
    a21 = x[:, 1] * w[:, 0] - x[:, 0] * w[:, 1]
    a22 = x[:, 0] * y[:, 1] - x[:, 1] * y[:, 0]
    A = jnp.stack([a00, a01, a02, a10, a11, a12, a20, a21, a22], axis=-1)
    A = A.reshape(-1, 3, 3)             # adj rows: e_i = A[i] . (sx, sy, 1)
    det = x[:, 0] * a00 + y[:, 0] * a01 + w[:, 0] * a02
    det_safe = jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    # e_i = b_i / W  =>  sum_i e_i z_i = Z/W = z_ndc directly; with the
    # adjugate scaling (e~ = det * e) that becomes (A^T z . p) / det.
    az = jnp.einsum('tij,ti->tj', A, z) / det_safe[:, None]  # z_ndc = az . p
    asum = jnp.sum(A, axis=1)              # sum_i e~_i   = asum . p
    # Clipless near-plane handling (Olano-Greer 2D homogeneous
    # rasterization): for pixel p, object barycentrics are b = (t/det) e~
    # with hit depth W = t = sum_i b_i w_i; choosing b = sign(det) e~ gives
    # t = |det| > 0 identically, so "all e~_i * sign(det) > 0" is the exact
    # coverage test for the W > 0 part of ANY triangle — including ones
    # crossing w = 0 — and the z/w in [-1, 1] cull performs the near/far
    # clip.  No w > eps gate needed (the nvdiffrast clipping capability,
    # reference render/render.py:308-311, without emitting sub-triangles).
    valid = jnp.abs(det) > 1e-12
    # degenerate padded triangles (all indices equal) have det == 0 -> invalid
    return A, az, asum, det, valid


def _pixel_ndc(H, W):
    sx = (2.0 * (jnp.arange(W, dtype=jnp.float32) + 0.5) / W) - 1.0
    sy = (2.0 * (jnp.arange(H, dtype=jnp.float32) + 0.5) / H) - 1.0
    gx, gy = jnp.meshgrid(sx, sy)
    return jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1).reshape(-1, 3)


def _resolve_single(v_clip, tri, H, W, prev_z, prev_id):
    """Coverage resolve for one batch element.  Returns (z, id) per pixel;
    id = tri_id + 1, 0 = empty.  Non-differentiable (stop-gradient inputs)."""
    A, az, asum, det, valid = _tri_setup(v_clip, tri)
    T = tri.shape[0]
    pad = (-T) % TRI_CHUNK
    if pad:
        A = jnp.concatenate([A, jnp.zeros((pad, 3, 3), A.dtype)], 0)
        az = jnp.concatenate([az, jnp.zeros((pad, 3), az.dtype)], 0)
        asum = jnp.concatenate([asum, jnp.zeros((pad, 3), asum.dtype)], 0)
        det = jnp.concatenate([det, jnp.zeros((pad,), det.dtype)], 0)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), valid.dtype)], 0)
    Tp = T + pad
    n_chunks = Tp // TRI_CHUNK

    # [T, 5, 3] coefficient matrix: rows e0,e1,e2, az, asum
    coef = jnp.concatenate([A, az[:, None, :], asum[:, None, :]], axis=1)
    coef = coef.reshape(n_chunks, TRI_CHUNK * 5, 3)
    detsign = jnp.sign(det).reshape(n_chunks, TRI_CHUNK)
    validc = valid.reshape(n_chunks, TRI_CHUNK)

    pix = _pixel_ndc(H, W)              # [P, 3]
    P = pix.shape[0]
    pb = min(PIX_BLOCK, P)
    ppad = (-P) % pb
    if ppad:
        pix = jnp.concatenate([pix, jnp.zeros((ppad, 3), pix.dtype)], 0)
        prev_z = jnp.concatenate([prev_z, jnp.full((ppad,), 1e30)], 0)
        prev_id = jnp.concatenate([prev_id, jnp.zeros((ppad,), jnp.int32)], 0)
    Pp = P + ppad
    pix_b = pix.reshape(Pp // pb, pb, 3)
    prev_z_b = prev_z.reshape(Pp // pb, pb)
    prev_id_b = prev_id.reshape(Pp // pb, pb)

    big = jnp.float32(1e30)

    def pixel_block(args):
        pixb, pz, pid = args

        def chunk_step(carry, inp):
            best_z, best_id = carry
            coef_c, dsign, vld, base = inp
            E = (pixb @ coef_c.T).reshape(pb, TRI_CHUNK, 5)
            e0, e1, e2, z, s = E[..., 0], E[..., 1], E[..., 2], E[..., 3], E[..., 4]
            ds = dsign[None, :]
            inside = (e0 * ds > 0) & (e1 * ds > 0) & (e2 * ds > 0) & (s * ds > 0)
            inside &= vld[None, :]
            # near/far clip: z/w outside [-1, 1] is outside the view volume
            # (also rejects numerically-degenerate edge-on sliver fragments)
            inside &= (z >= -1.0) & (z <= 1.0)
            # depth-peel: only accept strictly-behind-previous-layer
            # fragments, and never the previous layer's own triangle (its
            # resolve-z and recompute-z differ by ulps, so the z test alone
            # can re-select it)
            inside &= z > pz[:, None] + 1e-7
            ids = base + jnp.arange(TRI_CHUNK, dtype=jnp.int32) + 1
            inside &= ids[None, :] != pid[:, None]
            z = jnp.where(inside, z, big)
            k = jnp.argmin(z, axis=1)
            zk = jnp.take_along_axis(z, k[:, None], axis=1)[:, 0]
            idk = (base + k + 1).astype(jnp.int32)
            better = zk < best_z
            best_z = jnp.where(better, zk, best_z)
            best_id = jnp.where(better & (zk < big), idk, best_id)
            return (best_z, best_id), None

        init = (jnp.full((pb,), big), jnp.zeros((pb,), jnp.int32))
        bases = jnp.arange(n_chunks, dtype=jnp.int32) * TRI_CHUNK
        (bz, bid), _ = jax.lax.scan(chunk_step, init,
                                    (coef, detsign, validc, bases))
        bid = jnp.where(bz < big, bid, 0)
        bz = jnp.where(bz < big, bz, 0.0)
        return bz, bid

    bz, bid = jax.lax.map(pixel_block, (pix_b, prev_z_b, prev_id_b))
    bz = bz.reshape(-1)[:P]
    bid = bid.reshape(-1)[:P]
    return bz.reshape(H, W), bid.reshape(H, W)


def _recompute_bary(v_clip, tri, tid, H, W):
    """Differentiable (u, v, z) + screen derivatives for winning triangles.

    v_clip: [N, V, 4]; tid: [N, H, W] int32 (tri_id + 1, 0 empty).
    Batched explicitly (no vmap) so the vertex gather can carry the
    pallas-scatter adjoint (vmap of a custom_vjp would re-batch its bwd)."""
    from . import pallas_scatter
    t = jnp.clip(tid - 1, 0, tri.shape[0] - 1)
    tv = tri[t]                          # [N, H, W, 3]
    p = pallas_scatter.rows_gather_b(v_clip, tv)   # [N, H, W, 3, 4]
    x, y, z, w = p[..., 0], p[..., 1], p[..., 2], p[..., 3]

    a0 = jnp.stack([y[..., 1] * w[..., 2] - y[..., 2] * w[..., 1],
                    x[..., 2] * w[..., 1] - x[..., 1] * w[..., 2],
                    x[..., 1] * y[..., 2] - x[..., 2] * y[..., 1]], -1)
    a1 = jnp.stack([y[..., 2] * w[..., 0] - y[..., 0] * w[..., 2],
                    x[..., 0] * w[..., 2] - x[..., 2] * w[..., 0],
                    x[..., 2] * y[..., 0] - x[..., 0] * y[..., 2]], -1)
    a2 = jnp.stack([y[..., 0] * w[..., 1] - y[..., 1] * w[..., 0],
                    x[..., 1] * w[..., 0] - x[..., 0] * w[..., 1],
                    x[..., 0] * y[..., 1] - x[..., 1] * y[..., 0]], -1)

    pix = _pixel_ndc(H, W).reshape(1, H, W, 3)
    e0 = jnp.sum(a0 * pix, -1)
    e1 = jnp.sum(a1 * pix, -1)
    e2 = jnp.sum(a2 * pix, -1)
    s = e0 + e1 + e2
    # guard must survive squaring in fp32 on TPU (subnormals flush to zero):
    # 1e-15^2 = 1e-30 is still a normal float32
    s_safe = jnp.where(jnp.abs(s) > 1e-15, s,
                       jnp.where(s >= 0, 1e-15, -1e-15))
    u = e0 / s_safe
    v = e1 / s_safe
    det = (x[..., 0] * a0[..., 0] + y[..., 0] * a0[..., 1]
           + w[..., 0] * a0[..., 2])
    det = jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    zndc = (e0 * z[..., 0] + e1 * z[..., 1] + e2 * z[..., 2]) / det

    # screen-space derivatives (pixel units): d(e_i)/dsx = a_i.x etc.
    def duv(axis):
        de0, de1 = a0[..., axis], a1[..., axis]
        ds = a0[..., axis] + a1[..., axis] + a2[..., axis]
        du = (de0 * s - e0 * ds) / (s_safe * s_safe)
        dv = (de1 * s - e1 * ds) / (s_safe * s_safe)
        return du, dv

    dudx, dvdx = duv(0)
    dudy, dvdy = duv(1)
    scale_x = 2.0 / W
    scale_y = 2.0 / H
    db = jnp.stack([dudx * scale_x, dudy * scale_y,
                    dvdx * scale_x, dvdy * scale_y], axis=-1)

    mask = (tid > 0)[..., None]
    rast = jnp.where(mask,
                     jnp.stack([u, v, zndc, tid.astype(jnp.float32)], -1), 0.0)
    return rast, jnp.where(mask, db, 0.0)


def _default_backend():
    return 'pallas' if jax.default_backend() not in ('cpu',) else 'jnp'


def rasterize(v_clip, tri, resolution,
              prev_rast: Optional[jnp.ndarray] = None,
              backend: Optional[str] = None
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rasterize a batch.

    v_clip: [N, V, 4] clip positions; tri: [T, 3] int32; resolution: (H, W).
    prev_rast: previous depth-peel layer's rast output (or None for layer 0).
    Returns (rast [N,H,W,4], rast_db [N,H,W,4])."""
    H, W = int(resolution[0]), int(resolution[1])
    N = v_clip.shape[0]

    if prev_rast is None:
        prev_z = jnp.full((N, H * W), -1e30)
        prev_id = jnp.zeros((N, H * W), jnp.int32)
    else:
        pz = prev_rast[..., 2].reshape(N, H * W)
        pid = prev_rast[..., 3].reshape(N, H * W).astype(jnp.int32)
        # empty previous pixels should stay empty in later layers: send z to +inf
        prev_z = jnp.where(pid > 0, pz, 1e30)
        prev_id = pid

    v_ng = jax.lax.stop_gradient(v_clip)

    eff = backend or _default_backend()
    if eff.startswith('pallas'):
        from .pallas_raster import resolve_batch
        z, tid = resolve_batch(v_ng, tri, H, W, prev_z, prev_id,
                               interpret=(eff == 'pallas-interpret'))
    else:
        def one(vc, pz, pid):
            return _resolve_single(vc, tri, H, W, pz, pid)

        z, tid = jax.vmap(one)(v_ng, prev_z, prev_id)

    rast, db = _recompute_bary(v_clip, tri, tid, H, W)
    return rast, db


def interpolate(attr, rast, attr_idx, rast_db=None):
    """Interpolate per-vertex attributes over rasterized pixels.

    attr: [V, C] or [N, V, C]; rast: [N,H,W,4]; attr_idx: [T, 3].
    Returns (out [N,H,W,C], out_da [N,H,W,2C] or None) where out_da holds
    (dA/dX, dA/dY) per channel if rast_db given."""
    from . import pallas_scatter
    N, H, W, _ = rast.shape
    tid = rast[..., 3].astype(jnp.int32)
    t = jnp.clip(tid - 1, 0, attr_idx.shape[0] - 1)
    idx = attr_idx[t]                          # [N,H,W,3]

    if attr.ndim == 2:
        # batch-shared vertex table: one gather, one pallas-scatter adjoint
        av = pallas_scatter.rows_gather(attr, idx)     # [N,H,W,3,C]
    else:
        av = pallas_scatter.rows_gather_b(attr, idx)
    u = rast[..., 0:1]
    v = rast[..., 1:2]
    w = 1.0 - u - v
    out = av[..., 0, :] * u + av[..., 1, :] * v + av[..., 2, :] * w
    mask = (tid > 0)[..., None]
    out = jnp.where(mask, out, 0.0)

    if rast_db is None:
        return out, None
    d0 = av[..., 0, :] - av[..., 2, :]
    d1 = av[..., 1, :] - av[..., 2, :]
    dadx = d0 * rast_db[..., 0:1] + d1 * rast_db[..., 2:3]
    dady = d0 * rast_db[..., 1:2] + d1 * rast_db[..., 3:4]
    out_da = jnp.where(mask, jnp.concatenate([dadx, dady], axis=-1), 0.0)
    return out, out_da


def interpolate_face(attr_face, rast):
    """Interpolate a per-FACE attribute: all three corners share the value,
    so the barycentric combination collapses to a single gather (vs 3 in the
    generic path; gathers/scatters are serial on TPU so this triples the
    geometric-normal G-buffer + adjoint throughput).

    attr_face: [T, C] or [N, T, C]; rast: [N,H,W,4].  Returns [N,H,W,C]."""
    from . import pallas_scatter
    tid = rast[..., 3].astype(jnp.int32)
    if attr_face.ndim == 2:
        t = jnp.clip(tid - 1, 0, attr_face.shape[0] - 1)
        av = pallas_scatter.rows_gather(attr_face, t)
    else:
        t = jnp.clip(tid - 1, 0, attr_face.shape[1] - 1)
        av = pallas_scatter.rows_gather_b(attr_face, t)
    return jnp.where((tid > 0)[..., None], av, 0.0)
