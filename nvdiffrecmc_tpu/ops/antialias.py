"""Analytic-edge antialiasing (the nvdiffrast `dr.antialias` capability).

For every horizontal/vertical neighbor pixel pair whose triangle ids differ,
find where the nearer ("foreground") triangle's silhouette edge crosses the
segment between the two pixel centers and blend the encroached pixel toward
its neighbor.  The crossing position is a differentiable function of the
foreground triangle's clip-space vertices, so silhouette/coverage gradients
flow to vertex positions — this supplies the shape gradients the reference
gets from dr.antialias (/root/reference/render/render.py:284-291); without it
pass-1 geometry optimization cannot converge.

Simplification vs nvdiffrast: no mesh-connectivity silhouette analysis; every
id discontinuity is treated as a candidate silhouette.  For interior edges
between adjacent triangles the two colors agree, so both the blend and its
gradient vanish — only true silhouettes produce signal.
"""

import jax
import jax.numpy as jnp


def _screen_xy(v_clip, H, W):
    """Clip -> pixel coordinates (x right, y down, pixel centers at +0.5)."""
    w = jnp.where(jnp.abs(v_clip[..., 3:4]) > 1e-9, v_clip[..., 3:4], 1e-9)
    ndc = v_clip[..., 0:2] / w
    x = (ndc[..., 0] + 1.0) * (W * 0.5)
    y = (ndc[..., 1] + 1.0) * (H * 0.5)
    return jnp.stack([x, y], axis=-1)


def _pair_blend(color, tid, z, tri_xy, axis):
    """Compute the antialias correction field for neighbor pairs along axis
    (1 = vertical pairs (r, r+1), 2 = horizontal pairs (c, c+1)).

    color: [N,H,W,C]; tid: [N,H,W] int32 (0 empty); z: [N,H,W];
    tri_xy: [N,T,3,2] screen-space triangle vertices.
    Returns additive correction [N,H,W,C]."""
    N, H, W, C = color.shape

    if axis == 2:
        idp, idq = tid[:, :, :-1], tid[:, :, 1:]
        zp, zq = z[:, :, :-1], z[:, :, 1:]
        cp, cq = color[:, :, :-1], color[:, :, 1:]
    else:
        idp, idq = tid[:, :-1, :], tid[:, 1:, :]
        zp, zq = z[:, :-1, :], z[:, 1:, :]
        cp, cq = color[:, :-1, :], color[:, 1:, :]

    differs = idp != idq
    # foreground: the non-empty one; if both non-empty, the nearer (smaller z)
    p_fg = jnp.where(idq == 0, True, jnp.where(idp == 0, False, zp < zq))
    active = differs & ((idp > 0) | (idq > 0))

    fg_id = jnp.where(p_fg, idp, idq)
    fg_t = jnp.clip(fg_id - 1, 0, tri_xy.shape[1] - 1)

    # gather fg triangle screen vertices: [N,h,w,3,2].  rows_gather_b
    # routes the backward through the binned Pallas scatter instead of the
    # AD-emitted XLA row scatter (~95 ns/row serial — this cotangent is
    # h*w rows per axis, one of the top pass-2 byte producers).
    from .pallas_scatter import rows_gather_b
    T = tri_xy.shape[1]
    V = rows_gather_b(tri_xy.reshape(N, T, 6), fg_t).reshape(
        fg_t.shape + (3, 2))

    # pixel centers of p and q in pixel coords
    h, w = idp.shape[1], idp.shape[2]
    if axis == 2:
        px = jnp.arange(w, dtype=jnp.float32)[None, None, :] + 0.5
        py = jnp.arange(h, dtype=jnp.float32)[None, :, None] + 0.5
        qx, qy = px + 1.0, py
    else:
        px = jnp.arange(w, dtype=jnp.float32)[None, None, :] + 0.5
        py = jnp.arange(h, dtype=jnp.float32)[None, :, None] + 0.5
        qx, qy = px, py + 1.0
    px = jnp.broadcast_to(px, idp.shape)
    py = jnp.broadcast_to(py, idp.shape)
    qx = jnp.broadcast_to(qx, idp.shape)
    qy = jnp.broadcast_to(qy, idp.shape)

    # edge functions of the 3 triangle edges at p and q
    # edge k: from vertex k to vertex (k+1)%3
    ax = V[..., [0, 1, 2], 0]
    ay = V[..., [0, 1, 2], 1]
    bx = V[..., [1, 2, 0], 0]
    by = V[..., [1, 2, 0], 1]
    ex = bx - ax
    ey = by - ay
    Fp = ex * (py[..., None] - ay) - ey * (px[..., None] - ax)
    Fq = ex * (qy[..., None] - ay) - ey * (qx[..., None] - ax)

    sep = (Fp * Fq) < 0.0                      # edge separates the two centers
    denom = Fp - Fq
    denom = jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    t_cross = Fp / denom                       # crossing position p(0) -> q(1)
    t_cross = jnp.clip(t_cross, 0.0, 1.0)

    # boundary: walking from the fg pixel outward, the first separating edge
    big = jnp.float32(2.0)
    t_from_p = jnp.where(sep, t_cross, big)    # min -> exit from p's side
    t_from_q = jnp.where(sep, t_cross, -big)   # max -> exit from q's side
    d = jnp.where(p_fg, jnp.min(t_from_p, axis=-1), jnp.max(t_from_q, axis=-1))
    has_edge = jnp.where(p_fg, d < 1.5, d > -1.5)
    active = active & has_edge
    d = jnp.clip(d, 0.0, 1.0)

    # blend: if the boundary encroaches past the midpoint into a pixel's cell,
    # blend that pixel toward its neighbor by the encroached fraction.
    w_p = jnp.clip(0.5 - d, 0.0, 0.5)          # applied to p when d < 0.5
    w_q = jnp.clip(d - 0.5, 0.0, 0.5)          # applied to q when d > 0.5
    w_p = jnp.where(active, w_p, 0.0)[..., None]
    w_q = jnp.where(active, w_q, 0.0)[..., None]

    corr_p = (cq - cp) * w_p
    corr_q = (cp - cq) * w_q

    out = jnp.zeros_like(color)
    if axis == 2:
        out = out.at[:, :, :-1].add(corr_p)
        out = out.at[:, :, 1:].add(corr_q)
    else:
        out = out.at[:, :-1, :].add(corr_p)
        out = out.at[:, 1:, :].add(corr_q)
    return out


def antialias(color, rast, v_clip, tri):
    """Apply analytic edge antialiasing to a composited color buffer.

    color: [N,H,W,C]; rast: [N,H,W,4] from rasterize(); v_clip: [N,V,4];
    tri: [T,3].  Returns the antialiased color buffer."""
    N, H, W, C = color.shape
    tid = jax.lax.stop_gradient(rast[..., 3]).astype(jnp.int32)
    z = jax.lax.stop_gradient(rast[..., 2])

    tri_xy = _screen_xy(v_clip, H, W)[:, tri]   # [N, T, 3, 2]

    out = color
    out = out + _pair_blend(color, tid, z, tri_xy, axis=2)
    out = out + _pair_blend(color, tid, z, tri_xy, axis=1)
    return out
