"""Mesh attribute computation: smooth normals, mikktspace-style tangents,
unique edges.  Capability parity with /root/reference/render/mesh.py:150-219,
re-designed for static shapes: triangle lists may be padded, with a validity
mask — invalid triangles contribute nothing to the scatter-adds.
"""

import jax
import jax.numpy as jnp
import numpy as np

from .vecmath import dot, safe_normalize


def face_normals(v_pos, t_pos_idx, normalize=True):
    """[T, 3] face normals (optionally unnormalized cross products)."""
    v0 = v_pos[t_pos_idx[:, 0]]
    v1 = v_pos[t_pos_idx[:, 1]]
    v2 = v_pos[t_pos_idx[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)
    return safe_normalize(fn) if normalize else fn


def auto_normals(v_pos, t_pos_idx, tri_mask=None):
    """Area-weighted smooth vertex normals [V, 3].

    tri_mask: optional [T] {0,1} — padded/invalid triangles are excluded."""
    fn = face_normals(v_pos, t_pos_idx, normalize=False)
    if tri_mask is not None:
        fn = fn * tri_mask[:, None]
    v_nrm = jnp.zeros_like(v_pos)
    for i in range(3):
        v_nrm = v_nrm.at[t_pos_idx[:, i]].add(fn)
    v_nrm = jnp.where(dot(v_nrm, v_nrm) > 1e-20, v_nrm,
                      jnp.array([0.0, 0.0, 1.0], dtype=v_pos.dtype))
    return safe_normalize(v_nrm)


def compute_tangents(v_pos, v_nrm, v_tex, t_pos_idx, t_nrm_idx, t_tex_idx,
                     tri_mask=None):
    """Per-vertex tangents following mikktspace conventions
    (/root/reference/render/mesh.py:181-219).  Returns [Vn, 3] indexed by
    t_nrm_idx."""
    pos = [v_pos[t_pos_idx[:, i]] for i in range(3)]
    tex = [v_tex[t_tex_idx[:, i]] for i in range(3)]

    uve1 = tex[1] - tex[0]
    uve2 = tex[2] - tex[0]
    pe1 = pos[1] - pos[0]
    pe2 = pos[2] - pos[0]

    nom = pe1 * uve2[..., 1:2] - pe2 * uve1[..., 1:2]
    denom = uve1[..., 0:1] * uve2[..., 1:2] - uve1[..., 1:2] * uve2[..., 0:1]
    tang = nom / jnp.where(denom > 0.0, jnp.clip(denom, min=1e-6),
                           jnp.clip(denom, max=-1e-6))
    if tri_mask is not None:
        tang = tang * tri_mask[:, None]

    tangents = jnp.zeros_like(v_nrm)
    tansum = jnp.zeros_like(v_nrm)
    w = jnp.ones_like(tang) if tri_mask is None else jnp.broadcast_to(
        tri_mask[:, None], tang.shape)
    for i in range(3):
        idx = t_nrm_idx[:, i]
        tangents = tangents.at[idx].add(tang)
        tansum = tansum.at[idx].add(w)
    tangents = tangents / jnp.clip(tansum, min=1.0)

    tangents = safe_normalize(tangents)
    tangents = safe_normalize(tangents - dot(tangents, v_nrm) * v_nrm)
    # Degenerate tangents (zero uv area everywhere) -> arbitrary frame
    bad = dot(tangents, tangents) < 0.5
    fallback = safe_normalize(jnp.cross(v_nrm, jnp.array([0.0, 1.0, 0.001])))
    return jnp.where(bad, fallback, tangents)


def compute_edges_np(t_pos_idx):
    """Host-side unique undirected edge list [E, 2] (min-index first) from a
    numpy triangle index array.  Used for static topology preprocessing."""
    t = np.asarray(t_pos_idx)
    e = np.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]], axis=0)
    e = np.sort(e, axis=1)
    return np.unique(e, axis=0)


def laplace_uniform(v_pos, t_pos_idx, tri_mask=None):
    """Uniform (umbrella) Laplacian smoothing residual per vertex, mean
    squared — /root/reference/render/regularizer.py:64-83."""
    v0 = v_pos[t_pos_idx[:, 0]]
    v1 = v_pos[t_pos_idx[:, 1]]
    v2 = v_pos[t_pos_idx[:, 2]]
    contrib = [(v1 - v0) + (v2 - v0), (v0 - v1) + (v2 - v1), (v0 - v2) + (v1 - v2)]
    if tri_mask is not None:
        contrib = [c * tri_mask[:, None] for c in contrib]
        wgt = tri_mask[:, None] * 2.0
    else:
        wgt = jnp.full((t_pos_idx.shape[0], 1), 2.0, dtype=v_pos.dtype)

    term = jnp.zeros_like(v_pos)
    norm = jnp.zeros_like(v_pos[:, :1])
    for i in range(3):
        term = term.at[t_pos_idx[:, i]].add(contrib[i])
        norm = norm.at[t_pos_idx[:, i]].add(wgt)
    term = term / jnp.clip(norm, min=1.0)
    return jnp.mean(term ** 2)


def avg_edge_length(v_pos, e_pos_idx):
    d = v_pos[e_pos_idx[:, 0]] - v_pos[e_pos_idx[:, 1]]
    return jnp.mean(jnp.sqrt(jnp.clip(jnp.sum(d * d, -1), min=1e-20)))
