"""Two-level ray-acceleration structure built fresh on-device each iteration
(the capability of per-iteration `optix_build_bvh`,
/root/reference/render/optixutils/c_src/torch_bindings.cpp:37-116 — rebuilt
every getMesh(), geometry/dmtet.py:201-202).

TPU-first design: instead of a pointer-chasing BVH (divergent gathers), we
Morton-sort triangles by centroid and group them into fixed-size leaves.
Traversal is then a dense ray x leaf-AABB slab test (vectorized, static
shapes) followed by pair-compacted triangle tests, where each work block
shares one leaf so triangle data is fetched per *block*, not per ray — the
ray-triangle inner loop becomes an MXU matmul (see tracer.py).

Triangles are stored in a precomputed 7x8 "intersection matrix" form: all
per-(ray, triangle) quantities needed by an any-hit test are dot products of
the ray feature vector [ox,oy,oz,dx,dy,dz,1] with per-triangle constant
columns, so a block test is one [R, 7] @ [7, 8L] matmul.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class LeafBVH(NamedTuple):
    tri_mat: jnp.ndarray    # [C, 7, 8*L] per-leaf triangle intersection matrices
    aabb_lo: jnp.ndarray    # [C, 3]
    aabb_hi: jnp.ndarray    # [C, 3]

    @property
    def leaf_size(self):
        return self.tri_mat.shape[2] // 8


def _morton3(x, y, z):
    """Interleave 10-bit quantized coords into 30-bit Morton codes."""
    def spread(v):
        v = v.astype(jnp.uint32) & 0x3FF
        v = (v | (v << 16)) & jnp.uint32(0x30000FF)
        v = (v | (v << 8)) & jnp.uint32(0x300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x30C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x9249249)
        return v
    return spread(x) | (spread(y) << 1) | (spread(z) << 2)


def _tri_intersection_matrix(v0, v1, v2, valid):
    """[T, 7, 8] constants for the matmul any-hit test.

    Columns: 0: n.o - d, 1: n.dir, 2-4: alpha_i = g_i.o + c_i,
    5-7: beta_i = g_i.dir, where n = cross(e1, e2) (unnormalized face
    normal), g_i = cross(n, edge_i) are inward in-plane edge normals,
    c_i = -g_i . edge_vertex.  Invalid triangles are zeroed (they produce
    a = 0 -> rejected by the tracer)."""
    e1 = v1 - v0
    e2 = v2 - v0
    n = jnp.cross(e1, e2)
    d = jnp.sum(n * v0, axis=-1)

    edges = [(v0, v1 - v0), (v1, v2 - v1), (v2, v0 - v2)]
    g = [jnp.cross(n, e) for (_, e) in edges]
    c = [-jnp.sum(gi * vi, axis=-1) for gi, (vi, _) in zip(g, edges)]

    T = v0.shape[0]
    M = jnp.zeros((T, 7, 8), dtype=v0.dtype)
    M = M.at[:, 0:3, 0].set(n)
    M = M.at[:, 6, 0].set(-d)
    M = M.at[:, 3:6, 1].set(n)
    for i in range(3):
        M = M.at[:, 0:3, 2 + i].set(g[i])
        M = M.at[:, 6, 2 + i].set(c[i])
        M = M.at[:, 3:6, 5 + i].set(g[i])
    return M * valid[:, None, None]


@partial(jax.jit, static_argnames=('leaf_size', 'dtype'))
def build(v_pos, tri, tri_mask=None, leaf_size=16, dtype=None):
    """Build the two-level structure.  Static output shapes: C = ceil(T/L)
    leaves.  Invalid (masked/padded) triangles sort to the end and get empty
    AABBs so they are never visited."""
    T = tri.shape[0]
    L = leaf_size
    v0 = v_pos[tri[:, 0]]
    v1 = v_pos[tri[:, 1]]
    v2 = v_pos[tri[:, 2]]
    if tri_mask is None:
        tri_mask = jnp.ones((T,), dtype=bool)
    else:
        tri_mask = tri_mask.astype(bool)
    # also mask degenerate (padded index-identical) triangles
    area2 = jnp.sum(jnp.cross(v1 - v0, v2 - v0) ** 2, axis=-1)
    tri_mask = tri_mask & (area2 > 0.0)

    centroid = (v0 + v1 + v2) / 3.0
    big = jnp.float32(3e37)
    cmin = jnp.min(jnp.where(tri_mask[:, None], centroid, big), axis=0)
    cmax = jnp.max(jnp.where(tri_mask[:, None], centroid, -big), axis=0)
    scale = jnp.where(cmax > cmin, 1023.0 / (cmax - cmin), 0.0)
    q = jnp.clip(((centroid - cmin) * scale), 0, 1023).astype(jnp.uint32)
    morton = _morton3(q[:, 0], q[:, 1], q[:, 2])
    # invalid tris to the very end
    key = jnp.where(tri_mask, morton, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(key)

    v0s, v1s, v2s = v0[order], v1[order], v2[order]
    masks = tri_mask[order]

    pad = (-T) % L
    if pad:
        zpad = jnp.zeros((pad, 3), v0s.dtype)
        v0s = jnp.concatenate([v0s, zpad])
        v1s = jnp.concatenate([v1s, zpad])
        v2s = jnp.concatenate([v2s, zpad])
        masks = jnp.concatenate([masks, jnp.zeros((pad,), bool)])
    C = (T + pad) // L

    M = _tri_intersection_matrix(v0s, v1s, v2s, masks.astype(v0s.dtype))
    # [C, L, 7, 8] -> [C, 7, 8L] with column = field * L + tri (field-major,
    # so kernels can slice fields as contiguous 2D blocks without 3D reshapes)
    tri_mat = M.reshape(C, L, 7, 8).transpose(0, 2, 3, 1).reshape(C, 7, 8 * L)
    if dtype is not None:
        # bf16 storage halves VMEM and speeds the MXU any-hit matmuls; the
        # ~0.4% relative coefficient error only perturbs hits within a thin
        # band around triangle edges (visibility noise on ~1% of edge rays).
        tri_mat = tri_mat.astype(dtype)

    pts = jnp.stack([v0s, v1s, v2s], axis=1).reshape(C, L * 3, 3)
    mk = jnp.repeat(masks.reshape(C, L), 3, axis=1)[..., None]
    lo = jnp.min(jnp.where(mk, pts, big), axis=1)
    hi = jnp.max(jnp.where(mk, pts, -big), axis=1)
    # empty leaves get an inverted AABB that fails every slab test
    return LeafBVH(tri_mat=tri_mat, aabb_lo=lo, aabb_hi=hi)
