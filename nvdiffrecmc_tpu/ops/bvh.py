"""Two-level ray-acceleration structure built fresh on-device each iteration
(the capability of per-iteration `optix_build_bvh`,
/root/reference/render/optixutils/c_src/torch_bindings.cpp:37-116 — rebuilt
every getMesh(), geometry/dmtet.py:201-202).

TPU-first design: instead of a pointer-chasing BVH (divergent gathers), we
Morton-sort triangles by centroid and group them into fixed-size leaves, with
a second level of "supernode" AABBs over groups of consecutive leaves so
traversal can skip SUPER leaves with one test.  Traversal is a dense
ray x AABB slab test (vectorized, static shapes) followed by block triangle
tests where every ray in a block shares the leaf's triangle data — the
ray-triangle inner loop becomes an MXU matmul (see pallas_tracer.py).

Triangles are stored in a Plücker-coordinate "intersection matrix": with ray
features f = [d, m=o x d, o, 1] (padded to 16), all quantities of an any-hit
test are LINEAR in f:

  e_i  = d . V_i + m . U_i     (Plücker side test against edge i; U = b - a,
                                V = a x b)
  num  = n . p0 - n . o        (t numerator;  n = unnormalized face normal)
  den  = n . d                 (t denominator)

  hit  <=>  e0,e1,e2 all share a sign  AND  num * den > 0   (t > 0)

so a leaf test is one [R, 16] @ [16, 5L] matmul plus an 8-op epilogue —
far fewer VPU epilogue ops per triangle than evaluating barycentrics.
Zeroed (padded/masked) triangle columns give num*den == 0 -> never hit.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

K_FEATS = 16     # ray feature rows (10 used: d, m, o, 1; padded to 16)
N_FIELDS = 5     # e0, e1, e2, num, den
SUPER = 8        # leaves per supernode


def default_tri_dtype():
    """Production triangle-matrix dtype: bf16 on TPU (2x MXU rate, half the
    leaf DMA; coefficient rounding perturbs hits only in a thin band around
    triangle edges — Monte-Carlo visibility noise, not bias), fp32 elsewhere
    so the CPU twin stays bit-exact against brute force.  Override with
    NVDR_TRI_DTYPE=float32|bfloat16."""
    import os
    ov = os.environ.get('NVDR_TRI_DTYPE')
    if ov:
        return {'float32': jnp.float32, 'fp32': jnp.float32,
                'bfloat16': jnp.bfloat16, 'bf16': jnp.bfloat16}[ov]
    import jax
    return jnp.bfloat16 if jax.default_backend() == 'tpu' else jnp.float32


class LeafBVH(NamedTuple):
    tri_mat: jnp.ndarray    # [C, 16, 5*L] per-leaf Plücker matrices, field-major
    aabb_lo: jnp.ndarray    # [C, 3]
    aabb_hi: jnp.ndarray    # [C, 3]
    super_lo: jnp.ndarray   # [S, 3] supernode AABBs (S = ceil(C / SUPER))
    super_hi: jnp.ndarray   # [S, 3]

    @property
    def leaf_size(self):
        return self.tri_mat.shape[2] // N_FIELDS

    @property
    def n_leaves(self):
        return self.aabb_lo.shape[0]


def ray_features(o, d):
    """[R, 16] Plücker ray features [d, o x d, o, 1, 0...] matching
    the tri_mat rows."""
    R = o.shape[0]
    m = jnp.cross(o, d)
    return jnp.concatenate(
        [d, m, o, jnp.ones((R, 1), o.dtype), jnp.zeros((R, 6), o.dtype)],
        axis=-1)


def _xor_epilogue_on():
    """Sign tests via int xor instead of float products (NVDR_XOR_EPILOGUE,
    read at trace time).  ~3 fewer wide VPU ops per leaf visit; differs
    from the product form only on measure-zero edge cases (an exact-zero
    barycentric field next to two negatives counts as same-sign under
    `x*0 >= 0` but not under sign-bit xor)."""
    import os
    return os.environ.get('NVDR_XOR_EPILOGUE', '0') not in ('0', 'false', '')


def decode_hits(E, L, tmin=0.0):
    """Epilogue of the matmul test: E [..., 5L] field-major -> hit [..., L].

    tmin shifts the positivity test: t > tmin  <=>  (num - tmin*den)*den > 0.
    """
    e0 = E[..., 0 * L:1 * L]
    e1 = E[..., 1 * L:2 * L]
    e2 = E[..., 2 * L:3 * L]
    num = E[..., 3 * L:4 * L]
    den = E[..., 4 * L:5 * L]
    num = num - tmin * den
    if _xor_epilogue_on():
        def bc(x):
            return jax.lax.bitcast_convert_type(x, jnp.int32)
        # sign bit of the or-of-xors is set iff any pair disagrees; the
        # t-positivity test keeps one float product for its != 0 part
        # (zeroed/padded triangles have num = den = 0 -> never hit)
        m = (bc(e0) ^ bc(e1)) | (bc(e1) ^ bc(e2)) | (bc(num) ^ bc(den))
        return (m >= 0) & (num * den != 0.0)
    same_sign = (e0 * e1 >= 0.0) & (e1 * e2 >= 0.0) & (e0 * e2 >= 0.0)
    return same_sign & (num * den > 0.0)


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


def _tri_plucker_matrix(v0, v1, v2, valid):
    """[T, 16, 5] per-triangle columns for the Plücker any-hit test.
    Invalid triangles are zeroed (num*den == 0 -> never hit)."""
    n = jnp.cross(v1 - v0, v2 - v0)

    T = v0.shape[0]
    M = jnp.zeros((T, K_FEATS, N_FIELDS), dtype=v0.dtype)
    for i, (a, b) in enumerate(((v0, v1), (v1, v2), (v2, v0))):
        U = b - a
        V = jnp.cross(a, b)
        M = M.at[:, 0:3, i].set(V)      # dot with d
        M = M.at[:, 3:6, i].set(U)      # dot with m
    M = M.at[:, 6:9, 3].set(-n)          # num: -n . o
    M = M.at[:, 9, 3].set(jnp.sum(n * v0, axis=-1))   # + n . p0
    M = M.at[:, 0:3, 4].set(n)           # den: n . d
    return M * valid[:, None, None]


@partial(jax.jit, static_argnames=('leaf_size', 'dtype'))
def build(v_pos, tri, tri_mask=None, leaf_size=128, dtype=None):
    """Build the two-level structure.  Static output shapes: C = ceil(T/L)
    leaves, S = ceil(C/SUPER) supernodes.  Invalid (masked/padded) triangles
    sort to the end and get empty AABBs so they are never visited."""
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

    M = _tri_plucker_matrix(v0s, v1s, v2s, masks.astype(v0s.dtype))
    # [C, L, 16, 5] -> [C, 16, 5L] with lane = field * L + tri (field-major,
    # so kernels can slice fields as contiguous 2D blocks without 3D reshapes)
    tri_mat = M.reshape(C, L, K_FEATS, N_FIELDS).transpose(0, 2, 3, 1)
    tri_mat = tri_mat.reshape(C, K_FEATS, N_FIELDS * L)
    if dtype is not None:
        # bf16 storage halves VMEM/DMA and cuts MXU passes; the relative
        # coefficient error only perturbs hits within a thin band around
        # triangle edges (visibility noise on ~1% of edge rays).
        tri_mat = tri_mat.astype(dtype)

    pts = jnp.stack([v0s, v1s, v2s], axis=1).reshape(C, L * 3, 3)
    mk = jnp.repeat(masks.reshape(C, L), 3, axis=1)[..., None]
    # empty leaves get an inverted AABB that fails every slab test
    lo = jnp.min(jnp.where(mk, pts, big), axis=1)
    hi = jnp.max(jnp.where(mk, pts, -big), axis=1)

    spad = (-C) % SUPER
    lo_p = jnp.concatenate([lo, jnp.full((spad, 3), big)]) if spad else lo
    hi_p = jnp.concatenate([hi, jnp.full((spad, 3), -big)]) if spad else hi
    S = (C + spad) // SUPER
    super_lo = jnp.min(lo_p.reshape(S, SUPER, 3), axis=1)
    super_hi = jnp.max(hi_p.reshape(S, SUPER, 3), axis=1)
    return LeafBVH(tri_mat=tri_mat, aabb_lo=lo, aabb_hi=hi,
                   super_lo=super_lo, super_hi=super_hi)
