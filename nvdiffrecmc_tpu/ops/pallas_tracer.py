"""Pallas TPU kernel for wavefront shadow-ray any-hit tracing.

Replaces the jnp compaction pipeline in tracer.py on TPU.  Design:

- grid over ray blocks (RB rays); each block keeps its rays in VMEM as an
  [RB, 8] feature matrix (ox,oy,oz,dx,dy,dz,1,0).
- the whole leaf table lives in VMEM: AABBs [C, 8] and per-leaf triangle
  intersection matrices [C, 8, 8L] (see bvh.py for the 7x8 construction; row
  7 is zero padding so the matmul operand is 8-row aligned).
- per block, a while_loop walks leaves in Morton order: a vectorized slab
  test picks the rays whose AABB test passes; if none (or every ray is
  already occluded) the leaf's triangle test is skipped, otherwise the
  block does one [RB, 8] @ [8, 8L] MXU matmul and ORs the hits into the
  per-ray occlusion accumulator.  The loop exits early once every ray in
  the block is occluded (any-hit semantics == OPTIX_RAY_FLAG_TERMINATE_ON_
  FIRST_HIT, reference kernel.cu:112).

VMEM budget: C*8*8L*4 bytes for fp32 triangles — up to ~48k triangles at
L=32; build with dtype=bfloat16 for larger scenes (tri data is re-centered
per leaf upstream if precision becomes an issue).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bvh import LeafBVH

BIG = 3e37


def _kernel(rayf_ref, aabb_ref, trimat_ref, occ_ref, *, n_leaves, leaf_size,
            tmin, tmax):
    rayf = rayf_ref[:]                      # [RB, 8]
    RB = rayf.shape[0]
    L = leaf_size

    ox, oy, oz = rayf[:, 0], rayf[:, 1], rayf[:, 2]
    dx, dy, dz = rayf[:, 3], rayf[:, 4], rayf[:, 5]

    def inv(d):
        return jnp.where(jnp.abs(d) > 1e-12, 1.0 / jnp.where(d == 0, 1.0, d),
                         2e12)
    ix, iy, iz = inv(dx), inv(dy), inv(dz)

    occ_ref[:, 0] = jnp.zeros((RB,), jnp.float32)

    CHUNK = 2                               # leaves per pl.when guard
    n_chunks = (n_leaves + CHUNK - 1) // CHUNK

    def slab(c):
        lo0, lo1, lo2 = aabb_ref[c, 0], aabb_ref[c, 1], aabb_ref[c, 2]
        hi0, hi1, hi2 = aabb_ref[c, 3], aabb_ref[c, 4], aabb_ref[c, 5]
        t0x = (lo0 - ox) * ix
        t1x = (hi0 - ox) * ix
        t0y = (lo1 - oy) * iy
        t1y = (hi1 - oy) * iy
        t0z = (lo2 - oz) * iz
        t1z = (hi2 - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.maximum(jnp.minimum(t0z, t1z), tmin))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.minimum(jnp.maximum(t0z, t1z), tmax))
        return tf >= tn

    def tri_test(c, alive):
        """Division-free any-hit against leaf c for rays in `alive`.
        With t = -b/a: t>0 <=> -b*a > 0; q_i = alpha_i + t*beta_i >= 0
        <=> s_i * a >= 0 where s_i = a*alpha_i - b*beta_i."""
        M = trimat_ref[c]                             # [8, 8L] field-major
        E = jnp.dot(rayf.astype(M.dtype), M,
                    preferred_element_type=jnp.float32)
        b_ = E[:, 0 * L:1 * L]
        a = E[:, 1 * L:2 * L]
        ba = (b_ + tmin * a) * a          # t > tmin  <=>  ba < 0
        s0 = a * E[:, 2 * L:3 * L] - b_ * E[:, 5 * L:6 * L]
        s1 = a * E[:, 3 * L:4 * L] - b_ * E[:, 6 * L:7 * L]
        s2 = a * E[:, 4 * L:5 * L] - b_ * E[:, 7 * L:8 * L]
        hit = (ba < 0.0) & (s0 * a >= 0.0) & (s1 * a >= 0.0) & (s2 * a >= 0.0)
        return jnp.any(hit, axis=-1) & alive

    def body(ci, _):
        occ = occ_ref[:, 0] > 0.0
        not_occ = jnp.logical_not(occ)
        base = ci * CHUNK
        alive = [slab(jnp.minimum(base + k, n_leaves - 1)) & not_occ
                 for k in range(CHUNK)]
        any_alive = alive[0]
        for k in range(1, CHUNK):
            any_alive = any_alive | alive[k]

        @pl.when(jnp.any(any_alive))
        def _():
            acc = occ_ref[:, 0]
            for k in range(CHUNK):
                c = jnp.minimum(base + k, n_leaves - 1)
                h = tri_test(c, alive[k])
                acc = jnp.maximum(acc, h.astype(jnp.float32))
            occ_ref[:, 0] = acc

        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


@functools.partial(jax.jit, static_argnames=('ray_block', 'tmin', 'tmax',
                                             'interpret'))
def any_hit_pallas(ro, rd, bvh: LeafBVH, tmin=0.0, tmax=1e16,
                   ray_block=1024, interpret=False):
    """Pallas any-hit over a LeafBVH.  ro/rd: [R, 3].  Returns bool [R].

    Note: tmax is accepted for interface parity but shadow rays are treated
    as infinite (reference uses tmax=1e16, torch_bindings.cpp:109)."""
    R = ro.shape[0]
    C = bvh.aabb_lo.shape[0]
    L = bvh.leaf_size

    pad = (-R) % ray_block
    if pad:
        ro = jnp.concatenate([ro, jnp.full((pad, 3), BIG, ro.dtype)])
        rd = jnp.concatenate([rd, jnp.zeros((pad, 3), rd.dtype)])
    Rp = R + pad

    rayf = jnp.concatenate(
        [ro, rd, jnp.ones((Rp, 1), ro.dtype), jnp.zeros((Rp, 1), ro.dtype)],
        axis=-1)
    # [C, 8, 8L]: pad the 7-row intersection matrix to 8 rows
    trimat = jnp.pad(bvh.tri_mat, ((0, 0), (0, 1), (0, 0)))
    if trimat.dtype == jnp.bfloat16:
        rayf = rayf  # cast happens per-block inside the kernel
    aabb = jnp.concatenate([bvh.aabb_lo, bvh.aabb_hi], axis=-1)  # [C, 6]

    kern = functools.partial(_kernel, n_leaves=C, leaf_size=L,
                             tmin=tmin, tmax=tmax)
    occ = pl.pallas_call(
        kern,
        grid=(Rp // ray_block,),
        in_specs=[
            pl.BlockSpec((ray_block, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 6), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((C, 8, 8 * L), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ray_block, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, 1), jnp.float32),
        interpret=interpret,
    )(rayf, aabb, trimat)
    return occ.reshape(-1)[:R] > 0.0
