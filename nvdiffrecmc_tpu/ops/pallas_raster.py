"""Pallas TPU coverage-resolve kernel for the rasterizer (v2).

The jnp resolve in rasterizer.py is O(pixels x triangles): every pixel block
scans every triangle chunk (385 ms at 512^2 x 10.7k tris, and infeasible at
nerf scale 800^2 x 262k).  This kernel reuses the v4 tracer structure
(pallas_tracer.py) for rasterization:

1. **Setup (jnp)**: per-triangle homogeneous edge/z/sum coefficient rows
   (rasterizer._tri_setup), pre-multiplied by sign(det) and zeroed for
   invalid triangles, packed into chunks of TC=128 triangles laid out
   [8, 5*TC] (fields blocked: e0 | e1 | e2 | z | s) so one [PB, 8] @
   [8, 5*TC] MXU matmul evaluates a whole chunk against a pixel tile.
   Per-chunk screen bbox = union of member triangle bboxes (triangles from
   marching tets / OBJ files are spatially coherent in index order).
2. **Bbox cull (jnp)**: [tiles, chunks] overlap mask of 32x32-pixel tile
   bboxes vs chunk bboxes -> compacted per-tile visit lists
   (pallas_tracer._mask_to_lists).
3. **Main kernel**: per pixel tile, walk the visit list with SMEM scalar
   control flow; chunk coefficients stream HBM->VMEM with double-buffered
   DMA (no VMEM scene ceiling); epilogue = inside tests + running
   (z, tri_id) argmin carried in registers.

Depth peeling: fragments must satisfy z > prev_z + eps, and pixels empty in
the previous layer stay empty (prev_z = +BIG).

The discrete resolve is non-differentiable by design; the differentiable
barycentric recompute for winning triangles stays in rasterizer.py
(matching nvdiffrast semantics consumed at reference render/render.py:308).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_tracer import _mask_to_lists

BIG = 3e37
TC = 128          # triangles per chunk
TILE_H = 32
TILE_W = 32
PB = TILE_H * TILE_W

Z_EPS = 1e-7      # depth-peel strict-behind epsilon (rasterizer.py parity)


def _chunk_coefs(v_clip, tri):
    """Per-chunk packed coefficients + bboxes for one batch element.

    Returns coef [NC, 8, 5*TC] fp32 and bbox [NC, 4] (xlo, ylo, xhi, yhi)
    in NDC.  Rows of coef: (sx, sy, 1, pad*5) features; field blocks on the
    lanes: e0 | e1 | e2 | z | s, each TC wide."""
    from .rasterizer import _tri_setup
    A, az, asum, det, valid = _tri_setup(v_clip, tri)
    T = tri.shape[0]
    ds = jnp.where(valid, jnp.sign(det), 0.0)[:, None]

    e_rows = A * ds[:, :, None]              # [T, 3, 3] edge rows * ds
    z_row = az[:, None, :]                   # [T, 1, 3] (unscaled: true z)
    s_row = (asum * ds)[:, None, :]          # [T, 1, 3]
    # zero out invalid triangles entirely (e == 0 fails the > 0 test)
    fields = jnp.concatenate([e_rows, z_row, s_row], axis=1)  # [T, 5, 3]
    fields = jnp.where(valid[:, None, None], fields, 0.0)

    # screen bboxes: projected extent for all-front triangles; triangles
    # crossing w = 0 project to an unbounded region -> conservative
    # full-screen bbox (they are few; correctness lives in the kernel test)
    p = v_clip[tri]
    w = p[..., 3]
    front = jnp.min(w, -1) > 1e-6
    w_safe = jnp.maximum(jnp.abs(w), 1e-20)
    sx = p[..., 0] / w_safe
    sy = p[..., 1] / w_safe
    big1 = jnp.float32(4.0)                  # off-screen sentinel bbox
    xlo = jnp.where(valid, jnp.where(front, jnp.min(sx, -1), -big1), big1)
    xhi = jnp.where(valid, jnp.where(front, jnp.max(sx, -1), big1), big1)
    ylo = jnp.where(valid, jnp.where(front, jnp.min(sy, -1), -big1), big1)
    yhi = jnp.where(valid, jnp.where(front, jnp.max(sy, -1), big1), big1)

    pad = (-T) % TC
    if pad:
        fields = jnp.concatenate(
            [fields, jnp.zeros((pad, 5, 3), fields.dtype)], 0)
        xlo = jnp.concatenate([xlo, jnp.full((pad,), big1)], 0)
        xhi = jnp.concatenate([xhi, jnp.full((pad,), big1)], 0)
        ylo = jnp.concatenate([ylo, jnp.full((pad,), big1)], 0)
        yhi = jnp.concatenate([yhi, jnp.full((pad,), big1)], 0)
    NC = fields.shape[0] // TC

    # [NC, TC, 5, 3] -> [NC, 3, 5, TC] -> [NC, 8, 5*TC]
    f = fields.reshape(NC, TC, 5, 3).transpose(0, 3, 2, 1).reshape(NC, 3,
                                                                   5 * TC)
    coef = jnp.concatenate(
        [f, jnp.zeros((NC, 5, 5 * TC), jnp.float32)], axis=1)

    bbox = jnp.stack([
        jnp.min(xlo.reshape(NC, TC), -1),
        jnp.min(ylo.reshape(NC, TC), -1),
        jnp.max(xhi.reshape(NC, TC), -1),
        jnp.max(yhi.reshape(NC, TC), -1)], axis=-1)
    return coef, bbox


def _tile_grid(H, W):
    """Tile layout helpers.  Returns (Hp, Wp, nth, ntw, pix [NT, PB, 8],
    tile_bbox [NT, 4]) with NDC mapping identical to rasterizer._pixel_ndc
    (pixels beyond H/W extend the grid past +1 and are cropped outside)."""
    Hp = ((H + TILE_H - 1) // TILE_H) * TILE_H
    Wp = ((W + TILE_W - 1) // TILE_W) * TILE_W
    nth, ntw = Hp // TILE_H, Wp // TILE_W
    sx = (2.0 * (np.arange(Wp, dtype=np.float32) + 0.5) / W) - 1.0
    sy = (2.0 * (np.arange(Hp, dtype=np.float32) + 0.5) / H) - 1.0
    gx, gy = np.meshgrid(sx, sy)
    pix = np.stack([gx, gy, np.ones_like(gx)], -1)       # [Hp, Wp, 3]
    pix = np.concatenate([pix, np.zeros(pix.shape[:2] + (5,), np.float32)],
                         -1)                              # [Hp, Wp, 8]
    pix_t = pix.reshape(nth, TILE_H, ntw, TILE_W, 8).transpose(
        0, 2, 1, 3, 4).reshape(nth * ntw, PB, 8)
    # tile bboxes with half-pixel apron
    hx, hy = 1.0 / W, 1.0 / H
    xlo = pix_t[:, :, 0].min(-1) - hx
    xhi = pix_t[:, :, 0].max(-1) + hx
    ylo = pix_t[:, :, 1].min(-1) - hy
    yhi = pix_t[:, :, 1].max(-1) + hy
    tile_bbox = np.stack([xlo, ylo, xhi, yhi], -1)
    return Hp, Wp, nth, ntw, jnp.asarray(pix_t), jnp.asarray(tile_bbox)


def _to_tiles(img_flat, H, W, nth, ntw, pad_value):
    """[H*W] -> [NT, PB] in tile layout, padding to (Hp, Wp)."""
    Hp, Wp = nth * TILE_H, ntw * TILE_W
    x = img_flat.reshape(H, W)
    x = jnp.pad(x, ((0, Hp - H), (0, Wp - W)), constant_values=pad_value)
    return x.reshape(nth, TILE_H, ntw, TILE_W).transpose(0, 2, 1, 3).reshape(
        nth * ntw, PB)


def _from_tiles(tiles, H, W, nth, ntw):
    """[NT, PB] -> [H, W]."""
    x = tiles.reshape(nth, ntw, TILE_H, TILE_W).transpose(0, 2, 1, 3).reshape(
        nth * TILE_H, ntw * TILE_W)
    return x[:H, :W]


def _resolve_kernel(lists_hbm, pix_ref, prev_ref, coef_hbm, out_ref,
                    coef_vmem, lst, sems, lsem):
    """Per-tile list walk.  prev_ref [1, PB, 2] row 0 = prev_z (already
    encoded: -BIG for layer 0, +BIG for stay-empty); out [1, PB, 2] =
    (best_z or 0, best_id float, 0 = empty)."""
    i = pl.program_id(0)

    ldma = pltpu.make_async_copy(lists_hbm.at[i], lst, lsem)
    ldma.start()

    pix = pix_ref[0]                       # [PB, 8]
    pz = prev_ref[0][:, 0:1]               # [PB, 1]
    pid = prev_ref[0][:, 1:2]              # [PB, 1] previous tri id (float)
    out_ref[0] = jnp.zeros((PB, 2), jnp.float32)

    ldma.wait()
    Wl = lst.shape[1]
    n = lst[0, 0]

    def chunk_id(j):
        k = 1 + j
        return lst[jax.lax.div(k, Wl), jax.lax.rem(k, Wl)]

    def dma(slot, j):
        return pltpu.make_async_copy(
            coef_hbm.at[chunk_id(j)], coef_vmem.at[slot], sems.at[slot])

    @pl.when(n > 0)
    def _():
        dma(0, 0).start()
        best_z0 = jnp.full((PB, 1), BIG, jnp.float32)
        best_i0 = jnp.zeros((PB, 1), jnp.float32)

        def body(j, carry):
            best_z, best_i = carry
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < n)
            def _():
                dma(1 - slot, j + 1).start()

            dma(slot, j).wait()
            E = jnp.dot(pix, coef_vmem[slot],
                        preferred_element_type=jnp.float32)   # [PB, 5*TC]
            e0 = E[:, 0:TC]
            e1 = E[:, TC:2 * TC]
            e2 = E[:, 2 * TC:3 * TC]
            z = E[:, 3 * TC:4 * TC]
            s = E[:, 4 * TC:5 * TC]
            cid = chunk_id(j)
            lane = jax.lax.broadcasted_iota(jnp.int32, (PB, TC),
                                            1).astype(jnp.float32)
            ids = cid.astype(jnp.float32) * TC + lane + 1.0   # global ids
            inside = ((e0 > 0.0) & (e1 > 0.0) & (e2 > 0.0) & (s > 0.0)
                      & (z >= -1.0) & (z <= 1.0) & (z > pz + Z_EPS)
                      & (ids != pid))
            zm = jnp.where(inside, z, BIG)
            zmin = jnp.min(zm, axis=-1, keepdims=True)        # [PB, 1]
            lsel = jnp.min(jnp.where(zm == zmin, lane, float(TC)),
                           axis=-1, keepdims=True)
            idx = cid.astype(jnp.float32) * TC + lsel + 1.0
            better = zmin < best_z
            best_z = jnp.where(better, zmin, best_z)
            best_i = jnp.where(better, idx, best_i)
            return best_z, best_i

        best_z, best_i = jax.lax.fori_loop(0, n, body, (best_z0, best_i0))
        hit = best_z < BIG
        out_ref[0] = jnp.concatenate(
            [jnp.where(hit, best_z, 0.0), jnp.where(hit, best_i, 0.0)],
            axis=-1)


@functools.partial(jax.jit, static_argnames=('H', 'W', 'interpret'))
def resolve_batch(v_clip, tri, H, W, prev_z, prev_id, interpret=False):
    """Coverage resolve for a batch: v_clip [N, V, 4]; tri [T, 3];
    prev_z [N, H*W] already encoded for peeling (-BIG layer 0, +BIG for
    stay-empty pixels); prev_id [N, H*W] int32 (tri_id+1 of the previous
    layer, excluded from this layer).  Returns (z [N,H,W], id [N,H,W]
    int32, tri_id+1, 0 empty).  Non-differentiable."""
    N = v_clip.shape[0]
    Hp, Wp, nth, ntw, pix_t, tile_bbox = _tile_grid(H, W)
    NT = nth * ntw

    coef, bbox = jax.vmap(lambda vc: _chunk_coefs(vc, tri))(v_clip)
    NC = coef.shape[1]
    coef_all = coef.reshape(N * NC, 8, 5 * TC)

    # [N, NT, NC] overlap masks -> flat [N*NT, NC] lists with global chunk
    # ids (b * NC + c)
    def masks_one(bb):
        o = ((tile_bbox[:, None, 0] <= bb[None, :, 2])
             & (tile_bbox[:, None, 2] >= bb[None, :, 0])
             & (tile_bbox[:, None, 1] <= bb[None, :, 3])
             & (tile_bbox[:, None, 3] >= bb[None, :, 1]))
        return o.astype(jnp.int32)

    masks = jax.vmap(masks_one)(bbox)                 # [N, NT, NC]
    counts, lists = _mask_to_lists(masks.reshape(N * NT, NC))
    offs = (jnp.arange(N, dtype=jnp.int32)
            * NC)[:, None].repeat(NT, 1).reshape(-1, 1)
    lists = lists + offs
    merged = jnp.concatenate([counts[:, None], lists], axis=1)
    Cl = ((merged.shape[1] + 1023) // 1024) * 1024
    merged = jnp.pad(merged, ((0, 0), (0, Cl - merged.shape[1])))
    merged = merged.reshape(N * NT, 8, Cl // 8)

    pz_t = jax.vmap(lambda p: _to_tiles(p, H, W, nth, ntw, BIG))(prev_z)
    # previous-layer tri ids offset into the global (batch-merged) id space
    boffs_i = (jnp.arange(N, dtype=jnp.float32) * NC * TC)[:, None]
    pid_g = jnp.where(prev_id > 0,
                      prev_id.astype(jnp.float32) + boffs_i, 0.0)
    pid_t = jax.vmap(lambda p: _to_tiles(p, H, W, nth, ntw, 0.0))(pid_g)
    prev = jnp.stack([pz_t.reshape(N * NT, PB),
                      pid_t.reshape(N * NT, PB)], axis=-1)
    pix_all = jnp.broadcast_to(pix_t[None], (N, NT, PB, 8)).reshape(
        N * NT, PB, 8)

    out = pl.pallas_call(
        _resolve_kernel,
        grid=(N * NT,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),     # lists in HBM
            pl.BlockSpec((1, PB, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PB, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),     # coef chunks in HBM
        ],
        out_specs=pl.BlockSpec((1, PB, 2), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N * NT, PB, 2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 8, 5 * TC), jnp.float32),
            pltpu.SMEM((8, Cl // 8), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(merged, pix_all, prev, coef_all)

    z_t = out[..., 0].reshape(N, NT, PB)
    # local id -> global tri id: subtract this batch element's chunk offset
    id_t = out[..., 1].reshape(N, NT, PB)
    boffs = (jnp.arange(N, dtype=jnp.float32) * NC * TC)[:, None, None]
    id_t = jnp.where(id_t > 0, id_t - boffs, 0.0)

    def untile(x):
        return jax.vmap(lambda t: _from_tiles(t, H, W, nth, ntw))(x)

    z = untile(z_t)
    tid = untile(id_t).astype(jnp.int32)
    return z, tid
