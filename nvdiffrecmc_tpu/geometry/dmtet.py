"""Differentiable marching tetrahedra with static shapes.

Capability parity with /root/reference/geometry/dmtet.py:91-141 re-designed
for XLA: the reference emits variable-length vertex/triangle lists via
torch.unique + boolean indexing; here the unique-edge table and per-tet
edge maps are precomputed on the host once (topology of the tet grid is
fixed), every unique edge owns a potential vertex slot, and triangles are
compacted into a fixed MAX_TRIS buffer with a validity mask.  Everything
inside `marching_tets` is jit-compatible and differentiable w.r.t. sdf and
deform exactly like the reference (zero-crossing interpolation).
"""

import os
from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np

from ..render import mesh as mesh_mod
from ..render import render as render_mod
from ..render import regularizer
from ..ops import bvh as bvh_mod

# marching-tets tables (public domain marching tetrahedra configuration,
# same convention as reference dmtet.py:21-42)
TRIANGLE_TABLE = np.array([
    [-1, -1, -1, -1, -1, -1],
    [1, 0, 2, -1, -1, -1],
    [4, 0, 3, -1, -1, -1],
    [1, 4, 2, 1, 3, 4],
    [3, 1, 5, -1, -1, -1],
    [2, 3, 0, 2, 5, 3],
    [1, 4, 0, 1, 5, 4],
    [4, 2, 5, -1, -1, -1],
    [4, 5, 2, -1, -1, -1],
    [4, 1, 0, 4, 5, 1],
    [3, 2, 0, 3, 5, 2],
    [1, 3, 5, -1, -1, -1],
    [4, 1, 2, 4, 3, 1],
    [3, 0, 4, -1, -1, -1],
    [2, 0, 1, -1, -1, -1],
    [-1, -1, -1, -1, -1, -1],
], dtype=np.int32)

NUM_TRIANGLES_TABLE = np.array([0, 1, 1, 2, 1, 2, 2, 1, 1, 2, 2, 1, 2, 1, 1, 0],
                               dtype=np.int32)
BASE_TET_EDGES = np.array([0, 1, 0, 2, 0, 3, 1, 2, 1, 3, 2, 3], dtype=np.int32)


def kuhn_tet_grid(res):
    """Fallback tetrahedral grid: res^3 cube cells, 6 tets each (Kuhn
    triangulation), vertices in [-0.5, 0.5]^3 — used when no quartet-
    generated .npz is available.  Positive orientation per tet."""
    r = res
    xs = np.linspace(-0.5, 0.5, r + 1, dtype=np.float32)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing='ij')
    verts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)

    def vid(i, j, k):
        return (i * (r + 1) + j) * (r + 1) + k

    ii, jj, kk = np.meshgrid(np.arange(r), np.arange(r), np.arange(r),
                             indexing='ij')
    c = np.stack([ii, jj, kk], axis=-1).reshape(-1, 3)
    corners = np.stack([vid(c[:, 0] + dx, c[:, 1] + dy, c[:, 2] + dz)
                        for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
                       axis=-1)  # order: x*4 + y*2 + z
    # Kuhn: 6 tets along the main diagonal 0 -> 7, one per axis permutation;
    # odd permutations get two vertices swapped so every tet has positive
    # orientation (required for consistent marching-tets surface winding).
    paths = [(4, 6, False), (4, 5, True), (2, 6, True),
             (2, 3, False), (1, 5, False), (1, 3, True)]
    tets = []
    for a, b, flip in paths:
        if flip:
            a, b = b, a
        tets.append(np.stack([corners[:, 0], corners[:, a], corners[:, b],
                              corners[:, 7]], axis=-1))
    idx = np.concatenate(tets, axis=0).astype(np.int32)
    return verts, idx


def _precompute_edge_tables(indices):
    """Host-side: unique undirected edges of the tet grid + per-tet map from
    the 6 local edges to unique edge ids."""
    t = np.asarray(indices)
    e = t[:, BASE_TET_EDGES].reshape(-1, 2)           # [Nt*6, 2]
    e = np.sort(e, axis=1)
    uniq, inv = np.unique(e, axis=0, return_inverse=True)
    return uniq.astype(np.int32), inv.reshape(-1, 6).astype(np.int32)


def map_uv_tables(num_tets):
    """Static per-tet UV atlas (reference dmtet.py:54-82): each tet owns a
    cell in an NxN chart grid holding a padded quad (two triangles)."""
    N = int(np.ceil(np.sqrt((num_tets * 2 + 1) // 2)))
    tex_y, tex_x = np.meshgrid(
        np.linspace(0, 1 - (1 / N), N, dtype=np.float32),
        np.linspace(0, 1 - (1 / N), N, dtype=np.float32), indexing='ij')
    pad = 0.9 / N
    uvs = np.stack([
        tex_x, tex_y,
        tex_x + pad, tex_y,
        tex_x + pad, tex_y + pad,
        tex_x, tex_y + pad,
    ], axis=-1).reshape(-1, 2).astype(np.float32)
    return uvs, N


def marching_tets(v_deformed_t, sdf, tet_idx_t, edge_uniq_t, edge_map_t,
                  max_tris, max_verts=None):
    """Extract the zero-level-set mesh.

    All grid-sized tensors are TRANSPOSED — [k, huge] instead of [huge, k] —
    because XLA:TPU materializes [huge, k<128] temporaries in (8,128)-tiled
    layouts, padding the minor dim to 128 (measured 42.7x HBM expansion at
    dmtet_grid 128: a 288 MB gather temp became 12 GB and OOMed the chip).
    Vertices are additionally COMPACTED to the crossing edges only via a
    static max_verts buffer (defaults to max_tris; a closed triangle mesh
    has V ~= T/2, so this carries 2x headroom): at grid 128 there are 14.9M
    unique tet edges but only ~100k crossing ones, and every downstream
    consumer (normals, tangents, BVH, rasterizer) scales with the vertex
    buffer.

    v_deformed_t [3,Nv], sdf [Nv], tet_idx_t [4,Nt] int32, edge_uniq_t [2,E],
    edge_map_t [6,Nt].  Returns (verts [max_verts,3] compact, faces
    [max_tris,3] int32 into the compact vertex array, face_gidx [max_tris]
    slot-major (tet = gidx % Nt, tri = gidx // Nt), tri_mask [max_tris],
    overflow bool — true if either buffer truncated)."""
    if max_verts is None:
        max_verts = max_tris
    Nt = tet_idx_t.shape[1]
    E = edge_uniq_t.shape[1]
    occ = sdf > 0
    occ_f = occ[tet_idx_t].astype(jnp.int32)                   # [4,Nt]
    tetindex = (occ_f * jnp.array([1, 2, 4, 8])[:, None]).sum(axis=0)

    # compact vertex slots: one per sign-crossing unique edge.  cumsum gives
    # every edge its compact position without any scatter.
    e0, e1 = edge_uniq_t[0], edge_uniq_t[1]                    # [E]
    active_edge = occ[e0] != occ[e1]                           # [E]
    cpos = jnp.cumsum(active_edge.astype(jnp.int32)) - 1       # [E]
    n_active = jnp.sum(active_edge.astype(jnp.int32))
    vert_overflow = n_active > max_verts
    remap = jnp.clip(cpos, 0, max_verts - 1)                   # [E]
    (sel_e,) = jnp.nonzero(active_edge, size=max_verts, fill_value=0)

    # zero-crossing interpolation on the selected edges only (differentiable
    # w.r.t. endpoint positions and sdf, reference dmtet.py:111-118)
    ge0 = e0[sel_e]
    ge1 = e1[sel_e]
    s0 = sdf[ge0]
    s1 = sdf[ge1]
    p0 = v_deformed_t[:, ge0]                                  # [3,max_verts]
    p1 = v_deformed_t[:, ge1]
    denom = s0 - s1
    denom = jnp.where(jnp.abs(denom) > 1e-10, denom,
                      jnp.where(denom >= 0, 1e-10, -1e-10))
    w0 = -s1 / denom
    w1 = s0 / denom
    verts_t = p0 * w0[None, :] + p1 * w1[None, :]
    vmask = jnp.arange(max_verts) < n_active
    # unused slots have meaningless interpolation; park them at the midpoint
    verts_t = jnp.where(vmask[None, :], verts_t, (p0 + p1) * 0.5)
    verts = verts_t.T                                          # [max_verts,3]

    # triangle slots: 2 per tet, slot-major ([all tets slot 0 | slot 1])
    tt_t = jnp.asarray(TRIANGLE_TABLE.T)                       # [6,16]
    ntt = jnp.asarray(NUM_TRIANGLES_TABLE)
    n_tri = ntt[tetindex]                                      # [Nt]
    local_t = tt_t[:, tetindex]                                # [6,Nt]
    # map local edge slots to unique-edge ids
    gathered_t = jnp.take_along_axis(edge_map_t, jnp.clip(local_t, 0), axis=0)
    slot_faces_t = jnp.concatenate([gathered_t[0:3], gathered_t[3:6]],
                                   axis=1)                     # [3, 2*Nt]
    flat_valid = jnp.concatenate([n_tri >= 1, n_tri >= 2])     # [2*Nt]

    (sel,) = jnp.nonzero(flat_valid, size=max_tris, fill_value=2 * Nt)
    overflow = (jnp.sum(flat_valid) > max_tris) | vert_overflow
    tri_mask = (sel < 2 * Nt).astype(jnp.float32)
    sel_c = jnp.clip(sel, 0, 2 * Nt - 1)
    faces_e = slot_faces_t[:, sel_c]                           # [3,max_tris]
    faces = remap[faces_e].T                                   # [max_tris,3]
    faces = jnp.where(tri_mask[:, None] > 0, faces, 0).astype(jnp.int32)
    face_gidx = jnp.where(tri_mask > 0, sel_c, 0).astype(jnp.int32)
    return verts, faces, face_gidx, tri_mask, overflow


def face_uvs(face_gidx, n_tets, uv_N):
    """Per-face UV corners of the static per-tet chart atlas (reference
    dmtet.py:54-82), computed arithmetically from the slot-major face index
    instead of a stored [4*Nt, 2] table (50M rows at grid 128).

    Returns (v_tex [3*T, 2], t_tex_idx [T, 3])."""
    tet = face_gidx % n_tets
    tri = face_gidx // n_tets
    ii = tet // uv_N                       # chart row    -> y
    jj = tet % uv_N                        # chart column -> x
    base = jnp.stack([jj.astype(jnp.float32) / uv_N,
                      ii.astype(jnp.float32) / uv_N], axis=-1)   # [T,2]
    pad = 0.9 / uv_N
    offs = jnp.asarray([[[0.0, 0.0], [pad, 0.0], [pad, pad]],
                        [[0.0, 0.0], [pad, pad], [0.0, pad]]],
                       dtype=jnp.float32)  # [2 tris, 3 corners, 2]
    uv = base[:, None, :] + offs[tri]                            # [T,3,2]
    T = face_gidx.shape[0]
    return uv.reshape(-1, 2), jnp.arange(3 * T, dtype=jnp.int32).reshape(-1, 3)


def sdf_reg_loss(sdf, all_edges_t):
    """Sign-consistency BCE over sign-crossing tet edges
    (reference dmtet.py:147-153); masked mean replaces boolean indexing.
    all_edges_t is transposed [2, E]."""
    s0 = sdf[all_edges_t[0]]
    s1 = sdf[all_edges_t[1]]
    mask = (jnp.sign(s0) != jnp.sign(s1)).astype(jnp.float32)

    def bce_logits(logit, target):
        return (jnp.clip(logit, 0) - logit * target
                + jnp.log1p(jnp.exp(-jnp.abs(logit))))

    b = bce_logits(s0, (s1 > 0).astype(jnp.float32)) \
        + bce_logits(s1, (s0 > 0).astype(jnp.float32))
    return jnp.sum(b * mask) / jnp.clip(jnp.sum(mask), min=1.0)


class DMTetGeometry:
    """Topology-free geometry trainer (reference dmtet.py:159-246).

    Parameters (a pytree dict): {'sdf': [Nv], 'deform': [Nv,3]}."""

    def __init__(self, grid_res, scale, FLAGS, tets_path=None, max_tris=None,
                 seed=0):
        self.uid = mesh_mod.next_geometry_uid()
        self.FLAGS = FLAGS
        self.grid_res = grid_res
        path = tets_path or os.path.join(
            FLAGS.get('data_root', '.'), 'data', 'tets',
            '{}_tets.npz'.format(grid_res))
        if os.path.exists(path):
            tets = np.load(path)
            tet_verts = np.asarray(tets['vertices'], dtype=np.float32)
            tet_idx = np.asarray(tets['indices'], dtype=np.int32)
        else:
            print('tet grid %s not found; generating Kuhn grid' % path)
            tet_verts, tet_idx = kuhn_tet_grid(grid_res)
            try:  # cache for subsequent runs (large grids take minutes on
                os.makedirs(os.path.dirname(path), exist_ok=True)  # 1 core)
                np.savez(path, vertices=tet_verts, indices=tet_idx)
            except OSError:
                pass
        # stored TRANSPOSED ([k, huge]) — see marching_tets docstring
        self.verts = jnp.asarray(tet_verts.T) * scale            # [3, Nv]
        self.indices = jnp.asarray(tet_idx.T)                    # [4, Nt]
        # edge tables: np.unique over n_tets*6 edges is minutes at r=128 on
        # one core — cache beside the grid, keyed by tet count
        epath = os.path.join('data', 'tets',
                             'edges_%d_%d.npz' % (grid_res, tet_idx.shape[0]))
        if os.path.exists(epath):
            e = np.load(epath)
            edge_uniq, edge_map = e['uniq'], e['map']
        else:
            edge_uniq, edge_map = _precompute_edge_tables(tet_idx)
            try:
                os.makedirs(os.path.dirname(epath), exist_ok=True)
                np.savez(epath, uniq=edge_uniq, map=edge_map)
            except OSError:
                pass
        self.edge_uniq = jnp.asarray(edge_uniq.T)                # [2, E]
        self.edge_map = jnp.asarray(edge_map.T)                  # [6, Nt]
        num_tets = int(self.indices.shape[1])
        self.num_tets = num_tets
        # chart-grid size of the per-tet UV atlas; the per-face corner uvs
        # are computed on the fly (face_uvs) instead of storing [4*Nt, 2]
        self.uv_N = int(np.ceil(np.sqrt((num_tets * 2 + 1) // 2)))
        # MAX_TRIS: the surface of a blob at grid resolution r has O(r^2)
        # crossing tets.  The reference's uniform-random SDF init (rand-0.1,
        # dmtet.py:195) measures 72k surface tris at r=64, decaying as the
        # SDF smooths, so 16*r^2 truncates the first iterations (observed
        # via the tri_count overflow warning); 24*r^2 covers init with
        # margin (r=64 -> 98k slots, r=128 -> 393k).  Slots past the live
        # count are near-free: their raster chunks bbox-cull and their BVH
        # leaves have inverted AABBs, so only the setup matmuls see them.
        self.max_tris = max_tris or 24 * grid_res * grid_res
        # SDF init.  'random' is the reference's uniform init (rand-0.1,
        # /root/reference/geometry/dmtet.py:195): ~90% of verts start
        # "inside", producing a volume-filling blob that the optimizer must
        # carve away — the blob phase dominates early pass-1 cost (block
        # visit-list unions cover most leaves, PERF_NOTES round-4) and eats
        # a large share of a reduced iteration budget.  'sphere' starts from
        # the signed distance to a sphere enclosing the normalized scene
        # a standard DMTet warm start that skips the carve-the-blob
        # transient entirely; topology remains free (the sphere splits and
        # carves like any SDF).  r = 0.45*scale, strictly inside the
        # [-scale/2, scale/2] grid: at 0.5*scale the sphere is TANGENT to
        # all six faces and the near-zero SDF shells there blow the
        # crossing-tet count past max_tris (overflow at init).  Default
        # stays 'random' (reference parity).
        if str(FLAGS.get('sdf_init', 'random')) == 'sphere':
            v = np.asarray(self.verts)                         # [3, Nv]
            sdf = (0.45 * scale
                   - np.linalg.norm(v, axis=0)).astype(np.float32)
        else:
            rng = np.random.RandomState(seed)
            sdf = rng.rand(self.verts.shape[1]).astype(np.float32) - 0.1
        self.init_params = {
            'sdf': jnp.asarray(sdf),
            'deform': jnp.zeros_like(self.verts),   # [3, Nv] transposed
        }

    def parameters(self):
        return self.init_params

    # The grid tables scale as O(grid_res^3) (~1 GB total at r=128).  If a
    # jitted train step closes over them they are embedded as literal
    # constants in the serialized module, which the remote-compile endpoint
    # rejects (HTTP 413, PERF_NOTES.md session 5) — and under multi-chip
    # they'd be replicated per-program instead of shardable.  consts() /
    # bind_consts() let the driver pass them as explicit jit arguments:
    # trace-time attribute swap, restored after tracing.
    BIG_ATTRS = ('verts', 'indices', 'edge_uniq', 'edge_map')

    def getAABB(self):
        return (jnp.min(self.verts, axis=1), jnp.max(self.verts, axis=1))

    def consts(self):
        return {k: getattr(self, k) for k in self.BIG_ATTRS}

    @contextmanager
    def bind_consts(self, consts):
        if consts is None:
            yield
            return
        old = {k: getattr(self, k) for k in consts}
        try:
            for k, v in consts.items():
                setattr(self, k, v)
            yield
        finally:
            for k, v in old.items():
                setattr(self, k, v)

    def tri_count(self, params):
        """Host-side overflow check: (n_surface_tris, max_tris slots).

        The static-shape marching tets silently drops triangles past
        `max_tris` (the reference's dynamic shapes, dmtet.py:126-137, never
        truncate) — the driver polls this at its host-sync points and warns
        loudly so truncation is never a silent wrong-gradient failure."""
        if not hasattr(self, '_tri_count_jit'):
            @jax.jit
            def f(sdf, indices_t):  # [4,Nt] as arg, not a 413-sized const
                occ = sdf > 0
                occ_f = occ[indices_t].astype(jnp.int32)
                tetindex = (occ_f
                            * jnp.array([1, 2, 4, 8])[:, None]).sum(axis=0)
                ntt = jnp.asarray(NUM_TRIANGLES_TABLE)
                return jnp.sum(ntt[tetindex])
            self._tri_count_jit = f
        return (int(self._tri_count_jit(params['sdf'], self.indices)),
                self.max_tris)

    def getMesh(self, params, material, build_bvh=True, leaf_size=128):
        v_deformed = (self.verts
                      + 2.0 / (self.grid_res * 2) * jnp.tanh(params['deform']))
        verts, faces, face_gidx, tri_mask, _ = marching_tets(
            v_deformed, params['sdf'], self.indices, self.edge_uniq,
            self.edge_map, self.max_tris)
        v_tex, t_tex_idx = face_uvs(face_gidx, self.indices.shape[1],
                                    self.uv_N)
        m = mesh_mod.Mesh(v_pos=verts, t_pos_idx=faces, v_tex=v_tex,
                          t_tex_idx=t_tex_idx, tri_mask=tri_mask,
                          material=material)
        m = mesh_mod.auto_normals(m)
        m = mesh_mod.compute_tangents(m)
        bvh = bvh_mod.build(m.v_pos, m.t_pos_idx, tri_mask=tri_mask > 0,
                            leaf_size=leaf_size,
                            dtype=bvh_mod.default_tri_dtype()
                            ) if build_bvh else None
        return m, bvh

    def tick(self, params, material, lgt, target, loss_fn, iteration, FLAGS,
             denoiser_sigma, perms, key, rnd_seed):
        """One loss evaluation (reference dmtet.py:210-246).  Pure function of
        params; returns (img_loss, reg_loss)."""
        t_iter = iteration / FLAGS['iter']
        color_ref = target['img']

        opt_mesh, bvh = self.getMesh(params, material)
        # budget-scaled: it/1750 at the reference's 5000-iter budget
        # (reference dmtet.py:220), proportional otherwise (config.py)
        shadow_ramp = jnp.minimum(
            iteration / FLAGS.get('shadow_ramp_iters', 1750.0), 1.0)

        buffers = render_mod.render_mesh(
            FLAGS, opt_mesh, target['mvp'], target['campos'], lgt,
            target['resolution'], bvh, perms, key, spp=target['spp'],
            num_layers=FLAGS['layers'], msaa=True,
            background=target['background'],
            denoiser_sigma=denoiser_sigma, shadow_scale=shadow_ramp,
            rnd_seed=rnd_seed)

        img_loss = jnp.mean(
            (buffers['shaded'][..., 3:] - color_ref[..., 3:]) ** 2)
        img_loss += loss_fn(buffers['shaded'][..., 0:3] * color_ref[..., 3:],
                            color_ref[..., 0:3] * color_ref[..., 3:])

        sdf_weight = (FLAGS['sdf_regularizer']
                      - (FLAGS['sdf_regularizer'] - 0.01)
                      * jnp.minimum(1.0, 4.0 * t_iter))
        reg_loss = sdf_reg_loss(params['sdf'], self.edge_uniq) * sdf_weight

        reg_loss += regularizer.shading_loss(
            buffers['diffuse_light'], buffers['specular_light'], color_ref,
            FLAGS['lambda_diffuse'], FLAGS['lambda_specular'])
        reg_loss += regularizer.material_smoothness_grad(
            buffers['kd_grad'], buffers['ks_grad'], buffers['normal_grad'],
            lambda_kd=FLAGS['lambda_kd'], lambda_ks=FLAGS['lambda_ks'],
            lambda_nrm=FLAGS['lambda_nrm'])
        reg_loss += regularizer.chroma_loss(buffers['kd'], color_ref,
                                            FLAGS['lambda_chroma'])
        return img_loss, reg_loss
