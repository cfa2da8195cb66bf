"""DMTet extraction correctness + render pipeline smoke + config parsing."""

import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvdiffrecmc_tpu.geometry import dmtet as dmtet_mod


def sphere_case(res=12, r=0.35):
    verts, idx = dmtet_mod.kuhn_tet_grid(res)
    sdf = r - np.linalg.norm(verts, axis=-1)  # >0 inside
    edge_uniq, edge_map = dmtet_mod._precompute_edge_tables(idx)
    # marching_tets takes the grid tables transposed ([k, huge] layouts)
    return (jnp.asarray(verts.T), jnp.asarray(sdf.astype(np.float32)),
            jnp.asarray(idx.T), jnp.asarray(edge_uniq.T),
            jnp.asarray(edge_map.T))


def test_marching_tets_sphere_watertight():
    v, sdf, idx, eu, em = sphere_case()
    max_tris = 16 * 12 * 12
    verts, faces, face_gidx, mask, overflow = dmtet_mod.marching_tets(
        v, sdf, idx, eu, em, max_tris)
    n_valid = int(mask.sum())
    assert n_valid > 50
    assert not bool(overflow)

    f = np.asarray(faces)[np.asarray(mask) > 0]
    vv = np.asarray(verts)

    # all vertices on the zero level set of the SDF (|p| == r)
    used = np.unique(f)
    d = np.abs(np.linalg.norm(vv[used], axis=-1) - 0.35)
    assert d.max() < 0.02

    # watertight: every edge shared by exactly 2 triangles
    e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], 0)
    e = np.sort(e, axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    assert (counts == 2).all(), np.unique(counts)

    # outward orientation: face normal . centroid > 0 for a sphere
    n = np.cross(vv[f[:, 1]] - vv[f[:, 0]], vv[f[:, 2]] - vv[f[:, 0]])
    c = (vv[f[:, 0]] + vv[f[:, 1]] + vv[f[:, 2]]) / 3
    frac_outward = ((n * c).sum(-1) > 0).mean()
    assert frac_outward > 0.99 or frac_outward < 0.01  # consistent winding


def test_marching_tets_overflow_signal():
    """Truncation past max_tris must raise the overflow flag, and
    DMTetGeometry.tri_count must report the true (untruncated) count."""
    v, sdf, idx, eu, em = sphere_case()
    *_, mask, overflow = dmtet_mod.marching_tets(v, sdf, idx, eu, em, 8)
    assert bool(overflow)
    assert int(mask.sum()) == 8  # every slot used

    geo = dmtet_mod.DMTetGeometry(
        12, 2.0, {'dmtet_grid': 12, 'mesh_scale': 2.0})
    geo.max_tris = 8
    n, cap = geo.tri_count({'sdf': sdf, 'deform': jnp.zeros_like(v)})
    assert cap == 8 and n > 8


def test_sphere_sdf_init():
    """sdf_init='sphere' starts from the signed distance to an enclosing
    sphere: extraction yields a watertight sphere-ish surface at radius
    0.45*scale with no overflow (vs the random init's volume-filling
    blob; 0.5*scale would be tangent to the grid faces and overflow)."""
    geo = dmtet_mod.DMTetGeometry(
        12, 2.0, {'dmtet_grid': 12, 'mesh_scale': 2.0, 'sdf_init': 'sphere'})
    p = geo.parameters()
    sdf = np.asarray(p['sdf'])
    # signed distance to |v| = 0.9 on the scaled grid
    v = np.asarray(geo.verts)
    np.testing.assert_allclose(sdf, 0.9 - np.linalg.norm(v, axis=0),
                               atol=1e-5)
    verts, faces, _, mask, overflow = dmtet_mod.marching_tets(
        geo.verts, p['sdf'], geo.indices, geo.edge_uniq, geo.edge_map,
        geo.max_tris)
    assert not bool(overflow)
    f = np.asarray(faces)[np.asarray(mask) > 0]
    assert f.shape[0] > 50
    r = np.linalg.norm(np.asarray(verts)[np.unique(f)], axis=-1)
    assert abs(r.mean() - 0.9) < 0.05

    # default stays reference-parity random
    geo_r = dmtet_mod.DMTetGeometry(
        12, 2.0, {'dmtet_grid': 12, 'mesh_scale': 2.0})
    sdf_r = np.asarray(geo_r.parameters()['sdf'])
    assert sdf_r.min() >= -0.1 - 1e-6 and sdf_r.max() <= 0.9 + 1e-6


def test_marching_tets_vertex_compaction():
    """Compact vertex buffer: only crossing edges get slots; every masked
    face references a slot below the live count."""
    v, sdf, idx, eu, em = sphere_case()
    verts, faces, _, mask, overflow = dmtet_mod.marching_tets(
        v, sdf, idx, eu, em, 16 * 12 * 12)
    assert not bool(overflow)
    f = np.asarray(faces)[np.asarray(mask) > 0]
    occ = np.asarray(sdf) > 0
    eu_n = np.asarray(eu)
    n_active = int((occ[eu_n[0]] != occ[eu_n[1]]).sum())
    assert n_active <= verts.shape[0]
    assert f.max() < n_active  # all faces index live compact slots
    # every live slot is actually referenced by some face (V == crossing
    # edges of the extracted surface)
    assert len(np.unique(f)) == n_active


@pytest.mark.smoke
def test_marching_tets_gradients():
    v, sdf, idx, eu, em = sphere_case(res=8)
    max_tris = 2048

    def total_area_proxy(s):
        verts, faces, _, mask, _ = dmtet_mod.marching_tets(
            v, s, idx, eu, em, max_tris)
        p0 = verts[faces[:, 0]]
        p1 = verts[faces[:, 1]]
        p2 = verts[faces[:, 2]]
        n = jnp.cross(p1 - p0, p2 - p0)
        area = 0.5 * jnp.sqrt(jnp.clip(jnp.sum(n * n, -1), min=1e-12))
        return jnp.sum(area * mask)

    g = jax.grad(total_area_proxy)(sdf)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_sdf_reg_loss_behaviour():
    v, sdf, idx, eu, em = sphere_case(res=6)
    # random sdf has many sign flips -> larger loss than a smooth one
    rng = np.random.RandomState(0)
    noisy = jnp.asarray(rng.randn(sdf.shape[0]).astype(np.float32))
    l_noisy = float(dmtet_mod.sdf_reg_loss(noisy, eu))
    l_smooth = float(dmtet_mod.sdf_reg_loss(sdf, eu))
    assert l_noisy > l_smooth >= 0


@pytest.mark.smoke
def test_reference_configs_parse():
    from nvdiffrecmc_tpu.config import parse_flags
    cfgs = sorted(glob.glob('/root/repo/configs/*.json'))
    assert len(cfgs) >= 13
    for c in cfgs:
        FLAGS = parse_flags(['--config', c])
        assert 'ref_mesh' in FLAGS and FLAGS['ref_mesh']
        assert FLAGS['out_dir'].startswith('out')


@pytest.mark.smoke
def test_render_mesh_smoke_tiny():
    """Full render_mesh forward at tiny res through all buffers."""
    from nvdiffrecmc_tpu.render import render as render_mod
    from nvdiffrecmc_tpu.render import light as light_mod
    from nvdiffrecmc_tpu.render import mesh as mesh_mod
    from nvdiffrecmc_tpu.render import texture as texture_mod
    from nvdiffrecmc_tpu.ops import bvh as bvh_mod, envshade, vecmath

    v, sdf, idx, eu, em = sphere_case(res=8)
    verts, faces, face_gidx, mask, _ = dmtet_mod.marching_tets(
        v, sdf, idx, eu, em, 2048)
    n_tets = idx.shape[1]
    uv_N = int(np.ceil(np.sqrt((n_tets * 2 + 1) // 2)))
    v_tex, t_tex_idx = dmtet_mod.face_uvs(face_gidx, n_tets, uv_N)
    m = mesh_mod.Mesh(v_pos=verts, t_pos_idx=faces, v_tex=v_tex,
                      t_tex_idx=t_tex_idx, tri_mask=mask)
    m = mesh_mod.auto_normals(m)
    m = mesh_mod.compute_tangents(m)
    m.material = {
        'bsdf': 'pbr', 'no_perturbed_nrm': True,
        'kd': texture_mod.Texture2D(data=jnp.ones((1, 8, 8, 3)) * 0.5),
        'ks': texture_mod.Texture2D(
            data=jnp.ones((1, 8, 8, 3)) * jnp.asarray([0.0, 0.5, 0.0])),
    }
    bvh = bvh_mod.build(m.v_pos, m.t_pos_idx, tri_mask=mask > 0, leaf_size=16)
    base = jnp.ones((8, 16, 3)) * 0.5
    tables = light_mod.update_pdf(base)
    lgt = {'base': base, 'pdf': tables.pdf, 'rows': tables.rows,
           'cols': tables.cols}
    perms = envshade.make_perms(2)
    mvp = jnp.asarray((vecmath.perspective(0.7854, 1, 0.1, 100)
                       @ vecmath.translate(0, 0, -1.5))[None])
    campos = jnp.asarray(np.array([[0, 0, 1.5]], np.float32))
    FLAGS = {'n_samples': 2, 'denoiser_demodulate': True}

    buffers = render_mod.render_mesh(
        FLAGS, m, mvp, campos, lgt, (48, 48), bvh, perms,
        jax.random.PRNGKey(0), msaa=True, spp=1,
        background=jnp.zeros((1, 48, 48, 3)),
        denoiser_sigma=jnp.float32(1.0), shadow_scale=0.5, rnd_seed=0)

    for k, v_ in buffers.items():
        assert np.all(np.isfinite(np.asarray(v_))), k
    cov = float((buffers['shaded'][..., 3] > 0.5).mean())
    assert 0.02 < cov < 0.9
    # sphere lit by constant light: demodulated diffuse ~ 0.5 in lit areas
    lit = np.asarray(buffers['diffuse_light'][..., 0])
    assert lit.max() > 0.2
