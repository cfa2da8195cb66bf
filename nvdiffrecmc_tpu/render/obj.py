"""Wavefront OBJ load/save with multi-material uber merge.

Parity with /root/reference/render/obj.py:31-176 (polygon triangulation,
mtllib loading, v-flip of texcoords, OBJ+MTL export)."""

import os

import jax.numpy as jnp
import numpy as np

from . import material as material_mod
from . import mesh as mesh_mod
from . import texture


def load_obj(filename, clear_ks=True, mtl_override=None):
    obj_path = os.path.dirname(filename)
    with open(filename, 'r') as f:
        lines = f.readlines()

    all_materials = [{
        'name': '_default_mat',
        'bsdf': 'pbr',
        'kd': texture.Texture2D(
            data=jnp.asarray([0.5, 0.5, 0.5])[None, None, None, :]),
        'ks': texture.Texture2D(
            data=jnp.asarray([0.0, 0.0, 0.0])[None, None, None, :]),
    }]
    if mtl_override is None:
        for line in lines:
            if line.split() and line.split()[0] == 'mtllib':
                all_materials += material_mod.load_mtl(
                    os.path.join(obj_path, line.split()[1]), clear_ks)
    else:
        all_materials += material_mod.load_mtl(mtl_override)

    vertices, texcoords, normals = [], [], []
    for line in lines:
        parts = line.split()
        if not parts:
            continue
        prefix = parts[0].lower()
        if prefix == 'v':
            vertices.append([float(v) for v in parts[1:4]])
        elif prefix == 'vt':
            val = [float(v) for v in parts[1:3]]
            texcoords.append([val[0], 1.0 - val[1]])
        elif prefix == 'vn':
            normals.append([float(v) for v in parts[1:4]])

    def _idx(token, k):
        sp = token.split('/')
        if k >= len(sp) or sp[k] == '':
            return -1
        return int(sp[k]) - 1

    active_mat_idx = None
    used_materials = []
    faces, tfaces, nfaces, mfaces = [], [], [], []
    for line in lines:
        parts = line.split()
        if not parts:
            continue
        prefix = parts[0].lower()
        if prefix == 'usemtl':
            mat = material_mod._find_mat(all_materials, parts[1])
            if mat not in used_materials:
                used_materials.append(mat)
            active_mat_idx = used_materials.index(mat)
        elif prefix == 'f':
            vs = parts[1:]
            v0, t0, n0 = _idx(vs[0], 0), _idx(vs[0], 1), _idx(vs[0], 2)
            for i in range(len(vs) - 2):  # triangulate
                v1, t1, n1 = _idx(vs[i + 1], 0), _idx(vs[i + 1], 1), _idx(vs[i + 1], 2)
                v2, t2, n2 = _idx(vs[i + 2], 0), _idx(vs[i + 2], 1), _idx(vs[i + 2], 2)
                mfaces.append(active_mat_idx)
                faces.append([v0, v1, v2])
                tfaces.append([t0, t1, t2])
                nfaces.append([n0, n1, n2])
    if not used_materials:
        used_materials = [all_materials[0]]

    if len(used_materials) > 1:
        uber, texcoords, tfaces = material_mod.merge_materials(
            used_materials, texcoords, tfaces, mfaces)
    else:
        uber = used_materials[0]

    v_pos = jnp.asarray(np.array(vertices, np.float32))
    v_tex = (jnp.asarray(np.array(texcoords, np.float32))
             if len(texcoords) > 0 else None)
    v_nrm = (jnp.asarray(np.array(normals, np.float32))
             if len(normals) > 0 else None)
    t_pos = jnp.asarray(np.array(faces, np.int32))
    t_tex = jnp.asarray(np.array(tfaces, np.int32)) if v_tex is not None else None
    t_nrm = jnp.asarray(np.array(nfaces, np.int32)) if v_nrm is not None else None

    return mesh_mod.Mesh(v_pos=v_pos, t_pos_idx=t_pos, v_nrm=v_nrm,
                         t_nrm_idx=t_nrm, v_tex=v_tex, t_tex_idx=t_tex,
                         material=uber)


def write_obj(folder, mesh, save_material=True):
    obj_file = os.path.join(folder, 'mesh.obj')
    print("Writing mesh: ", obj_file)

    def to_np(x):
        return None if x is None else np.asarray(x)

    v_pos = to_np(mesh.v_pos)
    v_nrm = to_np(mesh.v_nrm)
    v_tex = to_np(mesh.v_tex)
    t_pos_idx = to_np(mesh.t_pos_idx)
    t_nrm_idx = to_np(mesh.t_nrm_idx)
    t_tex_idx = to_np(mesh.t_tex_idx)

    # drop padded/masked triangles from the export
    if mesh.tri_mask is not None:
        keep = np.asarray(mesh.tri_mask) > 0
        t_pos_idx = t_pos_idx[keep]
        t_nrm_idx = t_nrm_idx[keep] if t_nrm_idx is not None else None
        t_tex_idx = t_tex_idx[keep] if t_tex_idx is not None else None

    with open(obj_file, 'w') as f:
        f.write("mtllib mesh.mtl\ng default\n")
        for v in v_pos:
            f.write('v {} {} {} \n'.format(v[0], v[1], v[2]))
        if v_tex is not None:
            for v in v_tex:
                f.write('vt {} {} \n'.format(v[0], 1.0 - v[1]))
        if v_nrm is not None:
            for v in v_nrm:
                f.write('vn {} {} {}\n'.format(v[0], v[1], v[2]))
        f.write("s 1 \ng pMesh1\nusemtl defaultMat\n")
        for i in range(len(t_pos_idx)):
            f.write("f ")
            for j in range(3):
                f.write(' %s/%s/%s' % (
                    str(t_pos_idx[i][j] + 1),
                    '' if v_tex is None else str(t_tex_idx[i][j] + 1),
                    '' if v_nrm is None else str(t_nrm_idx[i][j] + 1)))
            f.write("\n")

    if save_material:
        mtl_file = os.path.join(folder, 'mesh.mtl')
        print("Writing material: ", mtl_file)
        material_mod.save_mtl(mtl_file, mesh.material)
    print("Done exporting mesh")
