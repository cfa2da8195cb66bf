"""Material dict handling + .mtl IO.

Parity with /root/reference/render/material.py: materials are plain dicts
with 'bsdf' (str), 'kd'/'ks'/'normal' (Texture2D) or 'kd_ks' (neural
texture), plus config flags.  .mtl files use the reference's custom
'bsdf'/'map_kd'/'map_ks'/'bump' extensions; kd is stored sRGB and converted
to linear on load; the ks occlusion (red) channel is zeroed when clear_ks.
"""

import os
import re

import jax.numpy as jnp
import numpy as np

from . import texture
from ..ops import vecmath


def load_mtl(fn, clear_ks=True):
    mtl_path = os.path.dirname(fn)
    with open(fn, 'r') as f:
        lines = f.readlines()

    materials = []
    mat = None
    for line in lines:
        split_line = re.split(r' +|\t+|\n+', line.strip())
        if not split_line or split_line[0] == '':
            continue
        prefix = split_line[0].lower()
        data = split_line[1:]
        if 'newmtl' in prefix:
            mat = {'name': data[0]}
            materials.append(mat)
        elif materials:
            if ('bsdf' in prefix or 'map_kd' in prefix or 'map_ks' in prefix
                    or 'bump' in prefix):
                mat[prefix] = data[0]
            else:
                mat[prefix] = np.array([float(d) for d in data],
                                       dtype=np.float32)

    for mat in materials:
        if 'bsdf' not in mat:
            mat['bsdf'] = 'pbr'
        if 'map_kd' in mat:
            mat['kd'] = texture.load_texture2D(
                os.path.join(mtl_path, mat['map_kd']))
        else:
            mat['kd'] = texture.Texture2D(
                data=jnp.asarray(mat['kd'])[None, None, None, :])
        if 'map_ks' in mat:
            mat['ks'] = texture.load_texture2D(
                os.path.join(mtl_path, mat['map_ks']), channels=3)
        else:
            mat['ks'] = texture.Texture2D(
                data=jnp.asarray(mat['ks'])[None, None, None, :])
        if 'bump' in mat:
            mat['normal'] = texture.load_texture2D(
                os.path.join(mtl_path, mat['bump']),
                lambda_fn=lambda x: x * 2 - 1, channels=3)

        mat['kd'] = texture.srgb_to_rgb(mat['kd'])

        if clear_ks:
            # Hijack the ORM occlusion (red) channel: zero it
            mips = [m.at[..., 0].set(0.0) for m in mat['ks'].getMips()]
            mat['ks'] = texture.Texture2D(
                data=mips if isinstance(mat['ks'].data, list) else mips[0],
                min_max=mat['ks'].min_max)
    return materials


def save_mtl(fn, material):
    folder = os.path.dirname(fn)
    with open(fn, 'w') as f:
        f.write('newmtl defaultMat\n')
        if material is not None:
            f.write('bsdf   %s\n' % material['bsdf'])
            if 'kd' in material:
                f.write('map_Kd texture_kd.png\n')
                texture.save_texture2D(os.path.join(folder, 'texture_kd.png'),
                                       texture.rgb_to_srgb(material['kd']))
            if 'ks' in material:
                f.write('map_Ks texture_ks.png\n')
                texture.save_texture2D(os.path.join(folder, 'texture_ks.png'),
                                       material['ks'])
            if 'normal' in material:
                texture.save_texture2D(
                    os.path.join(folder, 'texture_n.png'), material['normal'],
                    lambda_fn=lambda x: (vecmath.safe_normalize(x) + 1) * 0.5)
                f.write('bump texture_n.png\n')
        else:
            f.write('Kd 1 1 1\nKs 0 0 0\nKa 0 0 0\nTf 1 1 1\nNi 1\nNs 0\n')


def create_trainable(material):
    result = material.copy()
    for key, val in result.items():
        if isinstance(val, texture.Texture2D):
            result[key] = texture.create_trainable(val)
    return result


def _find_mat(materials, name):
    for mat in materials:
        if mat['name'] == name:
            return mat
    return materials[0]  # default


def merge_materials(materials, texcoords, tfaces, mfaces):
    """Merge multiple materials into one uber-material atlas stacked
    vertically, rewriting texcoords (reference material.py:117-169)."""
    assert len(materials) > 0
    for mat in materials:
        assert mat['bsdf'] == materials[0]['bsdf'], \
            "All materials must have the same BSDF (uber shader)"
        assert ('normal' in mat) is ('normal' in materials[0]), \
            "All materials must have either normal maps or no normal maps"

    max_res = np.amax(
        np.stack([np.array(m['kd'].getRes()) for m in materials], axis=0),
        axis=0)

    def _upscale(tex2d, channels):
        img = np.asarray(tex2d.getMips()[0])[0]
        if channels is not None and img.shape[-1] != channels:
            img = img[..., :channels] if img.shape[-1] > channels else \
                np.concatenate([img] + [img[..., -1:]] * (channels - img.shape[-1]), -1)
        t = jnp.asarray(img)[None]
        t = vecmath.scale_img_nhwc(t, max_res)
        return t

    kd = jnp.concatenate([_upscale(m['kd'], None) for m in materials], axis=1)
    ks = jnp.concatenate([_upscale(m['ks'], 3) for m in materials], axis=1)
    nrm = None
    if 'normal' in materials[0]:
        nrm = jnp.concatenate([_upscale(m['normal'], 3) for m in materials],
                              axis=1)

    uber = {
        'name': 'uber_material',
        'kd': texture.Texture2D(data=kd),
        'ks': texture.Texture2D(data=ks),
        'bsdf': materials[0]['bsdf'],
    }
    if nrm is not None:
        uber['normal'] = texture.Texture2D(data=nrm)

    # rewrite texcoords into the vertical atlas
    n = len(materials)
    tc = np.asarray(texcoords, dtype=np.float32)
    new_tc = []
    new_tf = []
    for face_idx, mat_idx in enumerate(mfaces):
        m = 0 if mat_idx is None else mat_idx
        ids = tfaces[face_idx]
        out_ids = []
        for tid in ids:
            uv = tc[tid] if tid >= 0 else np.zeros(2, np.float32)
            uv = np.array([uv[0], (uv[1] + m) / n], np.float32)
            out_ids.append(len(new_tc))
            new_tc.append(uv)
        new_tf.append(out_ids)
    return uber, new_tc, new_tf
