"""Mesh container + attribute pipeline.

Parity with /root/reference/render/mesh.py:19-219, JAX-first: a Mesh is a
pytree of arrays (positions/attributes) plus index arrays; topology is static
under jit.  Padded triangle slots (DMTet) carry a tri_mask.
"""

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import mesh_ops

_GEOMETRY_UID = [0]


def next_geometry_uid():
    """Monotonic per-process id for geometry instances (jit-cache keys must
    not use id(), which can be recycled after GC)."""
    _GEOMETRY_UID[0] += 1
    return _GEOMETRY_UID[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Mesh:
    v_pos: Any = None
    t_pos_idx: Any = None
    v_nrm: Any = None
    t_nrm_idx: Any = None
    v_tex: Any = None
    t_tex_idx: Any = None
    v_tng: Any = None
    t_tng_idx: Any = None
    tri_mask: Any = None            # [T] float {0,1} or None (all valid)
    material: Any = dataclasses.field(default=None, metadata=dict(static=False))

    def copy_none(self, other):
        for f in ('v_pos', 't_pos_idx', 'v_nrm', 't_nrm_idx', 'v_tex',
                  't_tex_idx', 'v_tng', 't_tng_idx', 'tri_mask', 'material'):
            if getattr(self, f) is None:
                setattr(self, f, getattr(other, f))
        return self


def aabb(mesh: Mesh):
    return (jnp.min(mesh.v_pos, axis=0), jnp.max(mesh.v_pos, axis=0))


def auto_normals(mesh: Mesh) -> Mesh:
    v_nrm = mesh_ops.auto_normals(mesh.v_pos, mesh.t_pos_idx, mesh.tri_mask)
    return dataclasses.replace(mesh, v_nrm=v_nrm, t_nrm_idx=mesh.t_pos_idx)


def compute_tangents(mesh: Mesh) -> Mesh:
    v_tng = mesh_ops.compute_tangents(
        mesh.v_pos, mesh.v_nrm, mesh.v_tex, mesh.t_pos_idx, mesh.t_nrm_idx,
        mesh.t_tex_idx, mesh.tri_mask)
    return dataclasses.replace(mesh, v_tng=v_tng, t_tng_idx=mesh.t_nrm_idx)


def unit_size(v_pos_np):
    """Normalize host-side vertices to the unit cube (utility for tools)."""
    v = np.asarray(v_pos_np)
    c = (v.min(0) + v.max(0)) / 2
    s = np.abs(v - c).max()
    return (v - c) / max(s, 1e-9)


def load_mesh(filename, mtl_override=None):
    from . import obj
    import os
    ext = os.path.splitext(filename)[1]
    assert ext == '.obj', 'Invalid mesh file extension'
    return obj.load_obj(filename, clear_ks=True, mtl_override=mtl_override)
