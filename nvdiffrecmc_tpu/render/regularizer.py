"""Regularization losses (parity with /root/reference/render/regularizer.py)."""

import jax.numpy as jnp

from ..ops import mesh_ops
from ..ops.vecmath import dot, rgb_to_srgb, safe_normalize


def _luma(x):
    l = (x[..., 0:1] + x[..., 1:2] + x[..., 2:3]) / 3
    return jnp.repeat(l, 3, axis=-1)


def _value(x):
    v = jnp.max(x[..., 0:3], axis=-1, keepdims=True)
    return jnp.repeat(v, 3, axis=-1)


def chroma_loss(kd, color_ref, lambda_chroma):
    eps = 0.001
    ref_chroma = color_ref[..., 0:3] / jnp.clip(_value(color_ref), min=eps)
    opt_chroma = kd[..., 0:3] / jnp.clip(_value(kd), min=eps)
    return jnp.mean(jnp.abs((opt_chroma - ref_chroma) * color_ref[..., 3:])) \
        * lambda_chroma


def shading_loss(diffuse_light, specular_light, color_ref, lambda_diffuse,
                 lambda_specular):
    """Monochrome-shading regularizer (reference regularizer.py:27-38)."""
    diffuse_luma = _luma(diffuse_light)
    specular_luma = _luma(specular_light)
    ref_luma = _value(color_ref)

    eps = 0.001
    img = rgb_to_srgb(jnp.log(jnp.clip(
        (diffuse_luma + specular_luma) * color_ref[..., 3:], 0.0, 65535.0) + 1))
    target = rgb_to_srgb(jnp.log(jnp.clip(
        ref_luma * color_ref[..., 3:], 0.0, 65535.0) + 1))
    error = (jnp.abs(img - target) * diffuse_luma
             / jnp.clip(diffuse_luma + specular_luma, min=eps))
    loss = jnp.mean(error) * lambda_diffuse
    loss += (jnp.mean(specular_luma)
             / jnp.clip(jnp.mean(diffuse_luma), min=eps) * lambda_specular)
    return loss


def material_smoothness_grad(kd_grad, ks_grad, nrm_grad, lambda_kd=0.25,
                             lambda_ks=0.1, lambda_nrm=0.0):
    kd_luma_grad = (kd_grad[..., 0] + kd_grad[..., 1] + kd_grad[..., 2]) / 3
    loss = jnp.mean(kd_luma_grad * kd_grad[..., -1]) * lambda_kd
    loss += jnp.mean(ks_grad[..., :-1] * ks_grad[..., -1:]) * lambda_ks
    loss += jnp.mean(nrm_grad[..., :-1] * nrm_grad[..., -1:]) * lambda_nrm
    return loss


def laplace_regularizer_const(v_pos, t_pos_idx, tri_mask=None):
    return mesh_ops.laplace_uniform(v_pos, t_pos_idx, tri_mask)


def normal_consistency(v_pos, t_pos_idx, edge_to_face):
    """Normal difference across edges (defined-but-unused in the reference,
    regularizer.py:88-106 — provided for parity).  edge_to_face: [E, 2]
    host-precomputed face pairs per unique edge."""
    fn = mesh_ops.face_normals(v_pos, t_pos_idx)
    n0 = fn[edge_to_face[:, 0]]
    n1 = fn[edge_to_face[:, 1]]
    term = jnp.clip(dot(n0, n1), -1.0, 1.0)
    return jnp.mean(jnp.abs((1.0 - term) * 0.5))


def avg_edge_length(v_pos, t_pos_idx):
    e = mesh_ops.compute_edges_np(t_pos_idx)
    return float(mesh_ops.avg_edge_length(v_pos, jnp.asarray(e)))
