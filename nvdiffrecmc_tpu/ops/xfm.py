"""Batched 4x4 point / vector transforms.

Equivalent capability to the reference xfm kernels
(/root/reference/render/renderutils/c_src/mesh.cu:19-91); on TPU these are
plain matmuls that XLA maps straight onto the MXU, so no custom kernel is
needed.
"""

import jax.numpy as jnp


def xfm_points(points, matrix):
    """Transform points by homogeneous matrices.

    points: [N, V, 3] (or [V, 3]); matrix: [N, 4, 4] (or [4, 4]).
    Returns clip-space positions [N, V, 4].
    """
    if points.ndim == 2:
        points = points[None]
    if matrix.ndim == 2:
        matrix = matrix[None]
    ones = jnp.ones_like(points[..., :1])
    hom = jnp.concatenate((points, ones), axis=-1)          # [N, V, 4]
    return jnp.einsum('nij,nvj->nvi', matrix, hom)


def xfm_vectors(vectors, matrix):
    """Transform direction vectors (w=0) by homogeneous matrices."""
    if vectors.ndim == 2:
        vectors = vectors[None]
    if matrix.ndim == 2:
        matrix = matrix[None]
    return jnp.einsum('nij,nvj->nvi', matrix[..., :3, :3], vectors)
