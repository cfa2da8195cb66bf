"""Compute ops: BSDF stack, shading normals, losses, transforms, rasterizer,
BVH + Monte-Carlo tracer, bilateral denoiser, hash-grid encoding, texture
filtering.  All ops are pure JAX functions (jit/vmap/grad-compatible); the hot
ones have Pallas TPU kernels with jnp reference twins (dual-implementation test
strategy mirroring the reference's ``use_python=True`` paths,
/root/reference/render/renderutils/ops.py:101).
"""

from .bsdf import (
    lambert, frostbite, fresnel_schlick, ndf_ggx, lambda_ggx,
    masking_smith_ggx_correlated, pbr_specular, pbr_bsdf,
    SPECULAR_EPSILON, MIN_ROUGHNESS,
)
from .normal import prepare_shading_normal, NORMAL_THRESHOLD
from .loss import image_loss, tonemap_log_srgb
from .xfm import xfm_points, xfm_vectors
from . import vecmath
