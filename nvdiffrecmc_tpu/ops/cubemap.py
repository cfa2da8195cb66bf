"""Cubemap pre-filtering ops: diffuse (cosine) and specular (GGX NDF)
convolution with filtering across face edges.

API parity with the reference's `diffuse_cubemap` / `specular_cubemap`
(/root/reference/render/renderutils/ops.py:391-458).  Note the reference
ships those wrappers with their CUDA kernels absent (no cubemap.cu under
renderutils/c_src — calling them raises at plugin lookup) and no call
sites; they are vestigial leftovers of nvdiffrec's split-sum lighting.
This implementation is therefore a working superset: semantics follow the
published nvdiffrec formulation (texel-area-weighted brute-force
convolution over the full sphere, normalized by accumulated weight).

TPU-first shape: the convolution is a dense [N, N] kernel against the
flattened cubemap ([N, 3], N = 6*res^2).  Instead of a scalar loop per
output texel (the CUDA layout), weights are built for CHUNK output texels
at a time and applied as one [CHUNK, N] @ [N, 3] MXU matmul; the weight
matrix is never materialized in full.  Gradients flow through the matmul
(the weights depend only on texel geometry, not on the cubemap).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Cubemap geometry
# ---------------------------------------------------------------------------

# face -> (axis, sign): direction = normalize(sign*e_axis + u*ue + v*ve)
# OpenGL cubemap order: +x, -x, +y, -y, +z, -z
_FACES = [
    ((1.0, 0.0, 0.0), (0.0, 0.0, -1.0), (0.0, -1.0, 0.0)),   # +x
    ((-1.0, 0.0, 0.0), (0.0, 0.0, 1.0), (0.0, -1.0, 0.0)),   # -x
    ((0.0, 1.0, 0.0), (1.0, 0.0, 0.0), (0.0, 0.0, 1.0)),     # +y
    ((0.0, -1.0, 0.0), (1.0, 0.0, 0.0), (0.0, 0.0, -1.0)),   # -y
    ((0.0, 0.0, 1.0), (1.0, 0.0, 0.0), (0.0, -1.0, 0.0)),    # +z
    ((0.0, 0.0, -1.0), (-1.0, 0.0, 0.0), (0.0, -1.0, 0.0)),  # -z
]


def cubemap_dirs(res):
    """Unit direction for every texel center: [6, res, res, 3]."""
    t = (np.arange(res, dtype=np.float64) + 0.5) / res * 2.0 - 1.0
    v, u = np.meshgrid(t, t, indexing='ij')     # v = row, u = col
    out = np.zeros((6, res, res, 3))
    for f, (n, ue, ve) in enumerate(_FACES):
        d = (np.asarray(n)[None, None]
             + u[..., None] * np.asarray(ue)[None, None]
             + v[..., None] * np.asarray(ve)[None, None])
        out[f] = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(out.astype(np.float32))


def _area_elem(x, y):
    return np.arctan2(x * y, np.sqrt(x * x + y * y + 1.0))


def cubemap_solid_angles(res):
    """Exact solid angle of every texel: [6, res, res] (same for all
    faces); sums to 4*pi over the cube."""
    g = np.arange(res + 1, dtype=np.float64) / res * 2.0 - 1.0
    yy, xx = np.meshgrid(g, g, indexing='ij')
    a = _area_elem(xx, yy)
    sa = (a[1:, 1:] - a[1:, :-1] - a[:-1, 1:] + a[:-1, :-1])
    return jnp.asarray(np.broadcast_to(sa[None], (6, res, res))
                       .astype(np.float32))


# ---------------------------------------------------------------------------
# Convolution core
# ---------------------------------------------------------------------------

def _convolve(cubemap, weight_fn, chunk=2048):
    """out[i] = sum_j w(d_i . d_j) * sa_j * cubemap[j] / sum_j w * sa_j.

    weight_fn maps cos(theta) [CHUNK, N] -> nonnegative weights.  The
    normalizing weight rides as a 4th channel through the same matmul
    (the reference's vec4 accumulate, ops.py:455 `out[...,0:3]/out[...,3:]`).
    """
    six, res = cubemap.shape[0], cubemap.shape[1]
    N = six * res * res
    dirs = cubemap_dirs(res).reshape(N, 3)
    sa = cubemap_solid_angles(res).reshape(N)
    rgba = jnp.concatenate(
        [cubemap.reshape(N, 3), jnp.ones((N, 1), cubemap.dtype)], axis=-1)
    rgba = rgba * sa[:, None]

    pad = (-N) % chunk
    dirs_p = jnp.pad(dirs, ((0, pad), (0, 0)))

    def one(d_chunk):
        ct = d_chunk @ dirs.T                     # [chunk, N]
        w = weight_fn(ct)
        return w @ rgba                           # [chunk, 4]

    out = jax.lax.map(one, dirs_p.reshape(-1, chunk, 3))
    out = out.reshape(-1, 4)[:N]
    rgb = out[:, 0:3] / jnp.maximum(out[:, 3:4], 1e-20)
    return rgb.reshape(6, res, res, 3)


def diffuse_cubemap(cubemap, chunk=2048):
    """Cosine-convolved irradiance cubemap (reference ops.py:404-411).
    cubemap: [6, res, res, 3] -> same shape."""
    return _convolve(cubemap, lambda ct: jnp.maximum(ct, 0.0), chunk=chunk)


def _ndf_ggx(alpha_sqr, ct):
    ct = jnp.clip(ct, 0.0, 1.0)
    d = (ct * alpha_sqr - ct) * ct + 1.0
    return alpha_sqr / (d * d * np.pi)


@functools.lru_cache(maxsize=None)
def _ndf_cutoff(roughness, cutoff):
    """cos(theta) containing `cutoff` of the GGX NDF energy — the same
    numpy cumsum procedure as the reference (ops.py:427-436)."""
    n = 1000000
    ct = np.cos(np.linspace(0, np.pi / 2.0, n))
    a2 = roughness ** 4
    d = (ct * a2 - ct) * ct + 1.0
    dens = a2 / (d * d * np.pi)
    D = np.cumsum(dens)
    idx = int(np.argmax(D >= D[-1] * cutoff))
    return float(ct[idx])


def specular_cubemap(cubemap, roughness, cutoff=0.99, chunk=2048):
    """GGX-NDF prefiltered cubemap at the given roughness (reference
    ops.py:413-458).  The reference's `bounds` table only bounds the
    brute-force loop; zeroing the weight outside the cutoff angle is the
    same integral."""
    assert cubemap.shape[0] == 6 and cubemap.shape[1] == cubemap.shape[2], \
        "Bad shape for cubemap tensor: %s" % str(cubemap.shape)
    ct_min = _ndf_cutoff(float(roughness), float(cutoff))
    a2 = float(roughness) ** 4

    def w(ct):
        return jnp.where(ct >= ct_min, _ndf_ggx(a2, ct), 0.0)

    return _convolve(cubemap, w, chunk=chunk)
