# Drive the public ops API on the real TPU: shade a sphere with the PBR BSDF,
# take gradients, check finiteness + physical plausibility.
import jax, jax.numpy as jnp
print("devices:", jax.devices())

import nvdiffrecmc_tpu.ops as ops
from nvdiffrecmc_tpu.ops.vecmath import safe_normalize, pixel_grid

H = W = 256
# sphere normals over a pixel grid (orthographic front view)
g = pixel_grid(W, H) * 2 - 1
r2 = jnp.sum(g**2, -1, keepdims=True)
mask = r2 < 1.0
z = jnp.sqrt(jnp.clip(1 - r2, 1e-6))
nrm = jnp.concatenate([g, z], -1) * mask
pos = nrm * 1.0
view_pos = jnp.array([0., 0., 5.])
light_pos = jnp.array([3., 3., 5.])
kd = jnp.ones((H, W, 3)) * jnp.array([0.7, 0.3, 0.2])
arm = jnp.ones((H, W, 3)) * jnp.array([0.0, 0.4, 0.1])

@jax.jit
def render(kd):
    col = ops.pbr_bsdf(kd, arm, pos, nrm, jnp.broadcast_to(view_pos, pos.shape),
                       jnp.broadcast_to(light_pos, pos.shape)) * mask
    return col

@jax.jit
def loss(kd):
    img = render(kd)
    tgt = jnp.zeros_like(img) + 0.2
    return ops.image_loss(img, tgt, loss='l1', tonemapper='log_srgb')

img = render(kd)
print("platform of result:", img.devices())
print("img range:", float(img.min()), float(img.max()),
      "mean:", float(img.mean()))
g_kd = jax.grad(loss)(kd)
print("grad finite:", bool(jnp.all(jnp.isfinite(g_kd))), "norm:", float(jnp.linalg.norm(g_kd)))

# shading normal path
sn = ops.prepare_shading_normal(pos, jnp.broadcast_to(view_pos, pos.shape),
                                None, nrm, jnp.concatenate([z, jnp.zeros_like(z), -g[...,0:1]], -1), nrm)
print("shading normal unit-length err:", float(jnp.abs(jnp.linalg.norm(sn, axis=-1)*mask[...,0] - mask[...,0]).max()))

# xfm on TPU
import numpy as np
from nvdiffrecmc_tpu.ops.vecmath import perspective, translate
mvp = jnp.asarray(perspective() @ translate(0,0,-3))
clip = ops.xfm_points(pos.reshape(1,-1,3), mvp[None])
print("clip shape:", clip.shape, "w range:", float(clip[...,3].min()), float(clip[...,3].max()))

# save image evidence
img8 = np.clip(np.asarray(ops.vecmath.rgb_to_srgb(img))*255, 0, 255).astype(np.uint8)
import imageio
imageio.imwrite('/tmp/ops_sphere.png', img8)
print("OK — wrote /tmp/ops_sphere.png")
