"""Image losses with fused tonemapping.

Semantics mirror the reference's fused CUDA loss kernel
(/root/reference/render/renderutils/c_src/loss.cu:105-146): clamp inputs to
[0, 65535], optional log-sRGB tonemap, then per-pixel {L1, MSE, SMAPE, RELMSE,
N2N}; the mean reduction happens at the end (reference does partial warp
reduction + torch.sum, ops.py:494).  XLA fuses the whole thing into one pass.
"""

import jax.numpy as jnp

_LOSSES = ('l1', 'mse', 'relmse', 'smape', 'n2n')
_TONEMAPPERS = ('none', 'log_srgb')


def _srgb(x):
    return jnp.where(x > 0.0031308,
                     jnp.power(jnp.clip(x, min=0.0031308), 1.0 / 2.4) * 1.055 - 0.055,
                     12.92 * jnp.clip(x, min=0.0))


def tonemap_log_srgb(x):
    return _srgb(jnp.log(jnp.clip(x, min=0.0, max=65535.0) + 1.0))


def image_loss(img, target, loss='l1', tonemapper='none'):
    """Mean scalar loss over [..., 3] RGB images."""
    assert loss in _LOSSES, loss
    assert tonemapper in _TONEMAPPERS, tonemapper

    img = jnp.clip(img, min=0.0, max=65535.0)
    target = jnp.clip(target, min=0.0, max=65535.0)

    if tonemapper == 'log_srgb':
        img = _srgb(jnp.log(img + 1.0))
        target = _srgb(jnp.log(target + 1.0))

    eps = 0.01
    if loss == 'mse':
        v = (img - target) ** 2
    elif loss == 'relmse':
        v = (img - target) ** 2 / (img * img + target * target + eps)
    elif loss == 'n2n':
        v = (img - target) ** 2 / (img * img + eps)
    elif loss == 'smape':
        v = jnp.abs(img - target) / (img + target + eps)
    else:  # l1
        v = jnp.abs(img - target)
    return jnp.mean(v)
