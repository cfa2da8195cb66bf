"""Multi-resolution hash-grid encoding + small MLP (the tiny-cuda-nn
capability used by MLPTexture3D, /root/reference/render/mlptexture.py:56-96),
in pure JAX.

Encoding: `num_levels` grids with geometric resolution growth; each level
hashes the 8 cell corners into a `2**log2_hashmap_size` table of
`features_per_level` features and trilinearly interpolates.  Levels whose
dense grid fits in the table are indexed densely (tcnn behavior).  The MLP is
`hidden` ReLU layers of `internal_dims`, no bias, sigmoid output scaled to
[min, max].

Gradient-scaling conventions of the reference (x128 loss scale on the MLP,
/128 on the encoder input grad, /8 on the encoder params in train.py:442-443)
exist to keep tcnn's fp16 kernels stable; here everything is fp32 and the
*effective* scales are reproduced as per-parameter-group learning-rate
multipliers in the optimizer (see train driver), not as backward hooks.
"""

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

PRIMES = (1, 2654435761, 805459861)


class HashEncodingConfig(NamedTuple):
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    desired_resolution: int = 4096


def level_scales(cfg: HashEncodingConfig):
    per_level_scale = math.exp(
        math.log(cfg.desired_resolution / cfg.base_resolution)
        / (cfg.n_levels - 1))
    return [int(np.floor(cfg.base_resolution * per_level_scale ** l))
            for l in range(cfg.n_levels)]


def init_encoding(key, cfg: HashEncodingConfig):
    """Table init U(-1e-4, 1e-4) (tcnn default)."""
    T = 1 << cfg.log2_hashmap_size
    return jax.random.uniform(
        key, (cfg.n_levels, T, cfg.n_features_per_level),
        minval=-1e-4, maxval=1e-4)


def _hash_corner(ix, iy, iz, res, table_size):
    """Dense indexing when the grid fits, spatial hash otherwise."""
    n_dense = (res + 1) ** 3
    if n_dense <= table_size:
        return (ix * (res + 1) + iy) * (res + 1) + iz
    h = (ix.astype(jnp.uint32) * jnp.uint32(PRIMES[0])
         ^ iy.astype(jnp.uint32) * jnp.uint32(PRIMES[1] & 0xFFFFFFFF)
         ^ iz.astype(jnp.uint32) * jnp.uint32(PRIMES[2]))
    return (h % jnp.uint32(table_size)).astype(jnp.int32)


def encode(table, x, cfg: HashEncodingConfig):
    """x: [P, 3] in [0, 1].  Returns [P, n_levels * n_features]."""
    T = 1 << cfg.log2_hashmap_size
    feats = []
    for lvl, res in enumerate(level_scales(cfg)):
        p = x * res
        p0 = jnp.floor(p)
        w = p - p0
        p0 = jnp.clip(p0.astype(jnp.int32), 0, res)
        out = 0.0
        for corner in range(8):
            cx = (corner >> 0) & 1
            cy = (corner >> 1) & 1
            cz = (corner >> 2) & 1
            ix = jnp.clip(p0[:, 0] + cx, 0, res)
            iy = jnp.clip(p0[:, 1] + cy, 0, res)
            iz = jnp.clip(p0[:, 2] + cz, 0, res)
            idx = _hash_corner(ix, iy, iz, res, T)
            wt = ((w[:, 0] if cx else 1 - w[:, 0])
                  * (w[:, 1] if cy else 1 - w[:, 1])
                  * (w[:, 2] if cz else 1 - w[:, 2]))
            out = out + table[lvl, idx] * wt[:, None]
        feats.append(out)
    return jnp.concatenate(feats, axis=-1)


class MLPTexture3DParams(NamedTuple):
    table: jnp.ndarray          # [L, T, F]
    weights: tuple              # MLP weight matrices


def init_mlp_texture(key, cfg: HashEncodingConfig, channels=6,
                     internal_dims=32, hidden=2):
    ks = jax.random.split(key, hidden + 2)
    table = init_encoding(ks[0], cfg)
    dims = ([cfg.n_levels * cfg.n_features_per_level]
            + [internal_dims] * hidden + [channels])
    weights = []
    for i in range(len(dims) - 1):
        # kaiming-uniform for relu (torch init, mlptexture.py:37-39)
        bound = math.sqrt(6.0 / dims[i])
        weights.append(jax.random.uniform(
            ks[i + 1], (dims[i], dims[i + 1]), minval=-bound, maxval=bound))
    return MLPTexture3DParams(table=table, weights=tuple(weights))


def sample_mlp_texture(params: MLPTexture3DParams, cfg: HashEncodingConfig,
                       aabb, min_max, x):
    """Evaluate the neural texture at world positions x [..., 3].
    aabb: (lo [3], hi [3]); min_max: (min [C], max [C]).
    Mirrors MLPTexture3D.sample (mlptexture.py:86-96)."""
    shape = x.shape[:-1]
    p = x.reshape(-1, 3)
    lo, hi = aabb
    p = jnp.clip((p - lo[None]) / (hi - lo)[None], 0.0, 1.0)
    h = encode(params.table, p, cfg)
    for w in params.weights[:-1]:
        h = jax.nn.relu(h @ w)
    out = h @ params.weights[-1]
    mn, mx = min_max
    out = jax.nn.sigmoid(out) * (mx - mn)[None] + mn[None]
    return out.reshape(*shape, out.shape[-1])
