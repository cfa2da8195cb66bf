"""Multi-resolution hash-grid encoding + small MLP (the tiny-cuda-nn
capability used by MLPTexture3D, /root/reference/render/mlptexture.py:56-96),
TPU-first.

Encoding: `num_levels` grids with geometric resolution growth; each level
hashes the 8 cell corners into a `2**log2_hashmap_size` table of
`features_per_level` features and trilinearly interpolates.  Levels whose
dense grid fits in the table are indexed densely (tcnn behavior).  The MLP is
`hidden` ReLU layers of `internal_dims`, no bias, sigmoid output scaled to
[min, max].

TPU design (vs tcnn's CUDA kernels, mlptexture.py:62-73):

- The forward is ONE flat XLA gather over a level-concatenated [L*T, F]
  view: all level/corner index math is vectorized [P, L, 8] with per-level
  constants ([L] arrays baked at trace time), so there is a single gather
  HLO instead of L*8 of them.  Random HBM rows are latency-bound either
  way; one kernel minimizes dispatch and lets XLA fuse the weighting.
- The backward is `jax.custom_vjp`:
  * table cotangent: sorted binned segment-sum via
    `pallas_scatter.scatter_add_t` (one MXU one-hot matmul per bin) —
    XLA's TPU scatter is serial (~95 ns/row) and the hash backward issues
    P*L*8 (~34M at 512^2) row updates per step, which costs seconds;
    the binned kernel does it in tens of ms.
  * position cotangent: hand-derived trilinear-weight adjoint using the
    corner features saved from the forward (re-gathering them would pay
    the random-access toll twice; storing is a streaming write).
- Gradient-scaling conventions of the reference (x128 loss scale on the
  MLP, /128 on the encoder input grad, /8 on the encoder params,
  train.py:442-443) exist to keep tcnn's fp16 kernels stable; here
  everything is fp32 and the *effective* scales are reproduced as
  optimizer-side multipliers in the train driver, not backward hooks.
"""

import functools
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


def encode_ref(table, x, cfg: HashEncodingConfig):
    """Pure-jnp per-level twin (golden reference; JAX AD end to end)."""
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


# corner bit pattern [8, 3]: corner c offsets (cx, cy, cz)
_CORNER_BITS = np.array([[(c >> d) & 1 for d in range(3)]
                         for c in range(8)], np.int32)


@functools.lru_cache(maxsize=8)
def _level_consts(cfg: HashEncodingConfig):
    """Per-level constants as [L] numpy arrays (baked into the jaxpr)."""
    T = 1 << cfg.log2_hashmap_size
    scales = level_scales(cfg)
    res = np.array(scales, np.int32)                       # [L]
    dense = np.array([(r + 1) ** 3 <= T for r in scales], bool)
    return res, dense, T


def _corner_rows_weights(x, cfg: HashEncodingConfig):
    """Vectorized index/weight computation for every (pixel, level, corner).

    x: [P, 3] in [0, 1].  Returns
      rows [P, L, 8] int32 — global rows into the [L*T, F] flat table,
      wc   [P, L, 8, 3] float32 — per-dimension corner weight factors
           (w_d for bit 1, 1-w_d for bit 0; their product is the trilinear
           corner weight, kept factored for the position adjoint).
    """
    res_np, dense_np, T = _level_consts(cfg)
    res = jnp.asarray(res_np)                              # [L]
    dense = jnp.asarray(dense_np)

    p = x[:, None, :] * res[None, :, None].astype(x.dtype)  # [P, L, 3]
    p0f = jnp.floor(p)
    w = p - p0f                                            # [P, L, 3]
    p0 = jnp.clip(p0f.astype(jnp.int32), 0, res[None, :, None])

    bits = jnp.asarray(_CORNER_BITS)                       # [8, 3]
    ic = jnp.clip(p0[:, :, None, :] + bits[None, None],    # [P, L, 8, 3]
                  0, res[None, :, None, None])

    # dense index and spatial hash computed for all levels, select by flag
    r1 = (res + 1)[None, :, None]
    d_idx = (ic[..., 0] * r1 + ic[..., 1]) * r1 + ic[..., 2]
    u = ic.astype(jnp.uint32)
    h = (u[..., 0] * jnp.uint32(PRIMES[0])
         ^ u[..., 1] * jnp.uint32(PRIMES[1] & 0xFFFFFFFF)
         ^ u[..., 2] * jnp.uint32(PRIMES[2]))
    h_idx = (h % jnp.uint32(T)).astype(jnp.int32)
    idx = jnp.where(dense[None, :, None], d_idx, h_idx)    # [P, L, 8]
    lvl_base = (jnp.arange(cfg.n_levels, dtype=jnp.int32) * T)[None, :, None]
    rows = idx + lvl_base

    wc = jnp.where(bits[None, None].astype(bool),
                   w[:, :, None, :], 1.0 - w[:, :, None, :])
    return rows, wc


def _encode_impl(table, x, cfg):
    rows, wc = _corner_rows_weights(x, cfg)
    P = x.shape[0]
    L, T, F = table.shape
    flat = table.reshape(L * T, F)
    corner_feats = jnp.take(flat, rows.reshape(-1), axis=0,
                            unique_indices=False,
                            indices_are_sorted=False)      # [P*L*8, F]
    corner_feats = corner_feats.reshape(P, L, 8, F)
    wprod = wc[..., 0] * wc[..., 1] * wc[..., 2]           # [P, L, 8]
    feats = jnp.sum(corner_feats * wprod[..., None], axis=2)  # [P, L, F]
    return feats.reshape(P, L * F), corner_feats


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def encode(table, x, cfg: HashEncodingConfig):
    """x: [P, 3] in [0, 1].  Returns [P, n_levels * n_features]."""
    return _encode_impl(table, x, cfg)[0]


def _encode_fwd(table, x, cfg):
    feats, corner_feats = _encode_impl(table, x, cfg)
    # corner_feats saved: the position adjoint needs them and re-gathering
    # 34M random rows costs ~100x the streaming store
    return feats, (x, corner_feats)


def _encode_bwd(cfg, residuals, g):
    from . import pallas_scatter
    x, corner_feats = residuals
    L, F = cfg.n_levels, cfg.n_features_per_level
    T = 1 << cfg.log2_hashmap_size
    P = x.shape[0]
    rows, wc = _corner_rows_weights(x, cfg)                # recompute: cheap
    res_np, _, _ = _level_consts(cfg)
    g = g.reshape(P, L, 1, F)                              # [P, L, 1, F]

    # ---- table cotangent: binned segment scatter ----
    wprod = wc[..., 0] * wc[..., 1] * wc[..., 2]           # [P, L, 8]
    vals = g * wprod[..., None]                            # [P, L, 8, F]
    vals_t = vals.reshape(P * L * 8, F).T                  # [F, M]
    d_flat_t = pallas_scatter.scatter_add_t(
        rows.reshape(-1), vals_t, L * T)                   # [F, L*T]
    d_table = d_flat_t.T.reshape(L, T, F)

    # ---- position cotangent ----
    # s_c = <g_lvl, table[corner]>; dx_d = sum_{l,c} s_c * sign_cd *
    # prod_{e != d} wc_e * res_l   (w = p - floor(p), so dw/dp = 1 a.e.)
    s = jnp.sum(g * corner_feats, axis=-1)                 # [P, L, 8]
    bits = jnp.asarray(_CORNER_BITS).astype(jnp.float32)   # [8, 3]
    sign = 2.0 * bits - 1.0                                # [8, 3]
    prod_others = jnp.stack(
        [wc[..., 1] * wc[..., 2],
         wc[..., 0] * wc[..., 2],
         wc[..., 0] * wc[..., 1]], axis=-1)                # [P, L, 8, 3]
    resf = jnp.asarray(res_np).astype(jnp.float32)         # [L]
    dx = jnp.einsum('plc,cd,plcd,l->pd', s, sign, prod_others, resf)
    return d_table, dx.astype(x.dtype)


encode.defvjp(_encode_fwd, _encode_bwd)


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
