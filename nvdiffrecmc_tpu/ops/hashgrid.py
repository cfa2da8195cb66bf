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
    """Per-level constants (baked into the jaxpr): resolutions, the
    dense/hashed split (dense levels are a contiguous prefix — resolution
    grows monotonically), and the table size."""
    T = 1 << cfg.log2_hashmap_size
    scales = level_scales(cfg)
    res = np.array(scales, np.int32)                       # [L]
    dense = np.array([(r + 1) ** 3 <= T for r in scales], bool)
    n_dense = int(dense.sum())
    assert dense[:n_dense].all(), 'dense levels must be a prefix'
    return res, n_dense, T


def _wc_t(xt, res_np):
    """Per-dimension corner weight factors, lane-major.

    xt [3, P]; res_np [Ls] for a contiguous level slice.  Returns
      p0 [3, Ls, P] int32 clipped base corner,
      wc [3, Ls, 8, P] float32 (w_d for corner bit 1, 1-w_d for bit 0).
    Lane-major layouts keep P in the 128-lane dim: [*, 8]-minor or
    [*, 2]-minor temps get tile-padded 16-64x on TPU (PERF_NOTES round-2
    session 6), which dominated the first vectorized version of this op.
    """
    res = jnp.asarray(res_np)
    p = xt[:, None, :] * res[None, :, None].astype(xt.dtype)   # [3, Ls, P]
    p0f = jnp.floor(p)
    w = p - p0f
    p0 = jnp.clip(p0f.astype(jnp.int32), 0, res[None, :, None])
    bits = jnp.asarray(_CORNER_BITS.T)                         # [3, 8]
    wc = jnp.where(bits[:, None, :, None].astype(bool),
                   w[:, :, None, :], 1.0 - w[:, :, None, :])   # [3, Ls, 8, P]
    return p0, wc


def _hashed_rows(p0, res_np, T):
    """Global rows into the hashed-level table block.  p0 [3, Lh, P] for
    the hashed level slice; returns rows [Lh, 8, P] int32 in [0, Lh*T)."""
    res = jnp.asarray(res_np)
    bits = jnp.asarray(_CORNER_BITS.T)                         # [3, 8]
    ic = jnp.clip(p0[:, :, None, :] + bits[:, None, :, None],
                  0, res[None, :, None, None])                 # [3, Lh, 8, P]
    u = ic.astype(jnp.uint32)
    h = (u[0] * jnp.uint32(PRIMES[0])
         ^ u[1] * jnp.uint32(PRIMES[1] & 0xFFFFFFFF)
         ^ u[2] * jnp.uint32(PRIMES[2]))
    idx = (h % jnp.uint32(T)).astype(jnp.int32)                # [Lh, 8, P]
    Lh = len(res_np)
    return idx + (jnp.arange(Lh, dtype=jnp.int32) * T)[:, None, None]


def _cell_table_t(level_table, r, F):
    """[8F, (r+1)^3] cell-corner table for one dense level: row block
    c*F..c*F+F holds corner c's features for every cell, so ONE gather per
    (pixel, level) fetches all 8 corners (vs 8 separate 8-byte touches —
    the gather is HBM-latency-bound per row, not per byte).  Built from 8
    clamped-shift views (pure slicing: streaming, exact, differentiable)."""
    n = r + 1
    t3 = level_table[: n ** 3].reshape(n, n, n, F)

    def shift(t, axis):
        # value at index i+1 with the tcnn boundary clamp (corner index
        # clipped to r) — concat(t[1:], t[-1:]) along axis
        idx_hi = [slice(None)] * 3
        idx_hi[axis] = slice(1, None)
        idx_last = [slice(None)] * 3
        idx_last[axis] = slice(n - 1, n)
        return jnp.concatenate([t[tuple(idx_hi)], t[tuple(idx_last)]],
                               axis=axis)

    corners = []
    for c in range(8):
        tc = t3
        for ax in range(3):
            if (c >> ax) & 1:
                tc = shift(tc, ax)
        corners.append(tc.reshape(n ** 3, F))
    return jnp.concatenate(corners, axis=1).T                 # [8F, n^3]


def _cell_table_adjoint(d_ct_t, r, F, T):
    """Adjoint of _cell_table_t: scatter corner-block cotangents back to
    the level table rows (pure pad/slice adds, streaming).  d_ct_t
    [8F, (r+1)^3] -> [T, F] (rows past (r+1)^3 zero)."""
    n = r + 1
    acc = jnp.zeros((n, n, n, F), d_ct_t.dtype)
    for c in range(8):
        dc = d_ct_t[c * F:(c + 1) * F].T.reshape(n, n, n, F)
        for ax in range(2, -1, -1):
            if (c >> ax) & 1:
                # adjoint of clamped shift: out[1:] += in[:-1]; out[-1] += in[-1]
                idx_lo = [slice(None)] * 3
                idx_lo[ax] = slice(0, n - 1)
                idx_last = [slice(None)] * 3
                idx_last[ax] = slice(n - 1, n)
                z = [slice(None)] * 3
                z[ax] = slice(0, 1)
                dc = (jnp.concatenate(
                    [jnp.zeros_like(dc[tuple(z)]), dc[tuple(idx_lo)]],
                    axis=ax).at[tuple(idx_last)].add(dc[tuple(idx_last)]))
        acc = acc + dc
    return jnp.pad(acc.reshape(n ** 3, F), ((0, T - n ** 3), (0, 0)))


def _encode_impl(table, x, cfg):
    """Returns (feats [P, L*F], residual corner features)."""
    res_np, nD, T = _level_consts(cfg)
    L, _, F = table.shape
    P = x.shape[0]
    xt = x.T
    p0, wc = _wc_t(xt, res_np)                      # [3, L, P], [3, L, 8, P]
    wprod = wc[0] * wc[1] * wc[2]                   # [L, 8, P]

    feats_t = []                                    # per level [F, P]
    cf_dense = []
    for l in range(nD):
        r = int(res_np[l])
        ct_t = _cell_table_t(table[l], r, F)
        n = r + 1
        cell = jnp.minimum(p0[0, l], r)
        cell = (cell * n + jnp.minimum(p0[1, l], r)) * n \
            + jnp.minimum(p0[2, l], r)
        cf = jnp.take(ct_t, cell, axis=1)           # [8F, P]
        cf_dense.append(cf)
        f8 = cf.reshape(8, F, P) * wprod[l][:, None, :]
        feats_t.append(jnp.sum(f8, axis=0))         # [F, P]

    cf_hash = None
    if nD < L:
        rows_h = _hashed_rows(p0[:, nD:], res_np[nD:], T)   # [Lh, 8, P]
        tt = table[nD:].reshape(-1, F).T                    # [F, Lh*T]
        cf_hash = jnp.take(tt, rows_h.reshape(-1),
                           axis=1).reshape(F, L - nD, 8, P)
        fh = jnp.sum(cf_hash * wprod[None, nD:], axis=2)    # [F, Lh, P]
        feats_t.extend([fh[:, i] for i in range(L - nD)])

    feats = jnp.stack(feats_t, axis=0)              # [L, F, P]
    return feats.reshape(L * F, P).T, (cf_dense, cf_hash)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def encode(table, x, cfg: HashEncodingConfig):
    """x: [P, 3] in [0, 1].  Returns [P, n_levels * n_features]."""
    return _encode_impl(table, x, cfg)[0]


def _encode_fwd(table, x, cfg):
    feats, cf = _encode_impl(table, x, cfg)
    # corner features saved: the position adjoint needs them and
    # re-gathering ~24M random rows costs ~100x the streaming store
    return feats, (x, cf)


def _encode_bwd(cfg, residuals, g):
    from . import pallas_scatter
    x, (cf_dense, cf_hash) = residuals
    res_np, nD, T = _level_consts(cfg)
    L, F = cfg.n_levels, cfg.n_features_per_level
    P = x.shape[0]
    xt = x.T
    p0, wc = _wc_t(xt, res_np)                      # recompute: cheap ALU
    wprod = wc[0] * wc[1] * wc[2]                   # [L, 8, P]
    g_t = g.T.reshape(L, F, P)                      # [L, F, P]

    bits = jnp.asarray(_CORNER_BITS.T).astype(jnp.float32)   # [3, 8]
    sign = 2.0 * bits - 1.0
    # prod of the other two weight factors per dim, [3, L, 8, P]
    prod_others = jnp.stack(
        [wc[1] * wc[2], wc[0] * wc[2], wc[0] * wc[1]], axis=0)
    resf = jnp.asarray(res_np).astype(jnp.float32)
    dx_t = jnp.zeros((3, P), jnp.float32)

    # ---- dense levels: tiny per-level scatters (no sort) ----
    d_levels = []
    for l in range(nD):
        r = int(res_np[l])
        n = r + 1
        cell = jnp.minimum(p0[0, l], r)
        cell = (cell * n + jnp.minimum(p0[1, l], r)) * n \
            + jnp.minimum(p0[2, l], r)
        # vals[c*F+f, p] = g[l, f, p] * wprod[l, c, p]
        vals = (g_t[l][None] * wprod[l][:, None, :]).reshape(8 * F, P)
        d_ct_t = pallas_scatter.scatter_add_t(cell, vals, n ** 3)
        d_levels.append(_cell_table_adjoint(d_ct_t, r, F, T))
        # position cotangent, dense part
        s = jnp.einsum('fp,cfp->cp', g_t[l],
                       cf_dense[l].reshape(8, F, P))         # [8, P]
        dx_t = dx_t + resf[l] * jnp.einsum(
            'cp,dc,dcp->dp', s, sign, prod_others[:, l])

    # ---- hashed levels: one sorted binned scatter ----
    if nD < L:
        rows_h = _hashed_rows(p0[:, nD:], res_np[nD:], T)    # [Lh, 8, P]
        vals_h = (g_t[nD:, None] * wprod[nD:, :, None]).transpose(2, 0, 1, 3)
        d_hash_t = pallas_scatter.scatter_add_t(
            rows_h.reshape(-1), vals_h.reshape(F, -1), (L - nD) * T)
        d_levels.extend(
            d_hash_t.T.reshape(L - nD, T, F))
        s = jnp.einsum('lfp,flcp->lcp', g_t[nD:], cf_hash)   # [Lh, 8, P]
        dx_t = dx_t + jnp.einsum(
            'lcp,dc,dlcp,l->dp', s, sign, prod_others[:, nD:], resf[nD:])

    d_table = jnp.stack(d_levels, axis=0)
    return d_table, dx_t.T.astype(x.dtype)


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
