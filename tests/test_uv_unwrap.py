"""Native UV unwrapper (xatlas role): geometric validity of the atlas."""

import numpy as np

from nvdiffrecmc_tpu import native


def octasphere(sub=2):
    v = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                  [0, 0, 1], [0, 0, -1]], np.float64)
    f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                  [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]])
    for _ in range(sub):
        nv = {}
        verts = list(map(tuple, v))

        def mid(a, b):
            k = (min(a, b), max(a, b))
            if k not in nv:
                m = (v[a] + v[b]) / 2
                m = m / np.linalg.norm(m)
                nv[k] = len(verts)
                verts.append(tuple(m))
            return nv[k]

        nf = []
        for (a, b, c) in f:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nf += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        v = np.array(verts)
        f = np.array(nf)
    return v.astype(np.float32), f.astype(np.int32)


def test_unwrap_basic_validity():
    v, f = octasphere(2)
    out = native.uv_unwrap(v, f)
    assert out is not None, "native toolchain expected in this environment"
    uvs, tidx = out
    assert tidx.shape == f.shape
    assert uvs.shape[1] == 2
    assert tidx.max() < uvs.shape[0]
    assert uvs.min() >= -1e-6 and uvs.max() <= 1.0 + 1e-6

    # every triangle keeps positive area (no flips: cone 60deg guarantees
    # dot(face_n, chart_n) > 0.5 so orthographic projection preserves sign)
    p = uvs[tidx]
    area2 = ((p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1])
             - (p[:, 2, 0] - p[:, 0, 0]) * (p[:, 1, 1] - p[:, 0, 1]))
    assert np.all(np.abs(area2) > 1e-12)
    signs = np.sign(area2)
    # orientation is consistent within the mesh -> consistent in the atlas
    assert np.all(signs == signs[0])


def test_unwrap_no_overlap():
    """No two triangles may claim the same texel (sampled point-in-triangle
    check on a grid)."""
    v, f = octasphere(2)
    uvs, tidx = native.uv_unwrap(v, f)
    R = 128
    g = (np.arange(R) + 0.5) / R
    gx, gy = np.meshgrid(g, g)
    pts = np.stack([gx.ravel(), gy.ravel()], -1)   # [R*R, 2]

    p = uvs[tidx]                                   # [T, 3, 2]
    count = np.zeros(pts.shape[0], np.int32)
    for t in range(p.shape[0]):
        a, b, c = p[t]
        d = np.cross(b - a, c - a)
        e0 = np.cross(b - a, pts - a) * np.sign(d)
        e1 = np.cross(c - b, pts - b) * np.sign(d)
        e2 = np.cross(a - c, pts - c) * np.sign(d)
        # strict interior only (shared chart edges both touch the boundary)
        inside = (e0 > 1e-9) & (e1 > 1e-9) & (e2 > 1e-9)
        count += inside.astype(np.int32)
    assert count.max() <= 1


def test_unwrap_uniform_texel_density():
    """2D areas should be proportional to 3D areas within the cone-distortion
    bound (cos 60deg)."""
    v, f = octasphere(2)
    uvs, tidx = native.uv_unwrap(v, f)
    p2 = uvs[tidx]
    a2 = 0.5 * np.abs(
        (p2[:, 1, 0] - p2[:, 0, 0]) * (p2[:, 2, 1] - p2[:, 0, 1])
        - (p2[:, 2, 0] - p2[:, 0, 0]) * (p2[:, 1, 1] - p2[:, 0, 1]))
    e1 = v[f[:, 1]] - v[f[:, 0]]
    e2 = v[f[:, 2]] - v[f[:, 0]]
    a3 = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
    ratio = a2 / a3
    assert ratio.max() / ratio.min() < 2.5   # 1/cos(60deg) = 2 + slack
