"""Rasterizer golden tests: coverage, barycentrics, perspective correctness,
depth resolve, depth peeling, interpolation gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from nvdiffrecmc_tpu.ops import rasterizer as ras
from nvdiffrecmc_tpu.ops.vecmath import perspective, translate


def full_screen_tri():
    # big triangle covering the whole NDC square at z=0, w=1
    v = jnp.array([[-3.0, -3.0, 0.0, 1.0],
                   [3.0, -3.0, 0.0, 1.0],
                   [0.0, 3.0, 0.0, 1.0]])[None]
    t = jnp.array([[0, 1, 2]], dtype=jnp.int32)
    return v, t


def test_full_coverage_and_bary_sum():
    v, t = full_screen_tri()
    rast, db = ras.rasterize(v, t, (32, 32))
    tid = rast[..., 3]
    assert np.all(np.asarray(tid) == 1.0)
    u, vv = np.asarray(rast[..., 0]), np.asarray(rast[..., 1])
    assert np.all(u >= -1e-5) and np.all(vv >= -1e-5)
    assert np.all(u + vv <= 1.0 + 1e-5)


def test_half_screen_triangle_coverage():
    # right-angle triangle covering lower-left half (in y-down image space,
    # NDC y = +1 is the bottom row)
    v = jnp.array([[-1.0, -1.0, 0.0, 1.0],
                   [1.0, -1.0, 0.0, 1.0],
                   [-1.0, 1.0, 0.0, 1.0]])[None]
    t = jnp.array([[0, 1, 2]], dtype=jnp.int32)
    rast, _ = ras.rasterize(v, t, (64, 64))
    cov = np.asarray(rast[0, ..., 3] > 0)
    frac = cov.mean()
    assert abs(frac - 0.5) < 0.03
    # diagonal from top-right... pixel (r, c): covered iff sx + sy <= 0
    assert cov[10, 10] and not cov[10, 60]


def test_depth_resolve_two_triangles():
    # two overlapping full-screen tris at different depths; nearer (smaller z)
    # must win
    v = jnp.array([[-3.0, -3.0, 0.5, 1.0], [3.0, -3.0, 0.5, 1.0], [0.0, 3.0, 0.5, 1.0],
                   [-3.0, -3.0, -0.5, 1.0], [3.0, -3.0, -0.5, 1.0], [0.0, 3.0, -0.5, 1.0]])[None]
    t = jnp.array([[0, 1, 2], [3, 4, 5]], dtype=jnp.int32)
    rast, _ = ras.rasterize(v, t, (16, 16))
    assert np.all(np.asarray(rast[..., 3]) == 2.0)
    np.testing.assert_allclose(np.asarray(rast[..., 2]), -0.5, atol=1e-5)

    # depth peeling: second layer gives the farther triangle
    rast2, _ = ras.rasterize(v, t, (16, 16), prev_rast=rast)
    assert np.all(np.asarray(rast2[..., 3]) == 1.0)
    # third layer is empty
    rast3, _ = ras.rasterize(v, t, (16, 16), prev_rast=rast2)
    assert np.all(np.asarray(rast3[..., 3]) == 0.0)


def test_perspective_correct_interpolation():
    """A quad receding in depth: interpolated attribute must be
    perspective-correct (non-linear in screen space)."""
    proj = jnp.asarray(perspective(0.7854, 1.0, 0.1, 10.0) @ translate(0, 0, -3))
    # vertical quad tilted in z: left edge at z=-1(cam dist 2), right at z=+1
    verts = jnp.array([[-1.0, -1.0, 1.0], [1.0, -1.0, -1.0],
                       [1.0, 1.0, -1.0], [-1.0, 1.0, 1.0]])
    hom = jnp.concatenate([verts, jnp.ones((4, 1))], -1)
    v_clip = (hom @ proj.T)[None]
    t = jnp.array([[0, 1, 2], [0, 2, 3]], dtype=jnp.int32)
    rast, db = ras.rasterize(v_clip, t, (64, 64))
    attr = jnp.array([[0.0], [1.0], [1.0], [0.0]])  # attribute = (x+1)/2
    out, _ = ras.interpolate(attr, rast, t)
    # reconstruct world x from barycentric-interp attr; compare against
    # analytic perspective projection at row 32
    row = np.asarray(out[0, 32, :, 0])
    tid = np.asarray(rast[0, 32, :, 3])
    cols = np.where(tid > 0)[0]
    # world-space: point on quad with param a in [0,1]: x = 2a-1, z = 1-2a
    # projected: sx = x / (y_fac*(3 - z)) with y_fac = tan(fovy/2) = ~0.4142
    y_fac = np.tan(0.7854 / 2)
    for c in cols[::8]:
        sx = 2 * (c + 0.5) / 64 - 1
        # solve sx = (2a-1)/(yfac*(3-(1-2a)))  ->  sx*yfac*(2+2a) = 2a-1
        k = sx * y_fac
        a = (k * 2 + 1) / (2 - 2 * k)
        np.testing.assert_allclose(row[c], a, atol=2e-2)


def test_interior_gradients_flow_to_positions():
    v, t = full_screen_tri()

    def f(vc):
        rast, _ = ras.rasterize(vc, t, (16, 16))
        attr = jnp.array([[1.0], [0.0], [0.0]])
        out, _ = ras.interpolate(attr, rast, t)
        return jnp.sum(out ** 2)

    g = jax.grad(f)(v)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0.0


def test_uv_derivatives_match_finite_difference():
    """rast_db screen derivatives should match finite differences of u,v."""
    proj = jnp.asarray(perspective(0.7854, 1.0, 0.1, 10.0) @ translate(0.2, 0, -2.5))
    verts = jnp.array([[-1.0, -1.0, 0.3], [1.0, -1.0, -0.4], [0.0, 1.0, 0.1]])
    hom = jnp.concatenate([verts, jnp.ones((3, 1))], -1)
    v_clip = (hom @ proj.T)[None]
    t = jnp.array([[0, 1, 2]], dtype=jnp.int32)
    H = W = 128
    rast, db = ras.rasterize(v_clip, t, (H, W))
    tid = np.asarray(rast[0, ..., 3])
    u = np.asarray(rast[0, ..., 0])
    v = np.asarray(rast[0, ..., 1])
    dudx = np.asarray(db[0, ..., 0])
    dvdy = np.asarray(db[0, ..., 3])
    ys, xs = np.where(tid > 0)
    # interior pixels only
    cnt = 0
    for (r, c) in zip(ys, xs):
        if (tid[r, c - 1] > 0 and tid[r, c + 1] > 0 and tid[r - 1, c] > 0
                and tid[r + 1, c] > 0 and 1 <= r < H - 1 and 1 <= c < W - 1):
            fd_u = (u[r, c + 1] - u[r, c - 1]) / 2
            fd_v = (v[r + 1, c] - v[r - 1, c]) / 2
            np.testing.assert_allclose(dudx[r, c], fd_u, rtol=2e-2, atol=1e-4)
            np.testing.assert_allclose(dvdy[r, c], fd_v, rtol=2e-2, atol=1e-4)
            cnt += 1
            if cnt > 50:
                break
    assert cnt > 10


def test_perspective_depth_is_z_over_w():
    """rast z channel must equal interpolated z/w (caught a real bug where it
    returned clip Z instead)."""
    proj = jnp.asarray(perspective(0.7854, 1.0, 0.1, 100.0) @ translate(0, 0, -2.5))
    verts = jnp.array([[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.5, 0.0]])
    hom = jnp.concatenate([verts, jnp.ones((3, 1))], -1)
    v_clip = (hom @ proj.T)[None]
    t = jnp.array([[0, 1, 2]], dtype=jnp.int32)
    rast, _ = ras.rasterize(v_clip, t, (32, 32))
    zw = float(v_clip[0, 0, 2] / v_clip[0, 0, 3])  # constant depth plane
    tid = np.asarray(rast[0, ..., 3])
    zs = np.asarray(rast[0, ..., 2])[tid > 0]
    assert tid.max() > 0
    np.testing.assert_allclose(zs, zw, atol=1e-4)


def _random_mesh(n_tri=300, seed=5):
    """Random small triangles in front of a perspective camera."""
    rng = np.random.RandomState(seed)
    centers = rng.uniform(-1.2, 1.2, (n_tri, 1, 3)).astype(np.float32)
    centers[..., 2] -= 3.0
    offs = rng.uniform(-0.25, 0.25, (n_tri, 3, 3)).astype(np.float32)
    pts = (centers + offs).reshape(-1, 3)
    v4 = np.concatenate([pts, np.ones((pts.shape[0], 1), np.float32)], -1)
    proj = np.asarray(perspective(0.9, 1.0, 0.1, 100.0))
    vc = jnp.asarray(v4 @ proj.T)[None]
    t = jnp.arange(n_tri * 3, dtype=jnp.int32).reshape(n_tri, 3)
    return vc, t


def test_pallas_resolve_matches_jnp():
    """Binned Pallas resolve (interpret mode) vs the jnp scan resolve,
    including a depth-peeled second layer, on a random triangle soup."""
    vc, t = _random_mesh()
    res = (48, 64)  # non-tile-multiple height exercises the crop path
    r_j, _ = ras.rasterize(vc, t, res, backend='jnp')
    r_p, _ = ras.rasterize(vc, t, res, backend='pallas-interpret')
    np.testing.assert_array_equal(np.asarray(r_p[..., 3]),
                                  np.asarray(r_j[..., 3]))
    np.testing.assert_allclose(np.asarray(r_p[..., :3]),
                               np.asarray(r_j[..., :3]), rtol=1e-5,
                               atol=1e-6)

    r2_j, _ = ras.rasterize(vc, t, res, prev_rast=r_j, backend='jnp')
    r2_p, _ = ras.rasterize(vc, t, res, prev_rast=r_j,
                            backend='pallas-interpret')
    np.testing.assert_array_equal(np.asarray(r2_p[..., 3]),
                                  np.asarray(r2_j[..., 3]))


def test_pallas_resolve_batch():
    vc1, t = _random_mesh(seed=5)
    vc2, _ = _random_mesh(seed=6)
    vc = jnp.concatenate([vc1, vc2], 0)
    r_j, _ = ras.rasterize(vc, t, (32, 32), backend='jnp')
    r_p, _ = ras.rasterize(vc, t, (32, 32), backend='pallas-interpret')
    np.testing.assert_array_equal(np.asarray(r_p[..., 3]),
                                  np.asarray(r_j[..., 3]))


def test_near_plane_crossing_clipless():
    """Triangles crossing the w=0 plane (camera inside the scene) must
    rasterize their w>0 part exactly — validated against a per-pixel
    ray-cast oracle (the role of nvdiffrast's clipping)."""
    H = W = 64
    fovy, near, far = 0.9, 0.1, 100.0
    proj = np.asarray(perspective(fovy, 1.0, near, far))
    # ground plane quad extending from far in front to far BEHIND the eye
    # (camera at origin looking down -z, plane at y = -0.5)
    pts = np.array([[-5.0, -0.5, -8.0], [5.0, -0.5, -8.0],
                    [-5.0, -0.5, 5.0], [5.0, -0.5, 5.0]], np.float32)
    tri = np.array([[0, 1, 2], [2, 1, 3]], np.int32)
    v4 = np.concatenate([pts, np.ones((4, 1), np.float32)], -1)
    vc = jnp.asarray(v4 @ proj.T)[None]

    for backend in ('jnp', 'pallas-interpret'):
        rast, _ = ras.rasterize(vc, jnp.asarray(tri), (H, W),
                                backend=backend)
        cov = np.asarray(rast[0, ..., 3] > 0)

        # oracle: ray-cast pixel centers against the plane y=-0.5, accept
        # hits with near <= -z_hit and inside the quad footprint
        tan_half = np.tan(fovy / 2)
        got_err = 0
        for r in (5, 20, 32, 40, 55, 63):
            for c in (3, 17, 31, 44, 60):
                sx = (2 * (c + 0.5) / W - 1) * tan_half
                sy = (2 * (r + 0.5) / H - 1) * tan_half  # y-down NDC
                d = np.array([sx, -sy, -1.0])  # proj flips y
                want = False
                if d[1] < 0:  # pointing down
                    t = -0.5 / d[1]
                    hit = d * t
                    if (-8.0 <= hit[2] <= 5.0 and -5.0 <= hit[0] <= 5.0
                            and -hit[2] >= near and -hit[2] <= far):
                        want = True
                got_err += int(cov[r, c] != want)
        assert got_err == 0, (backend, got_err)
