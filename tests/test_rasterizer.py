import numpy as np
import jax.numpy as jnp
import pytest

from foundationpose_tpu.ops import render_mesh
from foundationpose_tpu.geometry import compute_crop_window_tf
from foundationpose_tpu.meshio import make_box

K = np.array([[100.0, 0, 32.0], [0, 100.0, 32.0], [0, 0, 1.0]], dtype=np.float32)


def single_triangle(z=1.0):
    """A triangle parallel to the image plane at depth z, covering the
    image-center region."""
    pos = np.array(
        [[-0.2, -0.2, 0.0], [0.2, -0.2, 0.0], [0.0, 0.25, 0.0]], dtype=np.float32
    )
    faces = np.array([[0, 1, 2]], dtype=np.int32)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = z
    return pos, faces, pose


class TestTriangle:
    def test_coverage_analytic(self):
        pos, faces, pose = single_triangle(z=1.0)
        out = render_mesh(
            jnp.asarray(pos),
            jnp.asarray(faces),
            jnp.asarray(pose[None]),
            jnp.asarray(K),
            out_hw=(64, 64),
            vertex_color=jnp.ones((3, 3)),
            use_light=False,
        )
        mask = np.asarray(out.mask[0])
        # Analytic check: pixel centers inside the projected triangle.
        verts2d = []
        for p in pos:
            pc = pose[:3, :3] @ p + pose[:3, 3]
            verts2d.append([K[0, 0] * pc[0] / pc[2] + K[0, 2], K[1, 1] * pc[1] / pc[2] + K[1, 2]])
        verts2d = np.array(verts2d)

        def inside(px, py):
            def cross(a, b, p):
                return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
            d0 = cross(verts2d[0], verts2d[1], (px, py))
            d1 = cross(verts2d[1], verts2d[2], (px, py))
            d2 = cross(verts2d[2], verts2d[0], (px, py))
            return (d0 >= 0 and d1 >= 0 and d2 >= 0) or (d0 <= 0 and d1 <= 0 and d2 <= 0)

        expect = np.zeros((64, 64), dtype=bool)
        for i in range(64):
            for j in range(64):
                expect[i, j] = inside(float(j), float(i))
        # allow a 1-px boundary band of disagreement
        disagree = mask != expect
        from scipy.ndimage import binary_dilation

        boundary = binary_dilation(expect) & ~0  # boundary band
        interior_disagree = disagree & ~binary_dilation(expect ^ binary_dilation(expect))
        assert disagree.sum() <= np.count_nonzero(expect ^ binary_dilation(expect)) + 5
        assert mask.sum() > 100

    def test_depth_value(self):
        pos, faces, pose = single_triangle(z=2.0)
        out = render_mesh(
            jnp.asarray(pos),
            jnp.asarray(faces),
            jnp.asarray(pose[None]),
            jnp.asarray(K),
            out_hw=(64, 64),
            vertex_color=jnp.ones((3, 3)),
            use_light=False,
        )
        d = np.asarray(out.depth[0])
        m = np.asarray(out.mask[0])
        np.testing.assert_allclose(d[m], 2.0, atol=1e-4)
        np.testing.assert_allclose(d[~m], 0.0)

    def test_xyz_map_consistency(self):
        # xyz map reprojected through K must land on the pixel itself.
        pos, faces, pose = single_triangle(z=1.5)
        out = render_mesh(
            jnp.asarray(pos),
            jnp.asarray(faces),
            jnp.asarray(pose[None]),
            jnp.asarray(K),
            out_hw=(64, 64),
            vertex_color=jnp.ones((3, 3)),
            use_light=False,
        )
        xyz = np.asarray(out.xyz[0])
        m = np.asarray(out.mask[0])
        ii, jj = np.nonzero(m)
        pts = xyz[ii, jj]
        u = K[0, 0] * pts[:, 0] / pts[:, 2] + K[0, 2]
        v = K[1, 1] * pts[:, 1] / pts[:, 2] + K[1, 2]
        np.testing.assert_allclose(u, jj.astype(np.float64), atol=1e-2)
        np.testing.assert_allclose(v, ii.astype(np.float64), atol=1e-2)

    def test_z_buffer_nearest_wins(self):
        # Two stacked triangles; the nearer one must own the overlap.
        pos = np.array(
            [
                [-0.2, -0.2, 0.0], [0.2, -0.2, 0.0], [0.0, 0.25, 0.0],  # z=1 plane
                [-0.2, -0.2, 0.5], [0.2, -0.2, 0.5], [0.0, 0.25, 0.5],  # z=1.5 plane
            ],
            dtype=np.float32,
        )
        faces = np.array([[3, 4, 5], [0, 1, 2]], dtype=np.int32)  # far listed first
        colors = np.array(
            [[1, 0, 0], [1, 0, 0], [1, 0, 0], [0, 1, 0], [0, 1, 0], [0, 1, 0]],
            dtype=np.float32,
        )
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = 1.0
        out = render_mesh(
            jnp.asarray(pos),
            jnp.asarray(faces),
            jnp.asarray(pose[None]),
            jnp.asarray(K),
            out_hw=(64, 64),
            vertex_color=jnp.asarray(colors),
            use_light=False,
        )
        color = np.asarray(out.color[0])
        d = np.asarray(out.depth[0])
        m = np.asarray(out.mask[0])
        np.testing.assert_allclose(d[m], 1.0, atol=1e-4)  # near plane wins everywhere
        np.testing.assert_allclose(color[m], [[1, 0, 0]] * m.sum(), atol=1e-5)

    def test_vertex_color_interpolation(self):
        pos, faces, pose = single_triangle(z=1.0)
        colors = np.eye(3, dtype=np.float32)  # r, g, b at the corners
        out = render_mesh(
            jnp.asarray(pos),
            jnp.asarray(faces),
            jnp.asarray(pose[None]),
            jnp.asarray(K),
            out_hw=(64, 64),
            vertex_color=jnp.asarray(colors),
            use_light=False,
        )
        color = np.asarray(out.color[0])
        m = np.asarray(out.mask[0])
        # Inside pixels: barycentric colors sum to ~1
        s = color[m].sum(axis=-1)
        np.testing.assert_allclose(s, 1.0, atol=1e-3)

    def test_behind_camera_culled(self):
        pos, faces, pose = single_triangle(z=-1.0)  # behind the camera
        out = render_mesh(
            jnp.asarray(pos),
            jnp.asarray(faces),
            jnp.asarray(pose[None]),
            jnp.asarray(K),
            out_hw=(32, 32),
            vertex_color=jnp.ones((3, 3)),
            use_light=False,
        )
        assert np.asarray(out.mask).sum() == 0


class TestBoxRender:
    def test_front_face_depth(self):
        box = make_box(np.array([0.2, 0.2, 0.2]))
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = 1.0
        out = render_mesh(
            jnp.asarray(box.vertices.astype(np.float32)),
            jnp.asarray(box.faces.astype(np.int32)),
            jnp.asarray(pose[None]),
            jnp.asarray(K),
            out_hw=(64, 64),
            vertex_color=jnp.ones((8, 3)) * 0.8,
            vnormals=jnp.asarray(box.vertex_normals.astype(np.float32)),
            use_light=True,
        )
        d = np.asarray(out.depth[0])
        # Center pixel sees the front face at z = 1.0 - 0.1
        assert abs(d[32, 32] - 0.9) < 1e-3
        # Object projected half-size: 0.1/0.9*100 ~ 11 px
        m = np.asarray(out.mask[0])
        assert m[32, 32]
        assert not m[2, 2]

    def test_batched_poses_differ(self):
        box = make_box(np.array([0.2, 0.2, 0.2]))
        poses = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
        poses[0, 2, 3] = 1.0
        poses[1, 2, 3] = 2.0
        out = render_mesh(
            jnp.asarray(box.vertices.astype(np.float32)),
            jnp.asarray(box.faces.astype(np.int32)),
            jnp.asarray(poses),
            jnp.asarray(K),
            out_hw=(64, 64),
            vertex_color=jnp.ones((8, 3)),
            use_light=False,
        )
        m0 = np.asarray(out.mask[0]).sum()
        m1 = np.asarray(out.mask[1]).sum()
        assert m0 > m1 > 0  # nearer object covers more pixels
        d = np.asarray(out.depth)
        assert abs(d[0, 32, 32] - 0.9) < 1e-3
        assert abs(d[1, 32, 32] - 1.9) < 1e-3

    def test_crop_roi_render(self):
        # Rendering with a crop transform must equal warping the full
        # render (up to resampling error at edges).
        box = make_box(np.array([0.15, 0.15, 0.15]))
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0.05, -0.03, 0.8]
        diameter = float(np.linalg.norm([0.15, 0.15, 0.15]))
        crop = compute_crop_window_tf(
            jnp.asarray(pose[None]), jnp.asarray(K), 1.2, 48, diameter
        )
        out_crop = render_mesh(
            jnp.asarray(box.vertices.astype(np.float32)),
            jnp.asarray(box.faces.astype(np.int32)),
            jnp.asarray(pose[None]),
            jnp.asarray(K),
            out_hw=(48, 48),
            crop_tf=crop,
            vertex_color=jnp.ones((8, 3)),
            use_light=False,
        )
        # The object's projected center lands mid-crop.
        m = np.asarray(out_crop.mask[0])
        assert m[24, 24]
        assert m.sum() > 200
        # Depth at crop center equals front-face depth.
        assert abs(np.asarray(out_crop.depth[0])[24, 24] - (0.8 - 0.075)) < 1e-3

    def test_lighting_shades_side_faces(self):
        box = make_box(np.array([0.2, 0.2, 0.2]))
        pose = np.eye(4, dtype=np.float32)
        # Rotate the box so a side face is visible, light head-on.
        a = np.deg2rad(40.0)
        pose[:3, :3] = np.array(
            [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]]
        )
        pose[2, 3] = 1.0
        out = render_mesh(
            jnp.asarray(box.vertices.astype(np.float32)),
            jnp.asarray(box.faces.astype(np.int32)),
            jnp.asarray(pose[None]),
            jnp.asarray(K),
            out_hw=(64, 64),
            vertex_color=jnp.ones((8, 3)),
            vnormals=jnp.asarray(box.vertex_normals.astype(np.float32)),
            use_light=True,
        )
        c = np.asarray(out.color[0])
        m = np.asarray(out.mask[0])
        vals = np.unique(np.round(c[m][:, 0], 3))
        assert len(vals) > 3  # shading varies across faces


class TestTexture:
    def test_texture_sampling(self):
        # Quad with a 2-tone texture; check left/right halves colored.
        pos = np.array(
            [[-0.2, -0.2, 0], [0.2, -0.2, 0], [0.2, 0.2, 0], [-0.2, 0.2, 0]],
            dtype=np.float32,
        )
        faces = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
        uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=np.float32)
        tex = np.zeros((8, 8, 3), dtype=np.float32)
        tex[:, :4] = [1, 0, 0]
        tex[:, 4:] = [0, 0, 1]
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = 1.0
        out = render_mesh(
            jnp.asarray(pos),
            jnp.asarray(faces),
            jnp.asarray(pose[None]),
            jnp.asarray(K),
            out_hw=(64, 64),
            uv=jnp.asarray(uv),
            tex=jnp.asarray(tex),
            use_light=False,
        )
        c = np.asarray(out.color[0])
        # u=0 maps to image left (x=-0.2 -> pixel 12), red side
        np.testing.assert_allclose(c[32, 16], [1, 0, 0], atol=0.05)
        np.testing.assert_allclose(c[32, 48], [0, 0, 1], atol=0.05)

    def test_quad_packed_sampler_matches_four_tap(self):
        """The 1-gather quad-packed bilinear sampler (hot path) must
        reproduce the 4-tap reference exactly, including the clamp
        convention outside [0, 1] and on the border rows."""
        from foundationpose_tpu.ops.rasterizer import (
            _pack_texture_quads, _sample_texture, _sample_texture_quad,
        )

        rng = np.random.default_rng(0)
        tex = jnp.asarray(rng.uniform(0, 1, (13, 9, 3)).astype(np.float32))
        uv = rng.uniform(-0.2, 1.2, (500, 2)).astype(np.float32)
        # exact texel centers/corners and borders too
        edges = np.array(
            [[0, 0], [1, 1], [0, 1], [1, 0], [0.5, 0.5],
             [1 / 18, 1 / 26], [17 / 18, 25 / 26], [-0.1, 0.5], [0.5, 1.1]],
            dtype=np.float32,
        )
        uv = jnp.asarray(np.concatenate([uv, edges]))
        ref = _sample_texture(tex, uv)
        quad = _sample_texture_quad(
            _pack_texture_quads(tex), (13, 9), uv
        )
        np.testing.assert_allclose(np.asarray(quad), np.asarray(ref), atol=1e-6)


class TestPallasPath:
    def test_pallas_matches_binned(self):
        """method='pallas' (interpret mode on CPU) == method='binned'."""
        from foundationpose_tpu.geometry.icosphere import icosphere
        from foundationpose_tpu.meshio import compute_vertex_normals

        verts, faces = icosphere(2, radius=0.1)  # 320 faces
        rng = np.random.default_rng(0)
        colors = rng.integers(30, 255, (len(verts), 3)).astype(np.float32) / 255
        vn = compute_vertex_normals(verts, faces)
        poses = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
        poses[0, 2, 3] = 0.6
        poses[1, 2, 3] = 0.9
        poses[1, :3, :3] = np.array(
            [[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32
        )
        args = dict(
            out_hw=(64, 64),
            vertex_color=jnp.asarray(colors),
            vnormals=jnp.asarray(vn.astype(np.float32)),
            use_light=True,
            tile=32,
            max_faces_per_tile=128,
        )
        a = render_mesh(
            jnp.asarray(verts.astype(np.float32)),
            jnp.asarray(faces.astype(np.int32)),
            jnp.asarray(poses), jnp.asarray(K),
            method="binned", **args,
        )
        b = render_mesh(
            jnp.asarray(verts.astype(np.float32)),
            jnp.asarray(faces.astype(np.int32)),
            jnp.asarray(poses), jnp.asarray(K),
            method="pallas", **args,
        )
        np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
        # pallas reconstructs xyz as z*ray instead of interpolating
        # vertex positions — identical on the triangle plane up to fp
        # (~4e-5 m at 0.9 m depth).
        np.testing.assert_allclose(np.asarray(a.xyz), np.asarray(b.xyz), atol=2e-4)
        np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color), atol=1e-4)


class TestGoldenRender:
    def test_box_render_matches_golden(self):
        """Golden-file regression (SURVEY.md SS4): a fixed mesh/pose render
        must stay pixel-stable across refactors. Regenerate the fixture
        with the script header in tests/golden/ only for intentional
        rasterizer changes."""
        import os

        from foundationpose_tpu.meshio import make_box
        from foundationpose_tpu.geometry import so3_exp_map

        golden = np.load(
            os.path.join(os.path.dirname(__file__), "golden", "box_render.npz")
        )
        box = make_box(np.array([0.12, 0.08, 0.2]))
        rng = np.random.default_rng(7)
        box.vertex_colors = rng.integers(40, 250, (8, 3)).astype(np.uint8)
        K = jnp.asarray(
            np.array([[150.0, 0, 64.0], [0, 150.0, 64.0], [0, 0, 1.0]], np.float32)
        )
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = np.asarray(
            so3_exp_map(jnp.asarray([[0.4, -0.3, 0.8]], jnp.float32))
        )[0]
        pose[:3, 3] = [0.01, -0.02, 0.5]
        for method in ("brute", "binned"):
            out = render_mesh(
                jnp.asarray(box.vertices.astype(np.float32)),
                jnp.asarray(box.faces.astype(np.int32)),
                jnp.asarray(pose[None]), K, out_hw=(128, 128),
                vertex_color=jnp.asarray(box.vertex_colors.astype(np.float32) / 255),
                vnormals=jnp.asarray(box.vertex_normals.astype(np.float32)),
                use_light=True, method=method,
                **({"tile": 32, "max_faces_per_tile": 12} if method == "binned" else {}),
            )
            np.testing.assert_array_equal(
                np.asarray(out.mask[0], np.uint8), golden["mask"], err_msg=method
            )
            np.testing.assert_allclose(
                np.asarray(out.color[0]), golden["color"], atol=2e-3, err_msg=method
            )
            np.testing.assert_allclose(
                np.asarray(out.depth[0]), golden["depth"], atol=1e-4, err_msg=method
            )


class TestPallasCapacityRounds:
    def test_dense_tile_exact_and_overflow_reported(self):
        """A tiny on-screen object packs thousands of faces into one
        tile. The pallas path must stay mask-exact vs brute via its
        capacity rounds (VERDICT r1 item 9: the XLA binned path
        silently drops faces here), and must REPORT overflow once the
        rounds*K capacity is truly exceeded."""
        from foundationpose_tpu.geometry.icosphere import icosphere
        from foundationpose_tpu.meshio import compute_vertex_normals

        verts, faces = icosphere(3, radius=0.1)  # 1280 faces
        vn = compute_vertex_normals(verts, faces)
        colors = (
            np.random.default_rng(0)
            .integers(30, 255, (len(verts), 3))
            .astype(np.float32)
            / 255
        )
        pose = np.eye(4, dtype=np.float32)
        pose[2, 3] = 3.0  # far away -> ~10 px object, all in one tile
        args = dict(
            out_hw=(64, 64),
            vertex_color=jnp.asarray(colors),
            vnormals=jnp.asarray(vn.astype(np.float32)),
            use_light=True,
            tile=32,
            max_faces_per_tile=128,
        )
        call = lambda method, **kw: render_mesh(
            jnp.asarray(verts.astype(np.float32)),
            jnp.asarray(faces.astype(np.int32)),
            jnp.asarray(pose[None]), jnp.asarray(K),
            method=method, **args, **kw,
        )
        a = call("brute")
        b = call("pallas", raster_rounds=8)  # 8*128 >= visible faces
        np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
        assert int(np.asarray(b.overflow).sum()) == 0

        c = call("pallas", raster_rounds=1)  # 128 slots << faces
        assert int(np.asarray(c.overflow).max()) > 0, (
            "expected per-tile overflow to be reported"
        )

        # Forced XLA 'binned' must also report instead of silently
        # dropping geometry (VERDICT r2 item 7): overflowing capacity
        # is flagged, sufficient capacity reports zero and is exact.
        d = call("binned")  # 128 slots << faces -> drops + reports
        assert int(np.asarray(d.overflow).max()) > 0, (
            "forced binned must report dropped faces"
        )
        e = render_mesh(
            jnp.asarray(verts.astype(np.float32)),
            jnp.asarray(faces.astype(np.int32)),
            jnp.asarray(pose[None]), jnp.asarray(K),
            method="binned", **{**args, "max_faces_per_tile": 1536},
        )
        assert int(np.asarray(e.overflow).sum()) == 0
        np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(e.mask))
