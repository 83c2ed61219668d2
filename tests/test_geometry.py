import numpy as np
import jax
import jax.numpy as jnp
import pytest

from foundationpose_tpu.geometry import (
    so3_exp_map,
    so3_log_map,
    rotation_6d_to_matrix,
    euler_matrix,
    transform_pts,
    transform_dirs,
    to_homo,
    make_pose,
    invert_pose,
    pose_to_egocentric_delta_pose,
    egocentric_delta_pose_to_pose,
    project_points,
    depth_to_xyz_map,
    compute_crop_window_tf,
    invert_affine2d,
    guess_translation,
    sample_views_icosphere,
    symmetry_tfs_from_info,
    cluster_poses,
    cluster_poses_numpy,
)


def random_rotation(rng, n=None):
    """Random rotations via QR of gaussian matrices."""
    shape = (3, 3) if n is None else (n, 3, 3)
    A = rng.standard_normal(shape)
    Q, R = np.linalg.qr(A)
    d = np.sign(np.diagonal(R, axis1=-2, axis2=-1))
    Q = Q * d[..., None, :]
    det = np.linalg.det(Q)
    Q[..., :, 0] *= det[..., None]
    return Q


class TestSO3:
    def test_exp_identity(self):
        R = so3_exp_map(jnp.zeros((2, 3)))
        np.testing.assert_allclose(R, np.tile(np.eye(3), (2, 1, 1)), atol=1e-6)

    def test_exp_quarter_turn_z(self):
        R = so3_exp_map(jnp.array([[0.0, 0.0, np.pi / 2]]))[0]
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
        np.testing.assert_allclose(R, expected, atol=1e-6)

    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(0)
        w = rng.standard_normal((64, 3)) * 0.8
        R = so3_exp_map(jnp.asarray(w, dtype=jnp.float32))
        w2 = so3_log_map(R)
        np.testing.assert_allclose(w2, w, atol=1e-4)

    def test_exp_is_rotation(self):
        rng = np.random.default_rng(1)
        w = rng.standard_normal((16, 3)) * 2.0
        R = np.asarray(so3_exp_map(jnp.asarray(w, dtype=jnp.float32)))
        RtR = np.einsum("nij,nik->njk", R, R)
        np.testing.assert_allclose(RtR, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_small_angle_stable(self):
        w = jnp.array([[1e-9, 0.0, 0.0]])
        R = so3_exp_map(w)
        assert np.isfinite(np.asarray(R)).all()
        np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)


class TestRotation6D:
    def test_identity(self):
        d6 = jnp.array([[1.0, 0, 0, 0, 1.0, 0]])
        np.testing.assert_allclose(rotation_6d_to_matrix(d6)[0], np.eye(3), atol=1e-6)

    def test_recovers_rotation_rows(self):
        rng = np.random.default_rng(2)
        R = random_rotation(rng, 8).astype(np.float32)
        d6 = np.concatenate([R[:, 0, :], R[:, 1, :]], axis=-1)
        R2 = rotation_6d_to_matrix(jnp.asarray(d6))
        np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_orthonormal_for_noisy_input(self):
        rng = np.random.default_rng(3)
        d6 = rng.standard_normal((8, 6)).astype(np.float32)
        R = np.asarray(rotation_6d_to_matrix(jnp.asarray(d6)))
        RtR = np.einsum("nij,nik->njk", R, R)
        np.testing.assert_allclose(RtR, np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)


class TestEuler:
    def test_z_only(self):
        a = 0.7
        M = np.asarray(euler_matrix(0.0, 0.0, a))
        c, s = np.cos(a), np.sin(a)
        expected = np.eye(4)
        expected[:2, :2] = [[c, -s], [s, c]]
        np.testing.assert_allclose(M, expected, atol=1e-6)


class TestTransforms:
    def test_transform_pts_batched_tf(self):
        rng = np.random.default_rng(4)
        R = random_rotation(rng, 5)
        t = rng.standard_normal((5, 3))
        tf = np.asarray(make_pose(jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32)))
        pts = rng.standard_normal((7, 3)).astype(np.float32)
        out = transform_pts(jnp.asarray(pts), jnp.asarray(tf))
        expected = np.einsum("bij,nj->bni", R, pts) + t[:, None]
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_transform_dirs_ignores_translation(self):
        tf = np.eye(4, dtype=np.float32)
        tf[:3, 3] = [1, 2, 3]
        dirs = np.array([[1.0, 0, 0]], dtype=np.float32)
        out = transform_dirs(jnp.asarray(dirs), jnp.asarray(tf))
        np.testing.assert_allclose(out, dirs, atol=1e-6)

    def test_invert_pose(self):
        rng = np.random.default_rng(5)
        R = random_rotation(rng, 4).astype(np.float32)
        t = rng.standard_normal((4, 3)).astype(np.float32)
        tf = make_pose(jnp.asarray(R), jnp.asarray(t))
        prod = np.asarray(tf @ invert_pose(tf))
        np.testing.assert_allclose(prod, np.tile(np.eye(4), (4, 1, 1)), atol=1e-5)

    def test_egocentric_delta_roundtrip(self):
        rng = np.random.default_rng(6)
        A = make_pose(
            jnp.asarray(random_rotation(rng, 3), jnp.float32),
            jnp.asarray(rng.standard_normal((3, 3)), jnp.float32),
        )
        B = make_pose(
            jnp.asarray(random_rotation(rng, 3), jnp.float32),
            jnp.asarray(rng.standard_normal((3, 3)), jnp.float32),
        )
        dt, dR = pose_to_egocentric_delta_pose(A, B)
        B2 = egocentric_delta_pose_to_pose(A, dt, dR)
        np.testing.assert_allclose(B2, B, atol=1e-5)

    def test_to_homo(self):
        pts = jnp.ones((2, 3))
        h = to_homo(pts)
        assert h.shape == (2, 4)
        np.testing.assert_allclose(h[:, 3], 1.0)


class TestProjection:
    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1.0]])

    def test_project_center_ray(self):
        pts = jnp.array([[0.0, 0.0, 1.0]])
        uv = project_points(pts, jnp.asarray(self.K, jnp.float32))
        np.testing.assert_allclose(uv[0], [320.0, 240.0], atol=1e-4)

    def test_project_known_point(self):
        pts = jnp.array([[0.1, -0.05, 2.0]])
        uv = np.asarray(project_points(pts, jnp.asarray(self.K, jnp.float32)))
        np.testing.assert_allclose(uv[0], [320 + 600 * 0.05, 240 - 600 * 0.025], atol=1e-3)

    def test_depth_xyz_roundtrip(self):
        rng = np.random.default_rng(7)
        depth = rng.uniform(0.5, 2.0, size=(48, 64)).astype(np.float32)
        xyz = np.asarray(depth_to_xyz_map(jnp.asarray(depth), jnp.asarray(self.K, jnp.float32)))
        # reproject each xyz and check it lands on its own pixel
        uv = np.asarray(
            project_points(jnp.asarray(xyz.reshape(-1, 3)), jnp.asarray(self.K, jnp.float32))
        ).reshape(48, 64, 2)
        uu, vv = np.meshgrid(np.arange(64), np.arange(48), indexing="xy")
        np.testing.assert_allclose(uv[..., 0], uu, atol=1e-2)
        np.testing.assert_allclose(uv[..., 1], vv, atol=1e-2)
        np.testing.assert_allclose(xyz[..., 2], depth, atol=1e-6)

    def test_depth_xyz_invalid_zeroed(self):
        depth = np.zeros((4, 4), dtype=np.float32)
        xyz = np.asarray(depth_to_xyz_map(jnp.asarray(depth), jnp.asarray(self.K, jnp.float32)))
        np.testing.assert_allclose(xyz, 0.0)

    def test_crop_window_centers_object(self):
        # Object at image center: crop tf should map the projected center
        # to the crop center.
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0, 0, 1.0]
        tf = np.asarray(
            compute_crop_window_tf(
                jnp.asarray(pose[None]), jnp.asarray(self.K, jnp.float32), 1.2, 160, 0.2
            )
        )[0]
        center = tf @ np.array([320.0, 240.0, 1.0])
        np.testing.assert_allclose(center[:2] / center[2], [80.0, 80.0], atol=1.5)

    def test_crop_window_radius(self):
        # Point at +radius in x must land near the right edge of the crop.
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0, 0, 1.0]
        diameter, ratio = 0.2, 1.2
        r = diameter * ratio / 2
        tf = np.asarray(
            compute_crop_window_tf(
                jnp.asarray(pose[None]), jnp.asarray(self.K, jnp.float32), ratio, 160, diameter
            )
        )[0]
        edge_pt = np.asarray(
            project_points(jnp.array([[r, 0.0, 1.0]]), jnp.asarray(self.K, jnp.float32))
        )[0]
        mapped = tf @ np.array([edge_pt[0], edge_pt[1], 1.0])
        assert abs(mapped[0] / mapped[2] - 160.0) < 2.0

    def test_invert_affine(self):
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0.05, -0.02, 0.8]
        tf = compute_crop_window_tf(
            jnp.asarray(pose[None]), jnp.asarray(self.K, jnp.float32), 1.2, 160, 0.15
        )
        prod = np.asarray(tf @ invert_affine2d(tf))[0]
        np.testing.assert_allclose(prod, np.eye(3), atol=1e-4)

    def test_guess_translation(self):
        depth = np.zeros((480, 640), dtype=np.float32)
        mask = np.zeros((480, 640), dtype=np.uint8)
        mask[200:280, 280:360] = 1
        depth[200:280, 280:360] = 1.5
        t = guess_translation(depth, mask, self.K)
        # bbox center (319.5, 239.5) at depth 1.5
        expected = np.linalg.inv(self.K) @ np.array([319.5, 239.5, 1.0]) * 1.5
        np.testing.assert_allclose(t, expected, atol=1e-6)

    def test_guess_translation_empty(self):
        t = guess_translation(
            np.zeros((10, 10), np.float32), np.zeros((10, 10), np.uint8), self.K
        )
        np.testing.assert_allclose(t, 0.0)


class TestIcosphere:
    def test_vertex_counts(self):
        views = sample_views_icosphere(n_views=40)
        assert len(views) == 42  # subdivision 1

    def test_views_look_at_origin(self):
        views = sample_views_icosphere(n_views=40)
        # z axis of cam frame points from cam position to origin
        z = views[:, :3, 2]
        pos = views[:, :3, 3]
        expected = -pos / np.linalg.norm(pos, axis=-1, keepdims=True)
        np.testing.assert_allclose(z, expected, atol=1e-6)

    def test_orthonormal_frames(self):
        views = sample_views_icosphere(n_views=40)
        R = views[:, :3, :3]
        RtR = np.einsum("nij,nik->njk", R, R)
        np.testing.assert_allclose(RtR, np.tile(np.eye(3), (len(R), 1, 1)), atol=1e-6)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-6)

    def test_unit_radius_positions(self):
        views = sample_views_icosphere(n_views=40)
        np.testing.assert_allclose(np.linalg.norm(views[:, :3, 3], axis=-1), 1.0, atol=1e-6)


class TestSymmetry:
    def test_no_symmetry(self):
        tfs = symmetry_tfs_from_info({})
        assert tfs.shape == (1, 4, 4)
        np.testing.assert_allclose(tfs[0], np.eye(4))

    def test_discrete(self):
        flip = np.eye(4)
        flip[0, 0] = flip[1, 1] = -1
        flip[:3, 3] = [1.0, 2.0, 3.0]  # mm
        tfs = symmetry_tfs_from_info({"symmetries_discrete": [flip.flatten().tolist()]})
        assert tfs.shape == (2, 4, 4)
        np.testing.assert_allclose(tfs[1][:3, 3], [0.001, 0.002, 0.003])

    def test_continuous_z(self):
        info = {"symmetries_continuous": [{"axis": [0, 0, 1], "offset": [0, 0, 0]}]}
        tfs = symmetry_tfs_from_info(info, rot_angle_discrete=90)
        assert tfs.shape == (5, 4, 4)  # identity + 4 rotations
        # the 90-degree member
        np.testing.assert_allclose(tfs[2][:3, :3] @ np.array([1, 0, 0]), [0, 1, 0], atol=1e-9)


class TestClustering:
    def _grid(self):
        rng = np.random.default_rng(8)
        R = random_rotation(rng, 30)
        poses = np.tile(np.eye(4)[None], (60, 1, 1))
        poses[:30, :3, :3] = R
        # second half: tiny perturbations of the first half -> duplicates
        w = rng.standard_normal((30, 3)) * 0.01
        Rp = np.asarray(so3_exp_map(jnp.asarray(w, jnp.float32)))
        poses[30:, :3, :3] = np.einsum("nij,njk->nik", Rp, R)
        return poses

    def test_dedups_near_duplicates(self):
        poses = self._grid()
        out = cluster_poses_numpy(30.0, 99999.0, poses, np.eye(4)[None])
        assert len(out) <= 30
        # the kept poses must include the first pose
        np.testing.assert_allclose(out[0], poses[0])

    def test_keeps_all_when_threshold_zero(self):
        poses = self._grid()
        out = cluster_poses_numpy(1e-4, 99999.0, poses, np.eye(4)[None])
        assert len(out) == 60

    def test_symmetry_collapses(self):
        # Two poses related by a z-flip symmetry collapse when the
        # symmetry is declared, survive otherwise.
        poses = np.tile(np.eye(4)[None], (2, 1, 1))
        flip = np.eye(4)
        flip[0, 0] = flip[1, 1] = -1  # 180 deg about z
        poses[1] = poses[1] @ flip
        out_nosym = cluster_poses_numpy(30.0, 99999.0, poses, np.eye(4)[None])
        assert len(out_nosym) == 2
        out_sym = cluster_poses_numpy(30.0, 99999.0, poses, np.stack([np.eye(4), flip]))
        assert len(out_sym) == 1

    def test_native_matches_numpy_if_built(self):
        import foundationpose_tpu.geometry.clustering as cl

        if cl._load_native() is None:
            pytest.skip("native lib not built")
        poses = self._grid()
        a = cluster_poses(30.0, 99999.0, poses, np.eye(4)[None])
        b = cluster_poses_numpy(30.0, 99999.0, poses, np.eye(4)[None])
        assert len(a) == len(b)
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_full_rotation_grid_size(self):
        # The reference pipeline: 42 icosphere views x 6 in-plane rotations,
        # clustered at 30 degrees -> 252 with identity symmetry
        # (estimater.py:106-124).
        views = sample_views_icosphere(n_views=40)
        rot_grid = []
        for i in range(len(views)):
            for inplane in np.deg2rad(np.arange(0, 360, 60)):
                cam_in_ob = views[i] @ np.asarray(euler_matrix(0, 0, inplane))
                rot_grid.append(np.linalg.inv(cam_in_ob))
        rot_grid = np.asarray(rot_grid)
        assert len(rot_grid) == 252
        out = cluster_poses_numpy(30.0, 99999.0, rot_grid, np.eye(4)[None])
        assert len(out) == 252  # 30-deg clustering keeps all at this density
