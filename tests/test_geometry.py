"""Tests for the SE3/Sim3/camera/triangulation geometry core."""
import numpy as np
import pytest

from slam_tpu.geometry import se3, triangulation
from slam_tpu.geometry.camera import (Camera, KannalaBrandtCamera,
                                      PinholeCamera, default_camera,
                                      reproject_to_image)

rng = np.random.default_rng(42)


def random_rotation(r=rng):
    q = r.normal(size=4)
    return se3.quat_to_rmat(q / np.linalg.norm(q))


class TestSE3:
    def test_exp_log_roundtrip(self):
        for _ in range(50):
            xi = rng.normal(size=6)
            # keep the rotation angle within (-pi, pi) where log is unique
            if np.linalg.norm(xi[:3]) >= np.pi:
                xi[:3] *= 0.9 * np.pi / np.linalg.norm(xi[:3])
            T = se3.se3_exp(xi)
            assert np.allclose(se3.se3_log(T), xi, atol=1e-9)

    def test_exp_log_small_angle(self):
        xi = np.array([1e-14, 0, 0, 1.0, 2.0, 3.0])
        T = se3.se3_exp(xi)
        assert np.allclose(T[:3, 3], xi[3:], atol=1e-9)
        assert np.allclose(se3.se3_log(T), xi, atol=1e-9)

    def test_so3_log_near_pi(self):
        R = se3.so3_exp(np.array([np.pi - 1e-8, 0, 0]))
        w = se3.so3_log(R)
        assert np.allclose(np.abs(w), [np.pi - 1e-8, 0, 0], atol=1e-5)

    def test_quat_roundtrip(self):
        for _ in range(20):
            R = random_rotation()
            assert np.allclose(se3.quat_to_rmat(se3.rmat_to_quat(R)), R, atol=1e-10)

    def test_camera_center(self):
        R = random_rotation()
        c = rng.normal(size=3)
        pose = np.eye(4)
        pose[:3, :3] = R
        pose[:3, 3] = -R @ c
        assert np.allclose(se3.camera_center(pose), c)
        assert np.allclose(se3.inverse_pose(pose) @ pose, np.eye(4), atol=1e-12)

    def test_sim3_compose_inverse(self):
        a = se3.Sim3(random_rotation(), rng.normal(size=3), 1.7)
        b = se3.Sim3(random_rotation(), rng.normal(size=3), 0.6)
        p = rng.normal(size=3)
        assert np.allclose((a * b).map(p), a.map(b.map(p)))
        ident = a * a.inverse()
        assert np.allclose(ident.R, np.eye(3), atol=1e-12)
        assert np.allclose(ident.t, 0, atol=1e-12)
        assert np.isclose(ident.s, 1.0)

    def test_interpolate_sim3_endpoints(self):
        T0 = se3.Sim3.identity()
        T1 = se3.Sim3(random_rotation(), rng.normal(size=3), 1.5)
        for lam, ref in [(0.0, T0), (1.0, T1)]:
            Ti = se3.interpolate_sim3(T0, T1, lam)
            assert np.allclose(Ti.R, ref.R, atol=1e-9)
            assert np.allclose(Ti.t, ref.t, atol=1e-9)
            assert np.isclose(Ti.s, ref.s)

    def test_remove_z_tilt(self):
        Rz = se3.so3_exp(np.array([0, 0, 0.7]))
        # pure yaw is unchanged
        assert np.allclose(se3.remove_rotation_z_tilt(Rz), Rz, atol=1e-12)
        # yaw+tilt projects back to the yaw
        tilted = se3.so3_exp(np.array([0.05, -0.03, 0.0])) @ Rz
        out = se3.remove_rotation_z_tilt(tilted)
        assert np.allclose(out[2], [0, 0, 1], atol=1e-12)
        assert np.allclose(out, Rz, atol=0.1)


class TestCamera:
    @pytest.mark.parametrize("cam", [
        default_camera(),
        PinholeCamera(fx=458.654, fy=457.296, cx=367.215, cy=248.375,
                      width=752, height=480,
                      k1=-0.28340811, k2=0.07395907, p1=0.00019359, p2=1.76187114e-05),
        KannalaBrandtCamera(fx=190.978, fy=190.973, cx=254.931, cy=256.897,
                            width=512, height=512,
                            k1=0.00348, k2=0.000715, k3=-0.00205, k4=0.000202),
    ])
    def test_project_unproject_roundtrip(self, cam):
        pix = np.stack(np.meshgrid(
            np.linspace(30, cam.width - 30, 7),
            np.linspace(30, cam.height - 30, 7)), axis=-1).reshape(-1, 2)
        ray, ok = cam.pixel_to_ray(pix)
        assert ok.all()
        assert np.allclose(np.linalg.norm(ray, axis=-1), 1.0)
        pix2, ok2 = cam.ray_to_pixel(ray)
        assert ok2.all()
        assert np.allclose(pix2, pix, atol=1e-4)

    def test_behind_camera_invalid(self):
        cam = default_camera()
        _, ok = cam.ray_to_pixel(np.array([0.0, 0.0, -1.0]))
        assert not ok

    def test_serialize_roundtrip(self):
        cam = default_camera()
        cam2 = Camera.deserialize(cam.serialize())
        assert isinstance(cam2, PinholeCamera)
        assert cam2.fx == cam.fx and cam2.width == cam.width

    def test_reproject_to_image(self):
        cam = default_camera()
        R = np.eye(3)
        t = np.zeros(3)
        pts = np.array([[0.0, 0.0, 2.0], [0.1, -0.1, 3.0], [0.0, 0.0, -1.0]])
        pix, valid = reproject_to_image(cam, R, t, pts)
        assert valid.tolist() == [True, True, False]
        assert np.allclose(pix[0], [cam.cx, cam.cy])


class TestTriangulation:
    def _scene(self, n_views=4):
        point = np.array([0.3, -0.2, 4.0])
        poses, obs, origins, rays = [], [], [], []
        for i in range(n_views):
            R = se3.so3_exp(np.array([0.01 * i, 0.02 * i, 0.0]))
            c = np.array([0.5 * i, 0.0, 0.0])
            pose = np.eye(4)
            pose[:3, :3] = R
            pose[:3, 3] = -R @ c
            pc = (pose[:3, :3] @ point) + pose[:3, 3]
            poses.append(pose[:3])
            obs.append(pc[:2] / pc[2])
            origins.append(c)
            d = point - c
            rays.append(d / np.linalg.norm(d))
        return point, np.array(poses), np.array(obs), np.array(origins), np.array(rays)

    def test_two_view(self):
        p, poses, obs, _, _ = self._scene(2)
        X, ok = triangulation.triangulate_two_view(poses[0], poses[1], obs[0], obs[1])
        assert ok
        assert np.allclose(X[:3] / X[3], p, atol=1e-9)

    def test_n_view(self):
        p, poses, obs, _, _ = self._scene(5)
        X, ok = triangulation.triangulate_n_view(poses, obs)
        assert ok
        assert np.allclose(X[:3] / X[3], p, atol=1e-8)

    def test_n_view_masked(self):
        p, poses, obs, _, _ = self._scene(5)
        obs_corrupt = obs.copy()
        obs_corrupt[2] += 10.0  # masked-out observation must not matter
        mask = np.array([True, True, False, True, True])
        X, ok = triangulation.triangulate_n_view(poses, obs_corrupt, mask)
        assert ok
        assert np.allclose(X[:3] / X[3], p, atol=1e-8)

    def test_midpoint(self):
        p, _, _, origins, rays = self._scene(3)
        X, ok = triangulation.triangulate_midpoint(origins, rays)
        assert ok
        assert np.allclose(X[:3] / X[3], p, atol=1e-9)

    def test_midpoint_degenerate_parallel(self):
        origins = np.array([[0.0, 0, 0], [0.0, 0, 0]])
        rays = np.array([[0.0, 0, 1], [0.0, 0, 1]])
        _, ok = triangulation.triangulate_midpoint(origins, rays)
        assert not ok

    def test_angle_check(self):
        # mirrors reference semantics: true iff some pair exceeds min angle
        rays = np.array([[0, 0, 1.0], [np.sin(np.radians(3)), 0, np.cos(np.radians(3))]])
        assert triangulation.check_triangulation_angle(rays, 2.0)
        assert not triangulation.check_triangulation_angle(rays, 4.0)
        assert not triangulation.check_triangulation_angle(rays[:1], 1.0)
