"""camera_pose_on_robot composition (reference demo-main.cpp:228-243).

The reference composes each VO delta through the camera-on-robot extrinsic
(pose *= E * delta * inv(E)) so camera_pose.txt holds the ROBOT path.
Conjugation distributes over composition, so the demo applies E T inv(E)
to the composed trajectory — these tests pin both the CPose3D angle
convention and the end-to-end equality.
"""
import numpy as np

from rso.cli.demo import _cam_pose_from_args, _pose_on_robot, build_parser


class TestPoseOnRobot:
    def test_yaw_90_maps_x_to_y(self):
        E = _pose_on_robot([0, 0, 0, 90, 0, 0])
        np.testing.assert_allclose(E[:3, :3] @ [1, 0, 0], [0, 1, 0],
                                   atol=1e-12)

    def test_translation_and_ypr_order(self):
        # yaw then pitch then roll (CPose3D: Rz @ Ry @ Rx)
        E = _pose_on_robot([1, 2, 3, 90, 90, 0])
        np.testing.assert_allclose(E[:3, 3], [1, 2, 3])
        Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
        Ry = np.array([[0, 0, 1.0], [0, 1, 0], [-1, 0, 0]])
        np.testing.assert_allclose(E[:3, :3], Rz @ Ry, atol=1e-12)

    def test_flag_and_ini_key_agree(self, tmp_path):
        ini = tmp_path / "app.ini"
        ini.write_text("[GENERAL]\ncamera_pose_on_robot=[0.5 0 0 90 0 -10]\n")
        p = build_parser()
        a_flag = p.parse_args(["--synthetic",
                               "--cam-pose", "0.5 0 0 90 0 -10"])
        a_ini = p.parse_args(["--synthetic", "--config", str(ini)])
        np.testing.assert_allclose(_cam_pose_from_args(a_flag),
                                   _cam_pose_from_args(a_ini))

    def test_zero_or_absent_is_none(self):
        p = build_parser()
        assert _cam_pose_from_args(p.parse_args(["--synthetic"])) is None
        assert _cam_pose_from_args(
            p.parse_args(["--synthetic", "--cam-pose", "0 0 0 0 0 0"])) is None


class TestDemoCamPoseE2E:
    def test_robot_trajectory_is_conjugated_camera_trajectory(self, tmp_path):
        from rso.cli.demo import main
        from rso.io.trajectory import read_kitti

        cam_out = tmp_path / "cam.txt"
        rob_out = tmp_path / "robot.txt"
        assert main(["--synthetic", "--frames", "5",
                     "--out", str(cam_out)]) == 0
        assert main(["--synthetic", "--frames", "5",
                     "--cam-pose", "0.5 0 0 90 0 0",
                     "--out", str(rob_out)]) == 0
        cam = read_kitti(str(cam_out))
        rob = read_kitti(str(rob_out))
        E = _pose_on_robot([0.5, 0, 0, 90, 0, 0])
        expect = np.einsum("ij,njk,kl->nil", E, cam, np.linalg.inv(E))
        np.testing.assert_allclose(rob, expect, atol=1e-5)
        # the motion actually rotated: forward (+z in camera) stays +z under
        # yaw about z, so check the sideways camera drift axes moved instead
        assert not np.allclose(rob, cam, atol=1e-3)
