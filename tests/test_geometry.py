"""Golden-value tests for the L0 geometry layer against the reference.

Vectors in tests/golden/geometry.npz were produced by the PyTorch reference
(see gen_geometry_goldens.py); these tests pin our jax.numpy implementations
to its numerics.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from hig_tpu.utils import motion_codec as codec
from hig_tpu.utils import quaternions as q
from hig_tpu.utils import skeleton as sk
from hig_tpu.utils.kinematics import T2M_KINEMATIC_CHAIN, T2M_RAW_OFFSETS

GOLD = np.load(os.path.join(os.path.dirname(__file__), "golden", "geometry.npz"))


def assert_close(ours, golden, atol=1e-4, rtol=1e-4, name=""):
    np.testing.assert_allclose(np.asarray(ours), golden, atol=atol, rtol=rtol, err_msg=name)


class TestQuaternions:
    def test_qmul(self):
        assert_close(q.qmul(GOLD["q_a"], GOLD["q_b"]), GOLD["qmul"])

    def test_qrot(self):
        assert_close(q.qrot(GOLD["q_a"], GOLD["v"]), GOLD["qrot"])

    def test_qinv(self):
        assert_close(q.qinv(GOLD["q_a"]), GOLD["qinv"])

    def test_qeuler(self):
        assert_close(q.qeuler(GOLD["q_a"], "xyz"), GOLD["qeuler_xyz"], atol=1e-3)

    def test_quaternion_to_matrix(self):
        assert_close(q.quaternion_to_matrix(GOLD["q_a"]), GOLD["quat_to_mat"])

    def test_quaternion_to_cont6d(self):
        assert_close(q.quaternion_to_cont6d(GOLD["q_a"]), GOLD["quat_to_cont6d"])

    def test_cont6d_to_matrix(self):
        assert_close(q.cont6d_to_matrix(GOLD["quat_to_cont6d"]), GOLD["cont6d_to_mat"])

    def test_qbetween(self):
        assert_close(q.qbetween(GOLD["v"], GOLD["qbetween_v1_in"]), GOLD["qbetween"], atol=1e-4)

    def test_qfix(self):
        assert_close(q.qfix(GOLD["qfix_in"]), GOLD["qfix"])

    def test_euler_to_quaternion(self):
        assert_close(q.euler_to_quaternion(GOLD["euler_in"], "xyz"), GOLD["euler_to_quat_xyz"])

    def test_expmap_to_quaternion(self):
        assert_close(q.expmap_to_quaternion(GOLD["expmap_in"]), GOLD["expmap_to_quat"])

    def test_qrot_inverse_roundtrip(self):
        rotated = q.qrot(GOLD["q_a"], GOLD["v"])
        back = q.qrot(q.qinv(GOLD["q_a"]), rotated)
        assert_close(back, GOLD["v"], atol=1e-5)


class TestSkeleton:
    def test_forward_kinematics(self):
        joints = sk.forward_kinematics(
            jnp.asarray(GOLD["fk_quat_in"]),
            jnp.asarray(GOLD["fk_root"]),
            jnp.asarray(GOLD["rest_offsets"]),
            T2M_KINEMATIC_CHAIN,
        )
        assert_close(joints, GOLD["fk_joints"], atol=2e-4)

    def test_inverse_kinematics(self):
        quat = sk.inverse_kinematics(
            jnp.asarray(GOLD["joints"]),
            jnp.asarray(T2M_RAW_OFFSETS),
            T2M_KINEMATIC_CHAIN,
            (2, 1, 17, 16),
        )
        assert_close(quat, GOLD["ik_quat"], atol=5e-4)

    def test_inverse_kinematics_smoothed(self):
        quat = sk.inverse_kinematics(
            jnp.asarray(GOLD["joints"]),
            jnp.asarray(T2M_RAW_OFFSETS),
            T2M_KINEMATIC_CHAIN,
            (2, 1, 17, 16),
            smooth_forward=True,
        )
        assert_close(quat, GOLD["ik_quat_smooth"], atol=5e-4)

    def test_fk_ik_roundtrip(self):
        """IK(FK(params)) reproduces joint positions after re-FK."""
        quat = sk.inverse_kinematics(
            jnp.asarray(GOLD["joints"]),
            jnp.asarray(T2M_RAW_OFFSETS),
            T2M_KINEMATIC_CHAIN,
            (2, 1, 17, 16),
        )
        rebuilt = sk.forward_kinematics(
            quat,
            jnp.asarray(GOLD["joints"][:, 0]),
            jnp.asarray(GOLD["rest_offsets"]),
            T2M_KINEMATIC_CHAIN,
        )
        assert_close(rebuilt, GOLD["joints"], atol=5e-3)


class TestCodec:
    def test_process_file_matches_reference(self):
        spec = codec.t2m_spec()
        feats, _ = codec.process_file(
            jnp.asarray(GOLD["joints"]), 0.002, jnp.asarray(GOLD["rest_offsets"]), spec
        )
        golden = GOLD["codec_features"]
        assert feats.shape == golden.shape
        np.testing.assert_allclose(np.asarray(feats), golden, atol=3e-3, rtol=1e-3)

    def test_recover_from_ric_matches_reference(self):
        rec = codec.recover_from_ric(jnp.asarray(GOLD["codec_features"]), 22)
        assert_close(rec, GOLD["codec_recovered"], atol=3e-4)

    def test_encode_decode_roundtrip_pair(self):
        """encode_pair → recover_from_ric2 reproduces world-frame joints."""
        spec = codec.t2m_spec()
        j1 = jnp.asarray(GOLD["joints"])
        # Second actor: same motion shifted and rotated in the world.
        yaw = jnp.asarray([np.cos(0.4), 0.0, np.sin(0.4), 0.0], dtype=jnp.float32)
        j2 = q.qrot(jnp.broadcast_to(yaw, j1.shape[:-1] + (4,)), j1)
        j2 = j2 + jnp.asarray([1.2, 0.0, 0.7], dtype=jnp.float32)

        clip = codec.encode_pair(j1, j2, 0.002, spec)
        assert clip.shape == (2, j1.shape[0], spec.dim_pose)

        rec1, rec2 = codec.recover_from_ric2(clip[0], clip[1], 22, init_last=True)
        # The ric decode drops the final input frame (features are T-1 rows).
        floor = min(float(j1[..., 1].min()), float(j2[..., 1].min()))
        up = jnp.asarray([0.0, 1.0, 0.0])
        np.testing.assert_allclose(
            np.asarray(rec1), np.asarray(j1[:-1] - floor * up), atol=2e-2
        )
        np.testing.assert_allclose(
            np.asarray(rec2), np.asarray(j2[:-1] - floor * up), atol=2e-2
        )

    def test_decoders_batch(self):
        feats = jnp.asarray(GOLD["codec_features"])[None].repeat(3, axis=0)
        rec = codec.recover_from_ric(feats, 22)
        assert rec.shape == (3, feats.shape[1], 22, 3)


class TestKitCodec:
    def test_kit_roundtrip(self):
        """KIT 21-joint skeleton: FK synthetic motion → encode → decode."""
        from hig_tpu.utils import quaternions as q
        from hig_tpu.utils import skeleton as sk
        from hig_tpu.utils.kinematics import KIT_KINEMATIC_CHAIN, KIT_RAW_OFFSETS
        from hig_tpu.utils.motion_codec import kit_spec, process_file, recover_from_ric

        spec = kit_spec()
        rng = np.random.RandomState(0)
        J, T = 21, 24
        bone = 0.2 + 0.1 * rng.rand(J)
        bone[0] = 0.0
        rest = KIT_RAW_OFFSETS * bone[:, None]
        t_axis = np.linspace(0, 2 * np.pi, T)
        angles = 0.2 * np.sin(t_axis[:, None, None] * rng.uniform(0.5, 1.5, (1, J, 3)))
        axis = rng.randn(J, 3)
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        quat = np.array(q.expmap_to_quaternion((angles * axis).reshape(-1, 3)))
        quat = quat.reshape(T, J, 4)
        quat = quat / np.linalg.norm(quat, axis=-1, keepdims=True)
        root = np.stack(
            [0.3 * np.sin(t_axis), np.full(T, 1.0), 0.5 * t_axis / np.pi], axis=-1
        ).astype(np.float32)
        joints = sk.forward_kinematics(
            jnp.asarray(quat, jnp.float32), jnp.asarray(root),
            jnp.asarray(rest, jnp.float32), KIT_KINEMATIC_CHAIN,
        )
        # yaw the whole motion off the -Z facing: qbetween (like the
        # reference's) is degenerate for exactly antiparallel vectors
        yaw = jnp.asarray([np.cos(1.2), 0.0, np.sin(1.2), 0.0], jnp.float32)
        joints = q.qrot(jnp.broadcast_to(yaw, joints.shape[:-1] + (4,)), joints)
        feats, canonical = process_file(
            joints, 0.05, jnp.asarray(rest, jnp.float32), spec
        )
        assert feats.shape == (T - 1, 251)
        rec = recover_from_ric(feats, 21)
        np.testing.assert_allclose(
            np.asarray(rec), np.asarray(canonical[:-1]), atol=2e-2
        )
