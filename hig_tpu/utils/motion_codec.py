"""The HumanML3D-style 263-d motion feature codec, TPU-native.

This is the compatibility bedrock of the framework (reference:
codes/utils/motion_process.py). A motion of ``T`` frames over ``J`` joints is
encoded as ``T-1`` feature rows:

    [ root(4) | ric (J-1)*3 | rot6d (J-1)*6 | local_vel J*3 | foot 4 ]  = 263 for J=22

where root(4) = (yaw angular velocity, xz linear velocity in the facing
frame, root height). The two-person extension adds a 4-channel *init token*
per actor — (x, z, quat_w, quat_y) of the rigid transform that places the
actor's canonical-frame motion into the shared world frame — stored as one
extra trailing row (reference: recover_from_ric2, motion_process.py:418-456,
and the absent Preprocess3Dpose submodule whose conventions these functions
reconstruct).

Everything is pure jax.numpy over a time-leading layout, vmappable across
clips for batched preprocessing on TPU, and the decoders broadcast over
arbitrary leading batch dims.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from hig_tpu.utils import quaternions as q
from hig_tpu.utils import skeleton as sk
from hig_tpu.utils.kinematics import (
    T2M_FACE_JOINT_INDICES,
    T2M_FID_L,
    T2M_FID_R,
    T2M_KINEMATIC_CHAIN,
    T2M_LOWER_LEG_INDICES,
    T2M_RAW_OFFSETS,
)


class CodecSpec(NamedTuple):
    """Static configuration for one skeleton family."""

    raw_offsets: jax.Array
    chains: tuple
    face_joint_idx: tuple
    fid_r: tuple
    fid_l: tuple
    lower_leg_idx: tuple
    joints_num: int

    @property
    def dim_pose(self) -> int:
        j = self.joints_num
        return 4 + (j - 1) * 3 + (j - 1) * 6 + j * 3 + 4


def t2m_spec() -> CodecSpec:
    return CodecSpec(
        raw_offsets=jnp.asarray(T2M_RAW_OFFSETS),
        chains=tuple(tuple(c) for c in T2M_KINEMATIC_CHAIN),
        face_joint_idx=tuple(T2M_FACE_JOINT_INDICES),
        fid_r=tuple(T2M_FID_R),
        fid_l=tuple(T2M_FID_L),
        lower_leg_idx=T2M_LOWER_LEG_INDICES,
        joints_num=22,
    )


def kit_spec() -> CodecSpec:
    """KIT-ML 21-joint skeleton (dim_pose 251; ref motion_process.py:507-533)."""
    from hig_tpu.utils.kinematics import (
        KIT_FACE_JOINT_INDICES, KIT_FID_L, KIT_FID_R, KIT_KINEMATIC_CHAIN,
        KIT_LOWER_LEG_INDICES, KIT_RAW_OFFSETS,
    )

    return CodecSpec(
        raw_offsets=jnp.asarray(KIT_RAW_OFFSETS),
        chains=tuple(tuple(c) for c in KIT_KINEMATIC_CHAIN),
        face_joint_idx=tuple(KIT_FACE_JOINT_INDICES),
        fid_r=tuple(KIT_FID_R),
        fid_l=tuple(KIT_FID_L),
        lower_leg_idx=KIT_LOWER_LEG_INDICES,
        joints_num=21,
    )


# ---------------------------------------------------------------------------
# Encoding (joints → features)
# ---------------------------------------------------------------------------


def uniform_skeleton(
    positions: jax.Array, target_offsets: jax.Array, spec: CodecSpec
) -> jax.Array:
    """Retarget (T, J, 3) onto the canonical bone lengths via IK→FK.

    Scale ratio from lower-leg lengths. (ref: motion_process.py:13-36)
    """
    l1, l2 = spec.lower_leg_idx
    src_offset = sk.offsets_from_joints(positions[0], spec.raw_offsets, spec.chains)
    src_leg_len = jnp.max(jnp.abs(src_offset[l1])) + jnp.max(jnp.abs(src_offset[l2]))
    tgt_leg_len = jnp.max(jnp.abs(target_offsets[l1])) + jnp.max(jnp.abs(target_offsets[l2]))
    scale = tgt_leg_len / src_leg_len
    tgt_root_pos = positions[:, 0] * scale
    quat_params = sk.inverse_kinematics(
        positions, spec.raw_offsets, spec.chains, spec.face_joint_idx
    )
    return sk.forward_kinematics(quat_params, tgt_root_pos, target_offsets, spec.chains)


def _foot_contacts(positions: jax.Array, thres: float, spec: CodecSpec) -> jax.Array:
    """(T-1, 4) binary foot-contact features. (ref: motion_process.py:229-245)"""
    def contact(fid):
        d = positions[1:, list(fid)] - positions[:-1, list(fid)]
        return (jnp.sum(d * d, axis=-1) < thres).astype(positions.dtype)

    return jnp.concatenate([contact(spec.fid_l), contact(spec.fid_r)], axis=-1)


def canonical_transform(positions: jax.Array, spec: CodecSpec):
    """Frame-0 canonicalization: root XZ → origin, initial facing → +Z.

    Returns (xz_offset (3,), rotation quaternion (4,)) such that
    ``local = qrot(rot, positions - xz_offset)``. (ref: motion_process.py:184-213)
    """
    root0 = positions[0, 0]
    xz = root0 * jnp.asarray([1.0, 0.0, 1.0], dtype=positions.dtype)
    r_hip, l_hip, sdr_r, sdr_l = spec.face_joint_idx
    across = (positions[0, r_hip] - positions[0, l_hip]) + (
        positions[0, sdr_r] - positions[0, sdr_l]
    )
    across = across / jnp.linalg.norm(across)
    up = jnp.asarray([0.0, 1.0, 0.0], dtype=positions.dtype)
    forward = jnp.cross(up, across)
    forward = forward / jnp.linalg.norm(forward)
    target = jnp.asarray([0.0, 0.0, 1.0], dtype=positions.dtype)
    rot = q.qbetween(forward, target)
    return xz, rot


def extract_features(
    positions: jax.Array, feet_thre: float, spec: CodecSpec
) -> jax.Array:
    """Canonicalized joints (T, J, 3) → features (T-1, dim_pose).

    Expects input already floored/centered/faced (the caller does the
    canonicalization — mirrors reference extract_features,
    motion_process.py:39-166).
    """
    global_positions = positions

    feet = _foot_contacts(positions, feet_thre, spec)

    # Smoothed-forward IK → cont6d params + root rotation sequence.
    quat_params = sk.inverse_kinematics(
        positions, spec.raw_offsets, spec.chains, spec.face_joint_idx, smooth_forward=True
    )
    cont6d_params = q.quaternion_to_cont6d(quat_params)
    r_rot = quat_params[:, 0]

    # Root linear velocity in the facing frame; root angular (yaw) velocity.
    velocity = q.qrot(r_rot[1:], positions[1:, 0] - positions[:-1, 0])
    r_velocity_quat = q.qmul(r_rot[1:], q.qinv(r_rot[:-1]))

    # Rotation-invariant local positions (per-frame root-centered, re-faced).
    local = positions - positions[:, 0:1] * jnp.asarray(
        [1.0, 0.0, 1.0], dtype=positions.dtype
    )
    local = q.qrot(jnp.repeat(r_rot[:, None], positions.shape[1], axis=1), local)

    root_y = local[:, 0, 1:2]
    r_velocity = jnp.arcsin(r_velocity_quat[:, 2:3])
    l_velocity = velocity[:, (0, 2)]
    root_data = jnp.concatenate([r_velocity, l_velocity, root_y[:-1]], axis=-1)

    T = positions.shape[0]
    ric_data = local[:, 1:].reshape(T, -1)
    rot_data = cont6d_params[:, 1:].reshape(T, -1)
    local_vel = q.qrot(
        jnp.repeat(r_rot[:-1, None], positions.shape[1], axis=1),
        global_positions[1:] - global_positions[:-1],
    ).reshape(T - 1, -1)

    return jnp.concatenate(
        [root_data, ric_data[:-1], rot_data[:-1], local_vel, feet], axis=-1
    )


def process_file(
    positions: jax.Array,
    feet_thre: float,
    target_offsets: jax.Array,
    spec: CodecSpec,
):
    """Raw joints (T, J, 3) → (features (T-1, D), canonical joints (T, J, 3)).

    Full single-person pipeline: retarget, floor, canonicalize, featurize.
    (ref: motion_process.py:169-351)
    """
    positions = uniform_skeleton(positions, target_offsets, spec)
    floor = jnp.min(positions[..., 1])
    positions = positions - floor * jnp.asarray([0.0, 1.0, 0.0], dtype=positions.dtype)
    xz, rot = canonical_transform(positions, spec)
    positions = q.qrot(
        jnp.broadcast_to(rot, positions.shape[:-1] + (4,)), positions - xz
    )
    features = extract_features(positions, feet_thre, spec)
    return features, positions


def encode_pair(
    joints1: jax.Array,
    joints2: jax.Array,
    feet_thre: float,
    spec: CodecSpec,
    target_offsets: jax.Array | None = None,
    retarget: bool = False,
) -> jax.Array:
    """Two actors' world-frame joints (T, J, 3) each → (2, T, dim_pose) clip.

    Reconstruction of the absent Preprocess3Dpose submodule's output format
    (see reference preprocess/README.md:17-41 and the dataset layout consumed
    at mul_dataset.py:75-79): rows 0..T-2 are per-actor features in each
    actor's own canonical frame, row T-1 is the init token whose first 4
    channels (x, z, quat_w, quat_y) place the actor back into the shared
    world frame, matching recover_from_ric2 (motion_process.py:418-456).
    """
    if retarget:
        assert target_offsets is not None
        joints1 = uniform_skeleton(joints1, target_offsets, spec)
        joints2 = uniform_skeleton(joints2, target_offsets, spec)
    # Shared floor so the actors keep their relative heights.
    floor = jnp.minimum(jnp.min(joints1[..., 1]), jnp.min(joints2[..., 1]))
    up = jnp.asarray([0.0, 1.0, 0.0], dtype=joints1.dtype)
    joints1 = joints1 - floor * up
    joints2 = joints2 - floor * up

    def encode_actor(joints):
        xz, rot = canonical_transform(joints, spec)
        local = q.qrot(jnp.broadcast_to(rot, joints.shape[:-1] + (4,)), joints - xz)
        feats = extract_features(local, feet_thre, spec)
        inv = q.qinv(rot)  # local → world rotation (pure yaw)
        init = jnp.zeros((1, feats.shape[-1]), dtype=feats.dtype)
        init = init.at[0, 0].set(xz[0])
        init = init.at[0, 1].set(xz[2])
        init = init.at[0, 2].set(inv[0])
        init = init.at[0, 3].set(inv[2])
        return jnp.concatenate([feats, init], axis=0)

    return jnp.stack([encode_actor(joints1), encode_actor(joints2)], axis=0)


# ---------------------------------------------------------------------------
# Decoding (features → joints)
# ---------------------------------------------------------------------------


def recover_root_rot_pos(data: jax.Array):
    """Integrate root yaw + xz velocity channels back to world root pose.

    ``data`` is (..., T, D); returns (r_rot_quat (..., T, 4), r_pos (..., T, 3)).
    (ref: motion_process.py:362-381)
    """
    rot_vel = data[..., 0]
    zero = jnp.zeros_like(rot_vel[..., :1])
    r_rot_ang = jnp.cumsum(jnp.concatenate([zero, rot_vel[..., :-1]], axis=-1), axis=-1)
    zeros = jnp.zeros_like(r_rot_ang)
    r_rot_quat = jnp.stack(
        [jnp.cos(r_rot_ang), zeros, jnp.sin(r_rot_ang), zeros], axis=-1
    )

    zero3 = jnp.zeros(data.shape[:-2] + (1, 3), dtype=data.dtype)
    xz_vel = data[..., :-1, 1:3]
    step = jnp.concatenate(
        [xz_vel[..., 0:1],
         jnp.zeros_like(xz_vel[..., 0:1]),
         xz_vel[..., 1:2]],
        axis=-1,
    )
    r_pos = jnp.concatenate([zero3, step], axis=-2)
    r_pos = q.qrot(q.qinv(r_rot_quat), r_pos)
    r_pos = jnp.cumsum(r_pos, axis=-2)
    r_pos = r_pos.at[..., 1].set(data[..., 3])
    return r_rot_quat, r_pos


def recover_from_ric(data: jax.Array, joints_num: int) -> jax.Array:
    """Features (..., T, D) → joints (..., T, J, 3) from the ric channels.

    (ref: motion_process.py:401-416)
    """
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    positions = data[..., 4 : (joints_num - 1) * 3 + 4]
    positions = positions.reshape(positions.shape[:-1] + (joints_num - 1, 3))
    rot = jnp.broadcast_to(
        q.qinv(r_rot_quat)[..., None, :], positions.shape[:-1] + (4,)
    )
    positions = q.qrot(rot, positions)
    positions = positions + r_pos[..., None, :] * jnp.asarray(
        [1.0, 0.0, 1.0], dtype=data.dtype
    )
    return jnp.concatenate([r_pos[..., None, :], positions], axis=-2)


def recover_from_rot(
    data: jax.Array, joints_num: int, offsets: jax.Array, chains
) -> jax.Array:
    """Features (T, D) → joints via FK on the rot6d channels.

    (ref: motion_process.py:384-398)
    """
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    r_rot_cont6d = q.quaternion_to_cont6d(r_rot_quat)
    start = 1 + 2 + 1 + (joints_num - 1) * 3
    end = start + (joints_num - 1) * 6
    cont6d = jnp.concatenate([r_rot_cont6d, data[..., start:end]], axis=-1)
    cont6d = cont6d.reshape(-1, joints_num, 6)
    return sk.forward_kinematics_cont6d(cont6d, r_pos.reshape(-1, 3), offsets, chains)


def apply_init_token(positions: jax.Array, init_state: jax.Array) -> jax.Array:
    """Place canonical-frame joints (..., T, J, 3) into the world frame.

    ``init_state`` is (..., 4) = (x, z, quat_w, quat_y).
    (ref: motion_process.py:448-454)
    """
    w = init_state[..., 2]
    y = init_state[..., 3]
    zeros = jnp.zeros_like(w)
    quat = jnp.stack([w, zeros, y, zeros], axis=-1)
    rot = jnp.broadcast_to(quat[..., None, None, :], positions.shape[:-1] + (4,))
    out = q.qrot(rot, positions)
    offset = jnp.stack(
        [init_state[..., 0], zeros, init_state[..., 1]], axis=-1
    )
    return out + offset[..., None, None, :]


def recover_from_ric2(
    data1: jax.Array, data2: jax.Array, joints_num: int, init_last: bool = True
):
    """Two-actor decode into a shared world frame.

    ``data1``/``data2`` are (..., T+1, D) including the init-token row (last
    row when ``init_last``, first row otherwise — the dataset rolls it to the
    front for the model). (ref: motion_process.py:418-456)
    """
    if init_last:
        feats1, init1 = data1[..., :-1, :], data1[..., -1, :4]
        feats2, init2 = data2[..., :-1, :], data2[..., -1, :4]
    else:
        feats1, init1 = data1[..., 1:, :], data1[..., 0, :4]
        feats2, init2 = data2[..., 1:, :], data2[..., 0, :4]
    pos1 = recover_from_ric(feats1, joints_num)
    pos2 = recover_from_ric(feats2, joints_num)
    return apply_init_token(pos1, init1), apply_init_token(pos2, init2)
