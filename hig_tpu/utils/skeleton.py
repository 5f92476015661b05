"""Skeleton forward / inverse kinematics as pure, vmappable JAX functions.

Functional re-design of the reference's stateful ``Skeleton`` class
(codes/utils/skeleton.py:4-194). The kinematic chains are static Python
structure, so the per-chain walk unrolls at trace time into a handful of
fused quaternion ops — no dynamic control flow reaches XLA.

All functions operate on a time/batch-leading layout ``(T, J, ...)`` and are
safe to ``jax.vmap`` over additional leading axes.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from hig_tpu.utils import quaternions as q
from hig_tpu.utils.kinematics import parents_from_chains


def offsets_from_joints(
    joints: jax.Array, raw_offsets: jax.Array, chains: Sequence[Sequence[int]]
) -> jax.Array:
    """Bone-length-scaled offsets from a single rest pose ``(J, 3)``.

    offsets[i] = |joints[i] - joints[parent(i)]| * raw_offsets[i]
    (ref: skeleton.py:43-51)
    """
    n = raw_offsets.shape[0]
    parents = parents_from_chains([list(c) for c in chains], n)
    parent_idx = jnp.asarray([max(p, 0) for p in parents])
    bone = jnp.linalg.norm(joints - joints[parent_idx], axis=-1, keepdims=True)
    offsets = bone * raw_offsets
    return offsets.at[0].set(raw_offsets[0])


def forward_direction(
    joints: jax.Array, face_joint_idx: Sequence[int], smooth: bool = False,
    smooth_sigma: float = 20.0,
) -> jax.Array:
    """Per-frame unit forward (facing) vector from hips+shoulders.

    ``joints`` is (T, J, 3). (ref: skeleton.py:57-70). NOTE: the reference
    unpacks the face-joint order here as (l_hip, r_hip, sdr_r, sdr_l) —
    opposite hip order from process_file's frame-0 canonicalization
    (motion_process.py:194) — and we reproduce that exactly, since the
    feature codec's r_rot sequence depends on it.
    """
    l_hip, r_hip, sdr_r, sdr_l = face_joint_idx
    across = (joints[:, r_hip] - joints[:, l_hip]) + (joints[:, sdr_r] - joints[:, sdr_l])
    across = across / jnp.linalg.norm(across, axis=-1, keepdims=True)
    up = jnp.asarray([0.0, 1.0, 0.0], dtype=joints.dtype)
    forward = jnp.cross(jnp.broadcast_to(up, across.shape), across)
    if smooth:
        forward = q.gaussian_filter1d_nearest(forward, smooth_sigma)
    return forward / jnp.linalg.norm(forward, axis=-1, keepdims=True)


def inverse_kinematics(
    joints: jax.Array,
    raw_offsets: jax.Array,
    chains: Sequence[Sequence[int]],
    face_joint_idx: Sequence[int],
    smooth_forward: bool = False,
) -> jax.Array:
    """Joint positions (T, J, 3) → local joint quaternions (T, J, 4).

    Root quaternion rotates the facing direction onto +Z; frame 0's root is
    forced to identity exactly as the reference does (ref: skeleton.py:55-101,
    including the ``root_quat[0] = identity`` quirk at :81).
    """
    T = joints.shape[0]
    forward = forward_direction(joints, face_joint_idx, smooth=smooth_forward)
    target = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], dtype=joints.dtype), forward.shape)
    root_quat = q.qbetween(forward, target)
    identity = jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype=joints.dtype)
    root_quat = root_quat.at[0].set(identity)

    quat_params = jnp.zeros(joints.shape[:-1] + (4,), dtype=joints.dtype)
    quat_params = quat_params.at[:, 0].set(root_quat)
    for chain in chains:
        R = root_quat
        for j in range(len(chain) - 1):
            u = jnp.broadcast_to(raw_offsets[chain[j + 1]].astype(joints.dtype), (T, 3))
            v = joints[:, chain[j + 1]] - joints[:, chain[j]]
            v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
            rot_u_v = q.qbetween(u, v)
            R_loc = q.qmul(q.qinv(R), rot_u_v)
            quat_params = quat_params.at[:, chain[j + 1]].set(R_loc)
            R = q.qmul(R, R_loc)
    return quat_params


def forward_kinematics(
    quat_params: jax.Array,
    root_pos: jax.Array,
    offsets: jax.Array,
    chains: Sequence[Sequence[int]],
    do_root_rotation: bool = True,
) -> jax.Array:
    """Local quaternions (T, J, 4) + root positions (T, 3) → joints (T, J, 3).

    (ref: skeleton.py:104-123)
    """
    T = quat_params.shape[0]
    joints = jnp.zeros(quat_params.shape[:-1] + (3,), dtype=root_pos.dtype)
    joints = joints.at[:, 0].set(root_pos)
    identity = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype=quat_params.dtype), (T, 4)
    )
    for chain in chains:
        R = quat_params[:, 0] if do_root_rotation else identity
        for i in range(1, len(chain)):
            R = q.qmul(R, quat_params[:, chain[i]])
            offset_vec = jnp.broadcast_to(offsets[chain[i]].astype(R.dtype), (T, 3))
            joints = joints.at[:, chain[i]].set(q.qrot(R, offset_vec) + joints[:, chain[i - 1]])
    return joints


def forward_kinematics_cont6d(
    cont6d_params: jax.Array,
    root_pos: jax.Array,
    offsets: jax.Array,
    chains: Sequence[Sequence[int]],
    do_root_rotation: bool = True,
) -> jax.Array:
    """Cont6d rotations (T, J, 6) + root positions (T, 3) → joints (T, J, 3).

    (ref: skeleton.py:149-171)
    """
    T = cont6d_params.shape[0]
    joints = jnp.zeros(cont6d_params.shape[:-1] + (3,), dtype=root_pos.dtype)
    joints = joints.at[:, 0].set(root_pos)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=cont6d_params.dtype), (T, 3, 3))
    for chain in chains:
        if do_root_rotation:
            matR = q.cont6d_to_matrix(cont6d_params[:, 0])
        else:
            matR = eye
        for i in range(1, len(chain)):
            matR = matR @ q.cont6d_to_matrix(cont6d_params[:, chain[i]])
            offset_vec = offsets[chain[i]].astype(matR.dtype)
            step = jnp.einsum("tij,j->ti", matR, offset_vec)
            joints = joints.at[:, chain[i]].set(step + joints[:, chain[i - 1]])
    return joints
