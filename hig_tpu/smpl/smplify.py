"""SMPLify 3D: fit SMPL bodies to generated joints with L-BFGS, on device.

Re-design of the reference's torch SMPLify3D
(codes/joints2smpl/src/smplify.py:44-276 + customloss.py:128-213): the same
two-stage scheme — (1) camera translation + global orientation, (2) full
body pose + betas — against the same objective (Geman-McClure joint term,
GMM pose prior, knee/elbow angle prior, shape L2, pose-preserve term), but
as jit-compiled optax.lbfgs loops over ALL frames of both actors in one
batch (the reference also flattens all frames, render_smpl.py:226-265 —
here each L-BFGS iteration is a single fused device step).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from hig_tpu.smpl.lbs import SMPLModel, lbs
from hig_tpu.smpl.prior import GMMPrior

# SMPL joint indices of (RHip, LHip, RShoulder, LShoulder)
# (ref config.JOINT_MAP, joints2smpl/src/config.py)
TORSO_SMPL_IDX = (2, 1, 17, 16)


def gmof(x: jax.Array, sigma: float) -> jax.Array:
    """Geman-McClure robust error (ref: customloss.py:6-12)."""
    x2 = x**2
    s2 = sigma**2
    return (s2 * x2) / (s2 + x2)


def collision_loss(
    vertices: jax.Array,
    part_ids: jax.Array,
    margin: float = 0.02,
    weight: float = 1000.0,
) -> jax.Array:
    """Differentiable self-interpenetration penalty.

    TPU-native stand-in for the reference's default-off BVH collision term
    (customloss.py:161-174, which needs the CUDA ``mesh_intersection``
    package): instead of triangle-intersection search, penalize pairs of
    (downsampled) vertices belonging to *different body parts* that come
    closer than ``margin``:

        L = weight · Σ_{i<j, part_i≠part_j} relu(margin² − ‖v_i − v_j‖²)

    The pairwise-distance matrix is one batched matmul (MXU-friendly) and
    fully differentiable, so it works inside the jit'd L-BFGS loop — no
    no-grad search phase needed. ``part_ids`` come from the LBS skinning
    weights (dominant joint per vertex), replacing smplx_parts_segm.pkl.

    vertices: (..., K, 3); part_ids: (K,).
    """
    sq = jnp.sum(vertices**2, axis=-1)
    d2 = sq[..., :, None] + sq[..., None, :] - 2.0 * jnp.einsum(
        "...kc,...lc->...kl", vertices, vertices
    )
    cross_part = (part_ids[:, None] != part_ids[None, :]).astype(vertices.dtype)
    pen = jax.nn.relu(margin**2 - d2) * cross_part
    # i<j once (symmetric matrix counted twice → halve)
    return 0.5 * weight * jnp.sum(pen)


def vertex_parts(model: SMPLModel) -> jax.Array:
    """Per-vertex body-part id = dominant LBS skinning joint (asset-free
    replacement for the reference's smplx_parts_segm.pkl)."""
    return jnp.argmax(model.lbs_weights, axis=-1)


def angle_prior(body_pose: jax.Array) -> jax.Array:
    """Knee/elbow bending prior (ref: customloss.py:15-21).

    body_pose: (..., 69) axis-angle without global orientation.
    """
    idx = jnp.asarray([55 - 3, 58 - 3, 12 - 3, 15 - 3])
    signs = jnp.asarray([1.0, -1.0, -1.0, -1.0], body_pose.dtype)
    return jnp.exp(body_pose[..., idx] * signs) ** 2


def guess_init_3d(model_joints: jax.Array, j3d: jax.Array) -> jax.Array:
    """Initial camera translation from torso joints (ref: smplify.py:19-40).

    model_joints (..., 24, 3), j3d (..., 22, 3) in AMASS ordering (SMPL 0-21).
    """
    idx = jnp.asarray(TORSO_SMPL_IDX)
    return jnp.mean(j3d[..., idx, :] - model_joints[..., idx, :], axis=-2)


def camera_fitting_loss_3d(
    model_joints, camera_t, camera_t_est, j3d, depth_loss_weight=100.0
):
    """(ref: customloss.py:184-213, AMASS category)"""
    mj = model_joints + camera_t[..., None, :]
    idx = jnp.asarray(TORSO_SMPL_IDX)
    j3d_err = (j3d[..., idx, :] - mj[..., idx, :]) ** 2
    depth = (depth_loss_weight**2) * (camera_t - camera_t_est) ** 2
    # the reference broadcasts depth over the 4 torso joints before summing
    return jnp.sum(j3d_err + depth[..., None, :])


def body_fitting_loss_3d(
    body_pose,
    preserve_pose,
    betas,
    model_joints,
    camera_t,
    j3d,
    pose_prior: GMMPrior,
    joints3d_conf,
    sigma: float = 100.0,
    pose_prior_weight: float = 4.78 * 1.5,
    shape_prior_weight: float = 5.0,
    angle_prior_weight: float = 15.2,
    joint_loss_weight: float = 500.0,
    pose_preserve_weight: float = 0.0,
):
    """(ref: customloss.py:128-180). model_joints/j3d: (..., 22, 3)."""
    err = gmof(model_joints + camera_t[..., None, :] - j3d, sigma)
    joint_loss = (joint_loss_weight**2) * (joints3d_conf**2) * jnp.sum(err, axis=-1)
    prior_loss = (pose_prior_weight**2) * pose_prior(body_pose)
    ang_loss = (angle_prior_weight**2) * jnp.sum(angle_prior(body_pose), axis=-1)
    shape_loss = (shape_prior_weight**2) * jnp.sum(betas**2, axis=-1)
    preserve = (pose_preserve_weight**2) * jnp.sum(
        (body_pose - preserve_pose) ** 2, axis=-1
    )
    total = (
        jnp.sum(joint_loss, axis=-1) + prior_loss + ang_loss + shape_loss + preserve
    )
    return jnp.sum(total)


class SMPLifyResult(NamedTuple):
    vertices: jax.Array
    joints: jax.Array
    pose: jax.Array  # (N, 72)
    betas: jax.Array  # (N, 10)
    camera_translation: jax.Array  # (N, 3)
    final_loss: jax.Array


def _lbfgs_run(fun, params, num_iters: int):
    """num_iters L-BFGS steps with zoom line search (jit-friendly)."""
    opt = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(fun)

    def step(carry, _):
        p, state = carry
        value, grad = value_and_grad(p, state=state)
        updates, state = opt.update(
            grad, state, p, value=value, grad=grad, value_fn=fun
        )
        p = optax.apply_updates(p, updates)
        return (p, state), value

    (params, _), values = jax.lax.scan(
        step, (params, opt.init(params)), None, length=num_iters
    )
    return params, values


@dataclasses.dataclass
class SMPLify3D:
    """Two-stage SMPL fitting (ref: smplify.py:44-276)."""

    model: SMPLModel
    prior: GMMPrior
    num_iters: int = 100
    camera_outer: int = 10
    joint_loss_weight: float = 600.0  # (render path, smplify.py:227)
    pose_preserve_weight: float = 5.0
    # self-interpenetration penalty (ref --use_collision, default off there
    # too: render_smpl.py:30, customloss.py:161-174)
    use_collision: bool = False
    collision_weight: float = 1000.0
    collision_margin: float = 0.02
    collision_stride: int = 8  # vertex downsampling for the pairwise matrix

    def __call__(
        self,
        init_pose: jax.Array,  # (N, 72)
        init_betas: jax.Array,  # (N, 10)
        j3d: jax.Array,  # (N, 22, 3)
        conf_3d: jax.Array,  # (22,) or scalar
        optimize_betas: bool = True,
    ) -> SMPLifyResult:
        batched_lbs = jax.vmap(lambda b, p, t: lbs(self.model, b, p, t))

        body_pose = init_pose[:, 3:]
        global_orient = init_pose[:, :3]
        betas = init_betas
        preserve_pose = body_pose

        _, model_joints = batched_lbs(
            betas, jnp.concatenate([global_orient, body_pose], -1),
            jnp.zeros_like(global_orient),
        )
        init_cam_t = guess_init_3d(model_joints, j3d)

        # ---- stage 1: camera translation + global orientation -------------
        def cam_loss(p):
            pose = jnp.concatenate([p["global_orient"], body_pose], axis=-1)
            _, mj = batched_lbs(betas, pose, jnp.zeros_like(init_cam_t))
            return camera_fitting_loss_3d(mj[:, :22], p["cam_t"], init_cam_t, j3d)

        cam_params = {"global_orient": global_orient, "cam_t": init_cam_t}
        cam_params, _ = _lbfgs_run(
            cam_loss, cam_params, self.camera_outer * self.num_iters
        )
        global_orient = cam_params["global_orient"]
        cam_t = cam_params["cam_t"]

        # ---- stage 2: full body pose (+ betas) -----------------------------
        parts = (
            vertex_parts(self.model)[:: self.collision_stride]
            if self.use_collision else None
        )

        def body_loss(p):
            b = p["betas"] if optimize_betas else betas
            pose = jnp.concatenate([p["global_orient"], p["body_pose"]], axis=-1)
            mv, mj = batched_lbs(b, pose, jnp.zeros_like(cam_t))
            loss = body_fitting_loss_3d(
                p["body_pose"], preserve_pose, b, mj[:, :22], p["cam_t"], j3d,
                self.prior, conf_3d,
                joint_loss_weight=self.joint_loss_weight,
                pose_preserve_weight=self.pose_preserve_weight,
            )
            if self.use_collision:
                loss = loss + collision_loss(
                    mv[:, :: self.collision_stride], parts,
                    margin=self.collision_margin, weight=self.collision_weight,
                )
            return loss

        body_params = {
            "body_pose": body_pose,
            "global_orient": global_orient,
            "cam_t": cam_t,
        }
        if optimize_betas:
            body_params["betas"] = betas
        body_params, values = _lbfgs_run(body_loss, body_params, self.num_iters)

        body_pose = body_params["body_pose"]
        global_orient = body_params["global_orient"]
        cam_t = body_params["cam_t"]
        if optimize_betas:
            betas = body_params["betas"]

        pose = jnp.concatenate([global_orient, body_pose], axis=-1)
        vertices, joints = batched_lbs(betas, pose, cam_t)
        final_loss = body_loss(body_params)
        return SMPLifyResult(
            vertices=vertices,
            joints=joints,
            pose=pose,
            betas=betas,
            camera_translation=cam_t,
            final_loss=final_loss,
        )
