"""SMPL body model (linear blend skinning) in pure JAX.

TPU-native equivalent of the smplx SMPL layer the reference drives through
joints2smpl (codes/joints2smpl/render_smpl.py:240-246). Model data is loaded
from the standard SMPL_NEUTRAL.pkl (or an npz export); a synthetic model
generator is provided for tests since the licensed asset cannot ship.

lbs(): betas (10,) + pose (72,) axis-angle + translation → vertices (V, 3)
and joints (24, 3); fully differentiable and vmappable over frames.
"""

from __future__ import annotations

import dataclasses
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

NUM_JOINTS = 24
NUM_BETAS = 10

# Standard SMPL kinematic parents.
SMPL_PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21]
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SMPLModel:
    v_template: jax.Array  # (V, 3)
    shapedirs: jax.Array  # (V, 3, 10)
    posedirs: jax.Array  # (207, V*3)
    j_regressor: jax.Array  # (24, V)
    lbs_weights: jax.Array  # (V, 24)
    # kinematic parents: static (drives the unrolled FK), not a pytree leaf
    parents: tuple = dataclasses.field(
        default=tuple(SMPL_PARENTS.tolist()), metadata=dict(static=True)
    )
    faces: jax.Array | None = None


def _to_np(x):
    # chumpy arrays expose .r; plain arrays pass through
    return np.asarray(getattr(x, "r", x), dtype=np.float64)


def load_smpl_model(path: str) -> SMPLModel:
    """Load SMPL_NEUTRAL.pkl (or an .npz with the same field names)."""
    if path.endswith(".npz"):
        d = dict(np.load(path))
    else:
        class _ChumpyShim:
            """Unpickle chumpy arrays without chumpy installed."""

            def __setstate__(self, state):
                self.__dict__.update(state)

            @property
            def r(self):
                return np.asarray(self.__dict__.get("x"))

        import io

        class _Unpickler(pickle.Unpickler):
            def find_class(self, module, name):
                if module.startswith("chumpy"):
                    return _ChumpyShim
                if module == "scipy.sparse.csc" or module == "scipy.sparse._csc":
                    import scipy.sparse

                    return scipy.sparse.csc_matrix
                return super().find_class(module, name)

        with open(path, "rb") as f:
            d = _Unpickler(io.BytesIO(f.read())).load()

    j_reg = d["J_regressor"]
    if hasattr(j_reg, "toarray"):
        j_reg = j_reg.toarray()
    shapedirs = _to_np(d["shapedirs"])[..., :NUM_BETAS]
    posedirs = _to_np(d["posedirs"])
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T  # (207, V*3)
    return SMPLModel(
        v_template=jnp.asarray(_to_np(d["v_template"]), jnp.float32),
        shapedirs=jnp.asarray(shapedirs, jnp.float32),
        posedirs=jnp.asarray(posedirs, jnp.float32),
        j_regressor=jnp.asarray(_to_np(j_reg), jnp.float32),
        lbs_weights=jnp.asarray(_to_np(d["weights"]), jnp.float32),
        parents=tuple(
            [-1]
            + (
                _to_np(d["kintree_table"])[0].astype(np.int64)[1:].tolist()
                if "kintree_table" in d
                else SMPL_PARENTS[1:].tolist()
            )
        ),
        faces=jnp.asarray(np.asarray(d["f"], np.int32)) if "f" in d else None,
    )


def synthetic_smpl_model(n_vertices: int = 512, seed: int = 0) -> SMPLModel:
    """Random-but-plausible SMPL-like model for tests (no licensed asset)."""
    rng = np.random.RandomState(seed)
    # place template vertices around a articulated "body" made from the
    # canonical joint positions
    joints = np.zeros((NUM_JOINTS, 3), np.float32)
    offsets = rng.randn(NUM_JOINTS, 3).astype(np.float32) * 0.12
    for j in range(1, NUM_JOINTS):
        joints[j] = joints[SMPL_PARENTS[j]] + offsets[j]
    assign = rng.randint(0, NUM_JOINTS, n_vertices)
    v_template = joints[assign] + 0.05 * rng.randn(n_vertices, 3).astype(np.float32)
    # j_regressor: average of vertices assigned to each joint
    j_reg = np.zeros((NUM_JOINTS, n_vertices), np.float32)
    for j in range(NUM_JOINTS):
        idx = np.where(assign == j)[0]
        if len(idx) == 0:
            idx = np.array([j % n_vertices])
        j_reg[j, idx] = 1.0 / len(idx)
    # lbs weights: dominated by assigned joint
    w = np.full((n_vertices, NUM_JOINTS), 1e-3, np.float32)
    w[np.arange(n_vertices), assign] = 1.0
    w /= w.sum(-1, keepdims=True)
    return SMPLModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(0.01 * rng.randn(n_vertices, 3, NUM_BETAS), jnp.float32),
        posedirs=jnp.asarray(
            0.001 * rng.randn(207, n_vertices * 3), jnp.float32
        ),
        j_regressor=jnp.asarray(j_reg),
        lbs_weights=jnp.asarray(w),
    )


def rodrigues(rot_vecs: jax.Array) -> jax.Array:
    """Axis-angle (..., 3) → rotation matrices (..., 3, 3)."""
    angle = jnp.linalg.norm(rot_vecs + 1e-8, axis=-1, keepdims=True)
    axis = rot_vecs / angle
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]
    rx, ry, rz = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=-1
    ).reshape(rot_vecs.shape[:-1] + (3, 3))
    eye = jnp.eye(3, dtype=rot_vecs.dtype)
    return eye + sin * K + (1 - cos) * (K @ K)


def lbs(
    model: SMPLModel,
    betas: jax.Array,
    pose: jax.Array,
    transl: jax.Array | None = None,
):
    """Single-frame SMPL forward: returns (vertices (V,3), joints (24,3)).

    vmap over leading axes for batched / per-frame fitting.
    """
    v_shaped = model.v_template + jnp.einsum("vck,k->vc", model.shapedirs, betas)
    joints_rest = model.j_regressor @ v_shaped  # (24, 3)

    rot_mats = rodrigues(pose.reshape(NUM_JOINTS, 3))  # (24, 3, 3)
    # pose blendshapes from non-root joint rotations
    pose_feature = (rot_mats[1:] - jnp.eye(3, dtype=pose.dtype)).reshape(-1)  # (207,)
    v_posed = v_shaped + (pose_feature @ model.posedirs).reshape(v_shaped.shape)

    # forward kinematics over the model's parent chain (static unroll)
    parents = np.asarray(model.parents)
    transforms = [None] * NUM_JOINTS
    rel = joints_rest.at[1:].add(-joints_rest[np.asarray(parents[1:])])

    def make_tf(R, t):
        top = jnp.concatenate([R, t[:, None]], axis=1)
        return jnp.concatenate(
            [top, jnp.asarray([[0.0, 0.0, 0.0, 1.0]], dtype=R.dtype)], axis=0
        )

    transforms[0] = make_tf(rot_mats[0], rel[0])
    for j in range(1, NUM_JOINTS):
        transforms[j] = transforms[parents[j]] @ make_tf(rot_mats[j], rel[j])
    A = jnp.stack(transforms)  # (24, 4, 4)
    joints_posed = A[:, :3, 3]

    # remove rest-pose joint locations from the skinning transforms
    correction = jnp.einsum("jab,jb->ja", A[:, :3, :3], joints_rest)
    A_skin = A.at[:, :3, 3].add(-correction)

    T = jnp.einsum("vj,jab->vab", model.lbs_weights, A_skin)
    v_hom = jnp.concatenate([v_posed, jnp.ones_like(v_posed[:, :1])], axis=-1)
    vertices = jnp.einsum("vab,vb->va", T, v_hom)[:, :3]

    if transl is not None:
        vertices = vertices + transl
        joints_posed = joints_posed + transl
    return vertices, joints_posed
