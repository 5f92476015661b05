"""Generate golden test vectors from the reference implementation.

Run once (requires /root/reference mounted) to produce ``geometry.npz``;
the committed npz is what the tests consume, so CI never needs the
reference checkout. Loads reference modules standalone (bypassing package
__init__ files that pull in unavailable deps like `clip`).
"""

import importlib.util
import sys
import types

import numpy as np

np.float = float  # the reference targets numpy<1.24
np.bool = bool

REF = "/root/reference/codes"


def load_module(name, path, package_shim=None):
    if package_shim:
        for shim_name, shim in package_shim.items():
            sys.modules.setdefault(shim_name, shim)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


# scipy.ndimage.filters was removed from modern scipy; alias it.
import scipy.ndimage

sys.modules.setdefault("scipy.ndimage.filters", scipy.ndimage)

utils_pkg = types.ModuleType("utils")
utils_pkg.__path__ = [REF + "/utils"]
sys.modules["utils"] = utils_pkg

rq = load_module("utils.quaternion", REF + "/utils/quaternion.py")
rsk = load_module("utils.skeleton", REF + "/utils/skeleton.py")
rpu = load_module("utils.paramUtil", REF + "/utils/paramUtil.py")
rmp = load_module("utils.motion_process", REF + "/utils/motion_process.py")

import torch

rng = np.random.RandomState(0)
out = {}

# ---- quaternion ops --------------------------------------------------------
qa = rng.randn(64, 4).astype(np.float32)
qa /= np.linalg.norm(qa, axis=-1, keepdims=True)
qb = rng.randn(64, 4).astype(np.float32)
qb /= np.linalg.norm(qb, axis=-1, keepdims=True)
v = rng.randn(64, 3).astype(np.float32)

out["q_a"], out["q_b"], out["v"] = qa, qb, v
out["qmul"] = rq.qmul_np(qa, qb)
out["qrot"] = rq.qrot_np(qa, v)
out["qinv"] = rq.qinv_np(qa)
out["qeuler_xyz"] = rq.qeuler_np(qa, "xyz")
out["quat_to_mat"] = rq.quaternion_to_matrix_np(qa)
out["quat_to_cont6d"] = rq.quaternion_to_cont6d_np(qa)
out["cont6d_to_mat"] = rq.cont6d_to_matrix_np(out["quat_to_cont6d"])
out["qbetween"] = rq.qbetween_np(v, rng.randn(64, 3).astype(np.float32))
out["qbetween_v1"] = np.ascontiguousarray(out["qbetween"])  # placeholder fixed below

v1 = rng.randn(64, 3).astype(np.float32)
out["qbetween_v1_in"] = v1
out["qbetween"] = rq.qbetween_np(v, v1)

seq = rng.randn(32, 5, 4).astype(np.float32)
seq /= np.linalg.norm(seq, axis=-1, keepdims=True)
out["qfix_in"] = seq
out["qfix"] = rq.qfix(seq)

e = rng.uniform(-np.pi, np.pi, size=(64, 3)).astype(np.float32)
out["euler_in"] = e
out["euler_to_quat_xyz"] = rq.euler_to_quaternion(e, "xyz")
em = rng.randn(64, 3).astype(np.float32) * 0.5
out["expmap_in"] = em
out["expmap_to_quat"] = rq.expmap_to_quaternion(em)

# ---- synthetic but plausible motion (FK from rest offsets) -----------------
J = 22
chains = rpu.t2m_kinematic_chain
raw_offsets = torch.from_numpy(rpu.t2m_raw_offsets)
bone_lengths = np.array(
    [0.0, 0.11, 0.11, 0.12, 0.38, 0.38, 0.14, 0.40, 0.40, 0.05, 0.13, 0.13,
     0.21, 0.15, 0.15, 0.09, 0.12, 0.12, 0.27, 0.27, 0.25, 0.25],
    dtype=np.float32,
)
rest_offsets = rpu.t2m_raw_offsets.astype(np.float32) * bone_lengths[:, None]

T = 48
t_axis = np.linspace(0, 2 * np.pi, T)
angles = 0.25 * np.sin(t_axis[:, None, None] * rng.uniform(0.5, 2.0, (1, J, 3)))
angles += 0.1 * rng.randn(1, J, 3)
axis = rng.randn(J, 3)
axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
quat_seq = rq.expmap_to_quaternion((angles * axis).reshape(T * J, 3)).reshape(T, J, 4)
quat_seq /= np.linalg.norm(quat_seq, axis=-1, keepdims=True)
root_traj = np.stack(
    [0.5 * np.sin(t_axis), 0.9 + 0.02 * np.sin(3 * t_axis), 0.8 * t_axis / (2 * np.pi)],
    axis=-1,
).astype(np.float32)

skel = rsk.Skeleton(raw_offsets, chains, "cpu")
skel.set_offset(torch.from_numpy(rest_offsets))
joints = skel.forward_kinematics_np(quat_seq.astype(np.float32), root_traj)
joints = joints.astype(np.float32)
out["joints"] = joints
out["rest_offsets"] = rest_offsets

# FK / IK goldens
out["fk_quat_in"] = quat_seq.astype(np.float32)
out["fk_root"] = root_traj
out["fk_joints"] = joints
face_joint_indx = [2, 1, 17, 16]
ik_quat = skel.inverse_kinematics_np(joints.astype(np.float64), face_joint_indx)
out["ik_quat"] = ik_quat.astype(np.float32)
ik_quat_smooth = skel.inverse_kinematics_np(
    joints.astype(np.float64), face_joint_indx, smooth_forward=True
)
out["ik_quat_smooth"] = ik_quat_smooth.astype(np.float32)

# ---- full codec golden: process_file + recover_from_ric --------------------
rmp.n_raw_offsets = raw_offsets
rmp.kinematic_chain = chains
rmp.face_joint_indx = face_joint_indx
rmp.fid_r, rmp.fid_l = [8, 11], [7, 10]
rmp.l_idx1, rmp.l_idx2 = 5, 8
rmp.tgt_offsets = torch.from_numpy(rest_offsets)

data, global_positions, positions, l_velocity = rmp.process_file(
    joints.astype(np.float64).copy(), 0.002
)
out["codec_features"] = data.astype(np.float32)
out["codec_global_positions"] = global_positions.astype(np.float32)

rec = rmp.recover_from_ric(torch.from_numpy(data[None]).float(), J)
out["codec_recovered"] = rec.squeeze(0).numpy().astype(np.float32)

np.savez_compressed("tests/golden/geometry.npz", **out)
print("wrote tests/golden/geometry.npz with", len(out), "arrays")
