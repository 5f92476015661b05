"""Fit SMPL bodies to a generated (2, T, 22, 3) joints npy and render.

Equivalent of codes/joints2smpl/render_smpl.py: initializes per-frame SMPL
params from the mean-params h5, runs the two-stage SMPLify3D fitting over
all 2·T frames in one device batch, caches the fitted meshes, and renders.
pyrender/OSMesa are optional; without them a matplotlib point-cloud gif is
written instead.

Assets (not vendored — licensed):
  --smpl_model  SMPL_NEUTRAL.pkl (or .npz export)
  --gmm         gmm_08.pkl   (defaults to the reference checkout's copy)
  --mean_params neutral_smpl_mean_params.h5 (ditto)
"""

import argparse
import os
import pickle
import time
from os.path import join as pjoin

import _common  # noqa: F401

import jax.numpy as jnp
import numpy as np

REF_ASSETS = "/root/reference/codes/joints2smpl/smpl_models"


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--file_name", type=str, required=True,
                        help="(2, T, 22, 3) joints npy from visualization.py")
    parser.add_argument("--save_dir", type=str, default="./result/smpl")
    parser.add_argument("--smpl_model", type=str, default=None,
                        help="SMPL_NEUTRAL.pkl/.npz; synthetic test model if absent")
    parser.add_argument("--gmm", type=str, default=pjoin(REF_ASSETS, "gmm_08.pkl"))
    parser.add_argument("--mean_params", type=str,
                        default=pjoin(REF_ASSETS, "neutral_smpl_mean_params.h5"))
    parser.add_argument("--num_smplify_iters", type=int, default=50)
    args = parser.parse_args()

    from hig_tpu.smpl.lbs import load_smpl_model, synthetic_smpl_model
    from hig_tpu.smpl.prior import load_gmm_prior, synthetic_gmm_prior
    from hig_tpu.smpl.smplify import SMPLify3D

    if args.smpl_model and os.path.exists(args.smpl_model):
        model = load_smpl_model(args.smpl_model)
    else:
        print("WARNING: no SMPL model asset — using a synthetic test model")
        model = synthetic_smpl_model()
    prior = load_gmm_prior(args.gmm) if os.path.exists(args.gmm) else synthetic_gmm_prior()

    if os.path.exists(args.mean_params):
        import h5py

        with h5py.File(args.mean_params, "r") as f:
            init_mean_pose = np.asarray(f["pose"][:], np.float32)
            init_mean_shape = np.asarray(f["shape"][:], np.float32)
    else:
        init_mean_pose = np.zeros(72, np.float32)
        init_mean_shape = np.zeros(10, np.float32)

    data = np.load(args.file_name)  # (2, T, 22, 3)
    num_pers, seq_len = data.shape[:2]
    N = num_pers * seq_len
    j3d = jnp.asarray(data.reshape(N, 22, 3), jnp.float32)
    conf = np.ones(22, np.float32)
    conf[[7, 8, 10, 11]] = 1.5  # feet/ankles (ref render_smpl.py:232-237)

    fitter = SMPLify3D(model=model, prior=prior, num_iters=args.num_smplify_iters)
    t0 = time.time()
    result = fitter(
        jnp.asarray(np.tile(init_mean_pose, (N, 1))),
        jnp.asarray(np.tile(init_mean_shape, (N, 1))),
        j3d,
        jnp.asarray(conf),
    )
    print(f"fit {N} frames in {time.time() - t0:.2f}s, "
          f"final loss {float(result.final_loss):.1f}")

    os.makedirs(args.save_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(args.file_name))[0]
    verts = np.asarray(result.vertices)
    out_mesh_1, out_mesh_2 = verts[:seq_len], verts[seq_len:]
    with open(pjoin(args.save_dir, stem + ".pkl"), "wb") as f:
        pickle.dump([out_mesh_1, out_mesh_2], f)
    np.savez(
        pjoin(args.save_dir, stem + "_params.npz"),
        pose=np.asarray(result.pose),
        betas=np.asarray(result.betas),
        cam_t=np.asarray(result.camera_translation),
        joints=np.asarray(result.joints),
    )
    print(f"wrote {stem}.pkl / {stem}_params.npz to {args.save_dir}")

    try:
        import pyrender  # noqa: F401

        have_pyrender = True
    except ImportError:
        have_pyrender = False
    if not have_pyrender:
        _matplotlib_gif(out_mesh_1, out_mesh_2, pjoin(args.save_dir, stem + ".gif"))
        print("pyrender not available — wrote matplotlib point-cloud gif instead")


def _matplotlib_gif(mesh1, mesh2, path, fps=20, max_points=400):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation, PillowWriter

    stride = max(1, mesh1.shape[1] // max_points)
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    both = np.concatenate([mesh1, mesh2], axis=1)
    lo, hi = both.min(), both.max()

    def update(i):
        ax.clear()
        ax.set_xlim(lo, hi); ax.set_ylim(lo, hi); ax.set_zlim(lo, hi)
        ax.scatter(*mesh1[i, ::stride].T, s=1, c="red")
        ax.scatter(*mesh2[i, ::stride].T, s=1, c="blue")
        ax.view_init(elev=110, azim=-90)

    ani = FuncAnimation(fig, update, frames=mesh1.shape[0], interval=1000 / fps)
    ani.save(path, writer=PillowWriter(fps=fps))
    plt.close(fig)


if __name__ == "__main__":
    main()
