"""Preprocess raw two-person joint clips into the 263-d feature format.

TPU-native replacement for the reference's absent Preprocess3Dpose
submodule (reference preprocess/README.md:17-41): consumes a directory of
(2, T, 22, 3) world-frame joint npy files, emits (2, T, 263) feature clips
(init token as the trailing row) plus dataset-level Mean.npy/Std.npy.

The per-clip encode (IK → cont6d → rifke → velocities) is one jitted
vmappable function; clips are bucketed by padded length so a handful of
compilations cover the whole corpus, then processed in device batches.
"""

import argparse
import functools
import os
import time
from collections import defaultdict
from os.path import join as pjoin

import _common  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np

from hig_tpu.utils import motion_codec as codec


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--joints_dir", type=str, required=True,
                        help="directory of (2, T, 22, 3) npy files")
    parser.add_argument("--out_root", type=str, required=True)
    parser.add_argument("--feet_thre", type=float, default=0.002)
    parser.add_argument("--bucket", type=int, default=32,
                        help="pad clip lengths up to multiples of this")
    parser.add_argument("--batch", type=int, default=64)
    args = parser.parse_args()

    spec = codec.t2m_spec()
    out_dir = pjoin(args.out_root, "new_joint_vecs")
    os.makedirs(out_dir, exist_ok=True)

    @functools.partial(jax.jit, static_argnames=())
    def encode_batch(j1, j2):
        return jax.vmap(lambda a, b: codec.encode_pair(a, b, args.feet_thre, spec))(j1, j2)

    files = sorted(f for f in os.listdir(args.joints_dir) if f.endswith(".npy"))
    buckets: dict[int, list] = defaultdict(list)
    for fname in files:
        arr = np.load(pjoin(args.joints_dir, fname)).astype(np.float32)
        assert arr.ndim == 4 and arr.shape[0] == 2, f"{fname}: want (2, T, 22, 3)"
        T = arr.shape[1]
        padded = -(-T // args.bucket) * args.bucket
        buckets[padded].append((fname, arr, T))

    t0 = time.time()
    total = 0
    for padded, items in sorted(buckets.items()):
        for lo in range(0, len(items), args.batch):
            chunk = items[lo : lo + args.batch]
            j1 = np.stack([
                np.pad(a[0], ((0, padded - T), (0, 0), (0, 0)), mode="edge")
                for _, a, T in chunk
            ])
            j2 = np.stack([
                np.pad(a[1], ((0, padded - T), (0, 0), (0, 0)), mode="edge")
                for _, a, T in chunk
            ])
            feats = np.asarray(encode_batch(jnp.asarray(j1), jnp.asarray(j2)))
            for (fname, _, T), f in zip(chunk, feats):
                # rows: T-1 real features then padding then init; keep
                # real rows + init token.
                clip = np.concatenate([f[:, : T - 1], f[:, -1:]], axis=1)
                np.save(pjoin(out_dir, fname), clip)
            total += len(chunk)
    dt = time.time() - t0
    print(f"encoded {total} clips in {dt:.1f}s ({total / max(dt, 1e-9):.1f} clips/s)")

    from hig_tpu.data.dataset import compute_mean_std

    clips = [
        type("C", (), {"motion": np.load(pjoin(out_dir, f))})() for f in files
    ]
    mean, std = compute_mean_std(clips)
    np.save(pjoin(args.out_root, "Mean.npy"), mean)
    np.save(pjoin(args.out_root, "Std.npy"), std)
    print(f"wrote Mean/Std to {args.out_root}")


if __name__ == "__main__":
    main()
