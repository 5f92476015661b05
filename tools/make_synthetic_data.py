"""Generate a synthetic NTU-format dataset (see hig_tpu/data/synthetic.py)."""

import argparse

import _common  # noqa: F401  (sys.path)

from hig_tpu.data.synthetic import generate_dataset


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--root", type=str, default="./data/synthetic_mul")
    parser.add_argument("--clips_per_class", type=int, default=8)
    parser.add_argument("--min_frames", type=int, default=30)
    parser.add_argument("--max_frames", type=int, default=120)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    generate_dataset(
        args.root, args.clips_per_class, args.min_frames, args.max_frames, args.seed
    )
    print(f"wrote synthetic dataset to {args.root}")


if __name__ == "__main__":
    main()
