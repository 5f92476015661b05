"""Generate a synthetic NTU-format dataset (see hig_tpu/data/synthetic.py)."""

import argparse

import _common  # noqa: F401  (sys.path)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--root", type=str, default="./data/synthetic_mul")
    parser.add_argument("--clips_per_class", type=int, default=8)
    parser.add_argument("--min_frames", type=int, default=30)
    parser.add_argument("--max_frames", type=int, default=120)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (codec encode compiles in "
                             "seconds on host vs minutes over the TPU tunnel)")
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from hig_tpu.data.synthetic import generate_dataset

    generate_dataset(
        args.root, args.clips_per_class, args.min_frames, args.max_frames, args.seed
    )
    print(f"wrote synthetic dataset to {args.root}")


if __name__ == "__main__":
    main()
