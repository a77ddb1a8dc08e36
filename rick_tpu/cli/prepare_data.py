"""Dataset preparation CLI, flag-compatible with the reference
(`prepare_data.py:64-86`)."""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="prepare images into a record store")
    p.add_argument("--input_path", type=str, required=True)
    p.add_argument("--output_path", type=str, required=True)
    p.add_argument("--size", type=str, default="256")
    p.add_argument("--n_worker", type=int, default=8)
    p.add_argument("--resample", type=str, default="lanczos", choices=["lanczos", "bilinear"])
    args = p.parse_args(argv)

    from rick_tpu.data.prepare import prepare_dataset

    sizes = [int(s.strip()) for s in args.size.split(",")]
    # The reference's multi-size loop overwrites the same keys (last size wins,
    # `prepare_data.py:51-56`); we build one store per size instead.
    for size in sizes:
        out = args.output_path if len(sizes) == 1 else f"{args.output_path}_{size}"
        n = prepare_dataset(
            args.input_path, out, size=size, n_worker=args.n_worker, resample=args.resample
        )
        print(f"wrote {n} images at {size}px -> {out}")


if __name__ == "__main__":
    main()
