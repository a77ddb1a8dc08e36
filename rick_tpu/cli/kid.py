"""Standalone KID CLI, mirror of `gan_metrics/kid_score.py` __main__: KID
(polynomial MMD^2, 100 subsets) between two image sets."""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("path", type=str, nargs=2)
    p.add_argument("--batch-size", type=int, default=50)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--n_subsets", type=int, default=100)
    args = p.parse_args(argv)

    from rick_tpu.cli.fid import _load_images
    from rick_tpu.metrics import calculate_kid_given_images

    imgs0 = _load_images(args.path[0], args.size)
    imgs1 = _load_images(args.path[1], args.size)
    mean, std = calculate_kid_given_images(
        imgs0, imgs1, args.batch_size, n_subsets=args.n_subsets
    )
    print(f"KID mean std: {mean:.6f} {std:.6f}")


if __name__ == "__main__":
    main()
