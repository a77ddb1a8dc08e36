"""Standalone improved precision & recall CLI, mirror of
`gan_metrics/precision_recall.py` __main__ (VGG16-fc2 manifolds, k=3)."""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("path_real", type=str)
    p.add_argument("path_fake", type=str)
    p.add_argument("--batch_size", type=int, default=50)
    p.add_argument("--k", type=int, default=3)
    p.add_argument("--num_samples", type=int, default=5000)
    p.add_argument("--size", type=int, default=256)
    args = p.parse_args(argv)

    from rick_tpu.cli.fid import _load_images
    from rick_tpu.metrics import IPR

    real = _load_images(args.path_real, args.size)[: args.num_samples]
    fake = _load_images(args.path_fake, args.size)[: args.num_samples]
    ipr = IPR(args.batch_size, k=args.k, num_samples=args.num_samples)
    ipr.compute_manifold_ref(real)
    precision, recall = ipr.precision_and_recall(fake)
    print(f"precision: {precision:.4f} recall: {recall:.4f}")


if __name__ == "__main__":
    main()
