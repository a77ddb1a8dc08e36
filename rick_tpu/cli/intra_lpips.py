"""Standalone intra-cluster LPIPS CLI, protocol mirror of
`gan_training/eval.py:83-220`.

Two modes:
  * prepare: write the reference's cluster-center layout
    (`{out}/c{k}/center.png`) from the K few-shot target images -- the
    centers ARE the target training images in this adaptation protocol.
  * compute: intra-LPIPS of generated samples (from a checkpoint) or of an
    image directory / .npy, against a prepared cluster-center dir.
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="intra-cluster LPIPS diversity")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("prepare", help="write c{k}/center.png layout")
    pp.add_argument("images", type=str, help="few-shot image dir / .npy / record store")
    pp.add_argument("out_dir", type=str, help="cluster-center dir to create")
    pp.add_argument("--size", type=int, default=256)

    pc = sub.add_parser("compute", help="intra-LPIPS of samples vs centers")
    pc.add_argument("samples", type=str,
                    help="generated-sample dir / .npy, OR a .pt checkpoint "
                         "(g_ema key) to sample from")
    pc.add_argument("centers", type=str, help="cluster-center dir (c{k}/center.png)")
    pc.add_argument("--size", type=int, default=256)
    pc.add_argument("--k", type=int, default=10)
    pc.add_argument("--n_samples", type=int, default=1000)
    pc.add_argument("--cluster_size", type=int, default=50)
    pc.add_argument("--batch", type=int, default=8)
    pc.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from rick_tpu.cli.fid import _load_images

    if args.cmd == "prepare":
        from rick_tpu.metrics.intra_lpips import prepare_cluster_centers

        imgs = _load_images(args.images, args.size)
        prepare_cluster_centers(imgs, args.out_dir)
        print(f"wrote {imgs.shape[0]} centers under {args.out_dir}/c*/center.png")
        return

    from rick_tpu.metrics.intra_lpips import IntraLPIPS, load_cluster_centers

    if args.samples.endswith(".pt"):
        import jax

        from rick_tpu.ckpt import generator_params_from_state_dict, load_torch_file
        from rick_tpu.nn import GeneratorConfig, generator_apply

        ckpt = load_torch_file(args.samples)
        gcfg = GeneratorConfig(size=args.size)
        g_ema = generator_params_from_state_dict(gcfg, dict(ckpt["g_ema"]))
        key = jax.random.key(args.seed)
        outs = []
        got = 0
        while got < args.n_samples:
            key, kz, kn = jax.random.split(key, 3)
            z = jax.random.normal(kz, (25, 512))
            imgs, _ = generator_apply(gcfg, g_ema, [z], rng=kn)
            outs.append(np.asarray(imgs, np.float32))
            got += imgs.shape[0]
        samples = np.concatenate(outs)[: args.n_samples]
    else:
        samples = _load_images(args.samples, args.size)[: args.n_samples]

    centers = load_cluster_centers(args.centers, k=args.k, size=args.size)
    il = IntraLPIPS(centers, cluster_size=args.cluster_size, batch=args.batch)
    val = il.compute(samples, rng=np.random.default_rng(args.seed))
    print(f"intra-LPIPS: {val:.6f}")


if __name__ == "__main__":
    main()
