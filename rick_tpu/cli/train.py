"""Training CLI -- flag-compatible mirror of the reference entry point
(`train_dynamic_update_prune.py:702-964`).

Same flag names and defaults; the reference's hard-coded relative paths
(`../../_processed_train`, `../../_pretrained`, `../../_output_style_gan`)
are exposed as --data_root / --output_root with those defaults, so the README
commands run verbatim from the same directory layout.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import shutil
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="rick-tpu few-shot StyleGAN2 adaptation")
    # `train_dynamic_update_prune.py:703-758`
    p.add_argument("--exp", type=str, default="tmp")
    p.add_argument("--data_path", type=str, default="babies")
    p.add_argument("--iter", type=int, default=31)
    p.add_argument("--highp", type=int, default=1)
    p.add_argument("--subspace_freq", type=int, default=4)
    p.add_argument("--feat_ind", type=int, default=3)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--feat_const_batch", type=int, default=4)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--patch_size", type=int, default=4)
    p.add_argument("--feat_res", type=int, default=128)
    p.add_argument("--r1", type=float, default=10)
    p.add_argument("--path_regularize", type=float, default=2)
    p.add_argument("--path_batch_shrink", type=int, default=2)
    p.add_argument("--d_reg_every", type=int, default=16)
    p.add_argument("--g_reg_every", type=int, default=4)
    p.add_argument("--mixing", type=float, default=0.9)
    p.add_argument("--subspace_std", type=float, default=0.05)
    p.add_argument("--ckpt_source", type=str, default="style_gan_source_ffhq.pt")
    p.add_argument("--source_key", type=str, default="ffhq")
    p.add_argument("--lr", type=float, default=0.002)
    p.add_argument("--channel_multiplier", type=int, default=2)
    p.add_argument("--local_rank", type=int, default=0)
    p.add_argument("--augment", dest="augment", action="store_true")
    p.add_argument("--no-augment", dest="augment", action="store_false")
    p.set_defaults(augment=False)
    p.add_argument("--augment_p", type=float, default=0.0)
    p.add_argument("--ada_target", type=float, default=0.6)
    p.add_argument("--ada_length", type=int, default=500 * 1000)
    p.add_argument("--n_sample_train", type=int, default=10)
    p.add_argument("--n_sample_store", type=int, default=25)
    p.add_argument("--n_sample_test", type=int, default=25)
    p.add_argument("--store_checkpoints", action="store_true")
    p.add_argument("--store_samples", action="store_true")
    p.add_argument("--eval_in_training", action="store_true")
    p.add_argument("--num_fisher_img", type=int, default=5)
    p.add_argument("--fisher_freq", type=int, default=2)
    p.add_argument("--fisher_coef", type=float, default=1.0)
    p.add_argument("--fisher_quantile", type=float, default=75)
    p.add_argument("--prune_quantile", type=float, default=0.1)
    p.add_argument("--warmup_iter", type=int, default=10)
    p.add_argument("--checkpoints_freq", type=int, default=500)
    p.add_argument("--samples_freq", type=int, default=500)
    p.add_argument("--eval_in_training_freq", type=int, default=500)
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--wandb_project_name", type=str, default="debug")
    p.add_argument("--wandb_run_name", type=str, default="debug")
    p.add_argument("--method", type=str, default="dynamic_1")
    # rick-tpu additions (defaults keep the reference layout)
    p.add_argument("--data_root", type=str, default="../../")
    p.add_argument("--output_root", type=str, default="../../_output_style_gan")
    p.add_argument("--sample_noise", type=str, default="./noise.pt")
    p.add_argument("--fisher_noise_dir", type=str, default="./_noise")
    p.add_argument("--allow_random_fisher_noise", action="store_true",
                   help="substitute seeded random latents for missing "
                        "_noise/*.pt fixtures instead of failing (deviates "
                        "from the reference Fisher protocol)")
    p.add_argument(
        "--ada_margin", type=int, default=224,
        help="static reflect-pad margin for the ADA warp; rotated samples "
        "deviate at the borders unless this covers the rotation worst case "
        "(~0.87*size; see rick_tpu/augment/ada.py honesty note)",
    )
    p.add_argument("--eval_bf16", action="store_true",
                   help="bfloat16 InceptionV3 feature extraction during eval")
    p.add_argument("--eval_nhwc", action="store_true",
                   help="run the eval InceptionV3 trunk in NHWC (TPU conv layout)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute for the D/G adversarial phases "
                        "(params/optimizer/regularizers stay f32)")
    p.add_argument("--resume", type=str, default="")
    p.add_argument("--auto_resume", action="store_true",
                   help="resume from the latest .state.npz in the checkpoint dir")
    p.add_argument("--n_devices", type=int, default=0, help="0 = all local devices")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--profile_dir", type=str, default="", help="enable jax profiler traces")
    return p


def load_fisher_noises(noise_dir, num_fisher_img, latent, batch, *, allow_random=False):
    """Load the fixed `_noise/{j:04d}.pt` Fisher latents.

    The reference iterates EVERY row of each file
    (`train_dynamic_update_prune.py:227-236`: one FIM sample per row, paired
    index-for-index with one fetched real batch), so files stay 2-D.  Returns
    (noises, rows): noises is (sum(rows), latent) float32, rows the per-file
    row counts (used to slice the paired real batches).

    Missing files are a protocol deviation (the run's Fisher scores would no
    longer match the reference's determinism fixtures), so by default this
    RAISES; pass allow_random=True (CLI: --allow_random_fisher_noise) to
    substitute one fixed seeded row per missing file, with a loud warning.
    """
    import jax

    from rick_tpu.ckpt import load_torch_file

    noises, rows, missing = [], [], []
    for j in range(num_fisher_img):
        fpath = os.path.join(noise_dir, f"{j:04d}.pt")
        if os.path.exists(fpath):
            r = np.asarray(load_torch_file(fpath), np.float32).reshape(-1, latent)
            if r.shape[0] > batch:
                raise ValueError(
                    f"{fpath} has {r.shape[0]} rows > batch {batch}; the "
                    "reference pairs each row with a row of one real batch"
                )
        else:
            missing.append(fpath)
            r = np.asarray(
                jax.random.normal(jax.random.key(1000 + j), (1, latent)), np.float32
            )
        noises.append(r)
        rows.append(r.shape[0])
    if missing:
        if not allow_random:
            raise FileNotFoundError(
                f"Fisher noise fixtures missing: {missing[:3]}"
                f"{' ...' if len(missing) > 3 else ''} "
                f"({len(missing)}/{num_fisher_img} files under {noise_dir!r}). "
                "These fix the Fisher-information sampling protocol "
                "(reference train_dynamic_update_prune.py:227-236); running "
                "without them silently diverges from it. Provide the files or "
                "pass --allow_random_fisher_noise to substitute seeded random "
                "latents."
            )
        print(
            f"WARNING: {len(missing)}/{num_fisher_img} Fisher noise fixtures "
            f"missing under {noise_dir!r}; substituting seeded random latents "
            "(--allow_random_fisher_noise). Fisher scores will NOT match runs "
            "that use the reference fixtures.",
            flush=True,
        )
    return np.concatenate(noises, axis=0), rows


def _dataset_fingerprint(path: str) -> str:
    """Content fingerprint of a dataset directory, for real-set cache keys.

    Uses the backing store file's (size, mtime_ns) — `records.rdb` or lmdb
    `data.mdb` — so rebuilding the store at the same path changes the key.
    For a plain image directory, falls back to (entry count, newest mtime_ns).
    """
    for fname in ("records.rdb", "data.mdb"):
        f = os.path.join(path, fname)
        if os.path.exists(f):
            st = os.stat(f)
            return f"{st.st_size:x}.{st.st_mtime_ns:x}"
    try:
        n, newest = 0, 0
        with os.scandir(path) as it:
            for e in it:
                n += 1
                newest = max(newest, e.stat().st_mtime_ns)
        return f"d{n:x}.{newest:x}"
    except OSError:
        return "nofp"


def _real_cache_paths(args, test_path: str, cache_dir: str):
    """(real_imgs, real_acts) cache paths for this run's real-set key.

    Key ingredients (ADVICE r3): path separators are sanitized out of
    data_path (a nested 'ffhq/train' must not point the cache into a
    nonexistent subdirectory), and the dataset CONTENT is fingerprinted
    (store size+mtime) so a rebuilt/replaced store at the same path
    invalidates stale caches instead of silently reusing the old real set.
    """
    safe_data_path = args.data_path.replace(os.sep, "_").replace("/", "_")
    fp = _dataset_fingerprint(test_path)
    cache_key = f"{safe_data_path}_{args.size}px_{args.n_sample_test}_s{args.seed}_{fp}"
    real_imgs = os.path.join(cache_dir, f"real_imgs_{cache_key}.npy")
    real_acts = os.path.join(
        cache_dir,
        f"real_acts_{cache_key}"
        f"{'_bf16' if args.eval_bf16 else ''}{'_nhwc' if args.eval_nhwc else ''}.npy",
    )
    return real_imgs, real_acts


def _evict_stale_real_caches(cache_dir: str, keep_keys) -> None:
    """Delete real-set cache files whose key is not in `keep_keys`.

    These caches are ~1 GB at 256px/5k samples (~16 GB at 1024px) and now
    accumulate per {data_path, size, n_sample_test, seed, fingerprint} key
    (ADVICE r3); opt-in eviction via RICK_CLEAR_REAL_CACHE=1 keeps only the
    current run's keys.
    """
    import glob

    keep = {os.path.basename(k) for k in keep_keys}
    for f in glob.glob(os.path.join(cache_dir, "real_imgs_*.npy")) + glob.glob(
        os.path.join(cache_dir, "real_acts_*.npy")
    ):
        if os.path.basename(f) not in keep:
            try:
                os.remove(f)
                print(f"evicted stale real-set cache {f}")
            except OSError:
                pass


def main(argv=None):
    args = build_parser().parse_args(argv)

    random.seed(args.seed)
    np.random.seed(args.seed)

    import jax
    import jax.numpy as jnp

    # persistent compilation cache: repeated invocations (incl. --resume) skip
    # the multi-minute phase compiles.  Opt out with RICK_NO_XLA_CACHE=1.
    if not os.environ.get("RICK_NO_XLA_CACHE"):
        cache_dir = os.environ.get(
            "RICK_XLA_CACHE_DIR", os.path.expanduser("~/.cache/rick_tpu_xla")
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # ---- multi-host runtime: must run before any backend use.  No-op for
    # single-process launches; on a pod each process joins the coordination
    # service and the mesh below spans all hosts' devices
    # (SURVEY par. 2.3; reference's DataParallel wrap `:941-944`).
    from rick_tpu.dist import initialize_multihost, is_main_process

    proc_idx, proc_cnt = initialize_multihost()
    is_main = is_main_process()

    from rick_tpu.ckpt import (
        discriminator_params_from_state_dict,
        discriminator_state_dict_from_params,
        generator_params_from_state_dict,
        generator_state_dict_from_params,
        load_torch_file,
        save_torch_file,
    )
    from rick_tpu.ckpt.convert import merge_state_dict_lenient
    from rick_tpu.ckpt.native import load_state, save_state
    from rick_tpu.data import ImageDataset, data_stream, get_nsamples
    from rick_tpu.dist import make_mesh, replicate, shard_batch
    from rick_tpu.metrics import Evaluator
    from rick_tpu.nn import DiscriminatorConfig, GeneratorConfig, discriminator_init, generator_init
    from rick_tpu.train import (
        TrainConfig,
        fisher_round,
        init_train_state,
        make_train_step,
        run_iteration,
        sample_images,
    )
    from rick_tpu.train.masks import merge_prune
    from rick_tpu.utils import save_image_grid
    from rick_tpu.utils.logging import ProfilerHook, StatsLogger

    # ---- dirs (`:771-781`)
    args.output_path = os.path.join(args.output_root, args.exp)
    args.sample_dir = os.path.join(args.output_path, "samples")
    args.checkpoint_dir = os.path.join(args.output_path, "checkpoints")
    for d in (args.output_path, args.sample_dir, args.checkpoint_dir):
        os.makedirs(d, exist_ok=True)

    args.latent, args.n_mlp, args.start_iter = 512, 8, 0

    # ---- configs
    gcfg = GeneratorConfig(size=args.size, channel_multiplier=args.channel_multiplier)
    dcfg = DiscriminatorConfig(size=args.size, channel_multiplier=args.channel_multiplier)
    tcfg = TrainConfig(
        batch=args.batch,
        r1=args.r1,
        path_regularize=args.path_regularize,
        path_batch_shrink=args.path_batch_shrink,
        d_reg_every=args.d_reg_every,
        g_reg_every=args.g_reg_every,
        mixing=args.mixing,
        lr=args.lr,
        augment=args.augment,
        augment_p=args.augment_p,
        ada_target=args.ada_target,
        ada_length=args.ada_length,
        ada_margin=args.ada_margin,
        warmup_iter=args.warmup_iter,
        fisher_freq=args.fisher_freq,
        num_fisher_img=args.num_fisher_img,
        fisher_quantile=args.fisher_quantile,
        prune_quantile=args.prune_quantile,
        bf16=args.bf16,
    )

    # ---- data (`:789-843`)
    from rick_tpu.data.native import native_available, NativeImageDataset

    def open_dataset(path, **kw):
        if native_available():
            try:
                return NativeImageDataset(path, resolution=args.size, **kw)
            except Exception:
                pass
        return ImageDataset(path, resolution=args.size, **kw)

    train_path = os.path.join(args.data_root, "_processed_train", args.data_path)
    test_path = os.path.join(args.data_root, "_processed_test", args.data_path)
    if args.n_sample_train == 10:
        train_ds = open_dataset(train_path)
    else:
        base = ImageDataset(test_path, resolution=args.size)
        few_shot_idx = np.random.choice(len(base), size=args.n_sample_train, replace=False)
        if is_main:
            np.savetxt(
                os.path.join(args.output_path, f"{args.n_sample_train}-shot-index.txt"),
                few_shot_idx,
            )
        train_ds = open_dataset(test_path, indices=few_shot_idx)
        print(f"Few-shot transfer with {few_shot_idx.size}-shot images")

    mesh = make_mesh(args.n_devices or None)
    put = lambda b: shard_batch(mesh, b)
    # Few-shot datasets are staged whole in HBM: on this host<->device link a
    # per-iteration 1.5 MB device_put costs ~1.3 s (vs 105 ms compute), so the
    # per-iter batch becomes an on-device gather + flip (loader.py).  Larger
    # datasets fall back to the host streaming/prefetch pipeline.
    staged_bytes = len(train_ds) * 3 * args.size * args.size * 4
    if staged_bytes <= (512 << 20):
        from jax.sharding import NamedSharding, PartitionSpec

        from rick_tpu.data.loader import device_data_stream

        train_loader = device_data_stream(
            train_ds, args.batch, seed=args.seed,
            stage_put=lambda b: replicate(mesh, b),
            out_sharding=NamedSharding(mesh, PartitionSpec("data")),
        )
    else:
        # host streaming path: each process loads ONLY its slice of the
        # global batch (process_batch_slice) and jax assembles the global
        # sharded array -- per-host data loading per SURVEY par. 2.3
        from rick_tpu.dist import global_array_from_local, process_batch_slice

        _, local_bs = process_batch_slice(args.batch)
        train_loader = data_stream(
            train_ds, local_bs, seed=args.seed + 7919 * proc_idx,
            device_put=lambda b: global_array_from_local(mesh, b),
        )

    # ---- args.txt dump (`:845-851`); rank-0 only (reference `:605`)
    if is_main:
        with open(os.path.join(args.output_path, "args.txt"), "w") as f:
            f.writelines("------------------ start ------------------\n")
            for k, v in vars(args).items():
                f.writelines(f"{k} : {v}\n")
            f.writelines("------------------- end -------------------")

        # ---- training-script copy into the run dir (`:853-857`)
        shutil.copy(os.path.abspath(__file__), os.path.join(args.output_path, "train_script.py"))

    # ---- models + source checkpoint (`:864-879`)
    key = jax.random.key(args.seed)
    kg, kd, ktrain = jax.random.split(key, 3)
    g_init = generator_init(kg, gcfg)
    d_init = discriminator_init(kd, dcfg)
    g_params = d_params = g_ema = d_ema = None
    ckpt_path = os.path.join(args.data_root, "_pretrained", args.ckpt_source)
    if args.ckpt_source and os.path.exists(ckpt_path):
        assert args.source_key in args.ckpt_source
        print("load model:", args.ckpt_source)
        ckpt = load_torch_file(ckpt_path)
        g_sd_full = generator_state_dict_from_params(gcfg, g_init)
        d_sd_full = discriminator_state_dict_from_params(dcfg, d_init)
        g_params = generator_params_from_state_dict(
            gcfg, merge_state_dict_lenient(g_sd_full, dict(ckpt["g"]))
        )
        g_ema = generator_params_from_state_dict(
            gcfg, merge_state_dict_lenient(g_sd_full, dict(ckpt["g_ema"]))
        )
        d_params = discriminator_params_from_state_dict(
            dcfg, merge_state_dict_lenient(d_sd_full, dict(ckpt["d"]))
        )
        d_ema = jax.tree.map(lambda x: x.copy(), d_params)
    state = init_train_state(
        ktrain, gcfg, dcfg, tcfg,
        g_params=g_params, d_params=d_params, g_ema=g_ema, d_ema=d_ema,
    )

    start_iter = 0
    resume_path = args.resume
    if not resume_path and args.auto_resume:
        import glob

        candidates = sorted(glob.glob(os.path.join(args.checkpoint_dir, "*.state.npz")))
        if candidates:
            resume_path = candidates[-1]
    resumed_best_fid = None
    if resume_path:
        state, manifest = load_state(resume_path, state)
        start_iter = int(manifest.get("step", 0))
        # restore the best-FID watermark so the first post-resume eval cannot
        # overwrite best.pt with a worse checkpoint (ADVICE r2)
        if "best_fid" in manifest:
            resumed_best_fid = float(manifest["best_fid"])
        else:
            bf_txt = os.path.join(args.checkpoint_dir, "best_fid.txt")
            if os.path.exists(bf_txt):
                resumed_best_fid = float(np.loadtxt(bf_txt).reshape(-1)[0])
        print(
            f"resumed from {resume_path} at iter {start_iter}"
            + (f" (best FID so far {resumed_best_fid:.3f})" if resumed_best_fid is not None else "")
        )

    state = replicate(mesh, state)
    phases = make_train_step(gcfg, dcfg, tcfg)

    # ---- evaluator (`:947-958`)
    evaluator = None
    # Real-set caches are DATASET-derived (images + their pool3 activations
    # depend only on {dataset, size, n_sample_test, seed}, never on the run),
    # so they live next to the dataset and are shared by every run/resume/AB
    # arm on it -- on this 1-core host the PNG decode alone costs ~5 min per
    # run otherwise.  Reference parity note: the reference recomputes the
    # real stats each run (`gan_training/eval.py:23-25`); caching them is a
    # pure speedup with identical values (uint8 pixels are exact).
    cache_dir = os.path.join(args.data_root, "_cache")
    real_imgs_cache, real_acts_cache = _real_cache_paths(args, test_path, cache_dir)
    if is_main:
        os.makedirs(cache_dir, exist_ok=True)
        if os.environ.get("RICK_CLEAR_REAL_CACHE") == "1":
            _evict_stale_real_caches(cache_dir, [real_imgs_cache, real_acts_cache])
    if args.eval_in_training:
        # real-set cache, reference parity (`gan_training/eval.py:23-25`):
        # decoding n_sample_test PNGs costs minutes on this 1-core host, so a
        # resumed run must not pay it twice; deleted at training end (`:198`).
        # Stored as uint8 (the decoded pixels are exact uint8): 4x smaller
        # file AND 4x less host->device traffic (dequantized on device).
        if os.path.exists(real_imgs_cache):
            x_real_test = np.load(real_imgs_cache)
        else:
            test_ds = ImageDataset(test_path, resolution=args.size, flip=True)
            x_real_f32 = get_nsamples(test_ds, args.n_sample_test, seed=args.seed)
            x_real_test = np.clip(
                np.rint((x_real_f32 + 1.0) * 127.5), 0, 255
            ).astype(np.uint8)
            if is_main:
                # per-process tmp name: concurrent runs on the same dataset
                # must not interleave writes into one tmp file (ADVICE r3)
                tmp = f"{real_imgs_cache}.{os.getpid()}.tmp.npy"
                np.save(tmp, x_real_test)
                os.replace(tmp, real_imgs_cache)
        # pool3 activations of the real set are run-invariant: cache them so
        # a resumed run skips the 5000-image upload+extraction entirely
        real_acts = np.load(real_acts_cache) if os.path.exists(real_acts_cache) else None
        evaluator = Evaluator(
            gcfg,
            fid_real_samples=x_real_test,
            inception_nsamples=args.n_sample_test,
            batch_size=max(args.batch, 25),
            n_sample_store=args.n_sample_store,
            inception_dtype=jnp.bfloat16 if args.eval_bf16 else jnp.float32,
            inception_nhwc=args.eval_nhwc,
            real_acts=real_acts,
            mesh=mesh,  # data-parallel eval: generation chunks spread over the mesh
        )
        if real_acts is None and is_main:
            tmp = f"{real_acts_cache}.{os.getpid()}.tmp.npy"
            np.save(tmp, evaluator._real_acts)
            os.replace(tmp, real_acts_cache)
        if is_main:
            x_real = get_nsamples(train_ds, 10)
            save_image_grid(x_real, os.path.join(args.output_path, "real.png"), nrow=5)

    # ---- fixed latents
    if os.path.exists(args.sample_noise):
        sample_z = jnp.asarray(np.asarray(load_torch_file(args.sample_noise), np.float32))
    else:
        print(
            f"WARNING: fixed sample latents {args.sample_noise!r} not found; "
            "using seeded random latents — sample grids will not match runs "
            "that use the reference noise.pt fixture.",
            flush=True,
        )
        sample_z = jax.random.normal(jax.random.key(0), (args.n_sample_store, args.latent))

    fisher_noises, fisher_rows = load_fisher_noises(
        args.fisher_noise_dir, args.num_fisher_img, args.latent, args.batch,
        allow_random=args.allow_random_fisher_noise,
    )
    fisher_noises = jnp.asarray(fisher_noises)

    # ---- training loop (`:159-699`)
    rng = jax.random.key(args.seed + 7)
    best_fid = resumed_best_fid if resumed_best_fid is not None else 1000.0
    t_start = time.time()
    log_every = 50
    stats = StatsLogger(
        args.output_path, use_wandb=args.wandb,
        project=args.wandb_project_name, run_name=args.wandb_run_name,
    )
    from rick_tpu.ckpt.async_io import AsyncSaver, snapshot_packed

    saver = AsyncSaver(max_pending=2)
    best_dirty = None  # (packed, spec, fid) of the newest unsaved best
    last_best_save = 0.0
    best_save_interval = float(os.environ.get("RICK_BEST_SAVE_INTERVAL_S", "60"))
    profiler = ProfilerHook(args.profile_dir, start_iter=max(start_iter + 5, args.warmup_iter + 2))
    for i in range(start_iter, args.iter + 10 + 1):
        if i > args.iter + 10:
            break
        profiler.step(i)

        # Fisher round (`:213-393`)
        if i >= args.warmup_iter and (i - args.warmup_iter) % args.fisher_freq == 0:
            # random-access fisher key (tag 3 is reserved; run_iteration's
            # phases use tags 0-2), identical on resume vs continuous runs
            kf = jax.random.fold_in(jax.random.fold_in(rng, i), 3)
            # one real batch per noise file, rows paired index-for-index
            # (`:228-237`); stays on device -- no D2H round trip
            reals = jnp.concatenate([next(train_loader)[:r] for r in fisher_rows])
            gf, gp, df, dp = fisher_round(
                gcfg, dcfg, state["g_ema"], state["d_ema"],
                fisher_noises, reals, kf,
                batch=args.batch,
                fisher_quantile=args.fisher_quantile,
                prune_quantile=args.prune_quantile,
                denom=float(args.num_fisher_img * args.batch),
                # multi-device: shard the per-image FIM samples over the data
                # axis, psum the partial sums (single device: replicated path)
                mesh=mesh if mesh.devices.size > 1 else None,
            )
            state["g_freeze"], state["d_freeze"] = gf, df
            if i == args.warmup_iter:
                state["g_prune"], state["d_prune"] = gp, dp
            else:
                state["g_prune"] = merge_prune(state["g_prune"], gp)
                state["d_prune"] = merge_prune(state["d_prune"], dp)

        real = next(train_loader)
        # run-base key: per-(iteration, phase) keys fold_in-derive INSIDE the
        # phase jits (steps._phase_key) -- no per-iter host split dispatch
        state, metrics = run_iteration(phases, state, real, rng, i, tcfg)

        if i % log_every == 0 and is_main:
            # ONE host sync for the whole metrics dict (high-latency link)
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            stats.log(i, m)
            dt = time.time() - t_start
            print(
                f"[{i}/{args.iter}] d: {m['d']:.4f}; g: {m['g']:.4f}; r1: {m['r1']:.4f}; "
                f"path: {m['path']:.4f}; mean path: {m['mean_path_length']:.4f}; "
                f"augment: {m['ada_p']:.4f}; {dt:.1f}s elapsed",
                flush=True,
            )

        if args.store_samples and i % args.samples_freq == 0 and is_main:
            grid = sample_images(gcfg, state["g_ema"], sample_z)
            save_image_grid(
                grid, os.path.join(args.sample_dir, f"{i:06d}.png"),
                nrow=int(args.n_sample_store**0.5),
            )

        if args.store_checkpoints and i % args.checkpoints_freq == 0 and i > 0 and is_main:
            # snapshot on device (~ms), fetch+write in the background: a
            # synchronous full-state save costs ~65 s on this link (per-leaf
            # latency), so the snapshot is packed into one array per dtype
            snap, spec = snapshot_packed(state)

            def _write_periodic(host_state, *, step=i, bf=best_fid):
                # npz FIRST: it is the --auto_resume artifact, so it should
                # become durable as early as possible
                save_state(
                    os.path.join(args.checkpoint_dir, f"{step:06d}.state.npz"),
                    host_state, step=step,
                    extra={"best_fid": bf} if bf < 1000.0 else None,
                )
                _save_torch_ckpt(
                    os.path.join(args.checkpoint_dir, f"{step:06d}.pt"),
                    gcfg, dcfg, tcfg, host_state, save_torch_file,
                    generator_state_dict_from_params, discriminator_state_dict_from_params,
                )

            saver.submit_packed(_write_periodic, snap, spec)

        if evaluator is not None and i % args.eval_in_training_freq == 0:
            # collective over the global mesh: every process participates
            score = evaluator.compute_inception_score(state["g_ema"])
            if is_main:
                print(f"[{i}] FID: {score['fid']:.3f}", flush=True)
                stats.log(i, {"fid": float(score["fid"])})
            if score["fid"] < best_fid and is_main:
                best_fid = score["fid"]
                # snapshot ONLY what best.pt needs (5/9 of the state bytes)
                best_dirty = snapshot_packed(
                    {k: state[k] for k in ("g", "g_ema", "d", "g_opt", "d_opt")}
                ) + (best_fid,)
            # throttle: even coalesced+background, a ~1 GB snapshot fetch
            # saturates the host<->device link and stalls foreground dispatch
            # (measured: 6 s blocks -> 36 s while a best-save is in flight).
            # The newest best is flushed at training end regardless.
            if best_dirty is not None and time.time() - last_best_save >= best_save_interval:
                snap, spec, fid = best_dirty
                best_dirty = None
                last_best_save = time.time()

                def _write_best(host_state, *, fid=fid):
                    _save_torch_ckpt(
                        os.path.join(args.checkpoint_dir, "best.pt"),
                        gcfg, dcfg, tcfg, host_state, save_torch_file,
                        generator_state_dict_from_params, discriminator_state_dict_from_params,
                    )
                    np.savetxt(
                        os.path.join(args.checkpoint_dir, "best_fid.txt"),
                        np.asarray([fid]).reshape(1, -1),
                    )

                saver.submit_latest_packed("best", _write_best, snap, spec)

    train_loader.close()
    if best_dirty is not None:  # flush the newest best
        snap, spec, fid = best_dirty

        def _write_final_best(host_state, *, fid=fid):
            _save_torch_ckpt(
                os.path.join(args.checkpoint_dir, "best.pt"),
                gcfg, dcfg, tcfg, host_state, save_torch_file,
                generator_state_dict_from_params, discriminator_state_dict_from_params,
            )
            np.savetxt(
                os.path.join(args.checkpoint_dir, "best_fid.txt"),
                np.asarray([fid]).reshape(1, -1),
            )

        saver.submit_latest_packed("best", _write_final_best, snap, spec)
    saver.close()  # drain pending checkpoint writes
    stats.close()
    if is_main:
        # dataset-level caches persist across runs (see cache_dir note above);
        # the reference's per-run cache deletion (`:198`) has no analogue here
        print(f"done in {time.time()-t_start:.1f}s; best FID {best_fid}")


def _save_torch_ckpt(path, gcfg, dcfg, tcfg, host_state, save_torch_file, g_to_sd, d_to_sd):
    """Reference 5-key checkpoint layout (`:644-659`): {g_ema, g, d, g_optim,
    d_optim} — rosinality state dicts plus torch.optim.Adam-layout optimizer
    states, so a torch-side consumer can resume from our .pt.  Atomic write
    (tmp + rename).  `host_state` must already live on host (AsyncSaver
    fetches it off the training thread)."""
    from rick_tpu.ckpt import d_optim_state_dict, g_optim_state_dict
    from rick_tpu.ckpt.async_io import atomic_write

    obj = {
        "g_ema": g_to_sd(gcfg, host_state["g_ema"]),
        "g": g_to_sd(gcfg, host_state["g"]),
        "d": d_to_sd(dcfg, host_state["d"]),
        "g_optim": g_optim_state_dict(
            gcfg, host_state["g_opt"], lr=tcfg.g_lr, betas=(0.0, tcfg.g_beta2)
        ),
        "d_optim": d_optim_state_dict(
            dcfg, host_state["d_opt"], lr=tcfg.d_lr, betas=(0.0, tcfg.d_beta2)
        ),
    }
    with atomic_write(path) as tmp:
        save_torch_file(obj, tmp)


if __name__ == "__main__":
    main()
