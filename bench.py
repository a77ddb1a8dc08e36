"""Benchmark: full-recipe projection on real TPU hardware.

Default mode measures (1) steady-state training iteration time at the
reference recipe's batch size with ADA on, per phase mix (12/16 plain, 3/16
+path, 1/16 r1+path), (2) EMA-generator sampling + InceptionV3 throughput for
the in-loop FID@5k evals, and (3) a Fisher-round cost; projects the
FFHQ->Babies recipe (1750 iters, fisher every 50, FID@5k every 50 --
README.md:95-102) and prints ONE json line.  vs_baseline = 15 min north-star /
projected minutes (>1 beats the target).

`python bench.py --e2e` MEASURES the recipe instead of projecting it: it
builds a synthetic 10-shot dataset + 5000-image test set, runs the actual
train CLI subprocess end-to-end with the README flags (samples, checkpoints,
FID@5k every 50 iters), SIGKILLs it mid-run and resumes with --auto_resume to
prove crash recovery, and reports the measured wall-clock as the json line.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main(size: int = 256, part: str = "all"):
    """part: 'all' | 'train' | 'eval' -- split measurement for working sets
    where the axon tunnel worker cannot survive the whole sequence in one
    process (observed at 1024px: the worker crashes at the eval sync when the
    train phases ran first, regardless of eval chunk size or codepath)."""
    import os

    import jax

    # persistent compilation cache, same location/knob as the train CLI:
    # repeated bench invocations skip the multi-minute phase compiles
    if not os.environ.get("RICK_NO_XLA_CACHE"):
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "RICK_XLA_CACHE_DIR", os.path.expanduser("~/.cache/rick_tpu_xla")
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from rick_tpu.metrics.fid import get_activations
    from rick_tpu.metrics.inception import inception_init
    from rick_tpu.nn import DiscriminatorConfig, GeneratorConfig, generator_apply
    from rick_tpu.train import (
        TrainConfig,
        fisher_round,
        init_train_state,
        make_train_step,
        run_iteration,
    )

    SIZE = size
    BATCH = 2
    ITERS_TOTAL = 1750
    WARMUP = 250
    FISHER_FREQ = 50
    EVAL_FREQ = 50
    EVAL_N = 5000

    gcfg = GeneratorConfig(size=SIZE)
    dcfg = DiscriminatorConfig(size=SIZE)
    tcfg = TrainConfig(batch=BATCH, augment=True, warmup_iter=2)
    state = init_train_state(jax.random.key(0), gcfg, dcfg, tcfg)
    phases = make_train_step(gcfg, dcfg, tcfg)

    rng = jax.random.key(1)
    real = jax.random.normal(jax.random.key(2), (BATCH, 3, SIZE, SIZE))

    # warm up all phase compilations at i=16..18: i=16 triggers BOTH lazy
    # phases (r1 at i%16==0, path at i%4==0 with i>=warmup_iter).  The path
    # phase is warmup-gated (ref :546), so warming at i=0 would silently leave
    # its multi-second compile inside the timed region.
    # NOTE: timings sync by fetching a VALUE -- block_until_ready returns
    # before execution completes on this backend.
    iter_s = float("nan")
    if part in ("all", "train"):
        m = None
        for i in (16, 17, 18):
            state, m = run_iteration(phases, state, real, rng, i, tcfg)
        float(m["d"])

        # phase-mix measurement over two full 16-iter cycles
        t0 = time.time()
        NMEAS = 32
        for i in range(NMEAS):
            # start past the warmup's (key, step) pairs (16..18) so every
            # measured iteration draws a fresh RNG stream
            state, m = run_iteration(phases, state, real, rng, i + 19, tcfg)
        float(m["d"])
        iter_s = (time.time() - t0) / NMEAS

    # eval cost: the real Evaluator (single-dispatch scan over 5000 imgs)
    from rick_tpu.metrics import Evaluator

    real_small = np.asarray(
        jax.random.uniform(jax.random.key(9), (128, 3, SIZE, SIZE), minval=-1, maxval=1)
    )
    # generation chunk scales down with resolution (batch-100 chunks OOM the
    # 16 GB HBM above 256px: the top-layer activation alone is ~7 GB at 512)
    # 1024px: chunk 20 exceeds HBM statically; chunk 10 compiles but the
    # 500-chunk eval execution with the train state resident still crashes
    # the worker (runtime memory pressure) -- chunk 5 is the measured-safe size
    gen_batch = 100 if SIZE <= 256 else (50 if SIZE <= 512 else 10)
    eval_s = gen_imgs_per_s = fisher_s = float("nan")
    if part in ("all", "eval"):
        evaluator = Evaluator(
            gcfg,
            fid_real_samples=real_small,
            inception_nsamples=EVAL_N,
            batch_size=64,
            inception_params=inception_init(),
            gen_batch=gen_batch,
        )
        evaluator.compute_inception_score(state["g_ema"])  # compile
        t0 = time.time()
        evaluator.compute_inception_score(state["g_ema"])
        evaluator.compute_inception_score(state["g_ema"])
        eval_s = (time.time() - t0) / 2

        # raw generation throughput (value-synced); fast=True matches the
        # Evaluator's TPU generation path (fused Pallas upsample kernel)
        gen = jax.jit(lambda gp, z, k: generator_apply(gcfg, gp, [z], rng=k, fast=True)[0])
        zb = jax.random.normal(jax.random.key(4), (gen_batch, 512))
        img = gen(state["g_ema"], zb, jax.random.key(0))
        float(img.ravel()[0])
        t0 = time.time()
        for i in range(10):
            img = gen(state["g_ema"], zb, jax.random.key(i))
        float(img.ravel()[0])
        gen_imgs_per_s = gen_batch / ((time.time() - t0) / 10)

    if part in ("all", "train"):
        # fisher round cost
        noises = jax.random.normal(jax.random.key(5), (5, 512))
        reals5 = jax.random.normal(jax.random.key(6), (5, 3, SIZE, SIZE))
        def _sync(tree):
            return float(jax.tree_util.tree_leaves(tree)[0].ravel()[0])

        warm = fisher_round(  # compile
            gcfg, dcfg, state["g_ema"], state["d_ema"], noises, reals5,
            jax.random.key(7), batch=BATCH, fisher_quantile=40.0, prune_quantile=0.1,
        )
        _sync(warm)  # drain the compile (value fetch = real sync)
        t0 = time.time()
        for j in range(3):
            masks = fisher_round(
                gcfg, dcfg, state["g_ema"], state["d_ema"], noises, reals5,
                jax.random.key(8 + j), batch=BATCH, fisher_quantile=40.0, prune_quantile=0.1,
            )
            _sync(masks)
        fisher_s = (time.time() - t0) / 3

    n_fisher = (ITERS_TOTAL - WARMUP) // FISHER_FREQ + 1
    n_evals = ITERS_TOTAL // EVAL_FREQ + 1
    projected_s = ITERS_TOTAL * iter_s + n_fisher * fisher_s + n_evals * eval_s
    projected_min = projected_s / 60.0

    detail = {
        "train_iter_ms": round(iter_s * 1000, 1),
        "train_iters_per_s": round(1.0 / iter_s, 2),
        "fid5k_eval_s": round(eval_s, 2),
        f"gen_imgs_per_s_{SIZE}px": round(gen_imgs_per_s, 0),
        "fisher_round_s": round(fisher_s, 2),
    }
    detail = {k: v for k, v in detail.items() if v == v}  # drop NaN (split runs)
    print(
        json.dumps(
            {
                "metric": (
                    "projected FFHQ->Babies recipe wall-clock (1750 iters + 36x FID@5k)"
                    if SIZE == 256 else
                    f"projected recipe wall-clock at {SIZE}px (1750 iters + 36x FID@5k"
                    + ("" if part == "all" else f", part={part}") + ")"
                ),
                "value": round(projected_min, 2) if projected_min == projected_min else None,
                "unit": "minutes",
                "vs_baseline": (
                    round(15.0 / projected_min, 3) if projected_min == projected_min else None
                ),
                "detail": detail,
            }
        )
    )


def metrics_main(size: int = 256):
    """`bench.py --metrics`: dispatch KID, precision/recall and intra-LPIPS
    ONCE each on the real chip and report timings (VERDICT r4 #4).

    These paths are CPU-unit-tested but, until round 5, had never executed on
    this backend -- and "unit-tested but never dispatched here" is a known
    risk class (the 1024px eval crash was found exactly this way).  Sample
    counts are sized to bound tunnel-duration/transfer hazards (KID protocol
    cap is 2000 fakes; P&R here runs at 1000 samples vs the reference's 5000;
    intra-LPIPS at 200 generated samples vs the reference's 1000 -- the code
    path is identical, only the loop trip counts differ)."""
    import os
    import shutil

    import jax

    if not os.environ.get("RICK_NO_XLA_CACHE"):
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "RICK_XLA_CACHE_DIR", os.path.expanduser("~/.cache/rick_tpu_xla")
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rick_tpu.metrics import Evaluator
    from rick_tpu.metrics.inception import inception_init
    from rick_tpu.metrics.intra_lpips import prepare_cluster_centers
    from rick_tpu.nn import GeneratorConfig, generator_init

    N = 1000
    gcfg = GeneratorConfig(size=size)
    g_ema = generator_init(jax.random.key(0), gcfg)
    real_small = np.asarray(
        jax.random.uniform(
            jax.random.key(9), (128, 3, size, size), minval=-1, maxval=1
        )
    )

    evaluator = Evaluator(
        gcfg,
        fid_real_samples=real_small,
        inception_nsamples=N,
        batch_size=64,
        inception_params=inception_init(),
        gen_batch=100,
        compute_pr=True,
    )
    timings = {}

    t0 = time.time()
    s = evaluator.compute_inception_score(g_ema, fid=True, kid=True)
    fid, kid = float(s["fid"]), float(s["kid"])  # value fetch = real sync
    timings[f"fid_kid_{N}_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    s = evaluator.compute_inception_score(g_ema, fid=False, pr=True)
    prec, rec = float(s["precision"]), float(s["recall"])
    timings[f"pr_{N}_s"] = round(time.time() - t0, 2)

    cdir = "/tmp/rick_metrics_bench_centers"
    shutil.rmtree(cdir, ignore_errors=True)
    prepare_cluster_centers(real_small[:10], cdir)
    t0 = time.time()
    il = evaluator.compute_intra_lpips(
        g_ema, cdir, n_samples=200, k=10, size=size
    )
    timings["intra_lpips_200_s"] = round(time.time() - t0, 2)

    print(
        json.dumps(
            {
                "metric": f"standalone metric dispatch timings at {size}px (real chip)",
                "value": timings[f"fid_kid_{N}_s"],
                "unit": "seconds (fid+kid)",
                "vs_baseline": None,
                "detail": {
                    **timings,
                    "fid": round(fid, 3),
                    "kid": round(kid, 5),
                    "precision": round(prec, 4),
                    "recall": round(rec, 4),
                    "intra_lpips": round(il, 4),
                },
            }
        )
    )


def _build_synthetic_dataset(root: str, n_train: int = 10, n_test: int = 5000, size: int = 256):
    """Record stores of PNG blobs matching the CLI's expected layout."""
    import io
    import os

    from PIL import Image

    from rick_tpu.data.store import RecordStoreWriter

    rng = np.random.default_rng(0)

    def write(path, n, seed0):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with RecordStoreWriter(path) as w:
            for i in range(n):
                # smooth-ish random images (pure noise is pathological for PNG)
                small = rng.integers(0, 255, (size // 8, size // 8, 3), dtype=np.uint8)
                img = Image.fromarray(small).resize((size, size), Image.BILINEAR)
                buf = io.BytesIO()
                img.save(buf, format="PNG", compress_level=1)
                w.put(i, buf.getvalue())

    write(os.path.join(root, "_processed_train", "babies"), n_train, 0)
    write(os.path.join(root, "_processed_test", "babies"), n_test, 1)


def e2e():
    """Measured (not projected) FFHQ->Babies recipe wall-clock, with a
    mid-run SIGKILL + --auto_resume to prove recovery under fire.

    RICK_E2E_SMOKE=1 shrinks everything (size 64, 40 iters) to rehearse the
    orchestration (dataset build, subprocess, kill, resume) in ~2 minutes."""
    import os
    import signal
    import subprocess
    import sys

    smoke = os.environ.get("RICK_E2E_SMOKE") == "1"
    # RICK_E2E_RECIPE=cat runs the reference's second README recipe
    # (FFHQ->AFHQ-Cat, `README.md:107-114`: 2250 iters, fisher_quantile 85,
    # prune_quantile 0.075); default is the FFHQ->Babies recipe.
    recipe = os.environ.get("RICK_E2E_RECIPE", "babies")
    # kill+resume variant: SIGKILL after the periodic checkpoint lands, then
    # --auto_resume.  Exercised by the smoke rehearsal and one full run (see
    # ROUND2.md: 70.8 min incl. the replay); default off so the recurring
    # benchmark reports the clean single-pass recipe.
    do_kill = smoke or os.environ.get("RICK_E2E_KILL") == "1"
    root = "/tmp/rick_e2e_smoke" if smoke else "/tmp/rick_e2e"
    out_root = os.path.join(root, "_output")
    exp_dir = os.path.join(out_root, "e2e")
    stats_path = os.path.join(exp_dir, "stats.jsonl")
    import shutil

    shutil.rmtree(out_root, ignore_errors=True)

    size, iters, warmup = (64, 40, 4) if smoke else (256, 1750, 250)
    n_test, every, kill_after, resume_ckpt = (64, 20, 20, 20) if smoke else (5000, 50, 700, 500)
    fisher_q, prune_q = "40", "0.1"
    if recipe == "cat":
        fisher_q, prune_q = "85", "0.075"
        if not smoke:
            iters = 2250

    t0 = time.time()
    # check for the records FILE, not the directory: a killed builder can
    # leave an empty dataset dir behind (the records write itself is atomic)
    if not all(
        os.path.exists(os.path.join(root, split, "babies", "records.rdb"))
        for split in ("_processed_train", "_processed_test")
    ):
        _build_synthetic_dataset(root, n_test=n_test, size=size)
    prep_s = time.time() - t0

    cmd = [
        sys.executable, "-m", "rick_tpu.cli.train",
        "--exp", "e2e", "--data_path", "babies",
        "--data_root", root, "--output_root", out_root,
        "--size", str(size), "--batch", "2", "--iter", str(iters),
        "--augment", "--warmup_iter", str(warmup),
        "--fisher_freq", "50", "--fisher_quantile", fisher_q,
        "--prune_quantile", prune_q, "--num_fisher_img", "5",
        "--eval_in_training", "--eval_in_training_freq", str(every),
        "--n_sample_test", str(n_test),
        "--store_samples", "--samples_freq", str(resume_ckpt),
        "--store_checkpoints", "--checkpoints_freq", str(resume_ckpt),
        "--auto_resume", "--allow_random_fisher_noise",
    ]
    # extra CLI flags for A/B runs (e.g. RICK_E2E_ARGS="--ada_margin 224"
    # for the VERDICT r2 #10 margin parity experiment)
    extra = os.environ.get("RICK_E2E_ARGS", "").split()
    cmd += extra
    if extra:
        print(f"e2e extra args: {extra}")

    def last_iter():
        try:
            with open(stats_path) as f:
                lines = f.readlines()
            for line in reversed(lines):
                rec = json.loads(line)
                if "step" in rec:
                    return int(rec["step"])
        except (OSError, ValueError):
            pass
        return -1

    log = open("/tmp/rick_e2e_train.log", "w")
    t_train0 = time.time()
    proc = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT)
    # kill after the periodic checkpoint has LANDED on disk and progress
    # passed it (checkpoints are written asynchronously: a kill can outrun an
    # in-flight write -- atomicity then correctly leaves no file, and resume
    # falls back to the previous checkpoint or start; here we test the
    # "crash after a checkpoint landed" recovery path)
    killed_at = None
    ckpt_file = os.path.join(exp_dir, "checkpoints", f"{resume_ckpt:06d}.state.npz")
    while proc.poll() is None:
        time.sleep(3 if smoke else 10)
        it = last_iter()
        if do_kill and killed_at is None and it >= kill_after and os.path.exists(ckpt_file):
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            killed_at = it
            break
    if killed_at is None and proc.returncode not in (0, None):
        raise RuntimeError(f"train run failed rc={proc.returncode}, see /tmp/rick_e2e_train.log")

    if killed_at is not None:
        # SIGKILLing a process with a large device->host fetch in flight can
        # wedge the remote tunnel worker for minutes (the dead client's grant
        # is held until lease expiry -- ROUND4.md).  Wait for the backend to
        # answer a trivial op before starting the resumed run, else it hangs
        # silently on its first device op.
        probe = ("import jax, jax.numpy as jnp; "
                 "print(float(jnp.sum(jnp.ones((64,64)))))")
        deadline = time.time() + 45 * 60
        while True:
            try:
                subprocess.run([sys.executable, "-c", probe], check=True,
                               capture_output=True, timeout=90)
                break
            except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
                if time.time() > deadline:
                    raise RuntimeError(
                        "TPU backend still unresponsive 45 min after the "
                        "SIGKILL; tunnel wedged -- see ROUND4.md"
                    )
                print("post-kill backend probe failed; retrying in 60 s", flush=True)
                time.sleep(60)
        # resume (auto_resume picks the newest landed .state.npz)
        proc = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT)
        rc = proc.wait()
    else:
        rc = proc.returncode
    log.close()
    wall_s = time.time() - t_train0
    if rc != 0:
        raise RuntimeError(f"resumed run failed rc={rc}, see /tmp/rick_e2e_train.log")

    final_it = last_iter()
    wall_min = wall_s / 60.0
    print(
        json.dumps(
            {
                "metric": ("SMOKE e2e wall-clock" if smoke else
                           f"MEASURED FFHQ->{'AFHQ-Cat' if recipe == 'cat' else 'Babies'}"
                           f" recipe wall-clock ({iters} iters + {iters // every + 1}x FID@5k"
                           + (", incl. mid-run SIGKILL + auto-resume" if do_kill else "")
                           + ")"),
                "value": round(wall_min, 2),
                "unit": "minutes",
                "vs_baseline": round(15.0 / wall_min, 3),
                "detail": {
                    "killed_at_iter": killed_at,
                    "final_iter": final_it,
                    "replayed_iters": (killed_at - resume_ckpt) if killed_at else 0,
                    "dataset_prep_s": round(prep_s, 1),
                    "train_log": "/tmp/rick_e2e_train.log",
                },
            }
        )
    )


if __name__ == "__main__":
    import sys

    if "--e2e" in sys.argv:
        e2e()
    elif "--metrics" in sys.argv:
        size = 256
        if "--size" in sys.argv:
            size = int(sys.argv[sys.argv.index("--size") + 1])
        metrics_main(size)
    else:
        size = 256
        if "--size" in sys.argv:  # VERDICT r2 #7: 512/1024px datapoints
            size = int(sys.argv[sys.argv.index("--size") + 1])
        part = "all"
        if "--part" in sys.argv:  # split runs for 1024px (see main docstring)
            part = sys.argv[sys.argv.index("--part") + 1]
        main(size, part)
