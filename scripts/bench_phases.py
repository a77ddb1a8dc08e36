"""Per-phase timing of the training iteration on the real TPU.

Times each jitted phase (D, R1, G, path, EMA) in isolation by chaining N
donated dispatches and syncing ONCE with a value fetch (block_until_ready
lies on this backend -- see CLAUDE.md).  The ~300 ms tunnel RTT of the final
fetch is removed by a two-point fit: time N1 and N2 dispatches, slope =
per-iter cost.  Also reports the D phase without augmentation to isolate the
ADA cost.

Usage: python scripts/bench_phases.py [--size 256]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--n1", type=int, default=16)
    ap.add_argument("--n2", type=int, default=48)
    ap.add_argument("--ada_margin", type=int, default=None,
                    help="override TrainConfig.ada_margin (A/B the warp cost)")
    args = ap.parse_args()

    if not os.environ.get("RICK_NO_XLA_CACHE"):
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "RICK_XLA_CACHE_DIR", os.path.expanduser("~/.cache/rick_tpu_xla")
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from rick_tpu.nn import DiscriminatorConfig, GeneratorConfig
    from rick_tpu.train import TrainConfig, init_train_state, make_train_step

    SIZE = args.size
    BATCH = 2
    gcfg = GeneratorConfig(size=SIZE)
    dcfg = DiscriminatorConfig(size=SIZE)

    real = jax.random.normal(jax.random.key(2), (BATCH, 3, SIZE, SIZE))
    warm_flag = jnp.asarray(False)
    ema_flag = jnp.asarray(True)  # the common 12-of-16-iters g_phase variant

    def timed(label, dispatch, sync):
        """Two-point fit: slope of wall time vs dispatch count."""
        # warmup (compile + one steady dispatch)
        dispatch(3)
        sync()
        t0 = time.time()
        dispatch(args.n1)
        sync()
        t1 = time.time()
        dispatch(args.n2)
        sync()
        t2 = time.time()
        per = ((t2 - t1) - (t1 - t0)) / (args.n2 - args.n1)
        print(f"{label:28s} {per * 1000:8.2f} ms/iter")
        return per * 1000

    results = {}

    for aug in (True, False):
        kw = {} if args.ada_margin is None else {"ada_margin": args.ada_margin}
        tcfg = TrainConfig(batch=BATCH, augment=aug, warmup_iter=2, **kw)
        state = init_train_state(jax.random.key(0), gcfg, dcfg, tcfg)
        phases = make_train_step(gcfg, dcfg, tcfg)
        rng = jax.random.key(1)

        # ---- D phase ----
        # production dispatch pattern: constant run-base key, varying step
        # (per-phase keys are fold_in-derived inside the jit)
        box = {"state": state, "m": None, "real_aug": None, "i": 0}

        def next_step():
            box["i"] += 1
            return box["i"]

        def d_dispatch(n):
            for _ in range(n):
                box["state"], box["m"], box["real_aug"] = phases["d"](
                    box["state"], real, rng, next_step(), warm_flag
                )

        def d_sync():
            float(box["m"]["d"])

        tag = "aug" if aug else "noaug"
        results[f"d_{tag}"] = timed(f"D phase ({tag})", d_dispatch, d_sync)

        if not aug:
            continue

        # ---- G phase ----
        def g_dispatch(n):
            for _ in range(n):
                box["state"], box["gl"] = phases["g"](
                    box["state"], rng, next_step(), warm_flag, ema_flag
                )

        def g_sync():
            float(box["gl"])

        results["g"] = timed("G phase", g_dispatch, g_sync)

        # ---- EMA phase ----
        def ema_dispatch(n):
            for _ in range(n):
                box["state"]["g_ema"], box["state"]["d_ema"] = phases["ema"](
                    box["state"]["g_ema"], box["state"]["d_ema"],
                    box["state"]["g"], box["state"]["d"],
                )

        def ema_sync():
            float(jax.tree_util.tree_leaves(box["state"]["g_ema"])[0].ravel()[0])

        results["ema"] = timed("EMA phase", ema_dispatch, ema_sync)

        # ---- R1 phase ----
        def r1_dispatch(n):
            for _ in range(n):
                box["state"], box["r1"] = phases["r1"](
                    box["state"], box["real_aug"], warm_flag
                )

        def r1_sync():
            float(box["r1"])

        results["r1"] = timed("R1 phase", r1_dispatch, r1_sync)

        # ---- path phase ----
        def path_dispatch(n):
            for _ in range(n):
                box["state"], box["pv"], box["pl"] = phases["path"](
                    box["state"], rng, next_step(), warm_flag
                )

        def path_sync():
            float(box["pv"])

        results["path"] = timed("path phase", path_dispatch, path_sync)

    # phase-mix reconstruction: 16 D + 16 G + 1 R1 + 4 path per 16 iters
    # (EMA rides inside g/path since the round-4 fold; its standalone row
    # above is informational)
    mix = (
        16 * results["d_aug"] + 16 * results["g"]
        + 1 * results["r1"] + 4 * results["path"]
    ) / 16
    results["mix_reconstructed"] = mix
    print(f"{'phase-mix (reconstructed)':28s} {mix:8.2f} ms/iter")
    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
