"""Decompose the D/G train phases into sub-costs on the real TPU (batch 2).

The phase totals (scripts/bench_phases.py: D 44.7 ms, G 38.3 ms at 256px)
are 90% of the iteration; this attributes them to measured pieces so any
further optimization targets the dominant term instead of a guess:

  latent      style MLP + mixing (``_sample_latent``)
  gen         generator trunk forward, batch 2 (given latent)
  aug4        ADA augment on the concat [real, fake] batch 4 (margin 64)
  d_fwd       one discriminator forward, batch 2
  d_grad      D-loss value_and_grad (two D forwards + backward)
  d_optim     mask_d_grads + adam_update + prune_d_params (grads precomputed)
  g_optim     same for G
  g_grad      G-loss value_and_grad (latent+gen+aug+D fwd, backward through all)

Reconstruction checks: D phase ~= latent+gen+aug4+d_grad+d_optim,
G phase ~= g_grad+g_optim.

Timing discipline per CLAUDE.md: value-fetch sync (block_until_ready lies on
this backend), two-point fit over chained dispatches to remove the tunnel
RTT, full-reduction carries so XLA cannot DCE the timed op.  All params are
passed as jit ARGUMENTS (closure-captured trees would be baked into the
executable as constants).
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

    from rick_tpu.augment import augment
    from rick_tpu.nn import (
        DiscriminatorConfig,
        GeneratorConfig,
        discriminator_apply,
    )
    from rick_tpu.nn.generator import generator_apply_latent
    from rick_tpu.train import TrainConfig, init_train_state
    from rick_tpu.train.adam import adam_update
    from rick_tpu.train.losses import d_logistic_loss, g_nonsaturating_loss
    from rick_tpu.train.masks import (
        mask_d_grads,
        mask_g_grads,
        prune_d_params,
        prune_g_params,
    )
    from rick_tpu.train.steps import _d_active, _g_active, _sample_latent

    SIZE = args.size
    BATCH = 2
    gcfg = GeneratorConfig(size=SIZE)
    dcfg = DiscriminatorConfig(size=SIZE)
    tcfg = TrainConfig(batch=BATCH, augment=True, warmup_iter=2)

    state = init_train_state(jax.random.key(0), gcfg, dcfg, tcfg)
    g, d = state["g"], state["d"]
    d_freeze, d_prune = state["d_freeze"], state["d_prune"]
    g_freeze, g_prune = state["g_freeze"], state["g_prune"]
    real = jax.random.normal(jax.random.key(2), (BATCH, 3, SIZE, SIZE))
    real4 = jax.random.normal(jax.random.key(3), (2 * BATCH, 3, SIZE, SIZE))
    fake = jax.random.normal(jax.random.key(8), real.shape)
    warm = jnp.asarray(False)
    ada_p = jnp.asarray(0.5, jnp.float32)

    def tree_force(t):
        # full reduction over every leaf so backward/adam cannot be sliced
        return sum(jnp.mean(x.astype(jnp.float32)) for x in jax.tree.leaves(t))

    def timed(label, dispatch, sync):
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
        print(f"{label:16s} {per * 1000:8.2f} ms", flush=True)
        return per * 1000

    results = {}
    box = {"rng": jax.random.key(1), "c": jnp.zeros((), jnp.float32)}

    # ---- null: per-call host dispatch floor on this backend ----------------
    # Each chained jit call pays a fixed host-side cost (arg handling, cache
    # lookup, tunnel enqueue) even when the device work is ~zero.  Component
    # rows each include ONE floor; the real fused phases pay it once per
    # PHASE, which is why naive component sums overshoot the phase totals.

    def chain(fn, *fn_args):
        """Dispatch loop: new key per call, carry forces sequencing + no DCE."""

        def dispatch(n):
            for _ in range(n):
                box["rng"], k = jax.random.split(box["rng"])
                box["c"] = fn(*fn_args, k, box["c"])

        def sync():
            float(box["c"])

        return dispatch, sync

    @jax.jit
    def null_fn(k, c):
        return c + jax.random.uniform(k) * 1e-12

    results["null"] = timed("null", *chain(null_fn))

    # ---- latent (style MLP + mixing) ----
    @jax.jit
    def lat_fn(gp, k, c):
        return jnp.mean(_sample_latent(gcfg, tcfg, gp, k, BATCH)) + 0.0 * c

    results["latent"] = timed("latent", *chain(lat_fn, g))

    latent = jax.jit(lambda gp, k: _sample_latent(gcfg, tcfg, gp, k, BATCH))(
        g, jax.random.key(7)
    )

    # ---- generator trunk forward (given latent) ----
    @jax.jit
    def gen_fn(gp, lat, k, c):
        img, _ = generator_apply_latent(gcfg, gp, lat, rng=k)
        return jnp.mean(img) + 0.0 * c

    results["gen"] = timed("gen", *chain(gen_fn, g, latent))

    # ---- ADA augment, batch 4 ----
    @jax.jit
    def aug_fn(x, p, k, c):
        out, _ = augment(k, x, p, margin=tcfg.ada_margin)
        return jnp.mean(out) + 0.0 * c

    results["aug4"] = timed("aug4", *chain(aug_fn, real4, ada_p))

    # ---- one D forward ----
    @jax.jit
    def dfwd_fn(dp, r, k, c):
        pred, _ = discriminator_apply(dcfg, dp, r + 0.0 * c)
        return jnp.mean(pred)

    results["d_fwd"] = timed("d_fwd", *chain(dfwd_fn, d, real))

    # ---- D-loss grad (2 forwards + backward) ----
    def d_loss(dp, r, f):
        fp, _ = discriminator_apply(dcfg, dp, f)
        rp, _ = discriminator_apply(dcfg, dp, r)
        return d_logistic_loss(rp, fp)

    @jax.jit
    def dgrad_fn(dp, r, f, k, c):
        loss, grads = jax.value_and_grad(d_loss)(dp, r + 0.0 * c, f)
        return loss + tree_force(grads)

    results["d_grad"] = timed("d_grad", *chain(dgrad_fn, d, real, fake))

    # ---- D optimizer (mask + adam + prune), donated chain ----
    d_grads = jax.jit(jax.grad(d_loss))(d, real, fake)

    @jax.jit
    def d_optim_fn(dp, dopt, gr, k):
        gr = jax.tree.map(lambda x: x * (1.0 + 1e-12 * jax.random.uniform(k)), gr)
        gr = mask_d_grads(gr, d_freeze, d_prune)
        dp2, dopt2 = adam_update(
            dp, gr, dopt, _d_active(dp, warm), lr=tcfg.d_lr, beta2=tcfg.d_beta2
        )
        return prune_d_params(dp2, d_prune), dopt2

    dbox = {"p": jax.tree.map(lambda x: x.copy(), d), "o": state["d_opt"]}

    def d_optim_dispatch(n):
        for _ in range(n):
            box["rng"], k = jax.random.split(box["rng"])
            dbox["p"], dbox["o"] = d_optim_fn(dbox["p"], dbox["o"], d_grads, k)

    def d_optim_sync():
        float(jax.tree.leaves(dbox["p"])[0].ravel()[0])

    results["d_optim"] = timed("d_optim", d_optim_dispatch, d_optim_sync)

    # ---- G-loss grad (latent + gen + aug + D fwd, backward through all) ----
    def g_loss(gp, dp, p, k):
        k1, k2, k3 = jax.random.split(k, 3)
        lat = _sample_latent(gcfg, tcfg, gp, k1, BATCH)
        fk, _ = generator_apply_latent(gcfg, gp, lat, rng=k2)
        fk, _ = augment(k3, fk, p, margin=tcfg.ada_margin)
        pred, _ = discriminator_apply(dcfg, dp, fk)
        return g_nonsaturating_loss(pred)

    @jax.jit
    def ggrad_fn(gp, dp, p, k, c):
        loss, grads = jax.value_and_grad(g_loss)(gp, dp, p + 0.0 * c, k)
        return loss + tree_force(grads)

    results["g_grad"] = timed("g_grad", *chain(ggrad_fn, g, d, ada_p))

    # ---- G optimizer ----
    g_grads = jax.jit(jax.grad(g_loss))(g, d, ada_p, jax.random.key(9))

    @jax.jit
    def g_optim_fn(gp, gopt, gr, k):
        gr = jax.tree.map(lambda x: x * (1.0 + 1e-12 * jax.random.uniform(k)), gr)
        gr = mask_g_grads(gr, g_freeze, g_prune)
        gp2, gopt2 = adam_update(
            gp, gr, gopt, _g_active(gp, warm), lr=tcfg.g_lr, beta2=tcfg.g_beta2
        )
        return prune_g_params(gp2, g_prune), gopt2

    gbox = {"p": jax.tree.map(lambda x: x.copy(), g), "o": state["g_opt"]}

    def g_optim_dispatch(n):
        for _ in range(n):
            box["rng"], k = jax.random.split(box["rng"])
            gbox["p"], gbox["o"] = g_optim_fn(gbox["p"], gbox["o"], g_grads, k)

    def g_optim_sync():
        float(jax.tree.leaves(gbox["p"])[0].ravel()[0])

    results["g_optim"] = timed("g_optim", g_optim_dispatch, g_optim_sync)

    floor = results["null"]
    d_sum = (
        results["latent"]
        + results["gen"]
        + results["aug4"]
        + results["d_grad"]
        + results["d_optim"]
        - 4 * floor  # 5 components each carry one dispatch floor; the phase pays 1
    )
    # latent is already inside g_grad (g_loss samples its own latent)
    g_sum = results["g_grad"] + results["g_optim"] - floor
    results["d_phase_reconstructed"] = d_sum
    results["g_phase_reconstructed"] = g_sum
    print(f"{'D reconstructed':16s} {d_sum:8.2f} ms  (bench_phases D aug: ~44.7)")
    print(f"{'G reconstructed':16s} {g_sum:8.2f} ms  (bench_phases G: ~38.3)")
    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
