"""The jitted training iteration, split into independently-compiled phases.

Phases (each a donated jit): D step (+ADA adaptation), lazy R1 step, G step,
lazy path-length step.  Splitting keeps compile times manageable and lets
every iteration reuse the same compiled D/G phases regardless of which lazy
regularizers fire (`d_reg_every=16`, `g_reg_every=4`).  Mirrors the iteration
body `train_dynamic_update_prune.py:395-698`.  The EMA (`accumulate()` in the
reference) is folded into the last phase of each iteration (g or path) —
identical math, one fewer dispatch; a standalone `ema` jit is still exported
for callers that manage phases manually.

Warmup (`:201-211,518-519,563-564`) is a *traced* flag: D updates gate to the
`final*` leaves and G updates gate off entirely, with per-leaf Adam counts
advancing only for active leaves (see `train/adam.py`) -- no recompilation
when warmup ends.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from rick_tpu.augment import augment
from rick_tpu.nn import discriminator_apply, generator_apply
from rick_tpu.nn.generator import generator_apply_latent, make_latent
from rick_tpu.train.adam import adam_update
from rick_tpu.train.losses import d_logistic_loss, g_nonsaturating_loss, path_stats
from rick_tpu.train.masks import (
    d_final_tree,
    d_trainable_tree,
    g_trainable_tree,
    mask_d_grads,
    mask_g_grads,
    prune_d_params,
    prune_g_params,
)


def _phase_key(key, step, tag: int):
    """Random-access per-(iteration, phase) key: fold the traced step and a
    static phase tag into the run-base key INSIDE the jit.  Replaces the old
    host-side `jax.random.split` chain — zero extra dispatches on this
    high-dispatch-cost backend, and a resumed run at iter N sees exactly the
    stream a continuous run would (the split chain restarted from the seed on
    resume)."""
    return jax.random.fold_in(jax.random.fold_in(key, step), tag)


def _sample_latent(gcfg, tcfg, g_params, key, batch):
    """In-jit style mixing: `mixing_noise` + the forward's inject_index logic
    (`train_dynamic_update_prune.py:121-135`, `model_probe_tune.py:544-560`)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    z1 = jax.random.normal(k1, (batch, tcfg.latent), jnp.float32)
    z2 = jax.random.normal(k2, (batch, tcfg.latent), jnp.float32)
    mix = jax.random.bernoulli(k3, tcfg.mixing)
    inject = jax.random.randint(k4, (), 1, gcfg.n_latent)  # 1..n_latent-1
    inject = jnp.where(mix, inject, gcfg.n_latent)
    return make_latent(gcfg, g_params, [z1, z2], inject_index=inject)


def ada_update(ada_p, ada_stats, r_t, real_pred, tcfg):
    """ADA probability adaptation (`train_dynamic_update_prune.py:440-459`):
    accumulate sign(real_pred) stats; once more than 255 predictions are
    pooled, step p by sign(r_t - target) * ada_step * n and reset."""
    stats = ada_stats + jnp.asarray(
        [jnp.sum(jnp.sign(real_pred)), real_pred.shape[0]], jnp.float32
    )
    trigger = stats[1] > 255
    r_t_new = stats[0] / jnp.maximum(stats[1], 1.0)
    sign = jnp.where(r_t_new > tcfg.ada_target, 1.0, -1.0)
    p_new = jnp.clip(ada_p + sign * tcfg.ada_step * stats[1], 0.0, 1.0)
    ada_p = jnp.where(trigger, p_new, ada_p)
    r_t = jnp.where(trigger, r_t_new, r_t)
    ada_stats = jnp.where(trigger, jnp.zeros_like(stats), stats)
    return ada_p, ada_stats, r_t


def _d_active(d_params, warmup):
    """D activity: during warmup only final* leaves; afterwards all trainable
    (`:201-211,920-931`)."""
    trainable = d_trainable_tree(d_params)
    final = d_final_tree(d_params)
    w = warmup.astype(jnp.float32)
    return jax.tree.map(lambda f, t: t * ((1.0 - w) + w * f), final, trainable)


def _g_active(g_params, warmup):
    trainable = g_trainable_tree(g_params)
    gate = 1.0 - warmup.astype(jnp.float32)
    return jax.tree.map(lambda t: t * gate, trainable)


def make_train_step(gcfg, dcfg, tcfg):
    """Build the phase functions; returns a dict of jitted callables."""
    # bf16 compute dtype for the adversarial phases: params stay f32 (casts
    # inside the apply fns produce f32 grads), predictions are cast back to
    # f32 before the softplus losses, and the grad-of-grad regularizer phases
    # (R1, path) plus ADA stay f32 for numerical fidelity.
    cdt = jnp.bfloat16 if getattr(tcfg, "bf16", False) else jnp.float32

    def d_phase(state, real_img, key, step, warmup):
        keys = jax.random.split(_phase_key(key, step, 0), 4)
        batch = real_img.shape[0]
        metrics: Dict[str, jnp.ndarray] = {}

        latent = _sample_latent(gcfg, tcfg, state["g"], keys[0], batch)
        fake, _ = generator_apply_latent(gcfg, state["g"], latent, rng=keys[1], dtype=cdt)
        fake = jax.lax.stop_gradient(fake).astype(jnp.float32)

        if tcfg.augment:
            # one warp call for real+fake: per-image transforms are independent,
            # so batching the two reference calls (`:403-405`) is semantically
            # identical and halves the (gather-bound) warp cost
            both, _ = augment(
                keys[2], jnp.concatenate([real_img, fake], axis=0),
                state["ada_p"], margin=tcfg.ada_margin,
            )
            real_aug, fake_aug = both[:batch], both[batch:]
        else:
            real_aug, fake_aug = real_img, fake

        def d_loss_fn(dp):
            fake_pred, _ = discriminator_apply(dcfg, dp, fake_aug, dtype=cdt)
            real_pred, _ = discriminator_apply(dcfg, dp, real_aug, dtype=cdt)
            real_pred = real_pred.astype(jnp.float32)
            fake_pred = fake_pred.astype(jnp.float32)
            return d_logistic_loss(real_pred, fake_pred), (real_pred, fake_pred)

        (d_loss, (real_pred, fake_pred)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state["d"])
        d_grads = mask_d_grads(d_grads, state["d_freeze"], state["d_prune"])
        d_params, d_opt = adam_update(
            state["d"], d_grads, state["d_opt"], _d_active(state["d"], warmup),
            lr=tcfg.d_lr, beta2=tcfg.d_beta2,
        )
        d_params = prune_d_params(d_params, state["d_prune"])

        metrics["d"] = d_loss
        metrics["real_score"] = jnp.mean(real_pred)
        metrics["fake_score"] = jnp.mean(fake_pred)

        # ADA p adaptation (`:440-459`)
        ada_p, ada_stats, r_t = state["ada_p"], state["ada_stats"], state["r_t"]
        if tcfg.augment and tcfg.augment_p == 0:
            ada_p, ada_stats, r_t = ada_update(ada_p, ada_stats, r_t, real_pred, tcfg)
        metrics["ada_p"] = ada_p
        metrics["r_t"] = r_t

        new_state = {
            **state,
            "d": d_params,
            "d_opt": d_opt,
            "ada_p": ada_p,
            "ada_stats": ada_stats,
            "r_t": r_t,
        }
        # real_aug is carried to the R1 phase (`:465` reuses the same batch)
        return new_state, metrics, real_aug

    def r1_phase(state, real_aug, warmup):
        def r1_loss_fn(dp):
            def score_sum(x):
                pred, _ = discriminator_apply(dcfg, dp, x)
                return jnp.sum(jnp.mean(pred.reshape(x.shape[0], -1), axis=1))

            grad_real = jax.grad(score_sum)(real_aug)
            r1 = jnp.mean(
                jnp.sum(grad_real.reshape(grad_real.shape[0], -1) ** 2, axis=1)
            )
            return tcfg.r1 / 2.0 * r1 * tcfg.d_reg_every, r1

        (_, r1_val), r1_grads = jax.value_and_grad(r1_loss_fn, has_aux=True)(state["d"])
        r1_grads = mask_d_grads(r1_grads, state["d_freeze"], state["d_prune"])
        d_params, d_opt = adam_update(
            state["d"], r1_grads, state["d_opt"], _d_active(state["d"], warmup),
            lr=tcfg.d_lr, beta2=tcfg.d_beta2,
        )
        d_params = prune_d_params(d_params, state["d_prune"])
        return {**state, "d": d_params, "d_opt": d_opt}, r1_val

    def g_phase(state, key, step, warmup, do_ema):
        keys = jax.random.split(_phase_key(key, step, 1), 3)
        ada_p = state["ada_p"]

        def g_loss_fn(gp):
            lat = _sample_latent(gcfg, tcfg, gp, keys[0], tcfg.batch)
            fk, _ = generator_apply_latent(gcfg, gp, lat, rng=keys[1], dtype=cdt)
            fk = fk.astype(jnp.float32)  # ADA warp + D input in f32
            if tcfg.augment:
                fk, _ = augment(keys[2], fk, ada_p, margin=tcfg.ada_margin)
            pred, _ = discriminator_apply(dcfg, state["d"], fk, dtype=cdt)
            return g_nonsaturating_loss(pred.astype(jnp.float32))

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(state["g"])
        g_grads = mask_g_grads(g_grads, state["g_freeze"], state["g_prune"])
        g_params, g_opt = adam_update(
            state["g"], g_grads, state["g_opt"], _g_active(state["g"], warmup),
            lr=tcfg.g_lr, beta2=tcfg.g_beta2,
        )
        g_params = prune_g_params(g_params, state["g_prune"])

        # EMA folded into this phase: on this 1-core tunneled host every extra
        # jit dispatch costs a ~2-3 ms fixed floor (scripts/bench_phase_split
        # null row), so the iteration-final EMA lerp rides here whenever no
        # path phase will run after us (do_ema).  On path iterations the lerp
        # is deferred to path_phase so it sees the post-path params — the
        # where() keeps the applied expression bit-identical to the old
        # standalone ema_phase.
        accum = tcfg.ema_accum
        g_ema = jax.tree.map(
            lambda e, p: jnp.where(do_ema, accum * e + (1.0 - accum) * p, e),
            state["g_ema"], g_params,
        )
        d_ema = jax.tree.map(
            lambda e, p: jnp.where(do_ema, accum * e + (1.0 - accum) * p, e),
            state["d_ema"], state["d"],
        )
        new_state = {
            **state, "g": g_params, "g_opt": g_opt, "g_ema": g_ema, "d_ema": d_ema,
        }
        return new_state, g_loss

    def path_phase(state, key, step, warmup):
        # grad-of-grad through the generator: Pallas custom_vjp kernels do not
        # support double backward, so trace the XLA epilogue here
        from rick_tpu.nn.blocks import no_pallas_epilogue

        keys = jax.random.split(_phase_key(key, step, 2), 3)
        path_batch = max(1, tcfg.batch // tcfg.path_batch_shrink)
        mpl = state["mean_path_length"]

        def path_loss_fn(gp):
            lat = _sample_latent(gcfg, tcfg, gp, keys[0], path_batch)
            fk, _ = generator_apply_latent(gcfg, gp, lat, rng=keys[1])
            noise_img = jax.random.normal(keys[2], fk.shape) / jnp.sqrt(
                jnp.asarray(fk.shape[2] * fk.shape[3], jnp.float32)
            )

            def inner(l):
                f2, _ = generator_apply_latent(gcfg, gp, l, rng=keys[1])
                return jnp.sum(f2 * noise_img)

            grad_lat = jax.grad(inner)(lat)
            penalty, new_mpl, lengths = path_stats(grad_lat, mpl)
            weighted = tcfg.path_regularize * tcfg.g_reg_every * penalty
            return weighted, (penalty, new_mpl, lengths)

        with no_pallas_epilogue():
            (_, (path_val, new_mpl, lengths)), p_grads = jax.value_and_grad(
                path_loss_fn, has_aux=True
            )(state["g"])
        p_grads = mask_g_grads(p_grads, state["g_freeze"], state["g_prune"])
        g_params, g_opt = adam_update(
            state["g"], p_grads, state["g_opt"], _g_active(state["g"], warmup),
            lr=tcfg.g_lr, beta2=tcfg.g_beta2,
        )
        g_params = prune_g_params(g_params, state["g_prune"])

        # iteration-final EMA (deferred from g_phase on path iterations so it
        # sees the post-path G params; same expression as the old ema_phase)
        accum = tcfg.ema_accum
        g_ema = jax.tree.map(
            lambda e, p: accum * e + (1.0 - accum) * p, state["g_ema"], g_params
        )
        d_ema = jax.tree.map(
            lambda e, p: accum * e + (1.0 - accum) * p, state["d_ema"], state["d"]
        )
        new_state = {
            **state,
            "g": g_params,
            "g_opt": g_opt,
            "g_ema": g_ema,
            "d_ema": d_ema,
            "mean_path_length": new_mpl,
        }
        return new_state, path_val, jnp.mean(lengths)

    def ema_phase(g_ema, d_ema, g, d):
        # narrow signature: donating the full state here would round-trip the
        # optimizer/mask buffers through HBM for no reason (~1 GB/iter)
        accum = tcfg.ema_accum
        new_g_ema = jax.tree.map(lambda e, p: accum * e + (1.0 - accum) * p, g_ema, g)
        new_d_ema = jax.tree.map(lambda e, p: accum * e + (1.0 - accum) * p, d_ema, d)
        return new_g_ema, new_d_ema

    return {
        "d": jax.jit(d_phase, donate_argnums=(0,)),
        "r1": jax.jit(r1_phase, donate_argnums=(0,)),
        "g": jax.jit(g_phase, donate_argnums=(0,)),
        "path": jax.jit(path_phase, donate_argnums=(0,)),
        "ema": jax.jit(ema_phase, donate_argnums=(0, 1)),
    }


_SCALAR_CACHE: Dict[tuple, jnp.ndarray] = {}


def _cached_scalar(name, value, dtype):
    """Per-iteration scalar device constants (warmup flag, metric zeros)
    created ONCE: every jnp.asarray/jnp.zeros at the call site is a real
    device op on this high-dispatch-cost backend."""
    k = (name, jnp.dtype(dtype).name, bool(value) if dtype == jnp.bool_ else value)
    out = _SCALAR_CACHE.get(k)
    if out is None or getattr(out, "is_deleted", lambda: False)():
        out = _SCALAR_CACHE[k] = jnp.asarray(value, dtype)
    return out


def run_iteration(phases, state, real_img, key, i: int, tcfg):
    """Host-side composition of one reference iteration (`:395-698`).

    Dispatch-count discipline (each extra host dispatch costs a measured
    ~2-3 ms on this backend — scripts/bench_phase_split null row):
    per-phase keys are derived by fold_in INSIDE the phase jits from the
    run-base `key` and the traced step, the iteration-final EMA rides inside
    whichever phase runs last (g or path; same math as the reference's
    standalone `accumulate()`), and scalar flags/zeros are cached device
    constants."""
    warmup = _cached_scalar("b", i < tcfg.warmup_iter, jnp.bool_)
    zero = _cached_scalar("zero", 0.0, jnp.float32)

    state, metrics, real_aug = phases["d"](state, real_img, key, i, warmup)

    metrics["r1"] = zero
    if i % tcfg.d_reg_every == 0:
        state, r1_val = phases["r1"](state, real_aug, warmup)
        metrics["r1"] = r1_val

    # The reference gates the whole path phase on `g_regularize and
    # i >= args.warmup_iter` (`:546`): during warmup neither params NOR the
    # mean_path_length EMA advance, so skip the phase entirely.
    path_fires = i % tcfg.g_reg_every == 0 and i >= tcfg.warmup_iter

    do_ema = _cached_scalar("b", not path_fires, jnp.bool_)
    state, g_loss = phases["g"](state, key, i, warmup, do_ema)
    metrics["g"] = g_loss

    metrics["path"] = zero
    metrics["path_length"] = zero
    if path_fires:
        state, path_val, path_len = phases["path"](state, key, i, warmup)
        metrics["path"] = path_val
        metrics["path_length"] = path_len

    metrics["mean_path_length"] = state["mean_path_length"]
    return state, metrics


def sample_images(gcfg, g_ema, sample_z, *, chunk: int = 25):
    """Deterministic sample grid from fixed latents (noise.pt).  Uses the
    registered constant noise buffers (the reference samples fresh injection
    noise per grid, `:631-641`; constant buffers make grids reproducible)."""
    outs = []
    n = sample_z.shape[0]
    fwd = jax.jit(lambda gp, z: generator_apply(gcfg, gp, [z])[0])
    for i in range(0, n, chunk):
        outs.append(fwd(g_ema, sample_z[i : i + chunk]))
    return jnp.concatenate(outs, axis=0)
