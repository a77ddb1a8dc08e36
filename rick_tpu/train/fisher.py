"""Fisher information estimation and dynamic freeze/fine-tune/prune decisions.

Mirror of `train_dynamic_update_prune.py:213-393` (the paper's method):
per-single-image squared gradients of the EMA models, filter-level scores,
global per-group percentiles, and freeze/prune masks.  The per-image python
loop of the reference becomes a jitted per-image grad accumulated over the
fixed `_noise` latents; scores/percentiles/masks are computed on device.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from rick_tpu.nn import discriminator_apply, generator_apply
from rick_tpu.train.losses import d_logistic_loss, g_nonsaturating_loss


def _single_image_fims(gcfg, dcfg, g_ema, d_ema, z, real, rng):
    """Squared grads of per-single-image G and D losses wrt the EMA params
    (`:230-248`).  z: (1, 512); real: (1, 3, H, W).  rng=None selects the
    registered constant noise buffers (the reference's randomize_noise=False
    path) -- used by the reference-parity test to pin the injection noise on
    both sides."""

    def g_loss_fn(gp):
        fake, _ = generator_apply(gcfg, gp, [z], rng=rng)
        pred, _ = discriminator_apply(dcfg, d_ema, fake)
        return g_nonsaturating_loss(pred)

    def d_loss_fn(dp):
        fake, _ = generator_apply(gcfg, g_ema, [z], rng=rng)
        fake_pred, _ = discriminator_apply(dcfg, dp, fake)
        real_pred, _ = discriminator_apply(dcfg, dp, real)
        return d_logistic_loss(real_pred, fake_pred)

    g_grads = jax.grad(g_loss_fn)(g_ema)
    d_grads = jax.grad(d_loss_fn)(d_ema)
    sq = lambda t: jax.tree.map(lambda x: x * x, t)
    return sq(g_grads), sq(d_grads)


_ACCUM_CACHE = {}


def _get_accum_fn(gcfg, dcfg, n: int, denom: float, const_noise: bool = False, mesh=None):
    """One compiled function per (configs, n): scan of the per-image squared
    grads over the n fisher latents, summed and averaged on device.
    const_noise=True pins injection noise to the registered buffers
    (reference randomize_noise=False; parity testing).

    mesh: an optional jax Mesh with a 'data' axis.  The reference's fisher
    loop is a host-side python loop over images on ONE process (`:230-248`);
    the TPU-native multi-chip formulation shards the IMAGES over the mesh --
    each device scans its n/n_dev rows and the partial FIM sums are psum'd.
    Same math (sum of per-image squared grads is reduction-order-invariant up
    to f32 rounding), n_dev-times less sequential work per device."""
    key = (gcfg, dcfg, n, denom, const_noise, mesh)
    if key not in _ACCUM_CACHE:

        def summed(g_ema, d_ema, noises, reals, keys):
            # sequential scan of batch-1 grads: each step costs one ordinary
            # backward pass (a vmapped formulation lowers to pathologically
            # slow batched conv-grads on TPU)
            def body(carry, inp):
                z, real, k = inp
                sg, sd = _single_image_fims(
                    gcfg, dcfg, g_ema, d_ema, z[None], real[None],
                    None if const_noise else k,
                )
                cg, cd = carry
                return (
                    jax.tree.map(jnp.add, cg, sg),
                    jax.tree.map(jnp.add, cd, sd),
                ), None

            zero_g = jax.tree.map(jnp.zeros_like, g_ema)
            zero_d = jax.tree.map(jnp.zeros_like, d_ema)
            (sum_g, sum_d), _ = jax.lax.scan(body, (zero_g, zero_d), (noises, reals, keys))
            return sum_g, sum_d

        def _avg(sums):
            return jax.tree.map(lambda x: x / denom, sums)

        if mesh is None:

            def accum(g_ema, d_ema, noises, reals, keys):
                sum_g, sum_d = summed(g_ema, d_ema, noises, reals, keys)
                return _avg(sum_g), _avg(sum_d)

            _ACCUM_CACHE[key] = jax.jit(accum)
        else:
            from jax.sharding import PartitionSpec as P

            def local_accum(g_ema, d_ema, noises, reals, keys):
                # CRITICAL: pcast the replicated params to device-varying
                # before differentiating.  Under shard_map's vma tracking,
                # grad wrt an UNVARYING input auto-psums the cotangent --
                # which here lands BEFORE the squaring, silently turning
                # sum_i(grad_i^2) into (sum_i grad_i)^2 (caught by
                # test_fisher_accum_image_sharded_matches_replicated: 4x off
                # with 2 devices).  Varying params keep grads local; the ONE
                # explicit psum below is the only cross-device reduction.
                pc = lambda a: jax.lax.pcast(a, "data", to="varying")
                g_ema = jax.tree.map(pc, g_ema)
                d_ema = jax.tree.map(pc, d_ema)
                sum_g, sum_d = summed(g_ema, d_ema, noises, reals, keys)
                sum_g = jax.lax.psum(sum_g, "data")
                sum_d = jax.lax.psum(sum_d, "data")
                return _avg(sum_g), _avg(sum_d)

            sharded = jax.shard_map(
                local_accum,
                mesh=mesh,
                in_specs=(P(), P(), P("data"), P("data"), P("data")),
                out_specs=(P(), P()),
            )
            _ACCUM_CACHE[key] = jax.jit(sharded)
    return _ACCUM_CACHE[key]


def accumulate_fims(
    gcfg, dcfg, g_ema, d_ema, noises, reals, rng, *, batch: int,
    denom: float | None = None, const_noise: bool = False, mesh=None,
):
    """Average FIM over the fisher latents (`:225-269`) in ONE compiled call.

    noises: (N, 512); reals: (N, 3, H, W) where N is the TOTAL number of
    per-image FIM samples (the reference iterates every row of each
    `_noise/{j}.pt` file, `:230`, so N = num_fisher_img * rows_per_file).
    The reference divides the summed FIM by num_fisher_img * args.batch
    (`:266-269`) -- replicated verbatim, including the quirk that the divisor
    uses the train batch size; pass it as `denom`.  When `denom` is None it
    defaults to N * batch (exact only when rows_per_file == 1, i.e. one FIM
    sample per file; multi-row callers must pass num_fisher_img * batch).
    """
    n = noises.shape[0]
    keys = jax.random.split(rng, n)
    if denom is None:
        denom = float(n * batch)
    if mesh is not None and (mesh.devices.size <= 1 or n % mesh.devices.size != 0):
        mesh = None  # image-sharding needs divisibility; fall back to replicated
    fn = _get_accum_fn(gcfg, dcfg, n, float(denom), const_noise, mesh)
    return fn(g_ema, d_ema, noises, reals, keys)


@functools.partial(jax.jit, static_argnames=("fisher_quantile", "prune_quantile"))
def masks_from_fims(fim_g, fim_d, *, fisher_quantile: float, prune_quantile: float):
    """Filter scores, percentile cutlines and freeze/prune masks
    (`:279-384`).  Returns (g_freeze, g_prune, d_freeze, d_prune)."""
    # ---- G conv group (`:279-286`): per-out-filter mean of conv weight FIM
    conv_scores = [
        blk["conv"]["weight"].mean(axis=(1, 2, 3)) for blk in fim_g["convs"]
    ]
    grouped_conv = jnp.concatenate(conv_scores)
    cut_conv = jnp.percentile(grouped_conv, fisher_quantile)
    prune_conv = jnp.percentile(grouped_conv, prune_quantile)

    # ---- G FC group (`:289-299`): (mod weight FIM row-mean + bias FIM)/2
    fc_scores = [
        (blk["conv"]["modulation"]["weight"].mean(axis=1) + blk["conv"]["modulation"]["bias"]) / 2.0
        for blk in fim_g["convs"]
    ]
    grouped_fc = jnp.concatenate(fc_scores)
    cut_fc = jnp.percentile(grouped_fc, fisher_quantile)
    prune_fc = jnp.percentile(grouped_fc, prune_quantile)

    g_freeze = {"convs": []}
    g_prune = {"convs": []}
    for cs, fs in zip(conv_scores, fc_scores):
        g_freeze["convs"].append(
            {
                "weight": (cs > cut_conv).astype(jnp.float32),
                "mod_w": (fs > cut_fc).astype(jnp.float32),
                "mod_b": (fs > cut_fc).astype(jnp.float32),
            }
        )
        g_prune["convs"].append(
            {
                "weight": (cs <= prune_conv).astype(jnp.float32),
                "mod_w": (fs <= prune_fc).astype(jnp.float32),
                "mod_b": (fs <= prune_fc).astype(jnp.float32),
            }
        )

    # ---- D conv group (`:332-353`): (weight FIM filter-mean + paired bias)/2,
    # plus skip weights scored alone
    d_scores = []
    per_block = []
    for blk in fim_d["convs"][1:]:
        s1 = (blk["conv1"]["weight"].mean(axis=(1, 2, 3)) + blk["conv1"]["act_bias"]) / 2.0
        s2 = (blk["conv2"]["weight"].mean(axis=(1, 2, 3)) + blk["conv2"]["act_bias"]) / 2.0
        sk = blk["skip"]["weight"].mean(axis=(1, 2, 3))
        per_block.append((s1, s2, sk))
        d_scores += [s1, s2, sk]
    grouped_d = jnp.concatenate(d_scores)
    cut_d = jnp.percentile(grouped_d, fisher_quantile)
    prune_d = jnp.percentile(grouped_d, prune_quantile)

    d_freeze = {"convs": []}
    d_prune = {"convs": []}
    for s1, s2, sk in per_block:
        d_freeze["convs"].append(
            {
                "conv1_w": (s1 > cut_d).astype(jnp.float32),
                "conv1_b": (s1 > cut_d).astype(jnp.float32),
                "conv2_w": (s2 > cut_d).astype(jnp.float32),
                "conv2_b": (s2 > cut_d).astype(jnp.float32),
                "skip_w": (sk > cut_d).astype(jnp.float32),
            }
        )
        d_prune["convs"].append(
            {
                "conv1_w": (s1 <= prune_d).astype(jnp.float32),
                "conv1_b": (s1 <= prune_d).astype(jnp.float32),
                "conv2_w": (s2 <= prune_d).astype(jnp.float32),
                "conv2_b": (s2 <= prune_d).astype(jnp.float32),
                # NOTE: skip layers use strict < for pruning (`:384`)
                "skip_w": (sk < prune_d).astype(jnp.float32),
            }
        )

    return g_freeze, g_prune, d_freeze, d_prune


def fisher_round(
    gcfg,
    dcfg,
    g_ema,
    d_ema,
    noises,
    reals,
    rng,
    *,
    batch: int,
    fisher_quantile: float,
    prune_quantile: float,
    denom: float | None = None,
    mesh=None,
) -> Tuple:
    """Full Fisher round (`:213-393`): FIM accumulation + mask decisions.

    Returns (g_freeze, g_prune, d_freeze, d_prune); the caller merges the
    prune masks monotonically (`masks.merge_prune`).  On a multi-device
    `mesh`, the per-image FIM samples are sharded over the 'data' axis and
    the partial sums psum'd (see `_get_accum_fn`).
    """
    fim_g, fim_d = accumulate_fims(
        gcfg, dcfg, g_ema, d_ema, noises, reals, rng, batch=batch, denom=denom,
        mesh=mesh,
    )
    return masks_from_fims(
        fim_g, fim_d, fisher_quantile=fisher_quantile, prune_quantile=prune_quantile
    )
