"""Train configuration and state.

The whole mutable training state is ONE pytree so the complete iteration
(D step, ADA adaptation, lazy regularizers, G step, masks, EMA) is a single
compiled function with donated buffers.  The reference scatters this state
across python locals, module buffers and optimizer internals
(`train_dynamic_update_prune.py:159-199`).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from rick_tpu.nn import (
    DiscriminatorConfig,
    GeneratorConfig,
    discriminator_init,
    generator_init,
)
from rick_tpu.train.adam import adam_init
from rick_tpu.train.masks import init_d_masks, init_g_masks


@dataclass(frozen=True)
class TrainConfig:
    """Static hyperparameters (flag defaults follow
    `train_dynamic_update_prune.py:703-758`)."""

    batch: int = 2
    latent: int = 512
    r1: float = 10.0
    path_regularize: float = 2.0
    path_batch_shrink: int = 2
    d_reg_every: int = 16
    g_reg_every: int = 4
    mixing: float = 0.9
    lr: float = 0.002
    augment: bool = True
    augment_p: float = 0.0
    ada_target: float = 0.6
    ada_length: int = 500 * 1000
    ada_margin: int = 224
    warmup_iter: int = 250
    fisher_freq: int = 50
    num_fisher_img: int = 5
    fisher_quantile: float = 40.0
    prune_quantile: float = 0.1
    ema_kimg: float = 10.0  # accum = 0.5 ** (32 / (10 * 1000)), `:180`
    # bf16 compute for the D/G adversarial phases (params, grads, optimizer,
    # EMA and the R1/path regularizers stay f32).  TPU-native mixed precision;
    # no reference equivalent (the reference trains pure f32).
    bf16: bool = False

    @property
    def g_reg_ratio(self) -> float:
        return self.g_reg_every / (self.g_reg_every + 1)

    @property
    def d_reg_ratio(self) -> float:
        return self.d_reg_every / (self.d_reg_every + 1)

    @property
    def g_lr(self) -> float:
        return self.lr * self.g_reg_ratio

    @property
    def d_lr(self) -> float:
        return self.lr * self.d_reg_ratio

    @property
    def g_beta2(self) -> float:
        return 0.99**self.g_reg_ratio

    @property
    def d_beta2(self) -> float:
        return 0.99**self.d_reg_ratio

    @property
    def ema_accum(self) -> float:
        return 0.5 ** (32.0 / (self.ema_kimg * 1000.0))

    @property
    def ada_step(self) -> float:
        return self.ada_target / self.ada_length


def init_train_state(
    key,
    gcfg: GeneratorConfig,
    dcfg: DiscriminatorConfig,
    tcfg: TrainConfig,
    *,
    g_params=None,
    d_params=None,
    g_ema=None,
    d_ema=None,
):
    """Build the full training state; params may come from a checkpoint."""
    kg, kd = jax.random.split(key)
    if g_params is None:
        g_params = generator_init(kg, gcfg)
    if d_params is None:
        d_params = discriminator_init(kd, dcfg)
    # EMA copies must be distinct buffers: the state pytree is donated to the
    # jitted phases, and aliased leaves would be donated twice.
    if g_ema is None:
        g_ema = jax.tree.map(lambda x: x.copy(), g_params)
    if d_ema is None:
        d_ema = jax.tree.map(lambda x: x.copy(), d_params)

    return {
        "g": g_params,
        "d": d_params,
        "g_ema": g_ema,
        "d_ema": d_ema,
        "g_opt": adam_init(g_params),
        "d_opt": adam_init(d_params),
        "g_freeze": init_g_masks(g_params),
        "g_prune": init_g_masks(g_params),
        "d_freeze": init_d_masks(d_params),
        "d_prune": init_d_masks(d_params),
        "mean_path_length": jnp.zeros((), jnp.float32),
        "ada_p": jnp.asarray(tcfg.augment_p if tcfg.augment_p > 0 else 0.0, jnp.float32),
        "ada_stats": jnp.zeros((2,), jnp.float32),  # (sum of sign(real_pred), n)
        "r_t": jnp.zeros((), jnp.float32),
    }


TrainState = dict
