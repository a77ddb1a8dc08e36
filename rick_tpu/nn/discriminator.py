"""Functional StyleGAN2 Discriminator.

Reference: `gan_training/models/model_probe_tune.py:663-764`.  Returns
(score, feats) with the same feature-tap points as the reference forward
(`:732-764`): from_rgb output, then (conv1, conv2) of every ResBlock, then the
final_conv output.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from rick_tpu.nn.blocks import (
    conv_layer_apply,
    conv_layer_init,
    equal_linear_apply,
    equal_linear_init,
    minibatch_stddev,
    res_block_apply,
    res_block_init,
)
from rick_tpu.nn.generator import CHANNELS_BASE


@dataclass(frozen=True)
class DiscriminatorConfig:
    size: int = 256
    channel_multiplier: int = 2
    blur_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    stddev_group: int = 25
    stddev_feat: int = 1

    @property
    def log_size(self) -> int:
        return int(math.log2(self.size))

    @property
    def channels(self) -> dict:
        cm = self.channel_multiplier
        return {
            **CHANNELS_BASE,
            64: 256 * cm,
            128: 128 * cm,
            256: 64 * cm,
            512: 32 * cm,
            1024: 16 * cm,
        }


def discriminator_init(key, cfg: DiscriminatorConfig):
    ch = cfg.channels
    n_blocks = cfg.log_size - 2
    keys = jax.random.split(key, n_blocks + 4)

    convs = [conv_layer_init(keys[0], 3, ch[cfg.size], 1)]  # from_rgb
    in_ch = ch[cfg.size]
    for idx, i in enumerate(range(cfg.log_size, 2, -1)):
        out_ch = ch[2 ** (i - 1)]
        convs.append(res_block_init(keys[idx + 1], in_ch, out_ch))
        in_ch = out_ch

    final_conv = conv_layer_init(keys[n_blocks + 1], in_ch + 1, ch[4], 3)
    final_linear = [
        equal_linear_init(keys[n_blocks + 2], ch[4] * 4 * 4, ch[4]),
        equal_linear_init(keys[n_blocks + 3], ch[4], 1),
    ]
    return {"convs": convs, "final_conv": final_conv, "final_linear": final_linear}


def discriminator_apply(cfg: DiscriminatorConfig, params, x, *, dtype=jnp.float32, stddev_splits=1):
    """Forward pass; returns (score (B,1), feat list).

    `stddev_splits=s` computes the minibatch-stddev statistics within `s`
    contiguous sub-batches — exactly equivalent to `s` separate forwards on
    the halves (allows batching the reference's real/fake D calls,
    `train_dynamic_update_prune.py:407-410`, into one; measured SLOWER than
    two calls on v5e at batch 2, so the trainer does not use it — ROUND4.md)."""
    bk = cfg.blur_kernel
    x = x.astype(dtype)

    feats = []
    out = conv_layer_apply(params["convs"][0], x, blur_kernel=bk)
    feats.append(out)
    for block in params["convs"][1:]:
        out, f1, f2 = res_block_apply(block, out, blur_kernel=bk)
        feats.append(f1)
        feats.append(f2)

    batch = out.shape[0]
    out = minibatch_stddev(
        out, stddev_group=cfg.stddev_group, stddev_feat=cfg.stddev_feat,
        splits=stddev_splits,
    )
    out = conv_layer_apply(params["final_conv"], out, blur_kernel=bk)
    feats.append(out)

    out = out.reshape(batch, -1)
    out = equal_linear_apply(params["final_linear"][0], out, activation="fused_lrelu")
    out = equal_linear_apply(params["final_linear"][1], out)
    return out, feats
