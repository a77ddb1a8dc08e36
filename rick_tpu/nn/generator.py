"""Functional StyleGAN2 Generator.

Reference: `gan_training/models/model_probe_tune.py:373-592`.  Parameters are a
pytree; the forward is a pure function of (params, latents, noise) so it jits,
vmaps and differentiates cleanly (Fisher estimation is a `vmap(grad(...))` over
this function).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from rick_tpu.nn.blocks import (
    equal_linear_apply,
    equal_linear_init,
    pixel_norm,
    styled_conv_apply,
    styled_conv_init,
    to_rgb_apply,
    to_rgb_init,
)

CHANNELS_BASE = {4: 512, 8: 512, 16: 512, 32: 512}


@dataclass(frozen=True)
class GeneratorConfig:
    size: int = 256
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    blur_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    lr_mlp: float = 0.01

    @property
    def log_size(self) -> int:
        return int(math.log2(self.size))

    @property
    def num_layers(self) -> int:
        return (self.log_size - 2) * 2 + 1

    @property
    def n_latent(self) -> int:
        return self.log_size * 2 - 2

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


def generator_init(key, cfg: GeneratorConfig):
    """Initialize parameters with the reference's distributions (randn weights,
    zero biases, modulation bias 1, randn const input / noise buffers)."""
    ch = cfg.channels
    keys = jax.random.split(key, 6)

    style = []
    ks = jax.random.split(keys[0], cfg.n_mlp)
    for i in range(cfg.n_mlp):
        style.append(
            equal_linear_init(ks[i], cfg.style_dim, cfg.style_dim, lr_mul=cfg.lr_mlp)
        )

    params = {
        "style": style,
        "input": jax.random.normal(keys[1], (1, ch[4], 4, 4), jnp.float32),
        "conv1": styled_conv_init(keys[2], ch[4], ch[4], 3, cfg.style_dim),
        "to_rgb1": to_rgb_init(keys[3], ch[4], cfg.style_dim),
    }

    convs, to_rgbs = [], []
    in_ch = ch[4]
    kc = jax.random.split(keys[4], cfg.log_size - 2)
    for idx, i in enumerate(range(3, cfg.log_size + 1)):
        out_ch = ch[2**i]
        k1, k2, k3 = jax.random.split(kc[idx], 3)
        convs.append(styled_conv_init(k1, in_ch, out_ch, 3, cfg.style_dim))
        convs.append(styled_conv_init(k2, out_ch, out_ch, 3, cfg.style_dim))
        to_rgbs.append(to_rgb_init(k3, out_ch, cfg.style_dim))
        in_ch = out_ch
    params["convs"] = convs
    params["to_rgbs"] = to_rgbs

    # fixed noise buffers (`model_probe_tune.py:428-431`)
    noises = []
    kn = jax.random.split(keys[5], cfg.num_layers)
    for layer_idx in range(cfg.num_layers):
        res = (layer_idx + 5) // 2
        noises.append(jax.random.normal(kn[layer_idx], (1, 1, 2**res, 2**res), jnp.float32))
    params["noises"] = noises

    return params


def style_forward(cfg: GeneratorConfig, params, z):
    """Style MLP: PixelNorm + n_mlp EqualLinear(fused_lrelu) (`:389-398`)."""
    x = pixel_norm(z)
    for layer in params["style"]:
        x = equal_linear_apply(layer, x, lr_mul=cfg.lr_mlp, activation="fused_lrelu")
    return x


def generator_mean_latent(cfg: GeneratorConfig, params, key, n_latent: int):
    """`Generator.mean_latent` (`:470-476`)."""
    z = jax.random.normal(key, (n_latent, cfg.style_dim), jnp.float32)
    return jnp.mean(style_forward(cfg, params, z), axis=0, keepdims=True)


def make_latent(
    cfg: GeneratorConfig,
    params,
    styles: Sequence[jnp.ndarray],
    *,
    inject_index=None,
    truncation: float = 1.0,
    truncation_latent: Optional[jnp.ndarray] = None,
    input_is_latent: bool = False,
):
    """Build the (B, n_latent, style_dim) per-layer latent tensor, mirroring the
    style-mixing / truncation logic of `Generator.forward` (`:509-563`).

    `inject_index` may be a traced int array for in-jit style mixing: layer i
    uses styles[1] iff i >= inject_index (only when two styles are given).
    """
    if not input_is_latent:
        styles = [style_forward(cfg, params, s) for s in styles]

    if truncation < 1.0:
        styles = [truncation_latent + truncation * (s - truncation_latent) for s in styles]

    n_latent = cfg.n_latent
    if len(styles) == 1:
        if styles[0].ndim == 3:
            return styles[0]
        return jnp.repeat(styles[0][:, None, :], n_latent, axis=1)

    if inject_index is None:
        inject_index = n_latent // 2
    layer_idx = jnp.arange(n_latent)[None, :, None]
    inject = jnp.asarray(inject_index).reshape(-1, 1, 1)
    w1 = styles[0][:, None, :]
    w2 = styles[1][:, None, :]
    return jnp.where(layer_idx < inject, w1, w2)


def _layer_noise(cfg: GeneratorConfig, params, batch: int, rng, noise):
    """Resolve the per-layer noise list: explicit > fresh random > const buffers."""
    if noise is not None:
        return noise
    if rng is not None:
        keys = jax.random.split(rng, cfg.num_layers)
        out = []
        for layer_idx in range(cfg.num_layers):
            res = (layer_idx + 5) // 2
            out.append(jax.random.normal(keys[layer_idx], (batch, 1, 2**res, 2**res), jnp.float32))
        return out
    return list(params["noises"])


def generator_apply(
    cfg: GeneratorConfig,
    params,
    styles: Sequence[jnp.ndarray],
    *,
    rng=None,
    noise: Optional[List] = None,
    inject_index=None,
    truncation: float = 1.0,
    truncation_latent=None,
    input_is_latent: bool = False,
    return_latents: bool = False,
    return_feats: bool = False,
    dtype=jnp.float32,
    fast: bool = False,
):
    """Full generator forward (`model_probe_tune.py:509-592`).

    Returns (image, aux) where aux is the latent tensor (return_latents),
    the list of per-StyledConv features (return_feats), or None.
    `rng=None and noise=None` selects the registered constant noise buffers
    (the reference's randomize_noise=False path).
    `fast=True` uses the fused Pallas upsample kernel (forward-only; for
    inference/eval paths -- do not differentiate through it).
    """
    latent = make_latent(
        cfg,
        params,
        styles,
        inject_index=inject_index,
        truncation=truncation,
        truncation_latent=truncation_latent,
        input_is_latent=input_is_latent,
    )
    return generator_apply_latent(
        cfg,
        params,
        latent,
        rng=rng,
        noise=noise,
        return_latents=return_latents,
        return_feats=return_feats,
        dtype=dtype,
        fast=fast,
    )


def generator_apply_latent(
    cfg: GeneratorConfig,
    params,
    latent,
    *,
    rng=None,
    noise=None,
    return_latents: bool = False,
    return_feats: bool = False,
    dtype=jnp.float32,
    fast: bool = False,
):
    """Core trunk taking the already-built (B, n_latent, style_dim) latent."""
    batch = latent.shape[0]
    noise = _layer_noise(cfg, params, batch, rng, noise)
    bk = cfg.blur_kernel

    feat_list = []
    out = jnp.tile(params["input"].astype(dtype), (batch, 1, 1, 1))
    out = styled_conv_apply(params["conv1"], out, latent[:, 0], noise[0], blur_kernel=bk)
    feat_list.append(out)
    skip = to_rgb_apply(params["to_rgb1"], out, latent[:, 1], blur_kernel=bk)

    i = 1
    for block in range(len(params["to_rgbs"])):
        conv_a = params["convs"][2 * block]
        conv_b = params["convs"][2 * block + 1]
        out = styled_conv_apply(conv_a, out, latent[:, i], noise[2 * block + 1], upsample=True, blur_kernel=bk, fast=fast)
        feat_list.append(out)
        out = styled_conv_apply(conv_b, out, latent[:, i + 1], noise[2 * block + 2], blur_kernel=bk)
        feat_list.append(out)
        skip = to_rgb_apply(params["to_rgbs"][block], out, latent[:, i + 2], skip, blur_kernel=bk)
        i += 2

    image = skip
    if return_latents:
        return image, latent
    if return_feats:
        return image, feat_list
    return image, None
