"""Converters between rosinality torch state dicts and rick-tpu param pytrees.

Key layout on the torch side (reference `model_probe_tune.py`):

  Generator:
    style.{1..n_mlp}.weight/bias          (Sequential; index 0 is PixelNorm)
    input.input                           (1, ch4, 4, 4)
    conv1.conv.weight                     (1, out, in, 3, 3)   <- 5-D!
    conv1.conv.modulation.weight/bias
    conv1.noise.weight                    (1,)
    conv1.activate.bias
    to_rgb1.conv.weight (1,3,in,1,1) / .conv.modulation.* / .bias (1,3,1,1)
    convs.{i}.<same as conv1>             i in 0..2*(log-2)-1
    to_rgbs.{i}.<same as to_rgb1>
    noises.noise_{j}                      (1,1,2^r,2^r)

  Discriminator:
    convs.0.0.weight / convs.0.1.bias                       (from_rgb ConvLayer)
    convs.{b}.conv1.0.weight / convs.{b}.conv1.1.bias       (ResBlock)
    convs.{b}.conv2.1.weight / convs.{b}.conv2.2.bias       (downsample ConvLayer)
    convs.{b}.skip.1.weight
    final_conv.0.weight / final_conv.1.bias
    final_linear.{0,1}.weight/bias

rick-tpu side: see `rick_tpu/nn/generator.py` / `discriminator.py` (modconv
weights are 4-D (out,in,k,k); noise scalars are 0-D).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from rick_tpu.nn.discriminator import DiscriminatorConfig
from rick_tpu.nn.generator import GeneratorConfig


def _j(x):
    return jnp.asarray(np.asarray(x), dtype=jnp.float32)


def merge_state_dict_lenient(full_sd: Dict, loaded_sd: Dict) -> Dict:
    """load_state_dict(strict=False) semantics: start from the model's own
    state dict and overwrite with whatever the checkpoint provides (unknown
    checkpoint keys ignored, missing keys keep their init values).

    Shape mismatches are skipped with a warning: torch raises on size
    mismatch even with strict=False; silently adopting a wrong-shaped array
    would fail later (or worse, not at all)."""
    import warnings

    out = dict(full_sd)
    for k, v in loaded_sd.items():
        if k not in out:
            continue
        if np.shape(v) != np.shape(out[k]):
            warnings.warn(
                f"checkpoint key {k!r} has shape {np.shape(v)}, "
                f"model expects {np.shape(out[k])}; skipped"
            )
            continue
        out[k] = v
    return out


def _n(x):
    return np.asarray(x, dtype=np.float32)


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------


def _styled_from_sd(sd, prefix):
    return {
        "conv": {
            "weight": _j(sd[f"{prefix}.conv.weight"])[0],  # (1,o,i,k,k) -> (o,i,k,k)
            "modulation": {
                "weight": _j(sd[f"{prefix}.conv.modulation.weight"]),
                "bias": _j(sd[f"{prefix}.conv.modulation.bias"]),
            },
        },
        "noise_weight": _j(sd[f"{prefix}.noise.weight"]).reshape(()),
        "act_bias": _j(sd[f"{prefix}.activate.bias"]),
    }


def _styled_to_sd(p, prefix, out):
    out[f"{prefix}.conv.weight"] = _n(p["conv"]["weight"])[None]
    out[f"{prefix}.conv.modulation.weight"] = _n(p["conv"]["modulation"]["weight"])
    out[f"{prefix}.conv.modulation.bias"] = _n(p["conv"]["modulation"]["bias"])
    out[f"{prefix}.noise.weight"] = _n(p["noise_weight"]).reshape(1)
    out[f"{prefix}.activate.bias"] = _n(p["act_bias"])


def _torgb_from_sd(sd, prefix):
    return {
        "conv": {
            "weight": _j(sd[f"{prefix}.conv.weight"])[0],
            "modulation": {
                "weight": _j(sd[f"{prefix}.conv.modulation.weight"]),
                "bias": _j(sd[f"{prefix}.conv.modulation.bias"]),
            },
        },
        "bias": _j(sd[f"{prefix}.bias"]),
    }


def _torgb_to_sd(p, prefix, out):
    out[f"{prefix}.conv.weight"] = _n(p["conv"]["weight"])[None]
    out[f"{prefix}.conv.modulation.weight"] = _n(p["conv"]["modulation"]["weight"])
    out[f"{prefix}.conv.modulation.bias"] = _n(p["conv"]["modulation"]["bias"])
    out[f"{prefix}.bias"] = _n(p["bias"])


def generator_params_from_state_dict(cfg: GeneratorConfig, sd: Dict[str, np.ndarray]):
    params = {
        "style": [
            {
                "weight": _j(sd[f"style.{i+1}.weight"]),
                "bias": _j(sd[f"style.{i+1}.bias"]),
            }
            for i in range(cfg.n_mlp)
        ],
        "input": _j(sd["input.input"]),
        "conv1": _styled_from_sd(sd, "conv1"),
        "to_rgb1": _torgb_from_sd(sd, "to_rgb1"),
        "convs": [
            _styled_from_sd(sd, f"convs.{i}") for i in range(2 * (cfg.log_size - 2))
        ],
        "to_rgbs": [
            _torgb_from_sd(sd, f"to_rgbs.{i}") for i in range(cfg.log_size - 2)
        ],
        "noises": [
            _j(sd[f"noises.noise_{j}"]) for j in range(cfg.num_layers)
        ],
    }
    return params


def generator_state_dict_from_params(cfg: GeneratorConfig, params) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    for i, layer in enumerate(params["style"]):
        sd[f"style.{i+1}.weight"] = _n(layer["weight"])
        sd[f"style.{i+1}.bias"] = _n(layer["bias"])
    sd["input.input"] = _n(params["input"])
    _styled_to_sd(params["conv1"], "conv1", sd)
    _torgb_to_sd(params["to_rgb1"], "to_rgb1", sd)
    for i, p in enumerate(params["convs"]):
        _styled_to_sd(p, f"convs.{i}", sd)
    for i, p in enumerate(params["to_rgbs"]):
        _torgb_to_sd(p, f"to_rgbs.{i}", sd)
    for j, nz in enumerate(params["noises"]):
        sd[f"noises.noise_{j}"] = _n(nz)
    return sd


# ---------------------------------------------------------------------------
# Discriminator
# ---------------------------------------------------------------------------


def discriminator_params_from_state_dict(cfg: DiscriminatorConfig, sd: Dict[str, np.ndarray]):
    n_blocks = cfg.log_size - 2
    convs = [
        {
            "weight": _j(sd["convs.0.0.weight"]),
            "act_bias": _j(sd["convs.0.1.bias"]),
        }
    ]
    for b in range(1, n_blocks + 1):
        convs.append(
            {
                "conv1": {
                    "weight": _j(sd[f"convs.{b}.conv1.0.weight"]),
                    "act_bias": _j(sd[f"convs.{b}.conv1.1.bias"]),
                },
                "conv2": {
                    "weight": _j(sd[f"convs.{b}.conv2.1.weight"]),
                    "act_bias": _j(sd[f"convs.{b}.conv2.2.bias"]),
                },
                "skip": {"weight": _j(sd[f"convs.{b}.skip.1.weight"])},
            }
        )
    return {
        "convs": convs,
        "final_conv": {
            "weight": _j(sd["final_conv.0.weight"]),
            "act_bias": _j(sd["final_conv.1.bias"]),
        },
        "final_linear": [
            {
                "weight": _j(sd["final_linear.0.weight"]),
                "bias": _j(sd["final_linear.0.bias"]),
            },
            {
                "weight": _j(sd["final_linear.1.weight"]),
                "bias": _j(sd["final_linear.1.bias"]),
            },
        ],
    }


# ---------------------------------------------------------------------------
# torch.optim.Adam state_dict export (5-key checkpoint parity, `:644-659`)
# ---------------------------------------------------------------------------


def _adam_state_dict(entries, *, lr: float, betas) -> Dict:
    """torch.optim.Adam.state_dict() layout (torch 1.12 defaults):
    ``{state: {idx: {step, exp_avg, exp_avg_sq}}, param_groups: [...]}``.

    `entries`: list of (exp_avg_sq ndarray in the torch param's shape,
    step int), in the optimizer's param order.  Both reference optimizers use
    beta1 = 0**reg_ratio = 0 (`train_dynamic_update_prune.py:913-931`), so
    exp_avg is overwritten by the first resumed step (exp_avg = 0*old + grad)
    and zeros round-trip losslessly.
    """
    state = {
        i: {
            "step": int(step),
            "exp_avg": np.zeros_like(v),
            "exp_avg_sq": v,
        }
        for i, (v, step) in enumerate(entries)
    }
    return {
        "state": state,
        "param_groups": [
            {
                "lr": float(lr),
                "betas": (float(betas[0]), float(betas[1])),
                "eps": 1e-08,
                "weight_decay": 0,
                "amsgrad": False,
                "maximize": False,
                "foreach": None,
                "capturable": False,
                "params": list(range(len(entries))),
            }
        ],
    }


def g_optim_state_dict(cfg: GeneratorConfig, g_opt, *, lr: float, betas) -> Dict:
    """Export our per-leaf Adam state as the reference g_optim state dict.

    Param order = G named_parameters with 'convs' in the name
    (`train_dynamic_update_prune.py:908-917`), i.e. per StyledConv:
    conv.weight (5-D on the torch side), conv.modulation.weight/.bias,
    noise.weight (shape (1,)), activate.bias.
    """
    v_t, c_t = g_opt["v"], g_opt["count"]
    entries = []
    for i in range(2 * (cfg.log_size - 2)):
        v, c = v_t["convs"][i], c_t["convs"][i]
        entries += [
            (_n(v["conv"]["weight"])[None], int(c["conv"]["weight"])),
            (_n(v["conv"]["modulation"]["weight"]), int(c["conv"]["modulation"]["weight"])),
            (_n(v["conv"]["modulation"]["bias"]), int(c["conv"]["modulation"]["bias"])),
            (_n(v["noise_weight"]).reshape(1), int(c["noise_weight"])),
            (_n(v["act_bias"]), int(c["act_bias"])),
        ]
    return _adam_state_dict(entries, lr=lr, betas=betas)


def d_optim_state_dict(cfg: DiscriminatorConfig, d_opt, *, lr: float, betas) -> Dict:
    """Export our per-leaf Adam state as the reference d_optim state dict.

    Param order = D named_parameters with ('convs' in name and 'convs.0' not
    in name) or 'final' in name (`train_dynamic_update_prune.py:920-931`):
    per ResBlock conv1.0.weight, conv1.1.bias, conv2.1.weight, conv2.2.bias,
    skip.1.weight; then final_conv and final_linear.
    """
    v_t, c_t = d_opt["v"], d_opt["count"]
    entries = []
    for b in range(1, cfg.log_size - 1):
        v, c = v_t["convs"][b], c_t["convs"][b]
        entries += [
            (_n(v["conv1"]["weight"]), int(c["conv1"]["weight"])),
            (_n(v["conv1"]["act_bias"]), int(c["conv1"]["act_bias"])),
            (_n(v["conv2"]["weight"]), int(c["conv2"]["weight"])),
            (_n(v["conv2"]["act_bias"]), int(c["conv2"]["act_bias"])),
            (_n(v["skip"]["weight"]), int(c["skip"]["weight"])),
        ]
    entries += [
        (_n(v_t["final_conv"]["weight"]), int(c_t["final_conv"]["weight"])),
        (_n(v_t["final_conv"]["act_bias"]), int(c_t["final_conv"]["act_bias"])),
    ]
    for i in range(2):
        entries += [
            (_n(v_t["final_linear"][i]["weight"]), int(c_t["final_linear"][i]["weight"])),
            (_n(v_t["final_linear"][i]["bias"]), int(c_t["final_linear"][i]["bias"])),
        ]
    return _adam_state_dict(entries, lr=lr, betas=betas)


def discriminator_state_dict_from_params(cfg: DiscriminatorConfig, params) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    sd["convs.0.0.weight"] = _n(params["convs"][0]["weight"])
    sd["convs.0.1.bias"] = _n(params["convs"][0]["act_bias"])
    for b, block in enumerate(params["convs"][1:], start=1):
        sd[f"convs.{b}.conv1.0.weight"] = _n(block["conv1"]["weight"])
        sd[f"convs.{b}.conv1.1.bias"] = _n(block["conv1"]["act_bias"])
        sd[f"convs.{b}.conv2.1.weight"] = _n(block["conv2"]["weight"])
        sd[f"convs.{b}.conv2.2.bias"] = _n(block["conv2"]["act_bias"])
        sd[f"convs.{b}.skip.1.weight"] = _n(block["skip"]["weight"])
    sd["final_conv.0.weight"] = _n(params["final_conv"]["weight"])
    sd["final_conv.1.bias"] = _n(params["final_conv"]["act_bias"])
    for i, layer in enumerate(params["final_linear"]):
        sd[f"final_linear.{i}.weight"] = _n(layer["weight"])
        sd[f"final_linear.{i}.bias"] = _n(layer["bias"])
    return sd
