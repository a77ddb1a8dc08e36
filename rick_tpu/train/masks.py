"""Freeze / prune mask pytrees and their application.

The reference keeps python dicts of numpy filter indices and mutates
`param.grad` / `param` in-place every optimizer step
(`train_dynamic_update_prune.py:427-438,482-493,522-540,566-583`).  Here masks
are small per-filter float arrays (1.0 = selected) living in the TrainState;
application is pure tree surgery inside the jitted step.

Maskable leaves (exactly the reference's key sets):
  G (`:279-330`):  convs[b].conv.weight          -> out-filter axis
                   convs[b].conv.modulation.weight/bias -> in-channel axis
  D (`:332-384`):  convs[b].conv1/conv2 weight + act bias -> out-filter axis
                   convs[b].skip.weight          -> out-filter axis
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_g_masks(g_params):
    """Zero masks shaped per G maskable filter group."""
    blocks = []
    for b in g_params["convs"]:
        out_ch = b["conv"]["weight"].shape[0]
        in_ch = b["conv"]["weight"].shape[1]
        blocks.append(
            {
                "weight": jnp.zeros((out_ch,), jnp.float32),
                "mod_w": jnp.zeros((in_ch,), jnp.float32),
                "mod_b": jnp.zeros((in_ch,), jnp.float32),
            }
        )
    return {"convs": blocks}


def init_d_masks(d_params):
    blocks = []
    for blk in d_params["convs"][1:]:
        o1 = blk["conv1"]["weight"].shape[0]
        o2 = blk["conv2"]["weight"].shape[0]
        blocks.append(
            {
                "conv1_w": jnp.zeros((o1,), jnp.float32),
                "conv1_b": jnp.zeros((o1,), jnp.float32),
                "conv2_w": jnp.zeros((o2,), jnp.float32),
                "conv2_b": jnp.zeros((o2,), jnp.float32),
                "skip_w": jnp.zeros((o2,), jnp.float32),
            }
        )
    return {"convs": blocks}


def _zero_axis0(x, mask):
    """x * (1 - mask) broadcast on axis 0."""
    keep = (1.0 - mask).reshape((-1,) + (1,) * (x.ndim - 1))
    return x * keep


def mask_g_grads(grads, freeze, prune):
    """Zero G gradients of frozen/pruned filters (`:522-540`)."""
    g = dict(grads)
    convs = []
    for blk, f, p in zip(grads["convs"], freeze["convs"], prune["convs"]):
        blk = jax.tree.map(lambda x: x, blk)  # shallow copy
        kill_w = jnp.maximum(f["weight"], p["weight"])
        kill_mw = jnp.maximum(f["mod_w"], p["mod_w"])
        kill_mb = jnp.maximum(f["mod_b"], p["mod_b"])
        blk["conv"] = dict(blk["conv"])
        blk["conv"]["weight"] = _zero_axis0(blk["conv"]["weight"], kill_w)
        blk["conv"]["modulation"] = {
            "weight": _zero_axis0(blk["conv"]["modulation"]["weight"], kill_mw),
            "bias": _zero_axis0(blk["conv"]["modulation"]["bias"], kill_mb),
        }
        convs.append(blk)
    g["convs"] = convs
    return g


def prune_g_params(params, prune):
    """Zero pruned G filters in the params themselves (`:531-537`)."""
    out = dict(params)
    convs = []
    for blk, p in zip(params["convs"], prune["convs"]):
        blk = dict(blk)
        blk["conv"] = dict(blk["conv"])
        blk["conv"]["weight"] = _zero_axis0(blk["conv"]["weight"], p["weight"])
        blk["conv"]["modulation"] = {
            "weight": _zero_axis0(blk["conv"]["modulation"]["weight"], p["mod_w"]),
            "bias": _zero_axis0(blk["conv"]["modulation"]["bias"], p["mod_b"]),
        }
        convs.append(blk)
    out["convs"] = convs
    return out


def mask_d_grads(grads, freeze, prune):
    """Zero D gradients of frozen/pruned filters (`:427-438`)."""
    g = dict(grads)
    new_convs = [grads["convs"][0]]
    for blk, f, p in zip(grads["convs"][1:], freeze["convs"], prune["convs"]):
        blk = dict(blk)
        blk["conv1"] = {
            "weight": _zero_axis0(blk["conv1"]["weight"], jnp.maximum(f["conv1_w"], p["conv1_w"])),
            "act_bias": _zero_axis0(blk["conv1"]["act_bias"], jnp.maximum(f["conv1_b"], p["conv1_b"])),
        }
        blk["conv2"] = {
            "weight": _zero_axis0(blk["conv2"]["weight"], jnp.maximum(f["conv2_w"], p["conv2_w"])),
            "act_bias": _zero_axis0(blk["conv2"]["act_bias"], jnp.maximum(f["conv2_b"], p["conv2_b"])),
        }
        blk["skip"] = {"weight": _zero_axis0(blk["skip"]["weight"], jnp.maximum(f["skip_w"], p["skip_w"]))}
        new_convs.append(blk)
    g["convs"] = new_convs
    return g


def prune_d_params(params, prune):
    out = dict(params)
    new_convs = [params["convs"][0]]
    for blk, p in zip(params["convs"][1:], prune["convs"]):
        blk = dict(blk)
        blk["conv1"] = {
            "weight": _zero_axis0(blk["conv1"]["weight"], p["conv1_w"]),
            "act_bias": _zero_axis0(blk["conv1"]["act_bias"], p["conv1_b"]),
        }
        blk["conv2"] = {
            "weight": _zero_axis0(blk["conv2"]["weight"], p["conv2_w"]),
            "act_bias": _zero_axis0(blk["conv2"]["act_bias"], p["conv2_b"]),
        }
        blk["skip"] = {"weight": _zero_axis0(blk["skip"]["weight"], p["skip_w"])}
        new_convs.append(blk)
    out["convs"] = new_convs
    return out


def merge_prune(old, new):
    """Monotonic accumulation of prune masks (`zero_idx_merge`, `:138-144`):
    logical OR."""
    return jax.tree.map(lambda a, b: jnp.maximum(a, b), old, new)


# ---------------------------------------------------------------------------
# Trainable / warmup-active structure flags (python-float pytrees; they become
# compile-time constants or cheap scalars)
# ---------------------------------------------------------------------------


def g_trainable_tree(g_params):
    """1.0 for leaves the G optimizer owns: everything under `convs`
    (`train_dynamic_update_prune.py:908-917`)."""
    tree = jax.tree.map(lambda _: 0.0, g_params)
    tree["convs"] = jax.tree.map(lambda _: 1.0, g_params["convs"])
    return tree


def d_trainable_tree(d_params):
    """1.0 for D leaves optimized: convs except convs.0, plus final*
    (`:920-931`)."""
    tree = jax.tree.map(lambda _: 0.0, d_params)
    tree["convs"] = [jax.tree.map(lambda _: 0.0, d_params["convs"][0])] + [
        jax.tree.map(lambda _: 1.0, b) for b in d_params["convs"][1:]
    ]
    tree["final_conv"] = jax.tree.map(lambda _: 1.0, d_params["final_conv"])
    tree["final_linear"] = jax.tree.map(lambda _: 1.0, d_params["final_linear"])
    return tree


def d_final_tree(d_params):
    """1.0 only on final* leaves -- the warmup-trainable set (`:201-208`)."""
    tree = jax.tree.map(lambda _: 0.0, d_params)
    tree["final_conv"] = jax.tree.map(lambda _: 1.0, d_params["final_conv"])
    tree["final_linear"] = jax.tree.map(lambda _: 1.0, d_params["final_linear"])
    return tree
