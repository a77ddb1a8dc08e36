"""Checkpoint layer: torch `.pt` interop (no torch dependency) + converters.

The reference consumes/produces rosinality-format checkpoints -- a torch
zip-serialized pickle of `OrderedDict[str, Tensor]` with keys like
`convs.0.conv.weight` (`train_dynamic_update_prune.py:644-659,871-879`).
`torch_io` reads and writes that format with only the stdlib;
`convert` maps state dicts to/from rick-tpu parameter pytrees.
"""

from rick_tpu.ckpt.torch_io import load_torch_file, save_torch_file
from rick_tpu.ckpt.convert import (
    generator_params_from_state_dict,
    generator_state_dict_from_params,
    discriminator_params_from_state_dict,
    discriminator_state_dict_from_params,
    g_optim_state_dict,
    d_optim_state_dict,
)

__all__ = [
    "load_torch_file",
    "save_torch_file",
    "generator_params_from_state_dict",
    "generator_state_dict_from_params",
    "discriminator_params_from_state_dict",
    "discriminator_state_dict_from_params",
    "g_optim_state_dict",
    "d_optim_state_dict",
]
