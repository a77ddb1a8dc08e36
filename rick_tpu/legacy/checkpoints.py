"""CheckpointIO: registered-pytree save/load (`gan_training/checkpoints.py:8-97`).

The torch version registers modules/optimizers and (de)serializes their state
dicts; here any named pytree registers and round-trips through the native
npz format (URL loading from the reference is out of scope in a zero-egress
environment and raises)."""

from __future__ import annotations

import os
from typing import Any, Dict

from rick_tpu.ckpt.native import load_state, save_state


class CheckpointIO:
    def __init__(self, checkpoint_dir: str = "./chkpts"):
        self.module_dict: Dict[str, Any] = {}
        self.checkpoint_dir = checkpoint_dir
        os.makedirs(checkpoint_dir, exist_ok=True)

    def register_modules(self, **kwargs):
        self.module_dict.update(kwargs)

    def save(self, filename: str, **scalars):
        if not os.path.isabs(filename):
            filename = os.path.join(self.checkpoint_dir, filename)
        save_state(filename, self.module_dict, step=int(scalars.pop("it", 0)), extra=scalars)

    def load(self, filename: str):
        if filename.startswith("http"):
            raise IOError("URL checkpoint loading is unavailable (zero-egress environment)")
        if not os.path.isabs(filename):
            filename = os.path.join(self.checkpoint_dir, filename)
        state, manifest = load_state(filename, self.module_dict)
        self.module_dict.update(state)
        return manifest
