"""Native checkpointing: the FULL training state (params, EMA, per-leaf Adam
state, freeze/prune masks, ADA/path scalars) for true resume -- a capability
the reference lacks (`SURVEY.md` par. 5: `args.start_iter` is never restored).

Format: a single .npz whose keys are '/'-joined tree paths, plus a JSON
manifest of scalar metadata.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def save_state(path: str, state, *, step: int, extra: Dict[str, Any] | None = None):
    """Atomic (tmp + rename): a kill mid-save never leaves a truncated .npz
    for --auto_resume to trip over.

    The manifest is embedded IN the npz (`__manifest__` key) so that a kill
    between the npz rename and the sidecar-json rename cannot leave a step-N
    npz whose step reads as 0 (which would make --auto_resume replay the whole
    run with step-N weights).  The sidecar json is still written for humans.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(state)
    manifest = {"step": step, **(extra or {})}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:  # file handle: avoids np.savez's .npz suffixing
        np.savez(
            f,
            __manifest__=np.frombuffer(json.dumps(manifest).encode(), dtype=np.uint8),
            **flat,
        )
    os.replace(tmp, path)
    with open(path + ".json.tmp", "w") as f:
        json.dump(manifest, f)
    os.replace(path + ".json.tmp", path + ".json")


def load_state(path: str, state_template) -> Tuple[Any, Dict[str, Any]]:
    """Restore into the structure of `state_template` (same treedef)."""
    data = np.load(path)
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(state_template)
    new_leaves = []
    for p, leaf in leaves_with_path:
        key = "/".join(str(getattr(q, "key", getattr(q, "idx", q))) for q in p)
        arr = data[key]
        new_leaves.append(jax.numpy.asarray(arr))
    state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    manifest = {}
    if "__manifest__" in data:  # authoritative: written atomically with the leaves
        manifest = json.loads(bytes(data["__manifest__"]).decode())
    elif os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            manifest = json.load(f)
    if "step" not in manifest:
        # last-resort fallback for pre-manifest-embedding checkpoints whose
        # sidecar json was lost: parse {step:06d}.state.npz
        base = os.path.basename(path)
        if base.endswith(".state.npz") and base[:-10].isdigit():
            manifest["step"] = int(base[:-10])
    return state, manifest
