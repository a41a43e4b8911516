"""Checkpoint / resume.

Equivalent of the reference's per-iteration model checkpoints
(`$dir/<iter>.mdl`, cleanup keeping last-2 — `train.py:551-556`,
`common.py:653-684`) and warm-start via ``--trainer.input-model``
(`train.py:106-114`).  Checkpoints are self-describing: the full TrainState
pytree (params, architecture logits, BN stats, optimizer state, step) plus a
JSON config blob — which is what makes stage transitions (pretrain ->
cv-update -> child) plain function calls instead of the reference's
sed-on-text-model surgery.

Format: flattened pytree -> .npz (arrays) + .json (tree structure + meta).
No pickle => robust across versions and safe to load.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> Tuple[list, Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_checkpoint(directory: str, step: int, state, meta: Optional[dict] = None,
                    keep: int = 2) -> str:
    os.makedirs(directory, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    path = os.path.join(directory, f"ckpt_{step:08d}")
    np.savez(
        path + ".npz",
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )
    with open(path + ".json", "w") as f:
        json.dump(
            {"step": step, "num_leaves": len(leaves),
             "treedef": str(treedef), "meta": meta or {}},
            f,
        )
    _cleanup(directory, keep)
    return path


def _cleanup(directory: str, keep: int) -> None:
    """Keep the most recent `keep` checkpoints (preserve-interval semantics
    can be layered by callers)."""
    ckpts = sorted(
        int(m.group(1))
        for fn in os.listdir(directory)
        if (m := re.match(r"ckpt_(\d+)\.npz$", fn))
    )
    for s in ckpts[:-keep] if keep > 0 else []:
        for ext in (".npz", ".json"):
            try:
                os.remove(os.path.join(directory, f"ckpt_{s:08d}{ext}"))
            except FileNotFoundError:
                pass


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    ckpts = [
        int(m.group(1))
        for fn in os.listdir(directory)
        if (m := re.match(r"ckpt_(\d+)\.npz$", fn))
    ]
    return max(ckpts) if ckpts else None


def load_checkpoint(directory: str, like_state, step: Optional[int] = None):
    """Load into the structure of `like_state` (shapes/structure must match).

    Returns (state, step, meta).
    """
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {directory}")
    path = os.path.join(directory, f"ckpt_{step:08d}")
    with open(path + ".json") as f:
        info = json.load(f)
    data = np.load(path + ".npz")
    leaves_like, treedef = jax.tree_util.tree_flatten(like_state)
    if len(leaves_like) != info["num_leaves"]:
        raise ValueError(
            f"checkpoint has {info['num_leaves']} leaves, expected {len(leaves_like)}"
        )
    leaves = [data[f"leaf_{i}"] for i in range(info["num_leaves"])]
    for i, (got, want) in enumerate(zip(leaves, leaves_like)):
        if hasattr(want, "shape") and tuple(got.shape) != tuple(np.shape(want)):
            raise ValueError(f"leaf {i} shape {got.shape} != expected {np.shape(want)}")
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state, info["step"], info.get("meta", {})
