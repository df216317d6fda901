"""Checkpoint save/restore: params + opt_state + step + PRNG key.

The reference checkpoints only the score net's state_dict once at the end of
training and cannot resume the optimizer (SURVEY.md §5 'Checkpoint/resume';
main_diffusion_linear.py:47-50, utils.py:50-65).  Here a checkpoint captures
the full training state so resume is exact.

Format: a directory of .npz files (one per pytree) + a JSON manifest with
the treedef and step — dependency-light, portable, and mmap-friendly.
Orbax is available in the image but brings async machinery we don't need for
~2 MB states; the format here is deliberately simple and self-contained.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> Tuple[list, Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_pytree(path: str, tree, name: str) -> None:
    leaves, treedef = _flatten(tree)
    np.savez(
        os.path.join(path, f"{name}.npz"),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )
    with open(os.path.join(path, f"{name}.treedef.json"), "w") as f:
        json.dump(str(treedef), f)


def load_pytree(path: str, like, name: str):
    """Restore a pytree with the structure of ``like`` (an example pytree)."""
    data = np.load(os.path.join(path, f"{name}.npz"))
    leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    _, treedef = _flatten(like)
    return jax.tree_util.tree_unflatten(
        treedef, [jax.numpy.asarray(l) for l in leaves]
    )


def save_checkpoint(
    ckpt_dir: str,
    params,
    opt_state=None,
    step: int = 0,
    key: Optional[jax.Array] = None,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    os.makedirs(ckpt_dir, exist_ok=True)
    save_pytree(ckpt_dir, params, "params")
    manifest: Dict[str, Any] = {"step": int(step)}
    if opt_state is not None:
        save_pytree(ckpt_dir, opt_state, "opt_state")
        manifest["has_opt_state"] = True
    if key is not None:
        np.save(os.path.join(ckpt_dir, "prng_key.npy"), np.asarray(key))
        manifest["has_key"] = True
    if extra:
        manifest["extra"] = extra
    with open(os.path.join(ckpt_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)


def load_checkpoint(
    ckpt_dir: str, params_like, opt_state_like=None
) -> Dict[str, Any]:
    with open(os.path.join(ckpt_dir, "manifest.json")) as f:
        manifest = json.load(f)
    out: Dict[str, Any] = {
        "params": load_pytree(ckpt_dir, params_like, "params"),
        "step": manifest["step"],
        "extra": manifest.get("extra", {}),
    }
    if manifest.get("has_opt_state") and opt_state_like is not None:
        out["opt_state"] = load_pytree(ckpt_dir, opt_state_like, "opt_state")
    key_path = os.path.join(ckpt_dir, "prng_key.npy")
    if manifest.get("has_key") and os.path.exists(key_path):
        out["key"] = jax.numpy.asarray(np.load(key_path))
    return out
