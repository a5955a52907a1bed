"""Orbax checkpointing for params / optimizer state / patches.

Capability parity (SURVEY.md §5 checkpoint/resume):
* detector checkpoint load (the reference torch.load's .tar/.pth at
  /root/reference/attack/DSGN/pgd_attack.py:142-145,
  /root/reference/attack/Stereo-RCNN/pgd_attack.py:94-97 — see
  utils.torch_import for ingesting those);
* patch save/resume per epoch (npy; attack.patch keeps that format);
* periodic classifier epoch checkpoints with optimizer state
  (/root/reference/driving_constraint/train.py:116-124).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a pytree (params / {params, opt_state, epoch} / ...)."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)


def restore_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree; `template` (matching structure/dtypes) is
    recommended for exact array restoration."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        return ckptr.restore(path, item=template)
    return ckptr.restore(path)


def latest_epoch_dir(base_dir: str, prefix: str = "epoch") -> Optional[str]:
    """The reference resumes patches from the highest epochN dir
    (patch_attack.py:220-234); same discovery for orbax checkpoints."""
    if not os.path.isdir(base_dir):
        return None
    best, best_n = None, -1
    for name in os.listdir(base_dir):
        if name.startswith(prefix):
            try:
                n = int(name[len(prefix):])
            except ValueError:
                continue
            if n > best_n:
                best, best_n = os.path.join(base_dir, name), n
    return best
