"""Checkpoint save/restore via Orbax + torch-format import.

Replaces the reference's torch.save dict {epoch_id, best_val_acc,
best_epoch_id, model_G_state_dict, optimizer_G_state_dict,
exp_lr_scheduler_G_state_dict} (models/trainer.py:150-158) with an Orbax
pytree checkpoint of the TrainState plus a JSON metadata sidecar carrying
the same bookkeeping fields.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, name: str, state: Any, metadata: dict) -> None:
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    with open(path + ".meta.json", "w") as f:
        json.dump(metadata, f)


def _load_meta(path: str) -> dict:
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            return json.load(f)
    return {}


def load_checkpoint(ckpt_dir: str, name: str, target: Any
                    ) -> Optional[Tuple[Any, dict]]:
    """Restore into the structure of ``target``; None if absent. The target
    must match the saved tree structure (trainer resume path)."""
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    if not os.path.exists(path):
        return None
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path, item=jax.device_get(target))
    return restored, _load_meta(path)


def load_checkpoint_raw(ckpt_dir: str, name: str
                        ) -> Optional[Tuple[dict, dict]]:
    """Structure-free restore (nested dicts/lists of numpy arrays). Lets an
    evaluator load params/batch_stats without reconstructing the trainer's
    optimizer-state pytree — the analog of the reference's state_dict
    key-filtering loads (xBD_code/train.py:450-456)."""
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    if not os.path.exists(path):
        return None
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(path), _load_meta(path)
