"""Checkpointing via Orbax.

Reference behaviour (torch.save of a best-by-val-loss dict,
MRI_PET_OT.py:1115-1129; partial ``strict=False`` backbone restore,
attn:509-511): here the best checkpoint is an Orbax PyTree checkpoint of
{params, batch_stats, opt_state-free metadata}; ``restore_backbone``
grafts a pretrained unimodal backbone's parameters into a fusion model's
``mri_backbone``/``pet_backbone`` subtree — the TPU-native analogue of the
reference's --mri-pretrained/--pet-pretrained flags.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(
    directory: str | Path,
    state,
    metadata: Dict[str, Any] | None = None,
) -> None:
    """Write params/batch_stats (+ JSON metadata) under ``directory``."""
    directory = Path(directory).resolve()
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
    }
    if directory.exists():
        import shutil

        shutil.rmtree(directory)
    ckptr.save(directory, payload)
    ckptr.wait_until_finished()
    if metadata is not None:
        with open(directory.parent / (directory.name + ".meta.json"), "w") as f:
            json.dump(metadata, f, indent=2, default=float)


def restore_checkpoint(directory: str | Path, state):
    """Restore params/batch_stats into ``state`` (shapes must match)."""
    directory = Path(directory).resolve()
    ckptr = ocp.StandardCheckpointer()
    target = {
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
    }
    restored = ckptr.restore(directory, target)
    return state.replace(
        params=restored["params"], batch_stats=restored["batch_stats"]
    )


def restore_backbone(
    state,
    backbone_ckpt_dir: str | Path,
    target_module: str,
    source_module: str = "backbone",
):
    """Graft a pretrained classifier's backbone into a fusion state.

    ``backbone_ckpt_dir`` holds a ResNet3DClassifier checkpoint (whose
    backbone lives under ``source_module``); its parameters and batch
    stats replace ``state.params[target_module]`` (e.g. "mri_backbone").
    """
    directory = Path(backbone_ckpt_dir).resolve()
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(directory)  # raw pytree, no target
    new_params = dict(state.params)
    new_params[target_module] = restored["params"][source_module]
    new_stats = dict(state.batch_stats)
    new_stats[target_module] = restored["batch_stats"][source_module]
    return state.replace(params=new_params, batch_stats=new_stats)
