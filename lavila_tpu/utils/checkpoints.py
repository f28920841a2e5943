"""Checkpoint manager: orbax + embedded run config + auto-resume.

Reference contract being matched (reference: lavila/utils/distributed.py:
61-73, main_pretrain.py:224-256, 394-403; eval_zeroshot.py:68-97):

  * ``save`` writes the rolling 'latest' checkpoint, an epoch-tagged copy,
    and a 'best' copy when indicated;
  * the run config (args) is EMBEDDED in the checkpoint so downstream
    scripts rebuild the exact model from the checkpoint alone
    ("checkpoint-as-config");
  * auto-resume: if the output dir already holds a checkpoint, resume
    from it — this OVERRIDES any --resume path.

ZeRO note: optimizer state is a pytree sharded like the params, and orbax
saves per-shard — the reference's ``consolidate_state_dict`` dance
disappears.
"""

from __future__ import annotations

import json
import os
import os.path as osp
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, output_dir: str, max_to_keep: Optional[int] = None):
        self.output_dir = osp.abspath(output_dir)
        os.makedirs(self.output_dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, tag) -> str:
        return osp.join(self.output_dir, f"checkpoint_{tag}")

    def save(self, tree: Any, *, epoch: int, config: Optional[dict] = None,
             is_best: bool = False, metrics: Optional[dict] = None):
        """Save pytree + JSON sidecar (config, epoch, metrics)."""
        tree = jax.tree.map(np.asarray, tree)
        meta = {"epoch": epoch, "config": config or {},
                "metrics": metrics or {}}
        for tag in ([f"{epoch:04d}", "latest"]
                    + (["best"] if is_best else [])):
            path = self._path(tag)
            if osp.exists(path):
                import shutil
                shutil.rmtree(path)
            self._ckpt.save(path, tree)
            self._ckpt.wait_until_finished()
            with open(path + ".json", "w") as f:
                json.dump(meta, f)

    def latest_path(self) -> Optional[str]:
        p = self._path("latest")
        return p if osp.exists(p) else None

    def restore(self, target: Any, tag: str = "latest") -> tuple[Any, dict]:
        """Restore into the structure of ``target``; returns
        (tree, metadata)."""
        path = self._path(tag) if not osp.isabs(tag) else tag
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype)
            if hasattr(x, "dtype") else x, target)
        tree = self._ckpt.restore(path, abstract)
        meta = {}
        if osp.exists(path + ".json"):
            with open(path + ".json") as f:
                meta = json.load(f)
        return tree, meta


def resolve_resume(output_dir: str, resume: Optional[str]) -> Optional[str]:
    """Auto-resume rule: a checkpoint in output_dir wins over --resume
    (reference main_pretrain.py:225-227)."""
    latest = osp.join(osp.abspath(output_dir), "checkpoint_latest")
    if osp.exists(latest):
        return latest
    return resume
