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
import re
import shutil
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

_EPOCH_DIR = re.compile(r"^checkpoint_(\d{4})$")


def _barrier(name: str) -> None:
    """Global process barrier; no-op single-process."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def _link_tree(src: str, dst: str) -> None:
    """Duplicate an orbax checkpoint dir via hard links (O(1) data copies;
    the files are immutable once written). Falls back to a real copy on
    filesystems without hard links."""
    try:
        shutil.copytree(src, dst, copy_function=os.link)
    except OSError:
        shutil.rmtree(dst, ignore_errors=True)
        shutil.copytree(src, dst)


class CheckpointManager:
    def __init__(self, output_dir: str, max_to_keep: Optional[int] = None):
        self.output_dir = osp.abspath(output_dir)
        self.max_to_keep = max_to_keep
        os.makedirs(self.output_dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, tag) -> str:
        return osp.join(self.output_dir, f"checkpoint_{tag}")

    def save(self, tree: Any, *, epoch: int, config: Optional[dict] = None,
             is_best: bool = False, metrics: Optional[dict] = None,
             keep_epoch: bool = True):
        """Save pytree + JSON sidecar (config, epoch, metrics).

        The tree is written ONCE (to the epoch-tagged dir); 'latest' and
        'best' are hard-linked from it — the reference's
        checkpoint.pt/checkpoint_{epoch}.pt/checkpoint_best.pt contract
        (reference distributed.py:61-73, main_pretrain.py:388-403) without
        the 2-3× write amplification. ``keep_epoch=False`` drops the
        epoch-tagged copy after linking (reference ``--save-freq``
        semantics). jax.Arrays (possibly sharded) are passed straight to
        orbax, which saves per-shard — no host gather.

        Multi-host contract: ``is_best``/``metrics``/``epoch`` must be
        GLOBALLY CONSISTENT — only process 0's values drive the sidecar,
        best/latest links, and pruning. Divergence cannot deadlock (the
        collective part is the orbax save itself) but would silently
        mislink checkpoint_best, so compute the metric from replicated
        arrays (as every CLI here does) or all-reduce it first."""
        meta = {"epoch": epoch, "config": config or {},
                "metrics": metrics or {}}
        primary = self._path(f"{epoch:04d}")
        # Multi-host: every process enters self._ckpt.save (orbax
        # coordinates primary-writes + per-host shard writes and has its
        # own internal barrier); the surrounding filesystem bookkeeping
        # (rmtree / sidecar / hard links / pruning) is process-0 only,
        # fenced by global barriers so no host races past a half-written
        # checkpoint into e.g. an auto-resume.
        is_primary = jax.process_index() == 0
        if is_primary and osp.exists(primary):
            shutil.rmtree(primary)
        _barrier("ckpt_pre_save")
        self._ckpt.save(primary, tree)
        self._ckpt.wait_until_finished()
        if is_primary:
            with open(primary + ".json", "w") as f:
                json.dump(meta, f)
            for tag in ["latest"] + (["best"] if is_best else []):
                path = self._path(tag)
                if osp.exists(path):
                    shutil.rmtree(path)
                _link_tree(primary, path)
                shutil.copyfile(primary + ".json", path + ".json")
            if not keep_epoch:
                shutil.rmtree(primary, ignore_errors=True)
                os.remove(primary + ".json")
            self._prune()
        _barrier("ckpt_post_save")

    def _prune(self):
        """Keep only the newest ``max_to_keep`` epoch-tagged checkpoints
        ('latest'/'best' survive — hard links keep their data alive)."""
        if not self.max_to_keep:
            return
        epochs = sorted(
            d for d in os.listdir(self.output_dir)
            if _EPOCH_DIR.match(d) and osp.isdir(osp.join(self.output_dir, d)))
        for d in epochs[:-self.max_to_keep]:
            shutil.rmtree(osp.join(self.output_dir, d), ignore_errors=True)
            try:
                os.remove(osp.join(self.output_dir, d + ".json"))
            except FileNotFoundError:
                pass

    def latest_path(self) -> Optional[str]:
        p = self._path("latest")
        return p if osp.exists(p) else None

    def restore(self, target: Any, tag: str = "latest") -> tuple[Any, dict]:
        """Restore into the structure of ``target``; returns
        (tree, metadata). ``tag`` is either a bare tag ('latest', 'best',
        an epoch tag) resolved inside ``output_dir``, or a filesystem
        path to a checkpoint dir — absolute, or relative to the CWD if
        it contains a path separator (so ``--resume runs/a/foo`` is not
        silently rewritten to ``output_dir/checkpoint_runs/a/foo``)."""
        if osp.isabs(tag) or os.sep in tag:
            path = osp.abspath(tag)
        else:
            path = self._path(tag)
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
