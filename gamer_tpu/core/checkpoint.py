"""Checkpoint save/restore via orbax.

Replaces the reference's three checkpoint formats (HF Trainer dirs, RQVAE
custom dicts, discriminative state_dicts — SURVEY.md section 5.4) with one:
an orbax PyTree checkpoint per tag ("best", "last", "best_collision", ...),
plus a JSON sidecar with step/metric metadata. Keeps the reference's
best-metric / best-collision semantics.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from gamer_tpu.core.logging import get_logger, process_index

logger = get_logger("checkpoint")


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    def _path(self, tag: str) -> str:
        return os.path.join(self.directory, tag)

    def save(self, tag: str, tree: Any, metadata: dict | None = None) -> None:
        if process_index() != 0:
            return
        path = self._path(tag)
        tree = jax.tree_util.tree_map(np.asarray, tree)
        self._ckptr.save(path, tree, force=True)
        if metadata is not None:
            with open(path + ".meta.json", "w") as f:
                json.dump(metadata, f, indent=2, default=str)
        logger.info("Saved checkpoint %s", path)

    def restore(self, tag: str, template: Any | None = None) -> Any:
        path = self._path(tag)
        if template is not None:
            template = jax.tree_util.tree_map(np.asarray, template)
            return self._ckptr.restore(path, item=template)
        return self._ckptr.restore(path)

    def metadata(self, tag: str) -> dict | None:
        p = self._path(tag) + ".meta.json"
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return None

    def exists(self, tag: str) -> bool:
        return os.path.exists(self._path(tag))
