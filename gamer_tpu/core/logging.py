"""Process-aware logging.

Replaces the reference's loguru setup (ref: SeqRec/utils/logging.py:18-126):
per-task log files under logs/<task>/<timestamp>.log, rank-0 filtering for
multi-host runs, and a metric stream written as JSONL (the wandb-equivalent
observable; see gamer_tpu/core/metrics.py for the writer).
"""

from __future__ import annotations

import logging
import os
import sys
import time

_FORMAT = "%(asctime)s | %(levelname)-7s | %(name)s:%(lineno)d - %(message)s"
_configured = False


def process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return int(os.environ.get("PROCESS_INDEX", 0))


def setup_logging(task: str | None = None, log_dir: str = "logs", level: int = logging.INFO) -> None:
    """Configure root logging once: stderr + optional per-task file, rank 0 only writes."""
    global _configured
    root = logging.getLogger("gamer_tpu")
    if _configured:
        return
    root.setLevel(level)
    is_primary = process_index() == 0

    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter(_FORMAT))
    if not is_primary:
        handler.setLevel(logging.WARNING)
    root.addHandler(handler)

    if task is not None and is_primary:
        path = os.path.join(log_dir, task)
        os.makedirs(path, exist_ok=True)
        stamp = time.strftime("%Y-%m-%d_%H-%M-%S")
        fh = logging.FileHandler(os.path.join(path, f"{stamp}.log"))
        fh.setFormatter(logging.Formatter(_FORMAT))
        root.addHandler(fh)
    _configured = True


def get_logger(name: str = "gamer_tpu") -> logging.Logger:
    if not name.startswith("gamer_tpu"):
        name = f"gamer_tpu.{name}"
    return logging.getLogger(name)
