"""Live scalar stream: per-step train-loss records as JSONL.

Parity target: the reference logs ``train_loss`` every step to TensorBoard via
Lightning's default logger (reference models.py:65, launcher.py:173-176). The
TPU trainer compiles whole epochs into one XLA program, so scalars stream out
at epoch boundaries: one JSON line per step, appended to ``scalars.jsonl`` in
the run directory. JSONL is grep/pandas-friendly and needs no TensorBoard
install; ``read_scalars`` reloads it for figures and tests.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

__all__ = ["ScalarLogger", "read_scalars"]


class ScalarLogger:
    """Append-only JSONL scalar writer; one line per (step, tag, value)."""

    def __init__(self, path: str):
        self.path = path
        d = os.path.dirname(os.path.abspath(path))
        os.makedirs(d, exist_ok=True)
        self._fh = open(path, "a", buffering=1)

    def log(self, step: int, tag: str, value: float, **extra) -> None:
        rec = {"step": int(step), "tag": tag, "value": float(value), **extra}
        self._fh.write(json.dumps(rec) + "\n")

    def log_epoch_losses(self, epoch: int, first_step: int, losses: np.ndarray,
                         tag: str = "train_loss") -> None:
        """Stream an epoch's per-step loss vector (reference models.py:65)."""
        lines = [
            json.dumps({"step": int(first_step + i), "epoch": int(epoch),
                        "tag": tag, "value": float(v)})
            for i, v in enumerate(np.asarray(losses).reshape(-1))
        ]
        self._fh.write("\n".join(lines) + "\n")

    def close(self) -> None:
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_scalars(path: str, tag: Optional[str] = None) -> List[Dict]:
    """Load a scalars.jsonl back into a list of records."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if tag is None or rec.get("tag") == tag:
                out.append(rec)
    return out
