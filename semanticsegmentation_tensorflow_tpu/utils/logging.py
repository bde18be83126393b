"""Metrics logging: JSONL always, TensorBoard when available.

The reference prints per-batch loss to stdout and nothing else (SURVEY.md
§5). Here every scalar goes to a machine-readable JSONL stream (and to
TensorBoard if tensorboardX is importable in the environment; it is gated,
never required).
"""

from __future__ import annotations

import json
import os
import time
from typing import Mapping

try:  # optional
    from tensorboardX import SummaryWriter  # type: ignore
except Exception:  # pragma: no cover - environment dependent
    SummaryWriter = None


class MetricsLogger:
    def __init__(self, log_dir: str, name: str = "train"):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, f"{name}.jsonl"), "a", buffering=1)
        self._tb = (SummaryWriter(os.path.join(log_dir, "tb"))
                    if SummaryWriter is not None else None)

    def log(self, step: int, scalars: Mapping[str, float]) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), int(step))

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
