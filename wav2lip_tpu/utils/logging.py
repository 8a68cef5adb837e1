"""Structured metrics logging.

The reference logs via tqdm postfix strings only (SURVEY.md §5). Here every
trainer can emit machine-readable JSONL alongside console lines, giving
resumable training runs an inspectable history.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import IO, Dict, Optional


class MetricsLogger:
    def __init__(self, jsonl_path: Optional[str] = None,
                 stream: IO = sys.stdout, enabled: bool = True):
        """``enabled=False`` makes every call a no-op — used by non-primary
        processes in multi-host training so N processes don't interleave
        writes into one JSONL/console."""
        self.enabled = enabled
        self.stream = stream
        self._file: Optional[IO] = None
        if jsonl_path and enabled:
            os.makedirs(os.path.dirname(os.path.abspath(jsonl_path)),
                        exist_ok=True)
            self._file = open(jsonl_path, "a")

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "train"):
        if not self.enabled:
            return
        rec = {"ts": time.time(), "step": step, "prefix": prefix,
               **{k: float(v) for k, v in metrics.items()}}
        if self._file:
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()
        parts = " ".join(f"{k}={float(v):.5f}" for k, v in metrics.items())
        print(f"[{prefix} @{step}] {parts}", file=self.stream)

    def close(self):
        if self._file:
            self._file.close()
            self._file = None
