"""Logger / timer utilities (rebuild of misc/logger_tool.py, misc/pyutils).

The Logger tees to ``log.txt`` in the checkpoint dir like the reference
(misc/logger_tool.py:5-30); the Timer reports images/sec and ETA like the
trainer's ``imps``/``est`` fields (models/trainer.py:136-142).
"""
from __future__ import annotations

import os
import sys
import time
from typing import Optional


class Logger:
    def __init__(self, path: Optional[str] = None):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path), exist_ok=True)

    def write(self, msg: str) -> None:
        sys.stdout.write(msg)
        sys.stdout.flush()
        if self.path:
            with open(self.path, "a") as f:
                f.write(msg)

    def write_dict(self, d: dict) -> None:
        self.write(" ".join(f"{k}: {v}" for k, v in d.items()) + "\n")


class Timer:
    def __init__(self):
        self.start = time.time()
        self.progress = 0.0

    def update_progress(self, p: float) -> None:
        self.progress = max(p, 1e-9)

    def elapsed(self) -> float:
        return time.time() - self.start

    def estimated_remaining_hours(self) -> float:
        e = self.elapsed()
        return e / self.progress * (1.0 - self.progress) / 3600.0

    def images_per_sec(self, n_images: int) -> float:
        return n_images / max(self.elapsed(), 1e-9)
