"""Stdout tee + rank-0 logging (reference training/utils/logging.py:7-47,
pcdet common_utils.py:103-117)."""
from __future__ import annotations

import pathlib
import sys
from typing import Optional, TextIO

import jax


class Tee:
    """Duplicate stdout/stderr writes into a log file."""

    def __init__(self, log_path: str, stream: Optional[TextIO] = None):
        self.stream = stream or sys.stdout
        pathlib.Path(log_path).parent.mkdir(parents=True, exist_ok=True)
        self.file = open(log_path, "a", buffering=1)

    def write(self, data: str) -> int:
        self.stream.write(data)
        self.file.write(data)
        return len(data)

    def flush(self) -> None:
        self.stream.flush()
        self.file.flush()

    def close(self) -> None:
        self.file.close()

    def __enter__(self):
        self._saved = sys.stdout
        sys.stdout = self
        return self

    def __exit__(self, *exc):
        sys.stdout = self._saved
        self.close()


def is_host_zero() -> bool:
    return jax.process_index() == 0


def log0(*args, **kwargs) -> None:
    """Print only on host 0 (multi-host safe)."""
    if is_host_zero():
        print(*args, **kwargs)


class AverageMeter:
    """Running average (reference common_utils.py AverageMeter)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = self.sum = self.count = self.avg = 0.0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)
