"""Debug tracer — the TPU-native replacement for the reference DebugLogger.

The reference (src/encoder-decoder/training/utils/debug_logger.py:29-398) is a
3-level, module-filterable logger with shape dumps, tensor stats, timers and
memory counters, with a documented 0-10% overhead budget (train.py:63-68).

On TPU everything under jit is traced once, so runtime logging must either be
trace-time (shapes: free) or `jax.debug.print` (costly). This tracer keeps the
same API surface, but:
- level 0: every call is a no-op that *compiles away entirely* (static flag);
- shape/section logging happens at trace time (zero runtime cost);
- tensor_stats/print use `jax.debug.print` only at level >= 2;
- timers block on device completion only outside jit.
"""
from __future__ import annotations

import os
import sys
import time
from contextlib import contextmanager
from typing import Any, Dict, Optional

import jax

_LEVEL_NAMES = {0: "OFF", 1: "INFO", 2: "DEBUG", 3: "TRACE"}


class DebugTracer:
    def __init__(self, level: Optional[int] = None,
                 modules: Optional[set] = None, sink=None):
        if level is None:
            level = int(os.environ.get("LVV_DEBUG", "0"))
        self.level = level
        self.modules = modules  # None = all
        self.sink = sink or sys.stderr
        self._timers: Dict[str, float] = {}
        self.counters: Dict[str, int] = {}

    def _on(self, level: int, module: str) -> bool:
        if self.level < level:
            return False
        return self.modules is None or module in self.modules

    def _emit(self, msg: str) -> None:
        print(msg, file=self.sink, flush=True)

    # ---- trace-time (free under jit) ----
    def shape(self, name: str, x: Any, module: str = "", level: int = 2) -> None:
        if self._on(level, module):
            shp = getattr(x, "shape", None)
            dt = getattr(x, "dtype", None)
            self._emit(f"[shape] {module}:{name} shape={shp} dtype={dt}")

    def section(self, name: str, module: str = "", level: int = 1) -> None:
        if self._on(level, module):
            self._emit(f"[=== {name} ===]")

    # ---- runtime (jax.debug.print; only traced in at level>=2) ----
    def tensor_stats(self, name: str, x, module: str = "", level: int = 3) -> None:
        if self._on(level, module):
            jax.debug.print(
                name + ": mean={m} std={s} min={mn} max={mx}",
                m=x.mean(), s=x.std(), mn=x.min(), mx=x.max())

    # ---- host-side timers (block on device; use outside jit) ----
    def start_timer(self, name: str) -> None:
        if self.level >= 1:
            self._timers[name] = time.perf_counter()

    def end_timer(self, name: str, module: str = "", block_on=None) -> float:
        if self.level < 1 or name not in self._timers:
            return 0.0
        if block_on is not None:
            jax.block_until_ready(block_on)
        dt = time.perf_counter() - self._timers.pop(name)
        if self._on(1, module):
            self._emit(f"[timer] {name}: {dt * 1e3:.2f} ms")
        return dt

    @contextmanager
    def timer(self, name: str, module: str = ""):
        self.start_timer(name)
        yield
        self.end_timer(name, module)

    def count(self, name: str, inc: int = 1) -> None:
        if self.level >= 1:
            self.counters[name] = self.counters.get(name, 0) + inc

    def memory_usage(self, tag: str = "") -> None:
        if self.level < 2:
            return
        try:
            for d in jax.local_devices():
                stats = d.memory_stats()
                if stats:
                    used = stats.get("bytes_in_use", 0) / 1e9
                    lim = stats.get("bytes_limit", 0) / 1e9
                    self._emit(f"[mem] {tag} {d}: {used:.2f}/{lim:.2f} GB")
        except Exception:
            pass


TRACER = DebugTracer()


def get_tracer() -> DebugTracer:
    return TRACER


def set_level(level: int) -> None:
    TRACER.level = level
