"""Checkpoint save/restore with tagging + pruning (Orbax).

Replaces the reference's per-component torch files + training_state with RNG
capture (training/utils/checkpoints.py:12-192): here the whole train state
{params, opt_state, step, rng} is ONE pytree checkpoint (the JAX idiom —
params already partition by component at the tree's top level), the config
embeds alongside it, and the same `latest` / `step{N}` / keep-last-N-plus-
best policy applies (reference :149-192 prune_checkpoints_steps).
"""
from __future__ import annotations

import json
import pathlib
import re
import shutil
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .. import config as config_lib

STEP_RE = re.compile(r"^step_(\d+)$")


class CheckpointManager:
    def __init__(self, directory: str, keep_last: int = 3):
        self.dir = pathlib.Path(directory).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.keep_last = keep_last
        self._ckptr = ocp.StandardCheckpointer()

    # -------- save --------

    def save(self, state: Any, *, step: int, tag: Optional[str] = None,
             cfg=None, is_best: bool = False) -> pathlib.Path:
        name = tag or f"step_{step}"
        path = self.dir / name
        if path.exists():
            shutil.rmtree(path)
        self._ckptr.save(path / "state", state)
        self._ckptr.wait_until_finished()
        meta = {"step": int(step)}
        (path / "meta.json").write_text(json.dumps(meta))
        if cfg is not None:
            config_lib.save(cfg, path / "config.json")
        if is_best:
            (self.dir / "best.json").write_text(json.dumps(
                {"name": name, "step": int(step)}))
        self._prune()
        return path

    def _prune(self) -> None:
        """Keep the newest `keep_last` step_N dirs plus tagged/best ones
        (reference prune_checkpoints_steps :149-192)."""
        best = None
        best_file = self.dir / "best.json"
        if best_file.exists():
            best = json.loads(best_file.read_text()).get("name")
        steps = sorted(
            (int(STEP_RE.match(p.name).group(1)), p)
            for p in self.dir.iterdir()
            if p.is_dir() and STEP_RE.match(p.name))
        for _, p in steps[:-self.keep_last] if self.keep_last else []:
            if p.name != best:
                shutil.rmtree(p)

    # -------- restore --------

    def available(self):
        out = []
        for p in self.dir.iterdir():
            if p.is_dir() and (p / "state").exists():
                m = STEP_RE.match(p.name)
                step = int(m.group(1)) if m else -1
                meta = p / "meta.json"
                if meta.exists():
                    step = json.loads(meta.read_text()).get("step", step)
                out.append((step, p.name))
        return sorted(out)

    def latest(self) -> Optional[str]:
        if (self.dir / "latest" / "state").exists():
            return "latest"
        avail = self.available()
        return avail[-1][1] if avail else None

    def restore(self, name: str, target: Any) -> Any:
        """Restore into the structure of `target` (abstract or concrete).
        Skips corrupt checkpoints by raising; callers fall back over
        `available()` (reference tools/train.py:149-161 newest-loadable)."""
        path = self.dir / name / "state"
        return self._ckptr.restore(path, target)

    def try_restore_newest(self, target: Any):
        """-> (state, step) from the newest loadable checkpoint, else
        (None, 0)."""
        names = [n for _, n in reversed(self.available())]
        lt = self.latest()
        if lt and lt in names:
            names.remove(lt)
            names.insert(0, lt)
        for name in names:
            try:
                state = self.restore(name, target)
                meta = self.dir / name / "meta.json"
                step = (json.loads(meta.read_text()).get("step", 0)
                        if meta.exists() else 0)
                return state, step
            except Exception as e:  # corrupt -> try next
                print(f"[ckpt] skipping {name}: {e}")
        return None, 0
