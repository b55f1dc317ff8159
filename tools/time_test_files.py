#!/usr/bin/env python
"""Per-file pytest timing sweep -> tests/FILE_TIMINGS.json.

The full suite (500+ tests) cannot run whole on a 1-core host, so the
tiered suite (conftest.pytest_collection_modifyitems) classifies files as
fast/slow from this sweep: a file whose whole-file wall time exceeds
--fast-budget seconds (default 18) lands in the slow tier. Re-run after
adding heavyweight test files:

    python tools/time_test_files.py            # full sweep (slow!)
    python tools/time_test_files.py tests/test_new_thing.py   # update one
"""
from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT = ROOT / "tests" / "FILE_TIMINGS.json"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*",
                    help="test files to (re)time; default: all")
    ap.add_argument("--fast-budget", type=float, default=18.0,
                    help="whole-file seconds above which a file is slow")
    ap.add_argument("--timeout", type=float, default=600.0)
    args = ap.parse_args()

    files = [pathlib.Path(f) for f in args.files] or \
        sorted((ROOT / "tests").glob("test_*.py"))
    data = json.loads(OUT.read_text()) if OUT.exists() else {}

    for f in files:
        t0 = time.monotonic()
        try:
            r = subprocess.run(
                [sys.executable, "-m", "pytest", str(f), "-q",
                 "--no-header", "-p", "no:cacheprovider"],
                cwd=ROOT, timeout=args.timeout,
                capture_output=True, text=True)
            dt = time.monotonic() - t0
            ok = r.returncode == 0
        except subprocess.TimeoutExpired:
            dt, ok = args.timeout, False
        tier = "fast" if (dt <= args.fast_budget and ok) else "slow"
        data[f.name] = {"seconds": round(dt, 1), "ok": ok, "tier": tier}
        OUT.write_text(json.dumps(dict(sorted(data.items())), indent=1))
        print(f"{f.name}: {dt:.1f}s ok={ok} -> {tier}", flush=True)

    fast_total = sum(v["seconds"] for v in data.values()
                     if v["tier"] == "fast")
    print(f"fast tier: {sum(v['tier'] == 'fast' for v in data.values())} "
          f"files, ~{fast_total:.0f}s serial")


if __name__ == "__main__":
    main()
