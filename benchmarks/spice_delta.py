#!/usr/bin/env python
"""spice_lite vs official SPICE — delta on a hand-derivable fixture set.

Real SPICE (pycocoevalcap's Java scorer over Stanford scene-graph
parsing) cannot execute here: no docker binary, no Java runtime, zero
network egress (verified this round — `which docker` / `which java` both
empty, pip install impossible). The reference runs it via
src/encoder-decoder/training/utils/metrics.py:150-219.

Mitigation: for captions with trivial grammar, official SPICE's scene
graph is hand-derivable from the metric's definition (Anderson et al.
2016: tuples = objects ∪ (object, attribute) pairs ∪ (subject, relation,
object) triples; score = F1 over tuple-set overlap). Each fixture below
carries its hand-derived tuple sets and exact F1 (assumptions: correct
parse — guaranteed by construction, no WordNet synonym hits — all
distinct words are non-synonyms, articles dropped). spice_lite runs on
the same pairs; the table quantifies its deviation where the official
value is certain. On complex sentences (long clauses, synonyms,
plurals), spice_lite's heuristic tuples will diverge MORE than this
bound — which is why it reports under its own key and never masquerades
as SPICE (lvv_tpu/train/metrics.py:214-227).

Writes benchmarks/spice_delta.json.
"""
from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

# (candidate, reference, hand-derived official SPICE F1, derivation)
FIXTURES = [
    ("a red car", "a red car", 1.0,
     "identical graphs {car, (car,red)}"),
    ("a red car", "a blue car", 0.5,
     "{car,(car,red)} vs {car,(car,blue)}: inter 1 of 2/2 -> P=R=1/2"),
    ("a car", "a red car", 2 / 3,
     "{car} vs {car,(car,red)}: P=1, R=1/2 -> F1=2/3"),
    ("a man riding a horse", "a man riding a horse", 1.0,
     "{man, horse, (man,ride,horse)} both sides"),
    ("a man riding a horse", "a woman riding a horse", 1 / 3,
     "inter {horse} of 3/3 -> P=R=1/3"),
    ("a red car", "a dog", 0.0, "disjoint graphs"),
    ("a cat and a dog", "a dog and a cat", 1.0,
     "same object sets {cat, dog} (order-invariant)"),
    ("a large red car", "a red car", 0.8,
     "{car,(car,large),(car,red)} vs {car,(car,red)}: P=2/3, R=1"),
]


def main():
    from lvv_tpu.train.metrics import spice_lite

    rows = []
    for cand, ref, official, why in FIXTURES:
        lite = spice_lite([cand], [ref])
        rows.append({"candidate": cand, "reference": ref,
                     "spice_official_hand": round(official, 4),
                     "spice_lite": round(lite, 4),
                     "abs_delta": round(abs(lite - official), 4),
                     "derivation": why})
        print(f"{cand!r} vs {ref!r}: official {official:.3f} "
              f"lite {lite:.3f}", flush=True)
    deltas = [r["abs_delta"] for r in rows]
    out = {
        "environment": {"docker": False, "java": False, "egress": False},
        "fixtures": rows,
        "max_abs_delta": max(deltas),
        "mean_abs_delta": round(sum(deltas) / len(deltas), 4),
        "caveat": "bound holds for trivially-parseable captions only; "
                  "complex sentences (parses, WordNet synonyms, plurals) "
                  "can diverge arbitrarily — spice_lite reports under its "
                  "own key for exactly this reason",
    }
    (pathlib.Path(__file__).parent / "spice_delta.json").write_text(
        json.dumps(out, indent=1))
    print(json.dumps({k: v for k, v in out.items() if k != "fixtures"},
                     indent=1))


if __name__ == "__main__":
    main()
