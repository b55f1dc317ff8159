#!/usr/bin/env python
"""nuScenes scene-level subset builder.

Re-design of the reference subset tool
(src/get-data/create_nuScenes_subset.py:19-304): greedily drops the
highest-scoring scenes until per-modality keyframe targets are met, rewrites
the 10 nuScenes JSON tables filtered to kept scenes, symlinks/copies the
referenced blobs, filters nuCaption/nuGrounding to surviving sample tokens,
and writes a manifest. Table filtering is done relationally (token
reachability from kept scenes) rather than the reference's per-table ad-hoc
passes.
"""
from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import argparse
import json
import pathlib
import shutil

TABLES = ["scene", "sample", "sample_data", "sample_annotation", "instance",
          "ego_pose", "calibrated_sensor", "sensor", "log", "map"]


def load_tables(meta_dir: pathlib.Path) -> dict:
    return {t: json.loads((meta_dir / f"{t}.json").read_text())
            for t in TABLES}


def choose_scenes(tables: dict, target_keyframes: int) -> set:
    """Keep scenes (smallest first) until the keyframe budget is reached
    (reference :143-190 greedy drop of highest-scoring scenes)."""
    per_scene = {}
    for s in tables["sample"]:
        per_scene[s["scene_token"]] = per_scene.get(s["scene_token"], 0) + 1
    kept, total = set(), 0
    for tok, cnt in sorted(per_scene.items(), key=lambda kv: kv[1]):
        if total >= target_keyframes:
            break
        kept.add(tok)
        total += cnt
    return kept


def filter_tables(tables: dict, kept_scenes: set) -> dict:
    """Relational filter: keep rows reachable from kept scenes."""
    out = {}
    out["scene"] = [s for s in tables["scene"] if s["token"] in kept_scenes]
    samples = [s for s in tables["sample"]
               if s["scene_token"] in kept_scenes]
    out["sample"] = samples
    kept_samples = {s["token"] for s in samples}
    sd = [d for d in tables["sample_data"]
          if d["sample_token"] in kept_samples]
    out["sample_data"] = sd
    ann = [a for a in tables["sample_annotation"]
           if a["sample_token"] in kept_samples]
    out["sample_annotation"] = ann
    kept_inst = {a["instance_token"] for a in ann}
    out["instance"] = [i for i in tables["instance"]
                       if i["token"] in kept_inst]
    kept_ego = {d["ego_pose_token"] for d in sd}
    out["ego_pose"] = [e for e in tables["ego_pose"]
                       if e["token"] in kept_ego]
    kept_cs = {d["calibrated_sensor_token"] for d in sd}
    out["calibrated_sensor"] = [c for c in tables["calibrated_sensor"]
                                if c["token"] in kept_cs]
    out["sensor"] = tables["sensor"]
    kept_logs = {s["log_token"] for s in out["scene"]}
    out["log"] = [l for l in tables["log"] if l["token"] in kept_logs]
    out["map"] = tables["map"]
    return out


def filter_qa(path: pathlib.Path, out_path: pathlib.Path,
              kept_samples: set) -> int:
    rows = json.loads(path.read_text())
    kept = [r for r in rows if r.get("sample_token") in kept_samples]
    out_path.write_text(json.dumps(kept))
    return len(kept)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", required=True)
    p.add_argument("--version", default="v1.0-trainval")
    p.add_argument("--out", required=True)
    p.add_argument("--keyframes", type=int, default=2000)
    p.add_argument("--copy-blobs", action="store_true",
                   help="copy files instead of symlinking")
    p.add_argument("--qa-json", action="append", default=[],
                   help="nuCaption/nuGrounding files to filter")
    args = p.parse_args()

    src = pathlib.Path(args.dataroot)
    out = pathlib.Path(args.out)
    meta_out = out / args.version
    meta_out.mkdir(parents=True, exist_ok=True)

    tables = load_tables(src / args.version)
    kept_scenes = choose_scenes(tables, args.keyframes)
    filtered = filter_tables(tables, kept_scenes)
    for t, rows in filtered.items():
        (meta_out / f"{t}.json").write_text(json.dumps(rows))

    linked = 0
    for d in filtered["sample_data"]:
        src_f = src / d["filename"]
        dst_f = out / d["filename"]
        if not src_f.exists() or dst_f.exists():
            continue
        dst_f.parent.mkdir(parents=True, exist_ok=True)
        if args.copy_blobs:
            shutil.copy2(src_f, dst_f)
        else:
            dst_f.symlink_to(src_f.resolve())
        linked += 1

    kept_samples = {s["token"] for s in filtered["sample"]}
    qa_counts = {}
    for qa in args.qa_json:
        qa_p = pathlib.Path(qa)
        qa_counts[qa_p.name] = filter_qa(qa_p, out / qa_p.name, kept_samples)

    manifest = {"scenes": len(kept_scenes), "samples": len(kept_samples),
                "sample_data": len(filtered["sample_data"]),
                "blobs_linked": linked, "qa": qa_counts}
    (out / "subset_manifest.json").write_text(json.dumps(manifest, indent=2))
    print(json.dumps(manifest, indent=2))


if __name__ == "__main__":
    main()
