#!/usr/bin/env python
"""VQA training CLI (reference src/encoder-decoder/train.py:442-676).

Usage:
    python tools/train_vqa.py --config cfg.json \
        --set train.epochs=5 --set model.llm_lora.r=32

The reference packs a giant inline dict + interactive resume picker; here
the typed config + dotted overrides replace both (resume is automatic from
the newest loadable checkpoint; use train.resume=false to start fresh).
"""
from __future__ import annotations

import pathlib as _pathlib
import sys as _sys

_sys.path.insert(0, str(_pathlib.Path(__file__).resolve().parent.parent))

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None, help="JSON/YAML config file")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="KEY.PATH=VALUE")
    p.add_argument("--tokenizer", default=None,
                   help="local HF tokenizer path (falls back to byte-level)")
    p.add_argument("--print-config", action="store_true")
    args = p.parse_args()

    from lvv_tpu import config as C
    from lvv_tpu.data import load_tokenizer
    from lvv_tpu.parallel import init_distributed

    if args.config:
        cfg = C.load(C.VQAConfig, args.config, args.overrides)
    else:
        cfg = C.apply_overrides(C.default_config(), args.overrides)
    if args.print_config:
        print(json.dumps(C.to_dict(cfg), indent=2))
        return

    init_distributed()
    tokenizer = load_tokenizer(args.tokenizer,
                               cfg.model.llm.special_tokens)

    from lvv_tpu.train import Trainer
    result = Trainer(cfg, tokenizer=tokenizer).train()
    print(json.dumps({"steps": result["steps"]}))


if __name__ == "__main__":
    main()
