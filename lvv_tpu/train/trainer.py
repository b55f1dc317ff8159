"""Trainer — full training orchestration.

Re-design of the reference Trainer (src/encoder-decoder/training/core/
trainer.py:39-791) on the JAX stack:

  setup: mesh + Tee logging + seed  ->  model/optimizer construction ->
  resume (newest loadable ckpt, full state incl. PRNG key) ->
  epoch loop { pjit train step, periodic step-checkpoints with pruning,
  teacher-forced validation, inference sampling + task metrics, best-ckpt }

Differences from the reference, by design:
- one pure train step replaces 6 DDP wrappers + AMP scaler (SURVEY.md §3.1);
- grad accumulation is optax.MultiSteps inside the jit, not a host loop;
- RNG state is one PRNG key in the train state, not 4 captured generator
  states (checkpoints.py:93-99);
- metric history / curves write JSON + PNG per epoch (plotting.py port).
"""
from __future__ import annotations

import json
import pathlib
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.schema import VQAConfig
from ..data import Collator, DeterministicSampler, MixedNuDataset, \
    load_tokenizer, split_rows
from ..models import VQAModel, greedy_generate
from ..parallel import (TrainState, commit_state, create_state,
                        make_mesh, make_eval_step,
                        make_train_step, shard_batch, shard_params)
from ..utils import AverageMeter, Tee, get_tracer, log0, seed_all
from .checkpoints import CheckpointManager
from .metrics import metrics_by_template
from .optim import count_by_group, make_optimizer


class Trainer:
    def __init__(self, cfg: VQAConfig, dataset: Optional[MixedNuDataset] = None,
                 tokenizer=None):
        self.cfg = cfg
        self.out_dir = pathlib.Path(cfg.train.output_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.tracer = get_tracer()
        self.rng_key = seed_all(cfg.train.seed)
        self.mesh = self._make_mesh()
        log0(f"[trainer] mesh: {dict(self.mesh.shape)}")

        self.tokenizer = tokenizer or load_tokenizer(
            None, cfg.model.llm.special_tokens)
        if dataset is None:
            from lvv_tpu.data.dataset import make_nusc_handle
            dataset = MixedNuDataset(
                cfg.data.bev_features_dir, cfg.data.caption_json,
                cfg.data.grounding_json,
                grounding_template_filter=cfg.data
                .grounding_template_filter,
                nusc=make_nusc_handle(cfg.data.nuscenes_root),
                dataroot=cfg.data.nuscenes_root)
        self.dataset = dataset
        n = len(self.dataset)
        if n == 0:
            raise ValueError("dataset is empty — check data paths")
        self.train_idx, self.val_idx = split_rows(
            n, cfg.data.val_fraction, cfg.train.seed)
        log0(f"[trainer] dataset: {n} rows "
             f"({len(self.train_idx)} train / {len(self.val_idx)} val)")

        dtype = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32
        self.model = VQAModel(
            cfg.model, dtype=dtype,
            llm_lora_rank=cfg.model.llm_lora.r if cfg.model.llm_lora.enabled
            else 0,
            llm_lora_alpha=cfg.model.llm_lora.alpha,
            clip_lora_rank=cfg.model.clip_lora.r if cfg.model.clip_lora.enabled
            else 0,
            clip_lora_alpha=cfg.model.clip_lora.alpha)

        self.collator = Collator(
            self.tokenizer, cfg.train.max_prompt_tokens,
            cfg.train.max_answer_tokens, cfg.model.sam.img_size,
            (cfg.model.bev_channels,) + tuple(cfg.model.bev_hw))

        self.batch_size = cfg.train.batch_size
        self.steps_per_epoch = max(len(self.train_idx) // self.batch_size, 1)
        total = self.steps_per_epoch * cfg.train.epochs
        self.ckpt = CheckpointManager(self.out_dir / "checkpoints",
                                      keep_last=cfg.train.keep_last_ckpts)
        self._init_state(total)
        self.history: List[Dict] = []
        self.best_val = float("inf")

    # ------------------------------------------------------------- setup

    def _make_mesh(self):
        """Mesh with a data axis that divides the global batch (shrinks the
        data axis when batch < devices, e.g. tiny smoke runs)."""
        import math
        import jax as _jax
        cfg = self.cfg
        n = len(_jax.devices())
        model = max(cfg.mesh.model, 1)
        data = cfg.mesh.data if cfg.mesh.data > 0 else n // model
        data = math.gcd(data, cfg.train.batch_size)
        from ..config.schema import MeshConfig
        devices = _jax.devices()[: data * model]
        return make_mesh(MeshConfig(data=data, model=model), devices=devices)

    def _example_batch(self):
        rows = [self.dataset[int(i)]
                for i in self.train_idx[:self.batch_size]]
        return self.collator(rows, self.cfg.train.use_vision,
                             self.cfg.train.use_lidar)

    def _init_state(self, total_steps: int) -> None:
        cfg = self.cfg
        example = self._example_batch()
        self.rng_key, init_key = jax.random.split(self.rng_key)
        params = self.model.init(init_key, example)["params"]
        log0("[trainer] params by group:",
             json.dumps(count_by_group(params)))
        self.tx, _ = make_optimizer(cfg.train.optim, params, total_steps)
        params = shard_params(params, self.mesh)
        state = create_state(params, self.tx, self.rng_key)

        restored, step = self.ckpt.try_restore_newest(state) \
            if cfg.train.resume else (None, 0)
        if restored is not None:
            state = restored
            log0(f"[trainer] resumed from step {step}")
        # explicit shardings on every state leaf: an uncommitted fresh
        # state costs one full extra train-step recompile at step 2
        # (parallel/train_step.py::commit_state)
        self.state = commit_state(state, self.mesh)
        self.start_step = int(step)
        self.train_step = make_train_step(self.model, self.tx, self.mesh)
        self.eval_step = make_eval_step(self.model, self.mesh)

    # ------------------------------------------------------------- loops

    def _batches(self, indices, epoch: int, shuffle: bool = True):
        sampler = DeterministicSampler(indices, seed=self.cfg.train.seed,
                                       shuffle=shuffle)
        sampler.set_epoch(epoch)
        buf = []
        for i in sampler:
            buf.append(self.dataset[int(i)])
            if len(buf) == self.batch_size:
                yield self.collator(buf, self.cfg.train.use_vision,
                                    self.cfg.train.use_lidar)
                buf = []

    def train(self) -> Dict:
        cfg = self.cfg
        log_path = self.out_dir / "train.log"
        # TensorBoard scalars (reference tensorboardX at pcdet
        # tools/train.py:117; native event writer, host 0 only)
        from ..utils.tb_writer import SummaryWriter
        from ..utils.logging import is_host_zero
        tb = SummaryWriter(self.out_dir / "tensorboard") \
            if is_host_zero() else None
        with Tee(str(log_path)):
            global_step = self.start_step
            start_epoch = global_step // self.steps_per_epoch
            for epoch in range(start_epoch, cfg.train.epochs):
                meter = AverageMeter()
                t_epoch = time.perf_counter()
                skip = (global_step % self.steps_per_epoch
                        if epoch == start_epoch else 0)
                # prefetch: collate + device_put on a worker thread, 2
                # batches ahead, so host data prep overlaps device compute
                # (reference gets this from DataLoader num_workers)
                from ..data.prefetch import Prefetcher
                batches = Prefetcher(
                    self._batches(self.train_idx, epoch),
                    prepare=lambda b: shard_batch(b, self.mesh), depth=2)
                # metric fetch is DEFERRED to log points: float(loss) every
                # step would sync host<->device per step and stall the
                # async dispatch pipeline (~31 ms/step through the axon
                # relay alone)
                pending = []
                with batches:
                    for bi, batch in enumerate(batches):
                        if bi < skip:  # mid-epoch resume (reference :386-389)
                            continue
                        self.state, metrics = self.train_step(self.state,
                                                              batch)
                        global_step += 1
                        pending.append(metrics)
                        if global_step % cfg.train.log_every == 0:
                            for m in pending:
                                meter.update(float(m["loss"]))
                            pending.clear()
                            gn = float(metrics["grad_norm"])
                            log0(f"[e{epoch} s{global_step}] "
                                 f"loss {meter.val:.4f} "
                                 f"(avg {meter.avg:.4f}) gnorm {gn:.3f}")
                            if tb is not None:
                                tb.add_scalar("train/loss", meter.val,
                                              global_step)
                                tb.add_scalar("train/grad_norm", gn,
                                              global_step)
                        if global_step % cfg.train.save_every_steps == 0:
                            self.ckpt.save(self.state, step=global_step,
                                           cfg=self.cfg)
                for m in pending:   # drain tail for the epoch average
                    meter.update(float(m["loss"]))
                epoch_time = time.perf_counter() - t_epoch
                record = {"epoch": epoch, "step": global_step,
                          "train_loss": meter.avg,
                          "epoch_seconds": epoch_time}

                if (epoch + 1) % cfg.train.val_every_epochs == 0:
                    record["val_loss"] = self.validate()
                    if tb is not None:
                        tb.add_scalar("val/loss", record["val_loss"],
                                      global_step)
                    if record["val_loss"] < self.best_val:
                        self.best_val = record["val_loss"]
                        self.ckpt.save(self.state, step=global_step,
                                       tag=f"best_e{epoch}", cfg=self.cfg,
                                       is_best=True)
                if (epoch + 1) % cfg.train.inference_sampling_every == 0:
                    record["inference"] = self.inference_sample(
                        cfg.train.inference_samples)
                self.ckpt.save(self.state, step=global_step, tag="latest",
                               cfg=self.cfg)
                self.history.append(record)
                self._write_history()
                if tb is not None:
                    tb.flush()
                log0(f"[epoch {epoch}] {json.dumps(record, default=str)}")
        if tb is not None:
            tb.close()
        return {"steps": global_step, "history": self.history}

    def validate(self) -> float:
        total, count = 0.0, 0
        for batch in self._batches(self.val_idx, 0, shuffle=False):
            batch = shard_batch(batch, self.mesh)
            loss, n = self.eval_step(self.state.params, batch)
            total += float(loss) * int(n)
            count += int(n)
        return total / max(count, 1)

    def inference_sample(self, n: int) -> Dict:
        """Generate answers for n held-out rows and score them (reference
        validation.run_inference_sampling :298-686: half captions, half
        det_area grounding)."""
        rows = [self.dataset[int(i)] for i in self.val_idx[:n]]
        if not rows:
            return {}
        preds, refs, templates, dump = [], [], [], []
        for r in rows:
            batch = self.collator([{**r, "answer": None}])
            prompt_len = int(batch.text_len[0])
            toks, lens = greedy_generate(
                self.model, self.state.params, batch.bev, batch.images,
                batch.view_valid, batch.text_ids[:, :prompt_len],
                batch.text_len, max_new_tokens=self.cfg.train.max_answer_tokens,
                eos_id=self.tokenizer.eos_id)
            text = self.tokenizer.decode(
                np.asarray(toks[0][:int(lens[0])]).tolist())
            preds.append(text)
            refs.append(r["answer"])
            templates.append(r["template_type"])
            dump.append({"token": r["token"], "question": r["question"],
                         "reference": r["answer"], "generated": text,
                         "template_type": r["template_type"]})
        # per-epoch sample dump (reference save_val_inference_samples,
        # validation.py:172-295 JSON output)
        (self.out_dir / "inference_samples.json").write_text(
            json.dumps(dump, indent=2))
        return metrics_by_template(preds, refs, templates)

    def _write_history(self) -> None:
        (self.out_dir / "history.json").write_text(
            json.dumps(self.history, indent=2, default=str))
        try:
            from .plotting import plot_history
            plot_history(self.history, self.out_dir / "curves.png")
        except Exception:
            pass
