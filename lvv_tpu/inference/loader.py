"""ModelLoader — rebuild the full VQA stack from a checkpoint directory.

Re-design of the reference ModelLoader
(src/encoder-decoder/inference/model_loader.py:23-310): the reference
re-assembles six separately-saved torch files + PEFT dirs from a
`config.json`; here the checkpoint is one Orbax pytree whose top-level keys
ARE the components, so loading is: read config.json -> build VQAModel ->
restore the state pytree -> take `params`.
"""
from __future__ import annotations

import pathlib
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .. import config as config_lib
from ..config.schema import VQAConfig
from ..data import load_tokenizer
from ..models import VQAModel
from ..train.checkpoints import CheckpointManager


class ModelLoader:
    def __init__(self, checkpoint_dir: str, tokenizer_path: Optional[str] = None):
        self.dir = pathlib.Path(checkpoint_dir)
        cfg_path = self._find_config()
        self.cfg: VQAConfig = config_lib.from_dict(
            VQAConfig, config_lib.load_file(cfg_path))
        self.tokenizer = load_tokenizer(tokenizer_path,
                                        self.cfg.model.llm.special_tokens)

    def _find_config(self) -> pathlib.Path:
        for cand in [self.dir / "config.json",
                     *sorted(self.dir.glob("*/config.json"))]:
            if cand.exists():
                return cand
        raise FileNotFoundError(f"no config.json under {self.dir}")

    def build_model(self) -> VQAModel:
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.model.dtype == "bfloat16" else jnp.float32
        return VQAModel(
            cfg.model, dtype=dtype,
            llm_lora_rank=cfg.model.llm_lora.r
            if cfg.model.llm_lora.enabled else 0,
            llm_lora_alpha=cfg.model.llm_lora.alpha,
            clip_lora_rank=cfg.model.clip_lora.r
            if cfg.model.clip_lora.enabled else 0,
            clip_lora_alpha=cfg.model.clip_lora.alpha)

    def load_all(self) -> Tuple[VQAModel, dict]:
        """-> (model, params). Restores the newest loadable checkpoint."""
        model = self.build_model()
        cfg = self.cfg

        # abstract target for restore: init with tiny dummy batch shapes
        import numpy as np
        from ..models import VQABatch
        c, (h, w) = cfg.model.bev_channels, cfg.model.bev_hw
        s = cfg.model.sam.img_size
        dummy = VQABatch(
            bev=jnp.zeros((1, c, h, w)),
            images=jnp.zeros((1, 6, 3, s, s)),
            view_valid=jnp.ones((1, 6), bool),
            text_ids=jnp.zeros((1, 8), jnp.int32),
            text_len=jnp.full((1,), 8, jnp.int32),
            labels=jnp.full((1, 8), -100, jnp.int32),
            use_vision=jnp.asarray(True), use_lidar=jnp.asarray(True))
        params = model.init(jax.random.PRNGKey(0), dummy)["params"]

        # checkpoint dir may be the manager root or a single ckpt dir
        root = self.dir if any(
            (p / "state").exists() for p in self.dir.iterdir()
            if p.is_dir()) else self.dir.parent
        mgr = CheckpointManager(str(root))
        from ..parallel.train_step import TrainState
        from ..train.optim import make_optimizer
        tx, _ = make_optimizer(cfg.train.optim, params, total_steps=1)
        from ..parallel.train_step import create_state
        target = create_state(params, tx, jax.random.PRNGKey(0))
        state, step = mgr.try_restore_newest(target)
        if state is None:
            raise FileNotFoundError(f"no loadable checkpoint under {root}")
        return model, state.params
