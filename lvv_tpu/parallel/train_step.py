"""The pjit'd training step.

Replaces the reference's DDP + AMP loop (six separate DDP wrappers at
trainer.py:232-253, gradient all-reduce inside backward): here the whole
multimodal model is ONE pure function differentiated once; gradients are
averaged across the "data" mesh axis by XLA (the batch is sharded on its
leading axis, so the loss-mean already implies a psum when lowered), and
optional "model"-axis tensor sharding flows through GSPMD.

No GradScaler: bf16 on TPU trains without loss scaling (fp32 params,
bf16 compute), which is why the reference's AMP machinery
(train_utils.py:21-62) has no equivalent here.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import batch_sharding
from .sharding import param_specs


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array


def create_state(params, tx, rng) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), rng=rng)


def commit_state(state: TrainState, mesh) -> TrainState:
    """device_put every state leaf with an explicit NamedSharding so the
    FIRST train-step call sees the same argument shardings every later
    call does. Freshly-built states carry uncommitted host arrays that
    compile with `UnspecifiedValue` argument mappings; the step's outputs
    come back committed (NamedSharding), so step 2 used to trigger one
    wasteful full recompile — identical avals, only the mapping changed
    (caught by the 300-step soak: a 96 s recompile on the flagship).
    Param-structured optimizer subtrees (adam moments) take their
    parameter's sharding; everything else replicates."""
    repl = NamedSharding(mesh, P())
    p_def = jax.tree_util.tree_structure(state.params)
    p_sh = jax.tree_util.tree_map(
        lambda x: getattr(x, "sharding", repl), state.params)

    def params_like(n):
        try:
            return jax.tree_util.tree_structure(n) == p_def
        except Exception:
            return False

    def place(n):
        if params_like(n):
            return jax.tree_util.tree_map(jax.device_put, n, p_sh)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), n)

    return TrainState(
        step=jax.device_put(state.step, repl),
        params=state.params,
        opt_state=jax.tree_util.tree_map(place, state.opt_state,
                                         is_leaf=params_like),
        rng=jax.device_put(state.rng, repl))


def make_train_step(model, tx, mesh, donate: bool = True):
    """Returns a jit'd `(state, batch) -> (state, metrics)` with the batch
    sharded over the data axis and state placed per sharding rules."""

    def step_fn(state: TrainState, batch):
        rng, sub = jax.random.split(state.rng)
        # Differentiate ONLY the trainable partition (the optimizer's own
        # freeze plan): frozen subtrees enter the forward as stop_gradient
        # constants, so (a) no tangents are built through the frozen SAM
        # trunk's pallas attention kernels — which have no VJP for the
        # global layers by design, their recompute-backward would
        # materialize GBs of bias — and (b) the backward pass skips all
        # frozen-weight work, exactly like the reference's
        # requires_grad=False freeze (deepencoder_infer.py:406-416).
        from ..train.optim import group_labels
        frozen = jax.tree_util.tree_map(lambda lbl: lbl == "frozen",
                                        group_labels(state.params))

        def loss_fn(p):
            merged = jax.tree_util.tree_map(
                lambda t, base, f: jax.lax.stop_gradient(base) if f else t,
                p, state.params, frozen)
            # deterministic=False: configured dropout (adapter 0.05, VAT,
            # LoRA) must be live in training, matching the reference
            # trainer; eval keeps deterministic=True (make_eval_step).
            loss, logits, count = model.apply(
                {"params": merged}, batch, deterministic=False,
                rngs={"dropout": sub})
            return loss, (logits, count)

        (loss, (_, count)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = {"loss": loss, "grad_norm": gnorm,
                   "tokens": count.astype(jnp.float32)}
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state, rng=rng), metrics

    return jax.jit(step_fn,
                   in_shardings=(None, _vqa_batch_shardings(mesh)),
                   donate_argnums=(0,) if donate else ())


def _vqa_batch_shardings(mesh):
    """Per-field batch shardings: arrays split on the data axis, the scalar
    ablation toggles replicated."""
    from ..models.vqa import VQABatch
    data = batch_sharding(mesh)
    repl = NamedSharding(mesh, P())
    return VQABatch(bev=data, images=data, view_valid=data, text_ids=data,
                    text_len=data, labels=data, use_vision=repl,
                    use_lidar=repl)


def make_eval_step(model, mesh):
    """Teacher-forced validation loss (reference validation.run_validation
    :23-169 replicates the train-step assembly without grads)."""

    def eval_fn(params, batch):
        loss, _, count = model.apply({"params": params}, batch,
                                     deterministic=True)
        return loss, count

    return jax.jit(eval_fn, in_shardings=(None, _vqa_batch_shardings(mesh)))
