"""Parameter sharding rules (GSPMD annotations).

The reference has DP only (SURVEY.md §2.6); this module adds the natural TPU
extension: the LLM's big matmuls shard over the mesh "model" axis
(Megatron-style column/row split expressed as NamedSharding — XLA inserts
the all-reduces), everything else replicates. With model=1 the rules
degenerate to pure DP and add zero overhead.

Rules are path-based over the flax params tree, so they apply equally to the
optimizer state (optax mirrors the params tree).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _llm_spec(path: Tuple[str, ...], leaf) -> P:
    """Tensor-parallel layout for QwenModel params.

    - attention q/k/v kernels: split output dim (heads)   [H, H'] -> (None, m)
    - attention o_proj kernel: split input dim            [H', H] -> (m, None)
    - MLP gate/up kernels: split output dim               [H, I] -> (None, m)
    - MLP down kernel: split input dim                    [I, H] -> (m, None)
    - embeddings: split vocab dim                          [V, H] -> (m, None)
    - biases on split-output layers: split                 [H'] -> (m,)
    """
    name = path[-2] if len(path) >= 2 else ""
    leafname = path[-1]
    if leafname in ("lora_a", "lora_b"):
        return P()  # tiny; keep replicated
    if name in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
        if leafname == "kernel":
            return P(None, "model")
        if leafname == "bias":
            return P("model")
    if name in ("o_proj", "down_proj") and leafname == "kernel":
        return P("model", None)
    if name == "embed_tokens" and leafname == "embedding":
        return P("model", None)
    if name == "lm_head" and leafname == "kernel":
        return P(None, "model")
    return P()


def param_specs(params: Any) -> Any:
    """PartitionSpec pytree matching `params` (VQAModel tree)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    tree_def = jax.tree_util.tree_structure(params)
    specs = []
    for path, leaf in flat:
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        if keys and keys[0] == "llm":
            spec = _llm_spec(keys, leaf)
            # guard: only shard dims divisible by the model-axis size at
            # placement time (checked in shard_params)
            specs.append(spec)
        else:
            specs.append(P())
    return jax.tree_util.tree_unflatten(tree_def, specs)


def _divisible(leaf, spec: P, mesh: Mesh) -> bool:
    for dim, axis in enumerate(spec):
        if axis is None:
            continue
        size = mesh.shape[axis] if isinstance(axis, str) else 1
        if dim >= leaf.ndim or leaf.shape[dim] % size != 0:
            return False
    return True


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place params on the mesh per `param_specs`, falling back to
    replication for any tensor whose dims don't divide the axis size."""
    specs = param_specs(params)

    def place(leaf, spec):
        if not hasattr(leaf, "shape"):
            return leaf
        if not _divisible(leaf, spec, mesh):
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params, specs)


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh) if hasattr(x, "shape") else x, tree)
