"""Mesh / sharding / pjit layer (SURVEY.md §2.6 TPU-native equivalents)."""
from .mesh import (batch_sharding, init_distributed, make_mesh, replicated,
                   shard_batch)
from .sharding import param_specs, replicate_tree, shard_params
from .train_step import (TrainState, commit_state, create_state,
                         make_eval_step,
                         make_train_step)
