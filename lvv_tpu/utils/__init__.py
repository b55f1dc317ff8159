from .debug import DebugTracer, get_tracer, set_level
from .helpers import (astype_tree, cdiv, count_params,
                      enable_compile_cache, param_summary,
                      round_up, seed_all, tree_bytes)
from .logging import AverageMeter, Tee, is_host_zero, log0

__all__ = [
    "DebugTracer", "get_tracer", "set_level",
    "seed_all", "count_params", "tree_bytes", "param_summary", "cdiv",
    "round_up", "astype_tree", "Tee", "log0", "is_host_zero", "AverageMeter",
    "enable_compile_cache",
]
