"""Tensor-parallel sharding rules for the denoiser bodies (GSPMD-style).

No module changes: attention/MLP kernels are placed with Megatron-style
column/row partition specs over a ``model`` mesh axis and jit's SPMD
partitioner propagates the rest —

- column-parallel (shard output features): to_q/to_k/to_v, add_*_proj,
  ff_in / proj_in / fc1 / wi_* (head and hidden dims split across chips);
- row-parallel (shard input features): to_out / to_add_out, ff_out /
  proj_out / fc2 / wo (the partial sums meet in an XLA all-reduce).

Everything else (norms, convs, embeddings, biases) stays replicated. The
reference has no tensor parallelism at all (SURVEY.md §2.2); this is the
TPU-native extension for serving models larger than one chip's HBM.
"""

from __future__ import annotations

import re
from typing import Dict

import jax
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLUMN_PARALLEL = (
    r".*(to_q|to_k|to_v|add_q_proj|add_k_proj|add_v_proj|q_proj|k_proj|v_proj)/kernel$",
    r".*(ff_in|proj_in|fc1|wi_0|wi_1|ff_context_in)/kernel$",
    r".*(norm1_linear|norm1_context_linear|linear)/kernel$",  # adaLN mods (per-feature)
)
ROW_PARALLEL = (
    r".*(to_out|to_add_out|out_proj|o)/kernel$",
    r".*(ff_out|proj_out|fc2|wo|ff_context_out)/kernel$",
)


def tp_spec_for(path: str, shape, axis: str, n: int):
    """PartitionSpec for one param leaf (None spec = replicate)."""
    if len(shape) == 2:
        if any(re.match(p, path) for p in COLUMN_PARALLEL) and shape[1] % n == 0:
            return P(None, axis)
        if any(re.match(p, path) for p in ROW_PARALLEL) and shape[0] % n == 0:
            return P(axis, None)
    return P()


def shard_params_tp(params, mesh: Mesh, axis: str = "model"):
    """device_put every leaf with its TP spec (replicate non-matching)."""
    n = mesh.shape[axis]
    flat = traverse_util.flatten_dict(params, sep="/")
    out = {}
    for k, v in flat.items():
        spec = tp_spec_for(k, getattr(v, "shape", ()), axis, n) if hasattr(v, "shape") else P()
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return traverse_util.unflatten_dict(out, sep="/")


def tp_sharding_summary(params, mesh: Mesh, axis: str = "model") -> Dict[str, int]:
    """{'column': n, 'row': n, 'replicated': n} — for logging/tests."""
    n = mesh.shape[axis]
    flat = traverse_util.flatten_dict(params, sep="/")
    counts = {"column": 0, "row": 0, "replicated": 0}
    for k, v in flat.items():
        spec = tp_spec_for(k, getattr(v, "shape", ()), axis, n) if hasattr(v, "shape") else P()
        if spec == P(None, axis):
            counts["column"] += 1
        elif spec == P(axis, None):
            counts["row"] += 1
        else:
            counts["replicated"] += 1
    return counts
