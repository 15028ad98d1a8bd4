"""Checkpoint / resume via Orbax, plus state-dict shape adaptation.

Replaces the reference's Lightning ModelCheckpoint + torch state-dict
surgery (reference: examples/train_flash_sdxl.py:438-443;
src/flash/trainer/utils.py:41-224):

- ``save_state``/``restore_state`` persist the trainable state (LoRA, disc,
  optimizer moments, step, rng) every N steps; frozen params are
  deterministic imports and are not duplicated per checkpoint;
- ``adapt_state_dict`` reproduces StateDictAdapter semantics — regex-selected
  arrays are zero/noise-grown or narrowed to target shapes (used for
  cross-model weight transplants like SDXL add_embedding→class_embedding);
- ``rename_keys`` reproduces StateDictRenamer.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp
from flax import traverse_util


def save_state(directory: str, step: int, state, keep: Optional[int] = None) -> None:
    """Orbax save of the TrainState pytree under ``directory/step``."""
    with ocp.CheckpointManager(
        directory, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
    ) as mngr:
        mngr.save(step, args=ocp.args.StandardSave(state))


def restore_state(directory: str, state_like, step: Optional[int] = None):
    """Restore the latest (or given) step into the structure of ``state_like``."""
    with ocp.CheckpointManager(directory) as mngr:
        step = step if step is not None else mngr.latest_step()
        if step is None:
            return None, None
        restored = mngr.restore(step, args=ocp.args.StandardRestore(state_like))
        return restored, step


def rename_keys(tree: Dict[str, Any], key_map: Dict[str, str], sep: str = "/") -> Dict[str, Any]:
    """Rename flattened-path segments by exact map (StateDictRenamer,
    reference trainer/utils.py:183-224)."""
    flat = traverse_util.flatten_dict(tree, sep=sep)
    out = {}
    for k, v in flat.items():
        for old, new in key_map.items():
            if k == old or k.startswith(old + sep):
                k = new + k[len(old):]
                break
        out[k] = v
    return traverse_util.unflatten_dict(out, sep=sep)


def adapt_state_dict(
    tree: Dict[str, Any],
    target_shapes: Dict[str, tuple],
    key_patterns: Optional[list] = None,
    fill: str = "zeros",
    rng: Optional[jax.Array] = None,
    sep: str = "/",
) -> Dict[str, Any]:
    """Grow (zeros / stats-matched noise) or narrow regex-selected arrays to
    target shapes (StateDictAdapter, reference trainer/utils.py:41-181).
    Used e.g. to widen conv_in when adding concat-conditioning channels."""
    flat = traverse_util.flatten_dict(tree, sep=sep)
    patterns = key_patterns or [".*"]
    out = {}
    for k, v in flat.items():
        tgt = target_shapes.get(k)
        if tgt is None or tuple(v.shape) == tuple(tgt) or not any(re.match(p, k) for p in patterns):
            out[k] = v
            continue
        v = np.asarray(v)
        result = np.zeros(tgt, dtype=v.dtype)
        if fill == "normal":
            r = rng if rng is not None else jax.random.PRNGKey(0)
            result = np.array(
                jax.random.normal(r, tgt) * v.std() + v.mean(), dtype=v.dtype
            )  # np.array (not asarray): writable copy
        slices = tuple(slice(0, min(a, b)) for a, b in zip(v.shape, tgt))
        result[slices] = v[slices]
        out[k] = jnp.asarray(result)
    return traverse_util.unflatten_dict(out, sep=sep)
