"""Batch collation (reference: src/flash/data/datasets/collation_fn.py:7-41).

Collates only keys common to ALL samples; numpy/jax arrays stack, scalars
become arrays, strings/objects stay Python lists.
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np


def custom_collation_fn(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    if not samples:
        return {}
    common = set(samples[0].keys())
    for s in samples[1:]:
        common &= set(s.keys())
    batch: Dict[str, Any] = {}
    for key in common:
        values = [s[key] for s in samples]
        first = values[0]
        if isinstance(first, np.ndarray):
            batch[key] = np.stack(values)
        elif hasattr(first, "__array__") and not isinstance(first, (str, bytes)):
            batch[key] = np.stack([np.asarray(v) for v in values])
        elif isinstance(first, (int, float, bool, np.integer, np.floating)):
            batch[key] = np.asarray(values)
        elif isinstance(first, (list, tuple)) and first and isinstance(first[0], (int, float)):
            batch[key] = np.asarray(values)
        else:
            batch[key] = values
    return batch
