"""EMA (exponential moving average) parameter tracking.

The reference defines ``update_ema`` but never calls it
(reference: src/flash/models/utils.py:362-377 — dead code, SURVEY.md §2.3);
the project north star names an EMA student explicitly, so here it is a
live, jit-safe pytree transform wired into the trainer via
``TrainingConfig``-driven callbacks or direct use in a custom step.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def init_ema(params: Any) -> Any:
    """EMA state starts as a COPY of the tracked params (a genuine copy:
    ``jnp.asarray`` would alias the same buffers, and aliased leaves break
    donated train-step arguments — 'attempt to donate the same buffer
    twice')."""
    return jax.tree_util.tree_map(lambda p: jnp.array(p, copy=True), params)


def update_ema(ema: Any, params: Any, decay: float = 0.9999) -> Any:
    """ema ← decay·ema + (1−decay)·params (leafwise, dtype-preserving)."""
    return jax.tree_util.tree_map(
        lambda e, p: (e * decay + p.astype(e.dtype) * (1.0 - decay)).astype(e.dtype),
        ema,
        params,
    )


def ema_warmup_decay(step: jnp.ndarray, max_decay: float = 0.9999, gamma: float = 1.0, power: float = 0.6667):
    """Step-dependent decay ramp (inverse-gamma warmup), so early EMA tracks
    fast: decay = min(max_decay, (1 + step/gamma)^-power inverted)."""
    step = jnp.maximum(step, 1)
    value = 1.0 - (1.0 + step / gamma) ** (-power)
    return jnp.clip(value, 0.0, max_decay)
