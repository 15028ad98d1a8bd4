"""ConditionerWrapper: run all conditioners, merge outputs by type.

Re-derivation of the reference wrapper
(reference: src/flash/models/embedders/conditioners_wrapper.py:9-104):
per-conditioner ucg decision — forced via ``ucg_keys``, stochastic via
``ucg_rate`` (disabled by ``set_ucg_rate_zero``) — then same-type outputs
concatenated. The reference's KEY2CATDIM (vector:1, crossattn:2, concat:1 in
NCHW) maps uniformly to the trailing feature/channel axis in our NHWC/BSC
layouts. Stochastic decisions are traced bernoulli draws from an explicit
PRNG key, so the wrapper is jit-safe.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from .base import Conditioner

KEY2CATDIM = {"vector": -1, "crossattn": -1, "concat": -1, "attention_mask": -1}


class ConditionerWrapper:
    def __init__(self, conditioners: Sequence[Conditioner]):
        self.conditioners = list(conditioners)

    def init(self, rng: jax.Array, batch: Dict[str, Any]) -> List:
        keys = jax.random.split(rng, max(len(self.conditioners), 1))
        return [c.init(k, batch) for c, k in zip(self.conditioners, keys)]

    def input_keys(self) -> List[str]:
        return [c.input_key for c in self.conditioners]

    def __call__(
        self,
        params: List,
        batch: Dict[str, Any],
        rng: Optional[jax.Array] = None,
        ucg_keys: Optional[List[str]] = None,
        set_ucg_rate_zero: bool = False,
    ) -> Dict[str, Dict[str, jnp.ndarray]]:
        ucg_keys = ucg_keys or []
        if len(params) != len(self.conditioners):
            # zip would silently TRUNCATE: a short params list drops whole
            # conditioners (e.g. Pixart's resolution/aspect vector) with no
            # error and subtly wrong outputs. Param-less conditioners take {}.
            raise ValueError(
                f"got {len(params)} param entries for {len(self.conditioners)} "
                "conditioners (pass {} for param-less conditioners)"
            )
        out: Dict[str, jnp.ndarray] = {}
        for p, cond in zip(params, self.conditioners):
            if cond.input_key in ucg_keys:
                force_zero = jnp.float32(1.0)
            elif cond.ucg_rate > 0 and not set_ucg_rate_zero and rng is not None:
                rng, sub = jax.random.split(rng)
                force_zero = jax.random.bernoulli(sub, cond.ucg_rate).astype(jnp.float32)
            else:
                force_zero = jnp.float32(0.0)
            cond_out = cond(p, batch, force_zero)
            for k, v in cond_out.items():
                if k in out:
                    out[k] = jnp.concatenate([out[k], v], axis=KEY2CATDIM[k])
                else:
                    out[k] = v
        return {"cond": out}
