"""Conditioner framework base (rank → conditioning-type dispatch, ucg).

Re-derivation of the reference's BaseConditioner contract
(reference: src/flash/models/embedders/base/base_conditioner.py:6-58): each
conditioner consumes one batch key and emits tensors whose *rank* determines
how the denoiser consumes them — 2D → "vector", 3D → "crossattn",
4D → "concat". Classifier-free dropout ("ucg") zeroes a conditioner's whole
output; under jit the decision is a traced 0/1 scalar multiplied in (the
reference branches on ``torch.rand`` host-side,
embedders/conditioners_wrapper.py:66-71).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from pydantic.dataclasses import dataclass

from ...config import BaseConfig

DIM2CONDITIONING = {2: "vector", 3: "crossattn", 4: "concat"}


@dataclass
class BaseConditionerConfig(BaseConfig):
    input_key: str = "text"
    ucg_rate: float = 0.0


class Conditioner:
    """Base class. Subclasses hold a flax module and implement ``embed``.

    ``__call__(params, batch, force_zero)`` returns a dict
    {conditioning_type: array}; ``force_zero`` is a traced scalar in [0, 1]
    multiplied into every output (1.0 → unconditional).
    """

    def __init__(self, config: BaseConditionerConfig):
        self.config = config
        self.input_key = config.input_key
        self.ucg_rate = config.ucg_rate

    # -- subclass API ----------------------------------------------------
    def init(self, rng: jax.Array, batch: Dict[str, Any]):
        raise NotImplementedError

    def embed(self, params, batch: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    # -- shared ----------------------------------------------------------
    def __call__(
        self, params, batch: Dict[str, Any], force_zero: jnp.ndarray | float = 0.0
    ) -> Dict[str, jnp.ndarray]:
        out = self.embed(params, batch)
        keep = 1.0 - jnp.asarray(force_zero, jnp.float32)
        return {k: v * keep.astype(v.dtype) for k, v in out.items()}
