"""Training configuration (optimizers, schedules, logging cadence).

Mirror of the reference surface (reference:
src/flash/trainer/training_config.py:10-136) mapped onto optax: two
optimizer groups — generator (LoRA) and discriminator — with per-group
optimizer name / LR / LR-schedule. The reference's regex
``trainable_params`` partition is subsumed by the LoRA/disc param-tree
split; regexes remain available for masking extra leaves.
"""

from __future__ import annotations

from dataclasses import field
from typing import Any, Dict, List, Optional

import optax
from pydantic.dataclasses import dataclass

from ..config import BaseConfig

_OPTIMIZERS = {
    "Adam": optax.adam,
    "AdamW": optax.adamw,
    "Adadelta": optax.adadelta,
    "Adagrad": optax.adagrad,
    "RMSprop": optax.rmsprop,
    "SGD": optax.sgd,
}

_SCHEDULES = {
    "constant": lambda lr, **kw: optax.constant_schedule(lr),
    "cosine": lambda lr, decay_steps=100_000, **kw: optax.cosine_decay_schedule(lr, decay_steps),
    "exponential": lambda lr, transition_steps=10_000, decay_rate=0.99, **kw: optax.exponential_decay(
        lr, transition_steps, decay_rate
    ),
    "warmup_cosine": lambda lr, warmup_steps=1_000, decay_steps=100_000, **kw: optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps, decay_steps
    ),
}


@dataclass
class TrainingConfig(BaseConfig):
    # one entry per optimizer: [generator, discriminator]
    optimizers_name: List[str] = field(default_factory=lambda: ["AdamW", "AdamW"])
    learning_rates: List[float] = field(default_factory=lambda: [1e-5, 1e-5])
    optimizers_kwargs: List[dict] = field(default_factory=lambda: [{}, {}])
    lr_schedulers_name: Optional[List[Optional[str]]] = None
    lr_schedulers_kwargs: Optional[List[Optional[dict]]] = None
    # regex masks per optimizer over trainable leaves (optional; the
    # lora/disc split already partitions the two groups)
    trainable_params: Optional[List[List[str]]] = None
    gradient_clip_norm: Optional[float] = None
    # Micro-batch gradient accumulation: k micro-steps average into ONE
    # optimizer update (optax.MultiSteps; non-boundary steps emit zero
    # updates, EMA freezes between boundaries). max_steps /
    # stage-iteration counters count MICRO-steps. ⊕ no reference analog
    # (PTL's accumulate_grad_batches equivalent).
    gradient_accumulation_steps: int = 1
    # Adam/AdamW first-moment storage dtype (None = fp32). bf16 by default:
    # halves mu's HBM with negligible effect at distillation LRs (1e-5).
    adam_mu_dtype: Optional[str] = "bfloat16"
    log_keys: List[str] = field(default_factory=lambda: ["text"])
    log_samples_model_kwargs: Dict[str, Any] = field(
        default_factory=lambda: dict(num_steps=[1, 2, 4], guidance_scale=1.0)
    )
    log_every_n_steps: int = 50
    sample_every_n_steps: int = 200
    checkpoint_every_n_steps: int = 5000
    checkpoint_dir: str = "checkpoints"
    max_steps: Optional[int] = None
    seed: int = 0
    wgan_clip: float = 0.01
    # EMA student (north-star sampling/export target); None disables.
    ema_decay: Optional[float] = None
    # validation cadence (reference validation_step analog); None disables.
    val_every_n_steps: Optional[int] = None
    val_batches: int = 8

    def __post_init__(self):
        super().__post_init__()
        n = len(self.optimizers_name)
        assert len(self.learning_rates) == n, "one LR per optimizer"
        if self.lr_schedulers_name is not None:
            assert len(self.lr_schedulers_name) == n
        if len(self.optimizers_kwargs) < n:
            self.optimizers_kwargs = list(self.optimizers_kwargs) + [{}] * (
                n - len(self.optimizers_kwargs)
            )

    def build_optimizer(self, index: int) -> optax.GradientTransformation:
        name = self.optimizers_name[index]
        lr = self.learning_rates[index]
        kwargs = dict(self.optimizers_kwargs[index] or {})
        if self.lr_schedulers_name and self.lr_schedulers_name[index]:
            sched_kwargs = (self.lr_schedulers_kwargs or [{}] * len(self.optimizers_name))[index] or {}
            lr = _SCHEDULES[self.lr_schedulers_name[index]](lr, **sched_kwargs)
        if name in ("Adam", "AdamW") and "mu_dtype" not in kwargs and self.adam_mu_dtype:
            # first-moment in reduced precision (standard large-scale
            # practice): halves a third of the optimizer-state HBM; the
            # second moment and params stay fp32
            kwargs["mu_dtype"] = self.adam_mu_dtype
        tx = _OPTIMIZERS[name](lr, **kwargs)
        if self.gradient_clip_norm:
            tx = optax.chain(optax.clip_by_global_norm(self.gradient_clip_norm), tx)
        if self.gradient_accumulation_steps > 1:
            ms = optax.MultiSteps(
                tx, every_k_schedule=self.gradient_accumulation_steps
            )
            tx = optax.GradientTransformation(ms.init, ms.update)
        return tx
