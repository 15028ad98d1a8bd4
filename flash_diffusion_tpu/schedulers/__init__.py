"""Pure-functional diffusion schedulers (TPU/jit-native).

Each scheduler family is a module exposing:

- ``set_timesteps(config, num_inference_steps, ...) -> Schedule`` (host-side)
- ``scale_model_input(schedule, sample, i)``
- ``step(schedule, model_output, i, sample, key=None)`` — pure; ``i`` is the
  position in ``schedule.timesteps`` and may be a traced index, so whole
  samplers/rollouts compile to one ``lax.scan``.

``REGISTRY`` maps the diffusers class names used in the reference yaml
configs (reference: examples/configs/*.yaml TEACHER_SCHEDULER /
SAMPLING_SCHEDULER keys, resolved via eval() in
examples/train_flash_sdxl.py:221-236 — here a plain dict, no eval) onto these
modules.
"""

from types import SimpleNamespace

from . import ddpm, dpm, euler, flow_match, lcm
from .base import (
    Schedule,
    SchedulerConfig,
    add_noise,
    batch_broadcast,
    make_betas,
    predicted_x0,
    spaced_timesteps,
    training_tables,
)

# Euler ancestral shares the euler module with ancestral=True at set_timesteps.
_euler_ancestral = SimpleNamespace(
    set_timesteps=lambda config, n: euler.set_timesteps(config, n, ancestral=True),
    scale_model_input=euler.scale_model_input,
    step=euler.step,
)

# Flash flow-match shares tables with flow_match but steps with flash_step.
_flash_flow_match = SimpleNamespace(
    set_timesteps=flow_match.set_timesteps,
    scale_model_input=flow_match.scale_model_input,
    step=flow_match.flash_step,
    add_noise=flow_match.add_noise,
    get_sigmas=flow_match.get_sigmas,
)

REGISTRY = {
    "DDPMScheduler": ddpm,
    "DPMSolverMultistepScheduler": dpm,
    "EulerDiscreteScheduler": euler,
    "EulerAncestralDiscreteScheduler": _euler_ancestral,
    "LCMScheduler": lcm,
    "FlowMatchEulerDiscreteScheduler": flow_match,
    "FlashFlowMatchEulerDiscreteScheduler": _flash_flow_match,
}

__all__ = [
    "Schedule",
    "SchedulerConfig",
    "REGISTRY",
    "add_noise",
    "batch_broadcast",
    "ddpm",
    "dpm",
    "euler",
    "flow_match",
    "lcm",
    "make_betas",
    "predicted_x0",
    "spaced_timesteps",
    "training_tables",
]
