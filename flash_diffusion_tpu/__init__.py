"""flash_diffusion_tpu — TPU-native Flash Diffusion framework.

A from-scratch JAX/XLA/Pallas re-design of gojasper/flash-diffusion: few-step
distillation of text-to-image diffusion teachers (SD1.5/SDXL UNets, Pixart-α
DiT, SD3 MMDiT) into LoRA students, with pure-functional schedulers, a single
jitted train step (shared teacher rollout for G and D losses), mesh-based
data parallelism, and Pallas attention kernels.
"""

__version__ = "0.1.0"

from .config import BaseConfig
from .pipelines import FlashPipeline

__all__ = ["BaseConfig", "FlashPipeline", "__version__"]
