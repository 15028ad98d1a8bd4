from .common import (
    boundary_scalings,
    gaussian_mixture_pdf,
    predicted_x0_eps,
    sample_start_index,
    stage_index,
    timestep_pdf,
)
from .discriminator import (
    ConvDiscriminator,
    DiscriminatorConfig,
    pixart_discriminator_config,
    sd3_discriminator_config,
    sdxl_discriminator_config,
)
from .flash import FlashDiffusion, FlashDiffusionConfig
from .flash_sd3 import FlashDiffusionSD3, FlashDiffusionSD3Config
from .losses import (
    center_crop,
    clip_disc_weights,
    dmd_loss,
    gan_losses,
    huber_loss,
    l1_loss,
    l2_loss,
)
from .lpips import LPIPS, VGG16Features

__all__ = [
    "LPIPS",
    "ConvDiscriminator",
    "DiscriminatorConfig",
    "FlashDiffusion",
    "FlashDiffusionConfig",
    "FlashDiffusionSD3",
    "FlashDiffusionSD3Config",
    "VGG16Features",
    "boundary_scalings",
    "center_crop",
    "clip_disc_weights",
    "dmd_loss",
    "gan_losses",
    "gaussian_mixture_pdf",
    "huber_loss",
    "l1_loss",
    "l2_loss",
    "pixart_discriminator_config",
    "predicted_x0_eps",
    "sample_start_index",
    "sd3_discriminator_config",
    "sdxl_discriminator_config",
    "stage_index",
    "timestep_pdf",
]
