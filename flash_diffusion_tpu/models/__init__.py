from .adapters import T2IAdapter, T2IAdapterConfig
from .depth import DPTDepth, import_dpt_large, make_depth_fn
from .dit import DiT, DiTConfig, pixart_config
from .inception import InceptionV3Pool3, import_inception_v3, load_inception_v3
from .mmdit import MMDiT, MMDiTConfig, sd3_medium_config
from .text_encoders import (
    CLIPTextConfig,
    CLIPTextModel,
    T5Config,
    T5Encoder,
    clip_g_config,
    clip_l_config,
    t5_xxl_config,
)
from .unet import UNet2DCondition, UNetConfig, sd15_unet_config, sdxl_unet_config
from .vae import (
    AutoencoderKL,
    AutoencoderKLConfig,
    sd3_vae_config,
    sd_vae_config,
    tiled_decode,
)

__all__ = [
    "AutoencoderKL",
    "AutoencoderKLConfig",
    "T2IAdapter",
    "T2IAdapterConfig",
    "CLIPTextConfig",
    "CLIPTextModel",
    "DiT",
    "DiTConfig",
    "MMDiT",
    "MMDiTConfig",
    "T5Config",
    "T5Encoder",
    "UNet2DCondition",
    "UNetConfig",
    "clip_g_config",
    "clip_l_config",
    "pixart_config",
    "sd15_unet_config",
    "sd3_medium_config",
    "sd3_vae_config",
    "DPTDepth",
    "InceptionV3Pool3",
    "import_dpt_large",
    "import_inception_v3",
    "load_inception_v3",
    "make_depth_fn",
    "sd_vae_config",
    "sdxl_unet_config",
    "t5_xxl_config",
    "tiled_decode",
]
