"""LPIPS perceptual distance (VGG16 backbone) in flax.

The reference depends on the ``lpips`` pip package (LPIPS-VGG,
reference: src/flash/models/flash/flash_diffusion_model.py:102-103,394-397).
Here the VGG16 feature trunk + linear calibration heads are first-party flax
modules; pretrained weights import from the torch ``lpips``/torchvision
checkpoints via utils/hf.py (`import_lpips_torch`). Inputs are NHWC in
[-1, 1] (the reference feeds clamp(-1,1) decoded latents).
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

# VGG16 conv plan: (channels, num_convs) per stage; features tapped after
# the ReLU of each stage's last conv, before pooling (lpips taps 1..5).
_VGG_STAGES: Tuple[Tuple[int, int], ...] = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

# ImageNet normalization expressed for [-1, 1] inputs (lpips ScalingLayer).
_SHIFT = jnp.array([-0.030, -0.088, -0.188])
_SCALE = jnp.array([0.458, 0.448, 0.450])


class VGG16Features(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        feats = []
        h = x
        for si, (ch, n_convs) in enumerate(_VGG_STAGES):
            for ci in range(n_convs):
                h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name=f"conv{si}_{ci}")(h)
                h = nn.relu(h)
            feats.append(h)
            if si < len(_VGG_STAGES) - 1:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    """lpips(a, b) → scalar-per-sample [B]; mean over taps of spatially
    averaged, 1x1-conv-calibrated squared differences of unit-normalized
    VGG features."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        if a.shape[1] < 16 or a.shape[2] < 16:
            raise ValueError(
                f"LPIPS input {a.shape[1]}x{a.shape[2]} too small: VGG16's four "
                f"max-pools need >= 16x16 (empty feature maps yield NaN)"
            )
        vgg = VGG16Features(dtype=self.dtype, name="vgg")

        def norm_input(x):
            return (x - _SHIFT) / _SCALE

        fa = vgg(norm_input(a))
        fb = vgg(norm_input(b))
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / (jnp.linalg.norm(xa, axis=-1, keepdims=True) + 1e-10)
            nb = xb / (jnp.linalg.norm(xb, axis=-1, keepdims=True) + 1e-10)
            diff = jnp.square(na - nb)
            lin = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype, name=f"lin_{i}")
            total = total + jnp.mean(lin(diff), axis=(1, 2, 3))
        return total
