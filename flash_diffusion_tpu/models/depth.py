"""DPT monocular depth (MiDaS 3.0 ``dpt_large_384``), flax/NHWC.

The reference's depth-adapter data path runs a MiDaS model via
``controlnet_aux.MidasDetector`` (reference: src/flash/data/mappers/
mappers.py:285-317). This is the TPU-native equivalent: a first-party
ViT-L/16 + DPT decoder (Ranftl et al., "Vision Transformers for Dense
Prediction") with an importer for the official ``dpt_large_384.pt``
state_dict (isl-org/MiDaS naming: ``pretrained.model.*`` backbone,
``scratch.*`` decoder). Weights load offline from a local file; no network
access is attempted — with no weights present, :class:`data.mappers.
DepthMapper` still accepts any pluggable depth fn.

Input: [B, H, W, 3] in [0, 1]; ImageNet-normalized internally (MiDaS DPT
transform: mean/std 0.5). Output: [B, H/16*?, ...] inverse relative depth
at input resolution (bilinear-upsampled ×2 of the half-res head output).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import dot_product_attention


class ViTBlock(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(name="norm1")(x)
        b, n, d = h.shape
        qkv = nn.Dense(3 * d, name="qkv")(h).reshape(b, n, 3, self.heads, d // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = dot_product_attention(q, k, v).reshape(b, n, d)
        x = x + nn.Dense(d, name="proj")(attn)
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(4 * d, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(d, name="fc2")(h)


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(h)
        return x + h


class FeatureFusion(nn.Module):
    """FeatureFusionBlock_custom (deconv=False, bn=False, expand=False)."""

    features: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="resConfUnit1")(skip)
        x = ResidualConvUnit(self.features, name="resConfUnit2")(x)
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class DPTDepth(nn.Module):
    """ViT-L/16 backbone (hooks at blocks 5/11/17/23, "project" readout)
    + DPT reassemble/fusion decoder + monocular depth head."""

    dim: int = 1024
    depth: int = 24
    heads: int = 16
    patch: int = 16
    features: int = 256
    hooks: Tuple[int, ...] = (5, 11, 17, 23)

    @nn.compact
    def __call__(self, x):
        b, H, W, _ = x.shape
        gh, gw = H // self.patch, W // self.patch
        # MiDaS DPT transform: (x - 0.5) / 0.5
        x = (x - 0.5) / 0.5
        t = nn.Conv(
            self.dim, (self.patch, self.patch), strides=self.patch, name="patch_embed"
        )(x).reshape(b, gh * gw, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        pos = self.param(
            "pos_embed", nn.initializers.zeros, (1, gh * gw + 1, self.dim)
        )
        t = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), t], axis=1) + pos

        taps = []
        for i in range(self.depth):
            t = ViTBlock(self.dim, self.heads, name=f"block_{i}")(t)
            if i in self.hooks:
                taps.append(t)

        # readout "project": concat cls to every token, Linear+GELU back to dim
        feats = []
        for lvl, tap in enumerate(taps):
            cls_tok = jnp.broadcast_to(tap[:, :1], (b, gh * gw, self.dim))
            h = jnp.concatenate([tap[:, 1:], cls_tok], axis=-1)
            h = nn.Dense(self.dim, name=f"readout_{lvl}")(h)
            h = nn.gelu(h, approximate=False)
            feats.append(h.reshape(b, gh, gw, self.dim))

        # reassemble to 4 scales: 1/4, 1/8, 1/16, 1/32 of input
        chans = (self.features, self.features * 2, self.dim, self.dim)
        f0 = nn.Conv(chans[0], (1, 1), name="proj_0")(feats[0])
        f0 = nn.ConvTranspose(chans[0], (4, 4), strides=(4, 4), name="up_0")(f0)
        f1 = nn.Conv(chans[1], (1, 1), name="proj_1")(feats[1])
        f1 = nn.ConvTranspose(chans[1], (2, 2), strides=(2, 2), name="up_1")(f1)
        f2 = nn.Conv(chans[2], (1, 1), name="proj_2")(feats[2])
        f3 = nn.Conv(chans[3], (1, 1), name="proj_3")(feats[3])
        f3 = nn.Conv(chans[3], (3, 3), strides=2, padding=1, name="down_3")(f3)

        r = [
            nn.Conv(self.features, (3, 3), padding=1, use_bias=False, name=f"layer{i+1}_rn")(f)
            for i, f in enumerate((f0, f1, f2, f3))
        ]
        p = FeatureFusion(self.features, name="refinenet4")(r[3])
        p = FeatureFusion(self.features, name="refinenet3")(p, r[2])
        p = FeatureFusion(self.features, name="refinenet2")(p, r[1])
        p = FeatureFusion(self.features, name="refinenet1")(p, r[0])

        h = nn.Conv(self.features // 2, (3, 3), padding=1, name="head_conv1")(p)
        bh, hh, wh, ch = h.shape
        h = jax.image.resize(h, (bh, 2 * hh, 2 * wh, ch), method="bilinear")
        h = nn.Conv(32, (3, 3), padding=1, name="head_conv2")(h)
        h = nn.relu(h)
        h = nn.Conv(1, (1, 1), name="head_conv3")(h)
        return nn.relu(h[..., 0])  # [B, H, W] inverse relative depth


# --------------------------------------------------------------------------
# Importer: official isl-org/MiDaS dpt_large_384 state_dict
# --------------------------------------------------------------------------
def _t(v):
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


def _lin(sd, key):
    out = {"kernel": _t(sd[f"{key}.weight"]).T}
    if f"{key}.bias" in sd:
        out["bias"] = _t(sd[f"{key}.bias"])
    return out


def _conv(sd, key):
    out = {"kernel": _t(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}
    if f"{key}.bias" in sd:
        out["bias"] = _t(sd[f"{key}.bias"])
    return out


def _deconv(sd, key):
    # torch ConvTranspose2d weight [in, out, kh, kw] → flax [kh, kw, in, out]
    out = {"kernel": _t(sd[f"{key}.weight"]).transpose(2, 3, 0, 1)}
    if f"{key}.bias" in sd:
        out["bias"] = _t(sd[f"{key}.bias"])
    return out


def _norm(sd, key):
    return {"scale": _t(sd[f"{key}.weight"]), "bias": _t(sd[f"{key}.bias"])}


def import_dpt_large(sd: Dict[str, np.ndarray], depth: int = 24) -> Dict[str, Any]:
    """isl-org/MiDaS ``dpt_large_384.pt`` → DPTDepth params."""
    bb = "pretrained.model"
    p: Dict[str, Any] = {
        "patch_embed": _conv(sd, f"{bb}.patch_embed.proj"),
        "cls_token": _t(sd[f"{bb}.cls_token"]),
        "pos_embed": _t(sd[f"{bb}.pos_embed"]),
    }
    for i in range(depth):
        k = f"{bb}.blocks.{i}"
        p[f"block_{i}"] = {
            "norm1": _norm(sd, f"{k}.norm1"),
            "qkv": _lin(sd, f"{k}.attn.qkv"),
            "proj": _lin(sd, f"{k}.attn.proj"),
            "norm2": _norm(sd, f"{k}.norm2"),
            "fc1": _lin(sd, f"{k}.mlp.fc1"),
            "fc2": _lin(sd, f"{k}.mlp.fc2"),
        }
    # readout projections: pretrained.act_postprocess{1..4}.0.project.0 (Linear)
    for lvl in range(4):
        p[f"readout_{lvl}"] = _lin(sd, f"pretrained.act_postprocess{lvl + 1}.0.project.0")
    # reassemble convs: act_postprocess{n}.3 is the 1x1 projection; .4 the resize conv
    p["proj_0"] = _conv(sd, "pretrained.act_postprocess1.3")
    p["up_0"] = _deconv(sd, "pretrained.act_postprocess1.4")
    p["proj_1"] = _conv(sd, "pretrained.act_postprocess2.3")
    p["up_1"] = _deconv(sd, "pretrained.act_postprocess2.4")
    p["proj_2"] = _conv(sd, "pretrained.act_postprocess3.3")
    p["proj_3"] = _conv(sd, "pretrained.act_postprocess4.3")
    p["down_3"] = _conv(sd, "pretrained.act_postprocess4.4")
    for i in range(4):
        p[f"layer{i + 1}_rn"] = _conv(sd, f"scratch.layer{i + 1}_rn")
    for i in range(1, 5):
        k = f"scratch.refinenet{i}"
        # refinenet4 has no skip input: its resConfUnit1 exists in the
        # checkpoint but is never executed (dead weights) — skip it
        units = ("resConfUnit2",) if i == 4 else ("resConfUnit1", "resConfUnit2")
        p[f"refinenet{i}"] = {
            "out_conv": _conv(sd, f"{k}.out_conv"),
            **{
                unit: {
                    "conv1": _conv(sd, f"{k}.{unit}.conv1"),
                    "conv2": _conv(sd, f"{k}.{unit}.conv2"),
                }
                for unit in units
            },
        }
    p["head_conv1"] = _conv(sd, "scratch.output_conv.0")
    p["head_conv2"] = _conv(sd, "scratch.output_conv.2")
    p["head_conv3"] = _conv(sd, "scratch.output_conv.4")
    return {"params": p}


def make_depth_fn(weights_path: str, size: int = 384):
    """Build a ``DepthMapper``-compatible fn: HWC float [0,255]/[0,1] image
    → HW inverse-depth in [0,1]; loads dpt_large weights from a local file."""
    import torch

    sd = torch.load(weights_path, map_location="cpu", weights_only=True)
    params = import_dpt_large(sd)
    model = DPTDepth()

    def depth_fn(image: np.ndarray) -> np.ndarray:
        img = np.asarray(image, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        h, w = img.shape[:2]
        x = jax.image.resize(jnp.asarray(img)[None], (1, size, size, 3), "bilinear")
        d = model.apply(params, x)[0]
        d = jax.image.resize(d[None, :, :, None], (1, h, w, 1), "bilinear")[0, :, :, 0]
        d = np.asarray(d)
        lo, hi = d.min(), d.max()
        return (d - lo) / (hi - lo + 1e-8)

    return depth_fn
