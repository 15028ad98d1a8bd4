"""HF-torch checkpoint border: import diffusers/transformers weights into
our flax param trees (and LoRA name maps for PEFT interop).

The reference keeps HF compatibility at the *code* border (it wraps diffusers
modules); we keep it at the *checkpoint* border (SURVEY.md §7): one-time
converters from HF torch state_dicts (safetensors) to our NHWC/flax layouts.
This subsumes the reference's per-script weight surgeries
(reference: examples/train_flash_sdxl.py:120-134 — SDXL
add_embedding→class_embedding — and examples/train_flash_pixart.py:88-172).

Layout rules:
- torch Linear weight [out, in]  → flax Dense kernel [in, out] (transpose)
- torch Conv2d weight [O, I, kh, kw] → flax Conv kernel [kh, kw, I, O]
- LayerNorm/GroupNorm weight/bias → scale/bias
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import numpy as np
from flax import traverse_util


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .safetensors or torch .bin/.pt checkpoint into numpy."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() for k, v in sd.items()}


def _lin(sd, key):
    return {"kernel": sd[f"{key}.weight"].T, **(
        {"bias": sd[f"{key}.bias"]} if f"{key}.bias" in sd else {}
    )}


def _conv(sd, key):
    w = sd[f"{key}.weight"]
    if w.ndim == 4:
        w = w.transpose(2, 3, 1, 0)
    out = {"kernel": w}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _norm(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _proj_in_out(sd, key):
    """diffusers Transformer2DModel proj_in/out: Linear (SDXL) or 1x1 Conv
    (SD1.5, use_linear_projection=False) — normalize to Dense."""
    w = sd[f"{key}.weight"]
    if w.ndim == 4:  # [O, I, 1, 1]
        w = w[:, :, 0, 0]
    out = {"kernel": w.T}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _mlp(sd, key):
    return {
        "linear_1": _lin(sd, f"{key}.linear_1"),
        "linear_2": _lin(sd, f"{key}.linear_2"),
    }


def _resnet(sd, key):
    out = {
        "norm1": _norm(sd, f"{key}.norm1"),
        "conv1": _conv(sd, f"{key}.conv1"),
        "norm2": _norm(sd, f"{key}.norm2"),
        "conv2": _conv(sd, f"{key}.conv2"),
    }
    if f"{key}.time_emb_proj.weight" in sd:
        out["time_emb_proj"] = _lin(sd, f"{key}.time_emb_proj")
    if f"{key}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{key}.conv_shortcut")
    return out


def _attention(sd, key):
    out = {
        "to_q": _lin(sd, f"{key}.to_q"),
        "to_k": _lin(sd, f"{key}.to_k"),
        "to_v": _lin(sd, f"{key}.to_v"),
        "to_out": _lin(sd, f"{key}.to_out.0"),
    }
    return out


def _tblock(sd, key, cross: bool):
    out = {
        "norm1": _norm(sd, f"{key}.norm1"),
        "attn1": _attention(sd, f"{key}.attn1"),
        "norm3": _norm(sd, f"{key}.norm3"),
        "ff": {
            "proj_in": _lin(sd, f"{key}.ff.net.0.proj"),
            "proj_out": _lin(sd, f"{key}.ff.net.2"),
        },
    }
    if cross and f"{key}.attn2.to_q.weight" in sd:
        out["norm2"] = _norm(sd, f"{key}.norm2")
        out["attn2"] = _attention(sd, f"{key}.attn2")
    return out


def _spatial_transformer(sd, key, depth: int, cross: bool):
    out = {
        "norm": _norm(sd, f"{key}.norm"),
        "proj_in": _proj_in_out(sd, f"{key}.proj_in"),
        "proj_out": _proj_in_out(sd, f"{key}.proj_out"),
    }
    for k in range(depth):
        out[f"blocks_{k}"] = _tblock(sd, f"{key}.transformer_blocks.{k}", cross)
    return out


def import_unet(sd: Dict[str, np.ndarray], config) -> Dict[str, Any]:
    """diffusers UNet2DConditionModel state_dict → UNet2DCondition params.

    Handles the SDXL vector-conditioning rename: if the checkpoint carries
    ``add_embedding.*`` and the config routes vector via
    class_embed_type="projection", those weights land in class_embedding
    (the reference does this by hand, train_flash_sdxl.py:120-134).
    """
    p: Dict[str, Any] = {
        "conv_in": _conv(sd, "conv_in"),
        "time_embedding": _mlp(sd, "time_embedding"),
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }
    if config.class_embed_type == "projection":
        src = "add_embedding" if "add_embedding.linear_1.weight" in sd else "class_embedding"
        p["class_embedding"] = _mlp(sd, src)

    n = len(config.block_out_channels)
    for lvl, btype in enumerate(config.down_block_types):
        has_attn = btype in ("CrossAttnDownBlock2D", "AttnDownBlock2D")
        cross = btype == "CrossAttnDownBlock2D"
        for j in range(config.layers_per_block):
            p[f"down_{lvl}_resnet_{j}"] = _resnet(sd, f"down_blocks.{lvl}.resnets.{j}")
            if has_attn:
                p[f"down_{lvl}_attn_{j}"] = _spatial_transformer(
                    sd, f"down_blocks.{lvl}.attentions.{j}",
                    config.transformer_layers_per_block[lvl], cross,
                )
        if lvl < n - 1:
            p[f"down_{lvl}_downsample"] = {
                "conv": _conv(sd, f"down_blocks.{lvl}.downsamplers.0.conv")
            }

    p["mid_resnet_0"] = _resnet(sd, "mid_block.resnets.0")
    p["mid_resnet_1"] = _resnet(sd, "mid_block.resnets.1")
    if config.mid_block_attn and "mid_block.attentions.0.norm.weight" in sd:
        p["mid_attn"] = _spatial_transformer(
            sd, "mid_block.attentions.0", config.transformer_layers_per_block[-1],
            config.cross_attention_dim is not None,
        )

    for ui, lvl in enumerate(reversed(range(n))):
        btype = config.down_block_types[lvl]
        has_attn = btype in ("CrossAttnDownBlock2D", "AttnDownBlock2D")
        cross = btype == "CrossAttnDownBlock2D"
        for j in range(config.layers_per_block + 1):
            p[f"up_{lvl}_resnet_{j}"] = _resnet(sd, f"up_blocks.{ui}.resnets.{j}")
            if has_attn:
                p[f"up_{lvl}_attn_{j}"] = _spatial_transformer(
                    sd, f"up_blocks.{ui}.attentions.{j}",
                    config.transformer_layers_per_block[lvl], cross,
                )
        if lvl > 0:
            p[f"up_{lvl}_upsample"] = {"conv": _conv(sd, f"up_blocks.{ui}.upsamplers.0.conv")}
    return {"params": p}


def unet_lora_name_map(config) -> Dict[str, str]:
    """our param path (module-level) → diffusers module name, for PEFT
    export/import of ``jasperai/flash-*`` adapters."""
    m: Dict[str, str] = {}
    n = len(config.block_out_channels)

    def add_tf(ours: str, theirs: str, depth: int):
        for k in range(depth):
            for attn in ("attn1", "attn2"):
                for proj in ("to_q", "to_k", "to_v"):
                    m[f"{ours}/blocks_{k}/{attn}/{proj}"] = (
                        f"{theirs}.transformer_blocks.{k}.{attn}.{proj}"
                    )
                m[f"{ours}/blocks_{k}/{attn}/to_out"] = (
                    f"{theirs}.transformer_blocks.{k}.{attn}.to_out.0"
                )
            m[f"{ours}/blocks_{k}/ff/proj_in"] = f"{theirs}.transformer_blocks.{k}.ff.net.0.proj"
            m[f"{ours}/blocks_{k}/ff/proj_out"] = f"{theirs}.transformer_blocks.{k}.ff.net.2"
        m[f"{ours}/proj_in"] = f"{theirs}.proj_in"
        m[f"{ours}/proj_out"] = f"{theirs}.proj_out"

    for lvl, btype in enumerate(config.down_block_types):
        if btype == "CrossAttnDownBlock2D":
            for j in range(config.layers_per_block):
                add_tf(
                    f"down_{lvl}_attn_{j}", f"down_blocks.{lvl}.attentions.{j}",
                    config.transformer_layers_per_block[lvl],
                )
    add_tf("mid_attn", "mid_block.attentions.0", config.transformer_layers_per_block[-1])
    for ui, lvl in enumerate(reversed(range(n))):
        if config.down_block_types[lvl] == "CrossAttnDownBlock2D":
            for j in range(config.layers_per_block + 1):
                add_tf(
                    f"up_{lvl}_attn_{j}", f"up_blocks.{ui}.attentions.{j}",
                    config.transformer_layers_per_block[lvl],
                )
    return m


def import_vae(sd: Dict[str, np.ndarray], config) -> Dict[str, Any]:
    """diffusers AutoencoderKL state_dict → AutoencoderKL params."""

    def vae_attn(key):
        return {
            "group_norm": _norm(sd, f"{key}.group_norm"),
            "attention": {
                "to_q": _lin(sd, f"{key}.to_q"),
                "to_k": _lin(sd, f"{key}.to_k"),
                "to_v": _lin(sd, f"{key}.to_v"),
                "to_out": _lin(sd, f"{key}.to_out.0"),
            },
        }

    n = len(config.block_out_channels)
    enc: Dict[str, Any] = {"conv_in": _conv(sd, "encoder.conv_in")}
    for lvl in range(n):
        for j in range(config.layers_per_block):
            enc[f"down_{lvl}_resnet_{j}"] = _resnet(sd, f"encoder.down_blocks.{lvl}.resnets.{j}")
        if lvl < n - 1:
            enc[f"down_{lvl}_downsample"] = _conv(
                sd, f"encoder.down_blocks.{lvl}.downsamplers.0.conv"
            )
    enc["mid_resnet_0"] = _resnet(sd, "encoder.mid_block.resnets.0")
    enc["mid_resnet_1"] = _resnet(sd, "encoder.mid_block.resnets.1")
    if config.mid_block_attn:
        enc["mid_attn"] = vae_attn("encoder.mid_block.attentions.0")
    enc["conv_norm_out"] = _norm(sd, "encoder.conv_norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")

    dec: Dict[str, Any] = {"conv_in": _conv(sd, "decoder.conv_in")}
    dec["mid_resnet_0"] = _resnet(sd, "decoder.mid_block.resnets.0")
    dec["mid_resnet_1"] = _resnet(sd, "decoder.mid_block.resnets.1")
    if config.mid_block_attn:
        dec["mid_attn"] = vae_attn("decoder.mid_block.attentions.0")
    for ui, lvl in enumerate(reversed(range(n))):
        for j in range(config.layers_per_block + 1):
            dec[f"up_{lvl}_resnet_{j}"] = _resnet(sd, f"decoder.up_blocks.{ui}.resnets.{j}")
        if ui < n - 1:
            dec[f"up_{lvl}_upsample"] = _conv(sd, f"decoder.up_blocks.{ui}.upsamplers.0.conv")
    dec["conv_norm_out"] = _norm(sd, "decoder.conv_norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")

    p = {"encoder": enc, "decoder": dec}
    # SD1/SDXL carry 1×1 quant convs; the SD3 VAE drops them
    # (use_quant_conv=False in sd3-medium vae/config.json)
    if getattr(config, "use_quant_conv", True) and "quant_conv.weight" in sd:
        p["quant_conv"] = _conv(sd, "quant_conv")
        p["post_quant_conv"] = _conv(sd, "post_quant_conv")
    return {"params": p}


def import_clip_text(sd: Dict[str, np.ndarray], config) -> Dict[str, Any]:
    """transformers CLIPTextModel(.WithProjection) state_dict → CLIPTextModel params."""
    pre = "text_model." if any(k.startswith("text_model.") for k in sd) else ""
    p: Dict[str, Any] = {
        "token_embedding": sd[f"{pre}embeddings.token_embedding.weight"],
        "position_embedding": sd[f"{pre}embeddings.position_embedding.weight"],
        "final_ln_scale": sd[f"{pre}final_layer_norm.weight"],
        "final_ln_bias": sd[f"{pre}final_layer_norm.bias"],
    }
    for i in range(config.num_layers):
        k = f"{pre}encoder.layers.{i}"
        p[f"layer_{i}"] = {
            "ln1_scale": sd[f"{k}.layer_norm1.weight"],
            "ln1_bias": sd[f"{k}.layer_norm1.bias"],
            "ln2_scale": sd[f"{k}.layer_norm2.weight"],
            "ln2_bias": sd[f"{k}.layer_norm2.bias"],
            "q_proj": _lin(sd, f"{k}.self_attn.q_proj"),
            "k_proj": _lin(sd, f"{k}.self_attn.k_proj"),
            "v_proj": _lin(sd, f"{k}.self_attn.v_proj"),
            "out_proj": _lin(sd, f"{k}.self_attn.out_proj"),
            "fc1": _lin(sd, f"{k}.mlp.fc1"),
            "fc2": _lin(sd, f"{k}.mlp.fc2"),
        }
    if config.projection_dim is not None and "text_projection.weight" in sd:
        p["text_projection"] = {"kernel": sd["text_projection.weight"].T}
    return {"params": p}


def import_t5_encoder(sd: Dict[str, np.ndarray], config) -> Dict[str, Any]:
    """transformers T5EncoderModel state_dict → T5Encoder params."""
    pre = "encoder." if any(k.startswith("encoder.") for k in sd) else ""
    emb_key = "shared.weight" if "shared.weight" in sd else f"{pre}embed_tokens.weight"
    p: Dict[str, Any] = {
        "token_embedding": sd[emb_key],
        "final_ln_scale": sd[f"{pre}final_layer_norm.weight"],
        "relative_attention_bias": sd[
            f"{pre}block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        ],
    }
    for i in range(config.num_layers):
        k = f"{pre}block.{i}.layer"
        p[f"layer_{i}"] = {
            "ln1_scale": sd[f"{k}.0.layer_norm.weight"],
            "q": _lin(sd, f"{k}.0.SelfAttention.q"),
            "k": _lin(sd, f"{k}.0.SelfAttention.k"),
            "v": _lin(sd, f"{k}.0.SelfAttention.v"),
            "o": _lin(sd, f"{k}.0.SelfAttention.o"),
            "ln2_scale": sd[f"{k}.1.layer_norm.weight"],
            "wi_0": _lin(sd, f"{k}.1.DenseReluDense.wi_0"),
            "wi_1": _lin(sd, f"{k}.1.DenseReluDense.wi_1"),
            "wo": _lin(sd, f"{k}.1.DenseReluDense.wo"),
        }
    return {"params": p}


def import_pixart_dit(sd: Dict[str, np.ndarray], config) -> Dict[str, Any]:
    """diffusers PixArt Transformer2DModel state_dict → DiT params.

    Subsumes the reference's Pixart adaLN weight surgery
    (reference: examples/train_flash_pixart.py:88-172): the shared timestep
    embedder and per-block scale_shift_table map onto our AdaLayerNormSingle
    + PixartBlock; extra micro-conditioning embedders (resolution / aspect
    ratio) land in the per-vector MLPs when present.
    """
    p: Dict[str, Any] = {
        "pos_embed_proj": _conv(sd, "pos_embed.proj"),
        "proj_out": _lin(sd, "proj_out"),
        "scale_shift_table_out": sd["scale_shift_table"],
        "caption_projection_1": _lin(sd, "caption_projection.linear_1"),
        "caption_projection_2": _lin(sd, "caption_projection.linear_2"),
    }
    ada = {
        "timestep_embedder": {
            "linear_1": _lin(sd, "adaln_single.emb.timestep_embedder.linear_1"),
            "linear_2": _lin(sd, "adaln_single.emb.timestep_embedder.linear_2"),
        },
        "linear": _lin(sd, "adaln_single.linear"),
    }
    # Micro-conditioned (1024-MS) checkpoints: stock diffusers embeds
    # resolution=(h, w) through ONE width-dim//3 embedder (reshaped to
    # 2·dim//3) plus aspect_ratio through another. Our concat-style
    # AdaLayerNormSingle uses 3 per-chunk MLPs — chunks 0/1 (h, w) both
    # take the resolution embedder's weights, chunk 2 the aspect-ratio's
    # (the reference's own surgery: examples/train_flash_pixart.py:88-172).
    extra = {
        0: "adaln_single.emb.resolution_embedder",
        1: "adaln_single.emb.resolution_embedder",
        2: "adaln_single.emb.aspect_ratio_embedder",
    }
    for i, key in extra.items():
        if f"{key}.linear_1.weight" in sd:
            ada[f"vector_embedder_{i}"] = {
                "linear_1": _lin(sd, f"{key}.linear_1"),
                "linear_2": _lin(sd, f"{key}.linear_2"),
            }
    p["adaln_single"] = ada

    for i in range(config.depth):
        k = f"transformer_blocks.{i}"
        blk = {
            "scale_shift_table": sd[f"{k}.scale_shift_table"],
            "attn1": _attention(sd, f"{k}.attn1"),
            "attn2": _attention(sd, f"{k}.attn2"),
            "ff_in": _lin(sd, f"{k}.ff.net.0.proj"),
            "ff_out": _lin(sd, f"{k}.ff.net.2"),
        }
        p[f"block_{i}"] = blk
    return {"params": p}


def import_sd3_mmdit(sd: Dict[str, np.ndarray], config) -> Dict[str, Any]:
    """diffusers SD3Transformer2DModel state_dict → MMDiT params."""
    p: Dict[str, Any] = {
        "pos_embed_proj": _conv(sd, "pos_embed.proj"),
        "context_embedder": _lin(sd, "context_embedder"),
        "timestep_embedder": {
            "linear_1": _lin(sd, "time_text_embed.timestep_embedder.linear_1"),
            "linear_2": _lin(sd, "time_text_embed.timestep_embedder.linear_2"),
        },
        "text_embedder": {
            "linear_1": _lin(sd, "time_text_embed.text_embedder.linear_1"),
            "linear_2": _lin(sd, "time_text_embed.text_embedder.linear_2"),
        },
        "norm_out_linear": _lin(sd, "norm_out.linear"),
        "proj_out": _lin(sd, "proj_out"),
    }
    for i in range(config.depth):
        k = f"transformer_blocks.{i}"
        blk = {
            "norm1_linear": _lin(sd, f"{k}.norm1.linear"),
            "norm1_context_linear": _lin(sd, f"{k}.norm1_context.linear"),
            "to_q": _lin(sd, f"{k}.attn.to_q"),
            "to_k": _lin(sd, f"{k}.attn.to_k"),
            "to_v": _lin(sd, f"{k}.attn.to_v"),
            "to_out": _lin(sd, f"{k}.attn.to_out.0"),
            "add_q_proj": _lin(sd, f"{k}.attn.add_q_proj"),
            "add_k_proj": _lin(sd, f"{k}.attn.add_k_proj"),
            "add_v_proj": _lin(sd, f"{k}.attn.add_v_proj"),
            "ff_in": _lin(sd, f"{k}.ff.net.0.proj"),
            "ff_out": _lin(sd, f"{k}.ff.net.2"),
        }
        if f"{k}.attn.to_add_out.weight" in sd:
            blk["to_add_out"] = _lin(sd, f"{k}.attn.to_add_out")
            blk["ff_context_in"] = _lin(sd, f"{k}.ff_context.net.0.proj")
            blk["ff_context_out"] = _lin(sd, f"{k}.ff_context.net.2")
        if f"{k}.attn.norm_q.weight" in sd:
            blk["norm_q_scale"] = sd[f"{k}.attn.norm_q.weight"]
            blk["norm_k_scale"] = sd[f"{k}.attn.norm_k.weight"]
        p[f"block_{i}"] = blk
    return {"params": p}


def import_clip_vision(sd: Dict[str, np.ndarray], config) -> Dict[str, Any]:
    """transformers CLIPVisionModel(.WithProjection) → CLIPVisionModel params."""
    pre = "vision_model." if any(k.startswith("vision_model.") for k in sd) else ""
    p: Dict[str, Any] = {
        "patch_embedding": _conv(sd, f"{pre}embeddings.patch_embedding"),
        "class_embedding": sd[f"{pre}embeddings.class_embedding"],
        "position_embedding": sd[f"{pre}embeddings.position_embedding.weight"],
        "pre_ln_scale": sd[f"{pre}pre_layrnorm.weight"],
        "pre_ln_bias": sd[f"{pre}pre_layrnorm.bias"],
        "post_ln_scale": sd[f"{pre}post_layernorm.weight"],
        "post_ln_bias": sd[f"{pre}post_layernorm.bias"],
    }
    for i in range(config.num_layers):
        k = f"{pre}encoder.layers.{i}"
        p[f"layer_{i}"] = {
            "ln1_scale": sd[f"{k}.layer_norm1.weight"],
            "ln1_bias": sd[f"{k}.layer_norm1.bias"],
            "ln2_scale": sd[f"{k}.layer_norm2.weight"],
            "ln2_bias": sd[f"{k}.layer_norm2.bias"],
            "q_proj": _lin(sd, f"{k}.self_attn.q_proj"),
            "k_proj": _lin(sd, f"{k}.self_attn.k_proj"),
            "v_proj": _lin(sd, f"{k}.self_attn.v_proj"),
            "out_proj": _lin(sd, f"{k}.self_attn.out_proj"),
            "fc1": _lin(sd, f"{k}.mlp.fc1"),
            "fc2": _lin(sd, f"{k}.mlp.fc2"),
        }
    if config.projection_dim is not None and "visual_projection.weight" in sd:
        p["visual_projection"] = {"kernel": sd["visual_projection.weight"].T}
    return {"params": p}


def import_lpips_torch(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torch ``lpips`` package LPIPS(net='vgg') state_dict → LPIPS params.

    vgg conv indices in torchvision features: stage boundaries at
    [0,2] [5,7] [10,12,14] [17,19,21] [24,26,28]."""
    tv_idx = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]
    vgg: Dict[str, Any] = {}
    for si, idxs in enumerate(tv_idx):
        for ci, t in enumerate(idxs):
            key = f"net.slice{si+1}.{t}" if f"net.slice{si+1}.{t}.weight" in sd else f"net.features.{t}"
            vgg[f"conv{si}_{ci}"] = _conv(sd, key)
    p: Dict[str, Any] = {"vgg": vgg}
    for i in range(5):
        w = sd[f"lins.{i}.model.1.weight"] if f"lins.{i}.model.1.weight" in sd else sd[f"lin{i}.model.1.weight"]
        p[f"lin_{i}"] = {"kernel": w.transpose(2, 3, 1, 0)}
    return {"params": p}
