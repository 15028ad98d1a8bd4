"""SD3 triple-text-encoder conditioning packer.

Replaces the reference's retained ``StableDiffusion3Pipeline.encode_prompt``
(reference: src/flash/models/flash_sd3/flash_diffusion_model.py:195-233) with
framework conditioners: CLIP-L + CLIP-G (hidden states + projected pooled)
and T5, packed to the SD3 context layout —

    crossattn = [ zero-pad(clipL_hidden ⊕ clipG_hidden → t5_dim) ; t5_tokens ]
    vector    = [ clipL_pooled_proj ; clipG_pooled_proj ]          (2048)
"""

from __future__ import annotations

import jax.numpy as jnp

from .text import T5TextEmbedder
from .wrapper import ConditionerWrapper


class T5AsSD3Embedder(T5TextEmbedder):
    """T5 conditioner emitting under ``t5_crossattn`` so the packer can
    distinguish the T5 token stream from the CLIP streams."""

    def __call__(self, params, batch, force_zero=0.0):
        out = super().__call__(params, batch, force_zero)
        renamed = {"t5_crossattn": out["crossattn"]}
        if "attention_mask" in out:
            renamed["attention_mask"] = out["attention_mask"]
        return renamed


class SD3Conditioner(ConditionerWrapper):
    """Wrap [clip_l, clip_g, T5AsSD3Embedder] and pack to SD3 layout.

    ``t5_dim``: when the T5 tower is omitted (the diffusers-sanctioned
    ``text_encoder_3=None`` mode — the SD3 pipeline substitutes zeros for
    the T5 embed), pad the CLIP token stream with zeros to this joint
    width (4096 for SD3-medium) AND append a block of
    ``(B, t5_fallback_len, t5_dim)`` zero "T5 tokens" on the sequence
    axis, exactly as diffusers' ``SD3Pipeline._get_t5_prompt_embeds``
    does with ``text_encoder_3=None`` (zeros of length
    ``tokenizer_max_length`` = 77) — the pretrained MMDiT teacher was
    trained on the 77+77=154-token joint context and its predictions
    shift if the zero block is dropped. Dropping T5-XXL saves ~9.4 GB of
    bf16 weights — the difference between fitting and not fitting one
    16 GB chip.
    """

    def __init__(self, conditioners, t5_dim: int = None, t5_fallback_len: int = 77):
        super().__init__(conditioners)
        self.t5_dim = t5_dim
        self.t5_fallback_len = t5_fallback_len

    def __call__(self, params, batch, rng=None, ucg_keys=None, set_ucg_rate_zero=False):
        out = super().__call__(params, batch, rng, ucg_keys, set_ucg_rate_zero)
        cond = out["cond"]
        clip_tokens = cond.get("crossattn")
        t5_tokens = cond.pop("t5_crossattn", None)
        if t5_tokens is not None and clip_tokens is not None:
            pad = t5_tokens.shape[-1] - clip_tokens.shape[-1]
            if pad > 0:
                clip_tokens = jnp.pad(clip_tokens, ((0, 0), (0, 0), (0, pad)))
            cond["crossattn"] = jnp.concatenate([clip_tokens, t5_tokens], axis=1)
        elif t5_tokens is not None:
            cond["crossattn"] = t5_tokens
        elif clip_tokens is not None and self.t5_dim:
            pad = self.t5_dim - clip_tokens.shape[-1]
            if pad > 0:
                clip_tokens = jnp.pad(clip_tokens, ((0, 0), (0, 0), (0, pad)))
            # diffusers text_encoder_3=None: concat 77 zero T5 tokens on the
            # sequence axis so the joint context keeps its trained length.
            zeros_t5 = jnp.zeros(
                (clip_tokens.shape[0], self.t5_fallback_len, self.t5_dim),
                clip_tokens.dtype,
            )
            cond["crossattn"] = jnp.concatenate([clip_tokens, zeros_t5], axis=1)
        cond.pop("attention_mask", None)  # MMDiT joint attention is unmasked
        return out
