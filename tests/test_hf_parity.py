"""Golden numerical parity vs HuggingFace torch reference models.

Hermetic: tiny random-weight configs built locally (no network). Validates
both our flax encoder bodies AND the utils/hf converters in one shot —
import a random torch state_dict, run both frameworks, compare outputs.
(The reference relies on transformers/diffusers directly; this is our
checkpoint-border equivalence proof.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def test_clip_text_parity():
    from transformers import CLIPTextConfig as HFCLIPConfig
    from transformers.models.clip.modeling_clip import CLIPTextModelWithProjection

    from flash_diffusion_tpu.models import CLIPTextConfig, CLIPTextModel
    from flash_diffusion_tpu.utils.hf import import_clip_text

    hf_cfg = HFCLIPConfig(
        vocab_size=99,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=16,
        projection_dim=24,
        eos_token_id=98,
        bos_token_id=97,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = CLIPTextModelWithProjection(hf_cfg).eval()

    ids = torch.tensor([[97, 5, 6, 7, 98, 0, 0, 0], [97, 10, 98, 0, 0, 0, 0, 0]])
    with torch.no_grad():
        out = hf(ids, output_hidden_states=True)

    cfg = CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, max_positions=16, projection_dim=24, eos_token_id=98,
        hidden_act="quick_gelu",
    )
    model = CLIPTextModel(cfg)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = import_clip_text(sd, cfg)
    mine = model.apply(params, jnp.asarray(ids.numpy()))

    np.testing.assert_allclose(
        np.array(mine["last_hidden_state"]), out.last_hidden_state.numpy(), atol=2e-5
    )
    # penultimate hidden state (the SDXL conditioning tap)
    np.testing.assert_allclose(
        np.array(mine["hidden_states"][-2]), out.hidden_states[-2].numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.array(mine["text_embeds"]), out.text_embeds.numpy(), atol=2e-5
    )


def test_clip_vision_parity():
    from transformers import CLIPVisionConfig as HFVisionConfig
    from transformers.models.clip.modeling_clip import CLIPVisionModelWithProjection

    from flash_diffusion_tpu.models.vision import CLIPVisionConfig, CLIPVisionModel
    from flash_diffusion_tpu.utils.hf import import_clip_vision

    hf_cfg = HFVisionConfig(
        image_size=32,
        patch_size=8,
        hidden_size=24,
        intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=4,
        projection_dim=16,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = CLIPVisionModelWithProjection(hf_cfg).eval()
    images = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        out = hf(images)

    cfg = CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=24, intermediate_size=48,
        num_layers=2, num_heads=4, projection_dim=16, hidden_act="quick_gelu",
    )
    model = CLIPVisionModel(cfg)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = import_clip_vision(sd, cfg)
    mine = model.apply(params, jnp.asarray(images.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.array(mine["image_embeds"]), out.image_embeds.numpy(), atol=3e-5
    )


def test_t5_encoder_parity():
    from transformers import T5Config as HFT5Config
    from transformers.models.t5.modeling_t5 import T5EncoderModel

    from flash_diffusion_tpu.models import T5Config, T5Encoder
    from flash_diffusion_tpu.utils.hf import import_t5_encoder

    hf_cfg = HFT5Config(
        vocab_size=120,
        d_model=32,
        d_ff=64,
        d_kv=8,
        num_layers=2,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=16,
        feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
        is_encoder_decoder=False,
        use_cache=False,
    )
    torch.manual_seed(0)
    hf = T5EncoderModel(hf_cfg).eval()

    ids = torch.tensor([[3, 4, 5, 6, 1, 0, 0, 0], [9, 1, 0, 0, 0, 0, 0, 0]])
    mask = torch.tensor([[1, 1, 1, 1, 1, 0, 0, 0], [1, 1, 0, 0, 0, 0, 0, 0]])
    with torch.no_grad():
        out = hf(ids, attention_mask=mask).last_hidden_state

    cfg = T5Config(
        vocab_size=120, d_model=32, d_ff=64, d_kv=8, num_layers=2, num_heads=4,
        relative_buckets=8, relative_max_distance=16,
    )
    model = T5Encoder(cfg)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = import_t5_encoder(sd, cfg)
    mine = model.apply(params, jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.array(mine), out.numpy(), atol=3e-5)
