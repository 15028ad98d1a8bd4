"""Conditioner wrapper ucg semantics + embedder contracts.

Mirrors the reference's conditioner tests
(reference: tests/test_embedders/test_conditioners_wrapper.py:76-136):
forced ucg zeroes the matching conditioner's outputs; stochastic ucg is
driven by an explicit PRNG key; same-type outputs concatenate on the
feature axis.
"""

import jax
import jax.numpy as jnp
import numpy as np

from flash_diffusion_tpu.models.embedders import (
    ClipEmbedder,
    ClipEmbedderConfig,
    ConditionerWrapper,
    ModuleEmbedder,
    ModuleEmbedderConfig,
    T5TextEmbedder,
    T5TextEmbedderConfig,
    TimestepsEmbedder,
    TimestepsEmbedderConfig,
)

TINY_CLIP = dict(
    vocab_size=32, hidden_size=8, intermediate_size=16, num_layers=1,
    num_heads=2, max_positions=6, eos_token_id=31,
)
TINY_T5 = dict(vocab_size=32, d_model=8, d_ff=16, d_kv=4, num_layers=1, num_heads=2)


def _batch():
    return {
        "text_ids": jnp.array([[1, 2, 3, 31, 0, 0], [4, 5, 31, 0, 0, 0]]),
        "size": jnp.array([[512.0, 512.0], [256.0, 768.0]]),
    }


def test_clip_embedder_outputs_and_pooled():
    emb = ClipEmbedder(
        ClipEmbedderConfig(
            input_key="text", text_embedder_config=TINY_CLIP,
            layer="hidden", layer_idx=-2, always_return_pooled=True,
        )
    )
    batch = _batch()
    params = emb.init(jax.random.PRNGKey(0), batch)
    out = emb(params, batch)
    assert out["crossattn"].shape == (2, 6, 8)
    assert out["vector"].shape == (2, 8)

    zeroed = emb(params, batch, force_zero=1.0)
    assert np.allclose(np.array(zeroed["crossattn"]), 0)
    assert np.allclose(np.array(zeroed["vector"]), 0)


def test_t5_embedder_mask_survives_ucg():
    emb = T5TextEmbedder(
        T5TextEmbedderConfig(input_key="text", text_embedder_config=TINY_T5)
    )
    batch = dict(_batch())
    batch["text_mask"] = jnp.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 0, 0, 0]])
    params = emb.init(jax.random.PRNGKey(0), batch)
    out = emb(params, batch, force_zero=1.0)
    assert np.allclose(np.array(out["crossattn"]), 0)
    assert np.array_equal(np.array(out["attention_mask"]), np.array(batch["text_mask"]))


def test_timesteps_embedder_vector_output():
    emb = TimestepsEmbedder(TimestepsEmbedderConfig(input_key="size", num_channels=8))
    out = emb({}, _batch())
    assert out["vector"].shape == (2, 16)
    assert not np.allclose(np.array(out["vector"]), 0)


def test_module_embedder_concat_inference():
    emb = ModuleEmbedder(
        ModuleEmbedderConfig(
            input_key="lowres",
            layers=[{"layer": "Conv", "features": 2, "kernel_size": [3, 3], "padding": 1}, {"layer": "silu"}],
        )
    )
    batch = {"lowres": jnp.ones((2, 8, 8, 3))}
    params = emb.init(jax.random.PRNGKey(0), batch)
    out = emb(params, batch)
    assert "concat" in out and out["concat"].shape == (2, 8, 8, 2)


def test_wrapper_concat_and_forced_ucg():
    clip1 = ClipEmbedder(
        ClipEmbedderConfig(input_key="text", text_embedder_config=TINY_CLIP, layer="last")
    )
    clip2 = ClipEmbedder(
        ClipEmbedderConfig(input_key="text", text_embedder_config=TINY_CLIP, layer="last")
    )
    size = TimestepsEmbedder(TimestepsEmbedderConfig(input_key="size", num_channels=4))
    wrapper = ConditionerWrapper([clip1, clip2, size])
    batch = _batch()
    params = wrapper.init(jax.random.PRNGKey(0), batch)

    out = wrapper(params, batch, set_ucg_rate_zero=True)["cond"]
    assert out["crossattn"].shape == (2, 6, 16)  # two CLIPs concat on features
    assert out["vector"].shape == (2, 8)

    # forced ucg on "text" zeroes only the crossattn (both CLIPs), not vector
    out_u = wrapper(params, batch, ucg_keys=["text"])["cond"]
    assert np.allclose(np.array(out_u["crossattn"]), 0)
    assert not np.allclose(np.array(out_u["vector"]), 0)


def test_wrapper_stochastic_ucg_traced():
    clip = ClipEmbedder(
        ClipEmbedderConfig(
            input_key="text", ucg_rate=1.0, text_embedder_config=TINY_CLIP, layer="last"
        )
    )
    wrapper = ConditionerWrapper([clip])
    batch = _batch()
    params = wrapper.init(jax.random.PRNGKey(0), batch)
    # ucg_rate=1.0 with an rng → always dropped
    out = wrapper(params, batch, rng=jax.random.PRNGKey(1))["cond"]
    assert np.allclose(np.array(out["crossattn"]), 0)
    # set_ucg_rate_zero disables stochastic dropout
    out2 = wrapper(params, batch, rng=jax.random.PRNGKey(1), set_ucg_rate_zero=True)["cond"]
    assert not np.allclose(np.array(out2["crossattn"]), 0)
    # jit-compatible
    f = jax.jit(lambda p, b, r: wrapper(p, b, rng=r)["cond"]["crossattn"])
    assert f(params, batch, jax.random.PRNGKey(2)).shape == (2, 6, 8)


def test_sd3_conditioner_no_t5_pads_to_joint_dim():
    """SD3Conditioner without a T5 tower (diffusers text_encoder_3=None
    mode) zero-pads the CLIP token stream to t5_dim so the MMDiT context
    embedder sees the same input width."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flash_diffusion_tpu.models.embedders import (
        ClipEmbedder,
        ClipEmbedderConfig,
        SD3Conditioner,
    )

    clip = ClipEmbedder(
        ClipEmbedderConfig(
            input_key="text", text_embedder_config=TINY_CLIP, layer="hidden",
            layer_idx=-2,
        )
    )
    cond = SD3Conditioner([clip], t5_dim=64, t5_fallback_len=5)
    batch = {"text_ids": jnp.zeros((2, 6), jnp.int32)}
    params = cond.init(jax.random.PRNGKey(0), batch)
    out = cond(params, batch)["cond"]
    tokens = out["crossattn"]
    assert tokens.shape[-1] == 64
    # diffusers text_encoder_3=None: CLIP stream (6 tokens) + zero T5 block
    # (t5_fallback_len tokens) on the sequence axis.
    assert tokens.shape[1] == 6 + 5
    hidden = TINY_CLIP["hidden_size"]
    assert np.all(np.asarray(tokens[:, :6, hidden:]) == 0.0)  # channel pad
    assert np.any(np.asarray(tokens[:, :6, :hidden]) != 0.0)
    assert np.all(np.asarray(tokens[:, 6:, :]) == 0.0)  # zero T5 tokens
