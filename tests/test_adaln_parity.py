"""AdaLayerNormSingle concat semantics vs a torch re-implementation of the
reference's custom module (src/flash/models/transformers/utils.py:62-102):
per-vector embedding MLPs of width dim // num_vector_conditionings whose
outputs are CONCATENATED (not summed) and added to the timestep embedding.

Also checks that stock micro-conditioned Pixart checkpoint widths
(resolution/aspect embedders at dim//3) drop into our per-chunk MLPs the
way the reference's own surgery wires them
(reference examples/train_flash_pixart.py:88-172)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from flash_diffusion_tpu.models.dit import AdaLayerNormSingle


def sinusoidal(t: torch.Tensor, dim: int) -> torch.Tensor:
    """diffusers Timesteps(flip_sin_to_cos=True, downscale_freq_shift=0)."""
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / half
    emb = torch.exp(exponent)[None, :] * t.float()[:, None]
    return torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)


class TorchTimestepEmbedding(tnn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.linear_1 = tnn.Linear(in_ch, out_ch)
        self.linear_2 = tnn.Linear(out_ch, out_ch)

    def forward(self, x):
        return self.linear_2(torch.nn.functional.silu(self.linear_1(x)))


class TorchRefAdaLNSingle(tnn.Module):
    """Plain-torch re-statement of the reference forward (utils.py:74-102),
    concat-conditioning branch."""

    def __init__(self, dim, num_vec, in_dim=256):
        super().__init__()
        self.dim, self.num_vec, self.in_dim = dim, num_vec, in_dim
        self.timestep_embedder = TorchTimestepEmbedding(256, dim)
        self.add_embedding = tnn.ModuleList(
            [TorchTimestepEmbedding(in_dim, dim // num_vec) for _ in range(num_vec)]
        )
        self.linear = tnn.Linear(dim, 6 * dim)

    def forward(self, timestep, vector_conditioning):
        emb = self.timestep_embedder(sinusoidal(timestep, 256))
        chunks = torch.chunk(vector_conditioning, self.num_vec, dim=1)
        emb = emb + torch.cat(
            [self.add_embedding[i](chunks[i]) for i in range(self.num_vec)], dim=1
        )
        return self.linear(torch.nn.functional.silu(emb)), emb


def _lin_params(mod: tnn.Linear):
    return {
        "kernel": jnp.asarray(mod.weight.detach().numpy().T),
        "bias": jnp.asarray(mod.bias.detach().numpy()),
    }


def test_adaln_single_concat_matches_reference_torch():
    torch.manual_seed(0)
    dim, num_vec, in_dim = 48, 3, 16
    ref = TorchRefAdaLNSingle(dim, num_vec, in_dim)

    ours = AdaLayerNormSingle(dim, num_vector_embeds=num_vec, vector_embed_dim=in_dim)
    params = {
        "params": {
            "timestep_embedder": {
                "linear_1": _lin_params(ref.timestep_embedder.linear_1),
                "linear_2": _lin_params(ref.timestep_embedder.linear_2),
            },
            "linear": _lin_params(ref.linear),
            **{
                f"vector_embedder_{i}": {
                    "linear_1": _lin_params(ref.add_embedding[i].linear_1),
                    "linear_2": _lin_params(ref.add_embedding[i].linear_2),
                }
                for i in range(num_vec)
            },
        }
    }

    t = np.array([10.0, 500.0], np.float32)
    # raw scalars -> both sides sinusoidally embed per column
    scalars = np.array([[512.0, 768.0, 1.5], [1024.0, 1024.0, 1.0]], np.float32)
    vec_torch = torch.cat(
        [sinusoidal(torch.tensor(scalars[:, i]), in_dim) for i in range(num_vec)],
        dim=1,
    )

    mod_ref, emb_ref = ref(torch.tensor(t), vec_torch)

    # path 1: our module gets raw scalars (embeds in-module)
    mod_j, emb_j = ours.apply(params, jnp.asarray(t), jnp.asarray(scalars))
    np.testing.assert_allclose(
        np.array(mod_j), mod_ref.detach().numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.array(emb_j), emb_ref.detach().numpy(), rtol=1e-4, atol=1e-4
    )

    # path 2: pre-embedded conditioner output (torch.chunk contract)
    mod_j2, _ = ours.apply(
        params, jnp.asarray(t), jnp.asarray(vec_torch.numpy())
    )
    np.testing.assert_allclose(
        np.array(mod_j2), mod_ref.detach().numpy(), rtol=1e-4, atol=1e-4
    )


def test_pixart_microcond_import_widths():
    """A micro-conditioned Pixart state_dict (resolution/aspect embedders at
    dim//3) must import into the concat AdaLayerNormSingle without shape
    surgery: chunks 0/1 <- resolution embedder, chunk 2 <- aspect ratio."""
    from flash_diffusion_tpu.models.dit import DiT, DiTConfig
    from flash_diffusion_tpu.utils.hf import import_pixart_dit

    cfg = DiTConfig(
        hidden_size=48,
        depth=1,
        num_heads=2,
        caption_channels=24,
        num_vector_embeds=3,
        vector_embed_dim=16,
        sample_size=8,
    )
    dim, sub, in_dim = 48, 16, 16
    rng = np.random.RandomState(0)

    def t_lin(i, o):
        return rng.randn(o, i).astype(np.float32), rng.randn(o).astype(np.float32)

    sd = {}

    def put(prefix, i, o):
        w, b = t_lin(i, o)
        sd[f"{prefix}.weight"] = torch.tensor(w)
        sd[f"{prefix}.bias"] = torch.tensor(b)

    put("adaln_single.emb.timestep_embedder.linear_1", 256, dim)
    put("adaln_single.emb.timestep_embedder.linear_2", dim, dim)
    put("adaln_single.emb.resolution_embedder.linear_1", in_dim, sub)
    put("adaln_single.emb.resolution_embedder.linear_2", sub, sub)
    put("adaln_single.emb.aspect_ratio_embedder.linear_1", in_dim, sub)
    put("adaln_single.emb.aspect_ratio_embedder.linear_2", sub, sub)
    put("adaln_single.linear", dim, 6 * dim)
    put("caption_projection.linear_1", 24, dim)
    put("caption_projection.linear_2", dim, dim)
    put("proj_out", dim, cfg.out_channels * 2 * 2)
    sd["scale_shift_table"] = torch.tensor(rng.randn(2, dim).astype(np.float32))
    sd["pos_embed.proj.weight"] = torch.tensor(rng.randn(dim, 4, 2, 2).astype(np.float32))
    sd["pos_embed.proj.bias"] = torch.tensor(rng.randn(dim).astype(np.float32))
    for k in ["attn1", "attn2"]:
        for proj, i, o in [
            ("to_q", dim, dim),
            ("to_k", dim, dim),
            ("to_v", dim, dim),
            ("to_out.0", dim, dim),
        ]:
            put(f"transformer_blocks.0.{k}.{proj}", i, o)
    put("transformer_blocks.0.ff.net.0.proj", dim, 4 * dim)
    put("transformer_blocks.0.ff.net.2", 4 * dim, dim)
    sd["transformer_blocks.0.scale_shift_table"] = torch.tensor(
        rng.randn(6, dim).astype(np.float32)
    )

    sd = {k: v.numpy() if isinstance(v, torch.Tensor) else v for k, v in sd.items()}
    params = import_pixart_dit(sd, cfg)

    model = DiT(cfg)
    x = jnp.ones((1, 8, 8, 4))
    t = jnp.array([10])
    cond = {
        "cond": {
            "crossattn": jnp.ones((1, 6, 24)),
            "vector": jnp.array([[512.0, 768.0, 1.5]]),
        }
    }
    out = model.apply(params, x, t, cond)
    assert out.shape == (1, 8, 8, 4)
    assert np.all(np.isfinite(np.array(out)))
    # chunks 0 and 1 share the resolution embedder weights
    ve = params["params"]["adaln_single"]
    np.testing.assert_array_equal(
        np.array(ve["vector_embedder_0"]["linear_1"]["kernel"]),
        np.array(ve["vector_embedder_1"]["linear_1"]["kernel"]),
    )
