"""Eval metrics math + FlashPipeline generation surface."""

import jax
import jax.numpy as jnp
import numpy as np

from flash_diffusion_tpu.eval import (
    FIDStats,
    clip_preprocess,
    clip_score,
    fid_from_features,
    frechet_distance,
)


def test_frechet_distance_identity_and_shift():
    rng = np.random.default_rng(0)
    f = rng.normal(size=(500, 8))
    assert fid_from_features(f, f) < 1e-8
    # mean shift by d in every dim → FID ≈ 8·d²
    f2 = f + 0.5
    fid = fid_from_features(f, f2)
    assert abs(fid - 8 * 0.25) < 0.1


def test_fid_streaming_matches_batch():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(300, 6))
    stats = FIDStats()
    for i in range(0, 300, 100):
        stats.update(a[i : i + 100])
    mu, cov = stats.finalize()
    assert np.allclose(mu, a.mean(0), atol=1e-12)
    assert np.allclose(cov, np.cov(a.T), atol=1e-10)


def test_clip_score_range():
    img = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    txt = jnp.array([[1.0, 0.0], [0.0, -1.0]])
    # pair 0: cos=1 → 100; pair 1: cos=-1 → clamped 0; mean = 50
    assert float(clip_score(img, txt)) == 50.0


def test_clip_preprocess_shapes():
    x = jnp.zeros((2, 64, 64, 3))
    out = clip_preprocess(x, size=32)
    assert out.shape == (2, 32, 32, 3)
    # zeros in [-1,1] → 0.5 in [0,1] → (0.5-mean)/std
    expect = (0.5 - np.array([0.48145466, 0.4578275, 0.40821073])) / np.array(
        [0.26862954, 0.26130258, 0.27577711]
    )
    assert np.allclose(np.array(out[0, 0, 0]), expect, atol=1e-5)


def test_flash_pipeline_generate_and_lora():
    from flash_diffusion_tpu import FlashPipeline
    from flash_diffusion_tpu.lora import init_lora
    from flash_diffusion_tpu.models import UNet2DCondition, UNetConfig
    from flash_diffusion_tpu.models.embedders import (
        ClipEmbedder,
        ClipEmbedderConfig,
        ConditionerWrapper,
    )

    B, HW, C = 2, 8, 4
    unet = UNet2DCondition(
        UNetConfig(
            in_channels=C, out_channels=C, block_out_channels=[8, 16],
            down_block_types=["CrossAttnDownBlock2D", "DownBlock2D"],
            layers_per_block=1, transformer_layers_per_block=[1, 1],
            num_heads=[2, 2], cross_attention_dim=8, norm_num_groups=4,
        )
    )
    emb = ClipEmbedder(
        ClipEmbedderConfig(
            input_key="text",
            text_embedder_config=dict(
                vocab_size=32, hidden_size=8, intermediate_size=16, num_layers=1,
                num_heads=2, max_positions=6, eos_token_id=31,
            ),
        )
    )
    cond = ConditionerWrapper([emb])
    ids = jnp.array([[1, 2, 31, 0, 0, 0], [3, 31, 0, 0, 0, 0]])
    params = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((B, HW, HW, C)), jnp.zeros((B,), jnp.int32),
        {"cond": {"crossattn": jnp.zeros((B, 6, 8))}},
    )
    cond_params = cond.init(jax.random.PRNGKey(1), {"text_ids": ids})

    def tokenizer_fn(texts):
        return {"text_ids": np.array(ids)[: len(texts)]}

    pipe = FlashPipeline(
        unet, params, conditioner=cond, conditioner_params=cond_params,
        tokenizer_fn=tokenizer_fn, latent_shape=(HW, HW, C),
    )
    out = pipe.generate(["a", "b"], num_inference_steps=2, guidance_scale=0.0)
    assert out.shape == (B, HW, HW, C)
    assert np.all(np.isfinite(np.array(out)))

    # LoRA with zero B leaves output unchanged; scaled random B changes it
    lora = init_lora(params, rank=2, rng=jax.random.PRNGKey(2))
    pipe.load_lora(lora, scaling=1.0)
    out2 = pipe.generate(["a", "b"], num_inference_steps=2, guidance_scale=0.0)
    assert np.allclose(np.array(out), np.array(out2), atol=1e-6)

    bumped = jax.tree_util.tree_map(lambda x: x + 0.05, lora)
    pipe.load_lora(bumped, scaling=1.0)
    out3 = pipe.generate(["a", "b"], num_inference_steps=2, guidance_scale=0.0)
    assert not np.allclose(np.array(out), np.array(out3))

    pipe.unload_lora()
    out4 = pipe.generate(["a", "b"], num_inference_steps=2, guidance_scale=0.0)
    assert np.allclose(np.array(out), np.array(out4), atol=1e-6)


def test_eval_harness_end_to_end_with_shards(tmp_path):
    """The full quality-gate path: synthetic tar shards -> DataPipeline ->
    FlashPipeline 4-NFE generation -> InceptionV3-pool3 FID + CLIP-FID/
    CLIPScore via the CLIP vision tower — produces finite numbers."""
    import io
    import json as _json
    import tarfile

    from PIL import Image

    from flash_diffusion_tpu import FlashPipeline
    from flash_diffusion_tpu.data import (
        DataModuleConfig,
        DataPipeline,
        ImageTransformMapper,
        ImageTransformMapperConfig,
        KeyRenameMapper,
        KeyRenameMapperConfig,
        KeysFromJSONMapper,
        KeysFromJSONMapperConfig,
        MapperWrapper,
        RescaleMapper,
        RescaleMapperConfig,
    )
    from flash_diffusion_tpu.eval import evaluate
    from flash_diffusion_tpu.models import UNet2DCondition, UNetConfig
    from flash_diffusion_tpu.models.embedders import (
        ClipEmbedder,
        ClipEmbedderConfig,
        ConditionerWrapper,
    )

    # --- shard set -------------------------------------------------------
    rng = np.random.default_rng(0)
    path = str(tmp_path / "eval.tar")
    with tarfile.open(path, "w") as tf:
        for idx in range(4):
            img = Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{idx:06d}.png")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            meta = _json.dumps({"caption": f"p {idx}"}).encode()
            info = tarfile.TarInfo(f"{idx:06d}.json")
            info.size = len(meta)
            tf.addfile(info, io.BytesIO(meta))

    chain = [
        MapperWrapper(
            [
                KeysFromJSONMapper(
                    KeysFromJSONMapperConfig(
                        key="json", keys_to_extract=["caption"], remove_original=True,
                        strict=False,
                    )
                ),
                KeyRenameMapper(KeyRenameMapperConfig(key_map={"png": "image", "caption": "text"})),
                ImageTransformMapper(
                    ImageTransformMapperConfig(
                        key="image",
                        transforms=[{"name": "Resize", "size": [8, 8]}, {"name": "ToTensor"}],
                    )
                ),
                RescaleMapper(RescaleMapperConfig(key="image")),
            ]
        )
    ]
    data = DataPipeline(
        DataModuleConfig(
            shards_path_or_urls=[path], per_worker_batch_size=2, num_workers=1,
            shuffle_buffer_size=1,
        ),
        chain,
    )

    # --- tiny pipeline ---------------------------------------------------
    B, HW, C = 2, 8, 4
    unet = UNet2DCondition(
        UNetConfig(
            in_channels=C, out_channels=C, block_out_channels=[8, 16],
            down_block_types=["CrossAttnDownBlock2D", "DownBlock2D"],
            layers_per_block=1, transformer_layers_per_block=[1, 1],
            num_heads=[2, 2], cross_attention_dim=8, norm_num_groups=4,
        )
    )
    emb = ClipEmbedder(
        ClipEmbedderConfig(
            input_key="text",
            text_embedder_config=dict(
                vocab_size=32, hidden_size=8, intermediate_size=16, num_layers=1,
                num_heads=2, max_positions=6, eos_token_id=31,
            ),
        )
    )
    cond = ConditionerWrapper([emb])
    ids = jnp.array([[1, 2, 31, 0, 0, 0], [3, 31, 0, 0, 0, 0]])
    params = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((B, HW, HW, C)), jnp.zeros((B,), jnp.int32),
        {"cond": {"crossattn": jnp.zeros((B, 6, 8))}},
    )
    cond_params = cond.init(jax.random.PRNGKey(1), {"text_ids": ids})

    # fake VAE-free pipeline: latents ARE 4-ch images; pad to 3ch via a
    # wrapper? Simpler: treat channel-sliced latents as RGB for metrics.
    pipe = FlashPipeline(
        unet, params, conditioner=cond, conditioner_params=cond_params,
        latent_shape=(HW, HW, C),
    )

    # tokenized batches (the mapper chain yields text; tokenize here)
    def batches():
        for b in data.batches(epoch=0):
            b = dict(b)
            b["text_ids"] = np.array(ids)[: b["image"].shape[0]]
            # metrics consume 3-channel [-1,1]; generation is 4-ch latents
            yield b

    # inception on random-init import (deterministic synthetic weights)
    from flash_diffusion_tpu.models.inception import InceptionV3Pool3, import_inception_v3
    from flax import traverse_util as tu

    shapes = jax.eval_shape(
        lambda: InceptionV3Pool3().init(jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)))
    )["params"]
    sd = {}
    r2 = np.random.RandomState(1)
    for k, s in tu.flatten_dict(shapes, sep=".").items():
        if k.endswith(".conv.kernel"):
            prefix = k[: -len(".conv.kernel")]
            kh, kw, cin, cout = s.shape
            sd[f"{prefix}.conv.weight"] = r2.randn(cout, cin, kh, kw).astype(np.float32) * 0.05
            sd[f"{prefix}.bn.weight"] = np.ones(cout, np.float32)
            sd[f"{prefix}.bn.bias"] = np.zeros(cout, np.float32)
            sd[f"{prefix}.bn.running_mean"] = np.zeros(cout, np.float32)
            sd[f"{prefix}.bn.running_var"] = np.ones(cout, np.float32)
    incep_params = import_inception_v3(sd)

    class RGBWrapper:
        """Adapter: generated 4-ch latents -> 3-ch 'images' for metrics."""

        def generate(self, batch, **kw):
            out = pipe.generate(batch, **kw)
            return out[..., :3]

    metrics = evaluate(
        RGBWrapper(),
        batches(),
        num_inference_steps=2,
        max_batches=2,
        inception_params=incep_params,
    )
    assert metrics["num_samples"] == 4
    assert np.isfinite(metrics["fid"]) and metrics["fid"] >= 0.0
