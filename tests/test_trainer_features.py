"""Trainer features: EMA student leaf, phase-split alternating GAN steps,
validation loop (reference validation_step analog, trainer/trainer.py:220-225).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from flash_diffusion_tpu.distill import (
    ConvDiscriminator,
    DiscriminatorConfig,
    FlashDiffusion,
    FlashDiffusionConfig,
)
from flash_diffusion_tpu.lora import init_lora, lora_scaling
from flash_diffusion_tpu.models import UNet2DCondition, UNetConfig
from flash_diffusion_tpu.models.embedders import (
    ClipEmbedder,
    ClipEmbedderConfig,
    ConditionerWrapper,
)
from flash_diffusion_tpu.trainer import TrainingConfig, TrainingPipeline, export_lora

B, HW, C = 2, 16, 4


def _build(gan_update_mode="simultaneous", **cfg_overrides):
    rng = jax.random.PRNGKey(0)
    unet = UNet2DCondition(
        UNetConfig(
            in_channels=C, out_channels=C, block_out_channels=[16, 32],
            down_block_types=["CrossAttnDownBlock2D", "DownBlock2D"],
            layers_per_block=1, transformer_layers_per_block=[1, 1],
            num_heads=[2, 2], cross_attention_dim=16, norm_num_groups=8,
        )
    )
    cond = ConditionerWrapper(
        [
            ClipEmbedder(
                ClipEmbedderConfig(
                    input_key="text",
                    text_embedder_config=dict(
                        vocab_size=64, hidden_size=16, intermediate_size=32,
                        num_layers=1, num_heads=2, max_positions=8,
                        eos_token_id=63,
                    ),
                )
            )
        ]
    )
    disc = ConvDiscriminator(DiscriminatorConfig(feature_dim=8, num_stages=1))
    batch = {
        "image": jax.random.normal(rng, (B, HW, HW, C)),
        "text_ids": jax.random.randint(rng, (B, 8), 0, 63),
    }
    t0 = jnp.zeros((B,), jnp.int32)
    dummy_cond = {"cond": {"crossattn": jnp.zeros((B, 8, 16))}}
    teacher = unet.init(jax.random.PRNGKey(1), batch["image"], t0, dummy_cond)
    cparams = cond.init(jax.random.PRNGKey(2), batch)
    dparams = disc.init(jax.random.PRNGKey(3), jnp.zeros((B, HW // 2, HW // 2, 32)))
    lora = init_lora(teacher, rank=2, rng=jax.random.PRNGKey(4))

    model = FlashDiffusion(
        FlashDiffusionConfig(
            K=[2], num_iterations_per_K=[100], guidance_scale_min=1.0,
            guidance_scale_max=3.0, use_dmd_loss=False, gan_loss_type="hinge",
            gan_update_mode=gan_update_mode,
        ),
        student_module=unet, teacher_module=unet, conditioner=cond,
        discriminator=disc, lora_scaling=lora_scaling(2),
    )
    pipe = TrainingPipeline(
        model,
        TrainingConfig(learning_rates=[1e-3, 1e-3], **cfg_overrides),
        frozen={"teacher": teacher, "conditioners": cparams},
        lora_init=lora,
        disc_init=dparams,
    )
    return pipe, batch


def _flat(tree):
    return traverse_util.flatten_dict(jax.device_get(tree), sep="/")


def test_ema_leaf_tracks_lora_and_exports():
    pipe, batch = _build(ema_decay=0.5)
    state = pipe.init_state()
    assert jax.tree_util.tree_leaves(state.ema)
    # ema starts equal to lora
    for a, b in zip(
        jax.tree_util.tree_leaves(state.ema), jax.tree_util.tree_leaves(state.lora)
    ):
        np.testing.assert_array_equal(np.array(a), np.array(b))

    step = pipe.step_fn_for_stage(0)
    for _ in range(3):
        state, aux = step(state, pipe.frozen, batch)

    la, ea = _flat(state.lora), _flat(state.ema)
    moved = [k for k in la if not np.allclose(la[k], ea[k])]
    assert moved, "EMA should lag the live student after updates"
    # with decay 0.5 over 3 steps EMA must be strictly between init and live
    diffs = [np.abs(la[k] - ea[k]).max() for k in la]
    assert max(diffs) > 0

    # export_lora prefers the EMA tree
    exported = export_lora(state)
    for a, b in zip(
        jax.tree_util.tree_leaves(exported), jax.tree_util.tree_leaves(state.ema)
    ):
        np.testing.assert_array_equal(np.array(a), np.array(b))


def test_ema_disabled_keeps_empty_leaf_and_exports_live():
    pipe, batch = _build()
    state = pipe.init_state()
    assert not jax.tree_util.tree_leaves(state.ema)
    exported = export_lora(state)
    for a, b in zip(
        jax.tree_util.tree_leaves(exported), jax.tree_util.tree_leaves(state.lora)
    ):
        np.testing.assert_array_equal(np.array(a), np.array(b))


def test_alternating_phase_split_updates_one_tree_per_step():
    pipe, batch = _build(gan_update_mode="alternating")
    assert pipe.alternating
    state = pipe.init_state()
    lora0, disc0 = _flat(state.lora), _flat(state.disc)

    # generator phase: lora moves, disc untouched
    state, _ = pipe.step_fn_for_stage(0, "g")(state, pipe.frozen, batch)
    lora1, disc1 = _flat(state.lora), _flat(state.disc)
    assert any(not np.allclose(lora0[k], lora1[k]) for k in lora0)
    for k in disc0:
        np.testing.assert_array_equal(disc0[k], disc1[k])

    # discriminator phase: disc moves, lora untouched
    state, _ = pipe.step_fn_for_stage(0, "d")(state, pipe.frozen, batch)
    lora2, disc2 = _flat(state.lora), _flat(state.disc)
    assert any(not np.allclose(disc1[k], disc2[k]) for k in disc1)
    for k in lora1:
        np.testing.assert_array_equal(lora1[k], lora2[k])


def test_fit_runs_validation_cadence(caplog):
    import logging

    pipe, batch = _build(val_every_n_steps=2, val_batches=2)

    def batches():
        while True:
            yield dict(batch)

    def eval_batches():
        for _ in range(2):
            yield dict(batch)

    with caplog.at_level(logging.INFO, logger="flash_diffusion_tpu.trainer.trainer"):
        state = pipe.fit(batches(), max_steps=4, eval_data=eval_batches)
    assert int(state.step) == 4
    val_logs = [r for r in caplog.records if "val/" in r.getMessage()]
    assert len(val_logs) == 2  # steps 2 and 4

    # evaluate() directly returns averaged scalars and mutates nothing
    metrics = pipe.evaluate(eval_batches(), state, stage=0, max_batches=2)
    assert any(k.startswith("val/") for k in metrics)
    assert all(np.isfinite(v) for v in metrics.values())


def test_frozen_dtype_bf16_storage_trains():
    """frozen_dtype=bf16 halves frozen HBM storage; float leaves are cast,
    int leaves untouched, and a train step still produces finite losses
    (numerics unchanged: the bf16 modules already cast kernels per-op)."""
    pipe, batch = _build()
    # rebuild with bf16 frozen storage
    pipe2 = TrainingPipeline(
        pipe.model,
        TrainingConfig(learning_rates=[1e-3, 1e-3]),
        frozen=jax.device_get(pipe.frozen),
        lora_init=jax.device_get(pipe._lora_init),
        disc_init=jax.device_get(pipe._disc_init),
        frozen_dtype=jnp.bfloat16,
    )
    for leaf in jax.tree_util.tree_leaves(pipe2.frozen):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.bfloat16
    state = pipe2.init_state()
    # trainable/EMA/optimizer state stays fp32
    assert all(
        l.dtype == jnp.float32 for l in jax.tree_util.tree_leaves(state.lora)
    )
    state, aux = pipe2.step_fn_for_stage(0)(state, pipe2.frozen, batch)
    assert np.isfinite(float(aux["loss/generator"]))


def test_text_encoder_offload_matches_resident():
    """text_encoder_offload: towers live off-mesh; fit() encode-bursts
    conditioning every N batches. Final LoRA must equal the resident path
    bit-for-rng (same per-step cond rng formula), and the pipeline's
    frozen tree must not hold the conditioner params."""
    pipe, batch = _build()

    def data():
        for _ in range(4):
            yield dict(batch)

    state_res = pipe.fit(data(), max_steps=4)

    # fresh identical build (deterministic init keys): the first fit()'s
    # donated buffers may alias pipe's init trees on CPU
    pipe2, _ = _build()
    pipe_off = TrainingPipeline(
        pipe2.model,
        TrainingConfig(learning_rates=[1e-3, 1e-3]),
        frozen=jax.device_get(pipe2.frozen),
        lora_init=jax.device_get(pipe2._lora_init),
        disc_init=jax.device_get(pipe2._disc_init),
        text_encoder_offload=2,
    )
    assert "conditioners" not in pipe_off.frozen
    assert pipe_off._host_conditioners is not None
    state_off = pipe_off.fit(data(), max_steps=4)

    fr, fo = _flat(state_res.lora), _flat(state_off.lora)
    assert fr.keys() == fo.keys()
    for k in fr:
        np.testing.assert_allclose(fr[k], fo[k], rtol=1e-5, atol=1e-6, err_msg=k)

    # evaluate() also works in offload mode (one burst for the pass)
    metrics = pipe_off.evaluate(data(), state_off, stage=0, max_batches=2)
    assert any(k.startswith("val/") for k in metrics)


def test_quality_validator_callback_runs_in_fit():
    """QualityValidator: sample-based feature-FD quality signal at a
    cadence inside fit() (not just loss averaging)."""
    from flash_diffusion_tpu.trainer import QualityValidator

    pipe, batch = _build()

    def provider():
        yield dict(batch)

    def embed(images):
        x = np.asarray(images, np.float32).reshape(np.shape(images)[0], -1)
        rng = np.random.default_rng(0)
        proj = rng.standard_normal((x.shape[1], 8)).astype(np.float32)
        return x @ proj

    qv = QualityValidator(
        provider, input_shape=(HW, HW, C), embed_fn=embed,
        every_n_steps=2, num_batches=1, num_steps=2,
    )

    def data():
        for _ in range(4):
            yield dict(batch)

    pipe.fit(data(), callbacks=[qv], max_steps=4)
    assert len(qv.history) == 2  # steps 2 and 4
    for _, m in qv.history:
        assert np.isfinite(m["val/feature_fd"])


def test_sampling_callbacks_work_with_text_encoder_offload(tmp_path):
    """With text_encoder_offload on, pipeline.frozen has NO "conditioners"
    entry — SampleLogger/QualityValidator must still sample (they use
    pipeline.sampling_frozen(), which places the host towers for the call)."""
    from flash_diffusion_tpu.trainer import QualityValidator, SampleLogger

    pipe0, batch = _build()
    pipe = TrainingPipeline(
        pipe0.model,
        TrainingConfig(learning_rates=[1e-3, 1e-3]),
        frozen=jax.device_get(pipe0.frozen),
        lora_init=jax.device_get(pipe0._lora_init),
        disc_init=jax.device_get(pipe0._disc_init),
        text_encoder_offload=2,
    )
    assert "conditioners" not in pipe.frozen
    with pipe.sampling_frozen() as fr:
        assert "conditioners" in fr
    assert "conditioners" not in pipe.frozen  # freed on exit

    def embed(images):
        x = np.asarray(images, np.float32).reshape(np.shape(images)[0], -1)
        rng = np.random.default_rng(0)
        proj = rng.standard_normal((x.shape[1], 8)).astype(np.float32)
        return x @ proj

    def provider():
        yield dict(batch)

    qv = QualityValidator(
        provider, input_shape=(HW, HW, C), embed_fn=embed,
        every_n_steps=2, num_batches=1, num_steps=2,
    )
    sl = SampleLogger(
        lambda: dict(batch), input_shape=(HW, HW, C),
        out_dir=str(tmp_path), every_n_steps=2, num_steps=(2,), use_wandb=False,
    )

    def data():
        for _ in range(2):
            yield dict(batch)

    pipe.fit(data(), callbacks=[qv, sl], max_steps=2)
    assert len(qv.history) == 1 and np.isfinite(qv.history[0][1]["val/feature_fd"])
    import glob

    assert glob.glob(str(tmp_path / "step*" / "*.png"))


def test_fit_trains_across_aspect_bucket_shapes():
    """Multi-shape training (⊕ aspect bucketing, data/bucketing.py): the
    jitted step retraces once per bucket shape and the same state threads
    through — batches of different (h, w) must interleave freely."""
    pipe, batch = _build()
    wide = {
        "image": jax.random.normal(jax.random.PRNGKey(9), (B, HW, HW + 8, C)),
        "text_ids": batch["text_ids"],
    }

    def data():
        for i in range(4):
            yield dict(batch if i % 2 == 0 else wide)

    state = pipe.fit(data(), max_steps=4)
    assert int(state.step) == 4
    for leaf in jax.tree_util.tree_leaves(state.lora):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_gradient_accumulation_applies_on_boundaries_only():
    """⊕ gradient_accumulation_steps=k: micro-steps accumulate (zero
    update, EMA frozen) and the optimizer applies once per k."""
    pipe, batch = _build(ema_decay=0.5, gradient_accumulation_steps=2)
    state0 = pipe.init_state()
    f0 = _flat(jax.device_get(state0.lora))  # snapshot: step donates state
    e0 = _flat(jax.device_get(state0.ema))
    step = pipe.step_fn_for_stage(0)
    state1, _ = step(state0, pipe.frozen, dict(batch))
    f1 = _flat(state1.lora)
    for k in f0:  # non-boundary micro-step: params untouched
        np.testing.assert_array_equal(f0[k], f1[k], err_msg=k)
    e1 = _flat(state1.ema)
    for k in e0:  # EMA frozen between boundaries
        np.testing.assert_array_equal(e0[k], e1[k], err_msg=k)
    state2, _ = step(state1, pipe.frozen, dict(batch))
    f2 = _flat(state2.lora)
    assert any(not np.array_equal(f0[k], f2[k]) for k in f0)  # boundary applied
    e2 = _flat(state2.ema)
    assert any(not np.array_equal(e0[k], e2[k]) for k in e0)
    for leaf in jax.tree_util.tree_leaves(state2.lora):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_gradient_accumulation_ema_tracks_in_alternating_mode():
    """The EMA boundary must follow the GENERATOR's MultiSteps counter, not
    global step parity — in alternating mode g-phase runs on even steps
    only, where (step+1) % accum would never fire and the EMA would stay
    frozen at its initial value for the whole run."""
    pipe, batch = _build("alternating", ema_decay=0.5, gradient_accumulation_steps=2)
    state = pipe.init_state()
    e0 = _flat(jax.device_get(state.ema))
    for i in range(8):  # g,d,g,d,... → 4 g-calls → 2 generator applications
        phase = "g" if i % 2 == 0 else "d"
        state, _ = pipe.step_fn_for_stage(0, phase)(state, pipe.frozen, dict(batch))
    e1 = _flat(state.ema)
    assert any(not np.array_equal(e0[k], e1[k]) for k in e0), "EMA never decayed"
