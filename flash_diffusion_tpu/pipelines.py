"""FlashPipeline — end-to-end text→image inference (the serving surface).

The reference ships no in-repo inference layer: users load the published
PEFT LoRA into a HF ``DiffusionPipeline`` with LCMScheduler
(reference: README.md:316-405). This module is the equivalent user surface
for the TPU framework: one object holding the denoiser + VAE + conditioners
+ LoRA, with a fully jitted ``generate`` (tokenize host-side → encode →
K-step flash sampling → decode) and PEFT adapter loading, including
training-free composition with style LoRAs (README.md:371-405) by summing
scaled adapter deltas.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .lora import merge_lora
from .schedulers import REGISTRY, SchedulerConfig
from .schedulers.base import split_step_key


class FlashPipeline:
    """Few-step text-to-image pipeline.

    Args:
      denoiser: flax module (UNet2DCondition / DiT / MMDiT).
      params: denoiser params (base weights).
      conditioner: ConditionerWrapper (+ its params).
      vae: AutoencoderKL module + params.
      tokenizer_fn: callable(list[str]) -> dict of id arrays (host-side).
      scheduler: sampling scheduler name (default the published LCM setting).
      latent_shape: (H, W, C) latent dims of the target resolution.
    """

    def __init__(
        self,
        denoiser,
        params,
        conditioner=None,
        conditioner_params=None,
        vae=None,
        vae_params=None,
        tokenizer_fn: Optional[Callable[[List[str]], Dict[str, np.ndarray]]] = None,
        scheduler: str = "LCMScheduler",
        scheduler_config: Optional[SchedulerConfig] = None,
        latent_shape: Tuple[int, int, int] = (64, 64, 4),
        vae_scale_factor: int = 8,
    ):
        self.denoiser = denoiser
        self.base_params = params
        self.params = params
        self.conditioner = conditioner
        self.conditioner_params = conditioner_params
        self.vae = vae
        self.vae_params = vae_params
        self.tokenizer_fn = tokenizer_fn
        self.scheduler_name = scheduler
        self.sched_mod = REGISTRY[scheduler]
        self.sched_config = scheduler_config or SchedulerConfig()
        self.latent_shape = tuple(latent_shape)
        self.vae_scale_factor = vae_scale_factor
        # optional: path -> (lora_tree, scaling) loader with the right
        # name-map baked in (builders set this; serving's /loras uses it)
        self.lora_loader: Optional[Callable[[str], Tuple[Any, float]]] = None
        # optional: (n, height_px, width_px) -> extra batch keys for
        # size-conditioned families (SDXL original/crop/target tuples,
        # Pixart resolution_ar). Applied on the str-prompt path only — a
        # dict batch is the caller's full specification.
        self.size_cond_fn: Optional[Callable[[int, int, int], Dict[str, Any]]] = None
        # decode the batch in serial chunks of this size (None = whole
        # batch). Whole-batch decode is fastest (BASELINE.md round-4 decode
        # journey) but its temps peak at ~2 GB/image at 1024²; with the text
        # towers resident (full serving stack) a 16 GB chip needs chunking
        # at batch >= 8. Traced into the graph -> part of the jit cache key.
        self.decode_chunk: Optional[int] = None
        self._adapters: Dict[str, Tuple[Any, float]] = {}
        self._generate_jit = {}
        self._cond_jit = None
        self._params_sig = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), params)
        self._quant_mode: Optional[str] = None
        self._quant_min_dim = 256

    # -- LoRA management (README.md:318-405 parity) ---------------------
    @property
    def adapters(self) -> Dict[str, float]:
        """Loaded adapter names → scaling (read-only view)."""
        return {n: s for n, (_, s) in self._adapters.items()}

    def load_lora(self, lora_tree, scaling: float = 1.0, name: str = "default"):
        """Attach a LoRA adapter (e.g. from lora.load_peft_safetensors).

        Adapter mutations REBIND ``_adapters`` to a fresh dict (never mutate
        in place): concurrent readers (a serving dispatch mid-_refresh, a
        parallel /loras call) always iterate a consistent snapshot."""
        self._adapters = {**self._adapters, name: (lora_tree, scaling)}
        self._refresh()

    def set_adapter_scale(self, name: str, scaling: float):
        tree, _ = self._adapters[name]
        self._adapters = {**self._adapters, name: (tree, scaling)}
        self._refresh()

    def unload_lora(self, name: str = "default"):
        self._adapters = {k: v for k, v in self._adapters.items() if k != name}
        self._refresh()

    def _refresh(self):
        params = self.base_params
        for tree, scale in list(self._adapters.values()):
            params = merge_lora(params, tree, scale)
        if self._quant_mode == "int8":
            from .quant import quantize_dense

            params, n = quantize_dense(params, min_dim=self._quant_min_dim)
            if n == 0:
                raise ValueError("int8 quantization matched no Dense kernels")
        # The warm jitted graphs take params as an ARGUMENT, so a plain LoRA
        # merge (same leaf shapes/dtypes) swaps in without any retrace — the
        # serving /loras contract. Only a signature change (int8 quantize
        # rewrites leaf dtypes and the tree structure) invalidates them.
        sig = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), params)
        if self._params_sig is not None and sig != self._params_sig:
            self._generate_jit.clear()
        self._params_sig = sig
        self.params = params

    def shard_tp(self, mesh, axis: str = "model", shard_conditioners: bool = True):
        """Tensor-parallel serving placement: Megatron column/row specs on
        the denoiser's attention/MLP kernels over ``mesh``'s model axis
        (parallel/tp.py), VAE replicated. jit's SPMD partitioner inserts
        the all-reduces, and the Pallas attention kernel partitions
        per-shard through its custom_partitioning rule (ops/attention.py)
        instead of forcing a per-layer all-gather.

        Text towers TP-shard too by default (their q/k/v/out and wi/wo
        kernels match the same Megatron patterns) — that is what makes
        triple-encoder SD3 serving fit: T5-XXL's 9.4 GB bf16 splits across
        the model axis instead of replicating per chip. Pass
        ``shard_conditioners=False`` to replicate them instead.

        For serving models larger than one chip's HBM — the reference has
        no parallelism beyond DDP training (SURVEY.md §2.2)."""
        from .parallel import replicate, shard_params_tp

        self._tp_mesh = (mesh, axis)
        self.base_params = shard_params_tp(self.base_params, mesh, axis)
        if self.vae_params is not None:
            self.vae_params = replicate(self.vae_params, mesh)
        if self.conditioner_params is not None:
            if shard_conditioners:
                place = lambda p: shard_params_tp(p, mesh, axis) if isinstance(p, dict) else p
            else:
                place = lambda p: replicate(p, mesh)
            if isinstance(self.conditioner_params, (list, tuple)):
                self.conditioner_params = [place(p) for p in self.conditioner_params]
            else:
                self.conditioner_params = place(self.conditioner_params)
        self._generate_jit.clear()
        self._refresh()

    def quantize(self, mode: str = "int8", min_dim: int = 256):
        """Opt-in W8A8 int8 serving mode (see quant.py). LoRA adapters merge
        at full precision first; re-quantizes on every adapter change."""
        if mode not in ("int8", "none"):
            raise ValueError(mode)
        self._quant_mode = None if mode == "none" else mode
        self._quant_min_dim = min_dim
        self._refresh()

    # -- generation -----------------------------------------------------
    def _embed(self, batch_inputs, ucg_keys=None, set_ucg_rate_zero=False):
        """Jitted conditioner pass. Eager flax ``apply`` dispatches every op
        separately — for the dual-CLIP(+T5) stacks that is hundreds of tiny
        device round-trips per request; one jit makes text encoding a single
        dispatch. Non-array keys (raw prompt strings) never feed embedder
        compute and are filtered out before tracing."""
        def jittable(v):
            # keep arrays and numeric lists/scalars (valid jit args); drop
            # anything carrying strings (raw prompts feed the tokenizer,
            # never embedder compute)
            return all(
                not isinstance(leaf, (str, bytes))
                for leaf in jax.tree_util.tree_leaves(v)
            )

        arrays = {k: v for k, v in batch_inputs.items() if jittable(v)}
        if self._cond_jit is None:

            def f(params, arrays, ucg_keys, set_zero):
                return self.conditioner(
                    params, dict(arrays),
                    ucg_keys=list(ucg_keys) if ucg_keys else None,
                    set_ucg_rate_zero=set_zero,
                )

            self._cond_jit = jax.jit(f, static_argnames=("ucg_keys", "set_zero"))
        return self._cond_jit(
            self.conditioner_params, arrays,
            ucg_keys=tuple(ucg_keys) if ucg_keys else (),
            set_zero=set_ucg_rate_zero,
        )

    def _build_generate(self, num_steps: int, guidance_scale: float, batch: int):
        sched = self.sched_mod.set_timesteps(self.sched_config, num_steps)
        do_cfg = guidance_scale not in (0.0, 1.0)
        stochastic = self.scheduler_name in (
            "LCMScheduler",
            "FlashFlowMatchEulerDiscreteScheduler",
            "DDPMScheduler",
            "EulerAncestralDiscreteScheduler",
        )
        has_carry = hasattr(self.sched_mod, "init_state")

        def fn(params, vae_params, cond, uncond, z, rng):
            sample = z * sched.init_noise_sigma
            if do_cfg and cond is not None:
                cond2 = jax.tree_util.tree_map(
                    lambda a, b: jnp.concatenate([a, b]), cond, uncond
                )
            else:
                cond2 = cond

            def body(carry, i):
                s, aux, key = carry
                t = sched.timesteps[i]
                inp = self.sched_mod.scale_model_input(sched, s, i)
                if do_cfg:
                    both = jnp.concatenate([inp, inp], axis=0)
                    t2 = jnp.broadcast_to(t, (2 * batch,))
                    pred2 = self.denoiser.apply(params, both, t2, cond2)
                    pc, pu = jnp.split(pred2, 2, axis=0)
                    pred = guidance_scale * pc + (1.0 - guidance_scale) * pu
                else:
                    pred = self.denoiser.apply(
                        params, inp, jnp.broadcast_to(t, (batch,)), cond2
                    )
                key, sub = split_step_key(key)
                if has_carry:
                    s, aux = self.sched_mod.step(sched, pred, i, s, aux)
                else:
                    s = self.sched_mod.step(sched, pred, i, s, key=sub if stochastic else None)
                return (s, aux, key), None

            init = (
                sample,
                self.sched_mod.init_state(sample) if has_carry else jnp.zeros_like(sample),
                rng,
            )
            (sample, _, _), _ = jax.lax.scan(body, init, jnp.arange(num_steps))
            if self.vae is not None:
                decode = lambda s: self.vae.apply(
                    vae_params, s, method=self.vae.decode_latents
                )
                dc = self.decode_chunk
                if dc and dc < batch and batch % dc == 0:
                    # serial chunked decode: peak decode temps scale with
                    # the chunk, not the batch (lax.map serializes)
                    chunks = sample.reshape(batch // dc, dc, *sample.shape[1:])
                    imgs = jax.lax.map(decode, chunks)
                    return imgs.reshape(batch, *imgs.shape[2:])
                return decode(sample)
            return sample

        return jax.jit(fn)

    def generate(
        self,
        prompts: Sequence[str] | Dict[str, Any],
        num_inference_steps: int = 4,
        guidance_scale: float = 0.0,
        negative_prompts: Optional[Sequence[str]] = None,
        seed: int | Sequence[int] = 0,
        latents: Optional[jnp.ndarray] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
    ) -> jnp.ndarray:
        """Images in [-1, 1] NHWC. The published 4-NFE setting is the
        default: 4 steps, guidance 0 (no CFG doubling).

        ``seed`` may be a sequence of per-sample seeds (len == batch): then
        BOTH the initial latent and the whole per-step stochastic-scheduler
        noise chain of sample ``j`` derive only from ``seed[j]`` — the image
        is bit-identical at any batch size / slot (the serving batcher's
        determinism contract). A scalar seed keeps the classic single-chain
        behavior (one batch-shaped draw per step).

        ``height``/``width`` (pixels, both or neither; multiples of
        8·vae_scale_factor so latent dims stay UNet/patch-aligned) override
        the default resolution — each distinct shape compiles once (jit
        shape cache), after which it serves at full speed."""
        if isinstance(prompts, dict):
            batch_inputs = prompts
            batch = next(
                len(v) if isinstance(v, (list, tuple)) else v.shape[0]
                for v in prompts.values()
                if isinstance(v, (list, tuple)) or hasattr(v, "shape")
            )
        else:
            assert self.tokenizer_fn is not None, "tokenizer_fn required for str prompts"
            batch_inputs = dict(self.tokenizer_fn(list(prompts)))
            batch_inputs["text"] = list(prompts)
            batch = len(prompts)

        if (height is None) != (width is None):
            raise ValueError("pass both height and width, or neither")
        lshape = self.latent_shape
        if height is not None:
            f = self.vae_scale_factor
            align = 8 * f  # latent dims divisible by 8 (UNet 3-level / patch)
            if height <= 0 or width <= 0 or height % align or width % align:
                raise ValueError(f"height/width must be positive multiples of {align}")
            lshape = (height // f, width // f, self.latent_shape[-1])
        if self.size_cond_fn is not None and not isinstance(prompts, dict):
            h_px = (height or self.latent_shape[0] * self.vae_scale_factor)
            w_px = (width or self.latent_shape[1] * self.vae_scale_factor)
            batch_inputs.update(self.size_cond_fn(batch, h_px, w_px))

        cond = uncond = None
        if self.conditioner is not None:
            cond = self._embed(batch_inputs, set_ucg_rate_zero=True)
            if guidance_scale not in (0.0, 1.0):
                if negative_prompts is not None:
                    neg = dict(self.tokenizer_fn(list(negative_prompts)))
                    if self.size_cond_fn is not None:
                        # size conds accompany the uncond branch too (ucg
                        # drops text, not geometry)
                        h_px = height or self.latent_shape[0] * self.vae_scale_factor
                        w_px = width or self.latent_shape[1] * self.vae_scale_factor
                        neg.update(self.size_cond_fn(len(negative_prompts), h_px, w_px))
                    uncond = self._embed(neg, set_ucg_rate_zero=True)
                else:
                    uncond = self._embed(
                        batch_inputs,
                        ucg_keys=[c.input_key for c in self.conditioner.conditioners],
                    )

        if isinstance(seed, (list, tuple, np.ndarray)):
            if len(seed) != batch:
                raise ValueError(f"got {len(seed)} seeds for batch {batch}")
            base = jnp.stack([jax.random.PRNGKey(int(s)) for s in seed])
            ks = jax.vmap(jax.random.split)(base)  # [B, 2, 2]
            kz, rng = ks[:, 0], ks[:, 1]  # latent keys, per-sample step chains
            if latents is None:
                latents = jax.vmap(lambda k: jax.random.normal(k, lshape))(kz)
        else:
            rng = jax.random.PRNGKey(seed)
            if latents is None:
                rng, kz = jax.random.split(rng)
                latents = jax.random.normal(kz, (batch, *lshape))

        key = (num_inference_steps, guidance_scale, batch, self.decode_chunk)
        # single dict lookup + local ref: a concurrent _refresh() (LoRA
        # hot-swap from another thread) clears the cache between ops, and a
        # check-then-index would KeyError mid-dispatch
        fn = self._generate_jit.get(key)
        if fn is None:
            fn = self._generate_jit[key] = self._build_generate(*key[:3])
        return fn(self.params, self.vae_params, cond, uncond, latents, rng)
