"""Shared wiring for the example training scripts.

The reference scripts each hand-build teachers from HF pipelines with weight
surgery (reference: examples/train_flash_sdxl.py:59-300). Here model bodies
are first-party; weights import once from local HF checkpoint folders via
flash_diffusion_tpu.utils.hf (zero-egress environments pass
``--random-init`` to smoke-test wiring without weights).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from typing import Dict, Optional

# make the repo root importable regardless of invocation cwd
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import yaml


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="yaml experiment config")
    ap.add_argument("--weights-root", default=None, help="local HF checkpoint root")
    ap.add_argument("--random-init", action="store_true", help="skip weight import")
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--output-dir", default="runs")
    ap.add_argument(
        "--resume", action="store_true",
        help="restore the latest Orbax checkpoint from the run's checkpoint "
        "dir and continue (step/rng/optimizer/EMA state included)",
    )
    return ap.parse_args()


def maybe_resume(pipeline, args):
    """Latest-checkpoint auto-resume (SLURM-restart analog; the reference
    relies on Lightning ckpt_path for this)."""
    if not getattr(args, "resume", False):
        return None
    from flash_diffusion_tpu.trainer import restore_state

    state, step = restore_state(
        os.path.abspath(pipeline.config.checkpoint_dir), pipeline.init_state()
    )
    if state is None:
        logging.warning("--resume: no checkpoint under %s, starting fresh",
                        pipeline.config.checkpoint_dir)
        return None
    logging.info("resumed from step %d", step)
    return state


def load_yaml(path: str) -> Dict:
    with open(path) as f:
        return yaml.safe_load(f)


def setup_logging(output_dir: str):
    """File + console logging (reference trainer/utils.py:10-38 setup_logging)."""
    os.makedirs(output_dir, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        handlers=[
            logging.StreamHandler(),
            logging.FileHandler(os.path.join(output_dir, "train.log")),
        ],
    )


def init_params_shape_only(module, *args, rng=None, **kwargs):
    """Shape-init (abstract eval + zeros) for --random-init smoke runs.

    Returns HOST (numpy) zeros: frozen trees must stay off-device until
    TrainingPipeline has applied its storage dtype and sharding — SDXL's
    frozen stack is ~14 GB in fp32, which OOMs a 16 GB chip if the fp32
    originals land on device before the bf16 cast."""
    import numpy as np

    rng = rng or jax.random.PRNGKey(0)
    shapes = jax.eval_shape(lambda: module.init(rng, *args, **kwargs))
    return jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), shapes)


def maybe_import(path: Optional[str], importer, config, random_init: bool, init_fn):
    """Import HF weights when available; otherwise random/zero init.

    Accepts either a single ``model.safetensors`` or a sharded checkpoint
    (``model.safetensors.index.json`` + ``model-XXXXX-of-YYYYY.safetensors``
    in the same directory — how T5-XXL towers ship on the hub)."""
    from flash_diffusion_tpu.utils.hf import load_torch_state_dict

    if not random_init and path is not None and not os.path.exists(path):
        index = path + ".index.json"
        if os.path.exists(index):
            import json

            with open(index) as f:
                weight_map = json.load(f)["weight_map"]
            sd = {}
            base = os.path.dirname(path)
            for shard in sorted(set(weight_map.values())):
                sd.update(load_torch_state_dict(os.path.join(base, shard)))
            return importer(sd, config)
    if random_init or path is None or not os.path.exists(path):
        if not random_init:
            logging.warning("weights not found at %s — using random init", path)
        return init_fn()
    sd = load_torch_state_dict(path)
    return importer(sd, config)


def build_data(cfg: Dict, extra_filters_mappers=()):
    from flash_diffusion_tpu.data import (
        DataModuleConfig,
        DataPipeline,
        FilterOnCondition,
        FilterOnConditionConfig,
        ImageTransformMapper,
        ImageTransformMapperConfig,
        KeyFilter,
        KeyFilterConfig,
        KeyRenameMapper,
        KeyRenameMapperConfig,
        KeysFromJSONMapper,
        KeysFromJSONMapperConfig,
        MapperWrapper,
        RescaleMapper,
        RescaleMapperConfig,
    )

    size = cfg.get("IMAGE_SIZE", 512)
    # ASPECT_BUCKETING: true replaces the square Resize+CenterCrop with an
    # SDXL-style aspect-bucket ladder at the same pixel budget; batches are
    # grouped per bucket (one XLA compile per bucket shape) and the mapper
    # emits REAL original/crop/target micro-cond tuples (see data/bucketing.py)
    bucketing = bool(cfg.get("ASPECT_BUCKETING", False))
    # DECODER: native = C++ fused decode->resize->crop->normalize
    # (data/native_decode.py; GIL-free, thread workers scale per core).
    # Falls back to PIL when the toolchain/libjpeg is absent. Mutually
    # exclusive with bucketing (the native path is fixed-shape).
    native = cfg.get("DECODER", "pil") == "native" and not bucketing
    if native:
        from flash_diffusion_tpu.data.native_decode import is_available

        if not is_available():
            native = False
    if bucketing:
        from flash_diffusion_tpu.data import BucketAssignMapper, BucketAssignMapperConfig

        image_mapper = BucketAssignMapper(
            BucketAssignMapperConfig(
                key="image",
                base_size=size,
                stride=cfg.get("BUCKET_STRIDE", 64),
                max_aspect=cfg.get("BUCKET_MAX_ASPECT", 2.0),
                crop=cfg.get("BUCKET_CROP", "center"),
            )
        )
    elif native:
        from flash_diffusion_tpu.data.native_decode import (
            NativeDecodeMapper,
            NativeDecodeMapperConfig,
        )

        image_mapper = NativeDecodeMapper(
            NativeDecodeMapperConfig(key="image", height=size, width=size)
        )
    chain = [
        KeyFilter(KeyFilterConfig(keys=["jpg", "json"])),
        MapperWrapper(
            [
                KeysFromJSONMapper(
                    KeysFromJSONMapperConfig(
                        key="json", keys_to_extract=["caption", "aesthetic_score"],
                        remove_original=True, strict=False,
                    )
                ),
                KeyRenameMapper(KeyRenameMapperConfig(key_map={"jpg": "image", "caption": "text"})),
                image_mapper
                if (bucketing or native)
                else ImageTransformMapper(
                    ImageTransformMapperConfig(
                        key="image",
                        transforms=[
                            {"name": "Resize", "size": [size, size]},
                            {"name": "CenterCrop", "size": [size, size]},
                            {"name": "ToTensor"},
                        ],
                    )
                ),
                # native decode already emits [-1, 1]
                *([] if native else [RescaleMapper(RescaleMapperConfig(key="image"))]),
            ]
        ),
        FilterOnCondition(
            FilterOnConditionConfig(condition_key="aesthetic_score", strict=False),
            lambda v: v >= cfg.get("MIN_AESTHETIC_SCORE", 6.0),
        ),
        *extra_filters_mappers,
    ]
    data_cfg = DataModuleConfig(
        shards_path_or_urls=cfg["SHARDS_PATH_OR_URLS"],
        per_worker_batch_size=cfg.get("BATCH_SIZE", 2),
        num_workers=cfg.get("NUM_WORKERS", 2),
        shuffle_buffer_size=cfg.get("SHUFFLE_BUFFER_SIZE", 100),
        # JPEG DCT-scaled decode straight to >= train res (2-5x cheaper
        # host decode on large camera sources; no-op when source <= res).
        # With bucketing, draft must cover the LONGEST bucket dim
        # (size·max_aspect) or wide/tall buckets would upscale from the
        # drafted image.
        decode_draft_size=cfg.get(
            "DECODE_DRAFT_SIZE",
            int(size * cfg.get("BUCKET_MAX_ASPECT", 2.0)) if bucketing else size,
        ),
        aspect_bucketing=bucketing,
        decoder="raw_image" if native else "pil",
    )
    return DataPipeline(data_cfg, chain)


def tokenize_batches(batches, tokenizers: Dict[str, callable]):
    """Host-side tokenization stage: adds ``{key}_ids`` (and mask) columns.

    ``tokenizers`` maps batch key → callable(list[str]) → dict of arrays.
    """
    for batch in batches:
        for key, tok in tokenizers.items():
            if key in batch:
                batch.update(tok(batch[key]))
        yield batch
