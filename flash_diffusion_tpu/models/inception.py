"""InceptionV3 pool3 feature extractor (FID features), flax/NHWC.

First-party re-implementation of torchvision's ``inception_v3`` trunk
(through the 2048-d global-average pool). The reference publishes COCO FID
claims with no in-repo eval code (reference README.md:57; SURVEY.md §6), so
this plus eval/metrics.py IS the framework's quality gate.

Two variants are supported via ``InceptionV3Pool3(fid_variant=...)``:

- ``fid_variant=False`` (default): torchvision's stock ``inception_v3``
  semantics; loads the ``inception_v3_google-*.pth`` torchvision weights.
  FID values are internally consistent (valid for A/B comparisons and
  training curves) but NOT comparable to published tables.
- ``fid_variant=True``: the CANONICAL pytorch-fid semantics — the
  ``pt_inception-2015-12-05`` checkpoint's modified blocks
  (FIDInceptionA/C/E_1: ``count_include_pad=False`` branch avg-pools;
  FIDInceptionE_2 [Mixed_7c]: max-pool branch). With that checkpoint on
  disk this produces pool3 features bit-matching pytorch-fid's, so FID is
  directly comparable to published COCO tables. The state-dict naming is
  identical to torchvision's, so the same importer serves both (the FID
  checkpoint's 1008-class fc is dropped like torchvision's 1000-class one).

Inference-only: BatchNorm is folded into per-channel (scale, bias) applied
after each conv — ``import_inception_v3`` computes them from a torchvision
state_dict (γ/√(σ²+eps), β − μ·scale). Weights load offline from a local
``inception_v3_google-*.pth``-style file; no network access is attempted.

Input: NHWC images in [-1, 1] (pytorch-fid's (x−0.5)/0.5 normalization),
resized to 299² by the caller or via ``preprocess``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BasicConv(nn.Module):
    """conv (no bias) + folded-BN scale/bias + relu."""

    features: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: Any = 0

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        elif isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(
            self.features, self.kernel, strides=self.stride, padding=pad,
            use_bias=False, name="conv",
        )(x)
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return nn.relu(x * scale + bias)


def _avg_pool3(x, fid=False):
    # pytorch-fid's FIDInception blocks pass count_include_pad=False: edge
    # windows divide by the number of REAL elements, not the window size
    return nn.avg_pool(
        x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
        count_include_pad=not fid,
    )


def _max_pool3s1(x):
    return nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))


def _max_pool3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    pool_features: int
    fid: bool = False

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = BasicConv(self.pool_features, (1, 1), name="branch_pool")(
            _avg_pool3(x, self.fid)
        )
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max_pool3s2(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    fid: bool = False

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = BasicConv(192, (1, 1), name="branch_pool")(_avg_pool3(x, self.fid))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max_pool3s2(x)], axis=-1)


class InceptionE(nn.Module):
    # branch_pool mode: "avg" (torchvision), "avg_fid" (FIDInceptionE_1,
    # count_include_pad=False), "max" (FIDInceptionE_2)
    pool: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate(
            [
                BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
                BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
            ],
            axis=-1,
        )
        bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [
                BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
                BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
            ],
            axis=-1,
        )
        pooled = (
            _max_pool3s1(x) if self.pool == "max" else _avg_pool3(x, self.pool == "avg_fid")
        )
        bp = BasicConv(192, (1, 1), name="branch_pool")(pooled)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Pool3(nn.Module):
    """The FID feature trunk; returns [B, 2048] pool3 features.

    ``fid_variant=True`` applies pytorch-fid's FIDInception block semantics
    (see module docstring); parameter names/shapes are identical either way.
    """

    fid_variant: bool = False

    @nn.compact
    def __call__(self, x):
        fid = self.fid_variant
        x = BasicConv(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _max_pool3s2(x)
        x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool3s2(x)
        x = InceptionA(32, fid=fid, name="Mixed_5b")(x)
        x = InceptionA(64, fid=fid, name="Mixed_5c")(x)
        x = InceptionA(64, fid=fid, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, fid=fid, name="Mixed_6b")(x)
        x = InceptionC(160, fid=fid, name="Mixed_6c")(x)
        x = InceptionC(160, fid=fid, name="Mixed_6d")(x)
        x = InceptionC(192, fid=fid, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(pool="avg_fid" if fid else "avg", name="Mixed_7b")(x)
        x = InceptionE(pool="max" if fid else "avg", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # global average pool → [B, 2048]


def preprocess(images: jnp.ndarray, size: int = 299) -> jnp.ndarray:
    """[-1,1] NHWC → bilinear-resized to 299² (pytorch-fid convention)."""
    b, h, w, c = images.shape
    if (h, w) != (size, size):
        images = jax.image.resize(images, (b, size, size, c), method="bilinear")
    return images


def import_inception_v3(sd: Dict[str, np.ndarray], eps: float = 1e-3) -> Dict[str, Any]:
    """torchvision ``inception_v3`` state_dict → InceptionV3Pool3 params.

    Folds each BatchNorm into (scale, bias); drops the fc head and AuxLogits.
    Accepts torch tensors or numpy arrays.
    """

    def arr(v):
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    out: Dict[str, Any] = {}
    prefixes = sorted(
        {k[: -len(".conv.weight")] for k in sd if k.endswith(".conv.weight")}
    )
    for prefix in prefixes:
        if prefix.startswith("AuxLogits"):
            continue
        w = arr(sd[f"{prefix}.conv.weight"]).transpose(2, 3, 1, 0)  # OIHW→HWIO
        gamma = arr(sd[f"{prefix}.bn.weight"])
        beta = arr(sd[f"{prefix}.bn.bias"])
        mean = arr(sd[f"{prefix}.bn.running_mean"])
        var = arr(sd[f"{prefix}.bn.running_var"])
        scale = gamma / np.sqrt(var + eps)
        node: Dict[str, Any] = out
        for part in prefix.split("."):
            node = node.setdefault(part, {})
        node["conv"] = {"kernel": jnp.asarray(w)}
        node["scale"] = jnp.asarray(scale)
        node["bias"] = jnp.asarray(beta - mean * scale)
    return {"params": out}


def load_inception_v3(path: str):
    """Load a local torchvision inception_v3 checkpoint (.pth/.safetensors)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
    return import_inception_v3(sd)
