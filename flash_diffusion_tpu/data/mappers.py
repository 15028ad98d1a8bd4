"""Sample mappers (host-side transforms in the streaming pipeline).

Re-derivations of the reference mappers
(reference: src/flash/data/mappers/mappers.py:24-317): key renaming
(conditional/else maps), image transforms (the TorchvisionMapper analog on
PIL/numpy — NHWC outputs for TPU), [0,1]→[-1,1] rescale, JSON key
extraction, key select/remove/set, and a dependency-free Canny edge mapper
(the reference pulls controlnet_aux; here pure numpy Sobel+NMS+hysteresis).
MidasDepthMapper requires a depth model; it accepts a user-supplied callable
(no network in this environment).
"""

from __future__ import annotations

import json
from dataclasses import field
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np
from pydantic.dataclasses import dataclass

from ..config import BaseConfig


@dataclass
class BaseMapperConfig(BaseConfig):
    key: str = "image"


class BaseMapper:
    def __init__(self, config: Optional[BaseMapperConfig] = None):
        self.config = config

    def __call__(self, sample: Dict[str, Any]) -> Dict[str, Any]:
        raise NotImplementedError


class MapperWrapper:
    """Sequential mapper chain (reference mappers_wrapper.py:6-31)."""

    def __init__(self, mappers):
        self.mappers = list(mappers)

    def __call__(self, sample):
        for m in self.mappers:
            sample = m(sample)
        return sample


# --------------------------------------------------------------------------
@dataclass
class KeyRenameMapperConfig(BaseMapperConfig):
    key_map: Dict[str, str] = field(default_factory=dict)
    condition_key: Optional[str] = None
    condition_fn_key: Optional[str] = None  # unused placeholder for parity
    else_key_map: Optional[Dict[str, str]] = None


class KeyRenameMapper(BaseMapper):
    """Rename keys; with a condition key, apply key_map when
    ``condition(sample[condition_key])`` else else_key_map
    (reference mappers.py:24-83)."""

    def __init__(self, config: KeyRenameMapperConfig, condition: Optional[Callable] = None):
        super().__init__(config)
        self.condition = condition

    def __call__(self, sample):
        cfg = self.config
        key_map = cfg.key_map
        if cfg.condition_key is not None and self.condition is not None:
            if not self.condition(sample.get(cfg.condition_key)):
                key_map = cfg.else_key_map or {}
        out = dict(sample)
        for old, new in key_map.items():
            if old in out:
                out[new] = out.pop(old)
        return out


# --------------------------------------------------------------------------
def _to_pil(x):
    from PIL import Image

    if isinstance(x, Image.Image):
        return x
    if isinstance(x, np.ndarray):
        return Image.fromarray(x)
    raise TypeError(type(x))


def center_crop(img, size: Tuple[int, int]):
    w, h = img.size
    tw, th = size[1], size[0]
    left, top = (w - tw) // 2, (h - th) // 2
    return img.crop((left, top, left + tw, top + th))


def random_crop(img, size: Tuple[int, int], rng: np.random.Generator):
    w, h = img.size
    tw, th = size[1], size[0]
    left = int(rng.integers(0, max(w - tw, 0) + 1))
    top = int(rng.integers(0, max(h - th, 0) + 1))
    return img.crop((left, top, left + tw, top + th))


_TRANSFORMS = {
    "Resize": lambda img, size, **kw: img.resize((size[1], size[0]) if isinstance(size, (list, tuple)) else (size, size)),
    "CenterCrop": lambda img, size, **kw: center_crop(img, size if isinstance(size, (list, tuple)) else (size, size)),
    "RandomHorizontalFlip": lambda img, p=0.5, rng=None, **kw: (
        img.transpose(0) if (rng or np.random.default_rng()).random() < p else img
    ),
    "ToTensor": lambda img, **kw: np.asarray(img, np.float32) / 255.0,  # NHWC [0,1]
}


@dataclass
class ImageTransformMapperConfig(BaseMapperConfig):
    # [{"name": "Resize", "size": [512, 512]}, {"name": "CenterCrop", ...},
    #  {"name": "ToTensor"}] — the TorchvisionMapper analog (mappers.py:86+)
    transforms: List[dict] = field(default_factory=list)
    output_key: Optional[str] = None
    seed: Optional[int] = None


class ImageTransformMapper(BaseMapper):
    def __init__(self, config: ImageTransformMapperConfig):
        super().__init__(config)
        self.rng = np.random.default_rng(config.seed)

    def __call__(self, sample):
        x = sample[self.config.key]
        for spec in self.config.transforms:
            spec = dict(spec)
            name = spec.pop("name")
            if name != "ToTensor" and not hasattr(x, "size"):
                x = _to_pil(x)
            x = _TRANSFORMS[name](x, rng=self.rng, **spec)
        out = dict(sample)
        out[self.config.output_key or self.config.key] = x
        return out


@dataclass
class RescaleMapperConfig(BaseMapperConfig):
    pass


class RescaleMapper(BaseMapper):
    """[0,1] → [-1,1] (reference mappers.py RescaleMapper)."""

    def __call__(self, sample):
        out = dict(sample)
        out[self.config.key] = np.asarray(out[self.config.key], np.float32) * 2.0 - 1.0
        return out


@dataclass
class KeysFromJSONMapperConfig(BaseMapperConfig):
    key: str = "json"
    keys_to_extract: List[str] = field(default_factory=list)
    remove_original: bool = False
    strict: bool = True


class KeysFromJSONMapper(BaseMapper):
    def __call__(self, sample):
        cfg = self.config
        out = dict(sample)
        payload = out[cfg.key]
        if isinstance(payload, (bytes, str)):
            payload = json.loads(payload)
        for k in cfg.keys_to_extract:
            if k in payload:
                out[k] = payload[k]
            elif cfg.strict:
                raise KeyError(f"{k} missing from json payload")
        if cfg.remove_original:
            out.pop(cfg.key, None)
        return out


@dataclass
class SelectKeysMapperConfig(BaseMapperConfig):
    keys: List[str] = field(default_factory=list)


class SelectKeysMapper(BaseMapper):
    def __call__(self, sample):
        return {k: sample[k] for k in self.config.keys if k in sample}


@dataclass
class RemoveKeysMapperConfig(BaseMapperConfig):
    keys: List[str] = field(default_factory=list)


class RemoveKeysMapper(BaseMapper):
    def __call__(self, sample):
        return {k: v for k, v in sample.items() if k not in self.config.keys}


@dataclass
class SetValueMapperConfig(BaseMapperConfig):
    key: str = "value"
    value: Any = None


class SetValueMapper(BaseMapper):
    def __call__(self, sample):
        out = dict(sample)
        out[self.config.key] = self.config.value
        return out


# --------------------------------------------------------------------------
@dataclass
class CannyEdgeMapperConfig(BaseMapperConfig):
    key: str = "image"
    output_key: str = "edge"
    low_threshold: float = 0.1
    high_threshold: float = 0.2


class CannyEdgeMapper(BaseMapper):
    """Dependency-free Canny (Sobel → NMS → hysteresis) producing a 3-channel
    [0,1] edge map (the reference uses controlnet_aux CannyDetector,
    mappers.py CannyEdgeMapper)."""

    def __call__(self, sample):
        cfg = self.config
        img = np.asarray(sample[cfg.key], np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        if img.ndim == 3:
            gray = img @ np.array([0.299, 0.587, 0.114], np.float32)
        else:
            gray = img
        # gaussian blur 5x5
        k = np.array([1, 4, 6, 4, 1], np.float32)
        k = np.outer(k, k) / 256.0
        g = _conv2(gray, k)
        gx = _conv2(g, np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32))
        gy = _conv2(g, np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], np.float32))
        mag = np.hypot(gx, gy)
        mag = mag / (mag.max() + 1e-8)
        ang = np.rad2deg(np.arctan2(gy, gx)) % 180
        nms = _nms(mag, ang)
        strong = nms >= cfg.high_threshold
        weak = (nms >= cfg.low_threshold) & ~strong
        edges = _hysteresis(strong, weak)
        out = dict(sample)
        out[cfg.output_key] = np.repeat(edges[..., None].astype(np.float32), 3, axis=-1)
        return out


def _conv2(x, k):
    kh, kw = k.shape
    ph, pw = kh // 2, kw // 2
    xp = np.pad(x, ((ph, ph), (pw, pw)), mode="edge")
    windows = np.lib.stride_tricks.sliding_window_view(xp, k.shape)
    return np.einsum("ijkl,kl->ij", windows, k)


def _nms(mag, ang):
    out = np.zeros_like(mag)
    shifted = {
        0: (np.roll(mag, 1, 1), np.roll(mag, -1, 1)),
        45: (np.roll(np.roll(mag, 1, 0), -1, 1), np.roll(np.roll(mag, -1, 0), 1, 1)),
        90: (np.roll(mag, 1, 0), np.roll(mag, -1, 0)),
        135: (np.roll(np.roll(mag, 1, 0), 1, 1), np.roll(np.roll(mag, -1, 0), -1, 1)),
    }
    bucket = (np.round(ang / 45.0) % 4) * 45
    for b, (a, c) in shifted.items():
        m = bucket == b
        out[m] = np.where((mag[m] >= a[m]) & (mag[m] >= c[m]), mag[m], 0.0)
    return out


def _hysteresis(strong, weak, iters: int = 8):
    edges = strong.copy()
    for _ in range(iters):
        grown = edges.copy()
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                grown |= np.roll(np.roll(edges, dy, 0), dx, 1)
        new = grown & weak & ~edges
        if not new.any():
            break
        edges |= new
    return edges


@dataclass
class DepthMapperConfig(BaseMapperConfig):
    key: str = "image"
    output_key: str = "depth"


class DepthMapper(BaseMapper):
    """Depth-map conditioning (the reference's MidasDepthMapper pulls a Midas
    model from controlnet_aux). Network-free here: inject any
    ``depth_fn(image HWC float) -> HW float``."""

    def __init__(self, config: DepthMapperConfig, depth_fn: Callable[[np.ndarray], np.ndarray]):
        super().__init__(config)
        self.depth_fn = depth_fn

    def __call__(self, sample):
        out = dict(sample)
        d = self.depth_fn(np.asarray(sample[self.config.key], np.float32))
        out[self.config.output_key] = np.repeat(d[..., None], 3, axis=-1)
        return out
