"""ctypes wrapper for the native JPEG data-plane (data/native/fastjpeg.cpp).

One C call fuses decode → DCT prescale → bilinear cover-resize →
center-crop → float32 [-1,1]; ctypes releases the GIL for its duration,
so THREAD decode workers scale across host cores — no fork()/spawn()
process pools (and none of their multithreaded-JAX-parent hazards).

The shared library builds lazily on first use (g++ -O3 against the
system libjpeg-turbo) into ``data/native/`` and is reused afterwards.
Environments without g++/libjpeg fall back to the PIL path
(``is_available()`` gates every caller).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SRC = os.path.join(_DIR, "fastjpeg.cpp")
_LIB = os.path.join(_DIR, "libfastjpeg.so")
_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    base = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-ljpeg", "-o", _LIB]
    for extra in (["-march=native", "-funroll-loops"], []):  # fallback sans -march
        try:
            subprocess.run(base[:2] + extra + base[2:], check=True,
                           capture_output=True, timeout=120)
            return True
        except Exception as e:
            last = e
    logger.warning("native decoder build failed (%s); using PIL", last)
    return False


def _load():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.fj_decode_to_tensor.argtypes = [
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.fj_decode_to_tensor.restype = ctypes.c_int
            _lib = lib
        except OSError as e:
            logger.warning("native decoder load failed (%s); using PIL", e)
            _failed = True
        return _lib


def is_available() -> bool:
    return _load() is not None


def decode_to_tensor(
    data: bytes, height: int, width: int
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """JPEG bytes → (float32 [-1,1] HWC (height, width, 3), original (h, w)).

    Raises ValueError on undecodable input (callers' warn_and_continue
    treats it like any other corrupt member)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    out = np.empty((height, width, 3), np.float32)
    orig = (ctypes.c_int * 2)()
    rc = lib.fj_decode_to_tensor(
        data,
        len(data),
        height,
        width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        orig,
    )
    if rc != 0:
        raise ValueError(f"native jpeg decode failed (rc={rc})")
    return out, (int(orig[0]), int(orig[1]))


from pydantic.dataclasses import dataclass  # noqa: E402

from .mappers import BaseMapper, BaseMapperConfig  # noqa: E402


@dataclass
class NativeDecodeMapperConfig(BaseMapperConfig):
    """key holds RAW jpeg bytes (pipeline ``decoder: "raw"`` mode)."""

    height: int = 512
    width: int = 512
    output_key: Optional[str] = None
    emit_micro_conds: bool = False  # SDXL original_size tuple from the real file


class NativeDecodeMapper(BaseMapper):
    """Raw JPEG bytes → float32 [-1,1] (h, w, 3) in ONE native call
    (replaces decode + Resize + CenterCrop + ToTensor + Rescale).

    Non-JPEG images (png/webp — already PIL-decoded by the pipeline's
    ``raw_image`` mode, which only keeps jpg bytes raw) take an equivalent
    PIL cover-resize + center-crop path instead of being dropped."""

    def _pil_fallback(self, img):
        cfg = self.config
        img = img.convert("RGB") if img.mode != "RGB" else img
        w0, h0 = img.size
        from PIL import Image

        s = max(cfg.height / h0, cfg.width / w0)
        rw, rh = max(cfg.width, round(w0 * s)), max(cfg.height, round(h0 * s))
        img = img.resize((rw, rh), Image.BILINEAR)
        left, top = (rw - cfg.width) // 2, (rh - cfg.height) // 2
        img = img.crop((left, top, left + cfg.width, top + cfg.height))
        return np.asarray(img, np.float32) / 127.5 - 1.0, (h0, w0)

    def __call__(self, sample):
        cfg = self.config
        data = sample[cfg.key]
        if isinstance(data, (bytes, bytearray)):
            arr, (h0, w0) = decode_to_tensor(bytes(data), cfg.height, cfg.width)
        elif hasattr(data, "size") and hasattr(data, "crop"):  # PIL image
            arr, (h0, w0) = self._pil_fallback(data)
        else:
            raise TypeError(
                f"{cfg.key} must be raw jpeg bytes or a PIL image "
                f"(set decoder='raw_image'), got {type(data)}"
            )
        out = dict(sample)
        out[cfg.output_key or cfg.key] = arr
        if cfg.emit_micro_conds:
            out["original_size_as_tuple"] = np.asarray([h0, w0], np.float32)
            out["crop_coords_top_left"] = np.zeros((2,), np.float32)
            out["target_size_as_tuple"] = np.asarray(
                [cfg.height, cfg.width], np.float32
            )
        return out
