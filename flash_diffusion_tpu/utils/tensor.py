"""Pure-jnp tensor utilities.

TPU-native re-derivations of the reference helpers
(reference: src/flash/models/utils.py:316-377): gather-and-broadcast of
per-timestep coefficients, trailing-dim expansion, and pad-to-multiple. All
functions are jit-safe (static shapes, no data-dependent Python control flow).
"""

from __future__ import annotations

import jax.numpy as jnp


def extract_into_tensor(arr: jnp.ndarray, indices: jnp.ndarray, broadcast_ndim: int) -> jnp.ndarray:
    """Gather ``arr[indices]`` and right-pad with singleton dims.

    Args:
      arr: 1-D coefficient table, e.g. ``sqrt_alphas_cumprod`` of shape [T].
      indices: integer indices of shape [B].
      broadcast_ndim: target rank (e.g. 4 for NHWC latents).

    Returns:
      [B, 1, ..., 1] array with rank ``broadcast_ndim``.
    """
    out = jnp.take(arr, indices, axis=0)
    return append_dims(out, broadcast_ndim)


def append_dims(x: jnp.ndarray, target_ndim: int) -> jnp.ndarray:
    """Append singleton trailing dims until ``x.ndim == target_ndim``."""
    dims_to_append = target_ndim - x.ndim
    if dims_to_append < 0:
        raise ValueError(f"x.ndim={x.ndim} already exceeds target {target_ndim}")
    return x.reshape(x.shape + (1,) * dims_to_append)


def pad_to_multiple(x: jnp.ndarray, multiple: int, axes=(-2, -1), mode: str = "constant"):
    """Pad spatial axes of ``x`` up to the next multiple of ``multiple``.

    Returns (padded, original_shape) so callers can crop back. The reference
    pads images before tiling (src/flash/models/utils.py:333-349); on TPU
    this additionally keeps lane/sublane tiling aligned.
    """
    axes = [a % x.ndim for a in axes]
    pad_width = [(0, 0)] * x.ndim
    for a in axes:
        rem = x.shape[a] % multiple
        if rem:
            pad_width[a] = (0, multiple - rem)
    return jnp.pad(x, pad_width, mode=mode), x.shape
