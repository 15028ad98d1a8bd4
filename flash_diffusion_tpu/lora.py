"""LoRA over flax parameter pytrees + PEFT-format import/export.

The reference trains LoRA-only students via ``peft.add_adapter`` on regex-
selected torch modules and publishes PEFT safetensors to the HF hub
(reference: examples/train_flash_sd3.py:102-118, README.md:318-353). Here
LoRA is a *parameter-tree transform*, the idiomatic JAX design:

- ``init_lora(params, rank, rng, targets)`` builds a sparse pytree of
  (A, B) factor pairs for every kernel whose path matches a target pattern;
- ``merge_lora(base, lora, scale)`` returns ``W + scale · A @ B`` leaves —
  called *inside* the jitted train step, so gradients flow to the factors
  while the base stays frozen (replacing torch ``requires_grad``
  partitioning, reference trainer/trainer.py:76-139);
- ``to_peft`` / ``from_peft`` convert to/from PEFT safetensors key naming so
  published ``jasperai/flash-*`` adapters interoperate (key translation to
  HF module names is delegated to the per-model converters in utils/hf.py).

Dense kernels are [in, out] (A: [in, r], B: [r, out]); conv kernels are
HWIO (A: [kh, kw, in, r] reshaped for the contraction, B: [r, out]),
matching PEFT's Conv2d-LoRA factorization.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

# Default attention/ff projection targets (reference
# examples/train_flash_sd3.py:102-118 selects the same families of modules).
DEFAULT_TARGETS = (
    r".*(to_q|to_k|to_v|to_out|add_q_proj|add_k_proj|add_v_proj|to_add_out)/kernel$",
    r".*(proj_in|proj_out|ff_in|ff_out|ff/proj_in|ff/proj_out)/kernel$",
)


def _match(path: str, patterns) -> bool:
    return any(re.match(p, path) for p in patterns)


def lora_paths(params: Dict[str, Any], targets=DEFAULT_TARGETS) -> List[str]:
    flat = traverse_util.flatten_dict(params, sep="/")
    out = []
    for path, leaf in flat.items():
        if hasattr(leaf, "ndim") and leaf.ndim in (2, 4) and _match(path, targets):
            out.append(path)
    return sorted(out)


def lora_scaling(rank: int, alpha: Optional[float] = None) -> float:
    """Effective merge coefficient alpha/rank (PEFT convention); alpha
    defaults to rank → 1.0. Kept OUT of the param tree so the LoRA pytree
    holds only differentiable float leaves."""
    return (rank if alpha is None else alpha) / rank


def init_lora(
    params: Dict[str, Any],
    rank: int,
    rng: jax.Array,
    targets=DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """Sparse pytree {path: {"a": A, "b": B}} with B zero-initialized
    (standard LoRA: the merged model starts exactly at the base weights)."""
    flat = traverse_util.flatten_dict(params, sep="/")
    lora = {}
    for i, path in enumerate(lora_paths(params, targets)):
        w = flat[path]
        sub = jax.random.fold_in(rng, i)
        if w.ndim == 2:
            a = jax.random.normal(sub, (w.shape[0], rank), dtype) / np.sqrt(w.shape[0])
        else:  # HWIO conv
            kh, kw, cin, _ = w.shape
            a = jax.random.normal(sub, (kh, kw, cin, rank), dtype) / np.sqrt(kh * kw * cin)
        b = jnp.zeros((rank, w.shape[-1]), dtype)
        lora[path] = {"a": a, "b": b}
    return traverse_util.unflatten_dict(lora, sep="/")


def scale_lora(lora: Dict[str, Any], scaling: float) -> Dict[str, Any]:
    """Fold the alpha/rank scaling into the ``b`` factors (for side-path
    application via the ``"lora"`` variable collection — models/layers.py
    ``LoraDense``). No-op pytree copy when scaling == 1."""
    if scaling == 1.0:
        return lora
    flat = traverse_util.flatten_dict(lora, sep="/")
    out = {k: (v * scaling if k.endswith("/b") else v) for k, v in flat.items()}
    return traverse_util.unflatten_dict(out, sep="/")


def lora_collection(lora: Dict[str, Any], scaling: float = 1.0) -> Dict[str, Any]:
    """The ``"lora"`` variable collection for ``module.apply``: the lora
    tree minus the ``params`` root scope (module scopes must align), with
    scaling folded into ``b``."""
    lora = scale_lora(lora, scaling)
    return lora.get("params", lora)


def lora_is_dense_only(lora: Dict[str, Any]) -> bool:
    """True when every factor pair is a Dense (2-D ``a``) pair — the
    side-path (LoraDense) covers exactly these; conv pairs need the merge
    path."""
    flat = traverse_util.flatten_dict(lora, sep="/")
    return all(v.ndim == 2 for k, v in flat.items() if k.endswith("/a"))


def merge_lora(params: Dict[str, Any], lora: Dict[str, Any], scaling: float = 1.0) -> Dict[str, Any]:
    """W' = W + scaling · A·B on matched leaves (jit-safe; scaling is the
    lora_scaling(rank, alpha) coefficient times any runtime scale)."""
    flat = traverse_util.flatten_dict(params, sep="/")
    flat_lora = traverse_util.flatten_dict(lora, sep="/")
    pairs: Dict[str, Dict[str, jnp.ndarray]] = {}
    for k, v in flat_lora.items():
        path, leaf = k.rsplit("/", 1)
        pairs.setdefault(path, {})[leaf] = v
    out = dict(flat)
    for path, ab in pairs.items():
        w = flat[path]
        a, b = ab["a"], ab["b"]
        if w.ndim == 2:
            delta = a @ b
        else:
            kh, kw, cin, r = a.shape
            delta = (a.reshape(-1, r) @ b).reshape(kh, kw, cin, -1)
        out[path] = (w + scaling * delta).astype(w.dtype)
    return traverse_util.unflatten_dict(out, sep="/")


# --------------------------------------------------------------------------
# PEFT interop
# --------------------------------------------------------------------------
def to_peft(
    lora: Dict[str, Any],
    name_map: Optional[Dict[str, str]] = None,
    prefix: str = "unet",
) -> Dict[str, np.ndarray]:
    """Flatten to PEFT safetensors naming:
    ``{prefix}.{module}.lora_A.weight`` [r, in], ``...lora_B.weight`` [out, r]
    (torch Linear layout = transposed flax kernels; conv A stays OIHW).
    """
    flat = traverse_util.flatten_dict(lora, sep="/")
    # group (a, b) per module so b's export layout can follow a's rank
    # (PEFT Conv2d-LoRA expects lora_B as a 1×1 conv weight [out, r, 1, 1])
    pairs: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in flat.items():
        path, leaf = k.rsplit("/", 1)
        pairs.setdefault(path, {})[leaf] = np.asarray(v)
    out = {}
    for path, ab in pairs.items():
        module = path[: -len("/kernel")] if path.endswith("/kernel") else path
        module = name_map.get(module, module) if name_map else module
        module = module.replace("/", ".")
        a, b = ab["a"], ab["b"]
        if a.ndim == 2:
            out[f"{prefix}.{module}.lora_A.weight"] = np.ascontiguousarray(a.T)  # [r, in]
            out[f"{prefix}.{module}.lora_B.weight"] = np.ascontiguousarray(b.T)  # [out, r]
        else:  # conv: A [kh,kw,in,r] -> torch [r, in, kh, kw]; B -> [out, r, 1, 1]
            out[f"{prefix}.{module}.lora_A.weight"] = np.ascontiguousarray(
                a.transpose(3, 2, 0, 1)
            )
            out[f"{prefix}.{module}.lora_B.weight"] = np.ascontiguousarray(
                b.T[:, :, None, None]
            )
    return out


def from_peft(
    tensors: Dict[str, np.ndarray],
    base_params: Dict[str, Any],
    name_map: Optional[Dict[str, str]] = None,
    prefix: str = "unet",
    alpha: Optional[float] = None,
) -> Tuple[Dict[str, Any], float]:
    """Inverse of :func:`to_peft`: returns (lora_tree, scaling).
    ``name_map`` maps PEFT module names → our param paths (module-level,
    no trailing /kernel)."""
    inv = {v: k for k, v in (name_map or {}).items()}
    lora: Dict[str, Any] = {}
    rank = None
    for key, arr in tensors.items():
        if not key.startswith(prefix + "."):
            continue
        stem = key[len(prefix) + 1 :]
        if stem.endswith(".lora_A.weight"):
            module, leaf = stem[: -len(".lora_A.weight")], "a"
        elif stem.endswith(".lora_B.weight"):
            module, leaf = stem[: -len(".lora_B.weight")], "b"
        else:
            continue
        module = module.replace(".", "/")
        module = inv.get(module, module)
        path = f"{module}/kernel/{leaf}"
        arr = np.asarray(arr, np.float32)
        if leaf == "a":
            if arr.ndim == 2:
                arr = arr.T  # [in, r]
                rank = arr.shape[-1]
            else:  # torch conv [r, in, kh, kw] -> [kh, kw, in, r]
                arr = arr.transpose(2, 3, 1, 0)
                rank = arr.shape[-1]
        else:
            if arr.ndim == 4:  # conv lora_B [out, r, 1, 1] -> [r, out]
                arr = arr[:, :, 0, 0].T
            else:
                arr = arr.T  # [r, out]
        lora[path] = jnp.asarray(arr)
    if rank is None:
        raise ValueError(f"No LoRA tensors found under prefix {prefix!r}")
    return traverse_util.unflatten_dict(lora, sep="/"), lora_scaling(rank, alpha)


def save_peft_safetensors(path: str, lora, name_map=None, prefix="unet"):
    from safetensors.numpy import save_file

    save_file(to_peft(lora, name_map, prefix), path)


# --------------------------------------------------------------------------
# kohya / ComfyUI interop
# --------------------------------------------------------------------------
def to_kohya(
    lora: Dict[str, Any],
    name_map: Optional[Dict[str, str]] = None,
    prefix: str = "lora_unet",
    alpha: Optional[float] = None,
) -> Dict[str, np.ndarray]:
    """Export to the kohya-ss naming ComfyUI's LoRA loader consumes
    (the reference publishes its SDXL adapter in this format for Comfy:
    ``/root/reference/README.md:355-364``).

    Keys: ``{prefix}_{module with '.'->'_'}.lora_down.weight`` [r, in],
    ``...lora_up.weight`` [out, r] (conv: 4-D torch layouts), and a scalar
    ``...alpha`` per module (defaults to the rank, i.e. scaling 1 — matching
    :func:`lora_scaling`'s default).
    """
    peft = to_peft(lora, name_map, prefix="U")
    out: Dict[str, np.ndarray] = {}
    for key, arr in peft.items():
        stem = key[len("U.") :]
        if stem.endswith(".lora_A.weight"):
            module, leaf = stem[: -len(".lora_A.weight")], "lora_down"
            rank = arr.shape[0]
        else:
            module, leaf = stem[: -len(".lora_B.weight")], "lora_up"
            rank = arr.shape[1]
        kmod = f"{prefix}_{module.replace('.', '_')}"
        out[f"{kmod}.{leaf}.weight"] = arr
        out[f"{kmod}.alpha"] = np.asarray(
            float(alpha) if alpha is not None else float(rank), np.float32
        )
    return out


def from_kohya(
    tensors: Dict[str, np.ndarray],
    base_params: Dict[str, Any],
    name_map: Optional[Dict[str, str]] = None,
    prefix: str = "lora_unet",
) -> Tuple[Dict[str, Any], float]:
    """Inverse of :func:`to_kohya`: returns (lora_tree, scaling).

    kohya keys flatten module paths with ``_``, which is ambiguous against
    path components that themselves contain underscores — resolve by
    matching against the module paths that actually carry LoRA leaves in
    ``base_params`` (plus ``name_map`` values). Two distinct module paths
    that flatten to the same key cannot be told apart from the flat name at
    all, so that is an error here rather than a silent mis-assignment.
    """
    candidates = {}

    def add_candidate(flat: str, mod: str):
        prev = candidates.get(flat)
        if prev is not None and prev != mod:
            raise ValueError(
                f"ambiguous kohya flattening: modules {prev!r} and {mod!r} "
                f"both flatten to {flat!r}; rename one via name_map"
            )
        candidates[flat] = mod

    for p in lora_paths(base_params, targets=(".*",)):
        mod = p[: -len("/kernel")] if p.endswith("/kernel") else p
        add_candidate(mod.replace("/", ".").replace(".", "_"), mod)
    for mod in (name_map or {}).values():
        add_candidate(mod.replace("/", ".").replace(".", "_"), mod)
    inv = {v: k for k, v in (name_map or {}).items()}

    lora: Dict[str, Any] = {}
    rank = alpha = None
    for key, arr in tensors.items():
        if not key.startswith(prefix + "_"):
            continue
        stem = key[len(prefix) + 1 :]
        if stem.endswith(".lora_down.weight"):
            flat_mod, leaf = stem[: -len(".lora_down.weight")], "a"
        elif stem.endswith(".lora_up.weight"):
            flat_mod, leaf = stem[: -len(".lora_up.weight")], "b"
        elif stem.endswith(".alpha"):
            alpha = float(np.asarray(arr))
            continue
        else:
            continue
        module = candidates.get(flat_mod)
        if module is None:
            raise KeyError(
                f"kohya module {flat_mod!r} does not match any param path"
            )
        module = inv.get(module, module)
        arr = np.asarray(arr, np.float32)
        if leaf == "a":
            arr = arr.T if arr.ndim == 2 else arr.transpose(2, 3, 1, 0)
            rank = arr.shape[-1]
        else:
            arr = arr[:, :, 0, 0].T if arr.ndim == 4 else arr.T
        lora[f"{module}/kernel/{leaf}"] = jnp.asarray(arr)
    if rank is None:
        raise ValueError(f"No LoRA tensors found under prefix {prefix!r}")
    scaling = (alpha / rank) if alpha is not None else lora_scaling(rank)
    return traverse_util.unflatten_dict(lora, sep="/"), scaling


def save_kohya_safetensors(path: str, lora, name_map=None, prefix="lora_unet", alpha=None):
    from safetensors.numpy import save_file

    save_file(to_kohya(lora, name_map, prefix, alpha), path)


def load_peft_safetensors(path: str, base_params, name_map=None, prefix="unet", alpha=None):
    from safetensors.numpy import load_file

    return from_peft(load_file(path), base_params, name_map, prefix, alpha)
