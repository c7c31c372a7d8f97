"""Runtime LoRA merge/unmerge.

Re-implements videox_fun.utils.lora_utils.merge_lora/unmerge_lora (consumed
at /root/reference/inference/versecrafter_inference.py:34,321-322,437-438
with lora_weight=0.55): W <- W + weight * (up @ down) folded into the frozen
params, reversible by subtracting.

LoRA state dicts use torch naming ("...lora_down.weight"/"lora_up.weight" or
"lora_A"/"lora_B") over the DiT module tree; this maps them onto our pytree
(including the stacked [L, in, out] block leaves).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().to("cpu").float()
        return t.numpy()
    return np.asarray(t)


_TORCH_TO_TREE = {
    r"blocks\.(\d+)\.self_attn\.(q|k|v|o)": ("blocks", "self_attn", "{m2}"),
    r"blocks\.(\d+)\.cross_attn\.(q|k|v|o)": ("blocks", "cross_attn", "{m2}"),
    r"blocks\.(\d+)\.ffn\.0": ("blocks", "ffn_in"),
    r"blocks\.(\d+)\.ffn\.2": ("blocks", "ffn_out"),
    r"geoada_blocks\.(\d+)\.self_attn\.(q|k|v|o)": ("geoada_blocks", "self_attn", "{m2}"),
    r"geoada_blocks\.(\d+)\.cross_attn\.(q|k|v|o)": ("geoada_blocks", "cross_attn", "{m2}"),
    r"geoada_blocks\.(\d+)\.ffn\.0": ("geoada_blocks", "ffn_in"),
    r"geoada_blocks\.(\d+)\.ffn\.2": ("geoada_blocks", "ffn_out"),
}


def _collect_pairs(lora_sd: Dict[str, Any]) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """-> {module_name: (down [r, in], up [out, r])} from either naming."""
    pairs: Dict[str, dict] = {}
    for k, v in lora_sd.items():
        name = k
        for marker, slot in ((".lora_down.weight", "down"), (".lora_up.weight", "up"),
                             (".lora_A.weight", "down"), (".lora_B.weight", "up"),
                             (".lora_A.default.weight", "down"),
                             (".lora_B.default.weight", "up")):
            if name.endswith(marker):
                mod = name[: -len(marker)]
                mod = re.sub(r"^(lora_unet_|transformer\.|diffusion_model\.)", "", mod)
                mod = mod.replace("_", ".") if "." not in mod else mod
                pairs.setdefault(mod, {})[slot] = _np(v)
                break
    return {m: (d["down"], d["up"]) for m, d in pairs.items()
            if "down" in d and "up" in d}


def merge_lora(params: Dict[str, Any], lora_sd: Dict[str, Any],
               weight: float = 1.0, sign: float = 1.0) -> Dict[str, Any]:
    """Fold LoRA deltas into a DiT param pytree. Returns a new tree."""
    pairs = _collect_pairs(lora_sd)
    params = jax.tree.map(lambda x: x, params)  # shallow copy of structure

    for mod, (down, up) in pairs.items():
        matched = False
        for pat, path in _TORCH_TO_TREE.items():
            m = re.match(pat + r"$", mod)
            if not m:
                continue
            layer = int(m.group(1))
            keys = [p.format(m2=m.group(2)) if "{m2}" in p else p for p in path]
            node = params
            for k in keys[:-1]:
                node = node[k]
            leaf_holder = node[keys[-1]]
            kern = leaf_holder["kernel"]
            delta = (up @ down).T  # [in, out]
            scale = sign * weight
            if kern.ndim == 3:  # stacked [L, in, out]
                leaf_holder["kernel"] = kern.at[layer].add(
                    (scale * delta).astype(kern.dtype))
            else:
                leaf_holder["kernel"] = kern + (scale * delta).astype(kern.dtype)
            matched = True
            break
        if not matched:
            continue
    return params


def unmerge_lora(params, lora_sd, weight: float = 1.0):
    return merge_lora(params, lora_sd, weight=weight, sign=-1.0)


# ---------------------------------------------------------------------------
# LoRA TRAINING (beyond the reference, which only consumes LoRA weights):
# factor init / application over the scanned DiT tree, and export in the
# torch naming merge_lora understands — so adapters trained here load into
# any consumer of the reference's LoRA format.
# ---------------------------------------------------------------------------

LORA_TARGETS = (
    ("self_attn", "q"), ("self_attn", "k"), ("self_attn", "v"),
    ("self_attn", "o"),
    ("cross_attn", "q"), ("cross_attn", "k"), ("cross_attn", "v"),
    ("cross_attn", "o"),
    ("ffn_in",), ("ffn_out",),
)

_TREE_TO_TORCH = {
    ("self_attn", "q"): "self_attn.q", ("self_attn", "k"): "self_attn.k",
    ("self_attn", "v"): "self_attn.v", ("self_attn", "o"): "self_attn.o",
    ("cross_attn", "q"): "cross_attn.q", ("cross_attn", "k"): "cross_attn.k",
    ("cross_attn", "v"): "cross_attn.v", ("cross_attn", "o"): "cross_attn.o",
    ("ffn_in",): "ffn.0", ("ffn_out",): "ffn.2",
}


def _target_kernel(params, group: str, target):
    node = params[group]
    for k in target:
        node = node[k]
    return node["kernel"]


def init_lora(params: Dict[str, Any], rank: int, key,
              groups=("blocks",), targets=LORA_TARGETS,
              dtype=None) -> Dict[str, Any]:
    """LoRA factors over the stacked DiT kernels: for each target kernel
    [L, K, N] -> down [L, K, r] (scaled-normal init) and up [L, r, N]
    (ZEROS — the adapter starts as an exact no-op, standard LoRA init).
    Tree shape: {group: {"/".join(target): {"down": ..., "up": ...}}}."""
    import jax
    import jax.numpy as jnp

    out: Dict[str, Any] = {}
    keys = jax.random.split(key, len(groups) * len(targets))
    i = 0
    for g in groups:
        if g not in params:
            continue
        out[g] = {}
        for t in targets:
            kern = _target_kernel(params, g, t)
            L, K, N = kern.shape
            dt = dtype or kern.dtype
            down = (jax.random.normal(keys[i], (L, K, rank), jnp.float32)
                    * (1.0 / np.sqrt(K))).astype(dt)
            out[g]["/".join(t)] = {"down": down,
                                   "up": jnp.zeros((L, rank, N), dt)}
            i += 1
    return out


def apply_lora_tree(params: Dict[str, Any], lora: Dict[str, Any],
                    scale: float = 1.0) -> Dict[str, Any]:
    """Effective params: kernel + scale * down @ up per target (stacked
    einsum, differentiable through the factors — the training forward)."""
    import jax
    import jax.numpy as jnp

    params = jax.tree.map(lambda x: x, params)  # shallow structural copy
    for g, mods in lora.items():
        for tkey, dw in mods.items():
            t = tuple(tkey.split("/"))
            node = params[g]
            for k in t:
                node = node[k]
            kern = node["kernel"]
            delta = jnp.einsum("lkr,lrn->lkn", dw["down"].astype(jnp.float32),
                               dw["up"].astype(jnp.float32))
            node["kernel"] = (kern.astype(jnp.float32)
                              + scale * delta).astype(kern.dtype)
    return params


def lora_to_torch_sd(lora: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Export trained factors in the torch naming merge_lora consumes:
    blocks.{i}.<module>.lora_down.weight [r, K] / .lora_up.weight [N, r]
    per layer (delta convention: (up @ down).T == down_j @ up_j)."""
    sd: Dict[str, np.ndarray] = {}
    for g, mods in lora.items():
        for tkey, dw in mods.items():
            torch_mod = _TREE_TO_TORCH[tuple(tkey.split("/"))]
            down = np.asarray(dw["down"], np.float32)  # [L, K, r]
            up = np.asarray(dw["up"], np.float32)      # [L, r, N]
            for layer in range(down.shape[0]):
                base = f"{g}.{layer}.{torch_mod}"
                sd[f"{base}.lora_down.weight"] = down[layer].T  # [r, K]
                sd[f"{base}.lora_up.weight"] = up[layer].T      # [N, r]
    return sd
