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
