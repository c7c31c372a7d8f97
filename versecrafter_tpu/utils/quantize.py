"""Weight-only int8 quantization (the TPU analogue of the reference's fp8
weight storage, videox_fun.utils.fp8_optimization consumed at
/root/reference/inference/versecrafter_inference.py:31-33,288-301).

Large 2-D/3-D matmul weights are stored as int8 with per-output-channel fp32
scales; "modulation" params are excluded (same exclusion list as the
reference). Dequantization happens inside the jitted step
(`dequantize_tree`), so HBM holds int8 (~2x less weight traffic than bf16)
and XLA fuses the scale-multiply into the consumer matmul.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

EXCLUDE = ("modulation",)
MIN_SIZE = 1 << 16  # don't quantize tiny leaves


def _is_quantized(leaf) -> bool:
    return isinstance(leaf, dict) and set(leaf) == {"qvalues", "qscales", "qdtype"}


def quantize_tree(params: Dict[str, Any]) -> Dict[str, Any]:
    """Replace big weight leaves with {'qvalues': int8, 'qscales': f32}."""

    def quant(path, leaf):
        names = "/".join(str(getattr(p, "key", p)) for p in path)
        if (leaf.ndim < 2 or leaf.size < MIN_SIZE
                or any(e in names for e in EXCLUDE)
                or not jnp.issubdtype(leaf.dtype, jnp.floating)):
            return leaf
        absmax = jnp.max(jnp.abs(leaf.astype(jnp.float32)), axis=-2, keepdims=True)
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(leaf.astype(jnp.float32) / scale), -127, 127)
        return {"qvalues": q.astype(jnp.int8),
                "qscales": scale.astype(jnp.float32),
                "qdtype": str(leaf.dtype)}

    return jax.tree_util.tree_map_with_path(quant, params)


def dequantize_tree(params: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of quantize_tree; call inside the jitted step so the int8
    buffers stay resident and dequant fuses into consumers."""

    def dequant(leaf):
        if _is_quantized(leaf):
            dtype = jnp.dtype(leaf["qdtype"])
            return (leaf["qvalues"].astype(jnp.float32) * leaf["qscales"]).astype(dtype)
        return leaf

    return jax.tree.map(dequant, params,
                        is_leaf=lambda x: _is_quantized(x) or not isinstance(x, (dict, list)))


def tree_bytes(params) -> int:
    return sum(x.nbytes for x in jax.tree.leaves(params)
               if hasattr(x, "nbytes"))  # skip qdtype strings
