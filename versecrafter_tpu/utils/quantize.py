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
    return isinstance(leaf, dict) and set(leaf) in (
        {"qvalues", "qscales", "qdtype"}, {"qvalues", "qscales"})


def _dtype_token(dtype) -> "jnp.ndarray":
    """The original dtype, encoded as a ZERO-SIZE array of that dtype — a
    plain string leaf would make the params pytree un-jittable (the denoise
    step takes the quantized tree as a jit argument)."""
    return jnp.zeros((0,), dtype)


def quantize_tree(params: Dict[str, Any]) -> Dict[str, Any]:
    """Replace big weight leaves with {'qvalues': int8, 'qscales': f32}.

    Sharding-preserving: when a leaf is sharded over a mesh (quantize after
    pipeline.set_mesh), qvalues keep the LEAF's sharding and qscales keep it
    with the reduced (-2) axis unsharded — without this, the eager
    elementwise ops here would leave results on whatever sharding inference
    picked, plausibly gathering a 14B tree onto one chip."""
    from jax.sharding import NamedSharding, PartitionSpec

    def quant(path, leaf):
        names = "/".join(str(getattr(p, "key", p)) for p in path)
        # matmul kernels ONLY: biases and norm scales stacked per layer are
        # [L, d] — quantizing those would reduce over axis -2 = the LAYER
        # axis (wrong scales, and [1, d] qscales break the per-layer scan)
        if (not names.endswith("kernel")
                or leaf.ndim < 2 or leaf.size < MIN_SIZE
                or any(e in names for e in EXCLUDE)
                or not jnp.issubdtype(leaf.dtype, jnp.floating)):
            return leaf
        absmax = jnp.max(jnp.abs(leaf.astype(jnp.float32)), axis=-2, keepdims=True)
        scale = jnp.maximum(absmax, 1e-8) / 127.0
        q = jnp.clip(jnp.round(leaf.astype(jnp.float32) / scale), -127, 127)
        q = q.astype(jnp.int8)
        scale = scale.astype(jnp.float32)
        sh = getattr(leaf, "sharding", None)
        if isinstance(sh, NamedSharding):
            q = jax.device_put(q, sh)
            spec = list(sh.spec) + [None] * (leaf.ndim - len(sh.spec))
            spec[-2] = None  # reduced axis has size 1 now
            scale = jax.device_put(
                scale, NamedSharding(sh.mesh, PartitionSpec(*spec)))
        return {"qvalues": q, "qscales": scale,
                "qdtype": _dtype_token(leaf.dtype)}

    return jax.tree_util.tree_map_with_path(quant, params)


def dequantize_tree(params: Dict[str, Any], dtype=None) -> Dict[str, Any]:
    """Inverse of quantize_tree; call inside the jitted step so the int8
    buffers stay resident and dequant fuses into consumers. `dtype`
    overrides the recorded original dtype (required for trees that went
    through strip_dtype_tokens; harmless otherwise — every quantized leaf
    is a matmul kernel that the consumer casts to the activation dtype
    anyway)."""

    def dequant(leaf):
        if _is_quantized(leaf):
            out_dtype = dtype if dtype is not None else leaf["qdtype"].dtype
            return (leaf["qvalues"].astype(jnp.float32)
                    * leaf["qscales"]).astype(out_dtype)
        return leaf

    return jax.tree.map(dequant, params,
                        is_leaf=lambda x: _is_quantized(x) or not isinstance(x, (dict, list)))


def strip_dtype_tokens(tree):
    """Drop the zero-size qdtype tokens from quantized leaves — required
    before feeding stacked quantized block params to lax.scan (every xs leaf
    needs the [num_layers, ...] leading axis; the token is [0]-shaped).
    Pass an explicit dtype to dequantize_tree afterwards."""
    def fix(leaf):
        if _is_quantized(leaf):
            return {"qvalues": leaf["qvalues"], "qscales": leaf["qscales"]}
        return leaf

    return jax.tree.map(
        fix, tree,
        is_leaf=lambda x: _is_quantized(x) or not isinstance(x, (dict, list)))


def has_quantized(tree) -> bool:
    found = []

    def check(leaf):
        if _is_quantized(leaf):
            found.append(True)
        return leaf

    jax.tree.map(check, tree,
                 is_leaf=lambda x: _is_quantized(x) or not isinstance(x, (dict, list)))
    return bool(found)


def tree_bytes(params) -> int:
    return sum(x.nbytes for x in jax.tree.leaves(params)
               if hasattr(x, "nbytes"))
