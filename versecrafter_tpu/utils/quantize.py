"""Weight-only int8 quantization (the TPU analogue of the reference's fp8
weight storage, videox_fun.utils.fp8_optimization consumed at
/root/reference/inference/versecrafter_inference.py:31-33,288-301).

Large 2-D/3-D matmul weights are stored as int8 with per-output-channel fp32
scales; "modulation" params are excluded (same exclusion list as the
reference). Dequantization happens inside the jitted step
(`dequantize_tree`), so HBM holds int8 (~2x less weight traffic than bf16)
and XLA fuses the scale-multiply into the consumer matmul.

Beyond the reference's storage-only mode, `tag_int8_compute` upgrades
selected block matmuls to W8A8 COMPUTE: activations are quantized to int8
(per-tensor scale — dynamic absmax by default, or a calibrated static
scale) and the dot runs s8 x s8 -> s32 on the MXU, which executes int8 at
~2x bf16 throughput on v5e. Tagged leaves carry an extra marker key and are
skipped by `dequantize_tree`; the model's `_linear` dispatches on the leaf
structure (models/wan_dit.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

EXCLUDE = ("modulation",)
MIN_SIZE = 1 << 16  # don't quantize tiny leaves

_QKEYS = {"qvalues", "q4values", "qscales", "qdtype", "a_dyn", "a_scale"}

# Block-matmul sites eligible for W8A8 compute (path suffixes under
# blocks/geoada_blocks). Embeddings, head, and the geoada before/after
# projections stay weight-only (standard practice: keep the model's in/out
# boundaries and the zero-init hint projections at full activation
# precision).
COMPUTE_SITES = (
    "self_attn/q/kernel", "self_attn/k/kernel", "self_attn/v/kernel",
    "self_attn/o/kernel",
    "cross_attn/q/kernel", "cross_attn/k/kernel", "cross_attn/v/kernel",
    "cross_attn/o/kernel", "cross_attn/k_img/kernel",
    "cross_attn/v_img/kernel",
    "ffn_in/kernel", "ffn_out/kernel",
)


def _is_quantized(leaf) -> bool:
    return (isinstance(leaf, dict)
            and ("qvalues" in leaf or "q4values" in leaf)
            and "qscales" in leaf and set(leaf) <= _QKEYS)


def is_compute_tagged(leaf) -> bool:
    """True for quantized leaves that run W8A8 int8 compute (skipped by
    dequantize_tree; consumed directly by the model's _linear)."""
    return _is_quantized(leaf) and ("a_dyn" in leaf or "a_scale" in leaf)


def _dtype_token(dtype) -> "jnp.ndarray":
    """The original dtype, encoded as a ZERO-SIZE array of that dtype — a
    plain string leaf would make the params pytree un-jittable (the denoise
    step takes the quantized tree as a jit argument)."""
    return jnp.zeros((0,), dtype)


def quantize_tree(params: Dict[str, Any], bits: int = 8,
                  group_size: Optional[int] = None) -> Dict[str, Any]:
    """Replace big weight leaves with {'qvalues': int8, 'qscales': f32}.

    bits=4 stores NIBBLE-PACKED weights instead ({'q4values': uint8 with
    two signed 4-bit values per byte along the contracting axis}): half the
    HBM of int8 (a 14B tree drops to ~7.5 GB, enough to measure the full
    32,760-token step beside it on one 16 GB v5e). jnp.int4 is NOT packed
    in memory (1 byte/element), hence the manual packing; dequantize_tree
    unpacks in-graph where XLA fuses it with the scale-multiply.

    group_size: contracting-axis scale granularity. None = auto: bits=8
    keeps per-channel scales (int8 is fine-grained enough); bits=4 uses
    128-row groups when the dim allows (15 quantization levels need the
    finer granularity — halves the tail error for ~6% scale overhead,
    qscales [..., K/g, 1, N] f32). Explicit 0 forces per-channel.

    Sharding-preserving: when a leaf is sharded over a mesh (quantize after
    pipeline.set_mesh), qvalues keep the LEAF's sharding and qscales keep it
    with the reduced (-2) axis unsharded — without this, the eager
    elementwise ops here would leave results on whatever sharding inference
    picked, plausibly gathering a 14B tree onto one chip."""
    from jax.sharding import NamedSharding, PartitionSpec
    assert bits in (8, 4), bits

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
        if bits == 4 and leaf.shape[-2] % 2:
            return leaf  # odd contracting dim: can't nibble-pack
        qmax = 127.0 if bits == 8 else 7.0
        kdim = leaf.shape[-2]
        g = group_size if group_size is not None else (
            128 if bits == 4 else 0)
        grouped = bool(g) and g < kdim and kdim % g == 0 and g % 2 == 0
        lf = leaf.astype(jnp.float32)
        if grouped:
            lg = lf.reshape(*leaf.shape[:-2], kdim // g, g, leaf.shape[-1])
            absmax = jnp.max(jnp.abs(lg), axis=-2, keepdims=True)
            scale = jnp.maximum(absmax, 1e-8) / qmax  # [..., K/g, 1, N]
            q = jnp.clip(jnp.round(lg / scale), -qmax, qmax)
            q = q.reshape(lf.shape)
        else:
            absmax = jnp.max(jnp.abs(lf), axis=-2, keepdims=True)
            scale = jnp.maximum(absmax, 1e-8) / qmax
            q = jnp.clip(jnp.round(lf / scale), -qmax, qmax)
        scale = scale.astype(jnp.float32)
        if bits == 4:
            qu = q.astype(jnp.int32) & 0xF  # two's-complement low nibble
            vals = ((qu[..., 0::2, :] | (qu[..., 1::2, :] << 4))
                    .astype(jnp.uint8))
            key = "q4values"
        else:
            vals = q.astype(jnp.int8)
            key = "qvalues"
        sh = getattr(leaf, "sharding", None)
        if isinstance(sh, NamedSharding):
            vals = jax.device_put(vals, sh)
            spec = list(sh.spec) + [None] * (leaf.ndim - len(sh.spec))
            spec[-2] = None  # reduced axis has size 1 now
            if grouped:
                # [..., K/g, 1, N]: group + reduced axes both unsharded
                spec = spec[:-2] + [None, None, spec[-1]]
            scale = jax.device_put(
                scale, NamedSharding(sh.mesh, PartitionSpec(*spec)))
        return {key: vals, "qscales": scale,
                "qdtype": _dtype_token(leaf.dtype)}

    return jax.tree_util.tree_map_with_path(quant, params)


def _unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """[..., K/2, N] uint8 (two signed nibbles) -> [..., K, N] int8."""
    lo = (packed & 0xF).astype(jnp.int8)
    hi = ((packed >> 4) & 0xF).astype(jnp.int8)
    lo = jnp.where(lo > 7, lo - 16, lo)
    hi = jnp.where(hi > 7, hi - 16, hi)
    inter = jnp.stack([lo, hi], axis=-2)  # [..., K/2, 2, N]
    return inter.reshape(*packed.shape[:-2], packed.shape[-2] * 2,
                         packed.shape[-1])


def dequantize_tree(params: Dict[str, Any], dtype=None,
                    force: bool = False) -> Dict[str, Any]:
    """Inverse of quantize_tree; call inside the jitted step so the int8
    buffers stay resident and dequant fuses into consumers. `dtype`
    overrides the recorded original dtype (required for trees that went
    through strip_dtype_tokens; harmless otherwise — every quantized leaf
    is a matmul kernel that the consumer casts to the activation dtype
    anyway). Compute-tagged leaves (tag_int8_compute) are left quantized —
    the model's _linear runs them as int8 MXU dots — unless `force`."""

    def dequant(leaf):
        if _is_quantized(leaf):
            if is_compute_tagged(leaf) and not force:
                return leaf
            return dequantize_leaf(leaf, dtype)
        return leaf

    return jax.tree.map(dequant, params,
                        is_leaf=lambda x: _is_quantized(x) or not isinstance(x, (dict, list)))


def dequantize_leaf(leaf: Dict[str, Any], dtype=None) -> jnp.ndarray:
    """Dequantize ONE quantized leaf (int8 or nibble-packed int4; per-channel
    or group-wise scales) to dtype (falls back to the recorded qdtype
    token)."""
    out_dtype = dtype if dtype is not None else leaf["qdtype"].dtype
    q = (_unpack_int4(leaf["q4values"]) if "q4values" in leaf
         else leaf["qvalues"])
    scale = leaf["qscales"]
    if scale.ndim == q.ndim + 1:
        # group-wise [..., K/g, 1, N] (quantize_tree group_size)
        gct = scale.shape[-3]
        qg = q.astype(jnp.float32).reshape(
            *q.shape[:-2], gct, q.shape[-2] // gct, q.shape[-1])
        return (qg * scale).reshape(q.shape).astype(out_dtype)
    return (q.astype(jnp.float32) * scale).astype(out_dtype)


def strip_dtype_tokens(tree):
    """Drop the zero-size qdtype tokens from quantized leaves — required
    before feeding stacked quantized block params to lax.scan (every xs leaf
    needs the [num_layers, ...] leading axis; the token is [0]-shaped).
    Pass an explicit dtype to dequantize_tree afterwards."""
    def fix(leaf):
        if _is_quantized(leaf):
            return {k: v for k, v in leaf.items() if k != "qdtype"}
        return leaf

    return jax.tree.map(
        fix, tree,
        is_leaf=lambda x: _is_quantized(x) or not isinstance(x, (dict, list)))


def tag_int8_compute(params: Dict[str, Any],
                     act_scales: Optional[Dict[str, Any]] = None,
                     stacked: bool = True,
                     sites: Optional[tuple] = None) -> Dict[str, Any]:
    """Upgrade quantized COMPUTE_SITES leaves to W8A8 int8 compute.

    Call on a tree that already went through quantize_tree. Tagged leaves
    gain a marker key and are then consumed directly by the model's
    _linear as s8 x s8 -> s32 MXU dots (~2x bf16 matmul throughput on
    v5e) instead of being dequantized per layer.

    act_scales: optional {path_suffix: array} of calibrated per-tensor
    activation scales (absmax/127), each [L] for stacked block trees
    ([] unstacked) — produced by fit_act_scales from
    wan_dit_forward(calibrate=True) stats. Keys match on whole path
    components from the right ("blocks/ffn_in/kernel" does NOT match
    geoada_blocks leaves), relative to the tree passed in. Sites without
    an entry use DYNAMIC per-tensor scales (absmax computed on the fly:
    one extra full read of the activation; a calibrated static scale makes
    the quantize op pure-elementwise so XLA fuses it into the producer).

    stacked: whether block leaves carry a leading [num_layers] axis (the
    pipeline's scanned trees do; pass False for single-block test trees).

    sites: optional substring filter over COMPUTE_SITES — only matching
    sites are upgraded (e.g. ("ffn",) for FFN-only W8A8). The chip
    microbench (scripts/bench_int8_matmul.py) shows the win is
    shape-dependent: FFN dots gain ~2x while 14B qkv-shaped dots LOSE
    under dynamic per-tensor quant overhead — a selective policy can beat
    blanket W8A8 when calibration is unavailable.
    """
    from jax.sharding import NamedSharding, PartitionSpec
    act_scales = act_scales or {}
    eligible = (COMPUTE_SITES if sites is None else
                tuple(s for s in COMPUTE_SITES
                      if any(tok in s for tok in sites)))

    flat = jax.tree_util.tree_flatten_with_path(
        params, is_leaf=_is_quantized)[0]
    treedef = jax.tree_util.tree_structure(params, is_leaf=_is_quantized)
    out = []
    for path, leaf in flat:
        names = "/".join(str(getattr(p, "key", p)) for p in path)
        site = next((s for s in eligible if names.endswith(s)), None)
        vals = leaf.get("qvalues", leaf.get("q4values")) \
            if _is_quantized(leaf) else None
        if (site is None or vals is None or is_compute_tagged(leaf)
                or leaf["qscales"].ndim != vals.ndim):
            # (the last: group-wise scales — the s8xs8 MXU dot folds ONE
            # per-channel scale into its epilogue, not K/g of them. int4
            # with PER-CHANNEL scales qualifies: the packed nibbles unpack
            # to s8 values in [-7, 7], directly usable by the int8 dot —
            # the W4A8 mode.)
            out.append(leaf)
            continue
        nlayers = vals.shape[0] if stacked else None
        akey = next((k for k in act_scales
                     if names == k or names.endswith("/" + k)), None)
        if akey is not None:
            a = jnp.asarray(act_scales[akey], jnp.float32)
            # fail HERE with the real reason, not inside the first jitted
            # scan ("inconsistent leading axis sizes" naming internal
            # leaves) when scales from a different-depth calibration are
            # stamped onto this tree
            want = (nlayers,) if stacked else ()
            if a.shape != want:
                raise ValueError(
                    f"act_scales[{akey!r}] has shape {a.shape}, expected "
                    f"{want} for this {'stacked' if stacked else 'flat'} "
                    f"tree (calibrated on a different config?)")
        else:
            # zero-size-free dynamic marker: [L] (or scalar) so lax.scan can
            # slice it with the rest of the stacked block leaves; the VALUE
            # is never read — presence of the key selects the dynamic path
            a = jnp.zeros((nlayers,) if stacked else (), jnp.float32)
        key = "a_scale" if akey is not None else "a_dyn"
        sh = getattr(vals, "sharding", None)
        if isinstance(sh, NamedSharding):
            a = jax.device_put(a, NamedSharding(
                sh.mesh, PartitionSpec(*([None] * a.ndim))))
        out.append({**leaf, key: a})
    return jax.tree_util.tree_unflatten(treedef, out)


def fit_act_scales(stats_list, margin: float = 1.0) -> Dict[str, Any]:
    """Reduce calibration stats into tag_int8_compute's act_scales mapping.

    stats_list: one stats pytree per recorded forward
    (wan_dit_forward(calibrate=True): {"blocks": {site: [L] absmax},
    "geoada_blocks": {site: [G] absmax}}). Running max over the recorded
    steps, then absmax/127 (times `margin` slack — activations exceeding
    the calibrated range saturate at the int8 clip)."""
    acc = jax.tree.map(lambda *a: jnp.max(jnp.stack(a), axis=0), *stats_list)
    out = {}
    for grp, sites in acc.items():
        for site, v in sites.items():
            out[f"{grp}/{site}"] = (jnp.asarray(v, jnp.float32)
                                    * (margin / 127.0))
    return out


ROW_ACT_SCALES = True  # per-token dynamic activation scales (see below)
INT8_DOT_CHUNK_ROWS = 70_000  # chunk the token axis above this: past the
# chip-measured-and-fitting 480p CFG-2 shapes (65,520 rows), catching 720p


def int8_compute_dot(leaf: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    """W8A8 matmul: quantize x, run the dot in int8 on the MXU, rescale by
    (act_scale * per-output-channel weight scale).

    leaf: compute-tagged quantized kernel (2-D [d_in, d_out] after any scan
    slicing; qscales [1, d_out]). x: [..., d_in] activations.

    Dynamic scales are per-ROW (per-token absmax over the contracting dim,
    LLM.int8-style) when ROW_ACT_SCALES: strictly finer than one
    per-tensor scalar — activation outlier tokens no longer crush the
    resolution of every other token — and the epilogue rescale stays
    rank-1 ([..., M, 1] x [1, N]) so it fuses the same. Calibrated static
    scales (a_scale) remain per-tensor: the point of calibration is to
    make the quantize op activation-independent so XLA fuses it into the
    producer; a static per-row scale cannot exist (rows are data).

    int4-packed leaves (W4A8) unpack to s8 values in [-7, 7] in-graph —
    the same MXU dot runs, just with coarser weight levels (scales are
    already absmax/7).

    Above INT8_DOT_CHUNK_ROWS total rows the dot runs CHUNKED over the
    token axis through lax.map — BIT-IDENTICAL (per-row/static scales are
    row-local; the per-tensor dynamic mode computes its global absmax
    first), but only one chunk's f32 epilogue + s8 temps are ever live.
    Unchunked, the 14B GeoAdapter 720p CFG-1 step held two 1.44 GB f32
    dot epilogues + a 1 GB s8 activation simultaneously and needed
    18.48 GB > 15.75 GB HBM; the 480p path (32,760 rows) is below the
    gate and compiles exactly as before."""
    d_in = x.shape[-1]
    lead = x.shape[:-1]
    rows = 1
    for s in lead:
        rows *= int(s)
    a_global = None
    if "a_scale" in leaf:
        a_global = jnp.maximum(leaf["a_scale"].astype(jnp.float32), 1e-8)
    elif not ROW_ACT_SCALES:
        a_global = jnp.maximum(
            jnp.max(jnp.abs(x)).astype(jnp.float32), 1e-8) / 127.0
    if rows > INT8_DOT_CHUNK_ROWS:
        # fori_loop + dynamic_slice/update_slice, NOT lax.map: map stacks
        # its input [n, ch, d_in], and at 720p XLA materialized that stack
        # TWICE (once per loop layout) — 2 x 1.95 GB, worse than the
        # problem. Slicing the original buffer adds only one chunk copy,
        # and the carried output is updated in place by the while loop.
        # ~9k-row chunks bound each epilogue at ~0.18 GB.
        n = -(-rows // max(1, INT8_DOT_CHUNK_ROWS // 8))
        ch = -(-rows // n)
        x2 = x.reshape(rows, d_in)
        if n * ch != rows:  # zero rows quantize to zeros; sliced off below
            x2 = jnp.pad(x2, ((0, n * ch - rows), (0, 0)))
        d_out = int(leaf["qscales"].shape[-1])
        out = jnp.zeros((n * ch, d_out), x.dtype)

        def body(i, out):
            xc = jax.lax.dynamic_slice_in_dim(x2, i * ch, ch, 0)
            yc = _int8_dot_rows(leaf, xc, a_global)
            return jax.lax.dynamic_update_slice_in_dim(out, yc, i * ch, 0)

        out = jax.lax.fori_loop(0, n, body, out)
        return out[:rows].reshape(*lead, d_out)
    return _int8_dot_rows(leaf, x, a_global)


def _int8_dot_rows(leaf, x, a_global):
    """One s8xs8->s32 MXU dot over [..., d_in] rows (the int8_compute_dot
    body; a_global is the precomputed per-tensor scale, or None for the
    per-row dynamic mode). The absmax reads bf16 x directly: |.| and max
    of bf16 values are exact, so it equals the f32-upcast absmax
    bit-for-bit without materializing f32 activations; the f32 convert in
    the quantize chain is single-consumer and fuses into the s8 kLoop."""
    if a_global is not None:
        a = a_global
    else:
        a = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True)
                        .astype(jnp.float32), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / a),
                  -127, 127).astype(jnp.int8)
    w = (_unpack_int4(leaf["q4values"]) if "q4values" in leaf
         else leaf["qvalues"])
    y = jax.lax.dot_general(
        xq, w,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (a * leaf["qscales"])).astype(x.dtype)


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
