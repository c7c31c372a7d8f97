"""Declarative parallelism: mesh context, param shardings, and the
sequence-parallel attention collectives.

TPU-native replacement for the reference's USP runtime (videox_fun.dist:
`set_multi_gpus_devices(ulysses, ring)`, `usp_attn_forward` monkey-patched
onto every self-attention, manual pad/chunk/all_gather —
/root/reference/versecrafter/models/wan_transformer3d.py:901-921,1050-1054,
1099-1100). Here:

- the mesh has axes (dp, fsdp, sp, tp); activations are sharded
  [B@dp, S@sp, D] and GSPMD handles all pad/chunk/gather bookkeeping;
- **Ulysses** is `ulysses_attention`: a shard_map whose all_to_all trades the
  sequence shard for a head shard, runs the exact Pallas flash kernel on the
  full sequence locally, and trades back (same collective pattern as
  xfuser's all-to-all, but over ICI and fused into one jitted program);
- **cross-attention** under sp needs no collectives at all: KV is the 512
  text tokens, replicated; each sequence shard attends locally
  (`sp_cross_attention`);
- FSDP is a PartitionSpec on the parameters, not a wrapper class.

A ring-attention variant (KV ppermute inside the kernel loop) is the planned
upgrade path when sp must exceed the head count; Ulysses covers the
reference's operating points (sp<=8, 40 heads).
"""

from __future__ import annotations

import contextlib
import threading
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from versecrafter_tpu.kernels.flash_attention import flash_attention

_STATE = threading.local()


@contextlib.contextmanager
def mesh_context(mesh: Optional[Mesh], dp="dp", fsdp="fsdp", sp="sp", tp="tp"):
    """Install the mesh + axis names used by model-internal collectives."""
    prev = getattr(_STATE, "ctx", None)
    _STATE.ctx = None if mesh is None else {
        "mesh": mesh, "dp": dp, "fsdp": fsdp, "sp": sp, "tp": tp}
    try:
        yield
    finally:
        _STATE.ctx = prev


def current_mesh():
    return getattr(_STATE, "ctx", None)


# ---------------------------------------------------------------------------
# parameter shardings
# ---------------------------------------------------------------------------

def dit_param_pspecs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree for DiT params (same tree structure).

    Stacked block matrices [L, d_in, d_out]: contracting dim on fsdp, output
    dim on tp for qkv/ffn_in; reversed for the output projections (so each
    tp shard holds whole heads). Everything small is replicated."""

    def spec_for(path: Tuple[str, ...], leaf) -> P:
        names = [getattr(p, "key", str(p)) for p in path]
        joined = ".".join(names)
        stacked = names[0] in ("blocks", "geoada_blocks")
        lead = (None,) if stacked else ()
        if "modulation" in joined or leaf.ndim - len(lead) != 2:
            return P()  # biases, norms, modulation: replicated
        if any(s in joined for s in (".q.", ".k.", ".v.", "k_img", "v_img",
                                     "ffn_in", "qkv")):
            return P(*lead, "fsdp", "tp")
        if any(s in joined for s in (".o.", "ffn_out", "proj")):
            return P(*lead, "tp", "fsdp")
        # embeddings / head / time / text projections: fsdp on the big dim
        return P(*lead, "fsdp", None)

    return jax.tree_util.tree_map_with_path(spec_for, params)


def _divisible(leaf, spec: P, mesh: Mesh) -> bool:
    for dim, names in zip(leaf.shape, tuple(spec) + (None,) * leaf.ndim):
        if names is None:
            continue
        size = np.prod([mesh.shape[n] for n in
                        (names if isinstance(names, tuple) else (names,))])
        if dim % size != 0:
            return False
    return True


def shard_dit_params(params, mesh: Mesh):
    specs = dit_param_pspecs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(
            x, NamedSharding(mesh, s if _divisible(x, s, mesh) else P())),
        params, specs)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


T5_SHARD_MIN = 1 << 16  # leaves below this stay replicated


def shard_t5_params(params, mesh: Mesh):
    """FSDP-style sharding for the text encoder — the reference FSDPs it BY
    DEFAULT (fsdp_text_encoder=True -> shard_model(text_encoder),
    /root/reference/inference/versecrafter_inference.py:96-98,271-281).

    Each big 2-D kernel (and the [vocab, d] embedding) is sharded on one
    dimension over ALL mesh axes, so umT5-xxl's ~11 GB bf16 costs ~11/N GB
    per chip; XLA all-gathers each weight at use inside the jitted encode
    (ZeRO-3-for-inference semantics — the encode runs once per request, so
    gather cost is negligible next to resident memory). Norms, relative-
    bias tables, and non-divisible leaves stay replicated."""
    axes = tuple(mesh.axis_names)

    def placed(leaf):
        if leaf.ndim == 2 and leaf.size >= T5_SHARD_MIN:
            for d in (0, 1):
                spec = P(*(axes if i == d else None for i in range(2)))
                if _divisible(leaf, spec, mesh):
                    return jax.device_put(leaf, NamedSharding(mesh, spec))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree.map(placed, params)


def shard_vae_io(x, mesh: Mesh):
    """Place a [B, C, T, H, W] video/latent tensor with the WIDTH axis
    sharded over (sp, tp) — spatial parallelism for the VAE. GSPMD then
    partitions every conv in the jitted encode/decode, inserting the halo
    exchanges over ICI automatically (the convs are 3x3 spatial, so each
    chunk program exchanges a 1-pixel halo per conv — the TPU equivalent of
    hand-written conv halo passing). Width is chosen because the canonical
    resolutions divide evenly at both pixel and latent scale (832 and 104
    at 480p; 1280 and 160 at 720p, for sp*tp <= 8); non-divisible shapes
    fall back to replicated (single-device behavior)."""
    spec = P(None, None, None, None, ("sp", "tp"))
    if not _divisible(x, spec, mesh):
        spec = P()
    return jax.device_put(x, NamedSharding(mesh, spec))


def constrain_tokens(x: jnp.ndarray) -> jnp.ndarray:
    """Shard [B, S, D] activations over (dp, sp) when a mesh is active."""
    ctx = current_mesh()
    if ctx is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(ctx["mesh"], P(ctx["dp"], ctx["sp"], None)))


# ---------------------------------------------------------------------------
# sequence-parallel attention
# ---------------------------------------------------------------------------

def ulysses_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      k_lens=None, window_size=(-1, -1)) -> jnp.ndarray:
    """Self-attention for [B, N, S, D] with the sequence sharded over `sp`
    and heads over `tp`.

    all_to_all over sp: [B, N/tp, S/sp, D] -> [B, N/(tp*sp), S, D]; exact
    local flash attention over the full sequence; all_to_all back. Requires
    (N/tp) % sp == 0 (40 heads / sp<=8: fine). A sliding window composes
    trivially: after the all_to_all each shard holds the FULL sequence, so
    the windowed kernel applies unchanged (the reference composes
    window_size with USP the hard way, wan_transformer3d.py:399)."""
    ctx = current_mesh()
    if ctx is None:
        return flash_attention(q, k, v, k_lens=k_lens, window_size=window_size)
    mesh, dp, sp, tp = ctx["mesh"], ctx["dp"], ctx["sp"], ctx["tp"]
    sp_size = mesh.shape[sp]
    spec = P(dp, tp, sp, None)

    def local(ql, kl, vl):
        if sp_size > 1:
            ql = jax.lax.all_to_all(ql, sp, split_axis=1, concat_axis=2, tiled=True)
            kl = jax.lax.all_to_all(kl, sp, split_axis=1, concat_axis=2, tiled=True)
            vl = jax.lax.all_to_all(vl, sp, split_axis=1, concat_axis=2, tiled=True)
        o = flash_attention(ql, kl, vl, window_size=window_size)
        if sp_size > 1:
            o = jax.lax.all_to_all(o, sp, split_axis=2, concat_axis=1, tiled=True)
        return o

    return shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec, check_vma=False)(q, k, v)


def ring_sp_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Self-attention with the sequence sharded over sp using ring KV
    rotation (kernels/ring_attention.py) — the path when sp exceeds the
    local head count (Ulysses needs (N/tp) % sp == 0; the ring has no such
    constraint)."""
    ctx = current_mesh()
    if ctx is None:
        return flash_attention(q, k, v)
    mesh, dp, sp, tp = ctx["mesh"], ctx["dp"], ctx["sp"], ctx["tp"]
    if mesh.shape[sp] == 1:
        return ulysses_attention(q, k, v)
    from versecrafter_tpu.kernels.ring_attention import ring_attention

    spec = P(dp, tp, sp, None)
    return shard_map(
        lambda ql, kl, vl: ring_attention(ql, kl, vl, axis_name=sp),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)(q, k, v)


def sequence_parallel_attention(q, k, v, window_size=(-1, -1)) -> jnp.ndarray:
    """Pick Ulysses (head-scatter) when heads divide evenly, else ring.

    A sliding window forces the Ulysses path (full sequence is local after
    the all_to_all); the ring would need per-shard window offsets in the
    merge — not implemented."""
    ctx = current_mesh()
    if ctx is None:
        return flash_attention(q, k, v, window_size=window_size)
    mesh, sp, tp = ctx["mesh"], ctx["sp"], ctx["tp"]
    heads_local = q.shape[1] // mesh.shape[tp]
    windowed = tuple(window_size) != (-1, -1)
    if heads_local % mesh.shape[sp] == 0:
        return ulysses_attention(q, k, v, window_size=window_size)
    if windowed:
        raise NotImplementedError(
            f"window_size={tuple(window_size)} with sp={mesh.shape[sp]} needs "
            f"the Ulysses path, but heads/tp={heads_local} is not divisible "
            f"by sp (ring attention does not support windows)")
    return ring_sp_attention(q, k, v)


def sp_cross_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       k_lens=None) -> jnp.ndarray:
    """Cross-attention with the query sequence sharded over sp and the
    (short, replicated) KV: zero collectives — each shard attends locally."""
    ctx = current_mesh()
    if ctx is None:
        return flash_attention(q, k, v, k_lens=k_lens)
    mesh, dp, sp, tp = ctx["mesh"], ctx["dp"], ctx["sp"], ctx["tp"]
    qspec = P(dp, tp, sp, None)
    kvspec = P(dp, tp, None, None)

    def local(ql, kl, vl):
        return flash_attention(ql, kl, vl)

    return shard_map(local, mesh=mesh, in_specs=(qspec, kvspec, kvspec),
                     out_specs=qspec, check_vma=False)(q, k, v)
