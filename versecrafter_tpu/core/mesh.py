"""Device mesh construction and canonical sharding rules.

TPU-native replacement for the reference's `set_multi_gpus_devices(ulysses,
ring)` NCCL process-group setup (videox_fun.dist, consumed at
versecrafter_inference.py:180). One `jax.sharding.Mesh` with named axes:

  dp   — data parallel (batch / CFG halves)
  fsdp — parameter sharding (replaces torch FSDP `shard_model`)
  sp   — sequence (context) parallel: token axis of the DiT
  tp   — tensor parallel: attention heads and FFN hidden

The reference's ulysses×ring decomposition maps onto (tp, sp): Ulysses'
head-scatter all-to-all is what GSPMD does for a head-sharded attention, and
ring attention lives in kernels/ring_attention.py over the `sp` axis.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("dp", "fsdp", "sp", "tp")


@dataclass(frozen=True)
class MeshSpec:
    dp: int = 1
    fsdp: int = 1
    sp: int = 1
    tp: int = 1

    @property
    def shape(self):
        return (self.dp, self.fsdp, self.sp, self.tp)

    @property
    def size(self):
        return int(np.prod(self.shape))


def make_mesh(spec: Optional[MeshSpec] = None, devices: Optional[Sequence] = None) -> Mesh:
    """Build the framework mesh. With no spec, puts all devices on `sp`
    (sequence parallelism is the reference's scaling axis for one video)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if spec is None:
        spec = MeshSpec(sp=n)
    if spec.size != n:
        raise ValueError(f"mesh spec {spec.shape} needs {spec.size} devices, have {n}")
    arr = np.asarray(devices).reshape(spec.shape)
    return Mesh(arr, AXES)


def sharding(mesh: Mesh, *axes) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))


def spec_from_degrees(ulysses_degree: int = 1, ring_degree: int = 1,
                      tp: int = 1, fsdp: int = 1, dp: int = 1) -> MeshSpec:
    """Map the reference's --ulysses_degree/--ring_degree flags
    (versecrafter_inference.py:59-62) onto the mesh: both are sequence
    parallelism, so their product becomes the `sp` axis size (Ulysses vs
    ring is then an attention-impl dispatch, parallel/sharding.py)."""
    return MeshSpec(dp=dp, fsdp=fsdp, sp=ulysses_degree * ring_degree, tp=tp)


def auto_mesh_spec(n_devices: int, num_heads: int = 40) -> MeshSpec:
    """Factorize a device count into (sp, tp) automatically — the TPU
    equivalent of the reference's world-size -> ulysses x ring tables
    (model_server.py:149-191). All devices go to `sp` when the per-device
    head count stays integral for Ulysses; otherwise spill the remainder
    into `tp`."""
    if n_devices <= 1:
        return MeshSpec()
    # prefer the largest sp whose (tp, sp) split keeps Ulysses exact:
    # heads % tp == 0 and (heads/tp) % sp == 0
    for tp in sorted(d for d in range(1, n_devices + 1) if n_devices % d == 0):
        sp = n_devices // tp
        if num_heads % tp == 0 and (num_heads // tp) % sp == 0:
            return MeshSpec(sp=sp, tp=tp)
    return MeshSpec(sp=n_devices)  # ring attention backstop


# ---------------------------------------------------------------------------
# Canonical partition specs
# ---------------------------------------------------------------------------

def dit_activation_spec() -> P:
    """Token activations [B, S, D]: batch over dp, sequence over sp."""
    return P("dp", "sp", None)


def dit_param_specs() -> dict:
    """PartitionSpec tree fragments for DiT parameters, keyed by leaf-name
    suffix. Attention/FFN matrices shard their output (head/hidden) dim over
    `tp` and the other over `fsdp`; everything else is fsdp-sharded on its
    largest divisible axis or replicated."""
    return {
        # stacked-block params have a leading layer axis; specs below are for
        # the trailing (matrix) dims and get a leading None added by the
        # sharding resolver in parallel/sharding.py.
        "attn.q.kernel": P("fsdp", "tp"),
        "attn.k.kernel": P("fsdp", "tp"),
        "attn.v.kernel": P("fsdp", "tp"),
        "attn.o.kernel": P("tp", "fsdp"),
        "ffn.in.kernel": P("fsdp", "tp"),
        "ffn.out.kernel": P("tp", "fsdp"),
    }
