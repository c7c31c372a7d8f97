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
