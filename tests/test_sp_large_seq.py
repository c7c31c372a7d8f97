"""Large-sequence SP equivalence at the PRODUCTION token count
(VERDICT r3 #5).

The reference runs sequence parallelism at 75,600-226,800 tokens
(usp_attn_forward, wan_transformer3d.py:906-921); earlier suites validated
the repo's ring/Ulysses paths only at toy shapes. These tests run the
sharded paths at 32,760 tokens (the 480p x 81f operating point, seq formula
pipeline_wan_versecrafter.py:861-865) on the 8-device virtual CPU mesh and
compare against an INDEPENDENT chunked-softmax reference (exact per-row
softmax over query chunks — no online-softmax machinery shared with the
kernels under test).

Width is kept thin (the seq^2 attention term is width-independent) so the
file stays a few minutes on a CPU host; sequence length is NOT reduced —
length is exactly what the toy tests failed to cover.
"""



import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from versecrafter_tpu.core.mesh import MeshSpec, make_mesh
from versecrafter_tpu.parallel.sharding import (
    mesh_context, sequence_parallel_attention, shard_dit_params)

SEQ = 32760  # = 21 * 30 * 52 (480p x 81f latent grid)

# XLA CPU silently SIGABRTs on the first 32k shard_map attention when a
# few hundred other suite tests ran first in the same interpreter
# (reproduced twice 2026-08-20 — crash in jax array materialization with
# >90 GB host RAM free and no rlimit/cgroup cap; the identical test passes
# standalone in the same environment in ~25 min). The heavy length-coverage
# cases therefore run through a fresh-process wrapper inside `pytest tests/`.
_INLINE = os.environ.get("VC_SP_LARGE_INLINE") == "1"
heavy = pytest.mark.skipif(
    not _INLINE,
    reason="runs inside test_heavy_cases_in_fresh_process (see note above)")


@pytest.mark.skipif(_INLINE, reason="wrapper never recurses")
def test_heavy_cases_in_fresh_process():
    env = dict(os.environ, VC_SP_LARGE_INLINE="1")
    r = subprocess.run(
        [sys.executable, "-m", "pytest", os.path.abspath(__file__),
         "-q", "-x"],
        env=env, capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, (r.stdout[-4000:], r.stderr[-2000:])


@jax.jit
def _ref_chunk(qc, k, v):
    scale = 1.0 / np.sqrt(qc.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", qc.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))


def _chunked_reference(q, k, v, chunk=4096):
    """Exact attention, memory-bounded: full softmax row per query chunk.
    Independent of the flash/ring/ulysses implementations under test."""
    outs = [_ref_chunk(q[:, :, s0:s0 + chunk], k, v)
            for s0 in range(0, q.shape[2], chunk)]
    return jnp.concatenate(outs, axis=2)


def _qkv(heads, head_dim, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    shape = (1, heads, SEQ, head_dim)
    q = jax.random.normal(ks[0], shape, jnp.float32)
    k = jax.random.normal(ks[1], shape, jnp.float32)
    v = jax.random.normal(ks[2], shape, jnp.float32)
    return q, k, v


@heavy
@pytest.mark.parametrize("heads,expected_path", [
    (2, "ring"),      # heads % sp != 0 -> ring KV rotation
    (8, "ulysses"),   # heads % sp == 0 -> head all_to_all
])
def test_sp_attention_32k_tokens(heads, expected_path):
    q, k, v = _qkv(heads, 32)
    ref = np.asarray(_chunked_reference(q, k, v))
    mesh = make_mesh(MeshSpec(sp=8))
    with mesh_context(mesh):
        out = np.asarray(
            jax.jit(sequence_parallel_attention)(q, k, v).astype(jnp.float32))
    err = np.abs(out - ref).max()
    scale = np.abs(ref).max()
    assert err <= 3e-4 * max(scale, 1.0), (expected_path, err, scale)


SEQ720 = 75600  # = 21 * 45 * 80 (the reference's canonical 720p x 81f grid)


def _qkv_seq(seq, heads, head_dim, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    shape = (1, heads, seq, head_dim)
    return tuple(jax.random.normal(k, shape, jnp.float32) for k in ks)


def _chunked_reference_by_head(q, k, v, chunk=4096):
    """Exact attention at 720p scale: chunked over queries AND heads so the
    [1, 1, chunk, 75600] logits stay ~1.2 GB on the CPU host."""
    outs = []
    for h0 in range(q.shape[1]):
        hs = slice(h0, h0 + 1)
        outs.append(jnp.concatenate(
            [_ref_chunk(q[:, hs, s0:s0 + chunk], k[:, hs], v[:, hs])
             for s0 in range(0, q.shape[2], chunk)], axis=2))
    return jnp.concatenate(outs, axis=1)


@heavy
@pytest.mark.parametrize("heads,expected_path", [
    (2, "ring"),      # heads % sp != 0 -> ring KV rotation
    (8, "ulysses"),   # heads % sp == 0 -> head all_to_all
])
def test_sp_attention_75600_tokens(heads, expected_path):
    """SP equivalence at the sequence length the reference actually operates
    at — 75,600 tokens, usp_attn_forward's canonical 720p x 81f shape
    (wan_transformer3d.py:906-921; VERDICT r4 #4). SLOW (minutes on the
    1-core CPU host; never run next to other suites — CLAUDE.md)."""
    q, k, v = _qkv_seq(SEQ720, heads, 16)
    ref = np.asarray(_chunked_reference_by_head(q, k, v))
    mesh = make_mesh(MeshSpec(sp=8))
    with mesh_context(mesh):
        out = np.asarray(
            jax.jit(sequence_parallel_attention)(q, k, v).astype(jnp.float32))
    err = np.abs(out - ref).max()
    scale = np.abs(ref).max()
    assert err <= 3e-4 * max(scale, 1.0), (expected_path, err, scale)


def test_windowed_ring_refusal_at_production_heads():
    """sp=8 with indivisible heads AND a sliding window must refuse loudly
    (parallel/sharding.py:235) — windows need the Ulysses path. Asserted at
    a production-style head count rather than left as dead code."""
    q, k, v = _qkv(2, 32)
    mesh = make_mesh(MeshSpec(sp=8))
    with mesh_context(mesh):
        with pytest.raises(NotImplementedError, match="window"):
            sequence_parallel_attention(q, k, v, window_size=(256, 256))


@heavy
def test_sharded_denoise_forward_32k_vs_single():
    """Thin-width DiT forward at the full 480p x 81f latent shape
    [21, 60, 104] (32,760 tokens): sp=8-sharded (mesh collectives through
    the production dispatcher) == single-device, tolerance-aware.
    The reference behavior being matched: usp_attn_forward sharding is
    semantically invisible (wan_transformer3d.py:906-921)."""
    from versecrafter_tpu.core.config import WanDiTConfig
    from versecrafter_tpu.kernels.rope import grid_cos_sin, rope_3d_angles
    from versecrafter_tpu.models.wan_dit import init_wan_dit, wan_dit_forward

    cfg = WanDiTConfig(in_dim=4, dim=64, ffn_dim=128, freq_dim=32,
                       text_dim=32, out_dim=4, num_heads=2, num_layers=2,
                       text_len=16, geoada_layers=None)
    params = jax.jit(lambda key: init_wan_dit(key, cfg, jnp.float32))(
        jax.random.key(0))
    # zero-init head would make both outputs constant -> vacuous equality
    params["head"]["head"]["kernel"] = jax.random.normal(
        jax.random.key(9), params["head"]["head"]["kernel"].shape) * 0.05

    f_lat, h_lat, w_lat = 21, 60, 104
    angles = tuple(jnp.asarray(a) for a in rope_3d_angles(cfg.head_dim))
    cos, sin = grid_cos_sin(angles, f_lat, h_lat // 2, w_lat // 2)
    assert cos.shape[0] == SEQ

    ks = jax.random.split(jax.random.key(1), 2)
    x = jax.random.normal(ks[0], (1, cfg.in_dim, f_lat, h_lat, w_lat),
                          jnp.float32)
    ctx = jax.random.normal(ks[1], (1, cfg.text_len, cfg.text_dim),
                            jnp.float32)
    t = jnp.full((1,), 500.0, jnp.float32)

    single = np.asarray(jax.jit(
        lambda p, x, t, c: wan_dit_forward(p, cfg, x, t, c, cos, sin))(
            params, x, t, ctx))

    mesh = make_mesh(MeshSpec(sp=8))
    sparams = shard_dit_params(params, mesh)
    with mesh_context(mesh):
        sharded = np.asarray(jax.jit(
            lambda p, x, t, c: wan_dit_forward(p, cfg, x, t, c, cos, sin,
                                               attn_impl="sp"))(
                sparams, x, t, ctx))

    err = np.abs(sharded - single).max()
    scale = np.abs(single).max()
    assert err <= 5e-4 * max(scale, 1.0), (err, scale)
