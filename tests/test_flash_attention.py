"""Flash attention kernel vs. the XLA reference (run in Pallas interpret
mode on the CPU test mesh; the same kernel compiles natively on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from versecrafter_tpu.kernels.flash_attention import (
    attention_reference,
    flash_attention,
)


def _rand(shape, seed=0, dtype=np.float32):
    return np.random.default_rng(seed).standard_normal(shape).astype(dtype)


def test_reference_matches_naive_softmax():
    q = jnp.asarray(_rand((1, 2, 8, 16), 0))
    k = jnp.asarray(_rand((1, 2, 8, 16), 1))
    v = jnp.asarray(_rand((1, 2, 8, 16), 2))
    out = np.asarray(attention_reference(q, k, v))
    s = np.einsum("bnqd,bnkd->bnqk", np.asarray(q), np.asarray(k)) / np.sqrt(16)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    want = np.einsum("bnqk,bnkd->bnqd", p, np.asarray(v))
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("sq,skv", [(128, 128), (256, 384), (130, 200)])
def test_pallas_matches_reference(sq, skv):
    q = jnp.asarray(_rand((2, 2, sq, 128), 3))
    k = jnp.asarray(_rand((2, 2, skv, 128), 4))
    v = jnp.asarray(_rand((2, 2, skv, 128), 5))
    got = np.asarray(flash_attention(q, k, v, impl="pallas", block_q=128, block_kv=128))
    want = np.asarray(attention_reference(q, k, v))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pallas_k_lens_masking():
    q = jnp.asarray(_rand((2, 1, 128, 128), 6))
    k = jnp.asarray(_rand((2, 1, 256, 128), 7))
    v = jnp.asarray(_rand((2, 1, 256, 128), 8))
    k_lens = jnp.asarray([100, 256], jnp.int32)
    got = np.asarray(
        flash_attention(q, k, v, k_lens=k_lens, impl="pallas", block_q=128, block_kv=128)
    )
    want = np.asarray(attention_reference(q, k, v, k_lens=k_lens))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # batch 0 must equal attention over only the first 100 kv positions
    want_trunc = np.asarray(
        attention_reference(q[:1], k[:1, :, :100], v[:1, :, :100])
    )
    np.testing.assert_allclose(got[:1], want_trunc, rtol=2e-4, atol=2e-4)


def _dense_window_attention(q, k, v, wl, wr):
    """Brute-force masked softmax for the sliding-window semantics."""
    q, k, v = (np.asarray(t, np.float64) for t in (q, k, v))
    s = np.einsum("bnqd,bnkd->bnqk", q, k) / np.sqrt(q.shape[-1])
    sq, skv = s.shape[2], s.shape[3]
    rel = np.arange(skv)[None, :] - np.arange(sq)[:, None]
    ok = np.ones((sq, skv), bool)
    if wl >= 0:
        ok &= rel >= -wl
    if wr >= 0:
        ok &= rel <= wr
    s = np.where(ok, s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bnqk,bnkd->bnqd", p, v)


@pytest.mark.parametrize("window", [(64, 64), (-1, 0), (200, 32), (0, 0)])
def test_window_masking(window):
    """Sliding-window / causal masking: pallas kernel (with its tile-skip
    fast path) and the XLA reference both match a dense masked softmax."""
    sq = skv = 384
    q = jnp.asarray(_rand((1, 2, sq, 128), 20))
    k = jnp.asarray(_rand((1, 2, skv, 128), 21))
    v = jnp.asarray(_rand((1, 2, skv, 128), 22))
    want = _dense_window_attention(q, k, v, *window)
    got_xla = np.asarray(attention_reference(q, k, v, window_size=window))
    np.testing.assert_allclose(got_xla, want, rtol=2e-4, atol=2e-4)
    got_pl = np.asarray(flash_attention(q, k, v, impl="pallas", block_q=128,
                                        block_kv=128, window_size=window))
    np.testing.assert_allclose(got_pl, want, rtol=2e-4, atol=2e-4)


def test_window_with_k_lens_and_ragged_shapes():
    q = jnp.asarray(_rand((2, 1, 130, 128), 23))
    k = jnp.asarray(_rand((2, 1, 200, 128), 24))
    v = jnp.asarray(_rand((2, 1, 200, 128), 25))
    k_lens = jnp.asarray([150, 200], jnp.int32)
    got = np.asarray(flash_attention(q, k, v, k_lens=k_lens, impl="pallas",
                                     block_q=128, block_kv=128,
                                     window_size=(96, 96)))
    want = np.asarray(attention_reference(q, k, v, k_lens=k_lens,
                                          window_size=(96, 96)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_bf16_inputs():
    q = jnp.asarray(_rand((1, 1, 128, 128), 9), jnp.bfloat16)
    k = jnp.asarray(_rand((1, 1, 128, 128), 10), jnp.bfloat16)
    v = jnp.asarray(_rand((1, 1, 128, 128), 11), jnp.bfloat16)
    got = flash_attention(q, k, v, impl="pallas", block_q=128, block_kv=128)
    assert got.dtype == jnp.bfloat16
    want = attention_reference(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=3e-2, atol=3e-2
    )


def test_pick_block_q_minimizes_padding():
    from versecrafter_tpu.kernels.flash_attention import _pick_block_q, _ceil_to

    assert _pick_block_q(32760) == 4680   # exact divisor, zero padding
    assert _pick_block_q(75600) == 5400   # exact divisor (docstring value)
    assert _pick_block_q(512) == 512
    # ring-shard lengths with no divisor in range: padding must stay small
    for sq in (9450, 8190, 75600 // 8, 100000):
        bq = _pick_block_q(sq)
        pad = _ceil_to(sq, bq) - sq
        assert pad / sq < 0.05, (sq, bq, pad)


class TestFusedRopeRmsAttention:
    """Fused qk-RMSNorm+RoPE attention kernel (inference fast path) vs the
    separate-passes reference math. On the real chip the compiled kernel
    matched to 5e-4 at Wan scale (bq=4680, S=32760); these interpret-mode
    tests pin the same contract."""

    def _setup(self, B=2, S=520, N=4, HD=64, dtype=jnp.float32, seed=0):
        import numpy as np
        from versecrafter_tpu.kernels.rope import (
            grid_cos_sin, rope_3d_angles)
        D = N * HD
        rng = np.random.default_rng(seed)
        q = jnp.asarray(rng.standard_normal((B, S, D)), dtype)
        k = jnp.asarray(rng.standard_normal((B, S, D)), dtype)
        v = jnp.asarray(rng.standard_normal((B, S, D)), dtype)
        gq = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, jnp.float32)
        gk = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, jnp.float32)
        ang = rope_3d_angles(HD, max_pos=64)
        cos, sin = grid_cos_sin(tuple(jnp.asarray(a) for a in ang), 10, 4, 13)
        return q, k, v, cos, sin, gq, gk, N, HD

    def test_parity_unaligned_seq(self):
        from versecrafter_tpu.kernels.flash_attention import (
            _unfused_rope_rms_attention, fused_rope_rms_attention)
        q, k, v, cos, sin, gq, gk, N, HD = self._setup()
        ref = _unfused_rope_rms_attention(q, k, v, cos, sin, gq, gk, N, 1e-6,
                                          HD ** -0.5, (-1, -1), "xla")
        got = fused_rope_rms_attention(q, k, v, cos, sin, gq, gk,
                                       num_heads=N, impl="pallas")
        assert float(jnp.max(jnp.abs(ref - got))) < 2e-3

    def test_parity_window_and_nonorm(self):
        from versecrafter_tpu.kernels.flash_attention import (
            _unfused_rope_rms_attention, fused_rope_rms_attention)
        q, k, v, cos, sin, gq, gk, N, HD = self._setup()
        ref = _unfused_rope_rms_attention(q, k, v, cos, sin, gq, gk, N, 1e-6,
                                          HD ** -0.5, (64, 32), "xla")
        got = fused_rope_rms_attention(q, k, v, cos, sin, gq, gk,
                                       num_heads=N, window_size=(64, 32),
                                       impl="pallas")
        assert float(jnp.max(jnp.abs(ref - got))) < 5e-3
        ref0 = _unfused_rope_rms_attention(q, k, v, cos, sin, None, None, N,
                                           1e-6, HD ** -0.5, (-1, -1), "xla")
        got0 = fused_rope_rms_attention(q, k, v, cos, sin, None, None,
                                        num_heads=N, impl="pallas")
        assert float(jnp.max(jnp.abs(ref0 - got0))) < 2e-3

    def test_bf16_parity(self):
        from versecrafter_tpu.kernels.flash_attention import (
            _unfused_rope_rms_attention, fused_rope_rms_attention)
        q, k, v, cos, sin, gq, gk, N, HD = self._setup(dtype=jnp.bfloat16)
        ref = _unfused_rope_rms_attention(q, k, v, cos, sin, gq, gk, N, 1e-6,
                                          HD ** -0.5, (-1, -1), "xla")
        got = fused_rope_rms_attention(q, k, v, cos, sin, gq, gk,
                                       num_heads=N, impl="pallas")
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        assert err < 1e-2  # bf16 inputs: one-rounding vs two-rounding paths

    def test_grad_delegates_to_unfused(self):
        """Under jax.grad the fused call must produce EXACTLY the unfused
        path's gradients (training numerics rule)."""
        import jax
        from versecrafter_tpu.kernels.flash_attention import (
            _unfused_rope_rms_attention, fused_rope_rms_attention)
        q, k, v, cos, sin, gq, gk, N, HD = self._setup()

        f = lambda q, gq: fused_rope_rms_attention(
            q, k, v, cos, sin, gq, gk, num_heads=N, impl="pallas").sum()
        u = lambda q, gq: _unfused_rope_rms_attention(
            q, k, v, cos, sin, gq, gk, N, 1e-6, HD ** -0.5, (-1, -1),
            "auto").sum()
        gf = jax.grad(f, argnums=(0, 1))(q, gq)
        gu = jax.grad(u, argnums=(0, 1))(q, gq)
        for a, b in zip(gf, gu):
            assert float(jnp.max(jnp.abs(a - b))) == 0.0

    def test_resident_kv_matches_streaming_multiblock(self):
        """Resident-KV mode (V resident + K rotated once on the iq == 0
        pass) must be bit-identical to the streaming mode on a grid with
        MULTIPLE q and kv blocks — the only regime where the rotate-once
        reuse across q blocks actually happens — including a k_lens-masked
        ragged tail."""

        import jax
        import importlib
        fa = importlib.import_module(
            "versecrafter_tpu.kernels.flash_attention")
        q, k, v, cos, sin, gq, gk, N, HD = self._setup(S=460)
        # tables must cover exactly S rows (the _setup grid yields 520)
        from versecrafter_tpu.kernels.rope import grid_cos_sin, rope_3d_angles
        ang = rope_3d_angles(HD, max_pos=64)
        cos, sin = grid_cos_sin(tuple(jnp.asarray(a) for a in ang), 10, 2, 23)
        b, s, d = q.shape
        eps, sm_scale = 1e-6, HD ** -0.5
        scale_q = sm_scale * fa.LOG2E
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        rq = jax.lax.rsqrt(
            jnp.mean(qf * qf, axis=-1, keepdims=True) + eps) * scale_q
        rk = jax.lax.rsqrt(jnp.mean(kf * kf, axis=-1, keepdims=True) + eps)
        gq_h = gq.astype(jnp.float32).reshape(N, 1, HD)
        gk_h = gk.astype(jnp.float32).reshape(N, 1, HD)
        cos_i, sin_i = fa.prepare_fused_rope_tables(cos, sin, block_kv=128)
        k_lens = jnp.full((b,), s, jnp.int32)
        outs = [
            fa._flash_attention_fused_pallas(
                q, k, v, k_lens, rq, rk, cos_i, sin_i, gq_h, gk_h,
                head_dim=HD, block_q=128, block_kv=128, interpret=True,
                masked=True, resident_kv=res)
            for res in (False, True)
        ]
        # interpret mode lowers the two variants to two different XLA CPU
        # programs whose dot reassociation differs by a couple of fp32 ULPs;
        # the math is identical (same tiles, same order)
        assert float(jnp.max(jnp.abs(outs[0] - outs[1]))) < 1e-6

    def test_table_cap_falls_back(self):
        """Sequences whose resident tables exceed the VMEM budget must route
        to the unfused path (correctness preserved)."""
        import importlib
        # kernels/__init__ rebinds the `flash_attention` attribute to the
        # function, so plain `import ... as fa` would resolve to it
        fa = importlib.import_module(
            "versecrafter_tpu.kernels.flash_attention")
        q, k, v, cos, sin, gq, gk, N, HD = self._setup()
        old = fa.MAX_TABLE_BYTES
        fa.MAX_TABLE_BYTES = 1  # force fallback
        try:
            got = fa.fused_rope_rms_attention(
                q, k, v, cos, sin, gq, gk, num_heads=N, impl="pallas")
        finally:
            fa.MAX_TABLE_BYTES = old
        ref = fa._unfused_rope_rms_attention(
            q, k, v, cos, sin, gq, gk, N, 1e-6, HD ** -0.5, (-1, -1),
            "pallas")
        assert float(jnp.max(jnp.abs(ref - got))) == 0.0

    def test_blocked_tables_matches_streaming_multiblock(self):
        """Long-sequence resident mode delivers the rope tables as
        tile-mapped blocks (q-row tile keyed on iq, k-row tile following
        the rotate-once map) instead of full-array residents. Must match
        the streaming kernel on a multi-q-block, multi-kv-block grid with
        a ragged tail."""
        import importlib

        import jax
        fa = importlib.import_module(
            "versecrafter_tpu.kernels.flash_attention")
        q, k, v, cos, sin, gq, gk, N, HD = self._setup(S=460)
        from versecrafter_tpu.kernels.rope import grid_cos_sin, rope_3d_angles
        ang = rope_3d_angles(HD, max_pos=64)
        cos, sin = grid_cos_sin(tuple(jnp.asarray(a) for a in ang), 10, 2, 23)
        b, s, d = q.shape
        eps, sm_scale = 1e-6, HD ** -0.5
        scale_q = sm_scale * fa.LOG2E
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        rq = jax.lax.rsqrt(
            jnp.mean(qf * qf, axis=-1, keepdims=True) + eps) * scale_q
        rk = jax.lax.rsqrt(jnp.mean(kf * kf, axis=-1, keepdims=True) + eps)
        gq_h = gq.astype(jnp.float32).reshape(N, 1, HD)
        gk_h = gk.astype(jnp.float32).reshape(N, 1, HD)
        cos_i, sin_i = fa.prepare_fused_rope_tables(cos, sin, block_kv=128)
        k_lens = jnp.full((b,), s, jnp.int32)
        outs = [
            fa._flash_attention_fused_pallas(
                q, k, v, k_lens, rq, rk, cos_i, sin_i, gq_h, gk_h,
                head_dim=HD, block_q=128, block_kv=128, interpret=True,
                masked=True, resident_kv=res, blocked_tables=blk)
            for res, blk in ((False, False), (True, True))
        ]
        assert float(jnp.max(jnp.abs(outs[0] - outs[1]))) < 1e-6

    def test_block_geometry_modes(self):
        """Pin the production operating points: 480p x 81f (32,760 tok)
        keeps the measured resident config with FULL-resident tables;
        720p x 81f (75,600 tok) runs resident with BLOCKED tables and
        PAD-FREE divisor blocks (above 70k tokens the 740 MB padded
        q/k/v/out copies and their fragmentation outweigh block-alignment
        speed — the 14B GeoAdapter 720p single-chip fit)."""
        import importlib
        fa = importlib.import_module(
            "versecrafter_tpu.kernels.flash_attention")
        bq, bkv, res, blocked = fa._fused_block_geometry(32760, 128)
        assert (bq, bkv, res, blocked) == (4096, 1024, True, False)
        bq, bkv, res, blocked = fa._fused_block_geometry(75600, 128)
        assert (bkv, res, blocked) == (1008, True, True)
        assert bq == 1680 and 75600 % bq == 0 and 75600 % bkv == 0
        # windowed attention never runs resident (rotate-once skips tiles)
        _, _, res, _ = fa._fused_block_geometry(32760, 128, window=(512, 512))
        assert not res

    def test_plain_models_unfused_at_blocked_tables(self):
        """fused_tables_blocked drives the model-level gate: at 720p
        (75,600 tok) PLAIN models must NOT fuse (chip-measured +699 ms
        resident / +716 ms streaming vs unfused) while geoada still does
        (-568 ms) — bench_fused_ablation --res 720 [--streaming]."""
        import importlib
        fa = importlib.import_module(
            "versecrafter_tpu.kernels.flash_attention")
        assert not fa.fused_tables_blocked(32760, 128)   # 480p: plain fuses
        assert fa.fused_tables_blocked(75600, 128)       # 720p: plain won't
        # geoada's gate (resident availability) stays on at both lengths
        assert fa.resident_kv_available(32760, 128)
        assert fa.resident_kv_available(75600, 128)

    def test_block_kv_cap_override(self):
        """FUSED_BLOCK_KV_CAP is the single default source for the kv block
        (geometry sweeps override it); explicit block_kv_cap still wins."""
        import importlib
        fa = importlib.import_module(
            "versecrafter_tpu.kernels.flash_attention")
        old = fa.FUSED_BLOCK_KV_CAP
        try:
            fa.FUSED_BLOCK_KV_CAP = 512
            assert fa._fused_block_geometry(32760, 128)[1] == 512
            assert fa._fused_block_geometry(
                32760, 128, block_kv_cap=256)[1] == 256
        finally:
            fa.FUSED_BLOCK_KV_CAP = old
        assert fa._fused_block_geometry(32760, 128)[1] == 1024


class TestFusedCrossAttention:
    """Norm-only fused kernel (fused_rms_cross_attention): cross-attention
    with qk-RMSNorm in the kernel prologue, no rope tables at all."""

    def _setup(self, B=2, Sq=520, Skv=192, N=4, HD=64, dtype=jnp.float32):
        import numpy as np
        D = N * HD
        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.standard_normal((B, Sq, D)), dtype)
        k = jnp.asarray(rng.standard_normal((B, Skv, D)), dtype)
        v = jnp.asarray(rng.standard_normal((B, Skv, D)), dtype)
        gq = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, jnp.float32)
        gk = jnp.asarray(rng.standard_normal(D) * 0.1 + 1.0, jnp.float32)
        return q, k, v, gq, gk, N, HD

    def test_parity(self):
        from versecrafter_tpu.kernels.flash_attention import (
            _unfused_rms_cross_attention, fused_rms_cross_attention)
        q, k, v, gq, gk, N, HD = self._setup()
        ref = _unfused_rms_cross_attention(q, k, v, gq, gk, N, 1e-6,
                                           HD ** -0.5, "xla")
        got = fused_rms_cross_attention(q, k, v, gq, gk, num_heads=N,
                                        impl="pallas")
        assert float(jnp.max(jnp.abs(ref - got))) < 2e-3

    def test_parity_no_norm_bf16(self):
        from versecrafter_tpu.kernels.flash_attention import (
            _unfused_rms_cross_attention, fused_rms_cross_attention)
        q, k, v, gq, gk, N, HD = self._setup(dtype=jnp.bfloat16)
        ref = _unfused_rms_cross_attention(q, k, v, None, None, N, 1e-6,
                                           HD ** -0.5, "xla")
        got = fused_rms_cross_attention(q, k, v, None, None, num_heads=N,
                                        impl="pallas")
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        assert err < 1e-2

    def test_grad_delegates_to_unfused(self):
        import jax
        from versecrafter_tpu.kernels.flash_attention import (
            _unfused_rms_cross_attention, fused_rms_cross_attention)
        q, k, v, gq, gk, N, HD = self._setup()
        f = lambda q, gq: fused_rms_cross_attention(
            q, k, v, gq, gk, num_heads=N, impl="pallas").sum()
        u = lambda q, gq: _unfused_rms_cross_attention(
            q, k, v, gq, gk, N, 1e-6, HD ** -0.5, "auto").sum()
        gf = jax.grad(f, argnums=(0, 1))(q, gq)
        gu = jax.grad(u, argnums=(0, 1))(q, gq)
        for a, b in zip(gf, gu):
            assert float(jnp.max(jnp.abs(a - b))) == 0.0

    def test_block_forward_flag_parity(self):
        """wan_block_forward with FUSED_CROSS_ATTENTION on == off."""
        import numpy as np
        from versecrafter_tpu.core.config import WanDiTConfig
        from versecrafter_tpu.models import wan_dit
        import jax

        cfg = WanDiTConfig(in_dim=4, dim=128, ffn_dim=256, freq_dim=32,
                           text_dim=32, out_dim=4, num_heads=2, num_layers=1,
                           text_len=16)
        p = wan_dit._init_block(jax.random.key(0), cfg, jnp.float32)
        rng = np.random.default_rng(0)
        S = 24 * 4  # f*h*w grid below
        x = jnp.asarray(rng.standard_normal((1, S, cfg.dim)), jnp.float32)
        e0 = jnp.asarray(rng.standard_normal((1, 6, cfg.dim)) * 0.1,
                         jnp.float32)
        ctx = jnp.asarray(rng.standard_normal((1, 16, cfg.dim)), jnp.float32)
        from versecrafter_tpu.kernels.rope import (grid_cos_sin,
                                                   rope_3d_angles)
        ang = rope_3d_angles(cfg.head_dim, max_pos=32)
        cos, sin = grid_cos_sin(tuple(jnp.asarray(a) for a in ang), 6, 4, 4)
        old = wan_dit.FUSED_CROSS_ATTENTION
        try:
            wan_dit.FUSED_CROSS_ATTENTION = False
            a = wan_dit.wan_block_forward(p, cfg, x, e0, cos, sin, ctx,
                                          "pallas")
            wan_dit.FUSED_CROSS_ATTENTION = True
            b = wan_dit.wan_block_forward(p, cfg, x, e0, cos, sin, ctx,
                                          "pallas")
        finally:
            wan_dit.FUSED_CROSS_ATTENTION = old
        assert float(jnp.max(jnp.abs(a - b))) < 2e-3


class TestFusedTablePadding:
    def test_oversized_tables_sliced_not_crashed(self):
        """Tables pre-padded for a LARGER geometry than the dispatch's
        (e.g. hoisted unwindowed-resident tables reaching a windowed
        dispatch with a smaller pad) must be sliced down, not jnp.pad with
        a negative width."""
        import importlib

        import jax
        fa = importlib.import_module(
            "versecrafter_tpu.kernels.flash_attention")
        from versecrafter_tpu.kernels.rope import grid_cos_sin, rope_3d_angles
        B, N, HD = 1, 2, 64
        S = 300  # pads to 384 at bq 128
        ks = jax.random.split(jax.random.key(3), 5)
        q = jax.random.normal(ks[0], (B, S, N * HD), jnp.bfloat16)
        k = jax.random.normal(ks[1], (B, S, N * HD), jnp.bfloat16)
        v = jax.random.normal(ks[2], (B, S, N * HD), jnp.bfloat16)
        gq = 1.0 + 0.1 * jax.random.normal(ks[3], (N * HD,), jnp.float32)
        gk = 1.0 + 0.1 * jax.random.normal(ks[4], (N * HD,), jnp.float32)
        ang = tuple(jnp.asarray(a) for a in rope_3d_angles(HD, max_pos=32))
        cos, sin = grid_cos_sin(ang, 3, 10, 10)
        eps, sm = 1e-6, HD ** -0.5
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        rq = jax.lax.rsqrt(
            jnp.mean(qf * qf, -1, keepdims=True) + eps) * sm * fa.LOG2E
        rk = jax.lax.rsqrt(jnp.mean(kf * kf, -1, keepdims=True) + eps)
        gqh = gq.reshape(N, 1, HD)
        gkh = gk.reshape(N, 1, HD)
        klens = jnp.full((B,), S, jnp.int32)
        from versecrafter_tpu.kernels.rope import interleave_rope_tables
        ci, si = interleave_rope_tables(cos, sin)
        ci, si = ci.astype(jnp.bfloat16), si.astype(jnp.bfloat16)
        exact = jnp.pad(ci, ((0, 384 - S), (0, 0)))
        exact_s = jnp.pad(si, ((0, 384 - S), (0, 0)))
        over = jnp.pad(ci, ((0, 512 - S), (0, 0)))   # padded for bq 256+
        over_s = jnp.pad(si, ((0, 512 - S), (0, 0)))
        kw = dict(head_dim=HD, block_q=128, block_kv=128, interpret=True,
                  masked=True)
        a = fa._flash_attention_fused_pallas(
            q, k, v, klens, rq, rk, exact, exact_s, gqh, gkh, **kw)
        b = fa._flash_attention_fused_pallas(
            q, k, v, klens, rq, rk, over, over_s, gqh, gkh, **kw)
        assert float(jnp.max(jnp.abs(a - b))) == 0.0

    def test_prepare_tables_window_aware(self):
        """prepare_fused_rope_tables pads with the geometry the dispatch
        will pick for the SAME window — windowed programs never run
        resident, which changes block_q and hence the pad."""
        import importlib
        fa = importlib.import_module(
            "versecrafter_tpu.kernels.flash_attention")
        import numpy as np

        hd = 128
        half = hd // 2
        for s in (32760, 35000, 50000):
            cos = jnp.asarray(np.random.default_rng(0).random((s, half)),
                              jnp.float32)
            for window in ((-1, -1), (512, 512)):
                bq, bkv, _, _ = fa._fused_block_geometry(s, hd, window=window)
                want = max(fa._ceil_to(s, bq), fa._ceil_to(s, bkv))
                ci, _ = fa.prepare_fused_rope_tables(cos, cos, window=window)
                assert ci.shape[0] == want, (s, window, ci.shape[0], want)
