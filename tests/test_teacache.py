"""Per-branch TeaCache semantics (reference wan_transformer3d.py:205-245:
cond and uncond CFG branches keep separate accumulators and skip
independently)."""

import jax.numpy as jnp
import numpy as np

from versecrafter_tpu.sampling import teacache as tc


def _blocks(tokens):
    return tokens * 2.0 + 1.0


def test_rows_skip_independently():
    b, s, d = 2, 4, 8
    tokens = jnp.arange(b * s * d, dtype=jnp.float32).reshape(b, s, d) / 100.0
    prev_mod = jnp.ones((b, 6, d), jnp.float32)
    prev_res = jnp.full((b, s, d), 0.5, jnp.float32)
    state = tc.TeaCacheState(
        prev_mod=prev_mod, prev_residual=prev_res,
        accum=jnp.zeros((b,)), valid=jnp.ones((b,), jnp.bool_))

    # row 0 (uncond): e0 near prev_mod -> rel 0.1 -> below threshold (skip)
    # row 1 (cond): e0 far from prev_mod -> rel 2 -> crosses (compute)
    e0 = jnp.stack([1.1 * prev_mod[0], 3.0 * prev_mod[1]])
    out, new = tc.gated_blocks(
        _blocks, tokens, e0, state, step_index=jnp.asarray(5),
        threshold=1.0, skip_start=0, coefficients=(1.0, 0.0))  # poly(x)=x

    # row 0 reused its cached residual; row 1 got the fresh forward
    np.testing.assert_allclose(np.asarray(out[0]),
                               np.asarray(tokens[0] + prev_res[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]),
                               np.asarray(_blocks(tokens)[1]), rtol=1e-6)
    # residual cache: row 0 unchanged, row 1 refreshed
    np.testing.assert_allclose(np.asarray(new.prev_residual[0]),
                               np.asarray(prev_res[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new.prev_residual[1]),
                               np.asarray((_blocks(tokens) - tokens)[1]), rtol=1e-6)
    # accumulator: row 0 kept accumulating, row 1 reset on compute
    assert float(new.accum[0]) > 0.0
    assert float(new.accum[1]) == 0.0


def test_both_rows_skip_reuses_residuals():
    b, s, d = 2, 3, 4
    tokens = jnp.ones((b, s, d), jnp.float32)
    prev_mod = jnp.ones((b, 6, d), jnp.float32)
    prev_res = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, s, d)), jnp.float32)
    state = tc.TeaCacheState(
        prev_mod=prev_mod, prev_residual=prev_res,
        accum=jnp.zeros((b,)), valid=jnp.ones((b,), jnp.bool_))
    out, new = tc.gated_blocks(
        _blocks, tokens, prev_mod * 1.0001, state, step_index=jnp.asarray(9),
        threshold=1e6, skip_start=0, coefficients=(1.0, 0.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(tokens + prev_res),
                               rtol=1e-5)
    # both accumulators kept growing (no reset without a compute)
    assert (np.asarray(new.accum) > 0).all()


def test_skip_start_forces_compute():
    b, s, d = 2, 3, 4
    tokens = jnp.ones((b, s, d), jnp.float32)
    state = tc.init_state(b, s, d, jnp.float32)
    out, new = tc.gated_blocks(
        _blocks, tokens, jnp.ones((b, 6, d)), state,
        step_index=jnp.asarray(0), threshold=1e6, skip_start=5,
        coefficients=(0.0,))
    np.testing.assert_allclose(np.asarray(out), np.asarray(_blocks(tokens)),
                               rtol=1e-6)
    assert np.asarray(new.valid).all()


def test_fit_coefficients_recovers_polynomial():
    """fit_teacache_coefficients must recover a known rescale polynomial
    from (rel_e0, rel_residual) observations."""
    rng = np.random.default_rng(0)
    true = (3.0, -2.0, 0.5, 0.1, 0.02)
    x = rng.uniform(0.01, 0.3, size=200)
    y = np.polyval(true, x)
    got = tc.fit_teacache_coefficients(x, y, degree=4)
    np.testing.assert_allclose(got, true, rtol=1e-6)
    with np.testing.assert_raises(ValueError):
        tc.fit_teacache_coefficients([0.1, 0.2], [0.3, 0.4], degree=4)


def test_recording_blocks_measures_residual_drift():
    """recording_blocks never skips and reports the residual rel-L1 drift in
    accum (the fit target)."""
    rng = np.random.default_rng(1)
    b, s, d = 2, 6, 8
    tokens = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    e0 = jnp.asarray(rng.standard_normal((b, 6, d)), jnp.float32)
    state = tc.init_state(b, s, d, jnp.float32)
    delta = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    out1, st1 = tc.recording_blocks(lambda tk: tk + delta, tokens, e0, state)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(tokens + delta))
    np.testing.assert_allclose(np.asarray(st1.prev_residual),
                               np.asarray(delta), atol=1e-6)
    # second step with residual 1.1*delta: rel drift = 0.1*|delta|/|delta|
    out2, st2 = tc.recording_blocks(lambda tk: tk + 1.1 * delta, tokens, e0, st1)
    rel = np.abs(0.1 * np.asarray(delta)).mean(axis=(1, 2)) \
        / np.abs(np.asarray(delta)).mean(axis=(1, 2))
    np.testing.assert_allclose(np.asarray(st2.accum), rel, rtol=1e-4)


def test_recording_subsampled_state_matches_full_stats():
    """A record state built at ceil(S/stride) rows (the 720p HBM fit —
    teacache.TEA_RECORD_SUBSAMPLE_ROWS) must report the same rel-L1
    residual drift as the full-resolution state: the statistic is a mean
    over ~400M elements at production scale, so a strided subset estimates
    it tightly. Here the residual field is built so subset and full agree
    analytically AND a random-field case stays within a few percent."""
    rng = np.random.default_rng(7)
    b, s, d = 1, 4096, 16
    stride = tc.RECORD_SUBSAMPLE_STRIDE
    tokens = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    e0 = jnp.asarray(rng.standard_normal((b, 6, d)), jnp.float32)
    d1 = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    d2 = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)

    full = tc.init_state(b, s, d, jnp.float32)
    sub = tc.init_state(b, -(-s // stride), d, jnp.float32)
    assert not isinstance(sub.prev_residual, dict)

    _, f1 = tc.recording_blocks(lambda tk: tk + d1, tokens, e0, full)
    _, s1 = tc.recording_blocks(lambda tk: tk + d1, tokens, e0, sub)
    assert s1.prev_residual.shape == (b, -(-s // stride), d)
    np.testing.assert_allclose(np.asarray(s1.prev_residual),
                               np.asarray(d1)[:, ::stride], atol=1e-6)

    out_f, f2 = tc.recording_blocks(lambda tk: tk + d2, tokens, e0, f1)
    out_s, s2 = tc.recording_blocks(lambda tk: tk + d2, tokens, e0, s1)
    # the OUTPUT is identical (recording never skips, fresh pass both ways)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_f))
    # the drift statistic agrees to sampling error on a random field
    rf, rs = float(f2.accum[0]), float(s2.accum[0])
    assert abs(rs - rf) <= 0.05 * max(rf, 1e-6), (rs, rf)


def test_recording_rejects_non_strided_state_rows():
    rng = np.random.default_rng(3)
    b, s, d = 1, 100, 8
    tokens = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    e0 = jnp.asarray(rng.standard_normal((b, 6, d)), jnp.float32)
    bad = tc.init_state(b, 33, d, jnp.float32)  # ceil(100/3)=34, 100/33→3
    with np.testing.assert_raises(ValueError):
        tc.recording_blocks(lambda tk: tk, tokens, e0, bad)


def test_record_fit_fire_end_to_end():
    """The full loop the reference never shipped a utility for: record
    trajectories -> fit coefficients -> enable_teacache with them -> steps
    genuinely skip (accum > 0 after a step means that row skipped)."""
    import dataclasses
    import jax
    from tests.test_pipeline import (
        DIT_CFG, T5_CFG, VAE_CFG, _controls, _live_dit_params, _mask)
    from versecrafter_tpu.models.t5 import init_t5
    from versecrafter_tpu.models.vae import init_vae
    from versecrafter_tpu.sampling.pipeline import VerseCrafterPipeline

    pipe = VerseCrafterPipeline(
        dit_params=_live_dit_params(), dit_cfg=DIT_CFG,
        vae_params=init_vae(jax.random.key(1), VAE_CFG, jnp.float32),
        vae_cfg=VAE_CFG,
        t5_params=init_t5(jax.random.key(2), T5_CFG, jnp.float32),
        t5_cfg=T5_CFG, scheduler_name="unipc")

    kw = dict(control_videos=_controls(), mask_video=_mask(), height=8,
              width=8, num_frames=5, num_inference_steps=8,
              guidance_scale=2.0, shift=3.0, seed=7, dtype=jnp.float32)
    rel_e0, rel_res = pipe.record_teacache_stats("a car", **kw)
    assert rel_e0.shape == rel_res.shape == (7, 2)
    assert np.isfinite(rel_e0).all() and np.isfinite(rel_res).all()
    assert pipe.teacache_record is None  # cleaned up

    coeffs = tc.fit_teacache_coefficients(rel_e0, rel_res, degree=2)
    # threshold above the typical predicted drift -> accumulation must build
    # across steps before a fresh pass fires; with skip_start=1 some steps
    # skip
    thresh = float(np.polyval(coeffs, rel_e0.mean()) * 2.0)
    pipe.enable_teacache(max(thresh, 1e-6), skip_start=1,
                         coefficients=coeffs)
    pipe.teacache_debug = True
    pipe.teacache_accum_history = []
    out = pipe("a car", **kw)
    assert np.isfinite(out).all()
    accums = np.stack(pipe.teacache_accum_history)  # [steps, rows]
    assert (accums != 0).any(), "no step ever skipped with fitted coefficients"


def test_host_gated_matches_in_graph_cond(monkeypatch):
    """The host-gated path (tc.host_gate over wan_dit_e0 + two small
    programs — the 720p sequential-CFG HBM fix) must reproduce the in-graph
    lax.cond path exactly: same skip schedule, same latents."""
    import jax
    from tests.test_pipeline import (
        DIT_CFG, T5_CFG, VAE_CFG, _controls, _live_dit_params, _mask)
    from versecrafter_tpu.models.t5 import init_t5
    from versecrafter_tpu.models.vae import init_vae
    from versecrafter_tpu.sampling.pipeline import VerseCrafterPipeline

    pipe = VerseCrafterPipeline(
        dit_params=_live_dit_params(), dit_cfg=DIT_CFG,
        vae_params=init_vae(jax.random.key(1), VAE_CFG, jnp.float32),
        vae_cfg=VAE_CFG,
        t5_params=init_t5(jax.random.key(2), T5_CFG, jnp.float32),
        t5_cfg=T5_CFG, scheduler_name="unipc", cfg_parallel=False)
    kw = dict(control_videos=_controls(), mask_video=_mask(), height=8,
              width=8, num_frames=5, num_inference_steps=8,
              guidance_scale=2.0, shift=3.0, seed=7, dtype=jnp.float32,
              output_type="latent")
    rel_e0, rel_res = pipe.record_teacache_stats("a car", **kw)
    coeffs = tc.fit_teacache_coefficients(rel_e0, rel_res, degree=2)
    thresh = float(np.polyval(coeffs, rel_e0.mean()) * 2.0)
    pipe.enable_teacache(max(thresh, 1e-6), skip_start=1,
                         coefficients=coeffs)
    pipe.teacache_debug = True

    monkeypatch.setattr(tc, "TEA_HOST_GATE_ROWS", 10 ** 9)  # in-graph cond
    ref = np.asarray(pipe("a car", **kw))
    ref_hist = np.stack(pipe.teacache_accum_history)

    monkeypatch.setattr(tc, "TEA_HOST_GATE_ROWS", 0)        # host-gated
    got = np.asarray(pipe("a car", **kw))
    got_hist = np.stack(pipe.teacache_accum_history)

    # identical skip schedule (accum==0 <=> that step ran fresh) and
    # near-identical accum trajectory (host f64 polyval vs device f32 poly)
    assert ((ref_hist == 0) == (got_hist == 0)).all()
    assert (ref_hist != 0).any(), "schedule never skipped — vacuous test"
    np.testing.assert_allclose(got_hist, ref_hist, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

    # cfg-skip composes: the uncond branch freezes inside the window
    pipe.enable_cfg_skip(0.25)
    out = np.asarray(pipe("a car", **kw))
    assert np.isfinite(out).all()


def test_record_through_pipeline_with_subsampled_state(monkeypatch):
    """record_teacache_stats with the subsample threshold forced low — the
    exact wiring the 14B 720p record pass uses (pipeline builds the record
    state at ceil(S/stride) rows; sequential-CFG per-branch states): stats
    stay finite and the fit still works."""
    import jax
    from tests.test_pipeline import (
        DIT_CFG, T5_CFG, VAE_CFG, _controls, _live_dit_params, _mask)
    from versecrafter_tpu.models.t5 import init_t5
    from versecrafter_tpu.models.vae import init_vae
    from versecrafter_tpu.sampling.pipeline import VerseCrafterPipeline

    monkeypatch.setattr(tc, "TEA_RECORD_SUBSAMPLE_ROWS", 1)
    monkeypatch.setattr(tc, "RECORD_SUBSAMPLE_STRIDE", 4)

    pipe = VerseCrafterPipeline(
        dit_params=_live_dit_params(), dit_cfg=DIT_CFG,
        vae_params=init_vae(jax.random.key(1), VAE_CFG, jnp.float32),
        vae_cfg=VAE_CFG,
        t5_params=init_t5(jax.random.key(2), T5_CFG, jnp.float32),
        t5_cfg=T5_CFG, scheduler_name="unipc")
    kw = dict(control_videos=_controls(), mask_video=_mask(), height=8,
              width=8, num_frames=5, num_inference_steps=6,
              guidance_scale=2.0, shift=3.0, seed=7, dtype=jnp.float32)
    # batched-CFG recording (the 480p path)
    rel_e0, rel_res = pipe.record_teacache_stats("a car", **kw)
    assert np.isfinite(rel_e0).all() and np.isfinite(rel_res).all()
    # sequential-CFG recording (the 720p path: per-branch subsampled states)
    pipe.cfg_parallel = False
    pipe._jit_cache = {}
    rel_e0s, rel_ress = pipe.record_teacache_stats("a car", **kw)
    assert np.isfinite(rel_e0s).all() and np.isfinite(rel_ress).all()
    coeffs = tc.fit_teacache_coefficients(rel_e0s, rel_ress, degree=2)
    assert np.isfinite(coeffs).all()


def test_batch1_cond_path_matches_batched_semantics():
    """Batch-1 gating goes through the structural lax.cond (the 720p
    sequential-CFG memory fix) — outputs/state must match what the where()
    formulation computes for that single row."""
    rng = np.random.default_rng(2)
    s, d = 5, 8
    tokens = jnp.asarray(rng.standard_normal((1, s, d)), jnp.float32)
    prev_mod = jnp.ones((1, 6, d), jnp.float32)
    prev_res = jnp.asarray(rng.standard_normal((1, s, d)), jnp.float32)
    state = tc.TeaCacheState(
        prev_mod=prev_mod, prev_residual=prev_res,
        accum=jnp.zeros((1,)), valid=jnp.ones((1,), jnp.bool_))

    # skip: e0 ~ prev_mod, huge threshold
    out, new = tc.gated_blocks(
        _blocks, tokens, prev_mod * 1.001, state, step_index=jnp.asarray(9),
        threshold=1e6, skip_start=0, coefficients=(1.0, 0.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(tokens + prev_res),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new.prev_residual),
                               np.asarray(prev_res), rtol=1e-6)
    assert float(new.accum[0]) > 0.0

    # compute: threshold 0 forces fresh pass + residual refresh + reset
    out2, new2 = tc.gated_blocks(
        _blocks, tokens, prev_mod * 3.0, state, step_index=jnp.asarray(9),
        threshold=1e-9, skip_start=0, coefficients=(1.0, 0.0))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(_blocks(tokens)),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new2.prev_residual),
                               np.asarray(_blocks(tokens) - tokens), rtol=1e-6)
    assert float(new2.accum[0]) == 0.0


def test_quantized_residual_storage():
    """int8 residual storage (TEA_RES_QUANT_ROWS long-sequence mode): the
    skip path reconstructs the cached residual to ~0.8% of its per-token
    range, and the compute path stores a fresh quantized cache."""
    rng = np.random.default_rng(3)
    s, d = 7, 16
    tokens = jnp.asarray(rng.standard_normal((1, s, d)), jnp.float32)
    prev_mod = jnp.ones((1, 6, d), jnp.float32)
    res = rng.standard_normal((1, s, d)).astype(np.float32)
    state = tc.init_state(1, s, d, jnp.float32, quantize_residual=True)
    assert isinstance(state.prev_residual, dict)
    assert state.prev_residual["q"].dtype == jnp.int8
    state = state._replace(prev_mod=prev_mod,
                           prev_residual=tc._store_residual(
                               jnp.asarray(res), True),
                           valid=jnp.ones((1,), jnp.bool_))

    out, new = tc.gated_blocks(
        _blocks, tokens, prev_mod * 1.001, state, step_index=jnp.asarray(9),
        threshold=1e6, skip_start=0, coefficients=(1.0, 0.0))
    err = np.abs(np.asarray(out) - (np.asarray(tokens) + res))
    tol = np.abs(res).max(axis=-1, keepdims=True) / 127.0
    assert (err <= tol + 1e-7).all()

    out2, new2 = tc.gated_blocks(
        _blocks, tokens, prev_mod * 3.0, state, step_index=jnp.asarray(9),
        threshold=1e-9, skip_start=0, coefficients=(1.0, 0.0))
    np.testing.assert_allclose(np.asarray(out2), np.asarray(_blocks(tokens)),
                               rtol=1e-6)
    fresh_res = np.asarray(_blocks(tokens) - tokens)
    got = np.asarray(new2.prev_residual["q"], np.float32) \
        * np.asarray(new2.prev_residual["scale"])
    assert np.abs(got - fresh_res).max() <= np.abs(fresh_res).max() / 100.0

    # auto threshold: long sequences quantize, short ones stay exact
    assert isinstance(
        tc.init_state(1, tc.TEA_RES_QUANT_ROWS + 1, 4).prev_residual, dict)
    assert not isinstance(tc.init_state(2, 16, 4).prev_residual, dict)
    assert tc.res_shape(state) == (1, s, d)


def test_estimate_denoise_gb_calibration():
    """auto_cfg_parallel's memory model must agree with every chip ground
    truth (analyze_14b_sp.py / COVERAGE.md): batched CFG allowed at the 14B
    GeoAdapter 480p shape, refused at 720p."""
    from versecrafter_tpu.core.config import WAN21_14B, versecrafter_14b
    from versecrafter_tpu.sampling.staged import (
        auto_cfg_parallel, estimate_denoise_gb)

    geo = versecrafter_14b()
    # measured to RUN on one v5e (threshold 16.0 — see staged.py docstring;
    # the 2026-08-20 canonical run OOM'd at 22.68/15.75 GB because the old
    # 19.0 threshold predated the chunk-aware estimator):
    assert estimate_denoise_gb(WAN21_14B, 4, 32760, 2) <= 16.0   # 16.69 s/step
    assert estimate_denoise_gb(geo, 4, 32760, 2) <= 16.0         # staged r5 e2e
    assert estimate_denoise_gb(geo, 4, 32760, 1) <= 16.0         # staged r4 e2e
    assert estimate_denoise_gb(geo, 4, 75600, 1) <= 16.0         # 39.7 s/step
    # measured to OOM (remote AOT: 22.68 G of 15.75 G hbm):
    assert estimate_denoise_gb(geo, 4, 75600, 2) > 16.0
    assert auto_cfg_parallel(geo, 4, 32760)       # 480p x 81f -> batched
    assert not auto_cfg_parallel(geo, 4, 75600)   # 720p x 81f -> sequential
