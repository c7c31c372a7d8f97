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
