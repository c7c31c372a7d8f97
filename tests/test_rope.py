"""RoPE numerics vs. an independent complex-arithmetic oracle in numpy.

The oracle reproduces the reference math (wan_transformer3d.py:143-172):
x viewed as complex pairs, multiplied by e^{i*pos*freq} with 3D-factorized
frequencies expanded over the (f, h, w) grid.
"""

import numpy as np
import jax.numpy as jnp

from versecrafter_tpu.kernels.rope import (
    apply_rope,
    grid_cos_sin,
    rope_3d_angles,
    rope_axis_angles,
    rope_dim_split,
)


def oracle_rope(x, f, h, w, head_dim, theta=10000.0):
    """Complex-number oracle: [B,S,N,D] -> rotated, fp64 numpy."""
    dt, dh, dw = rope_dim_split(head_dim)

    def axis_freqs(dim):
        return 1.0 / np.power(theta, np.arange(0, dim, 2, dtype=np.float64) / dim)

    ft = np.outer(np.arange(f), axis_freqs(dt))
    fh = np.outer(np.arange(h), axis_freqs(dh))
    fw = np.outer(np.arange(w), axis_freqs(dw))
    grid = np.concatenate(
        [
            np.broadcast_to(ft[:, None, None, :], (f, h, w, ft.shape[1])),
            np.broadcast_to(fh[None, :, None, :], (f, h, w, fh.shape[1])),
            np.broadcast_to(fw[None, None, :, :], (f, h, w, fw.shape[1])),
        ],
        axis=-1,
    ).reshape(f * h * w, -1)
    rot = np.exp(1j * grid)  # [S, D/2]

    b, s, n, d = x.shape
    xc = x.astype(np.float64).reshape(b, s, n, d // 2, 2)
    xc = xc[..., 0] + 1j * xc[..., 1]
    out = xc * rot[None, :, None, :]
    res = np.stack([out.real, out.imag], axis=-1).reshape(b, s, n, d)
    return res


def test_dim_split():
    assert rope_dim_split(128) == (44, 42, 42)
    assert sum(rope_dim_split(128)) == 128


def test_rope_matches_complex_oracle():
    rng = np.random.default_rng(0)
    f, h, w, n, d = 3, 4, 5, 2, 24
    x = rng.standard_normal((2, f * h * w, n, d)).astype(np.float32)

    angles = tuple(jnp.asarray(a) for a in rope_3d_angles(d, max_pos=16))
    cos, sin = grid_cos_sin(angles, f, h, w)
    got = np.asarray(apply_rope(jnp.asarray(x), cos, sin))
    want = oracle_rope(x, f, h, w, d)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_riflex_overrides_intrinsic_freq():
    d = 44
    k, L = 6, 21
    base = rope_axis_angles(8, d)
    rif = rope_axis_angles(8, d, riflex_k=k, riflex_L_test=L)
    # only column k-1 changes; its angle at pos=1 equals 0.9*2*pi/L
    np.testing.assert_allclose(rif[1, k - 1], 0.9 * 2 * np.pi / L, rtol=1e-6)
    mask = np.ones(d // 2, bool)
    mask[k - 1] = False
    np.testing.assert_allclose(rif[:, mask], base[:, mask])

    scaled = rope_axis_angles(8, d, riflex_k=k, riflex_L_test=L, riflex_L_test_scale=4.886)
    np.testing.assert_allclose(scaled[1, k - 1], 0.9 * 2 * np.pi / L / 4.886, rtol=1e-6)


def test_rope_preserves_norm():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 12, 2, 24)).astype(np.float32)
    angles = tuple(jnp.asarray(a) for a in rope_3d_angles(24, max_pos=16))
    cos, sin = grid_cos_sin(angles, 3, 2, 2)
    y = np.asarray(apply_rope(jnp.asarray(x), cos, sin))
    # rotation preserves the norm of every complex pair
    xp = x.reshape(1, 12, 2, 12, 2)
    yp = y.reshape(1, 12, 2, 12, 2)
    np.testing.assert_allclose(
        np.linalg.norm(xp, axis=-1), np.linalg.norm(yp, axis=-1), rtol=1e-5, atol=1e-5
    )
