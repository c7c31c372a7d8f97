"""EWA projection of 3D Gaussians to 2D density maps.

Re-implements project_gaussian_to_2d_gpu / compute_probability_density_map /
project_3d_gaussians_to_2d (/root/reference/inference/
rendering_4D_control_maps.py:573-883): perspective Jacobian linearization of
each world Gaussian into a 2D image Gaussian, per-pixel density, per-object
max-normalization, threshold-gated alpha, far-to-near over-compositing.
Dense [K, H, W] math — pure VPU work under jit.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

# tab20 colormap values (matplotlib), so the perception stack can run without
# matplotlib on a serving host; indexing matches get_object_color
# (rendering_4D_control_maps.py:885-906)
TAB20 = np.array([
    (0.1216, 0.4667, 0.7059), (0.6824, 0.7804, 0.9098),
    (1.0000, 0.4980, 0.0549), (1.0000, 0.7333, 0.4706),
    (0.1725, 0.6275, 0.1725), (0.5961, 0.8745, 0.5412),
    (0.8392, 0.1529, 0.1569), (1.0000, 0.5961, 0.5882),
    (0.5804, 0.4039, 0.7412), (0.7725, 0.6902, 0.8353),
    (0.5490, 0.3373, 0.2941), (0.7686, 0.6118, 0.5804),
    (0.8902, 0.4667, 0.7608), (0.9686, 0.7137, 0.8235),
    (0.4980, 0.4980, 0.4980), (0.7804, 0.7804, 0.7804),
    (0.7373, 0.7412, 0.1333), (0.8588, 0.8588, 0.5529),
    (0.0902, 0.7451, 0.8118), (0.6196, 0.8549, 0.8980),
], np.float32)


def object_color(color_idx: int) -> np.ndarray:
    return TAB20[color_idx % 20]


@functools.partial(jax.jit, static_argnames=("height", "width"))
def gaussian_density_maps(means: jnp.ndarray, covs: jnp.ndarray,
                          present: jnp.ndarray, K: jnp.ndarray,
                          w2c: jnp.ndarray, height: int, width: int):
    """[K,3] world means + [K,3,3] covs -> per-object density maps.

    Returns (density [K,H,W] max-normalized per object, depth_z [K] camera
    depth, valid [K]). Gaussians behind/near the camera (z<=0.5) or with
    huge projected covariance (det>1e11) are dropped, matching the reference
    guards at rendering_4D_control_maps.py:838-859."""
    R = w2c[:3, :3]
    t = w2c[:3, 3]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    y, x = jnp.mgrid[0:height, 0:width]
    pix = jnp.stack([x, y], -1).astype(jnp.float32)  # [H,W,2] (u,v)

    def one(mean, cov, ok):
        # precision=highest: TPU matmuls default to bf16 multiplicands,
        # which shifts projected gaussian centers by whole pixels (see
        # rasterize.project_points)
        with jax.default_matmul_precision("highest"):
            mc = R @ mean + t
            cc = R @ cov @ R.T
        xx, yy, zz = mc[0], mc[1], mc[2]
        J = jnp.array([[fx, 0.0, 0.0], [0.0, fy, 0.0]]) / jnp.maximum(zz, 1e-6)
        J = J.at[0, 2].set(-fx * xx / jnp.maximum(zz * zz, 1e-9))
        J = J.at[1, 2].set(-fy * yy / jnp.maximum(zz * zz, 1e-9))
        mean2d = jnp.array([fx * xx / zz + cx, fy * yy / zz + cy])
        with jax.default_matmul_precision("highest"):
            cov2d = J @ cc @ J.T + jnp.eye(2) * 1e-6
        det = jnp.linalg.det(cov2d)
        valid = ok & (zz > 0.5) & (det <= 1e11)
        inv = jnp.linalg.inv(cov2d)
        d = pix - mean2d
        mahal = (d[..., 0] ** 2 * inv[0, 0] + 2 * d[..., 0] * d[..., 1] * inv[0, 1]
                 + d[..., 1] ** 2 * inv[1, 1])
        coeff = 1.0 / (2 * jnp.pi * jnp.sqrt(jnp.maximum(det, 1e-12)))
        dens = coeff * jnp.exp(-0.5 * mahal)
        dens = jnp.where(valid, dens, 0.0)
        dens = dens / jnp.maximum(dens.max(), 1e-8)
        return dens, zz, valid

    return jax.vmap(one)(means, covs, present)


@functools.partial(jax.jit, static_argnames=("height", "width"))
def composite_gaussian_projections(means, covs, colors, present, K, w2c,
                                   height: int, width: int,
                                   threshold: float = 0.003):
    """Full per-frame Gaussian projection: densities -> thresholded alphas
    -> far-to-near over-compositing (project_3d_gaussians_to_2d,
    rendering_4D_control_maps.py:637-693).

    colors [K,3] float 0..1. Returns (rgb [H,W,3] 0..1, alpha [H,W])."""
    dens, depth_z, valid = gaussian_density_maps(
        means, covs, present, K, w2c, height, width)
    alphas = jnp.clip(
        jnp.where(dens > threshold, (dens - threshold) / (1.0 - threshold + 1e-8), 0.0),
        0.0, 1.0)
    alphas = jnp.where(valid[:, None, None], alphas, 0.0)

    # composite far -> near: sort by descending depth
    order = jnp.argsort(-jnp.where(valid, depth_z, -jnp.inf))
    alphas = alphas[order]
    cols = colors[order]

    def step(carry, inp):
        rgb, acc_a = carry
        a, c = inp
        rgb = c[None, None] * a[..., None] + rgb * (1 - a[..., None])
        acc_a = a + acc_a * (1 - a)
        return (rgb, acc_a), None

    init = (jnp.zeros((height, width, 3)), jnp.zeros((height, width)))
    (rgb, alpha), _ = jax.lax.scan(step, init, (alphas, cols))
    return jnp.clip(rgb, 0, 1), jnp.clip(alpha, 0, 1)
