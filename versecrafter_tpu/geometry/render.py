"""4D control-map rendering pipeline.

Re-implements /root/reference/inference/rendering_4D_control_maps.py:main
(:1171-1379): background point cloud + camera trajectory + per-frame 3D
Gaussian ellipsoids -> the 6 control videos the generation pipeline consumes
by exact filename (background_RGB.mp4, background_depth.mp4,
3D_gaussian_RGB.mp4, 3D_gaussian_depth.mp4, merged_mask.mp4, plus the
background_and_3D_gaussian.mp4 preview).

TPU-native: both rasterizers are jitted XLA programs vmapped over frame
batches; the only host work is file IO and mp4 encoding.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from versecrafter_tpu.geometry.coords import blender_c2w_to_opencv_w2c
from versecrafter_tpu.geometry.pointcloud import load_background_from_files
from versecrafter_tpu.geometry.rasterize import (
    composite_by_depth, depth_to_grayscale, merge_masks,
    raster_ellipsoids, splat_points)
from versecrafter_tpu.geometry.splat import (
    composite_gaussian_projections, object_color)
from versecrafter_tpu.utils.video import save_video


def load_camera_trajectory(trajectory_npz: str) -> np.ndarray:
    """Blender c2w 'extrinsics' [T,4,4] -> OpenCV w2c [T,4,4]."""
    data = np.load(trajectory_npz)
    return blender_c2w_to_opencv_w2c(data["extrinsics"].astype(np.float32))


def load_gaussian_trajectory(json_path: str):
    """custom_3D_gaussian_trajectory.json -> stacked per-frame params.

    Returns (means [T,K,3], covs [T,K,3,3], present [T,K], colors [K,3],
    obj_ids [K])."""
    with open(json_path) as f:
        data = json.load(f)
    color_idx = {str(k): v for k, v in
                 data["metadata"]["obj_id_to_color_idx"].items()}
    obj_ids = sorted(color_idx.keys(), key=lambda s: int(s) if s.isdigit() else s)
    slot = {oid: i for i, oid in enumerate(obj_ids)}
    T = data["metadata"]["num_frames"]
    K = max(len(obj_ids), 1)

    means = np.zeros((T, K, 3), np.float32)
    covs = np.tile(np.eye(3, dtype=np.float32) * 1e-6, (T, K, 1, 1))
    present = np.zeros((T, K), bool)
    for fr in data["frames"]:
        t = fr["frame_index"]
        if t >= T:
            continue
        for obj in fr["objects"]:
            oid = str(obj["object_id"])
            if oid not in slot or obj["gaussian_3d"]["mean"] is None:
                continue
            k = slot[oid]
            means[t, k] = obj["gaussian_3d"]["mean"]
            covs[t, k] = obj["gaussian_3d"]["covariance"]
            present[t, k] = True

    colors = np.stack([object_color(color_idx[oid]) for oid in obj_ids]) \
        if obj_ids else np.zeros((1, 3), np.float32)
    return means, covs, present, colors, obj_ids


@functools.lru_cache(maxsize=8)
def _render_fns(H, W, radius_px, footprint, ellipsoid_scale,
                gaussian_threshold):
    """Jitted per-batch render programs, cached on the static geometry so
    resident processes (API server render requests) re-trace only when the
    clip geometry actually changes. Array inputs are ARGUMENTS (not
    closure captures) so new clips reuse the same executables."""
    splat_batch = jax.jit(lambda pts, cols, K, w2c_b: jax.lax.map(
        lambda w2c: splat_points(pts, cols, K, w2c, H, W,
                                 radius_px=radius_px, footprint=footprint),
        w2c_b))
    ell_batch = jax.jit(jax.vmap(
        lambda m, c, oc, p, K, w2c: raster_ellipsoids(
            m, c, oc, p, K, w2c, H, W, scale_factor=ellipsoid_scale),
        in_axes=(0, 0, None, 0, None, 0)))
    proj_batch = jax.jit(jax.vmap(
        lambda m, c, oc, p, K, w2c: composite_gaussian_projections(
            m, c, oc, p, K, w2c, H, W, threshold=gaussian_threshold),
        in_axes=(0, 0, None, 0, None, 0)))
    return splat_batch, ell_batch, proj_batch


@functools.partial(jax.jit, static_argnums=3)
def _positive_quantile_input(bg_d, fg_d, fg_mask, n):
    """Flatten a batch's depth streams (bg, fg, and the composited depth —
    derived here from depths+mask via the shared composite_take predicate,
    so the batch's rgb streams need not stay alive for it)
    with nonpositive values masked to NaN so the global range can be taken
    with one on-device nanquantile. `n` trims tail-batch padding."""
    from versecrafter_tpu.geometry.rasterize import composite_take
    bg_d, fg_d, fg_mask = bg_d[:n], fg_d[:n], fg_mask[:n]
    take = composite_take(bg_d, fg_d, fg_mask)
    comp_d = jnp.where(take, fg_d, bg_d)
    flat = jnp.concatenate([bg_d.ravel(), fg_d.ravel(), comp_d.ravel()])
    return jnp.where(flat > 0, flat, jnp.nan)


_nanquantile_jit = jax.jit(
    lambda x: jnp.nanquantile(x, jnp.asarray([0.001, 0.99])))


def _device_depth_range(parts):
    """0.1%/99% percentiles of positive depths, computed on device (exact
    over all values — see the subsampling note in render_control_maps).
    Matches global_depth_range's (0, 1) fallback when nothing is positive."""
    flat = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    q = np.asarray(_nanquantile_jit(flat))
    if not np.all(np.isfinite(q)):
        return 0.0, 1.0
    return float(q[0]), float(q[1])


def _u8(x):
    return jnp.clip(x, 0, 255).astype(jnp.uint8)


@jax.jit
def _finalize_norange(bg_rgb, bg_depth, bg_mask, fg_rgb, fg_depth, fg_mask,
                      g_rgb, g_alpha):
    """The four output streams that do NOT need the global depth range —
    finalized and downloadable per batch, so no f32 stream has to stay
    resident across the whole video. Single-channel streams leave the
    device as [T, H, W] uint8 and are repeated to 3 channels on the HOST:
    the axon tunnel downloads at ~19 MB/s (measured) while uploads run
    ~650 MB/s, so shipping the repeat would triple the dominant cost of
    the whole render stage."""
    merged = merge_masks(bg_depth, fg_depth, bg_mask, fg_mask)
    gauss_rgb = g_rgb * g_alpha[..., None] * 255.0
    # background + gaussian preview (blend, then depth-composite vs bg)
    blend = (g_rgb * 255.0 * g_alpha[..., None]
             + bg_rgb * (1 - g_alpha[..., None]))
    gvis = g_alpha > 0.001
    prev_rgb, _ = composite_by_depth(bg_rgb, bg_depth, blend, fg_depth,
                                     gvis)
    return {
        "background_RGB": _u8(bg_rgb),
        "3D_gaussian_RGB": _u8(gauss_rgb),
        "merged_mask": (merged * 255).astype(jnp.uint8),
        "background_and_3D_gaussian": _u8(prev_rgb),
    }


@jax.jit
def _gray_u8(depth, dmin, dmax):
    # depth_to_grayscale with a TRACED range (dmin/dmax as args, not baked
    # constants -> no recompile per clip)
    return _u8(depth_to_grayscale(depth, dmin, dmax))


def render_control_maps(
    bg_points: np.ndarray,
    bg_colors: np.ndarray,
    K: np.ndarray,
    w2cs: np.ndarray,
    means: np.ndarray,
    covs: np.ndarray,
    present: np.ndarray,
    obj_colors: np.ndarray,
    image_size: Tuple[int, int],
    point_size: float = 0.005,
    ellipsoid_scale: float = 2.5,
    gaussian_threshold: float = 0.003,
    frame_batch: int = 27,
) -> Dict[str, np.ndarray]:
    """Render all control maps. Returns uint8 video arrays [T,H,W,3] keyed by
    output name (without .mp4)."""
    H, W = image_size
    T = len(w2cs)
    radius_px = point_size * min(H, W) / 2.0  # pytorch3d NDC radius -> pixels
    footprint = max(1, int(np.ceil(radius_px)))

    Kj = jnp.asarray(K)
    pts = jnp.asarray(bg_points)
    cols = jnp.asarray(bg_colors, jnp.float32)
    ocols = jnp.asarray(obj_colors)

    # Everything stays DEVICE-RESIDENT until the final uint8 frames: the
    # first version of this function round-tripped every f32 intermediate
    # through the host (~10 GB at 720p x 81f) and the composite math ran as
    # dozens of eager dispatches — through the axon tunnel that was ~750 s
    # of wall for ~5 s of device work. Now only the 6 uint8 output streams
    # ever leave the device (even the depth-percentile range is computed
    # on-device). The splat stays sequential per frame (sort+unique-scatter
    # vmaps poorly) but runs under lax.map so a whole frame batch is ONE
    # dispatch instead of frame_batch round trips. The jitted programs are
    # CACHED on the static geometry (resident serving processes render per
    # request — fresh jit objects would re-trace every time).
    #
    # Memory: ONE render pass; the four streams that don't need the global
    # depth range are finalized to uint8 and downloaded per batch, and only
    # the two f32 DEPTH streams (~0.6 GB at 720p x 81f) stay resident until
    # the on-device percentile fixes dmin/dmax, after which a tiny second
    # loop grayscales them. History: the original full-concat version
    # peaked ~14 GB (concat copies + whole-video finalize transients) and
    # OOM'd; a re-render-per-pass variant fit easily but duplicated ~100 s
    # of device compute at 720p (raycast dominates, not the splat); storing
    # ALL eight streams (~4.2 GB) ALSO hit RESOURCE_EXHAUSTED on the chip —
    # the axon allocator's per-program working-set budget is much tighter
    # than nominal HBM; and even this split OOM'd while the render/finalize/
    # quantile programs were QUEUED together (async dispatch keeps every
    # queued program's buffers alive at once). Hence the strict per-batch
    # serialization below: download the finalized streams before the
    # quantile flatten dispatches, free everything but the depth planes
    # between stages.
    splat_batch, ell_batch, proj_batch = _render_fns(
        H, W, radius_px, footprint, ellipsoid_scale, gaussian_threshold)

    def batches():
        for s in range(0, T, frame_batch):
            e = min(s + frame_batch, T)
            pad = frame_batch - (e - s)  # pad tail: every batch compiles once

            def pb(a):
                a = np.asarray(a[s:e])
                if pad:
                    a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])
                return jnp.asarray(a)
            yield e - s, pb

    def render_batch(pb):
        w_b = pb(w2cs)
        bg = splat_batch(pts, cols, Kj, w_b)          # rgb, depth, mask
        m_b, c_b, p_b = pb(means), pb(covs), pb(present)
        fg = ell_batch(m_b, c_b, ocols, p_b, Kj, w_b)  # rgb, depth, mask
        g = proj_batch(m_b, c_b, ocols, p_b, Kj, w_b)  # rgb, alpha
        return bg, fg, g

    def pull(v, n):
        a = np.asarray(v[:n])
        if a.ndim == 3:  # grayscale stream: host-side channel repeat
            a = np.repeat(a[..., None], 3, -1)
        return a

    # render once: range-free streams finalize + download per batch; the
    # depth streams and the percentile inputs stay on device (the
    # percentile is exact over ALL positive values — the reference
    # subsamples 1M with a host rng purely to bound host memory,
    # rendering_4D_control_maps.py:541-571; exact quantiles are within its
    # sampling noise and golden-parity floors don't move)
    #
    # DOWNLOAD OVERLAP (round 4): device programs stay STRICTLY serialized
    # — block_until_ready retires render+finalize before the quantile
    # flatten dispatches (the async-queue coexistence that RESOURCE_
    # EXHAUSTED the chip involved multiple HEAVY programs; retirement is
    # what matters, not download). But the finalized uint8 streams are
    # tiny (~0.3 GB/batch at 720p) next to the f32 working sets, so their
    # ~19 MB/s tunnel download moves to a worker thread and overlaps the
    # NEXT batch's device work instead of idling the chip.
    import queue as _queuelib
    import threading
    import time as _time

    prof = {"device_s": 0.0, "download_s": 0.0, "frames": T}
    _t0 = _time.perf_counter()
    outs = {k: [] for k in ("background_RGB", "background_depth",
                            "3D_gaussian_RGB", "3D_gaussian_depth",
                            "merged_mask", "background_and_3D_gaussian")}

    dl_q: "_queuelib.Queue" = _queuelib.Queue(maxsize=2)
    dl_err = []

    def _downloader():
        while True:
            item = dl_q.get()
            if item is None:
                return
            t0 = _time.perf_counter()
            try:
                for key, v, n in item:
                    outs[key].append(pull(v, n))
            except Exception as e:  # noqa: BLE001 — surfaced after join
                dl_err.append(e)
            finally:
                prof["download_s"] += _time.perf_counter() - t0
                dl_q.task_done()

    worker = threading.Thread(target=_downloader, daemon=True)
    worker.start()

    depths = []
    depth_parts = []
    try:
        for n, pb in batches():
            t0 = _time.perf_counter()
            bg, fg, g = render_batch(pb)
            out = _finalize_norange(bg[0], bg[1], bg[2], fg[0], fg[1],
                                    fg[2], g[0], g[1])
            # retire render+finalize BEFORE the next dispatch (allocator
            # counts queued programs' working sets) — but do NOT download
            # here; the worker overlaps that with the next batch
            jax.block_until_ready(list(out.values()))
            bg_d, fg_d, fg_mask = bg[1], fg[1], fg[2]
            del bg, fg, g
            part = _positive_quantile_input(bg_d, fg_d, fg_mask, n)
            part.block_until_ready()
            prof["device_s"] += _time.perf_counter() - t0
            del fg_mask
            dl_q.put([(key, v, n) for key, v in out.items()])
            del out
            depth_parts.append(part)
            depths.append((n, bg_d, fg_d))
        t0 = _time.perf_counter()
        dmin, dmax = _device_depth_range(depth_parts)
        del depth_parts
        prof["device_s"] += _time.perf_counter() - t0

        # second tiny loop: grayscale the kept depth streams with the
        # global range (~0.2 GB per batch at 720p); downloads overlap the
        # next batch's grayscale the same way. The queue put sits OUTSIDE
        # the timed span — a full queue blocks on downloads, which must
        # count as download backpressure, not device time
        for i, (n, bg_d, fg_d) in enumerate(depths):
            t0 = _time.perf_counter()
            gb = _gray_u8(bg_d, jnp.float32(dmin), jnp.float32(dmax))
            gf = _gray_u8(fg_d, jnp.float32(dmin), jnp.float32(dmax))
            jax.block_until_ready((gb, gf))
            prof["device_s"] += _time.perf_counter() - t0
            dl_q.put([("background_depth", gb, n),
                      ("3D_gaussian_depth", gf, n)])
            depths[i] = None
    finally:
        dl_q.put(None)
        worker.join()
    if dl_err:
        raise dl_err[0]
    prof["wall_s"] = round(_time.perf_counter() - _t0, 2)
    prof["device_s"] = round(prof["device_s"], 2)
    prof["download_s"] = round(prof["download_s"], 2)
    prof["device_fps"] = round(T / max(prof["device_s"], 1e-9), 2)
    global last_render_profile
    last_render_profile = prof
    return {k: (v[0] if len(v) == 1 else np.concatenate(v))
            for k, v in outs.items()}


# wall/device split of the most recent render_control_maps call — the
# "control-map render fps" metric BASELINE.json names. device_s includes
# dispatch+execute time the host spent blocked on device programs (they
# are strictly serialized, see above); download_s is worker-thread time
# and OVERLAPS device_s, so wall_s < device_s + download_s by design.
last_render_profile: Dict[str, float] = {}


def render_from_files(
    png_path: str,
    npz_path: str,
    mask_dir: Optional[str],
    trajectory_npz: str,
    ellipsoid_json: str,
    output_dir: str,
    point_size: float = 0.005,
    fps: int = 10,
    frame_batch: int = 27,
    progress=None,
) -> Dict[str, str]:
    """End-to-end file contract of rendering_4D_control_maps.py main()."""
    bg_points, bg_colors, K, H, W = load_background_from_files(
        png_path, npz_path, mask_dir)
    w2cs = load_camera_trajectory(trajectory_npz)
    means, covs, present, obj_colors, _ = load_gaussian_trajectory(ellipsoid_json)
    T = min(len(w2cs), len(means))

    videos = render_control_maps(
        bg_points, bg_colors, K, w2cs[:T], means[:T], covs[:T], present[:T],
        obj_colors, (H, W), point_size=point_size, frame_batch=frame_batch)

    if last_render_profile:
        print(json.dumps({"render_profile": last_render_profile}),
              flush=True)

    os.makedirs(output_dir, exist_ok=True)
    paths = {}
    for name, vid in videos.items():
        p = os.path.join(output_dir, f"{name}.mp4")
        save_video(vid.astype(np.float32) / 255.0, p, fps=fps)
        paths[name] = p
    return paths
