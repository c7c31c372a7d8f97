"""Resident model host.

Re-implements the behavior of /root/reference/model_server.py (rank-0 Flask +
broadcast-driven worker ranks under torchrun, heartbeat thread :677-715) the
TPU way: ONE process per host owning the mesh; requests arrive over HTTP and
enter a work queue consumed by a single generation thread (the compiled
sharded denoise step is the data plane — no NCCL control-plane broadcasts,
hence no heartbeat hack, SURVEY.md §5.8).

Endpoints (reference surface, model_server.py:619-674):
  GET  /health        -> {status, model_loaded}
  POST /generate      -> {task_id}
  GET  /status/<id>   -> task dict
"""

from __future__ import annotations

import argparse
import os
import queue
import threading
from typing import Any, Callable, Optional

import numpy as np

from versecrafter_tpu.serve.http import Router, make_server
from versecrafter_tpu.serve.tasks import COMPLETED, FAILED, RUNNING, TaskRegistry


def run_generate_request(pipe, params: dict, progress=None,
                         staged_factories=None) -> np.ndarray:
    """Execute one generation request against a pipeline: load the control
    maps by the reference's exact filename contract
    (versecrafter_inference.py:351-417 — 4 control mp4s + merged_mask, mask
    frame 0 zeroed, first control frame overwritten with the input image)
    and run the pipeline. Shared by the model server, the API server's
    in-process tier, and the inference CLI.

    staged_factories (sampling.staged.StageFactories): run with STAGED
    weight residency — `pipe` is a config-only shell and each component is
    built/freed per stage (the single-16GB-chip 14B serving mode,
    sampling/staged.py). Quantization is fixed by the factories there;
    per-request quantize params are rejected rather than silently ignored.

    Returns UINT8 frames [T, H, W, 3] in 0..255 (the pipeline quantizes on
    device — 4x less host transfer, and save_generated_video/mp4 encoding
    wants uint8 anyway). Consumers comparing against [0,1] float references
    must divide by 255 first."""
    h = int(params.get("height", 480))
    w = int(params.get("width", 832))
    n = int(params.get("num_frames", 81))
    controls, mask = load_request_inputs(params)

    # acceleration toggles, same surface the CLI exposes
    # (cli/inference.py:48-57); teacache/cfg-skip are per-request (restored
    # after), int8 quantization is sticky for the resident pipeline
    from versecrafter_tpu.models import wan_dit

    saved = (pipe.teacache_threshold, pipe.teacache_skip_start,
             pipe.teacache_coefficients, pipe.cfg_skip_ratio)
    saved_int8_attn = wan_dit.INT8_QK_SCORE
    # ALL param application happens inside the try: a bad param raising
    # mid-application (e.g. a quantize-mode conflict) must not leak a
    # half-applied toggle into later requests on the resident host
    try:
        if "int8_attention" in params:
            pipe.enable_int8_attention(bool(params["int8_attention"]))
        if "teacache_threshold" in params:
            # default to the pipeline's CURRENT coefficients (a host may
            # carry fitted ones — scripts/fit_teacache.py); requests may
            # override
            coeffs = params.get("teacache_coefficients",
                                pipe.teacache_coefficients)
            pipe.enable_teacache(float(params["teacache_threshold"]),
                                 int(params.get("teacache_skip_start", 5)),
                                 coefficients=coeffs)
        if "cfg_skip_ratio" in params:
            pipe.enable_cfg_skip(float(params["cfg_skip_ratio"]))
        qmode = _requested_quant_mode(params)
        if staged_factories is not None:
            if qmode is not None:
                raise ValueError(
                    "staged-residency host: quantization is fixed by the "
                    "stage factories; drop the quantize params")
            return _call_pipe_staged(pipe, params, controls, mask, h, w, n,
                                     progress, staged_factories)
        if qmode is not None:
            resident = getattr(pipe, "_quantized", None)
            if resident is None:
                pipe.quantize_weights(int8_compute=qmode[1], bits=qmode[0])
                pipe._quantized = qmode
            elif resident != qmode:
                # quantization is sticky (weights are rewritten in place) —
                # failing loudly beats a client believing it measured a
                # mode the resident host cannot switch to
                raise ValueError(
                    f"pipeline already quantized as {resident} "
                    f"(bits, int8_compute); cannot re-quantize as {qmode}")
        return _call_pipe(pipe, params, controls, mask, h, w, n, progress)
    finally:
        (pipe.teacache_threshold, pipe.teacache_skip_start,
         pipe.teacache_coefficients, pipe.cfg_skip_ratio) = saved
        wan_dit.INT8_QK_SCORE = saved_int8_attn


def load_request_inputs(params: dict):
    """(control_videos, mask_video) for a generate request: the reference's
    exact filename contract (versecrafter_inference.py:351-417 — 4 control
    mp4s + merged_mask, mask frame 0 zeroed, first control frame overwritten
    with the input image). Shared by run_generate_request and the staged-
    residency CLI path (which must NOT route through the pipeline-mutating
    toggle application above)."""
    from versecrafter_tpu.utils.video import load_image, load_video

    maps_dir = params["rendering_maps_path"]
    h = int(params.get("height", 480))
    w = int(params.get("width", 832))
    n = int(params.get("num_frames", 81))
    fps = int(params.get("fps", 16))
    control_names = ["background_RGB.mp4", "background_depth.mp4",
                     "3D_gaussian_RGB.mp4", "3D_gaussian_depth.mp4"]
    # A missing stream becomes zeros IN ITS SLOT (reference
    # versecrafter_inference.py:377-382 zero-fills too, but only after the
    # first stream loaded — a missing LEADING stream there drops the slot
    # and misaligns every later channel; deferring the fill until shapes
    # are known keeps slot alignment for any miss pattern, e.g. the demo
    # clips, which ship without background_RGB.mp4).
    controls = []
    for name in control_names:
        p = os.path.join(maps_dir, name)
        if os.path.exists(p):
            controls.append(load_video(p, num_frames=n, size=(h, w), fps=fps))
        else:
            print(f"warning: control video not found, zero-filled: {p}")
            controls.append(None)
    loaded = [c for c in controls if c is not None]
    if not loaded:
        raise FileNotFoundError(
            f"no control maps in {maps_dir!r} (need at least one of "
            f"{control_names}; run the render step first)")
    controls = [np.zeros_like(loaded[0]) if c is None else c
                for c in controls]
    mask_p = os.path.join(maps_dir, "merged_mask.mp4")
    if os.path.exists(mask_p):
        mask = load_video(mask_p, num_frames=n, size=(h, w), fps=fps)[:, :1]
        mask[:, :, 0] = 0.0  # frame 0 preserved (versecrafter_inference.py:394)
    else:
        mask = np.ones((1, 1, n, h, w), np.float32)
    if params.get("input_image_path"):
        img = load_image(params["input_image_path"], size=(h, w))
        controls[0][:, :, 0] = img[:, :, 0]
    return controls, mask


def _requested_quant_mode(params):
    """(bits, int8_compute) requested by the generate params, or None.
    quantize_bits alone implies weight quantization (a bare
    {'quantize_bits': 4} must not silently run bf16)."""
    if not (params.get("quantize_int8") or params.get("int8_compute")
            or "quantize_bits" in params):
        return None
    return (int(params.get("quantize_bits", 8)),
            bool(params.get("int8_compute")))


def _call_pipe_staged(pipe, params, controls, mask, h, w, n, progress,
                      factories):
    from versecrafter_tpu.sampling.staged import (
        auto_cfg_parallel, generate_staged)
    # per-request CFG batching: batched where the chip-calibrated memory
    # model says the batch-2 step fits (480p), sequential where it provably
    # overflows (720p). The request can pin it with cfg_parallel: true/false.
    vc, dc = pipe.vae_cfg, pipe.dit_cfg
    t_lat = (n - 1) // vc.temporal_compression_ratio + 1
    tokens = (t_lat
              * (h // vc.spatial_compression_ratio // dc.patch_size[1])
              * (w // vc.spatial_compression_ratio // dc.patch_size[2]))
    bits = factories.bits
    if "cfg_parallel" in params:
        pipe.cfg_parallel = bool(params["cfg_parallel"])
    else:
        pipe.cfg_parallel = auto_cfg_parallel(dc, bits, tokens)
    return generate_staged(
        pipe, factories, params.get("prompt", ""),
        negative_prompt=params.get("negative_prompt", ""),
        control_videos=controls, mask_video=mask,
        height=h, width=w, num_frames=n,
        num_inference_steps=int(params.get("num_inference_steps", 30)),
        guidance_scale=float(params.get("guidance_scale", 5.0)),
        shift=float(params.get("shift", 16.0)),
        seed=int(params.get("seed", 2025)),
        progress=progress, output_type="uint8")


def _call_pipe(pipe, params, controls, mask, h, w, n, progress):
    return pipe(
        params.get("prompt", ""),
        negative_prompt=params.get("negative_prompt", ""),
        control_videos=controls,
        mask_video=mask,
        height=h, width=w, num_frames=n,
        num_inference_steps=int(params.get("num_inference_steps", 30)),
        guidance_scale=float(params.get("guidance_scale", 5.0)),
        shift=float(params.get("shift", 16.0)),
        seed=int(params.get("seed", 2025)),
        progress=progress,
        # quantize to uint8 on device — the video is the biggest host
        # transfer of a generation and mp4 encoding wants uint8 anyway
        output_type="uint8",
    )


def save_generated_video(video: np.ndarray, params: dict,
                         default_dir: str = "outputs/serve") -> str:
    """Write generated_video_N.mp4 (reference rank-0 save,
    versecrafter_inference.py:440-465)."""
    from versecrafter_tpu.utils.video import save_video

    out_dir = params.get("save_path", default_dir)
    os.makedirs(out_dir, exist_ok=True)
    idx = len([p for p in os.listdir(out_dir)
               if p.startswith("generated_video_")])
    path = os.path.join(out_dir, f"generated_video_{idx}.mp4")
    save_video(video[0], path, fps=int(params.get("fps", 16)))
    return path


class ModelServer:
    def __init__(self, pipeline_factory: Callable[[], Any],
                 output_dir: str = "outputs/serve",
                 staged_factories=None):
        """pipeline_factory builds the (possibly sharded) VerseCrafterPipeline
        lazily on first use; generations are serialized through one queue —
        the TPU mesh runs one request at a time.

        staged_factories (sampling.staged.StageFactories): serve with
        staged weight residency — the resident pipeline is a config-only
        shell; T5/VAE/quantized-DiT build and free per request stage. The
        single-16GB-chip 14B serving mode (use
        sampling.staged.staged_pipeline_factory to build both)."""
        self.pipeline_factory = pipeline_factory
        self.staged_factories = staged_factories
        self.output_dir = output_dir
        self.tasks = TaskRegistry()
        self.queue: "queue.Queue" = queue.Queue()
        self._pipeline = None
        self._lock = threading.Lock()
        self._worker = threading.Thread(target=self._work_loop, daemon=True)
        self._worker.start()

    @property
    def model_loaded(self) -> bool:
        return self._pipeline is not None

    def _get_pipeline(self):
        with self._lock:
            if self._pipeline is None:
                self._pipeline = self.pipeline_factory()
            return self._pipeline

    def _work_loop(self):
        from versecrafter_tpu.utils.profiling import StepTimer

        while True:
            task_id, params = self.queue.get()
            try:
                self.tasks.update(task_id, status=RUNNING, message="loading model")
                pipe = self._get_pipeline()
                self.tasks.update(task_id, status=RUNNING, message="generating")
                timer = StepTimer()

                def progress(i, n):
                    timer.tick(i, n)
                    self.tasks.update(task_id, progress=int(100 * i / n),
                                      message=f"step {i}/{n}")

                video = self._generate(pipe, params, progress)
                self.last_step_stats = timer.summary()
                self.last_wall_profile = getattr(
                    pipe, "last_wall_profile", {})
                self.last_stage_profile = getattr(
                    pipe, "last_stage_profile", {})
                out_path = self._save(video, params)
                self.tasks.update(task_id, status=COMPLETED, progress=100,
                                  result={"video_path": out_path})
            except Exception as e:  # noqa: BLE001 — task boundary
                import traceback
                self.tasks.update(task_id, status=FAILED, error=str(e),
                                  message=traceback.format_exc()[-2000:])

    def _generate(self, pipe, params: dict, progress):
        return run_generate_request(pipe, params, progress,
                                    staged_factories=self.staged_factories)

    def _save(self, video: np.ndarray, params: dict) -> str:
        return save_generated_video(video, params, self.output_dir)

    def submit(self, params: dict) -> str:
        t = self.tasks.create("generate")
        self.queue.put((t.task_id, params))
        return t.task_id


def build_router(server: ModelServer) -> Router:
    r = Router()

    @r.route("GET", "/health")
    def health(req):
        return 200, {"status": "ok", "model_loaded": server.model_loaded}

    @r.route("POST", "/generate")
    def generate(req):
        return 200, {"task_id": server.submit(req.json())}

    @r.route("GET", "/status/<task_id>")
    def status(req):
        t = server.tasks.get(req.params["task_id"])
        return (200, t) if t else (404, {"error": "unknown task"})

    @r.route("POST", "/unload")
    def unload(req):
        import gc
        with server._lock:
            was = server._pipeline is not None
            server._pipeline = None
        gc.collect()
        return 200, {"unloaded": was}

    @r.route("GET", "/metrics")
    def metrics(req):
        return 200, {
            "model_loaded": server.model_loaded,
            "queue_depth": server.queue.qsize(),
            "tasks": len(server.tasks.all()),
            "last_generation_step_ms": getattr(server, "last_step_stats", {}),
            "last_generation_wall_profile_s": getattr(
                server, "last_wall_profile", {}),
            # staged-residency hosts: per-stage build/run wall split
            "last_generation_stage_profile_s": getattr(
                server, "last_stage_profile", {}),
        }

    return r


def resolve_mesh(mesh_spec=None, auto: bool = False,
                 num_heads: int = 40):
    """Build the inference mesh from a MeshSpec / ulysses-style flags.
    Returns None on a single device (plain single-chip path)."""
    import jax

    from versecrafter_tpu.core.mesh import auto_mesh_spec, make_mesh

    n = len(jax.devices())
    if auto and mesh_spec is None:
        mesh_spec = auto_mesh_spec(n, num_heads=num_heads)
    if mesh_spec is None or mesh_spec.size == 1:
        return None
    if mesh_spec.size > n:
        raise ValueError(
            f"mesh {mesh_spec.shape} needs {mesh_spec.size} devices, "
            f"have {n}")
    return make_mesh(mesh_spec, devices=jax.devices()[:mesh_spec.size])


def default_pipeline_factory(model_path: Optional[str] = None,
                             dtype_name: str = "bfloat16",
                             mesh_spec=None, auto_mesh: bool = False,
                             scale: str = "1.3b"):
    """Build the flagship pipeline: converted checkpoints when model_path is
    given, random-init otherwise (offline bring-up; scale '1.3b' for the
    single-chip flagship, 'tiny' for wiring smokes on slow backends).
    mesh_spec / auto_mesh shard it for multi-chip inference (the reference's
    --ulysses_degree/--ring_degree serving path, model_server.py:149-191)."""
    def factory():
        import dataclasses
        import jax
        import jax.numpy as jnp

        from versecrafter_tpu.core.config import (
            T5Config, VAEConfig, WAN21_1_3B, WanDiTConfig)
        from versecrafter_tpu.models.t5 import init_t5
        from versecrafter_tpu.models.vae import init_vae
        from versecrafter_tpu.models.wan_dit import init_wan_dit
        from versecrafter_tpu.sampling.pipeline import VerseCrafterPipeline

        dtype = getattr(jnp, dtype_name)
        if model_path:
            from versecrafter_tpu.core.convert import load_versecrafter
            pipe = load_versecrafter(model_path, dtype=dtype)
            pipe.set_mesh(resolve_mesh(mesh_spec, auto_mesh,
                                       pipe.dit_cfg.num_heads))
            return pipe
        t5_cfg = T5Config(num_layers=2, dim=512, dim_attn=512, dim_ffn=1024,
                          num_heads=8, vocab=1024)
        # offline bring-up: text_dim must match the stub T5's output width
        if scale == "tiny":
            cfg = WanDiTConfig(dim=128, ffn_dim=256, num_heads=8,
                               num_layers=4, geoada_layers=(),
                               geoada_in_dim=128, text_dim=t5_cfg.dim)
        else:
            cfg = dataclasses.replace(WAN21_1_3B, geoada_layers=(),
                                      geoada_in_dim=128, text_dim=t5_cfg.dim)
        # jit every init: eager construction dispatches hundreds of tiny
        # RNG programs, each a separate ~0.4-1 s remote compile over the
        # device tunnel (measured: several MINUTES of smoke-model startup;
        # same reasoning as __graft_entry__.entry)
        return VerseCrafterPipeline(
            dit_params=jax.jit(lambda k: init_wan_dit(k, cfg, dtype))(jax.random.key(0)),
            dit_cfg=cfg,
            vae_params=jax.jit(lambda k: init_vae(k, VAEConfig(), jnp.float32))(
                jax.random.key(1)),
            vae_cfg=VAEConfig(),
            t5_params=jax.jit(lambda k: init_t5(k, t5_cfg, dtype))(
                jax.random.key(2)),
            t5_cfg=t5_cfg,
            mesh=resolve_mesh(mesh_spec, auto_mesh, cfg.num_heads),
        )
    return factory


def main(argv=None):
    p = argparse.ArgumentParser(description="VerseCrafter TPU model server")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8191)
    p.add_argument("--model_path", default=None)
    p.add_argument("--output_dir", default="outputs/serve")
    p.add_argument("--ulysses_degree", type=int, default=1)
    p.add_argument("--ring_degree", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--auto_mesh", action="store_true",
                   help="factorize all visible devices into (sp, tp) "
                        "automatically (reference model_server.py:149-191)")
    p.add_argument("--staged", action="store_true",
                   help="staged weight residency (single-16GB-chip 14B "
                        "serving): T5/VAE/quantized-DiT build per request "
                        "stage instead of staying resident")
    p.add_argument("--staged_scale", default="14b",
                   choices=["14b", "1.3b", "tiny"],
                   help="with --staged and no --model_path: fresh-init size")
    p.add_argument("--quantize_bits", type=int, default=4, choices=(8, 4),
                   help="with --staged: DiT weight width (4 = W4A8)")
    args = p.parse_args(argv)

    from versecrafter_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    from versecrafter_tpu.core.mesh import spec_from_degrees
    spec = spec_from_degrees(args.ulysses_degree, args.ring_degree, args.tp)
    if args.staged:
        from versecrafter_tpu.sampling.staged import staged_pipeline_factory
        factory, staged_factories = staged_pipeline_factory(
            args.model_path, scale=args.staged_scale,
            bits=args.quantize_bits, int8_compute=True)
        server = ModelServer(factory, output_dir=args.output_dir,
                             staged_factories=staged_factories)
    else:
        server = ModelServer(
            default_pipeline_factory(args.model_path,
                                     mesh_spec=spec if spec.size > 1 else None,
                                     auto_mesh=args.auto_mesh),
            output_dir=args.output_dir)
    httpd = make_server(build_router(server), args.host, args.port)
    print(f"model server on {args.host}:{args.port}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
