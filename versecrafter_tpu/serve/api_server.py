"""API orchestrator.

Re-implements the endpoint surface of /root/reference/api_server.py
(endpoints listed at :25-32; upload/download incl. base64-GET and chunked
variants for proxy traversal :1738-1943; GET mirrors of all APIs
:1950-2170; path-traversal guard get_safe_filepath :1701-1736; 3-way
generation dispatch :1442-1480) on the stdlib HTTP stack.

TPU-native differences (SURVEY.md §5.8): no CUDA_VISIBLE_DEVICES process
partitioning — preprocessing and rendering share the host/mesh with the
model; generation dispatches to a resident model server over HTTP, runs
in-process, or — tier 3, `--subprocess_fallback`, mirroring the reference's
torchrun-subprocess fallback when the resident model wedges
(api_server.py:1333-1480) — re-runs the request through a fresh
`cli.inference` subprocess. A fresh process is the TPU-native degraded
path: it re-acquires the device cleanly (no rank spawning exists to fall
back to; a wedged resident pipeline's buffers die with nothing because the
subprocess only starts after the in-process attempt raised).

Workflow endpoints:
  POST/GET /api/preprocess[_get]  image -> depth + masks + gaussians
  POST/GET /api/render[_get]      trajectories -> control-map videos
  POST/GET /api/generate[_get]    control maps -> video
  POST     /api/workflow          render then generate
  GET      /api/status/<task_id>, /api/tasks
  POST     /api/upload, /api/upload_chunk, /api/upload_complete
  GET      /api/upload_base64_get (payload in query)
  GET      /api/download/<name>, /api/download_base64/<name>,
           /api/download_chunk/<name> (?offset=&size=)
  GET      /api/health, /api/model_status, /system_stats
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import threading
import traceback
from pathlib import Path
from typing import Optional

import numpy as np

from versecrafter_tpu.serve.http import Router, make_server
from versecrafter_tpu.serve.tasks import (
    COMPLETED, FAILED, RUNNING, ChunkStore, TaskRegistry)


class ApiServer:
    def __init__(self, workdir: str = "outputs/api",
                 model_server_url: Optional[str] = None,
                 pipeline_factory=None,
                 model_server_stall_timeout: float = 1800.0,
                 unload_after_generate: bool = False,
                 subprocess_fallback: bool = False,
                 subprocess_model_args: Optional[list] = None):
        # unload_after_generate mirrors the reference's single-GPU memory
        # management: free the model after each generation so render/VAE
        # stages get the HBM back (reference api_server.py:474-481,
        # 1311-1318); the next generate reloads on demand.
        self.unload_after_generate = unload_after_generate
        self.workdir = os.path.abspath(workdir)
        os.makedirs(self.workdir, exist_ok=True)
        self.tasks = TaskRegistry()
        self.chunks = ChunkStore()
        self.model_server_url = model_server_url
        self.model_server_stall_timeout = model_server_stall_timeout
        self.subprocess_fallback = subprocess_fallback
        # model-config argv (e.g. ["--staged", "--smoke_scale", "14b"])
        # appended to every fallback invocation — the subprocess must be
        # told which model to build, exactly like the reference's fallback
        # re-reads its launch config (api_server.py:1333-1369)
        self.subprocess_model_args = list(subprocess_model_args or ())
        self._pipeline = None
        self._pipeline_factory = pipeline_factory
        self._loading_lock = threading.Lock()
        self._model_loading = False
        self._model_load_error: Optional[str] = None

    # -- model lifecycle (reference api_server.py:492-751, 793-866:
    #    background load so the first /api/generate doesn't eat the full
    #    load+compile latency) -----------------------------------------------
    def _load_pipeline_locked(self):
        from versecrafter_tpu.serve.model_server import default_pipeline_factory
        factory = self._pipeline_factory or default_pipeline_factory()
        self._pipeline = factory()

    def start_model_loading_async(self):
        """Kick off model loading in a background thread (non-blocking);
        progress is surfaced via /api/model_status. No-op when already
        loaded/loading or when generation is remote."""
        with self._loading_lock:
            if (self._pipeline is not None or self._model_loading
                    or self.model_server_url):
                return
            self._model_loading = True

        def worker():
            try:
                with self._loading_lock:
                    if self._pipeline is None:
                        self._load_pipeline_locked()
                self._model_load_error = None
            except Exception as e:  # noqa: BLE001 — surfaced via model_status
                self._model_load_error = str(e)
            finally:
                self._model_loading = False

        threading.Thread(target=worker, daemon=True).start()

    def model_loading_status(self) -> dict:
        return {"model_loaded": self._pipeline is not None,
                "loading": self._model_loading,
                "error": self._model_load_error,
                "model_server_url": self.model_server_url}

    def unload_model(self) -> dict:
        """Drop the resident pipeline and let jax free its device buffers
        (explicit form of the reference's after-generate unload,
        api_server.py:474-481). Reload happens on demand at the next
        generate / start_model_loading_async."""
        import gc

        with self._loading_lock:
            was_loaded = self._pipeline is not None
            self._pipeline = None
            self._model_load_error = None
        gc.collect()  # prompt release of the params' HBM buffers
        return {"unloaded": was_loaded}

    # -- path-traversal guard (get_safe_filepath semantics) -----------------
    def safe_path(self, name: str) -> str:
        p = os.path.abspath(os.path.join(self.workdir, name))
        if not p.startswith(self.workdir + os.sep) and p != self.workdir:
            raise PermissionError(f"path escapes workdir: {name}")
        return p

    # -- stage runners (threads) --------------------------------------------
    def run_preprocess(self, task_id: str, params: dict):
        try:
            import cv2
            import jax

            from versecrafter_tpu.geometry.gaussians import process_single_image
            from versecrafter_tpu.perception import moge
            from versecrafter_tpu.perception.segmenter import ImageSegmenter

            self.tasks.update(task_id, status=RUNNING, progress=5,
                              message="estimating depth")
            img_path = self.safe_path(params["image"])
            out_root = os.path.dirname(img_path)
            img = cv2.cvtColor(cv2.imread(img_path), cv2.COLOR_BGR2RGB)
            # pad to ViT patch multiple
            ph, pw = -img.shape[0] % 14, -img.shape[1] % 14
            pimg = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge") \
                if ph or pw else img

            mparams = self._moge_params(params.get("moge_checkpoint"),
                                        params.get("model_version", "v2"))
            out = moge.infer(mparams, pimg.astype(np.float32) / 255.0)
            depth = out["depth"][: img.shape[0], : img.shape[1]]
            out["depth"] = depth
            depth_dir = os.path.join(out_root, "estimated_depth")
            moge.save_outputs(out, depth_dir)

            self.tasks.update(task_id, progress=40, message="segmenting")
            # detection knobs ride the request like the reference's
            # preprocess API (box/area thresholds, api_server.py:418-421)
            seg = ImageSegmenter(
                backend=params.get("backend", "saliency"),
                box_threshold=float(params.get("box_threshold", 0.25)),
                text_threshold=float(params.get("text_threshold", 0.25)),
                min_area_ratio=float(params.get("min_area_ratio", 0.002)),
                max_area_ratio=float(params.get("max_area_ratio", 0.6)),
                max_objects=int(params.get("max_objects", 5)))
            dets = seg.segment_image(img, params.get("text_prompt", "object."),
                                     depth=depth)
            mask_dir = os.path.join(out_root, "object_mask")
            seg.save_results(img, dets, mask_dir, stem=Path(img_path).stem)

            self.tasks.update(task_id, progress=70, message="fitting gaussians")
            gdir = os.path.join(out_root, "fitted_3D_gaussian")
            process_single_image(
                os.path.join(depth_dir, "depth_intrinsics.npz"),
                os.path.join(mask_dir, "masks"), gdir,
                input_image_path=img_path)

            self.tasks.update(task_id, status=COMPLETED, progress=100, result={
                "depth_npz": os.path.relpath(
                    os.path.join(depth_dir, "depth_intrinsics.npz"), self.workdir),
                "gaussian_params": os.path.relpath(
                    os.path.join(gdir, "gaussian_params.json"), self.workdir),
                "mask_dir": os.path.relpath(mask_dir, self.workdir),
                "num_objects": len(dets),
            })
        except Exception as e:  # noqa: BLE001 — task boundary
            self.tasks.update(task_id, status=FAILED, error=str(e),
                              message=traceback.format_exc()[-2000:])

    def _moge_params(self, ckpt: Optional[str], version: str = "v2"):
        """MoGe parameters for a preprocess request. Explicit checkpoint
        wins; otherwise `version` ('v1'/'v2', the Blender addon's depth-
        model knob) selects from self.moge_checkpoints — the analogue of
        the reference's DEFAULT_MODELS[model_version] (api_server.py:
        203-218). With neither configured, a cached random init serves the
        no-weights environment."""
        from versecrafter_tpu.perception import moge
        import jax

        if not ckpt:
            ckpt = getattr(self, "moge_checkpoints", {}).get(version)
        if ckpt:
            return moge.load_checkpoint(self.safe_path(ckpt))
        if not hasattr(self, "_moge_cache"):
            self._moge_cache = moge.init_moge(jax.random.key(0))
        return self._moge_cache

    def run_render(self, task_id: str, params: dict):
        try:
            from versecrafter_tpu.geometry.render import render_from_files

            self.tasks.update(task_id, status=RUNNING, progress=5,
                              message="rendering control maps")
            out_dir = self.safe_path(params.get("output_dir", "rendering_4D_maps"))
            paths = render_from_files(
                png_path=self.safe_path(params["image"]),
                npz_path=self.safe_path(params["depth_npz"]),
                mask_dir=self.safe_path(params["mask_dir"]) if params.get("mask_dir") else None,
                trajectory_npz=self.safe_path(params["trajectory_npz"]),
                ellipsoid_json=self.safe_path(params["ellipsoid_json"]),
                output_dir=out_dir,
                point_size=float(params.get("point_size", 0.005)),
                fps=int(params.get("fps", 16)))
            self.tasks.update(task_id, status=COMPLETED, progress=100, result={
                "output_dir": os.path.relpath(out_dir, self.workdir),
                "videos": {k: os.path.relpath(v, self.workdir)
                           for k, v in paths.items()}})
        except Exception as e:  # noqa: BLE001
            self.tasks.update(task_id, status=FAILED, error=str(e),
                              message=traceback.format_exc()[-2000:])

    def run_generate(self, task_id: str, params: dict):
        try:
            params = dict(params)
            params["rendering_maps_path"] = self.safe_path(
                params["rendering_maps_path"])
            if params.get("input_image_path"):
                params["input_image_path"] = self.safe_path(params["input_image_path"])
            params.setdefault("save_path", os.path.join(self.workdir, "generated"))

            try:
                if self.model_server_url:
                    self._generate_via_model_server(task_id, params)
                else:
                    self._generate_in_process(task_id, params)
            except Exception as e:  # noqa: BLE001 — tier-3 degraded path
                if not self.subprocess_fallback:
                    raise
                self.tasks.update(
                    task_id, status=RUNNING,
                    message=f"resident generation failed ({e}); "
                            "falling back to subprocess")
                self._generate_via_subprocess(task_id, params)
        except Exception as e:  # noqa: BLE001
            self.tasks.update(task_id, status=FAILED, error=str(e),
                              message=traceback.format_exc()[-2000:])

    def _generate_via_model_server(self, task_id: str, params: dict):
        """Reference dispatch tier 1 (api_server.py:1053-1125): POST
        /generate, then mirror /status/<id> progress every 2 s.

        Bounded like the reference's readiness waits (api_server.py:
        1013-1050): transient poll errors are retried a few times, and a
        remote that stays RUNNING with no progress/message change for
        `model_server_stall_timeout` seconds fails the task instead of
        polling forever. The default is generous (30 min) because a cold
        XLA cache legitimately goes silent for many minutes compiling the
        first denoise step at production shapes — the per-step progress
        callback only ticks between steps."""
        import time
        import urllib.request

        self.tasks.update(task_id, status=RUNNING, message="dispatching")
        req = urllib.request.Request(
            f"{self.model_server_url}/generate",
            data=json.dumps(params).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as resp:
            remote_id = json.loads(resp.read())["task_id"]

        errors = 0
        last_state = None
        last_change = time.monotonic()
        while True:
            try:
                with urllib.request.urlopen(
                        f"{self.model_server_url}/status/{remote_id}",
                        timeout=30) as r:
                    st = json.loads(r.read())
                errors = 0
            except Exception as e:  # noqa: BLE001 — transient poll failure
                errors += 1
                if errors >= 5:
                    raise RuntimeError(
                        f"model server unreachable after {errors} polls: {e}")
                time.sleep(2)
                continue
            self.tasks.update(task_id, progress=st["progress"],
                              message=st["message"])
            if st["status"] in (COMPLETED, FAILED):
                self.tasks.update(task_id, status=st["status"],
                                  result=st.get("result"), error=st.get("error"))
                return
            state = (st["status"], st["progress"], st["message"])
            if state != last_state:
                last_state = state
                last_change = time.monotonic()
            elif time.monotonic() - last_change > self.model_server_stall_timeout:
                raise RuntimeError(
                    f"model server task {remote_id} made no progress for "
                    f"{self.model_server_stall_timeout:.0f}s (stuck at "
                    f"{state}); giving up")
            time.sleep(2)

    def _generate_in_process(self, task_id: str, params: dict):
        from versecrafter_tpu.serve.model_server import (
            run_generate_request, save_generated_video)

        with self._loading_lock:  # waits out any in-flight background load
            if self._pipeline is None:
                self.tasks.update(task_id, status=RUNNING, message="loading model")
                self._load_pipeline_locked()
        self.tasks.update(task_id, status=RUNNING, message="generating")

        def progress(i, n):
            self.tasks.update(task_id, progress=int(100 * i / n),
                              message=f"step {i}/{n}")

        video = run_generate_request(self._pipeline, params, progress)
        out = save_generated_video(video, params, params["save_path"])
        self.tasks.update(task_id, status=COMPLETED, progress=100,
                          result={"video_path": os.path.relpath(out, self.workdir)})
        if self.unload_after_generate:
            self.unload_model()

    def _build_subprocess_argv(self, params: dict) -> list:
        """Request params -> `cli.inference` argv for the tier-3 fallback
        (reference builds a torchrun command the same way,
        api_server.py:1370-1441). Only params with a CLI counterpart are
        forwarded; the server's `subprocess_model_args` supply the model
        config."""
        import sys

        argv = [sys.executable, "-m", "versecrafter_tpu.cli.inference",
                "--rendering_maps_path", params["rendering_maps_path"],
                "--prompt", str(params.get("prompt", "")),
                "--input_image_path", str(params.get("input_image_path", "")),
                "--save_path", params.get(
                    "save_path", os.path.join(self.workdir, "generated")),
                "--sample_size", f"{int(params.get('height', 480))},"
                                 f"{int(params.get('width', 832))}",
                "--video_length", str(int(params.get("num_frames", 81)))]
        flag_map = {"num_inference_steps": int, "guidance_scale": float,
                    "seed": int, "fps": int, "shift": float,
                    "teacache_threshold": float, "teacache_skip_start": int,
                    "cfg_skip_ratio": float}
        for key, cast in flag_map.items():
            if key in params:
                argv += [f"--{key}", str(cast(params[key]))]
        # the fresh process carries NO resident teacache default: unless the
        # request asked for it, pin it off (the CLI default is 0.10)
        if "teacache_threshold" not in params:
            argv += ["--teacache_threshold", "0"]
        if params.get("int8_attention"):
            argv.append("--int8_attention")
        return argv + self.subprocess_model_args

    def _generate_via_subprocess(self, task_id: str, params: dict):
        """Dispatch tier 3 (reference api_server.py:1333-1480): run the
        request through a FRESH `cli.inference` process. Stdout is streamed
        into the task message (the CLI prints `denoise i / n` per step and
        the saved mp4 path last), so /api/status keeps ticking exactly like
        the resident tiers."""
        import subprocess

        argv = self._build_subprocess_argv(params)
        self.tasks.update(task_id, status=RUNNING,
                          message="subprocess: starting")
        proc = subprocess.Popen(argv, stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True)
        last_path = None
        tail = []
        assert proc.stdout is not None
        for line in proc.stdout:
            line = line.strip()
            if not line:
                continue
            tail = (tail + [line])[-20:]
            if line.startswith("denoise "):
                try:  # "denoise i / n"
                    i, n = line[8:].split(" / ")
                    self.tasks.update(task_id,
                                      progress=int(100 * int(i) / int(n)),
                                      message=f"subprocess: step {i}/{n}")
                except ValueError:
                    pass
            elif line.endswith(".mp4") and os.path.exists(line):
                last_path = line
        rc = proc.wait()
        if rc != 0 or last_path is None:
            raise RuntimeError(
                f"subprocess fallback failed (rc={rc}); tail:\n"
                + "\n".join(tail))
        self.tasks.update(
            task_id, status=COMPLETED, progress=100,
            result={"video_path": os.path.relpath(last_path, self.workdir)})

    def run_workflow(self, task_id: str, params: dict):
        """Render then generate (api /api/workflow)."""
        self.run_render(task_id, params)
        st = self.tasks.get(task_id)
        if st["status"] != COMPLETED:
            return
        gen = dict(params)
        gen["rendering_maps_path"] = st["result"]["output_dir"]
        self.tasks.update(task_id, status=RUNNING, progress=50,
                          message="rendering done; generating")
        self.run_generate(task_id, gen)


def build_router(server: ApiServer) -> Router:
    r = Router()

    def spawn(kind, runner, params):
        t = server.tasks.create(kind)
        threading.Thread(target=runner, args=(t.task_id, params),
                         daemon=True).start()
        return 200, {"task_id": t.task_id, "status": "PENDING"}

    # --- workflow endpoints (POST + GET mirrors) ---------------------------
    for kind, runner in (("preprocess", server.run_preprocess),
                         ("render", server.run_render),
                         ("generate", server.run_generate),
                         ("workflow", server.run_workflow)):
        def make(kind=kind, runner=runner):
            def post(req):
                return spawn(kind, runner, req.json())

            def get(req):
                return spawn(kind, runner, dict(req.query))
            return post, get
        post, get = make()
        r.add("POST", f"/api/{kind}", post)
        r.add("GET", f"/api/{kind}_get", get)

    @r.route("GET", "/api/status/<task_id>")
    def status(req):
        t = server.tasks.get(req.params["task_id"])
        return (200, t) if t else (404, {"error": "unknown task"})

    @r.route("GET", "/api/tasks")
    def tasks(req):
        return 200, {"tasks": server.tasks.all()}

    # --- uploads ------------------------------------------------------------
    @r.route("POST", "/api/upload")
    def upload(req):
        name = req.query.get("filename") or req.headers.get("X-Filename")
        if not name:
            return 400, {"error": "filename required (query or X-Filename)"}
        p = server.safe_path(name)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(req.body)
        return 200, {"filename": name, "size": len(req.body)}

    def _write_b64(name, data, append=False):
        if not name:
            return 400, {"error": "filename required"}
        p = server.safe_path(name)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "ab" if append else "wb") as f:
            f.write(base64.b64decode(data))
        return 200, {"success": True, "filename": name}

    @r.route("GET", "/api/upload_base64_get")
    def upload_b64(req):
        return _write_b64(req.query.get("filename"), req.query.get("data", ""),
                          append=req.query.get("append") == "1")

    @r.route("POST", "/api/upload_base64")
    def upload_b64_post(req):
        """POST variant (reference api_server.py:1767-1804 accepts both)."""
        body = req.json() or {}
        return _write_b64(body.get("filename"), body.get("data", ""))

    @r.route("GET", "/api/upload_base64")
    def upload_b64_get_alias(req):
        return _write_b64(req.query.get("filename"), req.query.get("data", ""))

    @r.route("POST", "/api/upload_chunk")
    def upload_chunk(req):
        q = req.query
        server.chunks.put(q["upload_id"], int(q["index"]), req.body,
                          total=int(q["total"]) if "total" in q else None,
                          filename=q.get("filename"))
        return 200, {"received": int(q["index"])}

    @r.route("POST", "/api/upload_complete")
    def upload_complete(req):
        q = req.json() or req.query
        data = server.chunks.complete(q["upload_id"])
        if data is None:
            return 400, {"error": "missing chunks"}
        p = server.safe_path(q["filename"])
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(data)
        return 200, {"filename": q["filename"], "size": len(data)}

    # --- downloads ----------------------------------------------------------
    @r.route("GET", "/api/download/<path:path>")
    def download(req):
        p = server.safe_path(req.params["path"].replace("%2F", "/"))
        if not os.path.isfile(p):
            return 404, {"error": "not found"}
        with open(p, "rb") as f:
            return 200, (f.read(), "application/octet-stream")

    @r.route("GET", "/api/download_base64/<path:path>")
    def download_b64(req):
        p = server.safe_path(req.params["path"].replace("%2F", "/"))
        if not os.path.isfile(p):
            return 404, {"error": "not found"}
        with open(p, "rb") as f:
            return 200, {"data": base64.b64encode(f.read()).decode()}

    @r.route("GET", "/api/download_chunk/<path:path>")
    def download_chunk(req):
        p = server.safe_path(req.params["path"].replace("%2F", "/"))
        if not os.path.isfile(p):
            return 404, {"error": "not found"}
        off = int(req.query.get("offset", 0))
        size = int(req.query.get("size", 1 << 20))
        total = os.path.getsize(p)
        with open(p, "rb") as f:
            f.seek(off)
            chunk = f.read(size)
        return 200, {"data": base64.b64encode(chunk).decode(),
                     "offset": off, "total": total,
                     "done": off + len(chunk) >= total}

    # --- file listing (reference api_server.py:1922-1943, scoped to the
    #     workdir by the traversal guard) -----------------------------------
    @r.route("GET", "/api/list_files")
    def list_files(req):
        rel = req.query.get("path", "")
        try:
            dirpath = server.safe_path(rel) if rel else server.workdir
        except PermissionError as e:
            return 400, {"error": str(e)}
        if not os.path.isdir(dirpath):
            return 404, {"error": f"Directory not found: {rel}"}
        files = []
        for item in sorted(os.listdir(dirpath)):
            ip = os.path.join(dirpath, item)
            files.append({"name": item,
                          "path": os.path.relpath(ip, server.workdir),
                          "is_dir": os.path.isdir(ip),
                          "size": os.path.getsize(ip) if os.path.isfile(ip) else 0})
        return 200, {"files": files, "path": rel}

    # --- synchronous preprocess (reference api_server.py:2186-2236) --------
    @r.route("POST", "/api/preprocess_sync")
    def preprocess_sync(req):
        params = req.json() or {}
        if "image" not in params:
            return 400, {"error": "Missing required field: image"}
        t = server.tasks.create("preprocess_sync")
        server.run_preprocess(t.task_id, params)  # blocking, in-request
        st = server.tasks.get(t.task_id)
        if st["status"] == COMPLETED:
            return 200, {"status": "completed", "result": st["result"]}
        return 500, {"status": "failed", "error": st.get("error")}

    # --- status / stats -------------------------------------------------------
    @r.route("GET", "/api/health")
    def health(req):
        return 200, {"status": "ok"}

    @r.route("GET", "/health")
    def health_top(req):
        """Top-level health probe (reference api_server.py:1660-1665)."""
        return 200, {"status": "ok", "server": "VerseCrafter API",
                     "version": "1.0"}

    @r.route("POST", "/api/unload_model")
    def unload_model(req):
        return 200, server.unload_model()

    @r.route("GET", "/api/unload_model")
    def unload_model_get(req):  # GET mirror, same as the other POST routes
        return 200, server.unload_model()

    @r.route("GET", "/api/model_status")
    def model_status(req):
        return 200, server.model_loading_status()

    @r.route("GET", "/system_stats")
    def system_stats(req):
        import jax
        devs = jax.devices()
        stats = []
        for d in devs:
            s = {"id": d.id, "platform": d.platform,
                 "kind": getattr(d, "device_kind", "?")}
            try:
                ms = d.memory_stats()
                if ms:
                    s["bytes_in_use"] = ms.get("bytes_in_use")
                    s["bytes_limit"] = ms.get("bytes_limit")
            except Exception:  # noqa: BLE001 — best-effort stats
                pass
            stats.append(s)
        return 200, {"devices": stats, "backend": jax.default_backend()}

    return r


def main(argv=None):
    p = argparse.ArgumentParser(description="VerseCrafter TPU API server")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8190)
    p.add_argument("--workdir", default="outputs/api")
    p.add_argument("--model_server_url", default=None)
    p.add_argument("--model_path", default=None)
    p.add_argument("--preload_model", action="store_true",
                   help="load + compile the model in the background at "
                        "startup (reference api_server.py:793-830); progress "
                        "via /api/model_status")
    p.add_argument("--auto_mesh", action="store_true",
                   help="shard the in-process model over all visible devices")
    p.add_argument("--unload_after_generate", action="store_true",
                   help="free the model after each generation (single-chip "
                        "memory management, reference api_server.py:474-481)")
    p.add_argument("--subprocess_fallback", action="store_true",
                   help="tier-3 degraded path: when the resident tiers "
                        "raise, re-run the request through a fresh "
                        "cli.inference process (reference torchrun "
                        "fallback, api_server.py:1333-1480)")
    p.add_argument("--subprocess_model_args", default="",
                   help="model-config argv appended to every fallback "
                        "invocation, e.g. '--staged --smoke_scale 14b "
                        "--quantize_bits 4 --int8_compute'")
    args = p.parse_args(argv)

    from versecrafter_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    factory = None
    if args.model_path or args.auto_mesh:
        from versecrafter_tpu.serve.model_server import default_pipeline_factory
        factory = default_pipeline_factory(args.model_path,
                                           auto_mesh=args.auto_mesh)
    import shlex
    server = ApiServer(workdir=args.workdir,
                       model_server_url=args.model_server_url,
                       pipeline_factory=factory,
                       unload_after_generate=args.unload_after_generate,
                       subprocess_fallback=args.subprocess_fallback,
                       subprocess_model_args=shlex.split(
                           args.subprocess_model_args))
    if args.preload_model:
        server.start_model_loading_async()
    httpd = make_server(build_router(server), args.host, args.port)
    print(f"api server on {args.host}:{args.port} (workdir {server.workdir})")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
