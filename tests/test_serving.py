"""Serving layer tests: real HTTP round-trips against in-process servers."""

import base64
import json
import os
import time
import urllib.request
import urllib.error

import numpy as np
import pytest

from versecrafter_tpu.serve.api_server import ApiServer, build_router
from versecrafter_tpu.serve.http import make_server, serve_forever_in_thread
from versecrafter_tpu.serve.tasks import ChunkStore, TaskRegistry


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def _post(url, payload=None, raw=None, headers=None):
    data = raw if raw is not None else json.dumps(payload or {}).encode()
    req = urllib.request.Request(url, data=data, headers=headers or {})
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read())


def _tiny_pipeline_factory():
    import dataclasses
    import jax
    import jax.numpy as jnp

    from versecrafter_tpu.core.config import T5Config, VAEConfig, WanDiTConfig
    from versecrafter_tpu.models.t5 import init_t5
    from versecrafter_tpu.models.vae import init_vae
    from versecrafter_tpu.models.wan_dit import init_wan_dit
    from versecrafter_tpu.sampling.pipeline import VerseCrafterPipeline

    vae_cfg = VAEConfig(base_dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
                        temporal_downsample=(True,), spatial_compression_ratio=2,
                        temporal_compression_ratio=2, use_latent_stats=False)
    t5_cfg = T5Config(vocab=256, dim=32, dim_attn=32, dim_ffn=64, num_heads=4,
                      num_layers=1, num_buckets=8, text_length=16)
    # 4 controls x 4ch + (2*2) mask ch = 20
    dit_cfg = WanDiTConfig(in_dim=4, dim=64, ffn_dim=128, freq_dim=32,
                           text_dim=32, out_dim=4, num_heads=2, num_layers=2,
                           text_len=16, geoada_layers=(), geoada_in_dim=20)

    def factory():
        return VerseCrafterPipeline(
            dit_params=init_wan_dit(jax.random.key(0), dit_cfg, jnp.float32),
            dit_cfg=dit_cfg,
            vae_params=init_vae(jax.random.key(1), vae_cfg, jnp.float32),
            vae_cfg=vae_cfg,
            t5_params=init_t5(jax.random.key(2), t5_cfg, jnp.float32),
            t5_cfg=t5_cfg,
        )
    return factory


@pytest.fixture(scope="module")
def api(tmp_path_factory):
    workdir = tmp_path_factory.mktemp("api")
    server = ApiServer(workdir=str(workdir),
                       pipeline_factory=_tiny_pipeline_factory())
    httpd = make_server(build_router(server), "127.0.0.1", 0)
    serve_forever_in_thread(httpd)
    port = httpd.server_address[1]
    yield f"http://127.0.0.1:{port}", server
    httpd.shutdown()


def _wait_task(base, task_id, timeout=300):
    t0 = time.time()
    while time.time() - t0 < timeout:
        _, st = _get(f"{base}/api/status/{task_id}")
        if st["status"] in ("COMPLETED", "FAILED"):
            return st
        time.sleep(0.3)
    raise TimeoutError(st)


def test_health_and_stats(api):
    base, _ = api
    assert _get(f"{base}/api/health")[1]["status"] == "ok"
    st = _get(f"{base}/system_stats")[1]
    assert "devices" in st and len(st["devices"]) >= 1
    assert _get(f"{base}/api/model_status")[1]["model_loaded"] is False


def test_upload_download_roundtrip(api):
    base, _ = api
    payload = os.urandom(1024)
    _post(f"{base}/api/upload?filename=blob.bin", raw=payload)
    with urllib.request.urlopen(f"{base}/api/download/blob.bin") as r:
        assert r.read() == payload
    b64 = _get(f"{base}/api/download_base64/blob.bin")[1]["data"]
    assert base64.b64decode(b64) == payload


def test_chunked_upload_and_download(api):
    base, _ = api
    data = os.urandom(3000)
    for i in range(3):
        _post(f"{base}/api/upload_chunk?upload_id=u1&index={i}&total=3&filename=c.bin",
              raw=data[i * 1000:(i + 1) * 1000])
    _post(f"{base}/api/upload_complete", payload={"upload_id": "u1", "filename": "c.bin"})
    got = b""
    off = 0
    while True:
        st = _get(f"{base}/api/download_chunk/c.bin?offset={off}&size=1024")[1]
        got += base64.b64decode(st["data"])
        if st["done"]:
            break
        off += 1024
    assert got == data


def test_path_traversal_blocked(api):
    base, _ = api
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(f"{base}/api/download/..%2F..%2Fetc%2Fpasswd")
    assert ei.value.code in (404, 500)
    # and uploads cannot escape either
    try:
        _post(f"{base}/api/upload?filename=../escape.bin", raw=b"x")
        escaped = True
    except urllib.error.HTTPError:
        escaped = False
    assert not escaped


def test_unknown_task_404(api):
    base, _ = api
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(f"{base}/api/status/nonexistent")
    assert ei.value.code == 404


def test_preprocess_task(api):
    base, server = api
    import cv2
    img = np.full((64, 96, 3), 30, np.uint8)
    img[20:44, 30:60] = [220, 60, 60]
    cv2.imwrite(os.path.join(server.workdir, "input.png"),
                cv2.cvtColor(img, cv2.COLOR_RGB2BGR))

    # tiny MoGe so the test is fast
    import jax
    from versecrafter_tpu.perception import moge
    server._moge_cache = moge.init_moge(
        jax.random.key(0), vit_kwargs=dict(patch=14, dim=32, depth=2, heads=2))

    _, resp = _post(f"{base}/api/preprocess",
                    payload={"image": "input.png", "text_prompt": "box."})
    st = _wait_task(base, resp["task_id"])
    assert st["status"] == "COMPLETED", st
    assert os.path.exists(os.path.join(server.workdir,
                                       st["result"]["depth_npz"]))
    assert os.path.exists(os.path.join(server.workdir,
                                       st["result"]["gaussian_params"]))


def test_generate_task_in_process(api):
    base, server = api
    from versecrafter_tpu.utils.video import save_video

    maps = os.path.join(server.workdir, "maps")
    rng = np.random.default_rng(0)
    t, h, w = 5, 8, 8
    for name in ["background_RGB", "background_depth", "3D_gaussian_RGB",
                 "3D_gaussian_depth", "merged_mask"]:
        save_video(rng.random((t, h, w, 3)).astype(np.float32),
                   os.path.join(maps, f"{name}.mp4"), fps=5)

    _, resp = _post(f"{base}/api/generate", payload={
        "rendering_maps_path": "maps", "prompt": "a test",
        "height": h, "width": w, "num_frames": t,
        "num_inference_steps": 2, "guidance_scale": 2.0, "fps": 5,
    })
    st = _wait_task(base, resp["task_id"])
    assert st["status"] == "COMPLETED", st
    out = os.path.join(server.workdir, st["result"]["video_path"])
    assert os.path.exists(out)
    assert _get(f"{base}/api/model_status")[1]["model_loaded"] is True


def test_task_registry_and_chunkstore_thread_safety():
    import threading

    reg = TaskRegistry()
    ids = [reg.create("t").task_id for _ in range(4)]

    def hammer(tid):
        for i in range(200):
            reg.update(tid, progress=i)

    th = [threading.Thread(target=hammer, args=(t,)) for t in ids]
    [t.start() for t in th]
    [t.join() for t in th]
    assert all(reg.get(t)["progress"] == 199 for t in ids)

    cs = ChunkStore()

    def put(i):
        cs.put("u", i, bytes([i]), total=50)

    th = [threading.Thread(target=put, args=(i,)) for i in range(50)]
    [t.start() for t in th]
    [t.join() for t in th]
    assert cs.complete("u") == bytes(range(50))


def test_get_mirror_endpoints(api):
    base, server = api
    # GET mirror spawns a task from query params (proxy-traversal path)
    _, resp = _get(f"{base}/api/render_get?image=missing.png&depth_npz=m.npz"
                   f"&trajectory_npz=m.npz&ellipsoid_json=m.json")
    st = _wait_task(base, resp["task_id"])
    assert st["status"] == "FAILED"  # missing files surface as task failure
    assert "missing" in (st["error"] or "") or st["error"]


def test_workflow_endpoint_failure_propagates(api):
    base, server = api
    _, resp = _post(f"{base}/api/workflow", payload={
        "image": "missing.png", "depth_npz": "m.npz",
        "trajectory_npz": "m.npz", "ellipsoid_json": "m.json",
        "rendering_maps_path": "m"})
    st = _wait_task(base, resp["task_id"])
    assert st["status"] == "FAILED"


def test_tasks_listing(api):
    base, _ = api
    _, st = _get(f"{base}/api/tasks")
    assert isinstance(st["tasks"], list) and len(st["tasks"]) >= 1
    assert {"task_id", "status", "progress"} <= set(st["tasks"][0])


def test_top_level_health(api):
    """Reference serves /health at top level too (api_server.py:1660)."""
    base, _ = api
    st = _get(f"{base}/health")[1]
    assert st["status"] == "ok" and "server" in st


def test_upload_base64_post(api):
    base, _ = api
    payload = os.urandom(256)
    _post(f"{base}/api/upload_base64", payload={
        "filename": "b64post.bin", "data": base64.b64encode(payload).decode()})
    with urllib.request.urlopen(f"{base}/api/download/b64post.bin") as r:
        assert r.read() == payload


def test_list_files(api):
    base, server = api
    os.makedirs(os.path.join(server.workdir, "lf"), exist_ok=True)
    with open(os.path.join(server.workdir, "lf", "a.txt"), "wb") as f:
        f.write(b"abc")
    st = _get(f"{base}/api/list_files?path=lf")[1]
    names = {e["name"]: e for e in st["files"]}
    assert names["a.txt"]["size"] == 3 and not names["a.txt"]["is_dir"]
    # traversal blocked
    with pytest.raises(urllib.error.HTTPError):
        urllib.request.urlopen(f"{base}/api/list_files?path=..%2F..")
    # unknown dir is a 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(f"{base}/api/list_files?path=nope")
    assert ei.value.code == 404


def test_preprocess_sync(api):
    base, server = api
    import cv2
    img = np.full((64, 96, 3), 40, np.uint8)
    img[10:40, 20:70] = [60, 200, 60]
    cv2.imwrite(os.path.join(server.workdir, "sync_in.png"),
                cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    import jax
    from versecrafter_tpu.perception import moge
    server._moge_cache = moge.init_moge(
        jax.random.key(0), vit_kwargs=dict(patch=14, dim=32, depth=2, heads=2))
    code, st = _post(f"{base}/api/preprocess_sync",
                     payload={"image": "sync_in.png", "text_prompt": "box."})
    assert code == 200 and st["status"] == "completed"
    assert os.path.exists(os.path.join(server.workdir, st["result"]["depth_npz"]))
    # missing field is a 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{base}/api/preprocess_sync", payload={})
    assert ei.value.code == 400


def test_background_model_preload(tmp_path):
    """--preload_model path: load runs in a background thread; model_status
    reports loading -> loaded (reference api_server.py:793-866)."""
    import threading

    release = threading.Event()
    inner = _tiny_pipeline_factory()

    def slow_factory():
        release.wait(timeout=30)
        return inner()

    server = ApiServer(workdir=str(tmp_path), pipeline_factory=slow_factory)
    server.start_model_loading_async()
    st = server.model_loading_status()
    assert st["loading"] is True and st["model_loaded"] is False
    release.set()
    t0 = time.time()
    while server.model_loading_status()["loading"] and time.time() - t0 < 60:
        time.sleep(0.05)
    st = server.model_loading_status()
    assert st["model_loaded"] is True and st["error"] is None
    # idempotent once loaded
    server.start_model_loading_async()
    assert server.model_loading_status()["model_loaded"] is True


def test_model_server_stall_deadline(tmp_path):
    """A remote model server stuck in RUNNING with no progress change must
    fail the task after the stall timeout instead of polling forever
    (reference bounds its readiness waits at 600 s, api_server.py:1013-1050)."""
    from versecrafter_tpu.serve.http import Router

    router = Router()

    @router.route("POST", "/generate")
    def _gen(req):
        return 200, {"task_id": "wedged"}

    @router.route("GET", "/status/<task_id>")
    def _status(req):
        return 200, {"status": "RUNNING", "progress": 3,
                     "message": "stuck forever"}

    httpd = make_server(router, "127.0.0.1", 0)
    serve_forever_in_thread(httpd)
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        server = ApiServer(workdir=str(tmp_path), model_server_url=url,
                           model_server_stall_timeout=1.0)
        task = server.tasks.create("generate")
        t0 = time.time()
        server.run_generate(task.task_id, {"rendering_maps_path": "maps"})
        st = server.tasks.get(task.task_id)
        assert st["status"] == "FAILED"
        assert "no progress" in (st["error"] or "")
        assert time.time() - t0 < 30
    finally:
        httpd.shutdown()


def test_model_server_unreachable_bounded(tmp_path):
    """Connection failures while polling are retried a few times, then fail
    the task (no infinite retry loop)."""
    server = ApiServer(workdir=str(tmp_path),
                       model_server_url="http://127.0.0.1:9",  # discard port
                       model_server_stall_timeout=1.0)
    task = server.tasks.create("generate")
    server.run_generate(task.task_id, {"rendering_maps_path": "maps"})
    st = server.tasks.get(task.task_id)
    assert st["status"] == "FAILED"


def test_model_unload_and_reload(api):
    """POST /api/unload_model frees the resident pipeline; the next generate
    reloads on demand (reference single-GPU memory management,
    api_server.py:474-481)."""
    base, server = api
    # make sure something is loaded (earlier generate test usually did)
    server.start_model_loading_async()
    t0 = time.time()
    while server.model_loading_status()["loading"] and time.time() - t0 < 120:
        time.sleep(0.1)
    code, resp = _post(f"{base}/api/unload_model")
    assert code == 200
    assert _get(f"{base}/api/model_status")[1]["model_loaded"] is False
    # idempotent
    assert _post(f"{base}/api/unload_model")[1]["unloaded"] is False

    # reload on demand: run a generate again
    maps = os.path.join(server.workdir, "maps")
    if os.path.exists(os.path.join(maps, "merged_mask.mp4")):
        _, resp = _post(f"{base}/api/generate", payload={
            "rendering_maps_path": "maps", "prompt": "again",
            "height": 8, "width": 8, "num_frames": 5,
            "num_inference_steps": 1, "guidance_scale": 1.0, "fps": 5,
        })
        st = _wait_task(base, resp["task_id"])
        assert st["status"] == "COMPLETED", st
        assert _get(f"{base}/api/model_status")[1]["model_loaded"] is True


def test_generate_acceleration_params(api):
    """teacache/cfg-skip toggles ride the generate params (CLI parity) and
    are restored after the request."""
    base, server = api
    maps = os.path.join(server.workdir, "maps")
    if not os.path.exists(os.path.join(maps, "merged_mask.mp4")):
        pytest.skip("maps not prepared by earlier test")
    # a resident host may carry FITTED coefficients (scripts/fit_teacache) —
    # a request toggling teacache must run with and then restore them
    fitted = (0.1, -0.2, 0.3, -0.4, 0.5)
    if server._pipeline is None:
        server._load_pipeline_locked()
    server._pipeline.teacache_coefficients = fitted
    _, resp = _post(f"{base}/api/generate", payload={
        "rendering_maps_path": "maps", "prompt": "fast",
        "height": 8, "width": 8, "num_frames": 5,
        "num_inference_steps": 3, "guidance_scale": 2.0, "fps": 5,
        "teacache_threshold": 0.5, "teacache_skip_start": 1,
        "cfg_skip_ratio": 0.3,
    })
    st = _wait_task(base, resp["task_id"])
    assert st["status"] == "COMPLETED", st
    pipe = server._pipeline
    assert pipe.teacache_threshold == 0.0  # restored
    assert pipe.cfg_skip_ratio == 0.0
    assert pipe.teacache_coefficients == fitted  # not reset to defaults


def test_generate_int8_compute_param(api):
    """int8_compute rides the generate params: the resident pipeline is
    quantized with W8A8 compute-tagged block matmuls (sticky) and the
    request completes."""
    import versecrafter_tpu.utils.quantize as qz

    base, server = api
    maps = os.path.join(server.workdir, "maps")
    if not os.path.exists(os.path.join(maps, "merged_mask.mp4")):
        pytest.skip("maps not prepared by earlier test")
    if server._pipeline is None:
        server._load_pipeline_locked()
    old_min = qz.MIN_SIZE
    qz.MIN_SIZE = 1 << 10  # tiny test leaves must still quantize
    try:
        _, resp = _post(f"{base}/api/generate", payload={
            "rendering_maps_path": "maps", "prompt": "quantized",
            "height": 8, "width": 8, "num_frames": 5,
            "num_inference_steps": 1, "guidance_scale": 1.0, "fps": 5,
            "int8_compute": True,
        })
        st = _wait_task(base, resp["task_id"])
    finally:
        qz.MIN_SIZE = old_min
    assert st["status"] == "COMPLETED", st
    assert qz.is_compute_tagged(
        server._pipeline.dit_params["blocks"]["ffn_in"]["kernel"])


def test_run_generate_request_quantize_bits4(tmp_path):
    """quantize_bits=4 rides the generate params (model_server surface):
    the resident DiT weights become nibble-packed int4 storage leaves and
    the request still produces a video."""
    import numpy as np

    import versecrafter_tpu.utils.quantize as qz
    from versecrafter_tpu.serve.model_server import (
        default_pipeline_factory, run_generate_request)
    from versecrafter_tpu.utils.video import save_image, save_video

    rng = np.random.default_rng(0)
    t, h, w = 5, 16, 16
    maps = tmp_path / "maps"
    maps.mkdir()
    save_image(rng.random((h, w, 3)).astype(np.float32),
               str(tmp_path / "0001.png"))
    for name in ["background_RGB", "background_depth", "3D_gaussian_RGB",
                 "3D_gaussian_depth", "merged_mask"]:
        save_video(rng.random((t, h, w, 3)).astype(np.float32),
                   str(maps / f"{name}.mp4"), fps=5)

    pipe = default_pipeline_factory(scale="tiny")()
    old_min = qz.MIN_SIZE
    qz.MIN_SIZE = 1 << 10  # tiny test leaves must still quantize
    try:
        video = run_generate_request(pipe, {
            "rendering_maps_path": str(maps),
            "input_image_path": str(tmp_path / "0001.png"),
            "prompt": "packed", "height": h, "width": w, "num_frames": t,
            "num_inference_steps": 1, "guidance_scale": 1.0, "fps": 5,
            "quantize_int8": True, "quantize_bits": 4,
        }, lambda i, n: None)
    finally:
        qz.MIN_SIZE = old_min
    leaf = pipe.dit_params["blocks"]["ffn_in"]["kernel"]
    assert isinstance(leaf, dict) and "q4values" in leaf
    assert np.isfinite(np.asarray(video, np.float32)).all()


def test_run_generate_request_int8_attention_restored(tmp_path):
    """int8_attention rides the generate params and is restored after the
    request (module-global kernel toggle, teacache-style save/restore)."""
    import numpy as np

    from versecrafter_tpu.models import wan_dit
    from versecrafter_tpu.serve.model_server import (
        default_pipeline_factory, run_generate_request)
    from versecrafter_tpu.utils.video import save_image, save_video

    rng = np.random.default_rng(0)
    t, h, w = 5, 16, 16
    maps = tmp_path / "maps"
    maps.mkdir()
    save_image(rng.random((h, w, 3)).astype(np.float32),
               str(tmp_path / "0001.png"))
    for name in ["background_RGB", "background_depth", "3D_gaussian_RGB",
                 "3D_gaussian_depth", "merged_mask"]:
        save_video(rng.random((t, h, w, 3)).astype(np.float32),
                   str(maps / f"{name}.mp4"), fps=5)

    pipe = default_pipeline_factory(scale="tiny")()
    assert not wan_dit.INT8_QK_SCORE
    video = run_generate_request(pipe, {
        "rendering_maps_path": str(maps),
        "input_image_path": str(tmp_path / "0001.png"),
        "prompt": "int8attn", "height": h, "width": w, "num_frames": t,
        "num_inference_steps": 1, "guidance_scale": 1.0, "fps": 5,
        "int8_attention": True,
    }, lambda i, n: None)
    assert not wan_dit.INT8_QK_SCORE  # restored
    assert np.isfinite(np.asarray(video, np.float32)).all()


def test_denoise_cache_keys_kernel_toggles():
    """Per-request kernel toggles (int8_attention) must recompile rather
    than silently reuse a denoise program traced with the other flag
    value."""
    from versecrafter_tpu.models import wan_dit
    from versecrafter_tpu.serve.model_server import default_pipeline_factory

    pipe = default_pipeline_factory(scale="tiny")()
    old = wan_dit.INT8_QK_SCORE
    try:
        wan_dit.INT8_QK_SCORE = False
        f_off = pipe._get_denoise(True)
        wan_dit.INT8_QK_SCORE = True
        f_on = pipe._get_denoise(True)
    finally:
        wan_dit.INT8_QK_SCORE = old
    assert f_on is not f_off
    assert len(pipe._jit_cache) == 2


def test_run_generate_request_quant_mode_conflict(tmp_path):
    """A request whose quantize mode conflicts with the resident pipeline's
    sticky mode fails loudly (weights were rewritten in place; silently
    serving the old mode would let a client believe it measured the new
    one), and the int8_attention toggle does not leak through the failure."""
    import numpy as np
    import pytest as _pytest

    import versecrafter_tpu.utils.quantize as qz
    from versecrafter_tpu.models import wan_dit
    from versecrafter_tpu.serve.model_server import (
        default_pipeline_factory, run_generate_request)
    from versecrafter_tpu.utils.video import save_image, save_video

    rng = np.random.default_rng(0)
    t, h, w = 5, 16, 16
    maps = tmp_path / "maps"
    maps.mkdir()
    save_image(rng.random((h, w, 3)).astype(np.float32),
               str(tmp_path / "0001.png"))
    for name in ["background_RGB", "background_depth", "3D_gaussian_RGB",
                 "3D_gaussian_depth", "merged_mask"]:
        save_video(rng.random((t, h, w, 3)).astype(np.float32),
                   str(maps / f"{name}.mp4"), fps=5)

    pipe = default_pipeline_factory(scale="tiny")()
    common = dict(rendering_maps_path=str(maps),
                  input_image_path=str(tmp_path / "0001.png"),
                  prompt="q", height=h, width=w, num_frames=t,
                  num_inference_steps=1, guidance_scale=1.0, fps=5)
    old_min = qz.MIN_SIZE
    qz.MIN_SIZE = 1 << 10
    try:
        run_generate_request(pipe, {**common, "quantize_int8": True},
                             lambda i, n: None)
        assert pipe._quantized == (8, False)
        with _pytest.raises(ValueError, match="already quantized"):
            run_generate_request(
                pipe, {**common, "int8_compute": True,
                       "int8_attention": True}, lambda i, n: None)
        assert not wan_dit.INT8_QK_SCORE  # restored through the failure
        # same mode again is fine
        run_generate_request(pipe, {**common, "quantize_int8": True},
                             lambda i, n: None)
    finally:
        qz.MIN_SIZE = old_min


def test_run_generate_request_staged_residency(tmp_path):
    """Staged serving mode (single-16GB-chip 14B path at toy scale): the
    resident pipeline is a config-only shell, every component builds and
    frees per request stage, and a second request works against the same
    shell (the per-request rebuild path). Quantize params are rejected —
    the factories own quantization."""
    import numpy as np
    import pytest as _pytest

    import versecrafter_tpu.utils.quantize as qz
    from versecrafter_tpu.sampling.staged import staged_pipeline_factory
    from versecrafter_tpu.serve.model_server import run_generate_request
    from versecrafter_tpu.utils.video import save_image, save_video

    rng = np.random.default_rng(0)
    t, h, w = 5, 16, 16
    maps = tmp_path / "maps"
    maps.mkdir()
    save_image(rng.random((h, w, 3)).astype(np.float32),
               str(tmp_path / "0001.png"))
    for name in ["background_RGB", "background_depth", "3D_gaussian_RGB",
                 "3D_gaussian_depth", "merged_mask"]:
        save_video(rng.random((t, h, w, 3)).astype(np.float32),
                   str(maps / f"{name}.mp4"), fps=5)

    old_min = qz.MIN_SIZE
    qz.MIN_SIZE = 1 << 10
    try:
        factory, staged = staged_pipeline_factory(scale="tiny", bits=4,
                                                  int8_compute=True)
        pipe = factory()
        assert pipe.dit_params is None and pipe.t5_params is None
        common = {
            "rendering_maps_path": str(maps),
            "input_image_path": str(tmp_path / "0001.png"),
            "prompt": "staged", "height": h, "width": w, "num_frames": t,
            "num_inference_steps": 1, "guidance_scale": 2.0, "fps": 5,
        }
        video = run_generate_request(pipe, common, lambda i, n: None,
                                     staged_factories=staged)
        assert np.isfinite(np.asarray(video, np.float32)).all()
        assert pipe.dit_params is None  # freed after the stage
        assert "denoise" in pipe.last_stage_profile
        # second request on the same shell: rebuild path
        video2 = run_generate_request(pipe, common, lambda i, n: None,
                                      staged_factories=staged)
        np.testing.assert_array_equal(np.asarray(video),
                                      np.asarray(video2))
        with _pytest.raises(ValueError, match="staged"):
            run_generate_request(pipe, {**common, "quantize_int8": True},
                                 lambda i, n: None, staged_factories=staged)
    finally:
        qz.MIN_SIZE = old_min


def test_subprocess_fallback_argv_contract(tmp_path):
    """The tier-3 argv must parse against the REAL cli.inference parser
    (every forwarded flag exists, model args appended last)."""
    from versecrafter_tpu.cli.inference import parse_args

    server = ApiServer(workdir=str(tmp_path), subprocess_fallback=True,
                       subprocess_model_args=["--staged", "--smoke_scale",
                                              "tiny"])
    argv = server._build_subprocess_argv({
        "rendering_maps_path": str(tmp_path / "maps"), "prompt": "p",
        "input_image_path": str(tmp_path / "img.png"),
        "height": 480, "width": 832, "num_frames": 81,
        "num_inference_steps": 7, "guidance_scale": 3.0, "seed": 11,
        "cfg_skip_ratio": 0.25, "int8_attention": True,
    })
    assert argv[1:3] == ["-m", "versecrafter_tpu.cli.inference"]
    args = parse_args(argv[3:])
    assert args.sample_size == "480,832" and args.video_length == 81
    assert args.num_inference_steps == 7 and args.seed == 11
    assert args.cfg_skip_ratio == 0.25 and args.int8_attention
    assert args.staged and args.smoke_scale == "tiny"
    # no resident teacache default leaks into the fresh process
    assert args.teacache_threshold == 0.0


def test_generate_subprocess_fallback(tmp_path):
    """Tier 3 end-to-end: the resident tiers raise, the subprocess runs,
    progress lines stream into the task, the printed mp4 path completes
    the task (reference fallback behavior, api_server.py:1333-1480)."""
    import sys

    def broken_factory():
        raise RuntimeError("resident pipeline wedged")

    server = ApiServer(workdir=str(tmp_path), pipeline_factory=broken_factory,
                       subprocess_fallback=True)
    out = tmp_path / "generated" / "out.mp4"
    script = (
        "import os, sys\n"
        "print('denoise 1 / 2', flush=True)\n"
        "print('denoise 2 / 2', flush=True)\n"
        f"os.makedirs({str(out.parent)!r}, exist_ok=True)\n"
        f"open({str(out)!r}, 'wb').write(b'x')\n"
        f"print({str(out)!r})\n")
    server._build_subprocess_argv = lambda params: [sys.executable, "-c",
                                                    script]
    tid = server.tasks.create("generate").task_id
    server.run_generate(tid, {"rendering_maps_path": str(tmp_path)})
    st = server.tasks.get(tid)
    assert st["status"] == "COMPLETED", st
    assert (tmp_path / st["result"]["video_path"]).exists()

    # with the fallback disabled the same failure propagates as FAILED
    server2 = ApiServer(workdir=str(tmp_path), pipeline_factory=broken_factory)
    tid2 = server2.tasks.create("generate").task_id
    server2.run_generate(tid2, {"rendering_maps_path": str(tmp_path)})
    assert server2.tasks.get(tid2)["status"] == "FAILED"


def test_generate_subprocess_fallback_failure(tmp_path):
    """A failing subprocess surfaces FAILED with the output tail."""
    import sys

    def broken_factory():
        raise RuntimeError("resident pipeline wedged")

    server = ApiServer(workdir=str(tmp_path), pipeline_factory=broken_factory,
                       subprocess_fallback=True)
    server._build_subprocess_argv = lambda params: [
        sys.executable, "-c", "import sys; print('boom'); sys.exit(3)"]
    tid = server.tasks.create("generate").task_id
    server.run_generate(tid, {"rendering_maps_path": str(tmp_path)})
    st = server.tasks.get(tid)
    assert st["status"] == "FAILED"
    assert "rc=3" in st["error"] and "boom" in st["error"]


def test_download_nested_result_path(api):
    """Task results live under subdirs (generated/video.mp4) — the download
    routes must span segments like the reference's Flask <path:> converter
    (api_server.py:1738-1943), with the traversal guard still active."""
    base, server = api
    sub = os.path.join(server.workdir, "generated")
    os.makedirs(sub, exist_ok=True)
    payload = os.urandom(256)
    with open(os.path.join(sub, "video.mp4"), "wb") as f:
        f.write(payload)
    with urllib.request.urlopen(
            f"{base}/api/download/generated/video.mp4") as r:
        assert r.read() == payload
    b64 = _get(f"{base}/api/download_base64/generated/video.mp4")[1]["data"]
    assert base64.b64decode(b64) == payload
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(f"{base}/api/download/generated/../../oops")
    assert ei.value.code in (403, 404, 500)
