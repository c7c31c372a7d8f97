"""Drive ONE real 14B staged generation through the full serving stack
(VERDICT r4 #7): api_server --model_server_url -> model_server --staged,
POST /api/generate, poll to completion, download the mp4, and record the
request wall vs the CLI wall (reference path api_server.py:1053-1125 ->
model_server.py:586-614).

Runs on the real chip; both servers are spawned as subprocesses with this
process's environment (PYTHONPATH must include /root/.axon_site).

  python scripts/drive_serving_14b.py \
      --maps /root/repo/outputs/canon720/rendering_4D_maps \
      --image /root/reference/demo_data/.../0001.png \
      --out /root/repo/outputs/serve14b
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def wait_http(url, timeout=300):
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            with urllib.request.urlopen(url, timeout=10) as r:
                return json.loads(r.read())
        except Exception:
            time.sleep(2)
    raise TimeoutError(url)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--maps", required=True)
    p.add_argument("--image", required=True)
    p.add_argument("--out", default=os.path.join(REPO, "outputs/serve14b"))
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--width", type=int, default=832)
    p.add_argument("--frames", type=int, default=81)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--model_port", type=int, default=8191)
    p.add_argument("--api_port", type=int, default=8190)
    p.add_argument("--poll_timeout", type=float, default=5400.0)
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    workdir = os.path.join(args.out, "api_wd")
    os.makedirs(workdir, exist_ok=True)
    # inputs must live INSIDE the api workdir (path-traversal guard)
    maps_dst = os.path.join(workdir, "maps")
    if not os.path.isdir(maps_dst):
        shutil.copytree(args.maps, maps_dst)
    shutil.copy(args.image, os.path.join(workdir, "input.png"))

    env = dict(os.environ)
    procs = []
    try:
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "versecrafter_tpu.serve.model_server",
             "--port", str(args.model_port), "--staged",
             "--staged_scale", "14b", "--quantize_bits", "4",
             "--output_dir", os.path.join(args.out, "serve_out")],
            env=env, stdout=open(os.path.join(args.out, "model_server.log"),
                                 "w"), stderr=subprocess.STDOUT))
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "versecrafter_tpu.serve.api_server",
             "--port", str(args.api_port), "--workdir", workdir,
             "--model_server_url", f"http://127.0.0.1:{args.model_port}"],
            env=env, stdout=open(os.path.join(args.out, "api_server.log"),
                                 "w"), stderr=subprocess.STDOUT))
        wait_http(f"http://127.0.0.1:{args.model_port}/health")
        wait_http(f"http://127.0.0.1:{args.api_port}/api/health")
        print("servers up", flush=True)

        params = {"rendering_maps_path": "maps",
                  "input_image_path": "input.png",
                  "prompt": "people walk through the scene, cinematic",
                  "height": args.height, "width": args.width,
                  "num_frames": args.frames,
                  "num_inference_steps": args.steps,
                  "guidance_scale": 5.0, "fps": 16,
                  "teacache_threshold": 0.0, "seed": 2025}
        t0 = time.time()
        req = urllib.request.Request(
            f"http://127.0.0.1:{args.api_port}/api/generate",
            data=json.dumps(params).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            task = json.loads(r.read())["task_id"]
        print("task", task, flush=True)

        last_msg = None
        while True:
            st = wait_http(
                f"http://127.0.0.1:{args.api_port}/api/status/{task}")
            if st["message"] != last_msg:
                last_msg = st["message"]
                print(f"[{time.time() - t0:8.1f}s] {st['status']} "
                      f"{st['progress']}% {st['message']}", flush=True)
            if st["status"] in ("COMPLETED", "FAILED"):
                break
            if time.time() - t0 > args.poll_timeout:
                raise TimeoutError(f"poll deadline at {st}")
            time.sleep(5)
        request_wall = time.time() - t0
        if st["status"] != "COMPLETED":
            print(json.dumps(st, indent=2))
            raise SystemExit(f"generation FAILED: {st['error']}")

        metrics = wait_http(f"http://127.0.0.1:{args.model_port}/metrics")
        # the result path is the model server's (shared filesystem here,
        # like the reference's shared volume) — also download through the
        # API to prove the transfer path
        video_path = st["result"]["video_path"]
        dl_ok = None
        rel = os.path.relpath(video_path, workdir)
        if not rel.startswith(".."):
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{args.api_port}/api/download/{rel}",
                    timeout=600) as r:
                dl_ok = len(r.read())
        summary = {"request_wall_s": round(request_wall, 1),
                   "video_path": video_path,
                   "video_bytes": os.path.getsize(video_path),
                   "download_bytes": dl_ok,
                   "stage_profile_s":
                       metrics.get("last_generation_stage_profile_s"),
                   "step_ms": metrics.get("last_generation_step_ms")}
        print(json.dumps(summary), flush=True)
        with open(os.path.join(args.out, "serving_drive.json"), "w") as f:
            json.dump(summary, f, indent=2)
    finally:
        for pr in procs:
            pr.terminate()
        for pr in procs:
            try:
                pr.wait(timeout=30)
            except subprocess.TimeoutExpired:
                pr.kill()


if __name__ == "__main__":
    main()
