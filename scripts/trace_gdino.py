"""Device-trace the jitted GDINO forward at the production 896 letterbox
and aggregate per-op time — answers WHERE the post-gather-fold 267 ms/img
goes (VERDICT r4 #5: target <=150 ms or a documented floor). The reference
consumes MSDeformAttn through Grounded-SAM-2 (grounded_sam2_infer.py:28-31).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/trace_gdino.py
Then:  python scripts/analyze_xplane.py /tmp/gdino_trace
"""

import json
import time


def main():
    import numpy as np
    import torch
    import transformers

    from versecrafter_tpu.utils.cache import setup_runtime
    setup_runtime()
    import jax
    import jax.numpy as jnp

    from versecrafter_tpu.perception import gdino_hf

    det = 896
    hf_cfg = gdino_hf.hf_swint_config()
    cfg = dict(gdino_hf.SWINT_CFG)
    torch.manual_seed(0)
    hf = transformers.GroundingDinoForObjectDetection(hf_cfg).eval()
    params = gdino_hf.convert_hf_gdino(hf.state_dict(), cfg)
    del hf

    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((1, 3, det, det)), jnp.float32)
    ids = np.array([[101, 2711, 1012, 2482, 1012, 102]], np.int64)

    def run():
        logits, boxes = gdino_hf.gdino_forward_jit(params, cfg, px, ids)
        return float(jnp.abs(logits).astype(jnp.float32).sum())

    run()  # compile
    t0 = time.perf_counter()
    run()
    print(json.dumps({"steady_ms": round((time.perf_counter() - t0) * 1e3, 1)}),
          flush=True)

    out_dir = "/tmp/gdino_trace"
    jax.profiler.start_trace(out_dir)
    for _ in range(2):
        run()
    jax.profiler.stop_trace()
    print(json.dumps({"trace": "gdino_896", "dir": out_dir}), flush=True)

    try:
        import subprocess
        import sys
        subprocess.run([sys.executable, "scripts/analyze_xplane.py", out_dir],
                       check=False)
    except Exception as e:  # pragma: no cover
        print("analyze failed:", e)


if __name__ == "__main__":
    main()
