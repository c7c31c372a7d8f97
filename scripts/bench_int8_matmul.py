"""int8 vs bf16 matmul throughput on the v5e MXU.

The v5e datasheet rates int8 at ~394 TOPS vs ~197 bf16 TF/s. This
microbench verifies XLA actually lowers s8 x s8 -> s32 dots to the int8
MXU path at the DiT block-matmul shapes, and measures the END-TO-END W8A8
pattern (dynamic per-tensor activation quantize + dot + rescale,
utils.quantize.int8_compute_dot) whose overhead decides whether
tag_int8_compute wins at step level.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_int8_matmul.py
"""

import json
import time

import jax
import jax.numpy as jnp

from versecrafter_tpu.utils.cache import setup_runtime
from versecrafter_tpu.utils.quantize import int8_compute_dot, quantize_tree

setup_runtime()


def timed(fn, *a, iters=20):
    out = fn(*a)
    _ = float(jnp.abs(out).astype(jnp.float32).sum())  # force host read
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    _ = float(jnp.abs(out).astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / iters


def main():
    # (M, K, N, tag): 14B FFN-in / qkv at the measured 9,360-tok point,
    # 1.3B FFN-in at the 32,760-tok flagship point
    shapes = [
        (18720, 5120, 13824, "14b_ffn_in_9360tok_cfg2"),
        (18720, 5120, 5120, "14b_qkv_9360tok_cfg2"),
        (65520, 1536, 8960, "1p3b_ffn_in_32760tok_cfg2"),
    ]
    for M, K, N, tag in shapes:
      try:
        kx, kw = jax.random.split(jax.random.key(0))
        x = jax.random.normal(kx, (M, K), jnp.bfloat16)
        w = jax.random.normal(kw, (K, N), jnp.bfloat16)
        flops = 2 * M * K * N

        bf16 = jax.jit(lambda a, b: a @ b)
        t_bf16 = timed(bf16, x, w)

        xq = jnp.clip(jnp.round(x.astype(jnp.float32)), -127, 127).astype(jnp.int8)
        wq = jnp.clip(jnp.round(w.astype(jnp.float32) * 16), -127, 127).astype(jnp.int8)
        i8 = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32))
        t_i8 = timed(i8, xq, wq)

        # full W8A8 path from bf16 activations (what the model runs)
        leaf = quantize_tree({"self_attn": {"q": {"kernel": w.astype(jnp.float32)}}})
        leaf = leaf["self_attn"]["q"]["kernel"]
        leaf = {**leaf, "a_dyn": jnp.zeros((), jnp.float32)}
        w8a8 = jax.jit(lambda a: int8_compute_dot(leaf, a))
        t_w8a8 = timed(w8a8, x)

        print(json.dumps({
            "metric": f"matmul_{tag}",
            "bf16_tflops": round(flops / t_bf16 / 1e12, 1),
            "int8_tops": round(flops / t_i8 / 1e12, 1),
            "w8a8_effective_tflops": round(flops / t_w8a8 / 1e12, 1),
            "bf16_ms": round(t_bf16 * 1e3, 3),
            "int8_ms": round(t_i8 * 1e3, 3),
            "w8a8_ms": round(t_w8a8 * 1e3, 3),
        }), flush=True)
      except Exception as e:  # noqa: BLE001 — unattended queue run
        print(json.dumps({"metric": f"matmul_{tag}",
                          "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
