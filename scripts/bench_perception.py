"""Neural perception stack at REAL scale on silicon (VERDICT r3 #4).

The SAM2/GroundingDINO/MoGe JAX ports were HF-parity-validated at tiny
configs; this measures whether they COMPILE and how fast they RUN on the
v5e at the reference's production scales with random converted-layout
weights (no checkpoints ship in this environment — compile/memory/latency
behavior is weight-independent):

- SAM2 Hiera-LARGE at 1024x1024, box-prompted masks
  (grounded_sam2_infer.py:188-194 path; config sam2.1_hiera_l);
- GroundingDINO Swin-T + BERT-base, 900 queries, at the segmenter's
  det_size=896 letterbox (grounded_sam2_infer.py:143-150 path) — weights
  random-initialized through the HF model and run through the repo's
  converter, so the real-scale conversion itself is exercised too;
- MoGe ViT-L (DINOv2 backbone) + full head at the demo frame size padded
  to the patch multiple (moge-v2_infer.py:17-222 path).

Per model prints one JSON line: compile_s (first call) + steady ms/call
(host-read drained — axon block_until_ready can return early).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_perception.py
       [--models sam2,gdino,moge] [--tiny]
"""

import argparse
import json
import time


def _drain(x):
    import jax.numpy as jnp
    return float(jnp.abs(jnp.asarray(x)).astype(jnp.float32).sum())


def _timed(tag, fn, iters=3, **extra):
    t0 = time.perf_counter()
    fn()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({"metric": f"perception_{tag}",
                      "compile_s": round(compile_s, 1),
                      "steady_ms": round(ms, 1), **extra}), flush=True)


def bench_sam2(tiny: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from versecrafter_tpu.perception import sam2

    cfg = sam2.TEST_TINY if tiny else sam2.HIERA_LARGE
    size = cfg["image_size"]
    params = jax.jit(lambda k: sam2.init_sam2(k, cfg, jnp.float32))(
        jax.random.key(0))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, size, size, 3)), jnp.float32)
    boxes = jnp.asarray([[[0.1 * size, 0.1 * size, 0.6 * size, 0.7 * size],
                          [0.3 * size, 0.2 * size, 0.9 * size, 0.8 * size]]],
                        jnp.float32)

    def run():
        masks, iou, _ = sam2.predict_boxes_jit(params, cfg, img, boxes,
                                               multimask_output=True)
        _drain(iou)

    _timed("sam2_hiera_" + ("tiny" if tiny else "large_1024"), run,
           image_size=size, boxes=2)


def bench_gdino(tiny: bool, bf16: bool = False):
    import jax.numpy as jnp
    import numpy as np
    import torch
    import transformers

    from versecrafter_tpu.perception import gdino_hf

    if tiny:
        det, cfg_kw = 128, {}
        swin = transformers.SwinConfig(
            image_size=64, patch_size=4, embed_dim=16, depths=[1, 2, 1],
            num_heads=[1, 2, 2], window_size=2, out_indices=[1, 2, 3])
        bert = transformers.BertConfig(
            vocab_size=2000, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=64)
        hf_cfg = transformers.GroundingDinoConfig(
            backbone_config=swin, text_config=bert, d_model=32,
            encoder_layers=2, decoder_layers=2, encoder_attention_heads=4,
            decoder_attention_heads=4, encoder_ffn_dim=64,
            decoder_ffn_dim=64, num_queries=10, max_text_len=16,
            positional_embedding_temperature=20)
        cfg = dict(d_model=32, enc_heads=4, dec_heads=4, fusion_heads=2,
                   enc_points=4, dec_points=4, num_queries=10,
                   max_text_len=16, pos_temperature=20.0, swin_patch=4,
                   swin_window=2, swin_heads=(1, 2, 2),
                   swin_out_stages=(0, 1, 2), bert_heads=2)
    else:
        det = 896  # the segmenter's production letterbox (segmenter.py:60)
        hf_cfg = gdino_hf.hf_swint_config()
        cfg = dict(gdino_hf.SWINT_CFG)

    torch.manual_seed(0)
    t0 = time.perf_counter()
    hf = transformers.GroundingDinoForObjectDetection(hf_cfg).eval()
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    params = gdino_hf.convert_hf_gdino(hf.state_dict(), cfg, dtype=dtype)
    build_s = time.perf_counter() - t0
    del hf

    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((1, 3, det, det)), jnp.float32)
    ids = np.array([[101, 2711, 1012, 2482, 1012, 102]], np.int64)

    def run():
        logits, boxes = gdino_hf.gdino_forward_jit(params, cfg, px, ids)
        _drain(logits)

    _timed("gdino_swin" + ("_tiny" if tiny else "t_896")
           + ("_bf16" if bf16 else ""), run,
           det_size=det, build_s=round(build_s, 1))


def bench_moge(tiny: bool):
    import jax
    import numpy as np

    from versecrafter_tpu.perception import moge

    kw = (dict(vit_kwargs=dict(patch=14, dim=32, depth=2, heads=2))
          if tiny else {})
    params = moge.init_moge(jax.random.key(0), **kw)
    h, w = (126, 126) if tiny else (490, 840)  # demo 480x832 padded to /14
    rng = np.random.default_rng(0)
    img = rng.random((h, w, 3)).astype(np.float32)

    def run():
        out = moge.infer(params, img)
        float(np.abs(out["depth"]).sum())

    _timed("moge_vit" + ("_tiny" if tiny else "l_490x840"), run,
           image=f"{h}x{w}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="sam2,gdino,moge")
    ap.add_argument("--tiny", action="store_true",
                    help="wiring smoke on CPU at toy scale")
    ap.add_argument("--bf16", action="store_true",
                    help="gdino: bf16 weights/activations (halves gather "
                         "traffic, 2x MXU rate; locations/softmax stay f32)")
    args = ap.parse_args()

    import jax
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    from versecrafter_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    for m in args.models.split(","):
        try:
            if m == "gdino":
                bench_gdino(args.tiny, bf16=args.bf16)
                continue
            {"sam2": bench_sam2,
             "moge": bench_moge}[m](args.tiny)
        except Exception as e:  # noqa: BLE001 — report, keep benching
            print(json.dumps({"metric": f"perception_{m}",
                              "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
