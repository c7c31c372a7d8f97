"""VerseCrafter-TPU: a TPU-native controllable video world-model framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference
VerseCrafter stack (frozen Wan2.1 video DiT + GeoAdapter control branch +
flow-matching sampling + 4D control-map rendering + perception preprocessing
+ serving), built for TPU meshes:

- compute path: jit/pjit + Pallas kernels (flash attention with fused RoPE,
  rasterization), bf16 on the MXU, fp32 for norms/time embeddings
- parallelism: one `jax.sharding.Mesh` with (dp, fsdp, sp, tp) axes; sequence
  parallelism is GSPMD sharding + ring/all-to-all collectives over ICI instead
  of the reference's monkey-patched NCCL USP
- serving: host-side RPC control plane (no collective-based heartbeats)

Layer map mirrors SURVEY.md section 1; see subpackage docstrings for the
reference files each component re-implements.
"""

__version__ = "0.1.0"
