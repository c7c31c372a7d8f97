from versecrafter_tpu.kernels.rope import (
    rope_axis_angles,
    rope_3d_angles,
    grid_cos_sin,
    apply_rope,
)
from versecrafter_tpu.kernels.norms import rms_norm, layer_norm
from versecrafter_tpu.kernels.flash_attention import flash_attention, attention_reference
