from versecrafter_tpu.models.wan_dit import (
    init_wan_dit,
    wan_dit_forward,
    wan_dit_embed,
    wan_dit_blocks,
    wan_dit_head,
    patchify,
    unpatchify,
    sinusoidal_embedding_1d,
)
