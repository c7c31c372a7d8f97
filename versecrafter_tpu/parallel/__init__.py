from versecrafter_tpu.parallel.sharding import (
    mesh_context,
    current_mesh,
    shard_dit_params,
    constrain_tokens,
    ulysses_attention,
    sp_cross_attention,
)
