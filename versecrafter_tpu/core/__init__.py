from versecrafter_tpu.core.config import (
    WanDiTConfig,
    VAEConfig,
    T5Config,
    SchedulerConfig,
    PipelineConfig,
    ParallelConfig,
    load_yaml_config,
    WAN21_14B,
    WAN21_1_3B,
)
from versecrafter_tpu.core.mesh import make_mesh, MeshSpec
