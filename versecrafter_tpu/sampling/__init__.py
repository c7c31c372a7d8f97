from versecrafter_tpu.sampling.schedulers import (
    FlowMatchEuler,
    FlowUniPC,
    FlowDPMpp,
    make_scheduler,
    shifted_sigmas,
)
