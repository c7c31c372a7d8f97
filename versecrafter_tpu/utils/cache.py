"""Entry-point runtime setup (persistent XLA compile cache + fast RNG).

The DiT step and the rasterizers take minutes to compile at production
shapes; every CLI/bench/serving process pays that again without a persistent
cache. Call setup_runtime() early (the CLIs, bench.py and the servers do;
enable_persistent_cache remains as a compatibility alias).
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.environ.get(
    "VERSECRAFTER_JAX_CACHE", os.path.expanduser("~/.cache/versecrafter_jax"))


def setup_runtime(path: str = DEFAULT_DIR, fast_rng: bool = True) -> None:
    """Entry-point runtime setup: persistent compile cache + fast RNG.

    fast_rng=True switches the process-global default PRNG to `rbg`:
    threefry call-sites compile pathologically slowly through the axon
    remote AOT helper (measured: umT5-xxl random init 240-570 s vs 12 s
    with rbg). This CHANGES the values drawn for a given seed (still
    deterministic per seed within an environment, which is all the
    random-init smoke models and noise seeds need; real runs load converted
    weights). Pass fast_rng=False or set VERSECRAFTER_THREEFRY=1 to keep
    the jax default — tests don't call this hook and always keep threefry.
    """
    import jax

    maybe_init_distributed()
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # cache EVERYTHING: over the axon tunnel even a 0.4 s eager-op
        # compile is a full remote round trip, and a process dispatches
        # dozens of them before the big programs (measured: the 2 s floor
        # left ~1 min of repeat-run compiles on the table)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        if fast_rng and not os.environ.get("VERSECRAFTER_THREEFRY"):
            jax.config.update("jax_default_prng_impl", "rbg")
    except Exception:  # noqa: BLE001 — older jax without these flags
        pass


def maybe_init_distributed() -> bool:
    """Multi-host initialization (SURVEY §7 step 4: 'multi-host ready via
    jax.distributed' — the TPU-native replacement for the reference's
    torchrun/NCCL world bootstrap, versecrafter_inference.py:271-281).

    Opt-in: runs jax.distributed.initialize() when VERSECRAFTER_MULTIHOST=1
    (TPU pods auto-detect coordinator/process_id from the environment) or
    when the standard JAX_COORDINATOR_ADDRESS[/JAX_NUM_PROCESSES/
    JAX_PROCESS_ID] variables are set. Must run before first backend use —
    setup_runtime() calls it, and every CLI/server entry point calls
    setup_runtime() first thing. After init, jax.devices() spans the pod
    and make_mesh/set_mesh shard exactly as on the single-host virtual
    mesh. Returns True when initialization ran. No-op (False) on single
    hosts and when already initialized."""
    import jax

    want = (os.environ.get("VERSECRAFTER_MULTIHOST") == "1"
            or "JAX_COORDINATOR_ADDRESS" in os.environ)
    if not want:
        return False
    # explicit coordinator env (CPU/GPU clusters, and the 2-process CPU
    # dryrun — __graft_entry__.dryrun_multihost): pass through; TPU pods
    # auto-detect with no arguments
    kwargs = {}
    if "JAX_COORDINATOR_ADDRESS" in os.environ:
        kwargs["coordinator_address"] = os.environ["JAX_COORDINATOR_ADDRESS"]
        if "JAX_NUM_PROCESSES" in os.environ:
            kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        if "JAX_PROCESS_ID" in os.environ:
            kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    try:
        jax.distributed.initialize(**kwargs)
        return True
    except RuntimeError:
        # already initialized (idempotent callers: CLI + factory + server)
        return False


# Backwards-compatible alias. The RNG switch made the old name misleading
# (ADVICE r2): a "cache" helper that changes seed semantics; setup_runtime
# says what it does.
enable_persistent_cache = setup_runtime
