"""Engine configuration.

The reference hard-codes its knobs as #defines (def.h:4-48: thread count,
file paths, size caps) plus one runtime flag.  Here everything is a dataclass
with environment overrides, and the reference's hard size caps are gone —
shapes are bucketed, not bounded (SURVEY.md §7.2).
"""

from __future__ import annotations

import dataclasses
import os


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


@dataclasses.dataclass
class EngineConfig:
    # Pallas sweep kernel
    # (seq2 pads to multiples of 128; the kernel internally re-chunks to the
    # largest supported chunk <= MAX_CHUNK=256, see ops/pallas_sweep.pick_chunk)
    # max offsets per grid program; tiles above 4096 raise the Mosaic
    # scoped-VMEM limit (ops/pallas_sweep._compiler_params) — bigger tiles
    # amortize the chunk-window overlap and per-tile epilogue (measured
    # 3.64/3.46/3.47/3.40 ms per 131072x8192 sweep at 4096/8192/16384/32768)
    tile_offsets: int = _env_int("PSA_TILE_OFFSETS", 32768)
    max_l1_vmem: int = _env_int("PSA_MAX_L1_VMEM", 256 * 1024)

    # padding buckets
    bucket_floor: int = _env_int("PSA_BUCKET_FLOOR", 512)

    # host selection
    max_candidates: int = _env_int("PSA_MAX_CANDIDATES", 4096)

    # `auto` backend crossover (pair-evals): below this the native host
    # engine runs the query without touching XLA — the reference's
    # workload-aware CPU/GPU split (cpu_funcs.c:135-142) recalibrated for
    # TPU dispatch/compile costs (native does ~2e9 pair-evals/s; a cold
    # Mosaic compile costs 30-700s through the device tunnel).
    auto_threshold: int = _env_int("PSA_AUTO_THRESHOLD", 200_000_000)

    # batched serving: queries stream through the device in fixed-size
    # microbatches (padded up to the next power of two, capped here) so one
    # compiled batch program serves ANY workload size — the fused runner
    # is specialized on B, so unbounded batch sizes would mean one Mosaic
    # compile per distinct B.  Microbatching also enables the 2-deep
    # dispatch pipeline (host selection of batch i overlaps device compute
    # of batch i+1).
    micro_batch: int = _env_int("PSA_MICRO_BATCH", 1024)

    # serve-loop pipeline depth: dispatched-but-uncollected batches.  2
    # overlaps the fetch RPC with device compute + host work and measured
    # equivalent to deeper on a healthy tunnel (r3); under degraded RPC
    # latency (fetches of 300-500 ms) deeper keeps the device fed.
    serve_inflight: int = _env_int("PSA_SERVE_INFLIGHT", 2)

    # accelerator health probe deadline (seconds) for the `auto` backend
    # and bench.py — device init through a dead remote tunnel otherwise
    # retries forever (utils/health.py)
    probe_deadline: int = _env_int("PSA_PROBE_DEADLINE", 240)

    # defaults mirroring the reference CLI contract (def.h:20-21)
    default_input: str = "./input.txt"
    default_output: str = "./output.txt"

    # backend resolution
    default_backend: str = os.environ.get("PSA_BACKEND", "auto")


CONFIG = EngineConfig()
