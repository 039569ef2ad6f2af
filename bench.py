"""Benchmark harness.

Prints ONE JSON line with the primary metric:
    pair evaluations / second / chip  (offset x position table evaluations)

This is BASELINE.json's north-star throughput metric.  `vs_baseline` divides
by an estimated ceiling for the reference CUDA kernel (cuda_funcs.cu:149-199)
of 5e8 pair-evals/s — a generous figure for its one-block-per-offset grid with
per-thread substitution scans on the era-appropriate GPU (the reference
publishes no measured numbers; see BASELINE.md).

Usage:  python bench.py [--quick] [--engine pallas|conv] [--json-only]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

REF_BASELINE_PAIR_EVALS_PER_S = 5.0e8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_sweep(engine: str, n1: int, n2: int, iters: int, seed: int = 0):
    """Time the warm device sweep.

    Timing methodology: K sweeps are CHAINED inside one jitted fori_loop with
    per-iteration input perturbation, and the result is materialized to the
    host. Per-dispatch timing through the remote-TPU tunnel is unreliable
    (async futures report ~0 and identical dispatches can be deduplicated);
    chained-materialized timing matches physics.
    """
    import functools

    import jax
    import jax.numpy as jnp

    from psa_tpu.core.alphabet import encode
    from psa_tpu.core.tables import build_tables
    from psa_tpu.utils.generator import random_sequences

    tables = build_tables(np.array([1.0, 3.0, 4.0, 2.0]), False)
    seq1, seq2 = random_sequences(n1, n2, seed=seed)
    c1, c2 = encode(seq1), encode(seq2)
    noff = n1 - n2 + 1

    if engine == "pallas":
        from psa_tpu.ops import pallas_sweep as ps

        noff_, noff_pad, l2p, l1k = ps.plan_shapes(n1, n2)
        interpret = jax.default_backend() != "tpu"
        a, b = ps._prepare(jnp.asarray(c1), jnp.asarray(c2),
                           jnp.asarray(tables.code), l1k, l2p)

        def one(aa, bb):
            # with_valid=False is the production configuration for clean
            # inputs (offset_stats_pallas skips the valid-count mask and
            # reconstructs cls3 on the host as n2 - rest)
            out = ps._sweep_pallas(aa, bb, noff_pad, l2p // ps.CHUNK, interpret,
                                   with_valid=False)
            return out[0, 0] + out[4, -1]
    elif engine == "conv":
        from psa_tpu.ops.common import pad_query
        from psa_tpu.ops.engine_conv import _sweep_conv

        c1p, c2p, _ = pad_query(c1, c2)
        a, b = jnp.asarray(c1p), jnp.asarray(c2p)
        code_tab = jnp.asarray(tables.code)

        def one(aa, bb):
            counts, maxrank = _sweep_conv(aa, bb, code_tab, tables.num_ranks)
            return counts[0, 0] + maxrank[-1]
    elif engine == "native":
        # host C++/OpenMP engine: no chaining needed (no dispatch RPCs)
        from psa_tpu.models.search import AlignmentSearchEngine

        eng = AlignmentSearchEngine(tables.weights, tables.is_max,
                                    backend="native")
        eng.search_codes(c1, c2)                      # warm (builds the lib)
        t0 = time.perf_counter()
        for _ in range(iters):
            eng.search_codes(c1, c2)
        dt = (time.perf_counter() - t0) / iters
        pair_evals = float(noff) * float(n2)
        rate = pair_evals / dt
        log(f"[bench] native {n1}x{n2}: {dt*1e3:.2f} ms/sweep, "
            f"{pair_evals:.3g} pair-evals, {rate:.3g} evals/s")
        return rate, dt, pair_evals
    else:
        raise ValueError(engine)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chained(aa, bb, k):
        def body(i, acc):
            bb_i = jnp.roll(bb, i, axis=-1)  # defeat any dispatch dedup
            return acc + one(aa, bb_i)
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    t0 = time.perf_counter()
    np.asarray(chained(a, b, iters))
    compile_and_first = time.perf_counter() - t0
    log(f"[bench] {engine} first chained call (compile+{iters} sweeps): "
        f"{compile_and_first:.1f}s")

    t0 = time.perf_counter()
    np.asarray(chained(a, b, iters))
    dt = (time.perf_counter() - t0) / iters

    pair_evals = float(noff) * float(n2)
    rate = pair_evals / dt
    log(f"[bench] {engine} {n1}x{n2}: {dt*1e3:.2f} ms/sweep, "
        f"{pair_evals:.3g} pair-evals, {rate:.3g} evals/s")
    return rate, dt, pair_evals


def bench_golden(engine: str):
    """End-to-end golden workload: parse -> search -> format, parity-checked."""
    from psa_tpu.models.search import AlignmentSearchEngine
    from psa_tpu.utils.io import format_output, read_input

    q = read_input("/root/reference/input.txt")
    eng = AlignmentSearchEngine(q.weights, q.is_max, backend=engine)
    eng.search(q.seq1, q.seq2)  # warm
    t0 = time.perf_counter()
    res = eng.search(q.seq1, q.seq2)
    dt = time.perf_counter() - t0
    got = format_output(res.mutant(q.seq2), res.offset, res.score)
    want = open("/root/reference/output.txt").read()
    ok = got == want
    log(f"[bench] golden e2e ({engine}): {dt*1e3:.1f} ms, parity={'OK' if ok else 'FAIL'}")
    return dt, ok


def bench_serve_host(b: int = 512, n1: int = 2048, n2: int = 512):
    """Deterministic host-side serving cost: parse + validate + encode +
    wire-pack one serve chunk, no device involved (the direct-attach
    serving ceiling; the native wire path when available).  Best of 3,
    us/query."""
    try:
        from psa_tpu.core.alphabet import encode_batch_padded
        from psa_tpu.models.batch import pack_query_inputs
        from psa_tpu.ops.pallas_sweep import plan_shapes
        from psa_tpu.utils.generator import random_sequences
        from psa_tpu.utils.io import Query, parse_query_lines

        lines = []
        for i in range(b):
            s1, s2 = random_sequences(n1, n2, seed=i)
            lines.append(f"1 3 4 2 {s1} {s2} minimum")
        _, _, l2p, l1k = plan_shapes(n1, n2)
        noffs = np.full(b, n1 - n2 + 1, np.int32)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            qs = [q for q in parse_query_lines(lines) if isinstance(q, Query)]
            c1b = encode_batch_padded([q.seq1 for q in qs], l1k)
            c2b = encode_batch_padded([q.seq2 for q in qs], l2p)
            pack_query_inputs(c1b, c2b, noffs)
            best = min(best, time.perf_counter() - t0)
        us = best * 1e6 / b
        log(f"[bench] serve host dispatch side ({b}x {n1}x{n2}): "
            f"{us:.1f} us/query")
        return round(us, 2)
    except Exception as e:  # noqa: BLE001 - a detail field, never fatal
        log(f"[bench] serve host bench failed: {type(e).__name__}: {e}")
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--engine", default=None,
                    choices=[None, "pallas", "conv", "native"])
    args = ap.parse_args()

    # Bounded device-init probe: a dead remote tunnel otherwise retries init
    # forever and would hang the whole benchmark run (utils/health.py).
    from psa_tpu.utils.health import effective_platform, was_degraded

    effective_platform()
    degraded = None
    if was_degraded():
        log("[bench] accelerator unreachable — degraded CPU run")
        degraded = "accelerator_unreachable"
        from psa_tpu.models.search import native_available

        if not native_available():
            args.quick = True      # interpret/conv on CPU: keep shapes small
        # (the native engine costs no compile/RPC: full shape is fine)
        # the repo's standing real-TPU artifacts (same kernel, measured on
        # chip earlier this round) so a tunnel outage at bench time doesn't
        # erase the recorded hardware numbers
        log("[bench] last known TPU measurements: 3.19-3.23 ms/131072x8192 "
            "sweep = 3.1e11 pair-evals/s (BENCH_r04.json); serving device "
            "path 7.5 us/query at B=1024 of 2048x512 (round 5, "
            "SHARED_DEDUP_r05.json / docs/DESIGN.md §6)")
    import jax

    from psa_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    backend = jax.default_backend()
    if args.engine:
        engine = args.engine
    elif backend == "tpu":
        engine = "pallas"
    else:
        # no accelerator: the native host engine IS the production CPU
        # path (auto routes there); conv stays as the last-resort fallback
        from psa_tpu.models.search import native_available

        engine = "native" if native_available() else "conv"
    log(f"[bench] backend={backend} devices={jax.devices()} engine={engine}")

    # iters amortizes the per-dispatch round trip through the remote-TPU
    # tunnel, whose latency varies (30ms-6s measured); at 48 chained sweeps
    # even a 1s stall adds only ~20us/sweep of noise
    if args.quick:
        n1, n2, iters = 16384, 2048, 16
    else:
        n1, n2, iters = 131072, 8192, 48

    # Always produce the JSON line: fall back through engines if the primary
    # path fails (e.g. a wedged TPU tunnel).
    tried = []
    for eng in dict.fromkeys([engine, "native", "conv"]):
        # an XLA engine on a degraded host must stay at quick shapes even
        # when the native engine ran full-size (CPU conv at the full shape
        # is ~11 s/sweep)
        en1, en2, eit = ((16384, 2048, 16)
                         if degraded and eng != "native" else
                         (n1, n2, iters))
        try:
            rate, dt, pair_evals = bench_sweep(eng, en1, en2, eit)
            n1, n2 = en1, en2
            engine = eng
            break
        except Exception as e:  # noqa: BLE001 - report and fall through
            log(f"[bench] engine {eng} failed: {type(e).__name__}: {e}")
            tried.append(eng)
    else:
        print(json.dumps({
            "metric": "pair_evals_per_sec_per_chip", "value": 0.0,
            "unit": "evals/s", "vs_baseline": 0.0,
            "detail": {"error": f"all engines failed: {tried}"},
        }))
        return

    try:
        golden_dt, golden_ok = bench_golden(engine)
    except Exception as e:  # noqa: BLE001
        log(f"[bench] golden e2e failed: {type(e).__name__}: {e}")
        golden_dt, golden_ok = float("nan"), False

    result = {
        "metric": "pair_evals_per_sec_per_chip",
        "value": rate,
        "unit": "evals/s",
        "vs_baseline": rate / REF_BASELINE_PAIR_EVALS_PER_S,
        "detail": {
            "backend": backend,
            "engine": engine,
            "workload": {"n1": n1, "n2": n2},
            "sweep_ms": dt * 1e3,
            "golden_e2e_ms": golden_dt * 1e3,
            "golden_parity": golden_ok,
            # DOCUMENTED roofline position (docs/DESIGN.md §6) — a property
            # of the kernel formulation, NOT derived from this run: the
            # kernel is bound by VPU elementwise decode passes; the one-hot
            # contraction keeps the MXU ~5% utilized and HBM traffic is ~3
            # orders below bound
            "roofline_doc": {"bound": "vpu", "mxu_util": 0.05,
                             "hbm_util": "negligible",
                             "source": "docs/DESIGN.md#6"},
            "serve_host_dispatch_us_per_query": bench_serve_host(),
            **({"degraded": degraded,
                "last_known_tpu": {
                    "sweep_ms_131072x8192": 3.23,
                    "pair_evals_per_sec": 3.11e11,
                    "artifacts": ["NORTHSTAR_r03.json",
                                  "CAMPAIGN_r03.json"]}}
               if degraded else {}),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
