"""Offset-sharding scaling harness (BASELINE.json configs 3-4).

Measures the sharded sweep across mesh sizes.  On real multi-chip hardware
this reports true scaling efficiency; on a single host it can still run the
virtual-CPU-mesh ladder to validate the sharded program at every mesh size
(numbers then reflect core contention, not chip scaling — flagged in output).

Timing methodology matches bench.py: K sweeps chained inside one jitted
fori_loop with per-iteration input perturbation, result materialized
(per-dispatch timing through the remote-TPU tunnel is unreliable, and a
fresh shard_map trace per call would otherwise dominate small workloads).

`--mode serve` ladders the mesh-sharded exact batch SERVING path instead
(models/batch.batched_search_exact_sharded's device program): fixed global
batch, query axis sharded over 1..N devices, reported as queries/s.

Usage: python benchmarks/scaling.py [--n1 100000] [--n2 10000]
       [--devices 1,2,4,8] [--platform cpu|tpu] [--mode sweep|serve]
       [--batch 64] [--bn1 512] [--bn2 128]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

_VIRTUAL_NOTE = (
    "VIRTUAL MESH: N XLA host devices share this machine's CPU cores, so "
    "the efficiency column measures core contention, NOT real multi-chip "
    "scaling. It validates that the sharded program compiles and produces "
    "identical results at every mesh size; throughput/efficiency claims "
    "require real chips (shards are independent; the merge is O(k) ints).")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n1", type=int, default=100_000)
    ap.add_argument("--n2", type=int, default=10_000)
    ap.add_argument("--devices", default=None,
                    help="comma list of mesh sizes (default: 1..device_count)")
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"],
                    help="cpu = force an 8-device virtual host mesh; "
                         "tpu/default = whatever JAX resolves")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--mode", default="sweep",
                    choices=["sweep", "serve", "ladder"])
    ap.add_argument("--batch", type=int, default=64,
                    help="serve mode: global batch (must divide every mesh "
                         "size)")
    ap.add_argument("--bn1", type=int, default=512)
    ap.add_argument("--bn2", type=int, default=128)
    args = ap.parse_args()

    if args.platform == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

        if args.platform == "tpu" and jax.default_backend() != "tpu":
            log("[scaling] error: --platform tpu requested but default "
                f"backend is {jax.default_backend()}")
            return 2

    import jax.numpy as jnp

    from psa_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from psa_tpu.core.alphabet import encode
    from psa_tpu.core.tables import build_tables
    from psa_tpu.parallel.mesh import make_mesh, make_sharded_stats_fn, pad_for_mesh
    from psa_tpu.utils.generator import random_sequences

    ndev = jax.device_count()
    sizes = ([int(x) for x in args.devices.split(",")] if args.devices
             else [d for d in (1, 2, 4, 8, 16, 32) if d <= ndev])
    if args.mode == "ladder":
        # single-chip proxy: shard sizes are workload divisions, not meshes
        return shard_ladder(args, sizes)
    for d in sizes:
        if d > ndev:
            log(f"[scaling] error: mesh size {d} > available devices {ndev}")
            return 2
    if args.mode == "serve":
        return serve_ladder(args, sizes)

    n1, n2 = args.n1, args.n2
    tables = build_tables(np.array([1.0, 3.0, 4.0, 2.0]), False)
    seq1, seq2 = random_sequences(n1, n2, seed=0)
    c1, c2 = encode(seq1), encode(seq2)
    pair_evals = float(n1 - n2 + 1) * n2
    platform = jax.devices()[0].platform
    log(f"[scaling] platform={platform} devices={ndev} workload {n1}x{n2} "
        f"({pair_evals:.3g} pair-evals)")

    results = []
    base_rate = None
    for d in sizes:
        mesh = make_mesh(jax.devices()[:d])
        c1p, c2p, noff = pad_for_mesh(c1, c2, d)
        a, b = jnp.asarray(c1p), jnp.asarray(c2p)
        stats_fn = make_sharded_stats_fn(tables, mesh, c1p.shape[0],
                                         c2p.shape[0])

        @functools.partial(jax.jit, static_argnames=("k",))
        def chained(a, b, k, stats_fn=stats_fn):
            def body(i, acc):
                bx = jnp.roll(b, i)  # perturb: defeat dispatch dedup
                s = stats_fn(a, bx)
                return acc + s[0, 0] + s[-1, 4]
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        t0 = time.perf_counter()
        np.asarray(chained(a, b, args.iters))
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(chained(a, b, args.iters))
        dt = (time.perf_counter() - t0) / args.iters
        rate = pair_evals / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * d / sizes[0])
        results.append({"devices": d, "seconds": dt, "pair_evals_per_sec": rate,
                        "scaling_efficiency": eff})
        log(f"[scaling] {d} dev: {dt*1e3:8.1f} ms/sweep  {rate:.3g} evals/s  "
            f"eff={eff:.2f} (first call {t_first:.1f}s)")

    print(json.dumps({
        "metric": "offset_sharding_scaling",
        "platform": platform,
        "virtual_mesh": platform == "cpu",
        **({"note": _VIRTUAL_NOTE} if platform == "cpu" else {}),
        "workload": {"n1": n1, "n2": n2},
        "results": results,
    }))
    return 0


def shard_ladder(args, sizes) -> int:
    """Single-chip proxy for real multi-chip scaling (VERDICT r3 #3).

    The offset-sharded program has NO cross-shard compute: each chip sweeps
    a contiguous noff/N block independently (parallel/mesh.py shard_map +
    per-shard dynamic_slice, the analog of cpu_funcs.c:128-133), and the
    merge combines N checkable-exact top-k candidate blocks — O(N*k) ints.
    So real N-chip time is bounded by

        T_shard(noff/N)   (measured HERE on one real chip,
                           chained-materialized, the production kernel)
      + T_merge(N)        (measured host-side exact selection over N*k
                           candidates)
      + allgather of N*(k*6) int32 — a few KB over ICI, negligible.

    Unlike the virtual-CPU-mesh ladder (which measures core contention and
    carries no scaling signal), every term here is hardware-measured or
    provably tiny.  Disclaimed as a single-chip proxy in the output.
    """
    import functools

    import jax
    import jax.numpy as jnp

    from psa_tpu.core.alphabet import encode
    from psa_tpu.core.tables import build_tables
    from psa_tpu.ops import pallas_sweep as ps
    from psa_tpu.utils.generator import random_sequences

    n1, n2 = args.n1, args.n2
    platform = jax.devices()[0].platform
    interpret = platform != "tpu"
    tables = build_tables(np.array([1.0, 3.0, 4.0, 2.0]), False)
    seq1, seq2 = random_sequences(n1, n2, seed=0)
    c1, c2 = encode(seq1), encode(seq2)
    _, noff_pad, l2p, _ = ps.plan_shapes(n1, n2)
    pair_evals = float(n1 - n2 + 1) * n2
    log(f"[scaling] shard ladder: platform={platform} {n1}x{n2} "
        f"noff_pad={noff_pad} l2p={l2p}")

    # --- per-shard device sweep at noff_pad/N ------------------------------
    shard_rows = []
    for d in sizes:
        if noff_pad % (d * 512):
            log(f"[scaling] skip N={d}: noff_pad {noff_pad} not divisible "
                f"into 512-multiples")
            continue
        noff_n = noff_pad // d
        l1k_n = noff_n + l2p
        c1_shard = c1[: min(c1.shape[0], noff_n + n2 - 1)]
        a, b = ps._prepare(jnp.asarray(c1_shard), jnp.asarray(c2),
                           jnp.asarray(tables.code), l1k_n, l2p)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chained(aa, bb, k, noff_n=noff_n):
            def body(i, acc):
                bb_i = jnp.roll(bb, i, axis=-1)   # defeat dispatch dedup
                out = ps._sweep_pallas(aa, bb_i, noff_n, l2p // ps.CHUNK,
                                       interpret, with_valid=False)
                return acc + out[0, 0] + out[4, -1]
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        t0 = time.perf_counter()
        np.asarray(chained(a, b, args.iters))
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(chained(a, b, args.iters))
        dt = (time.perf_counter() - t0) / args.iters
        shard_rows.append({"devices": d, "shard_noff_pad": noff_n,
                           "t_shard_ms": dt * 1e3})
        log(f"[scaling] N={d}: shard sweep {dt*1e3:8.2f} ms "
            f"(noff/N={noff_n}, first call {t_first:.1f}s)")

    # --- host merge cost over N*k candidates -------------------------------
    from psa_tpu.models.batch import TOPK
    from psa_tpu.ops.select import pick_from_candidates

    rng = np.random.default_rng(0)
    merge_ms = {}
    reps = 20
    for d in sizes:
        cands = [np.sort(rng.choice(n1 - n2 + 1, size=d * TOPK,
                                    replace=False)) for _ in range(reps)]
        pick_from_candidates(c1, c2, tables, cands[0])  # warm (builds lib)
        best = float("inf")
        for cand in cands:
            t0 = time.perf_counter()
            pick_from_candidates(c1, c2, tables, cand)
            best = min(best, time.perf_counter() - t0)
        merge_ms[d] = best * 1e3
        log(f"[scaling] N={d}: host merge of {d}x{TOPK} candidates "
            f"{merge_ms[d]:.3f} ms")

    # --- predicted scaling --------------------------------------------------
    # efficiency is relative to the FIRST measured ladder rung (devices d0,
    # normally 1); with --devices excluding 1 the field name and baseline
    # record say so instead of silently mislabeling
    results = []
    d0 = shard_rows[0]["devices"] if shard_rows else 1
    eff_field = ("predicted_efficiency_vs_1chip" if d0 == 1
                 else f"predicted_efficiency_vs_{d0}chip_baseline")
    # canonical T(d0) / ((d/d0) * T(d)) with T = shard sweep + merge on
    # BOTH sides, so the baseline rung reports exactly 1.0
    base_ms = shard_rows[0]["t_shard_ms"] + merge_ms[d0] if shard_rows else 0
    for row in shard_rows:
        d = row["devices"]
        pred_ms = row["t_shard_ms"] + merge_ms[d]
        rate = pair_evals / (pred_ms * 1e-3)
        eff = base_ms * d0 / (d * pred_ms)
        results.append({**row, "t_merge_ms": round(merge_ms[d], 3),
                        "predicted_total_ms": round(pred_ms, 3),
                        "predicted_pair_evals_per_sec": rate,
                        eff_field: round(eff, 4)})
        log(f"[scaling] N={d}: predicted total {pred_ms:.2f} ms  "
            f"({rate:.3g} evals/s aggregate, eff={eff:.3f})")

    print(json.dumps({
        "metric": "shard_ladder_scaling_proxy",
        "platform": platform,
        "single_chip_proxy": True,
        "note": ("SINGLE-CHIP PROXY: T_shard(noff/N) measured on one real "
                 "chip (chained-materialized, production kernel); merge = "
                 "measured host-side exact selection over N*top-k "
                 "candidates; the N-chip allgather of N*(k*6) int32 over "
                 "ICI is not included (a few KB, negligible).  Shards are "
                 "independent — no cross-shard compute exists — so this "
                 "bounds real N-chip time; it cannot capture pod-level "
                 "effects (per-chip clock/power variation, host fan-out)."),
        "workload": {"n1": n1, "n2": n2, "noff_pad": noff_pad, "topk": TOPK},
        "results": results,
    }))
    return 0


def serve_ladder(args, sizes) -> int:
    """Queries/s of the mesh-sharded exact-batch device program vs mesh
    size (fixed global batch = strong scaling)."""
    import functools

    import jax
    import jax.numpy as jnp

    from psa_tpu.core.alphabet import encode, pad_codes
    from psa_tpu.core.tables import build_tables
    from psa_tpu.models.batch import (make_batched_fused_sharded_runner,
                                      pack_query_inputs)
    from psa_tpu.ops.pallas_sweep import plan_shapes
    from psa_tpu.parallel.mesh import make_mesh
    from psa_tpu.utils.generator import random_sequences

    B, n1, n2 = args.batch, args.bn1, args.bn2
    for d in sizes:
        if B % d:
            log(f"[scaling] error: --batch {B} not divisible by mesh {d}")
            return 2
    platform = jax.devices()[0].platform
    interpret = platform != "tpu"
    tables = build_tables(np.array([1.0, 3.0, 4.0, 2.0]), False)
    _, noff_pad, l2p, l1k = plan_shapes(n1, n2)
    seqs = [random_sequences(n1, n2, seed=s) for s in range(B)]
    c1b = np.stack([pad_codes(encode(a), l1k) for a, _ in seqs])
    c2b = np.stack([pad_codes(encode(b), l2p) for _, b in seqs])
    noffs = np.full(B, n1 - n2 + 1, np.int32)
    inbuf = jnp.asarray(pack_query_inputs(c1b, c2b, noffs))
    log(f"[scaling] serve mode: platform={platform} B={B} {n1}x{n2} "
        f"(l1k={l1k}, l2p={l2p})")

    results = []
    base_rate = None
    for d in sizes:
        mesh = make_mesh(jax.devices()[:d], axis="dp")
        run = make_batched_fused_sharded_runner(tables, B, l1k, l2p, mesh,
                                                interpret)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chained(buf, k, run=run):
            def body(i, acc):
                bufx = buf.at[0, 0].set(      # defeat dispatch dedup
                    ((buf[0, 0].astype(jnp.int32) + i) % 27).astype(
                        buf.dtype))
                out = run(bufx)
                return acc + out[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.int32(0))

        t0 = time.perf_counter()
        np.asarray(chained(inbuf, args.iters))
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(chained(inbuf, args.iters))
        dt = (time.perf_counter() - t0) / args.iters
        rate = B / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * d / sizes[0])
        results.append({"devices": d, "seconds": dt,
                        "queries_per_sec": rate,
                        "scaling_efficiency": eff})
        log(f"[scaling] {d} dev: {dt*1e3:8.1f} ms/batch  {rate:.0f} q/s  "
            f"eff={eff:.2f} (first call {t_first:.1f}s)")

    print(json.dumps({
        "metric": "serve_sharding_scaling",
        "platform": platform,
        "virtual_mesh": platform == "cpu",
        **({"note": _VIRTUAL_NOTE} if platform == "cpu" else {}),
        "workload": {"batch": B, "n1": n1, "n2": n2},
        "results": results,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
