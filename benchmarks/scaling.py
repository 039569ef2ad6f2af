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
    ap.add_argument("--mode", default="sweep", choices=["sweep", "serve"])
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
