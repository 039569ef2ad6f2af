"""North-star workload harness (BASELINE.md): 100k-char Seq1, 10k-char Seq2.

This exceeds the reference's hard caps (def.h:35-38: 10,000 / 5,000) by 10x —
the TPU build's shapes are bucketed, not bounded.  The run goes through the
full production path: offset-axis sharding over every available device
(parallel/mesh.search_sharded, pallas kernel on TPU), exact host selection,
and a parity check of the complete winner tuple against the native
reference-semantics engine.

Emits one JSON line; commit it as NORTHSTAR_r{N}.json for the record.

Usage: python benchmarks/northstar.py [--n1 100000] [--n2 10000] [--iters 4]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n1", type=int, default=100_000)
    ap.add_argument("--n2", type=int, default=10_000)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--skip-verify", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from psa_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from psa_tpu.core.alphabet import encode
    from psa_tpu.core.tables import build_tables
    from psa_tpu.parallel.mesh import (make_mesh, make_sharded_stats_fn,
                                       pad_for_mesh, search_sharded)
    from psa_tpu.utils.generator import random_sequences

    n1, n2 = args.n1, args.n2
    platform = jax.devices()[0].platform
    ndev = jax.device_count()
    tables = build_tables(np.array([1.0, 3.0, 4.0, 2.0]), False)
    seq1, seq2 = random_sequences(n1, n2, seed=0)
    c1, c2 = encode(seq1), encode(seq2)
    pair_evals = float(n1 - n2 + 1) * n2
    log(f"[northstar] platform={platform} devices={ndev} {n1}x{n2} "
        f"({pair_evals:.3g} pair-evals)")

    # end-to-end sharded search (includes host selection) + parity
    mesh = make_mesh()
    t0 = time.perf_counter()
    res = search_sharded(c1, c2, tables, mesh)
    e2e_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = search_sharded(c1, c2, tables, mesh)
    e2e = time.perf_counter() - t0
    log(f"[northstar] e2e sharded search: {e2e*1e3:.0f} ms "
        f"(first {e2e_first:.1f}s) -> offset={res.offset} score={res.score}")

    parity = None
    if not args.skip_verify:
        from psa_tpu.native import search_native

        ref = search_native(c1, c2, tables)
        parity = (res.offset, res.char_offset, res.sub_code, res.score) == (
            ref.offset, ref.char_offset, ref.sub_code, ref.score)
        log(f"[northstar] native-engine parity: {'OK' if parity else 'FAIL'}")

    # device-only sweep throughput (chained-materialized, docs/DESIGN.md §6)
    c1p, c2p, _ = pad_for_mesh(c1, c2, ndev)
    stats_fn = make_sharded_stats_fn(tables, mesh, c1p.shape[0], c2p.shape[0])
    a, b = jnp.asarray(c1p), jnp.asarray(c2p)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chained(a, b, k):
        def body(i, acc):
            s = stats_fn(a, jnp.roll(b, i))
            return acc + s[0, 0] + s[-1, 4]
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    np.asarray(chained(a, b, args.iters))
    t0 = time.perf_counter()
    np.asarray(chained(a, b, args.iters))
    dt = (time.perf_counter() - t0) / args.iters
    log(f"[northstar] device sweep: {dt*1e3:.1f} ms, {pair_evals/dt:.3g} evals/s")

    print(json.dumps({
        "metric": "northstar_100kx10k",
        "platform": platform,
        "devices": ndev,
        "workload": {"n1": n1, "n2": n2},
        "e2e_seconds": e2e,
        "sweep_seconds": dt,
        "pair_evals_per_sec": pair_evals / dt,
        "winner": {"offset": res.offset, "char_offset": res.char_offset,
                   "sub_code": res.sub_code, "score": res.score},
        "native_parity": parity,
    }))
    return 0 if parity in (True, None) else 1


if __name__ == "__main__":
    sys.exit(main())
