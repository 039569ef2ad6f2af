"""Kernel experiment harness: time sweep-kernel variants on the real TPU.

Chained-materialized timing (docs/DESIGN.md §6): K perturbed sweeps inside
one jitted fori_loop, result materialized to host.

Usage: python benchmarks/kernel_lab.py [--variant v1|v2] [--tile 2048]
       [--shear reshape|rolls] [--n1 131072] [--n2 8192] [--iters 16]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="v2")
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument("--shear", default="stride")
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--n1", type=int, default=131072)
    ap.add_argument("--n2", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--novalid", action="store_true",
                    help="v1: measure the clean-input kernel (with_valid=False)")
    ap.add_argument("--pack", default="splitdot",
                    choices=["splitdot", "permdot", "cast"],
                    help="v3: packed band via 4 quarter dots / one "
                         "row-permuted dot + sublane-slice OR / cast+bitcast")
    ap.add_argument("--counts", default="defer", choices=["defer", "mxu"],
                    help="v3: per-tile deferred counting vs per-chunk MXU dots")
    ap.add_argument("--check", action="store_true",
                    help="also verify stats vs the numpy oracle")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from psa_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from psa_tpu.core.alphabet import encode
    from psa_tpu.core.tables import build_tables
    from psa_tpu.utils.generator import random_sequences

    backend = jax.default_backend()
    log(f"[lab] backend={backend} devices={jax.devices()}")
    tables = build_tables(np.array([1.0, 3.0, 4.0, 2.0]), False)
    seq1, seq2 = random_sequences(args.n1, args.n2, seed=0)
    c1, c2 = encode(seq1), encode(seq2)
    noff = args.n1 - args.n2 + 1
    interpret = backend != "tpu"

    if args.variant == "v1":
        from psa_tpu.ops import pallas_sweep as ps

        _, noff_pad, l2p, l1k = ps.plan_shapes(args.n1, args.n2)
        a, b = ps._prepare(jnp.asarray(c1), jnp.asarray(c2),
                           jnp.asarray(tables.code), l1k, l2p)

        def one(aa, bb):
            out = ps._sweep_pallas(aa, bb, noff_pad, l2p // ps.CHUNK,
                                   interpret, args.tile,
                                   with_valid=not args.novalid)
            return out[0, 0] + out[4, -1]

        perturb_axis = -1
    elif args.variant == "v3":
        from psa_tpu.ops import _sweep_v3 as v3

        _, noff_pad, l2p, l1k = v3.plan_shapes_v3(args.n1, args.n2, args.tile,
                                                  args.chunk)
        a, b = v3._prepare_v3(jnp.asarray(c1), jnp.asarray(c2),
                              jnp.asarray(tables.code), l1k, l2p, args.chunk,
                              args.pack)

        def one(aa, bb):
            out = v3._sweep_pallas_v3(aa, bb, noff_pad, l2p // args.chunk,
                                      interpret, args.tile, args.chunk,
                                      args.pack, args.counts)
            return out[0, 0] + out[4, -1]

        perturb_axis = -1
    else:
        from psa_tpu.ops import _sweep_v2 as v2

        _, noff_pad, l2p, l1k = v2.plan_shapes_v2(args.n1, args.n2, args.tile,
                                                  args.chunk)
        a, b = v2._prepare_v2(jnp.asarray(c1), jnp.asarray(c2),
                              jnp.asarray(tables.code), l1k, l2p, args.shear,
                              args.chunk)

        def one(aa, bb):
            out = v2._sweep_pallas_v2(aa, bb, noff_pad, l2p // args.chunk,
                                      interpret, args.tile, args.shear,
                                      args.chunk)
            return out[0, 0] + out[4, -1]

        perturb_axis = -1

    if args.check:
        from psa_tpu.core.oracle import offset_stats_numpy

        if args.variant == "v1":
            from psa_tpu.ops.pallas_sweep import offset_stats_pallas as f
            counts, maxrank = f(c1, c2, tables)
        elif args.variant == "v3":
            from psa_tpu.ops._sweep_v3 import offset_stats_v3
            counts, maxrank = offset_stats_v3(c1, c2, tables,
                                              tile_o=args.tile,
                                              chunk=args.chunk,
                                              pack=args.pack,
                                              counts=args.counts)
        else:
            from psa_tpu.ops._sweep_v2 import offset_stats_v2
            counts, maxrank = offset_stats_v2(c1, c2, tables,
                                              tile_o=args.tile,
                                              shear=args.shear,
                                              chunk=args.chunk)
        rc, rm = offset_stats_numpy(c1, c2, tables)
        ok = np.array_equal(counts, rc) and np.array_equal(maxrank, rm)
        log(f"[lab] oracle check: {'OK' if ok else 'FAIL'}")
        if not ok:
            sys.exit(1)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chained(aa, bb, k):
        def body(i, acc):
            bb_i = jnp.roll(bb, i, axis=perturb_axis)
            return acc + one(aa, bb_i)
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    t0 = time.perf_counter()
    np.asarray(chained(a, b, args.iters))
    log(f"[lab] compile+first: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    np.asarray(chained(a, b, args.iters))
    dt = (time.perf_counter() - t0) / args.iters
    pair_evals = float(noff) * float(args.n2)
    log(f"[lab] {args.variant}/{args.shear} tile={args.tile} chunk={args.chunk} "
        f"{args.n1}x{args.n2}: {dt*1e3:.2f} ms/sweep, "
        f"{pair_evals/dt:.3g} evals/s")
    print(f"RESULT {args.variant} {args.shear} {args.tile} {args.chunk} {dt*1e3:.3f}")


if __name__ == "__main__":
    main()
