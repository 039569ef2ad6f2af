"""Turnkey real-TPU-pod smoke.

The reference demonstrably ran on 2 physical nodes (`mpiexec -np 2
-machinefile mf -map-by node`, Makefile:22, README.md:232-244).  This repo's
distributed layer is proven over Gloo/CPU at 2 and 4 processes
(tests/test_distributed.py) and over a single real chip; this script is the
real-pod claim made one command from proven: the day a multi-host TPU slice
exists, run this SAME command simultaneously on EVERY host —

    gcloud compute tpus tpu-vm ssh "$TPU_NAME" --worker=all \
        --command "cd <repo> && python scripts/pod_smoke.py"

(jax.distributed auto-discovers the slice topology on TPU VMs — no
coordinator address or machinefile needed; pass --coordinator/--nproc/--pid
to form the pod manually on non-TPU clusters.)

Flow (the full production path, parallel/multihost.py): join the pod ->
process-0 reads a deterministic generated input file -> query broadcast over
DCN -> offset axis sharded over the GLOBAL mesh (every chip of every host,
collectives over ICI within a host and DCN across) -> merged winner written
by process 0 -> process 0 verifies byte parity against the single-host
native (C++/OpenMP) engine on the same input.

Expected artifacts (defined in advance):
  <workdir>/out.txt         distributed answer (process 0)
  <workdir>/out_native.txt  single-host oracle answer (process 0)
  <workdir>/POD_SMOKE.json  {"ok": true, "processes": N, "devices": M, ...}
Exit 0 on every process iff the pod ran and process 0 verified parity.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n1", type=int, default=50_000)
    ap.add_argument("--n2", type=int, default=5_000)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--workdir", default="/tmp/psa_pod_smoke")
    ap.add_argument("--coordinator", default=None, metavar="HOST:PORT")
    ap.add_argument("--nproc", type=int, default=None)
    ap.add_argument("--pid", type=int, default=None)
    args = ap.parse_args()

    from psa_tpu.parallel import multihost

    try:
        multihost.initialize(args.coordinator, args.nproc, args.pid,
                             force=True)
    except Exception as e:  # noqa: BLE001 - no pod to join is a clean fail
        print(f"pod_smoke: cannot join a pod ({type(e).__name__}: {e}); "
              "on TPU VMs run this on every worker simultaneously",
              file=sys.stderr)
        return 2

    import jax

    nproc = jax.process_count()
    pid = jax.process_index()
    ndev = jax.device_count()
    print(f"pod_smoke: process {pid}/{nproc}, {ndev} global devices, "
          f"backend={jax.default_backend()}", file=sys.stderr, flush=True)

    # deterministic same-seed workload on every host; only process 0's
    # copy is read (the others exercise the DCN broadcast path)
    os.makedirs(args.workdir, exist_ok=True)
    inp = os.path.join(args.workdir, "input.txt")
    from psa_tpu.utils.generator import random_sequences

    s1, s2 = random_sequences(args.n1, args.n2, seed=args.seed)
    with open(inp, "w") as f:
        f.write(f"1 3 4 2\n{s1}\n{s2}\nminimum\n")

    out = os.path.join(args.workdir, "out.txt")
    t0 = time.perf_counter()
    code = multihost.run_distributed_search(inp, out, backend_kernel="auto")
    dt = time.perf_counter() - t0
    if code != 0:
        print(f"pod_smoke: distributed search failed (rc={code})",
              file=sys.stderr)
        return code

    ok = True
    if multihost.is_primary():
        # single-host oracle: the native C++/OpenMP engine, byte-for-byte
        from psa_tpu.models.search import AlignmentSearchEngine
        from psa_tpu.utils.io import read_input, write_output

        q = read_input(inp)
        res = AlignmentSearchEngine(q.weights, q.is_max,
                                    backend="native").search(q.seq1, q.seq2)
        ref = os.path.join(args.workdir, "out_native.txt")
        write_output(ref, res.mutant(q.seq2), res.offset, res.score)
        ok = open(out).read() == open(ref).read()
        artifact = {
            "ok": bool(ok), "processes": nproc, "devices": ndev,
            "backend": jax.default_backend(),
            "workload": {"n1": args.n1, "n2": args.n2, "seed": args.seed},
            "distributed_seconds": dt,
            "parity": "byte-identical to single-host native engine"
                      if ok else "MISMATCH",
        }
        with open(os.path.join(args.workdir, "POD_SMOKE.json"), "w") as f:
            json.dump(artifact, f, indent=1)
        print(json.dumps(artifact), flush=True)
    # every process exits by process-0's verdict (the docstring contract:
    # exit 0 on EVERY process iff process 0 verified parity)
    if nproc > 1:
        import numpy as np
        from jax.experimental import multihost_utils

        ok = bool(multihost_utils.broadcast_one_to_all(
            np.array([1 if ok else 0], np.int32))[0])
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
