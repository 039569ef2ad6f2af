"""Local multi-process launcher: `psa-dist -np N input.txt [psa flags...]`.

The reference launches its distributed run as `mpiexec -np 2 -machinefile mf
-map-by node ./bin` (Makefile:18-22, README.md:232-244).  The TPU-native
analog spawns N copies of the `psa` CLI joined through a local
jax.distributed coordinator; on a real pod you instead run one `psa
--distributed` per host (coordinator auto-discovered) and this launcher is
the single-machine stand-in, exactly like `mpiexec -np N` on one node.

Process 0's stdout/stderr stream through; the other ranks' output is
captured and replayed only on failure.
"""

from __future__ import annotations

import argparse
import socket
import subprocess
import sys


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="psa-dist",
        description="launch an N-process distributed psa search on this "
                    "machine (mpiexec -np N analog)",
    )
    p.add_argument("-np", "--num-processes", type=int, default=2,
                   help="process count (default 2, like the reference's "
                        "Makefile run target)")
    p.add_argument("--port", type=int, default=None,
                   help="coordinator port (default: pick a free one)")
    p.add_argument("--platform", default=None,
                   help="forwarded to every rank (e.g. cpu)")
    return p


def main(argv: list[str] | None = None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    args, rest = build_parser().parse_known_args(argv)
    n = args.num_processes
    port = args.port or _free_port()

    common = [sys.executable, "-m", "psa_tpu.utils.cli", *rest,
              "--distributed", "--coordinator", f"localhost:{port}",
              "--num-processes", str(n)]
    if args.platform:
        common += ["--platform", args.platform]

    import tempfile

    procs = []
    logs = []
    for i in range(n):
        cmd = common + ["--process-id", str(i)]
        if i == 0:
            procs.append(subprocess.Popen(cmd))
            logs.append(None)
        else:
            # spool non-primary output to a temp file — a PIPE would fill
            # and deadlock the rank if it logs more than the pipe buffer
            f = tempfile.TemporaryFile(mode="w+")
            procs.append(subprocess.Popen(cmd, stdout=f, stderr=f))
            logs.append(f)
    rc = procs[0].wait()
    for i, p in enumerate(procs[1:], start=1):
        p.wait()
        f = logs[i]
        if p.returncode not in (0, rc):
            f.seek(0)
            print(f"[psa-dist] rank {i} exited {p.returncode}:\n{f.read()}",
                  file=sys.stderr)
            rc = rc or p.returncode
        f.close()
    return rc


if __name__ == "__main__":
    sys.exit(main())
