"""Run the full test suite against REAL TPU hardware, phased and budgeted.

The forced-CPU suite (default) validates semantics; this runner re-runs it
with PSA_TEST_PLATFORM=tpu so every device path exercises the real Mosaic
kernels.  Structure (VERDICT r3 next-step #2):

- tests are grouped into phases by shape family and run in ONE warm pytest
  process per phase, so every (weights, shape) program compiles at most
  once per phase (CLAUDE.md: batch all TPU work for one shape into one
  process);
- the host-only phase runs first (no device compiles, fails fast);
- per-phase wall time is recorded in the artifact, with a per-phase
  timeout so one pathological compile cannot eat the whole budget
  silently.

Usage: python scripts/tpu_suite.py [--out TPU_SUITE_r04.json]
         [--phase-timeout 5400]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import re
import subprocess
import sys
import time

# Phases ordered cheap -> expensive.  Files inside one phase share shape
# families (and the warm process shares runner caches + XLA jit caches), so
# repeated (weights, shape) programs compile once.
PHASES = [
    ("host", [
        "tests/test_io.py", "tests/test_tables.py", "tests/test_utils.py",
        "tests/test_native.py", "tests/test_wire_native.py",
        "tests/test_select.py", "tests/test_pod_smoke.py",
    ]),
    ("multiprocess", [
        "tests/test_multihost.py", "tests/test_distributed.py",
    ]),
    ("golden+cli", [
        "tests/test_cli.py", "tests/test_hybrid.py",
    ]),
    ("serve", [
        "tests/test_serve.py", "tests/test_server.py",
        "tests/test_warmup.py",
    ]),
    ("engines", [
        # test_golden.py lives here (not in golden+cli): its pinned
        # MAX-mode engine matrix shares the big (noff_pad 8192, l2p 2304)
        # Mosaic program with test_golden_through_engine — one warm
        # process compiles it once for both
        "tests/test_golden.py",
        "tests/test_engines.py", "tests/test_shapes.py",
        "tests/test_parallel.py",
    ]),
    ("batch", [
        "tests/test_batch.py", "tests/test_batch_exact.py",
        "tests/test_shared_s1.py", "tests/test_fuzz.py",
    ]),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="TPU_SUITE_r04.json")
    ap.add_argument("--phase-timeout", type=int, default=5400,
                    help="seconds per phase (default 90 min)")
    ap.add_argument("--phases", default=None,
                    help="comma list of phase names to run (default all)")
    args = ap.parse_args()

    only = set(args.phases.split(",")) if args.phases else None
    # PYTHONUNBUFFERED: the per-phase log files are the live hang
    # attribution; block-buffered pytest output defeats them
    env = dict(os.environ, PSA_TEST_PLATFORM="tpu", PYTHONUNBUFFERED="1")
    results = {}
    if only and os.path.exists(args.out):
        # partial rerun: keep the other phases' recorded results
        try:
            with open(args.out) as f:
                results = json.load(f).get("phases", {})
        except (OSError, ValueError):
            results = {}
    for name, files in PHASES:
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        print(f"[tpu_suite] phase {name}: {len(files)} files ...",
              file=sys.stderr, flush=True)
        proc = _run_with_timeout(
            [sys.executable, "-m", "pytest", *files, "-q", "-v",
             "--tb=line", "-p", "no:cacheprovider"], env,
            args.phase_timeout, name)
        dt = time.perf_counter() - t0
        tail = (proc["stdout"].strip().splitlines() or [""])[-1]
        counts = _parse_counts(tail)
        ok = proc["rc"] == 0
        results[name] = {
            "ok": ok,
            "rc": proc["rc"],
            "wall_s": round(dt, 1),
            "summary": tail[:200],
            **counts,
        }
        print(f"[tpu_suite] phase {name}: rc={proc['rc']} in {dt:.0f}s — "
              f"{tail[:120]}", file=sys.stderr, flush=True)
        if proc["rc"] == 124:
            results[name]["timeout"] = True
            # keep going — but the timeout SIGKILLed pytest mid-TPU-work,
            # which can wedge the chip for minutes (CLAUDE.md); cool down
            # so the next phase's results aren't poisoned by the wedge
            print("[tpu_suite] cooling down 120s after the timeout kill "
                  "(mid-execution kills can wedge the chip)",
                  file=sys.stderr, flush=True)
            time.sleep(120)

    all_green = all(v.get("ok") for v in results.values())
    artifact = {
        "metric": "real_tpu_suite",
        "platform": "tpu",
        "date": datetime.date.today().isoformat(),
        "all_green": all_green,
        "phase_timeout_s": args.phase_timeout,
        "phases": results,
        "note": ("PSA_TEST_PLATFORM=tpu runs the forced-CPU suite against "
                 "real hardware, one warm pytest process per shape-family "
                 "phase so repeated (weights, shape) programs compile once "
                 "(scripts/tpu_suite.py)."),
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"metric": "real_tpu_suite", "all_green": all_green,
                      "phases": {k: v["ok"] for k, v in results.items()}}))
    return 0 if all_green else 1


def _run_with_timeout(cmd, env, timeout_s: int, name: str = "phase") -> dict:
    # stream output to a per-phase file so a hang is attributable to a
    # specific test while it happens (capture_output hides it until exit)
    path = f"/tmp/tpu_suite_phase_{name}.log"
    with open(path, "w") as logf:
        try:
            p = subprocess.run(cmd, env=env, stdout=logf,
                               stderr=subprocess.STDOUT,
                               timeout=timeout_s or None)
            rc = p.returncode
        except subprocess.TimeoutExpired:
            rc = 124
    with open(path) as f:
        out = f.read()
    if rc == 124:
        out += "\n[tpu_suite] TIMEOUT"
    return {"rc": rc, "stdout": out}


def _parse_counts(tail: str) -> dict:
    out = {}
    for n, kind in re.findall(r"(\d+) (passed|failed|skipped|error)", tail):
        out[kind] = int(n)
    return out


if __name__ == "__main__":
    sys.exit(main())
