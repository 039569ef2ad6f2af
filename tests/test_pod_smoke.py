"""Hardware-gated real-TPU-pod smoke (scripts/pod_smoke.py as a test).

The reference's one unmatched execution claim is its 2-physical-node MPI run
(Makefile:22, README.md:232-244).  The distributed layer here is proven over
Gloo/CPU at 2 and 4 processes (test_distributed.py); this test closes the
real-pod claim the day multi-host TPU hardware exists:

    PSA_TEST_PLATFORM=tpu python -m pytest tests/test_pod_smoke.py -v
    # ... run simultaneously on every host of the pod slice, e.g.
    # gcloud compute tpus tpu-vm ssh "$TPU" --worker=all --command '...'

On this repo's single-chip (or CPU-forced) environment it skips cleanly,
stating exactly what hardware it is waiting for.
"""

import pytest


@pytest.mark.pod
def test_real_pod_smoke(tmp_path):
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("real-pod smoke needs TPU hardware "
                    "(run with PSA_TEST_PLATFORM=tpu on a pod slice)")

    from psa_tpu.parallel import multihost

    try:
        multihost.initialize(force=True)  # TPU-pod topology auto-discovery
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"no pod slice to join ({type(e).__name__}: {e})")
    if jax.process_count() < 2:
        pytest.skip("single-host TPU: the pod smoke needs >= 2 processes "
                    "(launch this test on every worker of a multi-host "
                    "slice simultaneously)")

    # expected artifacts defined in advance (see scripts/pod_smoke.py):
    # out.txt byte-identical to the single-host native answer; rc 0.
    import subprocess
    import sys

    rc = subprocess.call([sys.executable, "scripts/pod_smoke.py",
                          "--workdir", str(tmp_path)])
    assert rc == 0
    # the artifact is written by process 0 only; non-primary workers assert
    # the broadcast verdict through rc alone
    if multihost.is_primary():
        assert (tmp_path / "POD_SMOKE.json").exists()
