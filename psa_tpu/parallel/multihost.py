"""Multi-host pod bootstrap.

TPU-native replacement for the reference's MPI process layer (main.c:20-22,
mpi_funcs.c, cpu_funcs.c:51): `jax.distributed` forms the pod slice, process 0
owns file I/O, the query broadcasts over DCN, and the search itself is the
same mesh-sharded program as single-host (parallel/mesh.py) — the global mesh
simply spans all hosts' devices, so the cross-host merge is the same in-graph
collective instead of MPI_Allreduce + Send/Recv (cpu_funcs.c:64-94).

Exercised for real by tests/test_distributed.py: two processes joined
through a local coordinator (CPU backend, Gloo collectives) run the full
read -> broadcast -> sharded search -> allgather -> write flow, with the
non-primary rank receiving no input file at all.  Launch locally with
`psa-dist -np N` or per-host with `psa --distributed`.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               force: bool = False) -> None:
    """Join the pod slice (the reference's MPI_Init, main.c:20-22).

    With explicit coordinator/process arguments, forms the service directly
    (the `mpiexec -np N` analog — the psa-dist launcher passes these).  With
    no arguments it is a no-op unless `force`, in which case it asks JAX to
    auto-discover the topology (TPU pod env / cloud metadata)."""
    import jax

    if num_processes in (None, 1) and coordinator_address is None:
        if force:
            jax.distributed.initialize()  # TPU-pod/cluster auto-discovery
        return  # single-process: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0


def broadcast_query(query=None):
    """Broadcast (weights, codes1, codes2, is_max) from process 0 to all.

    The reference broadcasts its ~15KB ProgramData struct (cpu_funcs.c:51);
    here the payload is the padded code arrays + weights via
    multihost_utils.broadcast_one_to_all (DCN).
    """
    import jax
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return query

    from psa_tpu.core.alphabet import encode

    if is_primary():
        assert query is not None
        c1 = encode(query.seq1).astype(np.int32)
        c2 = encode(query.seq2).astype(np.int32)
        header = np.array(
            [c1.shape[0], c2.shape[0], int(query.is_max)], np.int32
        )
        w = np.asarray(query.weights, np.float64)
    else:
        header = np.zeros(3, np.int32)
        w = np.zeros(4, np.float64)
        c1 = c2 = None

    header = multihost_utils.broadcast_one_to_all(header)
    w = multihost_utils.broadcast_one_to_all(w)
    n1, n2, is_max = (int(x) for x in header)
    if c1 is None:
        c1 = np.zeros(n1, np.int32)
        c2 = np.zeros(n2, np.int32)
    c1 = multihost_utils.broadcast_one_to_all(c1)
    c2 = multihost_utils.broadcast_one_to_all(c2)
    return w, c1, c2, bool(is_max)


def run_distributed_search(input_path: str, output_path: str,
                           backend_kernel: str = "auto",
                           lenient: bool = False) -> int:
    """Full multi-host flow: proc-0 read -> broadcast -> global-mesh sharded
    search -> proc-0 write. Returns 0/1 like the CLI; raises the primary's
    read/validation error on EVERY process (a status broadcast precedes the
    query broadcast, so a bad input file fails all ranks promptly instead
    of stranding the others inside broadcast_one_to_all)."""
    import jax

    from psa_tpu.core.alphabet import validate
    from psa_tpu.core.result import NoMutationFound
    from psa_tpu.core.tables import build_tables
    from psa_tpu.parallel.mesh import make_mesh, search_sharded
    from psa_tpu.utils.io import read_input, write_output

    query = None
    status = 0
    if is_primary():
        try:
            query = read_input(input_path)
            if not lenient and not (validate(query.seq1)
                                    and validate(query.seq2)):
                status = 3
        except FileNotFoundError:
            status = 1
        except ValueError:
            status = 2
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        status = int(multihost_utils.broadcast_one_to_all(
            np.array([status], np.int32))[0])
    if status == 1:
        raise FileNotFoundError(input_path)
    if status == 2:
        raise ValueError(f"bad input file `{input_path}`")
    if status == 3:
        raise ValueError("sequences must contain only A-Z and '-' "
                         "(pass --lenient to accept reference-UB inputs)")

    if jax.process_count() > 1:
        w, c1, c2, is_max = broadcast_query(query)
    else:
        from psa_tpu.core.alphabet import encode

        w = np.asarray(query.weights, np.float64)
        c1, c2 = encode(query.seq1), encode(query.seq2)
        is_max = query.is_max

    tables = build_tables(w, is_max)
    mesh = make_mesh()  # global mesh across all hosts' devices
    try:
        res = search_sharded(c1, c2, tables, mesh, kernel=backend_kernel)
    except NoMutationFound:
        if is_primary():
            from psa_tpu.core.alphabet import decode

            write_output(output_path, decode(c2), -1,
                         float("-inf") if is_max else float("inf"))
        return 1
    if is_primary():
        from psa_tpu.core.alphabet import decode

        write_output(output_path, res.mutant_from_codes(c2), res.offset, res.score)
    return 0
