"""Batched multi-query search over a 2-D (batch x offset) device mesh.

BASELINE.json config 5: stream many independent (Seq1, Seq2, weights-shared)
queries data-parallel across the pod.  Queries are padded to shared bucketed
shapes and sharded over the 'dp' mesh axis; each query's offset axis is
sharded over 'op' exactly like the single-query path (parallel/mesh.py).
The winner reduction stays in-graph so only (B, 3) scalars leave the device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from psa_tpu.core.tables import ScoringTables
from psa_tpu.ops.engine_xla import stats_from_codevals


def make_mesh_2d(dp: int, op: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: dp * op]).reshape(dp, op)
    return Mesh(devices, ("dp", "op"))


def _local_stats(c1_local, c2p, code_flat, noff_local: int, block: int):
    l2p = c2p.shape[0]
    nblocks = noff_local // block

    def body(b):
        offs = b * block + jnp.arange(block)
        win = c1_local[offs[:, None] + jnp.arange(l2p)[None, :]]
        codeval = code_flat[win * 32 + c2p[None, :]].astype(jnp.int32)
        counts, maxrank = stats_from_codevals(codeval)
        return jnp.concatenate([counts, maxrank[:, None]], axis=1)

    return jax.lax.map(body, jnp.arange(nblocks)).reshape(-1, 5)


def batched_sharded_stats(c1b: jnp.ndarray, c2b: jnp.ndarray,
                          tables: ScoringTables, mesh: Mesh,
                          block: int = 512):
    """(B, L1P) x (B, L2P) -> (B, noff_pad, 5) int32 sharded (dp, op, None)."""
    l1p, l2p = c1b.shape[1], c2b.shape[1]
    noff_pad = l1p - l2p
    op = mesh.shape["op"]
    assert noff_pad % (op * block) == 0
    per_shard = noff_pad // op
    code_flat = jnp.asarray(tables.code.reshape(-1).astype(np.int32))

    def body(c1_loc, c2_loc, cflat):
        k = jax.lax.axis_index("op")
        o0 = k * per_shard

        def per_query(c1, c2):
            c1l = jax.lax.dynamic_slice(c1, (o0,), (per_shard + l2p,))
            return _local_stats(c1l, c2, cflat, per_shard, block)

        return jax.vmap(per_query)(c1_loc, c2_loc)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P("dp", None), P("dp", None), P()),
        out_specs=P("dp", "op", None),
        check_vma=False,
    )
    return fn(c1b, c2b, code_flat)


def batched_device_winners(stats: jnp.ndarray, tables: ScoringTables,
                           noffs: jnp.ndarray):
    """In-graph per-query winners: (B,) offsets, (B,) maxranks, (B,) f32 totals."""
    w = jnp.asarray(tables.w_signed.astype(np.float32))
    diff_vals = jnp.asarray(
        np.concatenate([tables.diff_vals.astype(np.float32), [0.0]])
    )
    counts = stats[..., :4].astype(jnp.float32)
    maxrank = stats[..., 4]
    total = counts @ w + diff_vals[jnp.clip(maxrank, 0, None)]
    n = stats.shape[1]
    offs = jnp.arange(n, dtype=jnp.int32)[None, :]
    valid = (maxrank >= 0) & (offs < noffs[:, None])
    sign = 1.0 if tables.is_max else -1.0
    keyed = jnp.where(valid, sign * total, -jnp.inf)
    best = jnp.argmax(keyed, axis=1)
    bi = jnp.arange(stats.shape[0])
    return best, maxrank[bi, best], total[bi, best]


_PALLAS_RUNNERS: dict = {}


def make_batched_pallas_runner(tables: ScoringTables, l1k: int, l2p: int,
                               interpret: bool):
    """Build (and cache) the jitted batched scan for one (tables, shapes)
    configuration.  Re-tracing on every call costs ~0.8s host-side even with
    the XLA compile cache warm, so callers must reuse this runner."""
    key = (tuple(tables.weights.tolist()), tables.is_max, l1k, l2p, interpret)
    cached = _PALLAS_RUNNERS.get(key)
    if cached is not None:
        return cached

    import jax

    from psa_tpu.core.alphabet import NCODES_PAD
    from psa_tpu.ops.pallas_sweep import CHUNK, _sweep_pallas, maxrank_from_maxcode

    noff_pad = l1k - l2p
    assert noff_pad % 512 == 0 and l2p % CHUNK == 0
    code_tab = jnp.asarray(tables.code)

    # NOTE: a packed (query, tile)-grid variant (_sweep_pallas_batched) was
    # measured SLOWER on chip than this scan (273 vs 503 q/s at B=1000,
    # 2048x512): the 3-D blocked operands stall the pipeline and the
    # materialized (B, 32, L1K) one-hot costs ~164MB of HBM traffic. The scan
    # builds each query's one-hot on the fly and keeps the sweep 2-D.
    @jax.jit
    def run(c1b, c2b, noffs):
        def step(carry, q):
            c1, c2 = q
            s1oh_t = jax.nn.one_hot(c1, NCODES_PAD, dtype=jnp.int8, axis=0)
            pc = code_tab.astype(jnp.int8)[:, c2]
            out = _sweep_pallas(s1oh_t, pc, noff_pad, l2p // CHUNK, interpret)
            maxrank = maxrank_from_maxcode(out[4:5, :])
            return carry, jnp.concatenate([out[:4, :], maxrank], axis=0).T

        _, stats = jax.lax.scan(step, 0, (c1b, c2b))    # (B, noff_pad, 5)
        return batched_device_winners(stats, tables, noffs)

    _PALLAS_RUNNERS[key] = run
    return run


def batched_pallas_winners(c1b, c2b, noffs, tables: ScoringTables,
                           interpret: bool | None = None):
    """Single-chip batched throughput path: scan the Pallas sweep over B
    queries (each sweep saturates the chip; no host round-trips between
    queries) and reduce each to its winner triple in-graph via
    `batched_device_winners`.

    c1b: (B, L1K) int32 codes padded so L1K = noff_pad + L2P with
    noff_pad = L1K - L2P a multiple of 512; c2b: (B, L2P).
    Returns (offsets (B,), maxranks (B,), totals_f32 (B,)).
    """
    import jax

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    run = make_batched_pallas_runner(tables, c1b.shape[1], c2b.shape[1],
                                     bool(interpret))
    return run(jnp.asarray(c1b), jnp.asarray(c2b), jnp.asarray(noffs))


def batched_search_step(tables: ScoringTables, mesh: Mesh, block: int = 512):
    """Returns a jittable step: (c1b, c2b, noffs) -> (offsets, maxranks, totals)."""

    def step(c1b, c2b, noffs):
        stats = batched_sharded_stats(c1b, c2b, tables, mesh, block=block)
        return batched_device_winners(stats, tables, noffs)

    return step
