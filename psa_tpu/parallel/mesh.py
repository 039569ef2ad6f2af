"""Offset-axis sharding over a device mesh.

TPU-native replacement for the reference's MPI data split
(cpu_funcs.c:128-133: contiguous equal offset blocks per rank, remainder to
the last) and its MAXLOC/Allreduce + Send/Recv merge (cpu_funcs.c:64-94):

* Seq1/Seq2/tables are replicated (Seq1 is small: bytes per char),
* the offset axis is block-sharded over the mesh with `shard_map` — each
  device slices its own Seq1 window with `lax.dynamic_slice`, so VMEM holds
  only the local window and the design scales to arbitrarily long Seq1,
* per-offset integer statistics come back as a global array sharded on the
  offset axis; the exact winner is selected on the host (ops/select.py),
  whose integer inputs make the result independent of device count —
  the multi-host determinism requirement of SURVEY.md §7.2,
* a fully in-graph merge (`device_reduce_winner`) is also provided for
  pipelines that must not leave the device: it reduces each shard to a
  packed candidate and picks the global winner with an all-gather +
  lexicographic argmin, reproducing the canonical tie-break.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from psa_tpu.core.tables import ScoringTables
from psa_tpu.ops.common import round_up
from psa_tpu.ops.engine_xla import stats_from_codevals


def make_mesh(devices=None, axis: str = "op") -> Mesh:
    """1-D mesh over all (or given) devices; offsets shard along `axis`."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def _pack_codes_host(codes: np.ndarray) -> np.ndarray:
    """5-bit packing of one padded code vector — the shared upload wire
    format (models/batch.pack_code_rows on a single row: the tunnel is
    bandwidth-bound, so the 100k-char north-star Seq1 ships as 67 KB
    instead of 400 KB)."""
    from psa_tpu.models.batch import pack_code_rows

    return pack_code_rows(codes[None, :])[0]


def _unpack_codes_graph(words: jnp.ndarray, n: int) -> jnp.ndarray:
    """In-graph inverse of `_pack_codes_host` (shift+mask, replicated)."""
    from psa_tpu.models.batch import unpack_code_rows

    return unpack_code_rows(words[None, :], n)[0]


def _local_stats_jnp(c1_local, c2p, code_flat, noff_local: int, block: int = 512):
    """Per-shard sweep in plain jnp (portable; the pallas path plugs in on TPU)."""
    l2p = c2p.shape[0]
    nblocks = noff_local // block

    def body(b):
        offs = b * block + jnp.arange(block)
        win = c1_local[offs[:, None] + jnp.arange(l2p)[None, :]]
        codeval = code_flat[win * 32 + c2p[None, :]].astype(jnp.int32)
        counts, maxrank = stats_from_codevals(codeval)
        return jnp.concatenate([counts, maxrank[:, None]], axis=1)

    out = jax.lax.map(body, jnp.arange(nblocks))
    return out.reshape(-1, 5)


_SHARDED_FNS: dict = {}   # LRU-capped via models/batch's locked helpers


def make_sharded_stats_fn(tables: ScoringTables, mesh: Mesh,
                          l1p: int, l2p: int, kernel: str = "auto"):
    """Build (and cache) the jitted sharded sweep for one configuration.
    Rebuilding the shard_map closure per call costs ~200ms of host tracing,
    so callers should reuse the returned function."""
    axis = mesh.axis_names[0]
    n_shards = mesh.shape[axis]
    if kernel == "auto":
        kernel = "pallas" if jax.default_backend() == "tpu" else "xla"
    key = (tuple(tables.weights.tolist()), tables.is_max, kernel,
           l1p, l2p, axis, tuple(d.id for d in mesh.devices.flat))
    from psa_tpu.models.batch import _cache_get, _cache_put

    cached = _cache_get(_SHARDED_FNS, key)
    if cached is not None:
        return cached

    from psa_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    noff_pad = l1p - l2p
    assert noff_pad % (n_shards * 512) == 0, "pad offsets to n_shards*512"
    per_shard = noff_pad // n_shards
    code_flat = jnp.asarray(tables.code.reshape(-1).astype(np.int32))
    code_tab = jnp.asarray(tables.code)

    def body(c1, c2):
        k = jax.lax.axis_index(axis)
        o0 = k * per_shard
        c1_local = jax.lax.dynamic_slice(c1, (o0,), (per_shard + l2p,))
        if kernel == "pallas":
            from psa_tpu.ops.pallas_sweep import local_stats_pallas

            return local_stats_pallas(c1_local, c2, code_tab, per_shard, l2p)
        return _local_stats_jnp(c1_local, c2, code_flat, per_shard)

    # Explicit replicated in_shardings: host numpy inputs become global
    # replicated arrays without cross-process resharding — required for the
    # multi-process (multi-controller) path, harmless single-process.
    repl = NamedSharding(mesh, P())
    fn = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(axis, None),
        check_vma=False,
    ), in_shardings=(repl, repl))
    return _cache_put(_SHARDED_FNS, key, fn)


def sharded_offset_stats(codes1p: jnp.ndarray, codes2p: jnp.ndarray,
                         tables: ScoringTables, mesh: Mesh,
                         kernel: str = "auto"):
    """Global (noff_pad, 5) int32 stats, block-sharded over the mesh.

    codes1p must be padded so every shard's window fits:
    len >= noff_pad + len(codes2p) where noff_pad = n_shards * per_shard.
    """
    fn = make_sharded_stats_fn(tables, mesh, codes1p.shape[0],
                               codes2p.shape[0], kernel)
    return fn(codes1p, codes2p)


def pad_for_mesh(codes1: np.ndarray, codes2: np.ndarray, n_shards: int,
                 block: int | None = None):
    """Pad sequences so the offset axis splits into n_shards * block tiles."""
    from psa_tpu.core.alphabet import pad_codes
    from psa_tpu.ops.common import round_up

    n1, n2 = codes1.shape[0], codes2.shape[0]
    noff = n1 - n2 + 1
    if block is None:
        from psa_tpu.ops.pallas_sweep import size_tile

        block = size_tile(max(noff // n_shards, 1))
    l2p = round_up(max(n2, 128), 128)
    noff_pad = round_up(noff, n_shards * block)
    l1p = noff_pad + l2p
    return pad_codes(codes1, l1p), pad_codes(codes2, l2p), noff


def make_sharded_topk_fn(tables: ScoringTables, mesh: Mesh,
                         l1p: int, l2p: int, kernel: str = "auto",
                         k: int | None = None):
    """Build (and cache) the jitted sharded sweep WITH the in-graph
    checkable-exact top-k epilogue: each shard sweeps its offset block and
    reduces it to k candidate offsets with exact integer stats, so only
    (n_shards, 6k+2) ints ever leave the devices — the sharded analog of
    the reference GPU driver copying only the winner back
    (cuda_funcs.cu:106-119).  Returns fn(c1w, c2w, noff) -> packed rows
    (one per shard, global offsets; models/batch.unpack_epilogue_outputs);
    c1w/c2w are `_pack_codes_host` words — the upload wire format, 6 codes
    per int32 word (the tunnel is bandwidth-bound, so the 100k-char north
    star's Seq1 ships as 67 KB instead of 400 KB)."""
    from psa_tpu.models.batch import (TOPK, epilogue_compact,
                                      exact_topk_epilogue_rows,
                                      pack_epilogue_outputs)

    if k is None:
        k = TOPK
    axis = mesh.axis_names[0]
    n_shards = mesh.shape[axis]
    if kernel == "auto":
        kernel = "pallas" if jax.default_backend() == "tpu" else "xla"
    key = ("topk", tuple(tables.weights.tolist()), tables.is_max, kernel,
           l1p, l2p, k, axis, tuple(d.id for d in mesh.devices.flat))
    from psa_tpu.models.batch import _cache_get, _cache_put

    cached = _cache_get(_SHARDED_FNS, key)
    if cached is not None:
        return cached

    from psa_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    noff_pad = l1p - l2p
    assert noff_pad % (n_shards * 512) == 0, "pad offsets to n_shards*512"
    per_shard = noff_pad // n_shards
    code_flat = jnp.asarray(tables.code.reshape(-1).astype(np.int32))
    code_tab = jnp.asarray(tables.code)

    def body(c1w, c2w, noff):
        c1 = _unpack_codes_graph(c1w, l1p)
        c2 = _unpack_codes_graph(c2w, l2p)
        s = jax.lax.axis_index(axis)
        o0 = s * per_shard
        c1_local = jax.lax.dynamic_slice(c1, (o0,), (per_shard + l2p,))
        if kernel == "pallas":
            from psa_tpu.ops.pallas_sweep import local_stats_rows_pallas

            stats5 = local_stats_rows_pallas(c1_local, c2, code_tab,
                                             per_shard, l2p)
        else:
            stats5 = _local_stats_jnp(c1_local, c2, code_flat, per_shard).T
        # shard-local valid offset count; the epilogue masks the rest
        noff_local = jnp.clip(noff[0] - o0, 0, per_shard)
        topi, stats_k, near, best = exact_topk_epilogue_rows(
            stats5, tables, noff_local, l2p, k)
        # report GLOBAL offsets so the host merge needs no shard arithmetic;
        # the compact gate therefore uses the GLOBAL offset range
        return pack_epilogue_outputs((topi + o0)[None], stats_k[None],
                                     near[None], best[None],
                                     epilogue_compact(noff_pad, l2p))

    repl = NamedSharding(mesh, P())
    fn = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(axis, None),
        check_vma=False,
    ), in_shardings=(repl, repl, repl))
    return _cache_put(_SHARDED_FNS, key, fn)


def _select_from_shard_topk(buf: np.ndarray, noff: int, l2p: int,
                            tables: ScoringTables, codes1, codes2, k: int,
                            compact: bool):
    """Exact host selection from per-shard top-k candidate rows.

    Returns a SearchResult, or None when the f32 ranking was insufficient
    for some contributing shard (near > k inside the global band) — the
    caller falls back to the full-stats path.  Raises NoMutationFound when
    no shard found any legal substitution."""
    from psa_tpu.core.result import NoMutationFound
    from psa_tpu.models.batch import f32_band_epsilon, unpack_epilogue_outputs
    from psa_tpu.ops.select import (candidate_epsilon, pick_from_candidates,
                                    totals_from_stats)

    topi, stats_k, near, best = unpack_epilogue_outputs(buf, k, compact)
    if np.all(np.isneginf(best)):
        raise NoMutationFound("no offset admits a legal substitution")
    bg = best.max()                       # global keyed f32 best
    eps32 = f32_band_epsilon(tables, l2p)
    # checkability: every offset within the f32 band of the GLOBAL best must
    # appear in its shard's top-k.  A shard whose own band population
    # exceeded k can only hide such an offset if its local best reaches the
    # global band.
    if np.any((near > k) & (best >= bg - eps32)):
        return None
    offs = topi.reshape(-1).astype(np.int64)
    st = np.swapaxes(stats_k, 1, 2).reshape(-1, 5)      # (S*k, 5)
    keep = (offs < noff) & (st[:, 4] >= 0)
    offs, st = offs[keep], st[keep]
    if offs.size == 0:
        raise NoMutationFound("no offset admits a legal substitution")
    totals = totals_from_stats(st[:, :4], st[:, 4], tables)
    bq = totals.max() if tables.is_max else totals.min()
    cand = offs[np.abs(totals - bq) <= candidate_epsilon(
        tables, int(codes2.shape[0]))]
    # ascending order = the canonical lowest-offset tie-break (shards own
    # disjoint blocks, so there are no duplicates)
    return pick_from_candidates(np.asarray(codes1, np.int32),
                                np.asarray(codes2, np.int32), tables,
                                np.sort(cand))


def search_sharded(codes1: np.ndarray, codes2: np.ndarray,
                   tables: ScoringTables, mesh: Mesh | None = None,
                   kernel: str = "auto"):
    """End-to-end sharded search -> SearchResult (exact host selection).

    The hot path reduces each shard to its top-k exact candidates in-graph
    (make_sharded_topk_fn) so the host fetch is ~(6k+2) ints per shard, not
    the full (noff, 5) stats; the provably-rare case where f32 ranking
    cannot certify the winner (>k near-ties inside a contributing shard)
    falls back to the full-stats fetch + unrestricted exact selection."""
    from psa_tpu.core.result import NoMutationFound
    from psa_tpu.models.batch import TOPK
    from psa_tpu.ops.select import select_best

    if mesh is None:
        mesh = make_mesh()
    n_shards = mesh.shape[mesh.axis_names[0]]
    c1p, c2p, noff = pad_for_mesh(codes1, codes2, n_shards)
    # pass host numpy (uncommitted) so the jit's replicated in_shardings can
    # place full copies per process — a committed single-device array cannot
    # be resharded across processes
    fn = make_sharded_topk_fn(tables, mesh, c1p.shape[0], c2p.shape[0],
                              kernel=kernel)
    buf = fn(_pack_codes_host(c1p), _pack_codes_host(c2p),
             np.array([noff], np.int32))
    if jax.process_count() > 1:
        # multi-host: each process holds only its shards; gather over DCN
        from jax.experimental import multihost_utils

        buf = multihost_utils.process_allgather(buf, tiled=True)
    from psa_tpu.models.batch import epilogue_compact

    res = _select_from_shard_topk(
        np.asarray(buf), noff, c2p.shape[0], tables, codes1, codes2, TOPK,
        epilogue_compact(c1p.shape[0] - c2p.shape[0], c2p.shape[0]))
    if res is not None:
        return res
    stats = sharded_offset_stats(c1p, c2p, tables, mesh, kernel=kernel)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        stats = multihost_utils.process_allgather(stats, tiled=True)
    stats = np.asarray(stats)
    return select_best(stats[:, :4], stats[:, 4], tables,
                       np.asarray(codes1, np.int32),
                       np.asarray(codes2, np.int32), noff=noff)


def device_reduce_winner(stats: jnp.ndarray, tables: ScoringTables, noff: int):
    """In-graph global winner from sharded stats (f32 ranking).

    Returns (offset, maxrank, total_f32). Used by throughput paths that must
    avoid host transfers; exactness-critical flows use ops/select.py instead.
    """
    from psa_tpu.ops.common import keyed_f32_totals

    maxrank = stats[:, 4]
    keyed, total = keyed_f32_totals(stats[:, :4], maxrank, tables, noff)
    best = jnp.argmax(keyed)  # first occurrence = lowest offset on ties
    return best, maxrank[best], total[best]
