"""Chunked gather engine — plain jnp under jit.

The straightforward XLA formulation of the sweep: per offset block, gather the
Seq1 windows and look pair codes up in the fused 32x32 table.  It is the
portable differential-reference path (runs on CPU/GPU/TPU, exact integer
outputs); the MXU-friendly paths live in engine_conv.py / pallas_sweep.py.

Replaces the reference CPU engine's per-offset loops (cpu_funcs.c:222-300) —
the substitution scan is gone entirely, folded into the code table.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from psa_tpu.core.tables import ScoringTables
from psa_tpu.ops.common import pad_query, round_up

_BLOCK = 512


def stats_from_codevals(codeval: jnp.ndarray):
    """Decode fused code values -> (counts (..., 4) i32, maxrank (...,) i32).

    codeval: int32 array (..., n2-axis last); 0 = inert.
    """
    valid = codeval > 0
    v = codeval - 1
    cls = jnp.where(valid, v & 3, -1)
    counts = jnp.stack(
        [(cls == k).sum(axis=-1, dtype=jnp.int32) for k in range(4)], axis=-1
    )
    rank = jnp.where(valid, (v >> 2) - 1, -1)
    maxrank = rank.max(axis=-1)
    return counts, maxrank


@partial(jax.jit, static_argnames=("noff_pad",))
def _sweep(codes1p, codes2p, code_flat, noff_pad: int):
    l2p = codes2p.shape[0]
    nblocks = noff_pad // _BLOCK

    def block(b):
        offs = b * _BLOCK + jnp.arange(_BLOCK)
        c1win = codes1p[offs[:, None] + jnp.arange(l2p)[None, :]]
        codeval = code_flat[c1win * 32 + codes2p[None, :]].astype(jnp.int32)
        return stats_from_codevals(codeval)

    counts, maxrank = jax.lax.map(block, jnp.arange(nblocks))
    return counts.reshape(-1, 4), maxrank.reshape(-1)


def offset_stats_xla(codes1: np.ndarray, codes2: np.ndarray, tables: ScoringTables):
    c1p, c2p, noff = pad_query(codes1, codes2)
    noff_pad = round_up(c1p.shape[0] - c2p.shape[0] + 1, _BLOCK)
    if c1p.shape[0] < noff_pad + c2p.shape[0] - 1:
        # extend seq1 padding so every padded offset has a full window
        from psa_tpu.core.alphabet import pad_codes

        c1p = pad_codes(c1p, noff_pad + c2p.shape[0] - 1)
    code_flat = jnp.asarray(tables.code.reshape(-1))
    counts, maxrank = _sweep(jnp.asarray(c1p), jnp.asarray(c2p), code_flat, noff_pad)
    return np.asarray(counts)[:noff], np.asarray(maxrank)[:noff]
