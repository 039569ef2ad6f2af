"""The hot Pallas TPU kernel: banded one-hot matmul sweep.

TPU-native replacement for the reference's CUDA grid kernel + tree reductions
(cuda_funcs.cu:149-264).  Per grid program (one tile of TO offsets),
for each 128-char chunk of Seq2:

  1. slice the Seq1 one-hot window (32, TO+C) int8 from VMEM,
  2. int8 MXU contraction against the per-position code columns (32, C):
       M[ii, oo+ii] = CODE[seq1[base+oo+ii], seq2[chunk+ii]]
     — one-hot, so every output is the exact table value (single nonzero
     product, no accumulation error),
  3. align the band with a PACKED-ROW SHEAR: bitcast packs 4 int8 code rows
     per int32 sublane, masked lane-rotations shift 4 rows at once, and a
     3-roll byte recombine applies the per-byte residual shift (the TPU
     answer to CUDA's per-thread strided indexing, cuda_funcs.cu:165-175),
  4. decode the 4 byte planes on the VPU: packed-field class counting (one
     int32 sum carries three class counts) and a max-code reduction (the
     fused code is monotone in substitution rank).

Outputs exact integer per-offset statistics; winner selection stays on the
host (ops/select.py).  There is no floating-point ambiguity anywhere on the
device, so the canonical tie-break survives any parallel execution order —
the property the reference gets from `is_swapable` (cuda_funcs.cu:290-307).

Measured on one TPU v5e chip (131072x8192, 1.0e9 pair-evals): 10.0 ms/sweep
= 1.0e11 pair-evals/s. The optimization history (each step bit-exact,
measured via chained-materialized timing — see docs/DESIGN.md §6):
59 -> 21.6 (lane-direction shear) -> 15.6 (2048 tiles) -> 13.8 (int8 MXU +
packed-field counts) -> 11.2 (packed-row shear) -> 10.0 ms (max-code rank).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from psa_tpu.core.alphabet import NCODES_PAD
from psa_tpu.core.tables import ScoringTables
from psa_tpu.ops.common import round_up

from psa_tpu.config import CONFIG

TILE_O = CONFIG.tile_offsets   # default offsets per grid program (PSA_TILE_OFFSETS)
CHUNK = 128                    # seq2 positions per inner step (= lane width)


def pick_tile(noff_like: int) -> int:
    """Largest tile <= TILE_O dividing a 512-aligned extent (bigger tiles
    amortize the window overlap: 15.2/17.0/21.6 ms per 1e9-pair sweep at
    2048/1024/512 on v5e)."""
    t = TILE_O
    while t > 512 and noff_like % t != 0:
        t //= 2
    return max(t, 512)


def size_tile(noff: int) -> int:
    """Tile for a fresh padding decision: big tiles only when the padding
    waste stays small."""
    t = TILE_O
    while t > 512 and noff < 4 * t:
        t //= 2
    return max(t, 512)
# Max Seq1 one-hot footprint kept VMEM-resident (int8: 32 * L1K bytes).
# Beyond this, shard the offset axis (parallel/mesh.py) so each shard's slice
# fits. Overridable via PSA_MAX_L1_VMEM.
MAX_L1_VMEM = CONFIG.max_l1_vmem


def _sweep_kernel_body(s1oh_ref, pc_ref, out_ref, acc_ref, *, nchunks: int,
                       tile_idx, tile_o: int):
    """Transposed layout: the band matrix lives as (C, TO+C) so the shear is
    LANE rotations (cheap on the VPU's lane shifter) and the reductions are
    sublane reductions — measured 3.3x faster than the row-sheared variant."""
    o0 = tile_idx * tile_o
    width = tile_o + CHUNK

    acc_ref[...] = jnp.zeros_like(acc_ref)

    # Packed-row shear: codes fit in int8, and bitcasting (C, W) int8 ->
    # (C/4, W) int32 packs row 4s+b into byte b of packed row s (verified on
    # hardware AND in interpret mode). Rolling 4 rows at once quarters the
    # shear traffic (the sweep's dominant cost: 9.4ms of 13.8 unpacked).
    srow = jax.lax.broadcasted_iota(jnp.int32, (CHUNK // 4, width), 0)

    def body(c, _):
        base = pl.multiple_of(o0 + c * CHUNK, CHUNK)
        win = s1oh_ref[:, pl.ds(base, width)]               # (32, TO+C) int8
        pcc = pc_ref[:, pl.ds(c * CHUNK, CHUNK)]            # (32, C) int8
        # int8 x int8 -> int32 MXU contraction; exact (one-hot: exactly one
        # nonzero product per output) and measured faster than bf16->f32.
        m = jax.lax.dot_general(
            pcc, win,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )                                                    # (C, TO+C)
        p = pltpu.bitcast(m.astype(jnp.int8), jnp.int32)     # (C/4, TO+C)
        # Shear step A: shift lanes left by 4*s via log-step masked rolls
        # (roll left by k == roll right by width - k; pltpu.roll wants
        # non-negative shifts).
        b = 1
        while b < CHUNK // 4:
            p = jnp.where((srow & b) != 0,
                          pltpu.roll(p, width - 4 * b, 1), p)
            b *= 2
        # Shear step B: byte b needs an extra left shift of b lanes.
        r1 = pltpu.roll(p, width - 1, 1)
        r2 = pltpu.roll(p, width - 2, 1)
        r3 = pltpu.roll(p, width - 3, 1)
        d4 = ((p & 0xFF) | (r1 & 0xFF00) | (r2 & 0xFF0000)
              | (r3 & np.int32(-16777216)))                  # (C/4, TO+C)
        d4 = d4[:, :tile_o]                                  # 4 packed code planes

        # Packed-field class counting per byte plane: code = 1 + cls +
        # 4*(rank+1), so (d & 3) maps cls0/1/2 -> 1/2/3 and {cls3, inert}
        # -> 0.  Summing 1 << 8*(d & 3) packs three per-chunk class counts
        # (each <= 128) into one int32; cls3 falls out of the valid count.
        # Wraparound at the top field is harmless: fields can't carry.
        for k in range(4):
            d = jax.lax.shift_right_logical(d4, 8 * k) & 0xFF  # (C/4, TO)
            t = d & 3
            contrib = jnp.where(t > 0, jnp.left_shift(jnp.int32(1), t << 3), 0)
            packed = jnp.sum(contrib, axis=0, keepdims=True)   # (1, TO)
            validc = jnp.sum((d > 0).astype(jnp.int32), axis=0, keepdims=True)
            c0 = (packed >> 8) & 0xFF
            c1 = (packed >> 16) & 0xFF
            c2 = (packed >> 24) & 0xFF
            acc_ref[0:1, :] += c0
            acc_ref[1:2, :] += c1
            acc_ref[2:3, :] += c2
            acc_ref[3:4, :] += validc - c0 - c1 - c2
            # code = 1 + cls + 4*(rank+1) is monotone in rank (cls < 4), so
            # tracking max CODE is cheaper than decoding ranks per plane;
            # wrappers convert via rank = max(((maxcode-1) >> 2) - 1, -1).
            acc_ref[4:5, :] = jnp.maximum(
                acc_ref[4:5, :], jnp.max(d, axis=0, keepdims=True)
            )
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)
    out_ref[...] = acc_ref[...]


def _sweep_kernel(s1oh_ref, pc_ref, out_ref, acc_ref, *, nchunks: int,
                  tile_o: int):
    _sweep_kernel_body(s1oh_ref, pc_ref, out_ref, acc_ref, nchunks=nchunks,
                       tile_idx=pl.program_id(0), tile_o=tile_o)


@functools.partial(jax.jit,
                   static_argnames=("noff_pad", "nchunks", "interpret", "tile_o"))
def _sweep_pallas(s1oh_t, pc, noff_pad: int, nchunks: int, interpret: bool,
                  tile_o: int | None = None):
    """Returns (8, noff_pad) int32: rows 0-3 = sign-class counts, row 4 =
    max fused CODE (0 = no substitution anywhere; convert to a rank with
    `maxrank_from_maxcode`), rows 5-7 reserved."""
    if tile_o is None:
        tile_o = pick_tile(noff_pad)
    ntiles = noff_pad // tile_o
    kernel = functools.partial(_sweep_kernel, nchunks=nchunks, tile_o=tile_o)
    return pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # full s1 one-hot resident
            pl.BlockSpec(memory_space=pltpu.VMEM),   # full pair-code columns
        ],
        out_specs=pl.BlockSpec((8, tile_o), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, noff_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, tile_o), jnp.int32)],
        interpret=interpret,
    )(s1oh_t, pc)


@functools.partial(jax.jit, static_argnames=("l1k", "l2p"))
def _prepare(codes1p, codes2p, code_tab, l1k: int, l2p: int):
    """Build device operands: transposed Seq1 one-hot + per-position codes."""
    from psa_tpu.core.alphabet import PAD_CODE

    c1 = jnp.full((l1k,), PAD_CODE, jnp.int32).at[: codes1p.shape[0]].set(codes1p)
    s1oh_t = jax.nn.one_hot(c1, NCODES_PAD, dtype=jnp.int8, axis=0)      # (32, L1K)
    c2 = jnp.full((l2p,), PAD_CODE, jnp.int32).at[: codes2p.shape[0]].set(codes2p)
    pc = code_tab[:, c2]                                                 # (32, L2P) int8
    return s1oh_t, pc


def maxrank_from_maxcode(maxcode):
    """rank = ((code-1) >> 2) - 1, clamped to -1 for 'no substitution'."""
    if isinstance(maxcode, np.ndarray):
        return np.maximum(((maxcode - 1) >> 2) - 1, -1)
    return jnp.maximum(((maxcode - 1) >> 2) - 1, -1)


def local_stats_pallas(c1_local: jnp.ndarray, c2p: jnp.ndarray,
                       code_tab: jnp.ndarray, per_shard: int, l2p: int,
                       interpret: bool | None = None):
    """Shard-local sweep for shard_map bodies -> (per_shard, 5) int32.

    c1_local: (per_shard + l2p,) int32 codes; c2p: (l2p,) int32 codes.
    per_shard must be a multiple of 512; l2p a multiple of CHUNK.
    """
    assert per_shard % 512 == 0 and l2p % CHUNK == 0
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s1oh_t = jax.nn.one_hot(c1_local, NCODES_PAD, dtype=jnp.int8, axis=0)
    pc = code_tab.astype(jnp.int8)[:, c2p]
    out = _sweep_pallas(s1oh_t, pc, per_shard, l2p // CHUNK, bool(interpret))
    maxrank = maxrank_from_maxcode(out[4:5, :])
    return jnp.concatenate([out[:4, :], maxrank], axis=0).T


def plan_shapes(n1: int, n2: int):
    """Static padded shapes for a (n1, n2) problem."""
    noff = n1 - n2 + 1
    l2p = round_up(max(n2, CHUNK), CHUNK)
    noff_pad = round_up(noff, size_tile(noff))
    l1k = noff_pad + l2p
    return noff, noff_pad, l2p, l1k


def offset_stats_pallas(codes1: np.ndarray, codes2: np.ndarray,
                        tables: ScoringTables, interpret: bool | None = None):
    codes1 = np.asarray(codes1, dtype=np.int32)
    codes2 = np.asarray(codes2, dtype=np.int32)
    noff, noff_pad, l2p, l1k = plan_shapes(codes1.shape[0], codes2.shape[0])
    if l1k > MAX_L1_VMEM:
        raise ValueError(
            f"seq1 window {l1k} exceeds single-kernel VMEM budget {MAX_L1_VMEM}; "
            "use the sharded search (psa_tpu.parallel.mesh) which slices seq1 "
            "per offset shard"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s1oh_t, pc = _prepare(jnp.asarray(codes1), jnp.asarray(codes2),
                          jnp.asarray(tables.code), l1k, l2p)
    out = _sweep_pallas(s1oh_t, pc, noff_pad, l2p // CHUNK, bool(interpret))
    out = np.asarray(out)
    return out[:4, :noff].T.copy(), maxrank_from_maxcode(out[4, :noff])
