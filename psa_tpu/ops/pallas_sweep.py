"""The hot Pallas TPU kernel: banded one-hot matmul sweep.

TPU-native replacement for the reference's CUDA grid kernel + tree reductions
(cuda_funcs.cu:149-264).  Per grid program (one tile of TO offsets), for each
CHUNK-char chunk of Seq2:

  1. slice the Seq1 one-hot window (32, TO+C) int8 from VMEM,
  2. int8 MXU contraction against the per-position code columns (32, C),
     loaded in REVERSED in-chunk order (j = C-1-i):
       M[j, w] = CODE[seq1[base+w], seq2[chunk + C-1-j]]
     — one-hot, so every output is the exact table value (single nonzero
     product, no accumulation error),
  3. STRIDED-ROTATE SHEAR: bitcast packs 4 int8 code rows per int32 sublane;
     because the columns are reversed, the band-alignment shift is *linear*
     in the row index (slope +4 lanes per packed row), which is exactly one
     hardware strided rotate (tpu.RotateOp stride/stride_dimension, exposed
     as pltpu.roll(stride=...)). A 3-roll byte recombine applies the per-byte
     +b residual. This replaces the round-1 kernel's 5 masked log-rolls
     (the TPU answer to CUDA's per-thread strided indexing,
     cuda_funcs.cu:165-175),
  4. BIT-MASK decode on the packed planes with MXU-ASSISTED COUNTING: the
     2-bit class slots (code & 3) become 0/1-per-byte masks (2 ops each)
     that one ones(1,C) @ mask8 MXU dot each sums over every byte; the max
     fused code (monotone in substitution rank) accumulates across chunks
     as a SWAR byte-wise max on the packed band, decoded once per tile.

Outputs exact integer per-offset statistics; winner selection stays on the
host (ops/select.py).  There is no floating-point ambiguity anywhere on the
device, so the canonical tie-break survives any parallel execution order —
the property the reference gets from `is_swapable` (cuda_funcs.cu:290-307).

Measured on one TPU v5e chip (131072x8192, 1.0e9 pair-evals, chained-
materialized timing — docs/DESIGN.md §6), same-session ladder:
  round-1 kernel (masked-roll shear, packed-field counts) . 10.2 ms
  strided-rotate shear + SWAR equality counts, chunk 256 ..  6.64 ms
  bit-mask counts ......................................... 6.01 ms
  tile 4096 ............................................... 5.56 ms
  MXU-assisted mask counting .............................. 5.05 ms
  SWAR byte-max accumulation .............................. 4.94 ms
  (same kernel, 48-iter chain amortizing tunnel RPC) ...... 4.03 ms
  tile 32768 via raised scoped-VMEM limit + clean-input
  with_valid=False (current bench default) ................ 3.50 ms
= 2.87e11 pair-evals/s/chip.  Each step bit-exact vs the numpy oracle
(oracle-checked on hardware, not just interpret mode).  Like-for-like
tile effect alone: 3.64 -> 3.40 ms interleaved same-session (novalid);
see docs/DESIGN.md §6 for the attribution caveat.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from psa_tpu.core.alphabet import NCODES_PAD, PAD_CODE
from psa_tpu.core.tables import ScoringTables
from psa_tpu.ops.common import round_up

from psa_tpu.config import CONFIG

# Default offsets per grid program (PSA_TILE_OFFSETS), clamped at 32768:
# above that the kernel stack (the (C, T+C) int32 contraction output + shear
# temporaries, ~3.3KB per offset at chunk 256) exceeds v5e's 128MB physical
# VMEM — no scoped-VMEM limit can admit it.
TILE_O = min(CONFIG.tile_offsets, 32768)
CHUNK = 128                    # seq2 padding granularity (min chunk)
# 512 is SWAR-safe (per-field counts <= 128 < 256) and bit-exact in
# interpret mode, but at tile 4096 its VMEM footprint is borderline
# (~16MB core budget); 256 is the measured-on-chip default.
MAX_CHUNK = 256
# Peel chunk 0 (write-instead-of-accumulate, deleting the per-tile
# accumulator zeroing) only below this chunk count: measured +4% at
# nchunks=2 (serving shapes) but -2.5% at nchunks=256 (the duplicated
# chunk body costs more than the amortized zeroing saves) — 2026-08-19
# interleaved A/B, see _sweep_kernel.
PEEL_MAX_NCHUNKS = 8

# SWAR constants (packed 4x int8 per int32 lane)
_H = np.int32(-2139062144)     # 0x80808080
_L7 = np.int32(0x7F7F7F7F)
_B1 = np.int32(0x01010101)
_BYTE3 = np.int32(-16777216)   # 0xFF000000


# Measured-safe scoped-VMEM requests for the single-query kernel at
# chunk<=256 (each compiled + parity-checked on a v5e chip).  16MB is
# Mosaic's default for tiles <= 4096.  Tiles beyond 32768 are impossible on
# v5e (see TILE_O) so no entry exists for them.
_MEASURED_LIMIT_MB = {8192: 48, 16384: 100, 32768: 110}
# Extra kernel stack the BATCHED kernel adds on top of the single-query
# stack and that is covered by the base request without raising it: the
# hardware-validated 1M-char hbm1 run at tile 32768 carried ~5.8MB of
# expand/scratch on the 110MB request.
_VALIDATED_EXTRA = 6 * 1024 * 1024
# Never request more than this (v5e physical VMEM is 128MB/core and the
# pipeline's block buffers need headroom; 110MB is the largest measured
# request — the band up to 116MB is extrapolation, used only for configs
# whose extra stack exceeds the validated envelope).
_VMEM_REQUEST_CAP = 116 * 1024 * 1024


def _single_limit_bytes(tile_o: int) -> int:
    return _MEASURED_LIMIT_MB.get(min(tile_o, 32768), 16) * 1024 * 1024


def _compiler_params(tile_o: int, extra_bytes: int = 0):
    """Mosaic scoped-VMEM limit for big offset tiles.

    The default 16MB scoped-vmem limit caps the tile at 4096 (the per-chunk
    (C, T+C) int32 contraction output + shear temporaries live on the kernel
    stack).  Bigger tiles amortize the window overlap and the per-tile
    epilogue and measured strictly faster on v5e (3.64 / 3.46 / 3.47 / 3.40
    ms per 131072x8192 sweep at tile 4096 / 8192 / 16384 / 32768, interleaved
    same-session), so raise the limit with the tile.

    `extra_bytes`: additional stack the caller's kernel variant needs beyond
    the single-query kernel (the batched kernel's in-kernel one-hot expand).
    Within the hardware-validated envelope the measured request already
    covers it; beyond, the request grows (capped at _VMEM_REQUEST_CAP —
    callers must shrink the tile rather than exceed the cap).
    """
    if tile_o <= 4096 and extra_bytes <= _VALIDATED_EXTRA:
        return {}
    base = _single_limit_bytes(tile_o)
    limit = base if extra_bytes <= _VALIDATED_EXTRA else min(
        base + extra_bytes, _VMEM_REQUEST_CAP)
    return {"compiler_params": pltpu.CompilerParams(vmem_limit_bytes=limit)}


def pick_chunk(l2p: int) -> int:
    """Largest supported chunk dividing l2p (bigger chunks amortize the
    per-chunk matmul/shear fixed costs; 256 measured 6.0 vs 6.6 ms at 128)."""
    c = MAX_CHUNK
    while c > CHUNK and l2p % c != 0:
        c //= 2
    return c


def pick_tile(noff_like: int) -> int:
    """Largest tile <= TILE_O dividing a 512-aligned extent (bigger tiles
    amortize the window overlap: 5.6/6.0/6.6 ms per 1e9-pair sweep at
    4096/2048/1024 on v5e)."""
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

# Batched kernel: VMEM budget (bytes) for the per-tile resident one-hot +
# code window + column scratch (all scale with l2p); larger Seq2 streams
# per-chunk windows instead (constant VMEM).
RESIDENT_L2_BUDGET = 6 * 1024 * 1024


def _shear_stride(m8, width: int, tile_o: int, chunk: int):
    """One strided rotate + 3 byte-recombine rolls -> packed aligned band.

    Requires pc columns REVERSED (j = C-1-i): the band element for offset o
    sits at lane o + C-1-j of row j, so the alignment shift is
    (width-C+1) + j — slope +4 per packed int32 row.
    """
    p = pltpu.bitcast(m8, jnp.int32)                      # (C/4, W)
    p = pltpu.roll(p, width - chunk + 1, 1, stride=4, stride_axis=0)
    r1 = pltpu.roll(p, 1, 1)
    r2 = pltpu.roll(p, 2, 1)
    r3 = pltpu.roll(p, 3, 1)
    d4 = ((p & 0xFF) | (r1 & 0xFF00) | (r2 & 0xFF0000) | (r3 & _BYTE3))
    return d4[:, :tile_o]


def _count_mxu(mask_i32, ones_row):
    """Packed 0/1-per-byte mask (C/4, T) int32 -> (1, T) int32 byte count.

    Counting on the MXU instead of VPU sublane reductions measured
    5.56 -> 5.05 ms on the 1e9-pair sweep: one ones(1,C) @ mask8 dot sums
    every byte, so the 16-bit horizontal fold disappears too. The bitcast
    int32 -> int8 is a bit reinterpretation (packed rows ARE the bytes).
    """
    m8 = pltpu.bitcast(mask_i32, jnp.int8)            # (C, T) int8, 0/1
    return jax.lax.dot_general(
        ones_row, m8,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                 # (1, T)


def _swar_bytemax(a, b):
    """Byte-wise max of packed int32 words (all bytes <= 126)."""
    ge = ((a | _H) - b) & _H            # bit7 per byte iff a_byte >= b_byte
    e = jax.lax.shift_right_logical(ge, 7)
    sel = (ge - e) | ge                 # 0xFF per byte where a >= b
    return b ^ ((a ^ b) & sel)


def _plane_max(p, acc_ref):
    """Per-offset max over the packed band's 4 byte planes + sublanes."""
    d0 = p & 0xFF
    d1 = jax.lax.shift_right_logical(p, 8) & 0xFF
    d2 = jax.lax.shift_right_logical(p, 16) & 0xFF
    d3 = jax.lax.shift_right_logical(p, 24) & 0xFF
    dm = jnp.maximum(jnp.maximum(d0, d1), jnp.maximum(d2, d3))
    acc_ref[4:5, :] = jnp.maximum(
        acc_ref[4:5, :], jnp.max(dm, axis=0, keepdims=True))


def _contract_decode_accumulate(pcc, win, acc_ref, *, width: int,
                                tile_o: int, chunk: int, macc_ref=None,
                                with_valid: bool = True,
                                first: bool = False):
    """One chunk's work: MXU contraction, shear, SWAR decode, accumulate.

    first=True (the peeled chunk 0): WRITE the accumulators instead of
    zero-then-accumulate, deleting the per-query/tile (chunk/4+8, tile)
    zeroing passes — at serving shapes (nchunks=2) the zeroing is a
    measurable share of the per-query fixed cost.

    NOTE (measured dead end): asking the dot for int8 output to skip the
    int32->int8 cast is rejected by Mosaic ("matmul acc must be 32-bit").
    """
    m = jax.lax.dot_general(
        pcc, win,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                 # (C, W) int32
    p = _shear_stride(m.astype(jnp.int8), width, tile_o, chunk)
    # max fused code (monotone in substitution rank): accumulate byte-wise
    # across chunks on the packed band — 9 elementwise ops, no per-chunk
    # plane unpack or sublane reduction (5.05 -> 4.94 ms); the caller
    # decodes macc once per tile via _plane_max.
    # (Measured dead end: replacing this with ONE int8 elementwise
    # jnp.maximum on the byte view fails to compile — Mosaic cannot
    # legalize arith.maxsi/maxui on vector<i8>, the elementwise sibling of
    # its unimplemented int8 reductions.  9-op SWAR stands.)
    if first:
        macc_ref[...] = p
    else:
        macc_ref[...] = _swar_bytemax(macc_ref[...], p)
    # 2-bit class slots per byte: (code & 3) = 1+cls mod 4, so slot
    # value 1 = cls0, 2 = cls1, 3 = cls2, 0 = {cls3, inert}.  Count via
    # raw bit masks: n13 = slots with bit0 (values 1,3), n23 = bit1
    # (2,3), n3 = m13 & m23 (both masks are 0/1-per-byte at bit0, so their
    # AND is the value-3 mask — one op, vs rebuilding p & pb & _B1);
    # counts on the MXU.
    pb = jax.lax.shift_right_logical(p, 1)
    ones_row = jnp.ones((1, chunk), jnp.int8)
    m13 = p & _B1
    m23 = pb & _B1
    n13 = _count_mxu(m13, ones_row)
    n23 = _count_mxu(m23, ones_row)
    n3 = _count_mxu(m13 & m23, ones_row)
    c0 = n13 - n3                                     # cls0 count
    c1 = n23 - n3                                     # cls1 count
    c3 = None
    if with_valid:
        # valid = nonzero bytes; cls3 = valid - cls0 - cls1 - cls2. Only
        # needed when the input may contain OTHER (out-of-range) chars —
        # for clean inputs the wrapper reconstructs cls3 as n2 - the rest
        # (every real pair position is valid), saving this mask + dot.
        hit = (p + _L7) & _H                          # bytes <= 126
        hv = jax.lax.shift_right_logical(hit, 7) & _B1
        vv = _count_mxu(hv, ones_row)
        c3 = vv - c0 - c1 - n3                        # cls3 count
    if first:
        acc_ref[0:1, :] = c0
        acc_ref[1:2, :] = c1
        acc_ref[2:3, :] = n3                          # cls2 count
        acc_ref[3:4, :] = c3 if c3 is not None else jnp.zeros_like(c0)
        # rows 4-7 (maxrank slot + reserved) still need clearing once per
        # query/tile — (4, T) instead of the old (8 + chunk/4, T) zeroing
        acc_ref[4:8, :] = jnp.zeros_like(acc_ref[4:8, :])
    else:
        acc_ref[0:1, :] += c0
        acc_ref[1:2, :] += c1
        acc_ref[2:3, :] += n3                         # cls2 count
        if c3 is not None:
            acc_ref[3:4, :] += c3


def _sweep_kernel(pc_ref, s1oh_ref, out_ref, acc_ref, macc_ref, *,
                  nchunks: int, tile_o: int, chunk: int,
                  with_valid: bool = True):
    o0 = pl.program_id(0) * tile_o
    width = tile_o + chunk

    def body(c, _):
        base = pl.multiple_of(o0 + c * chunk, chunk)
        win = s1oh_ref[:, pl.ds(base, width)]             # (32, W) int8
        pcc = pc_ref[c]                                   # (32, C) int8 rev
        _contract_decode_accumulate(pcc, win, acc_ref, width=width,
                                    tile_o=tile_o, chunk=chunk,
                                    macc_ref=macc_ref, with_valid=with_valid)
        return 0

    # chunk 0 peeled with first=True: it WRITES the accumulators, deleting
    # the per-tile (8 + chunk/4, tile) zeroing passes.  Gated on nchunks:
    # measured (interleaved same-session A/B, 2026-08-19) +4% at nchunks=2
    # (serving shapes, fixed cost matters) but -2.5% at nchunks=256
    # (131072x8192: 3.27 -> 3.35 ms — the duplicated chunk body outside the
    # fori_loop costs more than the amortized-to-nothing zeroing saves).
    if nchunks <= PEEL_MAX_NCHUNKS:
        _contract_decode_accumulate(
            pc_ref[0], s1oh_ref[:, pl.ds(pl.multiple_of(o0, chunk), width)],
            acc_ref, width=width, tile_o=tile_o, chunk=chunk,
            macc_ref=macc_ref, with_valid=with_valid, first=True)
        lo = 1
    else:
        acc_ref[...] = jnp.zeros_like(acc_ref)
        macc_ref[...] = jnp.zeros_like(macc_ref)
        lo = 0
    jax.lax.fori_loop(lo, nchunks, body, 0)
    _plane_max(macc_ref[...], acc_ref)
    out_ref[...] = acc_ref[...]


def _batched_resident(tile_o: int, l2p: int) -> bool:
    """Resident scratch (one-hot + window + columns) scales with l2p; beyond
    a budget the kernel streams per-chunk windows (constant VMEM in l2p) so
    Seq2 length stays HBM-bounded like Seq1."""
    return 36 * (tile_o + l2p) + 32 * l2p <= RESIDENT_L2_BUDGET


def _batched_extra_bytes(tile_o: int, l2p: int, chunk: int,
                         resident: bool) -> int:
    """In-kernel expand stack the batched kernel adds beyond the single-query
    kernel: iota (32, span) int32 + the one-hot compare/scratch.  The
    resident variant also holds the full (nchunks, 32, chunk) column scratch;
    the streaming variant's buffers are constant in l2p."""
    if resident:
        return 164 * (tile_o + l2p) + 32 * l2p
    return 170 * (tile_o + chunk)


def batched_plan(noff_pad: int, l2p: int, chunk: int):
    """(tile, resident, extra_stack_bytes) for the batched kernel: the
    measured single-kernel request + this variant's expand stack must fit
    under the VMEM request cap; shrink the tile (which shrinks both terms)
    until it does."""
    tile = pick_tile(noff_pad)
    while True:
        res = _batched_resident(tile, l2p)
        extra = _batched_extra_bytes(tile, l2p, chunk, res)
        if tile <= 512 or _single_limit_bytes(tile) + extra <= _VMEM_REQUEST_CAP:
            return tile, res, extra
        tile //= 2


def _sweep_kernel_batched(pc_ref, s1c_ref, out_ref, acc_ref, macc_ref,
                          cscr_ref, oh_ref, pcq_ref, sems, *, nchunks: int,
                          tile_o: int, chunk: int, l1q: int, resident: bool):
    """Fused multi-query sweep: grid (B, ntiles); operands stay in HBM.

    (A multi-query-per-program restructure was built and measured a dead
    end — 8.33/8.31/8.31 us/query at qpp 1/2/4 interleaved, TODO.md — so
    the per-query overhead is the expand/zero work, not the grid-program
    boundary; one query per program stays.)

    Replaces the lax.scan-of-sweeps batch path whose per-query dispatch
    overhead (~350us) dwarfed the actual work for serving-sized queries;
    one pallas_call now covers the whole batch.  The HBM residency also
    means Seq1 length is bounded by HBM, not VMEM.

    Seq1 arrives as RAW CODES (replicated to 4 sublanes — Mosaic's int8
    tiling rejects 1-sublane slices) and is one-hot expanded in-kernel by
    an iota-compare.  The earlier one-hot-operand design moved 32 bytes
    per char per tile over HBM and needed a 52 ms host-side one_hot
    materialization pass at B=1000 — both costs collapse to 4 bytes per
    char and one in-kernel compare.

    resident=True (serving-sized Seq2): ONE (4, span) code-window DMA and
    one (32, span) expand per tile, chunk views sliced from the resident
    one-hot.  resident=False (Seq2 beyond the VMEM budget): per-chunk
    double-buffered (4, width) window + (32, chunk) column DMAs with a
    per-chunk expand — VMEM use is constant in l2p, so Seq2 is HBM-bounded
    too (the expand recomputes the tile_o-wide overlap each chunk).
    """
    o0 = pl.program_id(1) * tile_o
    width = tile_o + chunk
    q = pl.program_id(0)

    if resident:
        span = tile_o + nchunks * chunk
        base = pl.multiple_of(q * l1q + o0, chunk)
        cp_c = pltpu.make_async_copy(s1c_ref.at[:, pl.ds(base, span)],
                                     cscr_ref, sems.at[0, 0])
        cp_pc = pltpu.make_async_copy(pc_ref.at[q], pcq_ref, sems.at[0, 1])
        cp_c.start()
        cp_pc.start()
        cp_c.wait()
        cp_pc.wait()
        iota = jax.lax.broadcasted_iota(jnp.int32, (32, span), 0)
        row = cscr_ref[0:1, :].astype(jnp.int32)
        oh_ref[...] = (iota == row).astype(jnp.int8)

        def body(c, _):
            win = oh_ref[:, pl.ds(pl.multiple_of(c * chunk, chunk), width)]
            _contract_decode_accumulate(pcq_ref[c], win, acc_ref,
                                        width=width, tile_o=tile_o,
                                        chunk=chunk, macc_ref=macc_ref)
            return 0

        # chunk 0 peeled with first=True: writes the accumulators, deleting
        # the per-query (8 + chunk/4, tile) zeroing — measured +4% at
        # serving shapes (nchunks=2: 6.99 -> 6.69 us/query interleaved) but
        # a ~2.5% loss at large nchunks (see _sweep_kernel), hence the gate
        if nchunks <= PEEL_MAX_NCHUNKS:
            _contract_decode_accumulate(pcq_ref[0],
                                        oh_ref[:, pl.ds(0, width)],
                                        acc_ref, width=width, tile_o=tile_o,
                                        chunk=chunk, macc_ref=macc_ref,
                                        first=True)
            lo = 1
        else:
            acc_ref[...] = jnp.zeros_like(acc_ref)
            macc_ref[...] = jnp.zeros_like(macc_ref)
            lo = 0
        jax.lax.fori_loop(lo, nchunks, body, 0)
    else:
        def dmas(c, slot):
            base = pl.multiple_of(q * l1q + o0 + c * chunk, chunk)
            return (pltpu.make_async_copy(
                        s1c_ref.at[:, pl.ds(base, width)],
                        cscr_ref.at[slot], sems.at[slot, 0]),
                    pltpu.make_async_copy(pc_ref.at[q, c],
                                          pcq_ref.at[slot],
                                          sems.at[slot, 1]))

        for d in dmas(0, 0):
            d.start()
        iota = jax.lax.broadcasted_iota(jnp.int32, (32, width), 0)

        def expand(slot):
            row = cscr_ref[slot, 0:1, :].astype(jnp.int32)
            return (iota == row).astype(jnp.int8)

        def body(c, _):
            slot = jax.lax.rem(c, 2)
            nxt = jax.lax.rem(c + 1, 2)

            @pl.when(c + 1 < nchunks)
            def _():
                for d in dmas(c + 1, nxt):
                    d.start()

            for d in dmas(c, slot):
                d.wait()
            _contract_decode_accumulate(pcq_ref[slot], expand(slot), acc_ref,
                                        width=width, tile_o=tile_o,
                                        chunk=chunk, macc_ref=macc_ref)
            return 0

        # peeled chunk 0 (first=True), mirroring the loop body's prefetch;
        # same nchunks gate as the resident branch (streaming shapes are
        # large-nchunks by construction, so this normally takes the else)
        if nchunks <= PEEL_MAX_NCHUNKS:
            if nchunks > 1:
                for d in dmas(1, 1):
                    d.start()
            for d in dmas(0, 0):
                d.wait()
            _contract_decode_accumulate(pcq_ref[0], expand(0), acc_ref,
                                        width=width, tile_o=tile_o,
                                        chunk=chunk, macc_ref=macc_ref,
                                        first=True)
            lo = 1
        else:
            acc_ref[...] = jnp.zeros_like(acc_ref)
            macc_ref[...] = jnp.zeros_like(macc_ref)
            lo = 0
        jax.lax.fori_loop(lo, nchunks, body, 0)
    _plane_max(macc_ref[...], acc_ref)
    out_ref[0] = acc_ref[...]


def _sweep_kernel_batched_shared(pc_ref, s1c_ref, out_ref, acc_ref, macc_ref,
                                 cscr_ref, oh_ref, pcq_ref, sems, *,
                                 nchunks: int, tile_o: int, chunk: int):
    """Shared-Seq1 fused batch sweep: grid (ntiles, B), B innermost.

    The flagship serving pattern is many Seq2 reads against ONE Seq1
    reference (models/batch.pack_query_inputs_shared).  The plain batched
    kernel's grid is (B, ntiles) and every program re-DMAs and re-one-hot-
    expands its own Seq1 window — for a shared-Seq1 microbatch that is B-1
    redundant (4, span) DMAs and (32, span) expands per tile, and the
    expand/zero work is the measured ~4.8 us/query fixed cost (TODO.md QPP
    post-mortem).  Here the grid runs B fastest within each tile and the
    window DMA + expand happen ONCE per tile, in the q == 0 program; VMEM
    scratch persists across grid steps on TPU (the grid is a sequential
    loop on the core), so programs q > 0 reuse the resident one-hot.  The
    reference analog: one device copy of ProgramData serves every CUDA
    block and thread (cuda_funcs.cu:43-69).

    Resident-Seq2 shapes only (the serving regime); streaming shapes take
    the plain batched kernel.  s1c_ref: (4, l1k) shared raw codes in HBM —
    l1k, not B*l1k: the operand itself deduplicates.
    """
    t = pl.program_id(0)
    q = pl.program_id(1)
    o0 = t * tile_o
    width = tile_o + chunk
    span = tile_o + nchunks * chunk

    # per-query code columns: every program fetches its own query's columns
    cp_pc = pltpu.make_async_copy(pc_ref.at[q], pcq_ref, sems.at[0, 1])
    cp_pc.start()

    @pl.when(q == 0)
    def _():
        # once per TILE: DMA the shared Seq1 window and expand its one-hot
        cp_c = pltpu.make_async_copy(
            s1c_ref.at[:, pl.ds(pl.multiple_of(o0, chunk), span)],
            cscr_ref, sems.at[0, 0])
        cp_c.start()
        cp_c.wait()
        iota = jax.lax.broadcasted_iota(jnp.int32, (32, span), 0)
        row = cscr_ref[0:1, :].astype(jnp.int32)
        oh_ref[...] = (iota == row).astype(jnp.int8)

    cp_pc.wait()

    def body(c, _):
        win = oh_ref[:, pl.ds(pl.multiple_of(c * chunk, chunk), width)]
        _contract_decode_accumulate(pcq_ref[c], win, acc_ref, width=width,
                                    tile_o=tile_o, chunk=chunk,
                                    macc_ref=macc_ref)
        return 0

    # same gated chunk-0 peel as the plain batched kernel (serving shapes
    # are small-nchunks, where the peel's zeroing deletion measured +4%)
    if nchunks <= PEEL_MAX_NCHUNKS:
        _contract_decode_accumulate(pcq_ref[0], oh_ref[:, pl.ds(0, width)],
                                    acc_ref, width=width, tile_o=tile_o,
                                    chunk=chunk, macc_ref=macc_ref,
                                    first=True)
        lo = 1
    else:
        acc_ref[...] = jnp.zeros_like(acc_ref)
        macc_ref[...] = jnp.zeros_like(macc_ref)
        lo = 0
    jax.lax.fori_loop(lo, nchunks, body, 0)
    _plane_max(macc_ref[...], acc_ref)
    out_ref[0] = acc_ref[...]


@functools.partial(jax.jit,
                   static_argnames=("b", "noff_pad", "l2p", "interpret",
                                    "tile_o"))
def _sweep_pallas_batched_shared(s1c, pc_all, b: int, noff_pad: int,
                                 l2p: int, interpret: bool,
                                 tile_o: int | None = None):
    """Shared-Seq1 batched sweep -> (B, 8, noff_pad) int32.

    s1c: (4, l1k) int8 raw codes of the ONE shared Seq1 (4 identical
    sublane rows); pc_all: (B, nchunks, 32, chunk) int8 reversed code
    columns, as in `_sweep_pallas_batched`.  Caller must check
    `_batched_resident(tile, l2p)` (shared dedup targets the resident
    serving regime; streaming shapes use the plain kernel)."""
    chunk = pc_all.shape[3]
    nchunks = pc_all.shape[1]
    if tile_o is None:
        tile_o, _, _ = batched_plan(noff_pad, l2p, chunk)
    extra = _batched_extra_bytes(tile_o, l2p, chunk, True)
    span = tile_o + l2p
    ntiles = noff_pad // tile_o
    kernel = functools.partial(_sweep_kernel_batched_shared, nchunks=nchunks,
                               tile_o=tile_o, chunk=chunk)
    return pl.pallas_call(
        kernel,
        grid=(ntiles, b),                     # B innermost: expand per TILE
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # pc_all in HBM
            pl.BlockSpec(memory_space=pl.ANY),    # s1c in HBM (one copy)
        ],
        out_specs=pl.BlockSpec((1, 8, tile_o), lambda t, g: (g, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 8, noff_pad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((8, tile_o), jnp.int32),
            pltpu.VMEM((chunk // 4, tile_o), jnp.int32),   # packed max acc
            pltpu.VMEM((4, span), jnp.int8),               # tile code window
            pltpu.VMEM((32, span), jnp.int8),              # tile one-hot
            pltpu.VMEM((nchunks, 32, chunk), jnp.int8),    # query code cols
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
        **_compiler_params(tile_o, extra),
    )(pc_all, s1c)


@functools.partial(jax.jit,
                   static_argnames=("b", "noff_pad", "l2p", "interpret",
                                    "tile_o", "resident"))
def _sweep_pallas_batched(s1c_all, pc_all, b: int, noff_pad: int, l2p: int,
                          interpret: bool, tile_o: int | None = None,
                          resident: bool | None = None):
    """Batched sweep -> (B, 8, noff_pad) int32.

    s1c_all: (4, B * (noff_pad + l2p)) int8 raw codes, 4 identical sublane
    rows (queries concatenated, each padded to the same l1q stride);
    pc_all: (B, nchunks, 32, chunk) int8 code columns, reversed in-chunk
    (see _shear_stride).
    """
    chunk = pc_all.shape[3]
    nchunks = pc_all.shape[1]
    l1q = noff_pad + l2p
    if tile_o is None:
        tile_o, _, _ = batched_plan(noff_pad, l2p, chunk)
    if resident is None:
        resident = _batched_resident(tile_o, l2p)
    extra = _batched_extra_bytes(tile_o, l2p, chunk, resident)
    span = tile_o + l2p
    width = tile_o + chunk
    ntiles = noff_pad // tile_o
    kernel = functools.partial(_sweep_kernel_batched, nchunks=nchunks,
                               tile_o=tile_o, chunk=chunk, l1q=l1q,
                               resident=resident)
    if resident:
        buf_shapes = [
            pltpu.VMEM((4, span), jnp.int8),               # tile code window
            pltpu.VMEM((32, span), jnp.int8),              # tile one-hot
            pltpu.VMEM((nchunks, 32, chunk), jnp.int8),    # query code cols
        ]
    else:
        buf_shapes = [
            pltpu.VMEM((2, 4, width), jnp.int8),           # chunk windows x2
            pltpu.VMEM((1, 1), jnp.int8),                  # (unused)
            pltpu.VMEM((2, 32, chunk), jnp.int8),          # chunk columns x2
        ]
    return pl.pallas_call(
        kernel,
        grid=(b, ntiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # pc_all in HBM
            pl.BlockSpec(memory_space=pl.ANY),    # s1c_all in HBM
        ],
        out_specs=pl.BlockSpec((1, 8, tile_o), lambda g, t: (g, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 8, noff_pad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((8, tile_o), jnp.int32),
            pltpu.VMEM((chunk // 4, tile_o), jnp.int32),   # packed max acc
            *buf_shapes,
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
        **_compiler_params(tile_o, extra),
    )(pc_all, s1c_all)


@functools.partial(jax.jit,
                   static_argnames=("noff_pad", "nchunks", "interpret",
                                    "tile_o", "with_valid"))
def _sweep_pallas(s1oh_t, pc, noff_pad: int, nchunks: int, interpret: bool,
                  tile_o: int | None = None, with_valid: bool = True):
    """Returns (8, noff_pad) int32: rows 0-3 = sign-class counts, row 4 =
    max fused CODE (0 = no substitution anywhere; convert to a rank with
    `maxrank_from_maxcode`), rows 5-7 reserved.

    s1oh_t: (32, L1K) int8 one-hot; pc: (32, L2P) int8 per-position codes
    with L2P = nchunks * CHUNK.  The kernel re-chunks to the largest
    supported chunk size internally (pc columns reversed per chunk for the
    strided-rotate shear).
    """
    if tile_o is None:
        tile_o = pick_tile(noff_pad)
    l2p = nchunks * CHUNK
    chunk = pick_chunk(l2p)
    nck = l2p // chunk
    pc3 = pc.reshape(32, nck, chunk).transpose(1, 0, 2)[:, :, ::-1]
    ntiles = noff_pad // tile_o
    kernel = functools.partial(_sweep_kernel, nchunks=nck, tile_o=tile_o,
                               chunk=chunk, with_valid=with_valid)
    macc_scratch = pltpu.VMEM((chunk // 4, tile_o), jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # per-chunk code columns
            pl.BlockSpec(memory_space=pltpu.VMEM),   # full s1 one-hot resident
        ],
        out_specs=pl.BlockSpec((8, tile_o), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, noff_pad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((8, tile_o), jnp.int32),
            macc_scratch,                                  # packed max acc
        ],
        interpret=interpret,
        **_compiler_params(tile_o),
    )(pc3, s1oh_t)


@functools.partial(jax.jit, static_argnames=("l1k", "l2p"))
def _prepare_codes(codes1p, codes2p, code_tab, l1k: int, l2p: int):
    """Pad Seq1 codes + build per-position Seq2 code columns."""
    c1 = jnp.full((l1k,), PAD_CODE, jnp.int32).at[: codes1p.shape[0]].set(codes1p)
    c2 = jnp.full((l2p,), PAD_CODE, jnp.int32).at[: codes2p.shape[0]].set(codes2p)
    pc = code_tab[:, c2]                                                 # (32, L2P) int8
    return c1, pc


@functools.partial(jax.jit, static_argnames=("l1k", "l2p"))
def _prepare(codes1p, codes2p, code_tab, l1k: int, l2p: int):
    """Build device operands: transposed Seq1 one-hot + per-position codes."""
    c1, pc = _prepare_codes(codes1p, codes2p, code_tab, l1k, l2p)
    s1oh_t = jax.nn.one_hot(c1, NCODES_PAD, dtype=jnp.int8, axis=0)      # (32, L1K)
    return s1oh_t, pc


def maxrank_from_maxcode(maxcode):
    """rank = ((code-1) >> 2) - 1, clamped to -1 for 'no substitution'."""
    if isinstance(maxcode, np.ndarray):
        return np.maximum(((maxcode - 1) >> 2) - 1, -1)
    return jnp.maximum(((maxcode - 1) >> 2) - 1, -1)


def local_stats_rows_pallas(c1_local: jnp.ndarray, c2p: jnp.ndarray,
                            code_tab: jnp.ndarray, per_shard: int, l2p: int,
                            interpret: bool | None = None):
    """Shard-local sweep for shard_map bodies -> (5, per_shard) int32 in the
    TPU-friendly rows layout (offset axis minor; rows 0-3 class counts,
    row 4 maxrank).

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
    return jnp.concatenate([out[:4, :], maxrank], axis=0)


def local_stats_pallas(c1_local: jnp.ndarray, c2p: jnp.ndarray,
                       code_tab: jnp.ndarray, per_shard: int, l2p: int,
                       interpret: bool | None = None):
    """Stats-minor wrapper over `local_stats_rows_pallas` -> (per_shard, 5)."""
    return local_stats_rows_pallas(c1_local, c2p, code_tab, per_shard, l2p,
                                   interpret).T


@functools.lru_cache(maxsize=65536)
def plan_shapes(n1: int, n2: int):
    """Static padded shapes for a (n1, n2) problem.  Pure int math, memoized:
    the serve path calls it per query while bucketing (models/batch.py), and
    serving chunks repeat a handful of shapes thousands of times."""
    noff = n1 - n2 + 1
    l2p = round_up(max(n2, CHUNK), CHUNK)
    if l2p > MAX_CHUNK:
        # round to the large chunk so pick_chunk can use it: chunk 128 was
        # measured ~25% slower than 256 on the 1M-char query (64 -> 52 ms)
        l2p = round_up(l2p, MAX_CHUNK)
    noff_pad = round_up(noff, size_tile(noff))
    l1k = noff_pad + l2p
    return noff, noff_pad, l2p, l1k


@functools.partial(jax.jit, static_argnames=("b", "noff_pad", "l2p",
                                             "interpret", "tile_o"))
def _sweep_pallas_hbm1(s1c, pc, b: int, noff_pad: int, l2p: int,
                       interpret: bool, tile_o: int | None = None):
    """Single-query HBM-streaming sweep via the batched kernel (B=1):
    the raw codes stay in HBM (4 bytes/char after sublane replication) and
    each tile's window DMAs into VMEM, so Seq1 length is bounded by HBM —
    no VMEM cap, no sharding required.  s1c: (l1k,) int32 codes."""
    chunk = pick_chunk(l2p)
    nck = l2p // chunk
    pc_all = pc.reshape(32, nck, chunk).transpose(1, 0, 2)[None, :, :, ::-1]
    s1c4 = jnp.broadcast_to(s1c.astype(jnp.int8)[None, :], (4, s1c.shape[0]))
    return _sweep_pallas_batched(s1c4, pc_all, 1,
                                 noff_pad, l2p, interpret, tile_o)[0]


def offset_stats_pallas(codes1: np.ndarray, codes2: np.ndarray,
                        tables: ScoringTables, interpret: bool | None = None):
    from psa_tpu.core.alphabet import OTHER_CODE

    codes1 = np.asarray(codes1, dtype=np.int32)
    codes2 = np.asarray(codes2, dtype=np.int32)
    n2 = int(codes2.shape[0])
    noff, noff_pad, l2p, l1k = plan_shapes(codes1.shape[0], n2)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # Clean inputs (no out-of-range chars — the strict-alphabet default):
    # every real pair position is valid, so cls3 = n2 - cls0 - cls1 - cls2
    # on the host and the kernel skips its valid-count mask + dot.
    clean = not (np.any(codes1 == OTHER_CODE) or np.any(codes2 == OTHER_CODE))
    if l1k > MAX_L1_VMEM:
        # beyond the VMEM-resident budget, stream raw Seq1 code windows per
        # tile from HBM (the batched kernel's DMA path with B=1)
        c1p, pc = _prepare_codes(jnp.asarray(codes1), jnp.asarray(codes2),
                                 jnp.asarray(tables.code), l1k, l2p)
        out = _sweep_pallas_hbm1(c1p, pc, 1, noff_pad, l2p,
                                 bool(interpret))
        clean = False  # batched kernel keeps the valid count in-kernel
    else:
        s1oh_t, pc = _prepare(jnp.asarray(codes1), jnp.asarray(codes2),
                              jnp.asarray(tables.code), l1k, l2p)
        out = _sweep_pallas(s1oh_t, pc, noff_pad, l2p // CHUNK,
                            bool(interpret), with_valid=not clean)
    out = np.asarray(out)
    counts = out[:4, :noff].T.copy()
    if clean:
        counts[:, 3] = n2 - counts[:, 0] - counts[:, 1] - counts[:, 2]
    return counts, maxrank_from_maxcode(out[4, :noff])
