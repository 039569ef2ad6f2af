"""Kernel experiment archive (round 2).

The winning design — strided-rotate shear + bit-mask SWAR decode +
MXU-assisted counting — GRADUATED into ops/pallas_sweep.py; use that for
anything real.  This module remains only as the runnable record of the
measured alternatives (benchmarks/kernel_lab.py --variant v2):

* shear='reshape' — the zero-op flat-reshape shear: bit-exact in interpret
  mode, REJECTED by Mosaic ("infer-vector-layout: unsupported shape cast").
* shear='stride' at chunk 512 — SWAR-safe and exact, measured 8.37 ms at
  tile 4096 (vs 5.56 at chunk 256): VMEM pressure.
* SWAR equality-test counting (this file) — superseded by raw bit masks
  (6.64 -> 6.01 ms) and then MXU dots (5.05 ms), both in pallas_sweep.

Timing ladder and dead-end list: docs/DESIGN.md §6 and TODO.md.
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

CHUNK2 = 256
ROWPAD = 8          # zero band rows so the flat reshape has filler material
H = np.int32(-2139062144)    # 0x80808080
L7 = np.int32(0x7F7F7F7F)
B1 = np.int32(0x01010101)
M16 = np.int32(0x00FF00FF)
BYTE3 = np.int32(-16777216)  # 0xFF000000


def _fold_fields(s):
    """Horizontal SWAR fold: sum the 4 byte-fields of packed row-sums.

    Field values <= 128 each, so the 16-bit intermediate never carries.
    """
    s16 = (s & M16) + (jax.lax.shift_right_logical(s, 8) & M16)
    return (s16 + jax.lax.shift_right_logical(s16, 16)) & 0xFFFF


def _sum_mask(m):
    """(rows, T) packed 0/1-per-byte mask -> (1, T) int32 totals."""
    return _fold_fields(jnp.sum(m, axis=0, keepdims=True))


def _count_nonzero_packed(x):
    """Count nonzero bytes (valid pair positions) of packed int32 `x`."""
    hit = (x + L7) & H                           # bytes <= 126: no carry
    return _sum_mask(jax.lax.shift_right_logical(hit, 7) & B1)


def _shear_reshape(m8, width: int, tile_o: int):
    """A[s, j] = m8[s, s+j] via flat re-chunking at stride width+1."""
    flat = m8.reshape(-1)
    return flat[: CHUNK2 * (width + 1)].reshape(CHUNK2, width + 1)[:, :tile_o]


def _shear_stride(m8, width: int, tile_o: int, chunk: int = CHUNK2):
    """One strided rotate + 3 byte-recombine rolls.

    Requires pc columns REVERSED (j = C-1-i): band element for offset o then
    sits at lane o + C-1-j of row j, so the alignment shift is
    (width-C+1) + j — linear with slope +1 in the row index, i.e. slope +4
    per packed int32 row, which tpu.RotateOp expresses directly via
    stride/stride_axis. The +b byte residual is the same 3-roll recombine as
    the round-1 kernel.
    """
    p = pltpu.bitcast(m8[:chunk], jnp.int32)             # (C/4, W)
    p = pltpu.roll(p, width - chunk + 1, 1, stride=4, stride_axis=0)
    r1 = pltpu.roll(p, 1, 1)
    r2 = pltpu.roll(p, 2, 1)
    r3 = pltpu.roll(p, 3, 1)
    d4 = ((p & 0xFF) | (r1 & 0xFF00) | (r2 & 0xFF0000) | (r3 & BYTE3))
    return d4[:, :tile_o]


def _sweep_kernel_v2(pc_ref, s1oh_ref, out_ref, acc_ref, *, nchunks: int,
                     tile_o: int, shear: str, chunk: int):
    o0 = pl.program_id(0) * tile_o
    width = tile_o + chunk
    acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(c, _):
        base = pl.multiple_of(o0 + c * chunk, chunk)
        win = s1oh_ref[:, pl.ds(base, width)]            # (32, W) int8
        pcc = pc_ref[c]                                  # (32, C[+pad]) int8
        m = jax.lax.dot_general(
            pcc, win,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )                                                # (C[+pad], W) i32
        m8 = m.astype(jnp.int8)
        if shear == "reshape":
            a8 = _shear_reshape(m8, width, tile_o)       # (C, T) int8 aligned
            p = pltpu.bitcast(a8, jnp.int32)             # (C/4, T) packed
        else:
            p = _shear_stride(m8, width, tile_o, chunk)  # (C/4, T) packed
        # max fused code -> best substitution rank (monotone in rank);
        # int8 reductions aren't implemented in Mosaic, so combine the 4
        # byte planes elementwise first, then one int32 sublane reduction
        d0 = p & 0xFF
        d1 = jax.lax.shift_right_logical(p, 8) & 0xFF
        d2 = jax.lax.shift_right_logical(p, 16) & 0xFF
        d3 = jax.lax.shift_right_logical(p, 24) & 0xFF
        dm = jnp.maximum(jnp.maximum(d0, d1), jnp.maximum(d2, d3))
        acc_ref[4:5, :] = jnp.maximum(
            acc_ref[4:5, :], jnp.max(dm, axis=0, keepdims=True))
        # 2-bit class slots per byte: (code & 3) = 1+cls mod 4, so slot
        # value 1 = cls0, 2 = cls1, 3 = cls2, 0 = {cls3, inert}.  Count via
        # raw bit masks (2 ops each, no SWAR equality tests):
        #   n13 = slots with bit0 (values 1,3), n23 = bit1 (2,3), n3 = both.
        t2 = p & (3 * B1)
        tb = jax.lax.shift_right_logical(t2, 1)
        n13 = _sum_mask(t2 & B1)
        n23 = _sum_mask(tb & B1)
        n3 = _sum_mask(t2 & tb & B1)
        vv = _count_nonzero_packed(p)
        c0 = n13 - n3                                    # cls0 count
        c1 = n23 - n3                                    # cls1 count
        acc_ref[0:1, :] += c0
        acc_ref[1:2, :] += c1
        acc_ref[2:3, :] += n3                            # cls2 count
        acc_ref[3:4, :] += vv - c0 - c1 - n3             # cls3 count
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)
    out_ref[...] = acc_ref[...]


@functools.partial(jax.jit,
                   static_argnames=("noff_pad", "nchunks", "interpret",
                                    "tile_o", "shear", "chunk"))
def _sweep_pallas_v2(pc3, s1oh_t, noff_pad: int, nchunks: int,
                     interpret: bool, tile_o: int = 2048,
                     shear: str = "stride", chunk: int = CHUNK2):
    """pc3: (nchunks, 32, CHUNK2+ROWPAD) int8; s1oh_t: (32, L1K) int8.

    Returns (8, noff_pad) int32, same contract as pallas_sweep._sweep_pallas.
    """
    ntiles = noff_pad // tile_o
    kernel = functools.partial(_sweep_kernel_v2, nchunks=nchunks,
                               tile_o=tile_o, shear=shear, chunk=chunk)
    return pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tile_o), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, noff_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, tile_o), jnp.int32)],
        interpret=interpret,
    )(pc3, s1oh_t)


@functools.partial(jax.jit, static_argnames=("l1k", "l2p", "shear", "chunk"))
def _prepare_v2(codes1p, codes2p, code_tab, l1k: int, l2p: int,
                shear: str = "stride", chunk: int = CHUNK2):
    c1 = jnp.full((l1k,), PAD_CODE, jnp.int32).at[: codes1p.shape[0]].set(codes1p)
    s1oh_t = jax.nn.one_hot(c1, NCODES_PAD, dtype=jnp.int8, axis=0)
    c2 = jnp.full((l2p,), PAD_CODE, jnp.int32).at[: codes2p.shape[0]].set(codes2p)
    pc = code_tab[:, c2]                                  # (32, L2P) int8
    nchunks = l2p // chunk
    pc3 = pc.reshape(32, nchunks, chunk).transpose(1, 0, 2)
    if shear == "stride":
        # strided-rotate shear wants reversed in-chunk column order (j=C-1-i)
        return pc3[:, :, ::-1], s1oh_t
    pad = jnp.zeros((nchunks, 32, ROWPAD), jnp.int8)
    return jnp.concatenate([pc3, pad], axis=2), s1oh_t


def plan_shapes_v2(n1: int, n2: int, tile_o: int = 2048, chunk: int = CHUNK2):
    noff = n1 - n2 + 1
    l2p = round_up(max(n2, chunk), chunk)
    noff_pad = round_up(noff, tile_o)
    l1k = noff_pad + l2p
    return noff, noff_pad, l2p, l1k


def offset_stats_v2(codes1: np.ndarray, codes2: np.ndarray,
                    tables: ScoringTables, interpret: bool | None = None,
                    tile_o: int = 2048, shear: str = "stride",
                    chunk: int = CHUNK2):
    from psa_tpu.ops.pallas_sweep import maxrank_from_maxcode

    codes1 = np.asarray(codes1, dtype=np.int32)
    codes2 = np.asarray(codes2, dtype=np.int32)
    noff, noff_pad, l2p, l1k = plan_shapes_v2(codes1.shape[0],
                                              codes2.shape[0], tile_o, chunk)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    pc3, s1oh_t = _prepare_v2(jnp.asarray(codes1), jnp.asarray(codes2),
                              jnp.asarray(tables.code), l1k, l2p, shear, chunk)
    out = _sweep_pallas_v2(pc3, s1oh_t, noff_pad, l2p // chunk,
                           bool(interpret), tile_o, shear, chunk)
    out = np.asarray(out)
    return out[:4, :noff].T.copy(), maxrank_from_maxcode(out[4, :noff])
