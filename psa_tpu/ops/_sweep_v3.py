"""Kernel experiment: split-dot packed output + deferred class counting.

Independent toggles over the production kernel (ops/pallas_sweep.py),
attacking its two largest measured remaining costs (TODO.md):

* pack='splitdot' — the production kernel's (32,C)@(32,W) MXU dot emits a
  (C, W) int32 matrix that must be cast to int8 and bitcast to the packed
  (C/4, W) band; the cast is a cross-lane relayout and the largest single
  data movement left.  Instead run FOUR quarter dots, one per byte slot:
  out_b[j4, w] = CODE[s1[w], s2c[4*j4+b]] (operand pcc[:, b::4]), and
  combine `out0 | out1<<8 | out2<<16 | out3<<24` — the packed band appears
  directly from the MXU with no relayout (the one-hot contraction makes
  every output an exact table value <= 126, so the shifts never carry).

* counts='defer' — the production kernel counts classes per chunk with
  three ones(1,C) @ mask8 MXU dots.  Instead accumulate the three packed
  0/1-per-byte masks into (C/4, T) int32 byte-wise counters (3 adds/chunk;
  per-byte counts <= nchunks <= 127 so no carry) and run the three count
  dots ONCE per tile in the epilogue.

* pack='permdot' — ONE full-size row-permuted dot (operand rows interleaved
  so each byte plane's band appears directly), per-plane residual rolls
  replacing the 3-roll byte recombine, and sublane-slice shift/OR packing to
  skip the int32->int8 cast + bitcast.  Measured SLOWER than the production
  cast on chip (unfused 3.30 vs 3.24 ms, fused 3.55 vs 3.38 ms, interleaved
  at tile 32768 — TODO.md): Mosaic folds the i8 relayout into the dot
  epilogue while int32 shift/OR packing is real VPU passes.

Bit-exact by construction; verified against the numpy oracle via
benchmarks/kernel_lab.py --variant v3 --check (interpret mode and on chip).
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
from psa_tpu.ops.pallas_sweep import (_compiler_params, _count_mxu,
                                      _plane_max, _shear_stride,
                                      _swar_bytemax)

_B1 = np.int32(0x01010101)
_BYTE3 = np.int32(-16777216)   # 0xFF000000


def _contract_packed(pcc4, win, width: int, tile_o: int, chunk: int,
                     pack: str):
    """One chunk's packed aligned band (C/4, T) from the MXU."""
    if pack == "permdot":
        # ONE full-size dot (identical MXU work to production) whose lhs
        # lanes are pre-permuted so output row b*(C/4)+k holds chunk row
        # 4k+b: the packed band is then 4 sublane-contiguous slices
        # shifted+ORed together — no int32->int8 cast relayout, no bitcast.
        # The per-byte +b lane residual is applied to each plane BEFORE
        # packing (roll of the plane == roll of that byte after packing),
        # which deletes the production 3-roll + 4-mask byte recombine.
        m = jax.lax.dot_general(
            pcc4, win,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )                                              # (C, W) int32, perm
        c4 = chunk // 4
        p = (m[0 * c4:1 * c4]
             | (pltpu.roll(m[1 * c4:2 * c4], 1, 1) << 8)
             | (pltpu.roll(m[2 * c4:3 * c4], 2, 1) << 16)
             | (pltpu.roll(m[3 * c4:4 * c4], 3, 1) << 24))
        p = pltpu.roll(p, width - chunk + 1, 1, stride=4, stride_axis=0)
        return p[:, :tile_o]
    if pack == "splitdot":
        outs = [
            jax.lax.dot_general(
                pcc4[b], win,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            for b in range(4)
        ]                                              # 4 x (C/4, W) int32
        p = (outs[0] | (outs[1] << 8) | (outs[2] << 16) | (outs[3] << 24))
        p = pltpu.roll(p, width - chunk + 1, 1, stride=4, stride_axis=0)
        r1 = pltpu.roll(p, 1, 1)
        r2 = pltpu.roll(p, 2, 1)
        r3 = pltpu.roll(p, 3, 1)
        d4 = ((p & 0xFF) | (r1 & 0xFF00) | (r2 & 0xFF0000) | (r3 & _BYTE3))
        return d4[:, :tile_o]
    m = jax.lax.dot_general(
        pcc4, win,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return _shear_stride(m.astype(jnp.int8), width, tile_o, chunk)


def _sweep_kernel_v3(pc_ref, s1oh_ref, out_ref, acc_ref, macc_ref, a13_ref,
                     a23_ref, a3_ref, *, nchunks: int, tile_o: int,
                     chunk: int, pack: str, counts: str):
    o0 = pl.program_id(0) * tile_o
    width = tile_o + chunk
    acc_ref[...] = jnp.zeros_like(acc_ref)
    macc_ref[...] = jnp.zeros_like(macc_ref)
    defer = counts == "defer"
    if defer:
        a13_ref[...] = jnp.zeros_like(a13_ref)
        a23_ref[...] = jnp.zeros_like(a23_ref)
        a3_ref[...] = jnp.zeros_like(a3_ref)

    def body(c, _):
        base = pl.multiple_of(o0 + c * chunk, chunk)
        win = s1oh_ref[:, pl.ds(base, width)]             # (32, W) int8
        p = _contract_packed(pc_ref[c], win, width, tile_o, chunk, pack)
        macc_ref[...] = _swar_bytemax(macc_ref[...], p)
        pb = jax.lax.shift_right_logical(p, 1)
        if defer:
            a13_ref[...] += p & _B1
            a23_ref[...] += pb & _B1
            a3_ref[...] += p & pb & _B1
        else:
            ones_row = jnp.ones((1, chunk), jnp.int8)
            n13 = _count_mxu(p & _B1, ones_row)
            n23 = _count_mxu(pb & _B1, ones_row)
            n3 = _count_mxu(p & pb & _B1, ones_row)
            acc_ref[0:1, :] += n13 - n3
            acc_ref[1:2, :] += n23 - n3
            acc_ref[2:3, :] += n3
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)
    if defer:
        ones_row = jnp.ones((1, chunk), jnp.int8)
        n13 = _count_mxu(a13_ref[...], ones_row)
        n23 = _count_mxu(a23_ref[...], ones_row)
        n3 = _count_mxu(a3_ref[...], ones_row)
        acc_ref[0:1, :] = n13 - n3
        acc_ref[1:2, :] = n23 - n3
        acc_ref[2:3, :] = n3
    _plane_max(macc_ref[...], acc_ref)
    out_ref[...] = acc_ref[...]


@functools.partial(jax.jit,
                   static_argnames=("noff_pad", "nchunks", "interpret",
                                    "tile_o", "chunk", "pack", "counts"))
def _sweep_pallas_v3(pc_in, s1oh_t, noff_pad: int, nchunks: int,
                     interpret: bool, tile_o: int = 4096, chunk: int = 256,
                     pack: str = "splitdot", counts: str = "defer"):
    """Same output contract as pallas_sweep._sweep_pallas (rows 0-2 = class
    counts, row 3 unused [clean-input mode only], row 4 = max fused code)."""
    assert nchunks <= 127, "deferred byte counters carry above 127 chunks"
    ntiles = noff_pad // tile_o
    kernel = functools.partial(_sweep_kernel_v3, nchunks=nchunks,
                               tile_o=tile_o, chunk=chunk, pack=pack,
                               counts=counts)
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
        scratch_shapes=[
            pltpu.VMEM((8, tile_o), jnp.int32),
            pltpu.VMEM((chunk // 4, tile_o), jnp.int32),   # packed max acc
            pltpu.VMEM((chunk // 4, tile_o), jnp.int32),   # n13 acc
            pltpu.VMEM((chunk // 4, tile_o), jnp.int32),   # n23 acc
            pltpu.VMEM((chunk // 4, tile_o), jnp.int32),   # n3 acc
        ],
        interpret=interpret,
        **_compiler_params(tile_o),
    )(pc_in, s1oh_t)


@functools.partial(jax.jit, static_argnames=("l1k", "l2p", "chunk", "pack"))
def _prepare_v3(codes1p, codes2p, code_tab, l1k: int, l2p: int,
                chunk: int = 256, pack: str = "splitdot"):
    c1 = jnp.full((l1k,), PAD_CODE, jnp.int32).at[: codes1p.shape[0]].set(codes1p)
    s1oh_t = jax.nn.one_hot(c1, NCODES_PAD, dtype=jnp.int8, axis=0)
    c2 = jnp.full((l2p,), PAD_CODE, jnp.int32).at[: codes2p.shape[0]].set(codes2p)
    pc = code_tab[:, c2]                                  # (32, L2P) int8
    nchunks = l2p // chunk
    pc3 = pc.reshape(32, nchunks, chunk).transpose(1, 0, 2)[:, :, ::-1]
    if pack == "splitdot":
        # pcc[:, b::4] per byte slot: (nchunks, 4, 32, chunk/4)
        pc4 = pc3.reshape(nchunks, 32, chunk // 4, 4).transpose(0, 3, 1, 2)
        return pc4, s1oh_t
    if pack == "permdot":
        # lane permutation new[b*(C/4)+k] = old[4k+b] so the dot output's
        # byte-plane rows come out sublane-contiguous (see _contract_packed)
        pcp = (pc3.reshape(nchunks, 32, chunk // 4, 4)
               .transpose(0, 1, 3, 2).reshape(nchunks, 32, chunk))
        return pcp, s1oh_t
    return pc3, s1oh_t


def plan_shapes_v3(n1: int, n2: int, tile_o: int = 4096, chunk: int = 256):
    noff = n1 - n2 + 1
    l2p = round_up(max(n2, chunk), chunk)
    noff_pad = round_up(noff, tile_o)
    l1k = noff_pad + l2p
    return noff, noff_pad, l2p, l1k


def offset_stats_v3(codes1: np.ndarray, codes2: np.ndarray,
                    tables: ScoringTables, interpret: bool | None = None,
                    tile_o: int = 4096, chunk: int = 256,
                    pack: str = "splitdot", counts: str = "defer"):
    """Clean-input stats (cls3 reconstructed on host as n2 - rest)."""
    from psa_tpu.ops.pallas_sweep import maxrank_from_maxcode

    codes1 = np.asarray(codes1, dtype=np.int32)
    codes2 = np.asarray(codes2, dtype=np.int32)
    n2 = int(codes2.shape[0])
    noff, noff_pad, l2p, l1k = plan_shapes_v3(codes1.shape[0], n2, tile_o,
                                              chunk)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    pc_in, s1oh_t = _prepare_v3(jnp.asarray(codes1), jnp.asarray(codes2),
                                jnp.asarray(tables.code), l1k, l2p, chunk,
                                pack)
    out = _sweep_pallas_v3(pc_in, s1oh_t, noff_pad, l2p // chunk,
                           bool(interpret), tile_o, chunk, pack, counts)
    out = np.asarray(out)
    cnt = out[:4, :noff].T.copy()
    cnt[:, 3] = n2 - cnt[:, 0] - cnt[:, 1] - cnt[:, 2]
    return cnt, maxrank_from_maxcode(out[4, :noff])
