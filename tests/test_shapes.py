"""Property tests for padding/tiling plans: every shape the planners emit
must satisfy the kernel's alignment invariants, for arbitrary input sizes."""

import numpy as np
import pytest

from psa_tpu.ops.common import bucket_len, pad_query, round_up
from psa_tpu.ops.pallas_sweep import CHUNK, TILE_O, pick_tile, plan_shapes, size_tile
from psa_tpu.parallel.mesh import pad_for_mesh

from conftest import random_codes


def test_plan_shapes_invariants():
    rng = np.random.default_rng(0)
    for _ in range(200):
        n2 = int(rng.integers(1, 20000))
        n1 = n2 + int(rng.integers(0, 200000))
        noff, noff_pad, l2p, l1k = plan_shapes(n1, n2)
        assert noff == n1 - n2 + 1
        assert noff_pad >= noff
        assert l2p >= n2 and l2p % CHUNK == 0
        tile = pick_tile(noff_pad)
        assert noff_pad % tile == 0
        assert tile <= TILE_O
        # every padded offset's full window fits in the padded seq1
        assert l1k >= noff_pad + l2p
        # padding waste bounded: < one tile
        assert noff_pad - noff < size_tile(noff)


def test_pick_tile_divides():
    for extent in range(512, 64 * 1024, 512):
        t = pick_tile(extent)
        assert extent % t == 0 and 512 <= t <= TILE_O


def test_pick_chunk_divides():
    from psa_tpu.ops.pallas_sweep import MAX_CHUNK, pick_chunk

    for nchunks in range(1, 200):
        l2p = nchunks * CHUNK
        c = pick_chunk(l2p)
        assert l2p % c == 0 and CHUNK <= c <= MAX_CHUNK
        # maximality: no larger supported chunk divides l2p
        cc = c * 2
        while cc <= MAX_CHUNK:
            assert l2p % cc != 0
            cc *= 2


def test_pad_for_mesh_invariants():
    rng = np.random.default_rng(1)
    for n_shards in (1, 2, 4, 8):
        for _ in range(30):
            n2 = int(rng.integers(1, 3000))
            n1 = n2 + int(rng.integers(0, 50000))
            c1 = random_codes(rng, n1)
            c2 = random_codes(rng, n2)
            c1p, c2p, noff = pad_for_mesh(c1, c2, n_shards)
            noff_pad = c1p.shape[0] - c2p.shape[0]
            assert noff == n1 - n2 + 1
            assert noff_pad % (n_shards * 512) == 0
            per_shard = noff_pad // n_shards
            # each shard's window [o0, o0 + per_shard + l2p) fits
            assert (n_shards - 1) * per_shard + per_shard + c2p.shape[0] \
                <= c1p.shape[0]
            # payload preserved
            np.testing.assert_array_equal(c1p[:n1], c1)
            np.testing.assert_array_equal(c2p[:n2], c2)


def test_bucket_len_monotone_and_bounded():
    prev = 0
    for n in range(1, 5000, 37):
        b = bucket_len(n)
        assert b >= n and b % 128 == 0
        assert b >= prev or n < prev  # monotone in n
        prev = b
        # geometric buckets waste at most ~50%
        assert b <= max(512, round_up(n * 3 // 2 + 128, 128))


def test_round_batch_invariants():
    """Microbatch rounding: power of two, >= n, capped but never below n,
    and 1 maps to 1 (dummy rows sweep their full shape — a padded-to-8
    oversized single query would run its sweep eight times)."""
    from psa_tpu.models.batch import _round_batch

    assert _round_batch(1, 1024) == 1
    for cap in (8, 100, 1024):
        for n in list(range(1, 70)) + [127, 128, 129, 1000, 1024, 5000]:
            r = _round_batch(n, cap)
            assert r >= n                       # never truncates the batch
            # a power of two, or the cap itself, or exactly n (n > cap)
            assert (r & (r - 1) == 0) or r == cap or r == n
            if n <= cap:
                assert r <= cap                 # compile-size bounded


def test_batched_auto_tile_respects_vmem_cap():
    """The batched kernel's auto tile must keep (measured single-kernel
    request + expand stack) under the VMEM request cap for any shape, and
    must still divide noff_pad."""
    from psa_tpu.ops.pallas_sweep import (
        _VMEM_REQUEST_CAP, _single_limit_bytes, batched_plan)

    rng = np.random.default_rng(2)
    for _ in range(200):
        l2p = 256 * int(rng.integers(1, 1200))
        noff_pad = 512 * int(rng.integers(1, 3000))
        t, _, ex = batched_plan(noff_pad, l2p, 256)
        assert noff_pad % t == 0
        assert t <= 32768
        if t > 512:
            assert _single_limit_bytes(t) + ex <= _VMEM_REQUEST_CAP
    """The pipeline's span arithmetic must partition [0, B) exactly —
    tested on the real helper batched_search_exact iterates over."""
    from psa_tpu.models.batch import microbatch_spans

    for b_n in (1, 7, 8, 1000, 1024, 2049):
        for mb in (1, 8, 1000, 1024):
            spans = microbatch_spans(b_n, mb)
            assert spans[0][0] == 0 and spans[-1][1] == b_n
            for (a0, a1), (b0, _) in zip(spans, spans[1:]):
                assert a1 == b0 and a1 - a0 == mb
            assert all(e - s >= 1 for s, e in spans)
