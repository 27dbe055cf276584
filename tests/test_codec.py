"""Posting codec: roundtrip + property-based fuzz + block-max
admissibility (FIXTURES.md §3 invariants)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from moera_search_spark.postings import (
    decode_block,
    encode_term_run,
    tfnorm,
    vb_decode,
    vb_encode,
)


class TestVarbyte:
    def test_empty(self):
        assert vb_encode(np.array([], dtype=np.int64)) == b""
        assert vb_decode(b"").shape == (0,)

    def test_known_values(self):
        # 0 → one byte 0x00; 127 → 0x7F; 128 → 0x80 0x01 (LE groups)
        assert vb_encode(np.array([0])) == b"\x00"
        assert vb_encode(np.array([127])) == b"\x7f"
        assert vb_encode(np.array([128])) == b"\x80\x01"

    @given(st.lists(st.integers(min_value=0, max_value=2**62 - 1),
                    max_size=500))
    @settings(max_examples=200, deadline=None)
    def test_roundtrip_fuzz(self, values):
        arr = np.array(values, dtype=np.int64)
        assert np.array_equal(vb_decode(vb_encode(arr)), arr)


class TestBlocks:
    def _random_postings(self, n, seed=0, max_doc=10**7):
        rng = np.random.default_rng(seed)
        doc_ids = np.sort(rng.choice(max_doc, size=n, replace=False)
                          ).astype(np.int64)
        tfs = rng.integers(1, 60, size=n).astype(np.int64)
        dls = rng.integers(1, 500, size=n).astype(np.int64)
        return doc_ids, tfs, dls

    @pytest.mark.parametrize("n", [1, 2, 127, 128, 129, 1000])
    def test_roundtrip(self, n):
        doc_ids, tfs, dls = self._random_postings(n, seed=n)
        rows = encode_term_run(doc_ids, tfs, dls, avgdl=100.0)
        rd, rt, rl = [], [], []
        for (f, last, cnt, db, tb, lb, _mx) in rows:
            d, t, l = decode_block(f, db, tb, lb)
            assert d[0] == f and d[-1] == last and len(d) == cnt <= 128
            rd.append(d), rt.append(t), rl.append(l)
        assert np.array_equal(np.concatenate(rd), doc_ids)
        assert np.array_equal(np.concatenate(rt), tfs)
        assert np.array_equal(np.concatenate(rl), dls)

    def test_block_max_is_true_upper_bound(self):
        """Admissibility: pruning must never change top-k, which holds
        iff max_tfnorm bounds every in-block tfnorm exactly."""
        doc_ids, tfs, dls = self._random_postings(1000, seed=7)
        avgdl = 123.4
        for (f, _l, _n, db, tb, lb, mx) in encode_term_run(
                doc_ids, tfs, dls, avgdl=avgdl):
            d, t, l = decode_block(f, db, tb, lb)
            scores = tfnorm(t, l, avgdl)
            assert float(np.max(scores)) <= mx
            # and exact (not just a bound): it is the block max
            assert float(np.max(scores)) == mx


class TestBatchDecode:
    def test_batch_matches_per_block_decode(self):
        """decode_blocks_batch ≡ per-block decode_block over many
        randomized blocks (the vectorized query hot path)."""
        import numpy as np

        from moera_search_spark.postings import (
            decode_block,
            decode_blocks_batch,
            encode_term_run,
        )

        rng = np.random.default_rng(7)
        rows = []
        for base in (0, 5000, 123456):
            n = int(rng.integers(1, 300))
            ids = np.sort(rng.choice(np.arange(base, base + 8192),
                                     size=n, replace=False))
            tfs = rng.integers(1, 50, n)
            dls = rng.integers(1, 400, n)
            rows += encode_term_run(ids, tfs, dls, avgdl=30.0)
        firsts = np.array([r[0] for r in rows])
        counts = np.array([r[2] for r in rows])
        d, t, l = decode_blocks_batch(
            firsts, counts, [r[3] for r in rows], [r[4] for r in rows],
            [r[5] for r in rows])
        off = 0
        for r in rows:
            di, ti, li = decode_block(r[0], r[3], r[4], r[5])
            n = di.shape[0]
            assert np.array_equal(d[off:off + n], di)
            assert np.array_equal(t[off:off + n], ti)
            assert np.array_equal(l[off:off + n], li)
            off += n
        assert off == d.shape[0]


class TestCodecProperties:
    def test_varbyte_roundtrip_property(self):
        """Property: vb_decode(vb_encode(x)) == x for arbitrary
        non-negative int64 arrays (hypothesis-driven)."""
        import numpy as np
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from moera_search_spark.postings import vb_decode, vb_encode

        @settings(max_examples=200, deadline=None)
        @given(st.lists(st.integers(min_value=0,
                                    max_value=(1 << 62) - 1),
                        max_size=300))
        def roundtrip(values):
            arr = np.array(values, dtype=np.int64)
            assert np.array_equal(vb_decode(vb_encode(arr)), arr)

        roundtrip()

    def test_term_run_blocks_property(self):
        """Property: encode_term_run → decode_blocks_batch restores the
        exact (doc_ids, tfs, dls) for arbitrary sorted runs."""
        import numpy as np
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from moera_search_spark.postings import (
            decode_blocks_batch,
            encode_term_run,
        )

        @settings(max_examples=100, deadline=None)
        @given(st.sets(st.integers(min_value=0, max_value=8191),
                       min_size=1, max_size=500),
               st.integers(min_value=1, max_value=1000))
        def roundtrip(idset, seed):
            rng = np.random.default_rng(seed)
            ids = np.sort(np.fromiter(idset, np.int64))
            n = ids.shape[0]
            tfs = rng.integers(1, 1000, n)
            dls = rng.integers(1, 5000, n)
            rows = encode_term_run(ids, tfs, dls, avgdl=25.0)
            d, t, l = decode_blocks_batch(
                np.array([r[0] for r in rows]),
                np.array([r[2] for r in rows]),
                [r[3] for r in rows], [r[4] for r in rows],
                [r[5] for r in rows])
            assert np.array_equal(d, ids)
            assert np.array_equal(t, tfs)
            assert np.array_equal(l, dls)

        roundtrip()


class TestSegmentedEncode:
    """vb_encode_many / encode_blocks_batch — the vectorized twins the
    staging run emitter and the postings re-encoder use — must be
    byte-identical to the per-run / per-group reference encoders."""

    @given(st.lists(st.lists(st.integers(min_value=0,
                                         max_value=2**62 - 1),
                             min_size=1, max_size=20),
                    min_size=1, max_size=30))
    @settings(max_examples=60, deadline=None)
    def test_vb_encode_many_matches_per_run(self, runs):
        from moera_search_spark.postings import vb_encode_many

        flat = np.array([v for r in runs for v in r], dtype=np.int64)
        counts = np.array([len(r) for r in runs], dtype=np.int64)
        got = vb_encode_many(flat, counts)
        want = [vb_encode(np.array(r, dtype=np.int64)) for r in runs]
        assert got == want

    def test_vb_encode_many_empty(self):
        from moera_search_spark.postings import vb_encode_many

        assert vb_encode_many(np.empty(0, np.int64),
                              np.empty(0, np.int64)) == []

    @given(st.data())
    @settings(max_examples=40, deadline=None)
    def test_encode_blocks_batch_matches_encode_term_run(self, data):
        from moera_search_spark.postings import encode_blocks_batch

        n_groups = data.draw(st.integers(min_value=1, max_value=8))
        groups = []
        for _ in range(n_groups):
            n = data.draw(st.integers(min_value=1, max_value=300))
            start = data.draw(st.integers(min_value=0,
                                          max_value=10**9))
            gaps = data.draw(st.lists(
                st.integers(min_value=1, max_value=5000),
                min_size=n - 1, max_size=n - 1))
            docs = np.cumsum([start] + gaps).astype(np.int64)
            tfs = np.array(data.draw(st.lists(
                st.integers(min_value=1, max_value=50),
                min_size=n, max_size=n)), dtype=np.int64)
            dls = np.array(data.draw(st.lists(
                st.integers(min_value=1, max_value=500),
                min_size=n, max_size=n)), dtype=np.int64)
            groups.append((docs, tfs, dls))
        avgdl, bs = 37.5, 64
        flat_d = np.concatenate([g[0] for g in groups])
        flat_t = np.concatenate([g[1] for g in groups])
        flat_l = np.concatenate([g[2] for g in groups])
        counts = np.array([len(g[0]) for g in groups], dtype=np.int64)
        (bg, first, last, n_docs, deltas, tfs_b, dls_b,
         mx) = encode_blocks_batch(flat_d, flat_t, flat_l, counts,
                                   avgdl, block_size=bs)
        want = []
        for gi, (docs, tfs, dls) in enumerate(groups):
            for row in encode_term_run(docs, tfs, dls, avgdl,
                                       block_size=bs):
                want.append((gi,) + row)
        got = list(zip(bg.tolist(), first.tolist(), last.tolist(),
                       n_docs.tolist(), deltas, tfs_b, dls_b,
                       mx.tolist()))
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g[:7] == w[:7]
            assert g[7] == w[7]   # exact float equality — same maxes
