"""Sloppy-phrase matching (``slop > 0``) — round 5.

The contract is the classic Lucene SloppyPhraseScorer sweep
(documented in ``query._sloppy_sweep``): min-advance over per-slot
ADJUSTED positions, each scored window weighted 1/(1+matchLength),
tf = that sloppyFreq.  Pinned three ways:

* hand-computed Lucene-behavior cases (adjacent, one-gap,
  transposition needs slop≥2, multi-window);
* property fuzz: the sweep at slop=0 counts exactly the exact-phrase
  anchors (tying the new path to the DuckDB-hash-verified exact
  path);
* engine ``search_phrase(slop>0)`` vs the oracle's INDEPENDENT
  implementation of the same sweep, over randomized corpora,
  phrases, slops, filters and pagination.

Repeated-term sloppy phrases stay an honest NotImplementedError
(Lucene's repeat-collision machinery is a distinct algorithm).
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from moera_search_spark.build import build_index
from moera_search_spark.oracle import OracleIndex, build_oracle
from moera_search_spark.query import FTSIndex, _sloppy_sweep


def _sweep(lists, slop):
    return _sloppy_sweep([np.asarray(x, dtype=np.int64)
                          for x in lists], slop)


class TestSweepUnit:
    def test_adjacent_exact(self):
        # "a b" in "a b": one exact window at every slop
        for slop in (0, 1, 5):
            assert _sweep([[0], [0]], slop) == (1.0, 1)

    def test_one_gap_needs_slop_1(self):
        # "a b" in "a x b": adjusted A=[0], B=[1] → matchLength 1
        assert _sweep([[0], [1]], 0) == (0.0, 0)
        assert _sweep([[0], [1]], 1) == (0.5, 1)

    def test_transposition_needs_slop_2(self):
        # "a b" in "b a": adjusted A=[1], B=[-1] → matchLength 2
        assert _sweep([[1], [-1]], 1) == (0.0, 0)
        f, n = _sweep([[1], [-1]], 2)
        assert n == 1 and f == pytest.approx(1.0 / 3.0)

    def test_multi_window(self):
        # "a b" in "a x b a b": A=[0,3], B=[1,3] → windows 1 and 0
        f, n = _sweep([[0, 3], [1, 3]], 1)
        assert n == 2 and f == pytest.approx(0.5 + 1.0)
        f0, n0 = _sweep([[0, 3], [1, 3]], 0)
        assert n0 == 1 and f0 == 1.0

    def test_three_slots(self):
        # "a b c" exact in "a b c": all adjusted 0
        assert _sweep([[0], [0], [0]], 0) == (1.0, 1)
        # "a c b" (middle two swapped): a@0 b@2 c@1 →
        # adjusted A=[0], B=[1], C=[-1] → width 2
        f, n = _sweep([[0], [1], [-1]], 2)
        assert n == 1 and f == pytest.approx(1.0 / 3.0)
        assert _sweep([[0], [1], [-1]], 1) == (0.0, 0)

    def test_slop0_equals_exact_anchor_count_fuzz(self):
        """Property: the sweep at slop=0 scores exactly the exact-
        phrase anchors (positions present in EVERY slot's adjusted
        list) — tying the sloppy path to the hash-verified exact
        path."""
        rng = random.Random(404)
        for _ in range(300):
            nslots = rng.randint(2, 4)
            lists = []
            for _s in range(nslots):
                n = rng.randint(1, 8)
                lists.append(sorted(rng.sample(range(-3, 15), n)))
            exact = set(lists[0])
            for lst in lists[1:]:
                exact &= set(lst)
            f, n = _sweep(lists, 0)
            assert n == len(exact), lists
            assert f == pytest.approx(float(len(exact)))

    def test_oracle_sweep_agrees_with_engine_sweep_fuzz(self):
        """The oracle's independently-written sweep must equal the
        engine's on random inputs at random slops."""
        rng = random.Random(505)
        for _ in range(300):
            nslots = rng.randint(2, 4)
            lists = [sorted(rng.sample(range(-3, 20),
                                       rng.randint(1, 8)))
                     for _s in range(nslots)]
            slop = rng.randint(0, 6)
            f_eng, _ = _sweep(lists, slop)
            f_orc = OracleIndex._sloppy_freq(
                [list(x) for x in lists], slop)
            assert f_orc == pytest.approx(f_eng), (lists, slop)


def _mini_transcripts(spark, rows):
    from datetime import datetime

    ts = datetime(2026, 1, 1)
    return spark.createDataFrame(
        [(c, t, r, x, tool, ts) for c, t, r, x, tool in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")


class TestEngineSloppy:
    @pytest.fixture(scope="class")
    def sloppy_setup(self, spark, tmp_path_factory):
        rng = random.Random(909)
        vocab = ["data", "table", "scan", "merge", "row", "batch",
                 "the", "of", "filter", "spark"]
        rows = []
        for i in range(80):
            n = rng.randint(4, 25)
            rows.append(("c%03d" % i, 0, "user" if i % 2 else "assistant",
                         " ".join(rng.choice(vocab) for _ in range(n)),
                         None))
        pdf = _mini_transcripts(spark, rows)
        d = str(tmp_path_factory.mktemp("sloppy") / "idx")
        build_index(spark, pdf, d, n_buckets=4, positions=True)
        ora = build_oracle([
            {"doc_id": i, "text": r[3], "role": r[2]}
            for i, r in enumerate(rows)])
        idx = FTSIndex(spark, d)
        yield idx, ora, rows
        idx.close()

    def _eng(self, idx, ph, slop, **kw):
        return [(r["doc_id"], r["score"]) for r in
                idx.search_phrase(ph, slop=slop, **kw).collect()]

    def test_fuzz_vs_oracle(self, sloppy_setup):
        idx, ora, rows = sloppy_setup
        rng = random.Random(911)
        distinct_pairs = [("data", "table"), ("scan", "merge"),
                          ("row", "batch"), ("table", "scan"),
                          ("merge", "data", "row"),
                          ("batch", "scan", "table")]
        for ph_terms in distinct_pairs:
            for slop in (1, 2, 5):
                ph = " ".join(ph_terms)
                eng = self._eng(idx, ph, slop, k=30)
                orc = ora.search_phrase(ph, k=30, slop=slop)
                assert eng == orc, (ph, slop)
        # sloppy supersets exact: every exact hit survives any slop
        for ph_terms in distinct_pairs[:3]:
            ph = " ".join(ph_terms)
            exact_ids = {d for d, _ in self._eng(idx, ph, 0, k=100)}
            s2_ids = {d for d, _ in self._eng(idx, ph, 2, k=100)}
            assert exact_ids <= s2_ids, ph

    def test_window_behaviors_end_to_end(self, spark, tmp_path):
        rows = [
            ("c0", 0, "user", "alpha beta gamma", None),   # adjacent
            ("c1", 0, "user", "alpha gap beta x", None),   # 1 gap
            ("c2", 0, "user", "beta alpha gamma x", None),  # reversed
            ("c3", 0, "user", "alpha x y z beta", None),   # 3 gaps
        ]
        d = str(tmp_path / "win")
        build_index(spark, _mini_transcripts(spark, rows), d,
                    n_buckets=2, positions=True)
        with FTSIndex(spark, d) as idx:
            def ids(slop):
                return sorted(r["doc_id"] for r in
                              idx.search_phrase("alpha beta",
                                                slop=slop).collect())
            assert ids(0) == [0]
            assert ids(1) == [0, 1]
            assert ids(2) == [0, 1, 2]
            assert ids(3) == [0, 1, 2, 3]

    def test_stopword_gap_compresses_under_slop(self, spark, tmp_path):
        # query "end of file" → end@0, file@2 ("of" dropped, gap
        # kept); a doc with adjacent "end file" is matchLength 1 —
        # matches at slop>=1, not at slop=0 (Lucene behavior)
        rows = [
            ("c0", 0, "user", "the end of file marker", None),
            ("c1", 0, "user", "end file marker stuff x", None),
        ]
        d = str(tmp_path / "gap")
        build_index(spark, _mini_transcripts(spark, rows), d,
                    n_buckets=2, positions=True)
        with FTSIndex(spark, d) as idx:
            s0 = [r["doc_id"] for r in
                  idx.search_phrase("end of file").collect()]
            s1 = sorted(r["doc_id"] for r in
                        idx.search_phrase("end of file",
                                          slop=1).collect())
            assert s0 == [0]
            assert s1 == [0, 1]

    def test_filters_never_score_sloppy(self, sloppy_setup):
        idx, ora, rows = sloppy_setup
        ph, slop = "data table", 2
        eng = self._eng(idx, ph, slop, k=50,
                        filters={"role": "user"})
        orc = ora.search_phrase(
            ph, k=50, slop=slop,
            predicate=lambda a: a["role"] == "user")
        assert eng == orc
        unf = dict(self._eng(idx, ph, slop, k=1000))
        assert all(unf[d] == s for d, s in eng)

    def test_pagination_sloppy(self, sloppy_setup):
        idx, ora, rows = sloppy_setup
        all_hits = ora.search_phrase("data table", k=1000, slop=2)
        if len(all_hits) >= 6:
            page1 = self._eng(idx, "data table", 2, k=3, page=1)
            assert page1 == all_hits[3:6]

    def test_single_term_ignores_slop(self, sloppy_setup):
        idx, _, _ = sloppy_setup
        a = self._eng(idx, "data", 0)
        b = self._eng(idx, "data", 3)
        assert a == b and len(a) > 0

    def test_repeated_terms_sloppy_is_honest_slot(self, sloppy_setup):
        idx, ora, _ = sloppy_setup
        with pytest.raises(NotImplementedError, match="REPEATED|repeat"):
            idx.search_phrase("data data", slop=1)
        with pytest.raises(NotImplementedError):
            ora.search_phrase("data data", slop=1)
        # exact repeats still work
        assert isinstance(
            idx.search_phrase("data data", slop=0).collect(), list)

    def test_negative_slop_rejected(self, sloppy_setup):
        idx, _, _ = sloppy_setup
        with pytest.raises(ValueError, match="slop"):
            idx.search_phrase("data table", slop=-1)

    def test_ptf_counts_windows(self, spark, tmp_path):
        rows = [("c0", 0, "user", "alpha x beta alpha beta", None)]
        d = str(tmp_path / "ptf")
        build_index(spark, _mini_transcripts(spark, rows), d,
                    n_buckets=2, positions=True)
        with FTSIndex(spark, d) as idx:
            r = idx.search_phrase("alpha beta", slop=1).collect()[0]
            # windows: (alpha@0, beta@2) length 1 and
            # (alpha@3, beta@4) length 0 → ptf 2, freq 1.5
            assert r["ptf"] == 2


class TestSweepHypothesis:
    """Hypothesis properties over the sweep (pure-python, no Spark):
    shrinking finds minimal counterexamples if the two independent
    implementations (engine numpy / oracle plain-python) or the
    slop=0 ≡ exact-anchors tie ever diverge."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    pos_list = st.lists(st.integers(min_value=-8, max_value=40),
                        min_size=1, max_size=10, unique=True).map(sorted)
    slots = st.lists(pos_list, min_size=2, max_size=5)

    @given(lists=slots, slop=st.integers(min_value=0, max_value=10))
    @settings(max_examples=400, deadline=None)
    def test_engine_and_oracle_sweeps_agree(self, lists, slop):
        f_eng, n_eng = _sweep(lists, slop)
        f_orc = OracleIndex._sloppy_freq([list(x) for x in lists],
                                         slop)
        assert f_orc == pytest.approx(f_eng)

    @given(lists=slots)
    @settings(max_examples=400, deadline=None)
    def test_slop0_is_exact_anchor_count(self, lists):
        exact = set(lists[0])
        for lst in lists[1:]:
            exact &= set(lst)
        f, n = _sweep(lists, 0)
        assert n == len(exact)
        assert f == pytest.approx(float(len(exact)))

    @given(lists=slots, slop=st.integers(min_value=0, max_value=9))
    @settings(max_examples=200, deadline=None)
    def test_freq_monotone_in_slop(self, lists, slop):
        # widening the window can never lose weight: every window
        # scored at slop s is scored identically at s+1 (the sweep
        # visits the same states regardless of slop)
        f1, n1 = _sweep(lists, slop)
        f2, n2 = _sweep(lists, slop + 1)
        assert f2 >= f1 - 1e-12 and n2 >= n1
