"""Phrase-query coverage: positional index build + exact-phrase BM25.

The capability is Lucene's PhraseQuery (the engine the reference
delegates text search to; the reference API itself stops at
multi_match, reference: index/Index.java:304-313), scale-added like
``search_many``:

* analyzer positions — ``analyze_positions`` must agree with
  ``analyze`` term-for-term in every mode, and keep RAW-stream
  positions (stopword gaps preserved, Lucene
  ``enablePositionIncrements`` semantics);
* engine ``FTSIndex.search_phrase`` vs the pure-python oracle —
  rank- AND bit-identical scores (same tie-break), including
  stopword-gap phrases, repeated-term phrases, filters, pagination;
* physical ``positions`` table — parallelism-invariant bytes;
* incremental: upserts/deletes/compact keep phrase results exact.
"""

from __future__ import annotations

import os
import shutil

import pytest

from moera_search_spark.analyzer import (analyze, analyze_positions,
                                         analyze_query_positions)
from moera_search_spark.build import build_index
from moera_search_spark.oracle import build_oracle
from moera_search_spark.query import FTSIndex

N_CONVS = 120
SEED = 42


@pytest.fixture(scope="module")
def pos_index(spark, corpus_df, tmp_path_factory):
    idx_dir = str(tmp_path_factory.mktemp("pidx") / "index")
    shutil.rmtree(idx_dir, ignore_errors=True)
    build_index(spark, corpus_df, idx_dir, n_buckets=8, positions=True)
    idx = FTSIndex(spark, idx_dir)
    yield idx
    idx.close()


def _phrases_from(corpus_pdf, n=10):
    """Raw word windows from real doc texts (pre-analysis, so they
    exercise stopword gaps and stemming on the query side too)."""
    out = []
    for txt in corpus_pdf["text"].head(40):
        if not isinstance(txt, str):
            continue
        w = txt.split()
        if len(w) >= 5:
            out.append(" ".join(w[1:3]))
            out.append(" ".join(w[2:5]))
        if len(out) >= n:
            break
    return out[:n]


class TestAnalyzerPositions:
    def test_terms_match_analyze_all_modes(self, corpus_pdf):
        texts = list(corpus_pdf["text"].head(60)) + [
            None, "", "The quick brown fox's jumps over the lazy dog",
            "приветик мир и ещё солнце", "a the of and to",
            "Hello, WORLD... hello world's",
        ]
        for mode in ("english", "simple", "russian", "bilingual"):
            for txt in texts:
                pairs = analyze_positions(txt, mode=mode)
                assert [t for t, _ in pairs] == analyze(txt, mode=mode)

    def test_stopword_gap_preserved(self):
        # "quick" idx 1, "fox" idx 2, "running" idx 4 ("is" dropped)
        assert analyze_positions("The quick fox is running") == [
            ("quick", 1), ("fox", 2), ("run", 4)]

    def test_simple_mode_positions_contiguous(self):
        pairs = analyze_positions("Alpha, beta;; gamma", mode="simple")
        assert pairs == [("alpha", 0), ("beta", 1), ("gamma", 2)]

    def test_bilingual_twins_share_raw_positions(self):
        pairs = analyze_positions("привет мир", mode="bilingual")
        en = [(t, i) for t, i in pairs if t.startswith("en>")]
        ru = [(t, i) for t, i in pairs if t.startswith("ru>")]
        assert [i for _, i in en] == [i for _, i in ru] == [0, 1]

    def test_query_routing(self):
        ru = analyze_query_positions("привет мир", mode="bilingual")
        assert all(t.startswith("ru>") for t, _ in ru)
        en = analyze_query_positions("hello world", mode="bilingual")
        assert all(t.startswith("en>") for t, _ in en)


class TestPhraseVsOracle:
    def _engine(self, idx, phrase, k=10, filters=None, page=0):
        rows = idx.search_phrase(phrase, k=k, filters=filters,
                                 page=page).collect()
        return [(r["doc_id"], r["score"]) for r in rows]

    def test_rank_and_score_identity(self, pos_index, oracle_index,
                                     corpus_pdf):
        phrases = _phrases_from(corpus_pdf) + [
            "the quick fox",          # absent terms → empty
            "a the of",               # all stopwords → empty
            "",                       # empty → empty
        ]
        assert len(phrases) >= 12
        for ph in phrases:
            eng = self._engine(pos_index, ph)
            orc = oracle_index.search_phrase(ph, k=10)
            assert eng == orc, f"phrase {ph!r}"

    def test_single_term_phrase_equals_term_query(self, pos_index,
                                                  corpus_pdf):
        # Lucene rewrites a 1-term PhraseQuery to a TermQuery; the
        # positional path must produce the identical ranking + scores.
        term_raw = next(
            w for txt in corpus_pdf["text"].head(20)
            if isinstance(txt, str)
            for w in txt.split() if analyze(w))   # skip stopwords
        ph = self._engine(pos_index, term_raw)
        tq = [(r["doc_id"], r["score"]) for r in
              pos_index.search(term_raw, k=10,
                               method="exhaustive").collect()]
        assert ph == tq
        assert len(ph) > 0

    def test_filters_never_score(self, pos_index, oracle_index,
                                 corpus_pdf):
        ph = _phrases_from(corpus_pdf, 3)[0]
        filters = {"role": "user"}
        eng = self._engine(pos_index, ph, filters=filters)
        orc = oracle_index.search_phrase(
            ph, k=10, predicate=lambda a: a["role"] == "user")
        assert eng == orc
        # filtered scores are a subset of unfiltered scores (unscored
        # filter: the score of a surviving doc is unchanged)
        unf = dict(self._engine(pos_index, ph, k=1000))
        assert all(unf[d] == s for d, s in eng)

    def test_pagination(self, pos_index, oracle_index, corpus_pdf):
        ph = _phrases_from(corpus_pdf, 1)[0]
        all_hits = oracle_index.search_phrase(ph, k=1000)
        if len(all_hits) >= 5:
            page1 = self._engine(pos_index, ph, k=2, page=1)
            assert page1 == all_hits[2:4]

    def test_repeated_term_phrase(self, spark, tmp_path):
        rows = [
            ("c0", 0, "user", "echo echo echo once", None),
            ("c1", 0, "user", "echo echo twice here", None),
            ("c2", 0, "user", "echo once echo twice", None),
        ]
        pdf = _mini_transcripts(spark, rows)
        d = str(tmp_path / "rep")
        build_index(spark, pdf, d, n_buckets=2, positions=True)
        ora = build_oracle([
            {"doc_id": i, "text": r[3]} for i, r in enumerate(rows)])
        with FTSIndex(spark, d) as idx:
            eng = [(r["doc_id"], r["score"])
                   for r in idx.search_phrase("echo echo").collect()]
        orc = ora.search_phrase("echo echo")
        assert eng == orc
        assert [d_ for d_, _ in eng] == [0, 1]   # doc0 ptf=2, doc1 ptf=1

    def test_stopword_gap_must_match(self, spark, tmp_path):
        # query "end of file": "of" is a stopword → end@i, file@i+2.
        # A doc with "end file" adjacent must NOT match; a doc with
        # "end of file" (same gap) must.
        rows = [
            ("c0", 0, "user", "the end of file marker", None),
            ("c1", 0, "user", "end file marker stuff x", None),
            ("c2", 0, "user", "end to file gap stuff", None),  # gap too
        ]
        pdf = _mini_transcripts(spark, rows)
        d = str(tmp_path / "gap")
        build_index(spark, pdf, d, n_buckets=2, positions=True)
        ora = build_oracle([
            {"doc_id": i, "text": r[3]} for i, r in enumerate(rows)])
        with FTSIndex(spark, d) as idx:
            eng = [(r["doc_id"], r["score"])
                   for r in idx.search_phrase("end of file").collect()]
        orc = ora.search_phrase("end of file")
        assert eng == orc
        # both gap-compatible docs match ("of" and "to" are both
        # stopwords at the same raw position), adjacent doc1 does not
        assert sorted(d_ for d_, _ in eng) == [0, 2]


def _mini_transcripts(spark, rows):
    from datetime import datetime

    ts = datetime(2026, 1, 1)
    return spark.createDataFrame(
        [(c, t, r, x, tool, ts) for c, t, r, x, tool in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")


class TestPhraseEdges:
    def test_requires_positional_index(self, built_index):
        with pytest.raises(ValueError, match="positions"):
            built_index.search_phrase("any phrase")

    def test_sloppy_repeats_are_an_honest_slot(self, pos_index):
        # slop>0 is implemented since round 5 (classic Lucene sweep,
        # tests/test_sloppy_phrase.py); the remaining honest slot is
        # Lucene's repeat-collision machinery
        with pytest.raises(NotImplementedError, match="REPEATED|repeat"):
            pos_index.search_phrase("running running", slop=1)

    def test_hydrate(self, pos_index, corpus_pdf):
        ph = _phrases_from(corpus_pdf, 1)[0]
        rows = pos_index.search_phrase(ph, k=3, hydrate=True).collect()
        assert rows and "text" in rows[0].asDict()
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)


def _canon(spark, idx_dir, table):
    """Canonical table content — the repo's parallelism-invariance
    contract (sorted rows, blob md5s; parquet part numbering is not
    pinned): same convention as TestIndexParallelismInvariance."""
    import pyspark.sql.functions as F

    df = spark.read.parquet(os.path.join(idx_dir, table))
    blob_cols = [c for c, t in df.dtypes if t == "binary"]
    other = [c for c, t in df.dtypes if t != "binary"]
    sel = df.select(*other, *[F.md5(F.hex(c)).alias(c)
                              for c in blob_cols])
    return sorted(map(tuple, sel.collect()))


class TestPositionsPhysical:
    def test_parallelism_invariant_content(self, spark, corpus_df,
                                           tmp_path):
        d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
        build_index(spark, corpus_df, d1, n_buckets=8, positions=True,
                    shuffle_partitions=3)
        build_index(spark, corpus_df, d2, n_buckets=8, positions=True,
                    shuffle_partitions=16)
        assert _canon(spark, d1, "positions") == \
            _canon(spark, d2, "positions")
        assert _canon(spark, d1, "postings") == \
            _canon(spark, d2, "postings")

    def test_bucket_count_invariant_results(self, spark, corpus_df,
                                            oracle_index, corpus_pdf,
                                            tmp_path):
        # runs split differently at another bucket count (positions
        # keep run granularity), but query results stay identical
        d = str(tmp_path / "nb")
        build_index(spark, corpus_df, d, n_buckets=3, positions=True)
        ph = _phrases_from(corpus_pdf, 2)
        with FTSIndex(spark, d) as idx:
            for p in ph:
                eng = [(r["doc_id"], r["score"])
                       for r in idx.search_phrase(p).collect()]
                assert eng == oracle_index.search_phrase(p, k=10)

    def test_postings_unchanged_by_positions_flag(self, spark,
                                                  corpus_df, tmp_path):
        d1, d2 = str(tmp_path / "p0"), str(tmp_path / "p1")
        build_index(spark, corpus_df, d1, n_buckets=8)
        build_index(spark, corpus_df, d2, n_buckets=8, positions=True)
        for sub in ("postings", "docs", "term_stats"):
            assert _canon(spark, d1, sub) == _canon(spark, d2, sub), sub
        assert not os.path.isdir(os.path.join(d1, "positions"))


class TestIncrementalPhrase:
    def _ids(self, idx, ph):
        return [r["doc_id"] for r in idx.search_phrase(ph).collect()]

    def test_upsert_delete_compact(self, spark, corpus_df, tmp_path):
        from moera_search_spark.incremental import apply_updates, compact

        d = str(tmp_path / "inc")
        build_index(spark, corpus_df, d, n_buckets=4, positions=True)
        marker = "zebra quagga unicorn"
        ups = _mini_transcripts(spark, [
            ("zz-new", 0, "user", f"fresh {marker} doc", None)])
        apply_updates(spark, d, upserts=ups, batch_id="b1")
        with FTSIndex(spark, d) as idx:
            hits = self._ids(idx, marker)
            assert len(hits) == 1
            new_id = hits[0]
            # the upserted doc came from a positional delta segment
            conv = idx.docs.filter(f"doc_id = {new_id}") \
                .collect()[0]["conv_id"]
            assert conv == "zz-new"
        # replace its text: the phrase must disappear (old revision
        # tombstoned), the replacement phrase must appear
        ups2 = _mini_transcripts(spark, [
            ("zz-new", 0, "user", "swapped wombat numbat text", None)])
        apply_updates(spark, d, upserts=ups2, batch_id="b2")
        with FTSIndex(spark, d) as idx:
            assert self._ids(idx, marker) == []
            assert len(self._ids(idx, "wombat numbat")) == 1
        compact(spark, d)
        with FTSIndex(spark, d) as idx:
            assert bool(idx.config.get("positions")) is True
            assert self._ids(idx, marker) == []
            assert len(self._ids(idx, "wombat numbat")) == 1


class TestPlaceholderAdoption:
    def test_blanked_compact_then_upsert(self, spark, tmp_path):
        """A fully-blanked corpus compacts to FLAT schema-only
        placeholder tables (so the index opens); a later real upsert
        adopts hive term_bucket= segment files into the same dirs.
        Adoption must drop the obsolete placeholders — mixing root
        leaf files with partition dirs is unspecified-layout
        territory — and both query paths must work after."""
        from moera_search_spark.incremental import apply_updates, compact

        d = str(tmp_path / "ph")
        build_index(spark, _mini_transcripts(
            spark, [("c0", 0, "user", "hello world data", None)]),
            d, n_buckets=2, positions=True)
        apply_updates(spark, d, upserts=_mini_transcripts(
            spark, [("c0", 0, "user", "   ", None)]), batch_id="b1")
        compact(spark, d)
        apply_updates(spark, d, upserts=_mini_transcripts(
            spark, [("c1", 0, "user", "fresh data table here", None)]),
            batch_id="b2")
        for sub in ("postings", "positions", "pc_bounds"):
            root_files = [f for f in os.listdir(os.path.join(d, sub))
                          if f.endswith(".parquet")
                          and os.path.isfile(os.path.join(d, sub, f))]
            assert not root_files, (sub, root_files)
        with FTSIndex(spark, d) as idx:
            # the compacted (blanked) doc kept id 0; the upsert got 1
            assert [r["doc_id"] for r in
                    idx.search("data table").collect()] == [1]
            assert [r["doc_id"] for r in
                    idx.search_phrase("data table").collect()] == [1]

    def test_compact_adds_positions(self, spark, corpus_df,
                                    oracle_index, corpus_pdf, tmp_path):
        """compact(positions=True) upgrades a positions-less index to
        phrase support — the path the search_phrase error advises."""
        from moera_search_spark.incremental import compact

        d = str(tmp_path / "up")
        build_index(spark, corpus_df, d, n_buckets=4)
        with FTSIndex(spark, d) as idx:
            with pytest.raises(ValueError, match="positions"):
                idx.search_phrase("any phrase")
        compact(spark, d, positions=True)
        ph = _phrases_from(corpus_pdf, 1)[0]
        with FTSIndex(spark, d) as idx:
            assert bool(idx.config.get("positions")) is True
            eng = [(r["doc_id"], r["score"])
                   for r in idx.search_phrase(ph).collect()]
        assert eng == oracle_index.search_phrase(ph, k=10)


class TestBilingualPhrase:
    def test_language_routed_phrase(self, spark, tmp_path):
        """A bilingual index answers phrases in EITHER language — the
        query routes to one twin namespace (the reference's
        query-language field routing, LanguageAnalyzer.java:42-48),
        and the twins share raw positions, so gaps work per chain."""
        rows = [
            ("c0", 0, "user", "быстрый поиск по архиву данных", None),
            ("c1", 0, "user", "fast search over the data archive", None),
            ("c2", 0, "user", "поиск быстрый данных по архиву", None),
            ("c3", 0, "user", "archive data over search fast", None),
        ]
        pdf = _mini_transcripts(spark, rows)
        d = str(tmp_path / "bi")
        build_index(spark, pdf, d, n_buckets=2, positions=True,
                    mode="bilingual")
        ora = build_oracle(
            [{"doc_id": i, "text": r[3]} for i, r in enumerate(rows)],
            mode="bilingual")
        with FTSIndex(spark, d) as idx:
            for ph, want in (
                    ("быстрый поиск", [0]),
                    # "over the data" → over@i data@i+2 ("the" gap)
                    ("over the data", [1]),
                    ("поиск по архиву", [0]),
                    ("data archive", [1]),
                    ("быстрый архив", []),
            ):
                eng = [(r["doc_id"], r["score"])
                       for r in idx.search_phrase(ph).collect()]
                assert eng == ora.search_phrase(ph), ph
                assert [x for x, _ in eng] == want, ph


class TestPhraseFuzz:
    def test_small_vocab_fuzz(self, spark, tmp_path):
        """Tiny vocab forces heavy term repetition and stopword
        adjacency — the worst case for the key-intersection logic."""
        import random

        rng = random.Random(1234)
        vocab = ["the", "data", "table", "scan", "of", "merge",
                 "a", "row"]
        rows = []
        for i in range(60):
            n = rng.randint(3, 30)
            rows.append(("c%03d" % i, 0, "user",
                         " ".join(rng.choice(vocab) for _ in range(n)),
                         None))
        pdf = _mini_transcripts(spark, rows)
        d = str(tmp_path / "fuzz")
        build_index(spark, pdf, d, n_buckets=4, positions=True)
        ora = build_oracle([
            {"doc_id": i, "text": r[3]} for i, r in enumerate(rows)])
        with FTSIndex(spark, d) as idx:
            for _ in range(8):
                src = rows[rng.randrange(len(rows))][3].split()
                m = rng.randint(1, min(4, len(src)))
                s = rng.randrange(len(src) - m + 1)
                ph = " ".join(src[s:s + m])
                eng = [(r["doc_id"], r["score"])
                       for r in idx.search_phrase(ph, k=20).collect()]
                assert eng == ora.search_phrase(ph, k=20), ph
