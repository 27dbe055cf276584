"""Bilingual (english + russian twin-field) analysis and routing — the
Spark restatement of the reference's LanguageAnalyzer
(index/LanguageAnalyzer.java:21-48: detect the query language, search
that language's twin fields; doc/mappings.txt:45-56 declares english
AND russian analyzer twins on every text field).

Covers: Snowball russian stemmer behavior classes, RU stop set,
language detection, twin-term emission, query routing, and engine
rank-identity vs the pure-python oracle over a mixed RU/EN corpus.
"""

from __future__ import annotations

import pandas as pd
import pytest

from moera_search_spark.analyzer import (
    analyze,
    analyze_query,
    detect_language,
)
from moera_search_spark.russian import RUSSIAN_STOPWORDS, russian_stem

TS = "2026-01-01 00:00:00"
DDL = ("conv_id string, turn_idx int, role string, text string, "
       "tool string, ts timestamp")


class TestRussianStemmer:
    def test_noun_inflections_share_stem(self):
        stems = {russian_stem(w)
                 for w in ["книга", "книги", "книгу", "книгами", "книге"]}
        assert stems == {"книг"}

    def test_adjective_inflections_share_stem(self):
        stems = {russian_stem(w)
                 for w in ["красивый", "красивая", "красивое", "красивых"]}
        assert stems == {"красив"}

    def test_verb_forms_share_stem(self):
        stems = {russian_stem(w) for w in ["делать", "делаю", "делала"]}
        assert stems == {"дела"}

    def test_perfective_gerund(self):
        assert russian_stem("сделавшись") == "сдела"

    def test_derivational_ost(self):
        assert russian_stem("полезность") == "полезн"

    def test_yo_folded_to_ye(self):
        assert russian_stem("ёлка") == russian_stem("елка")

    def test_superlative(self):
        assert russian_stem("красивейший") == russian_stem("красивый")

    def test_latin_passthrough(self):
        assert russian_stem("spark") == "spark"

    def test_stop_set_membership(self):
        assert {"и", "в", "не", "что", "как"} <= RUSSIAN_STOPWORDS
        assert "книга" not in RUSSIAN_STOPWORDS


class TestDetectLanguage:
    @pytest.mark.parametrize("text,lang", [
        ("hello world", "en"),
        ("привет мир", "ru"),
        ("Привет, как дела?", "ru"),
        ("mostly english текст", "en"),
        ("", "en"),
        (None, "en"),
        ("12345 !!!", "en"),
        ("чуть more русских слов here", "ru"),
    ])
    def test_detect(self, text, lang):
        assert detect_language(text) == lang


class TestBilingualAnalysis:
    def test_russian_chain_stems_and_stops(self):
        terms = analyze("Я читаю интересные книги и статьи",
                        mode="russian")
        assert "книг" in terms
        assert "и" not in terms and "я" not in terms

    def test_index_side_emits_both_twins(self):
        terms = analyze("running книги", mode="bilingual")
        assert "en>run" in terms            # english chain stem
        assert "ru>книг" in terms           # russian chain stem
        # english word also lands (unstemmed) in the ru twin and vice
        # versa — exactly the two-analyzer multi-field behavior
        assert "ru>running" in terms
        assert "en>книги" in terms

    def test_query_side_routes_to_one_field(self):
        ru = analyze_query("интересные книги", mode="bilingual")
        assert ru and all(t.startswith("ru>") for t in ru)
        en = analyze_query("interesting books", mode="bilingual")
        assert en and all(t.startswith("en>") for t in en)


RU_DOCS = [
    "Я читаю интересные книги о программировании каждый день",
    "Новая книга про распределённые системы вышла вчера",
    "Статья о поиске и индексации больших данных",
    "Распределённый поиск по книгам работает быстро",
    "Очень интересная статья про языковые модели",
]
EN_DOCS = [
    "reading interesting books about programming every day",
    "a new book about distributed systems came out yesterday",
    "an article on search and indexing of big data",
    "distributed search over books works fast",
    "a very interesting article about language models",
]


class TestBilingualEngine:
    @pytest.fixture(scope="class")
    def bilingual_index(self, spark, tmp_path_factory):
        from moera_search_spark.build import build_index
        from moera_search_spark.query import FTSIndex

        rows = []
        for i, t in enumerate(RU_DOCS + EN_DOCS):
            rows.append((f"conv-{i:04d}", 0, "user", t, None,
                         pd.Timestamp(TS)))
        pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                          "text", "tool", "ts"])
        df = spark.createDataFrame(pdf, DDL)
        idx_dir = str(tmp_path_factory.mktemp("bilingual") / "idx")
        build_index(spark, df, idx_dir, mode="bilingual", n_buckets=2)
        return FTSIndex(spark, idx_dir)

    @pytest.fixture(scope="class")
    def bilingual_oracle(self):
        from moera_search_spark.oracle import build_oracle

        rows = [{"doc_id": i, "text": t}
                for i, t in enumerate(RU_DOCS + EN_DOCS)]
        return build_oracle(rows, mode="bilingual")

    @pytest.mark.parametrize("query", [
        "интересные книги",          # ru → ru field
        "распределённый поиск",      # ru, ё-folding
        "interesting books",         # en → en field
        "distributed search",        # en
    ])
    def test_rank_identity_vs_oracle(self, bilingual_index,
                                     bilingual_oracle, query):
        got = [(int(r["doc_id"]), round(float(r["score"]), 9))
               for r in bilingual_index.search(query, k=5).collect()]
        want = [(d, round(s, 9))
                for d, s in bilingual_oracle.search(query, k=5)]
        assert got == want
        assert got, f"query {query!r} matched nothing"

    def test_ru_query_hits_only_ru_relevant_docs(self, bilingual_index):
        hits = {int(r["doc_id"]) for r in
                bilingual_index.search("книги", k=10).collect()}
        assert hits and hits <= set(range(len(RU_DOCS)))

    def test_en_query_prefers_en_docs(self, bilingual_index):
        hits = {int(r["doc_id"]) for r in
                bilingual_index.search("books", k=10).collect()}
        assert hits and hits <= set(range(len(RU_DOCS),
                                          len(RU_DOCS) + len(EN_DOCS)))

    def test_pruned_matches_exhaustive(self, bilingual_index):
        for q in ("интересные книги", "interesting books"):
            ex = [(int(r["doc_id"]), round(float(r["score"]), 9))
                  for r in bilingual_index.search(
                      q, k=5, method="exhaustive").collect()]
            pr = [(int(r["doc_id"]), round(float(r["score"]), 9))
                  for r in bilingual_index.search(
                      q, k=5, method="pruned").collect()]
            assert ex == pr
