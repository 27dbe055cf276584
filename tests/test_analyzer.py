"""Golden tests for the analysis chain — everything downstream depends
on byte-identical tokens (the rank-identity contract's first link)."""

from __future__ import annotations

import pandas as pd
import pytest

from moera_search_spark.analyzer import (
    ENGLISH_STOPWORDS,
    analyze,
    analyze_series,
    clear_html,
    extract_hashtags,
)
from moera_search_spark.porter import stem


class TestPorter:
    # canonical examples from the published Porter algorithm steps
    CASES = {
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "cats": "cat", "feed": "feed", "agreed": "agre",
        "plastered": "plaster", "bled": "bled", "motoring": "motor",
        "sing": "sing", "conflated": "conflat", "troubled": "troubl",
        "sized": "size", "hopping": "hop", "tanned": "tan",
        "falling": "fall", "hissing": "hiss", "fizzed": "fizz",
        "failing": "fail", "filing": "file", "happy": "happi",
        "sky": "sky", "relational": "relat", "conditional": "condit",
        "rational": "ration", "digitizer": "digit",
        "conformabli": "conform", "vietnamization": "vietnam",
        "predication": "predic", "operator": "oper",
        "feudalism": "feudal", "decisiveness": "decis",
        "triplicate": "triplic", "formative": "form",
        "formalize": "formal", "electriciti": "electr",
        "electrical": "electr", "hopeful": "hope", "goodness": "good",
        "revival": "reviv", "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens",
        "irritant": "irrit", "replacement": "replac",
        "adjustment": "adjust", "dependent": "depend",
        "adoption": "adopt", "communism": "commun",
        "activate": "activ", "effective": "effect", "probate": "probat",
        "rate": "rate", "cease": "ceas", "controll": "control",
        "roll": "roll",
    }

    def test_canonical_cases(self):
        for word, expected in self.CASES.items():
            assert stem(word) == expected, word

    def test_short_words_unchanged(self):
        for w in ("a", "is", "be", "ox"):
            assert stem(w) == w


class TestAnalyze:
    def test_full_chain(self):
        # possessive strip, lowercase, stop removal, stemming
        assert analyze("The World's BIGGEST running dogs") == \
            ["world", "biggest", "run", "dog"]

    def test_stopwords_removed(self):
        assert analyze("the and of to in a an it") == []
        for sw in ENGLISH_STOPWORDS:
            assert analyze(f"x {sw} y") == ["x", "y"]

    def test_numbers_kept_with_decimal(self):
        assert analyze("pi is 3.14 and 1,000 items") == \
            ["pi", "3.14", "1,000", "item"]

    def test_unicode(self):
        assert analyze("привет мир") == ["привет", "мир"]

    def test_empty_and_null(self):
        assert analyze("") == []
        assert analyze(None) == []
        assert analyze("!!! ...") == []

    def test_simple_mode_matches_sql_split(self):
        assert analyze("Hello, WORLD-42 x", mode="simple") == \
            ["hello", "world", "42", "x"]

    def test_series_matches_scalar(self):
        texts = ["running dogs", None, "", "the", "world's"]
        out = analyze_series(pd.Series(texts)).tolist()
        assert out == [analyze(t) for t in texts]

    def test_unknown_mode(self):
        with pytest.raises(ValueError):
            analyze("x", mode="nope")


class TestHtmlAndHashtags:
    def test_clear_html(self):
        # semantics of Util.clearHtml (util/Util.java:77-82)
        assert clear_html("a <b>bold</b> &amp; <i x=1>i</i>") == \
            "a  bold  &  i "

    def test_hashtags(self):
        # semantics of BodyUtil hashtag regex (util/BodyUtil.java:18-20)
        assert extract_hashtags("x #spark_fts y (#tag2) #123 not#this") == \
            ["#spark_fts", "#tag2"]

    def test_hashtag_needs_letter(self):
        assert extract_hashtags("#123 #1a #_x") == ["#1a", "#_x"]


class TestRawTokenMemo:
    """The batch-scoped raw-token memo (analyzer.py analyze /
    _analyze_russian) must be invisible: memoized output equals a
    naive straight-line pipeline, for any unicode input and any
    repetition pattern."""

    @staticmethod
    def _naive_english(text):
        import re

        from moera_search_spark.analyzer import (
            _POSSESSIVE_RE,
            _TOKEN_RE,
        )
        out = []
        for raw in _TOKEN_RE.findall(text):
            tok = _POSSESSIVE_RE.sub("", raw.lower())
            if not tok or tok in ENGLISH_STOPWORDS:
                continue
            out.append(stem(tok) if len(tok) > 2 else tok)
        return out

    def test_property_memo_equals_naive(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from moera_search_spark.analyzer import make_stemmer

        word = st.text(
            alphabet=st.characters(
                codec="utf-8",
                categories=("L", "Nd", "Pd", "Po", "Zs")),
            min_size=0, max_size=12)
        texts = st.lists(word, min_size=0, max_size=30).map(" ".join)

        @settings(max_examples=300, deadline=None)
        @given(texts)
        def check(text):
            st_obj = make_stemmer("english")
            # run twice through the SAME memo (exercise warm hits)
            assert analyze(text, _stemmer=st_obj) == \
                self._naive_english(text)
            assert analyze(text, _stemmer=st_obj) == \
                self._naive_english(text)

        check()

    def test_possessive_slice_matches_regex(self):
        # endswith slice vs the documented ['’]s$ regex
        for t in ["world's", "it's's", "JAMES’S", "s", "'s x", "a’s"]:
            got = analyze(t)
            exp = self._naive_english(t)
            assert got == exp, (t, got, exp)

    def test_russian_memo_repeat(self):
        s = "Быстрые кошки и быстрые собаки бегут быстрые"
        first = analyze(s, mode="russian")
        again = analyze(s, mode="russian")
        assert first == again
        # repeated surface form maps to one stem, stopword 'и' dropped
        assert first.count(first[0]) >= 2
