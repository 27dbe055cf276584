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
