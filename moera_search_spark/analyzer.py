"""Analysis chain — Lucene-``english``-analyzer-equivalent, vectorized.

The reference does no tokenization itself: it stores raw strings and
declares OpenSearch analyzers in the index mapping — ``english`` for
``subject``/``text``/``mediaText`` (reference: doc/mappings.txt:33-56),
applied inside Lucene.  Lucene's ``english`` analyzer is:

    StandardTokenizer (UAX#29 word break)
      → EnglishPossessiveFilter  (strip trailing 's)
      → LowerCaseFilter
      → StopFilter               (Lucene English stop set, 33 words)
      → PorterStemFilter

This module re-implements that chain deterministically in pure python,
exposed two ways:

* plain-python ``analyze(text)`` — used by the oracle (tests must share
  the exact chain for rank-identical top-k);
* Arrow-vectorized ``tokenize_udf`` / ``tokens_tf_iter`` — used by the
  Spark build/query pipelines (pandas UDF / mapInPandas; no per-row
  Spark python UDFs, per BASELINE input_hint).

Four modes:

* ``english`` — the full Lucene chain above (the engine default).
* ``russian`` — the Lucene ``russian`` analyzer twin: StandardTokenizer
  → LowerCaseFilter → StopFilter (Snowball Russian stop set) →
  SnowballFilter(Russian) — see russian.py.  The reference declares
  BOTH analyzers on every text field (doc/mappings.txt:45-56).
* ``bilingual`` — the twin-field model itself: every document's terms
  are emitted under BOTH analyzers, namespaced ``en>stem`` / ``ru>stem``
  (the Spark restatement of OpenSearch multi-fields); the query side
  analyzes with ONE chain picked by ``detect_language`` — exactly the
  reference's query-language field routing
  (index/LanguageAnalyzer.java:21-48 detects the query language and
  searches the matching twin fields).
* ``simple``  — lowercase + split on non-alphanumeric.  This matches
  Lucene's ``simple`` analyzer used by the reference's node full-name
  fulltext index (reference:
  src/main/resources/db/migration/V5__moera_node_simple_fulltext.cypher:2-8)
  and is also ANSI-SQL-expressible, which the DuckDB correctness oracle
  relies on.

Also here: ``clear_html`` — tag strip + entity unescape, the equivalent
of the reference's ``Util.clearHtml`` (reference:
src/main/java/org/moera/search/util/Util.java:77-82), and the hashtag
extraction regex (reference:
src/main/java/org/moera/search/util/BodyUtil.java:18-20,83-93).
"""

from __future__ import annotations

import html
import re
from collections import Counter
from collections.abc import Iterator

import pandas as pd

from .porter import MemoStemmer
from .russian import RUSSIAN_STOPWORDS, RussianMemoStemmer

# Lucene EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (public constant, 33 words).
ENGLISH_STOPWORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or
    such that the their then there these they this to was will with""".split()
)

# Approximation of UAX#29 word break used by Lucene's StandardTokenizer:
# number runs may contain . or , between digits (MidNum/MidNumLet);
# word runs are \w (letters, digits, underscore = ExtendNumLet) possibly
# joined by apostrophes (MidNumLet / MidLetter).
_TOKEN_RE = re.compile(
    r"\d+(?:[.,]\d+)+|\w+(?:['’]\w+)*",
    re.UNICODE,
)

# Possessive suffix after lowercasing ("world's" -> "world").
_POSSESSIVE_RE = re.compile(r"['’]s$")

# Tag pattern of Util.clearHtml (reference: util/Util.java:77-82):
# replace (?i)</?[a-z][^>]*> with a space, then HTML-unescape.
_HTML_TAG_RE = re.compile(r"(?i)</?[a-z][^>]*>")

# Hashtag regex of BodyUtil (reference: util/BodyUtil.java:18-20):
# (?U)(?:^|[\s(\[{>])(#[\p{L}\p{Nd}_]*[\p{L}_][\p{L}\p{Nd}_]*)\b
# python re has no \p{..}; [^\W] == unicode word chars gives the same
# letter/digit/underscore classes under re.UNICODE.
_HASHTAG_RE = re.compile(
    r"(?:^|[\s(\[{>])(#\w*[^\W\d]\w*)\b",
    re.UNICODE,
)

# Video-presence regex (reference: util/BodyUtil.java:17,50).
VIDEO_RE = r"(?i)<(?:object|video|iframe)"

_SIMPLE_SPLIT_RE = re.compile(r"[^a-z0-9]+")


def clear_html(text: str) -> str:
    """Strip tags and unescape entities (Util.clearHtml equivalent)."""
    return html.unescape(_HTML_TAG_RE.sub(" ", text))


def extract_hashtags(text: str) -> list[str]:
    """Hashtags per the reference's BodyUtil regex, deduplicated in order."""
    seen: dict[str, None] = {}
    for m in _HASHTAG_RE.finditer(text):
        seen.setdefault(m.group(1), None)
    return list(seen)


_CYRILLIC_RE = re.compile(r"[а-яё]", re.IGNORECASE)
_LETTER_RE = re.compile(r"[^\W\d_]", re.UNICODE)


def detect_language(text: str | None) -> str:
    """'ru' when Cyrillic letters dominate, else 'en' — the routing
    decision of the reference's query-language detection
    (index/LanguageAnalyzer.java:21-48, lingua en/ru).  For the en/ru
    pair, script detection is the load-bearing signal (documented
    simplification of the lingua n-gram model)."""
    if not text:
        return "en"
    letters = _LETTER_RE.findall(text)
    if not letters:
        return "en"
    cyr = sum(1 for ch in letters if _CYRILLIC_RE.match(ch))
    return "ru" if cyr * 2 > len(letters) else "en"



def _en_term(raw: str, memo: dict, stemmer) -> str:
    """THE english per-token chain (lowercase → possessive → stop →
    Porter), memoized per RAW token ("" = dropped).  Single source of
    truth shared by ``analyze`` and ``analyze_positions`` — the
    positional index relies on tf == len(positions), so the two
    callers must never diverge."""
    t = memo.get(raw)
    if t is None:
        tok = raw.lower()
        if tok.endswith(("'s", "’s")):  # _POSSESSIVE_RE semantics
            tok = tok[:-2]
        t = "" if (not tok or tok in ENGLISH_STOPWORDS) \
            else stemmer(tok)
        memo[raw] = t
    return t


def _ru_term(raw: str, memo: dict, stemmer) -> str:
    """The russian per-token chain (lowercase+ё→е → stop → Snowball),
    memoized per RAW token — see ``_en_term`` on why it is shared."""
    t = memo.get(raw)
    if t is None:
        tok = raw.lower().replace("ё", "е")
        t = "" if (not tok or tok in RUSSIAN_STOPWORDS) \
            else stemmer(tok)
        memo[raw] = t
    return t


def _analyze_russian(text: str, stemmer: RussianMemoStemmer) -> list[str]:
    """Lucene russian chain: tokenize → lowercase → RU stop set →
    Snowball russian stem (no possessive filter in that chain).

    Raw-token memo: the whole lowercase→stop→stem pipeline result is
    cached per RAW token on the batch-scoped stemmer ("" = dropped),
    so repeated surface forms cost one dict probe.
    """
    memo = stemmer.raw
    out: list[str] = []
    for raw in _TOKEN_RE.findall(text):
        t = _ru_term(raw, memo, stemmer)
        if t:
            out.append(t)
    return out


def analyze(text: str | None, mode: str = "english",
            _stemmer=None) -> list[str]:
    """Run the full analysis chain on one string → list of terms."""
    if text is None:
        return []
    if mode == "simple":
        return [t for t in _SIMPLE_SPLIT_RE.split(text.lower()) if t]
    if mode == "russian":
        stemmer = _stemmer if _stemmer is not None else RussianMemoStemmer()
        return _analyze_russian(text, stemmer)
    if mode == "bilingual":
        # index-side twin fields: term streams from BOTH analyzers,
        # namespaced so query routing picks exactly one field
        st = _stemmer if _stemmer is not None else _BilingualStemmers()
        return ([f"en>{t}" for t in analyze(text, "english", st.en)]
                + [f"ru>{t}" for t in _analyze_russian(text, st.ru)])
    if mode != "english":
        raise ValueError(f"unknown analyzer mode: {mode}")
    stemmer = _stemmer if _stemmer is not None else MemoStemmer()
    # Raw-token memo: lowercase→possessive→stop→stem is cached per RAW
    # (pre-lowercase) token on the batch-scoped stemmer, "" marking a
    # dropped token — one dict probe per repeated surface form instead
    # of two regex passes plus two lookups.
    memo = stemmer.raw
    out: list[str] = []
    for raw in _TOKEN_RE.findall(text):
        t = _en_term(raw, memo, stemmer)
        if t:
            out.append(t)
    return out


class _BilingualStemmers:
    """Paired memo stemmers for the bilingual twin-field mode."""

    def __init__(self) -> None:
        self.en = MemoStemmer()
        self.ru = RussianMemoStemmer()


def _positions_en(text: str, stemmer) -> list[tuple[str, int]]:
    """(term, position) pairs for the english chain.  Position = index
    in the raw StandardTokenizer stream, BEFORE the stop filter — the
    Lucene ``enablePositionIncrements=true`` contract: removing a
    stopword leaves a gap, so a phrase spanning it only matches with
    the same gap on the query side (an exact phrase stays exact)."""
    memo = stemmer.raw
    out: list[tuple[str, int]] = []
    for i, raw in enumerate(_TOKEN_RE.findall(text)):
        t = _en_term(raw, memo, stemmer)
        if t:
            out.append((t, i))
    return out


def _positions_ru(text: str, stemmer: RussianMemoStemmer,
                  ) -> list[tuple[str, int]]:
    """(term, position) pairs for the russian chain (same raw-stream
    position contract as ``_positions_en``)."""
    memo = stemmer.raw
    out: list[tuple[str, int]] = []
    for i, raw in enumerate(_TOKEN_RE.findall(text)):
        t = _ru_term(raw, memo, stemmer)
        if t:
            out.append((t, i))
    return out


def analyze_positions(text: str | None, mode: str = "english",
                      _stemmer=None) -> list[tuple[str, int]]:
    """Full analysis chain keeping token positions: list of
    ``(term, position)`` in stream order.  Invariant (property-tested):
    ``[t for t, _ in analyze_positions(x)] == analyze(x)`` for every
    mode.  Positions index the RAW token stream (pre-stop-filter), so
    stopword removal leaves position gaps — Lucene's
    ``enablePositionIncrements`` semantics, which exact-phrase
    matching depends on.  In ``simple`` mode nothing is ever dropped,
    so positions are contiguous (0, 1, 2, …) — the property the
    SQL-expressible phrase oracle relies on.  In ``bilingual`` mode
    both twin streams share the raw positions (the namespaced terms of
    one underlying token occupy the same slot)."""
    if text is None:
        return []
    if mode == "simple":
        toks = [t for t in _SIMPLE_SPLIT_RE.split(text.lower()) if t]
        return list(zip(toks, range(len(toks))))
    if mode == "russian":
        stemmer = _stemmer if _stemmer is not None else RussianMemoStemmer()
        return _positions_ru(text, stemmer)
    if mode == "bilingual":
        st = _stemmer if _stemmer is not None else _BilingualStemmers()
        return ([(f"en>{t}", i) for t, i in _positions_en(text, st.en)]
                + [(f"ru>{t}", i) for t, i in _positions_ru(text, st.ru)])
    if mode != "english":
        raise ValueError(f"unknown analyzer mode: {mode}")
    stemmer = _stemmer if _stemmer is not None else MemoStemmer()
    return _positions_en(text, stemmer)


def analyze_query_positions(text: str | None,
                            mode: str = "english",
                            ) -> list[tuple[str, int]]:
    """Query-side positional analysis for phrase queries — routes a
    bilingual query to ONE language twin (the same routing as
    ``analyze_query``), otherwise analyzes with the index chain."""
    if mode != "bilingual":
        return analyze_positions(text, mode=mode)
    lang = detect_language(text)
    if lang == "ru":
        return [(f"ru>{t}", i) for t, i in
                analyze_positions(text, mode="russian")]
    return [(f"en>{t}", i) for t, i in
            analyze_positions(text, mode="english")]


def doc_term_positions(text: str | None, mode: str = "english",
                       _stemmer=None) -> dict[str, list[int]]:
    """Per-document term → ascending position list, keys in first-
    occurrence order — the positional twin of ``doc_terms_tf``
    (``len(v)`` is exactly that term's tf; ``sum(len(v))`` is dl)."""
    out: dict[str, list[int]] = {}
    for term, pos in analyze_positions(text, mode=mode, _stemmer=_stemmer):
        out.setdefault(term, []).append(pos)
    return out


def analyze_query(text: str | None, mode: str = "english") -> list[str]:
    """Query-side analysis.  In ``bilingual`` mode this is the
    reference's language routing: detect the query language, analyze
    with THAT chain only, and address the matching twin field via the
    term namespace (LanguageAnalyzer.java:42-48 picks subject/text
    fields by detected language)."""
    if mode != "bilingual":
        return analyze(text, mode=mode)
    lang = detect_language(text)
    if lang == "ru":
        return [f"ru>{t}" for t in analyze(text, "russian")]
    return [f"en>{t}" for t in analyze(text, "english")]


def make_stemmer(mode: str):
    """The memoized stemmer object matching an analysis mode (one per
    Arrow batch amortizes distinct-term stemming)."""
    if mode == "russian":
        return RussianMemoStemmer()
    if mode == "bilingual":
        return _BilingualStemmers()
    return MemoStemmer()


def analyze_series(texts: pd.Series, mode: str = "english") -> pd.Series:
    """Vectorized analysis: pandas Series[str] → Series[list[str]].

    One memo stemmer per Arrow batch — distinct-term stemming cost is
    amortized over the whole batch.
    """
    stemmer = make_stemmer(mode)
    return texts.map(lambda t: analyze(t, mode=mode, _stemmer=stemmer))


def make_tokenize_udf(mode: str = "english"):
    """pandas UDF ``text -> array<string>`` (Arrow-batched)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    @pandas_udf(ArrayType(StringType()))
    def tokenize(texts: pd.Series) -> pd.Series:
        return analyze_series(texts, mode=mode)

    return tokenize


def doc_terms_tf(text: str | None, mode: str = "english",
                 _stemmer=None) -> Counter:
    """Per-document term frequencies (map-side; no shuffle needed)."""
    return Counter(analyze(text, mode=mode, _stemmer=_stemmer))


def tokens_tf_iter(pdf_iter: Iterator[pd.DataFrame], *, text_col: str,
                   doc_id_col: str = "doc_id",
                   mode: str = "english") -> Iterator[pd.DataFrame]:
    """mapInPandas body: (doc_id, text, …) → (doc_id, term, tf, dl) rows.

    Computes tf and dl map-side in one pass — the (term, doc) frequency
    table never goes through a groupBy shuffle, and dl rides along so
    the postings builder never joins back to the docs table.
    """
    stemmer = make_stemmer(mode)
    for pdf in pdf_iter:
        doc_ids: list[int] = []
        terms: list[str] = []
        tfs: list[int] = []
        dls: list[int] = []
        for doc_id, text in zip(pdf[doc_id_col].values, pdf[text_col].values):
            counts = doc_terms_tf(text, mode=mode, _stemmer=stemmer)
            dl = sum(counts.values())
            for term, tf in counts.items():
                doc_ids.append(doc_id)
                terms.append(term)
                tfs.append(tf)
                dls.append(dl)
        yield pd.DataFrame(
            {"doc_id": pd.Series(doc_ids, dtype="int64"),
             "term": pd.Series(terms, dtype="object"),
             "tf": pd.Series(tfs, dtype="int32"),
             "dl": pd.Series(dls, dtype="int32")}
        )
