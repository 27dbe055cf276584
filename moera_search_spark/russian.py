"""Snowball Russian stemmer + stop set — from-scratch implementation of
the public Snowball "russian" algorithm (Porter, snowballstem.org; the
same algorithm Lucene's ``russian`` analyzer applies via SnowballFilter).

The reference indexes every text field twice — an ``english`` twin and
a ``russian`` twin — and routes query fields by detected language
(reference: index/LanguageAnalyzer.java:21-48; doc/mappings.txt:45-56).
This module supplies the Russian half of that pair; analyzer.py wires
both into the ``russian`` and ``bilingual`` analysis modes.

Algorithm regions (all lowercase, ё folded to е):

* RV — the region after the first vowel;
* R1 — after the first non-vowel following a vowel;
* R2 — R1 applied again within R1.

Endings are matched longest-first and only inside RV (the DERIVATIONAL
step inside R2), exactly as the published algorithm specifies.
"""

from __future__ import annotations

VOWELS = "аеиоуыэюя"

# Ending groups of the published algorithm.  "Group 1" endings match
# only when preceded by а or я, and that а/я is kept.
_PERFECTIVE_GERUND_1 = ("вшись", "вши", "в")
_PERFECTIVE_GERUND_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_ADJECTIVE = (
    "ими", "ыми", "его", "ого", "ему", "ому",
    "ее", "ие", "ые", "ое", "ей", "ий", "ый", "ой", "ем", "им", "ым",
    "ом", "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею",
)
_PARTICIPLE_1 = ("ющ", "нн", "вш", "ем", "щ")
_PARTICIPLE_2 = ("ивш", "ывш", "ующ")
_REFLEXIVE = ("ся", "сь")
_VERB_1 = (
    "ешь", "нно", "ете", "йте",
    "ла", "на", "ли", "ем", "ло", "но", "ет", "ют", "ны", "ть",
    "й", "л", "н",
)
_VERB_2 = (
    "ейте", "уйте",
    "ила", "ыла", "ена", "ите", "или", "ыли", "ило", "ыло", "ено",
    "ует", "уют", "ены", "ить", "ыть", "ишь",
    "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ят", "ит", "ыт", "ую",
    "ю",
)
_NOUN = (
    "иями", "ями", "ами", "ией", "иям", "ием", "иях",
    "ев", "ов", "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям", "ем",
    "ам", "ом", "ах", "ях", "ию", "ью", "ия", "ья",
    "а", "е", "и", "й", "о", "у", "ы", "ь", "ю", "я",
)
_SUPERLATIVE = ("ейше", "ейш")
_DERIVATIONAL = ("ость", "ост")


def _regions(word: str) -> tuple[int, int]:
    """(rv_start, r2_start) per the Snowball region definitions."""
    n = len(word)
    rv = n
    for i, ch in enumerate(word):
        if ch in VOWELS:
            rv = i + 1
            break
    # R1: after first non-vowel following a vowel
    r1 = n
    for i in range(1, n):
        if word[i] not in VOWELS and word[i - 1] in VOWELS:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in VOWELS and word[i - 1] in VOWELS:
            r2 = i + 1
            break
    return rv, r2


def _ends(word: str, endings: tuple[str, ...], start: int,
          preceded_ay: bool = False) -> str | None:
    """Longest ending from ``endings`` that fits inside word[start:];
    with ``preceded_ay`` the char before the ending must be а/я."""
    for e in endings:   # tuples are ordered longest-first per length class
        if not word.endswith(e):
            continue
        cut = len(word) - len(e)
        if cut < start:
            continue
        if preceded_ay:
            if cut == 0 or word[cut - 1] not in "ая":
                continue
        return e
    return None


def _longest(word: str, start: int,
             *groups: tuple[tuple[str, ...], bool]) -> tuple[str, bool] | None:
    """Longest match across several (endings, preceded_ay) groups."""
    best: tuple[str, bool] | None = None
    for endings, ay in groups:
        e = _ends(word, endings, start, preceded_ay=ay)
        if e is not None and (best is None or len(e) > len(best[0])):
            best = (e, ay)
    return best


def russian_stem(word: str) -> str:
    """Stem one lowercase Russian word (non-Cyrillic input returned
    unchanged apart from ё→е folding)."""
    word = word.replace("ё", "е")
    rv, r2 = _regions(word)

    # Step 1: perfective gerund, else (reflexive?) adjectival / verb /
    # noun.
    m = _longest(word, rv, (_PERFECTIVE_GERUND_2, False),
                 (_PERFECTIVE_GERUND_1, True))
    if m is not None:
        word = word[: len(word) - len(m[0])]
    else:
        e = _ends(word, _REFLEXIVE, rv)
        if e is not None:
            word = word[: len(word) - len(e)]
        adj = _ends(word, _ADJECTIVE, rv)
        if adj is not None:
            word = word[: len(word) - len(adj)]
            m = _longest(word, rv, (_PARTICIPLE_2, False),
                         (_PARTICIPLE_1, True))
            if m is not None:
                word = word[: len(word) - len(m[0])]
        else:
            m = _longest(word, rv, (_VERB_2, False), (_VERB_1, True))
            if m is not None:
                word = word[: len(word) - len(m[0])]
            else:
                e = _ends(word, _NOUN, rv)
                if e is not None:
                    word = word[: len(word) - len(e)]

    # Step 2: undouble и
    if word.endswith("и") and len(word) - 1 >= rv:
        word = word[:-1]

    # Step 3: derivational ending in R2
    e = _ends(word, _DERIVATIONAL, r2)
    if e is not None:
        word = word[: len(word) - len(e)]

    # Step 4: undouble н / superlative / final ь
    if word.endswith("нн") and len(word) - 1 >= rv:
        word = word[:-1]
    else:
        e = _ends(word, _SUPERLATIVE, rv)
        if e is not None:
            word = word[: len(word) - len(e)]
            if word.endswith("нн") and len(word) - 1 >= rv:
                word = word[:-1]
        elif word.endswith("ь") and len(word) - 1 >= rv:
            word = word[:-1]
    return word


class RussianMemoStemmer:
    """Memoized russian_stem — one instance per Arrow batch, mirroring
    porter.MemoStemmer's amortization of distinct-term stemming."""

    def __init__(self) -> None:
        self._memo: dict[str, str] = {}
        # analyzer's raw-token→term pipeline cache (see porter.MemoStemmer)
        self.raw: dict[str, str] = {}

    def __call__(self, word: str) -> str:
        s = self._memo.get(word)
        if s is None:
            s = self._memo[word] = russian_stem(word)
        return s


# Snowball Russian stop word list (public; the default list Lucene's
# russian analyzer ships, from snowballstem.org).
RUSSIAN_STOPWORDS = frozenset("""
и в во не что он на я с со как а то все она так его но да ты к у же
вы за бы по только ее мне было вот от меня еще нет о из ему теперь
когда даже ну вдруг ли если уже или ни быть был него до вас нибудь
опять уж вам ведь там потом себя ничего ей может они тут где есть
надо ней для мы тебя их чем была сам чтоб без будто чего раз тоже
себе под будет ж тогда кто этот того потому этого какой совсем ним
здесь этом один почти мой тем чтобы нее сейчас были куда зачем всех
никогда можно при наконец два об другой хоть после над больше тот
через эти нас про всего них какая много разве три эту моя впрочем
хорошо свою этой перед иногда лучше чуть том нельзя такой им более
всегда конечно всю между
""".split())
