"""English stopword sets.

The reference builds its analyzer with a caller-supplied stop list loaded
from a properties-configured file (reference: indexing/TrecDocIndexer.java:78-88
reads ``stopfile`` into a StopwordAnalyzer; the repo ships a 571-word list).
We mirror that contract: a default public stop set, overridable by a
user-supplied file or iterable, threaded through the analyzer config.

``ENGLISH_STOP_WORDS`` is the classic 33-word English stop set that
Lucene's StandardAnalyzer/EnglishAnalyzer use by default (public, from the
original Information Retrieval literature / Lucene documentation).
"""

from __future__ import annotations

from collections.abc import Iterable

ENGLISH_STOP_WORDS: frozenset[str] = frozenset(
    """
    a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with
    """.split()
)


def load_stopwords(path: str) -> frozenset[str]:
    """Load a one-word-per-line stop file (the reference's format)."""
    words = set()
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            w = line.strip().lower()
            if w and not w.startswith("#"):
                words.add(w)
    return frozenset(words)


def resolve_stopwords(
    stopwords: None | str | Iterable[str],
) -> frozenset[str]:
    """None -> default set; str -> treat as file path; iterable -> set."""
    if stopwords is None:
        return ENGLISH_STOP_WORDS
    if isinstance(stopwords, str):
        return load_stopwords(stopwords)
    return frozenset(w.lower() for w in stopwords)
