"""Deterministic synthetic source-code corpus.

Generates the north-rule input table shape — (repo, path, commit, lang,
content) — entirely inside Spark (FIXTURES.md §1: seed=42, Zipf token
distribution, guaranteed high-df skew tokens, possessives / mixed case /
snake_case / digits for tokenizer coverage, one unique token per doc).
No external data; same (n_docs, seed) -> byte-identical table on any
cluster size (content is a pure function of the row index).

Generation is distributed: ``spark.range(n_docs)`` partitions the id
space; a ``mapInPandas`` kernel derives each row from its index with a
per-row-seeded RNG, so the output does not depend on partitioning.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

EXTS = [("py", "python"), ("java", "java"), ("scala", "scala"),
        ("md", "markdown"), ("txt", "text")]

_SYL_A = ["com", "re", "de", "pro", "sta", "con", "ex", "in", "tra", "per",
          "sub", "for", "ob", "ad", "di", "mo", "ba", "ca", "ra", "te"]
_SYL_B = ["pu", "la", "ti", "ve", "ma", "ri", "no", "se", "fi", "lo",
          "du", "pa", "mi", "ta", "ne", "ga", "bo", "cu", "vi", "me"]
_SYL_C = ["tion", "ment", "ness", "ing", "ed", "er", "al", "ly", "ate",
          "ize", "ous", "ic", "ies", "s", "", "", "", "", "", ""]

HIGH_DF_TOKENS = [
    "the", "license", "import", "return", "public", "class", "void",
    "static", "function", "def", "self", "string", "value", "data",
    "result", "const", "int", "this", "new", "null", "true", "false",
    "for", "while", "if", "else", "try", "catch", "final", "package",
]


def build_vocab(size: int = 5000) -> list[str]:
    """English-like pseudo-words (stems + suffixes exercise Porter)."""
    words = []
    i = 0
    while len(words) < size:
        a = _SYL_A[i % len(_SYL_A)]
        b = _SYL_B[(i // len(_SYL_A)) % len(_SYL_B)]
        c = _SYL_C[(i // (len(_SYL_A) * len(_SYL_B))) % len(_SYL_C)]
        w = a + b + c
        if w not in words[-50:]:
            words.append(w)
        i += 1
    return words[:size]


def _content_for(i: int, vocab: np.ndarray, zipf_cum: np.ndarray,
                 seed: int) -> str:
    rng = np.random.default_rng(seed * 1_000_003 + i)
    length = int(rng.integers(20, 400))
    picks = vocab[np.searchsorted(zipf_cum, rng.random(length))]
    toks = list(picks)
    # guaranteed high-df tokens in >50% of docs (skew-salting exercise)
    for t in HIGH_DF_TOKENS:
        if rng.random() < 0.55:
            toks.append(t)
    # tokenizer-parity salts
    if rng.random() < 0.3:
        toks.append("user's")
    if rng.random() < 0.3:
        toks.append("CamelCaseIdentifier")
    if rng.random() < 0.3:
        toks.append(f"snake_case_{int(rng.integers(0, 100))}")
    if rng.random() < 0.3:
        toks.append(str(int(rng.integers(0, 99999))))
    toks.append(f"uniq_{i}")  # df=1 tail / doc pinpointing
    rng.shuffle(toks)
    return " ".join(toks)


def synth_corpus(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    vocab_size: int = 5000,
    zipf_s: float = 1.1,
    num_partitions: int | None = None,
) -> DataFrame:
    """-> DataFrame(repo, path, commit, lang, content), deterministic."""
    from ..deploy import ensure_package_on_executors

    ensure_package_on_executors(spark)
    vocab_list = build_vocab(vocab_size)
    probs = 1.0 / np.arange(1, vocab_size + 1) ** zipf_s
    probs /= probs.sum()
    zipf_cum = np.cumsum(probs)
    vocab_arr = np.array(vocab_list)

    base = spark.range(
        0, n_docs, numPartitions=num_partitions or spark.sparkContext.defaultParallelism
    )

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = {
                "repo": [f"org{i % 7}/repo{i % 23}" for i in ids],
                "path": [],
                "commit": [
                    hashlib.sha256(f"commit{i}".encode()).hexdigest()[:12]
                    for i in ids
                ],
                "lang": [],
                "content": [
                    _content_for(int(i), vocab_arr, zipf_cum, seed)
                    for i in ids
                ],
            }
            for i in ids:
                ext, lang = EXTS[i % len(EXTS)]
                rows["path"].append(f"src/dir{i % 13}/file{i}.{ext}")
                rows["lang"].append(lang)
            yield pd.DataFrame(rows)

    return base.mapInPandas(
        gen,
        "repo string, path string, commit string, lang string,"
        " content string",
    )
