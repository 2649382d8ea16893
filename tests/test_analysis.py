"""Tokenizer parity vectors (FIXTURES.md §6): possessives, stopwords,
stems, punctuation breaks, code identifiers, empty content."""

import pandas as pd

from luc4ir_spark.functions.analysis import (
    AnalyzerConfig,
    analyze_series,
    analyze_text,
    char_ngrams,
    make_config,
    simple_tokens,
)

EN = AnalyzerConfig()  # english: possessive+lower+stop+porter
STD = AnalyzerConfig(mode="standard")
SIMPLE = AnalyzerConfig(mode="simple")


def test_english_pipeline():
    assert analyze_text("The user's computers", EN) == ["user", "comput"]
    assert analyze_text("Babies are very happy", EN) == [
        "babi", "veri", "happi",
    ]
    # stopwords removed before stemming; 'this'/'that'/'the' dropped
    assert analyze_text("this is the THAT", EN) == []


def test_possessive_variants():
    assert analyze_text("user's USER'S user’s", EN) == [
        "user", "user", "user",
    ]


def test_code_identifiers():
    # underscore joins (UAX#29 ExtendNumLet); CamelCase stays one token;
    # hyphen splits; digits kept
    assert analyze_text("snake_case CamelCase state-of-the-art x86_64", STD) == [
        "snake_case", "camelcase", "state", "art", "x86_64",
    ]


def test_midword_punctuation():
    assert analyze_text("don't 3.14 example.com trailing.", STD) == [
        "don't", "3.14", "example.com", "trailing",
    ]


def test_empty_and_null():
    assert analyze_text("", EN) == []
    assert analyze_text("   \n\t ", EN) == []
    out = analyze_series(pd.Series([None, "x y"]), SIMPLE)
    assert list(out.iloc[0]) == []
    assert list(out.iloc[1]) == ["x", "y"]


def test_simple_mode_matches_sql_semantics():
    assert analyze_text("Hello, WORLD-42! __x__", SIMPLE) == [
        "hello", "world", "42", "x",
    ]


def test_custom_stopwords():
    cfg = make_config(mode="english", stopwords=["foo", "bar"])
    assert analyze_text("foo runs bar quickly", cfg) == ["run", "quickli"]


def test_char_ngrams():
    assert char_ngrams("AbCd", 3) == ["abc", "bcd"]
    assert char_ngrams("ab", 3) == []


def test_simple_tokens_column(spark):
    df = spark.createDataFrame([("Hello, WORLD-42!",)], "text string")
    row = df.select(simple_tokens("text").alias("t")).collect()[0]
    assert row["t"] == ["hello", "world", "42"]
