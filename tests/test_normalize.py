from __future__ import annotations

from pyspark.sql import functions as F

from dig_entity_resolution_spark.functions.normalize import (
    char_shingles,
    normalize_text,
    prefix_key,
    tokenize,
    word_ngrams,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_normalize(spark):
    df = spark.createDataFrame(
        [("  Hello,   WORLD!! 42 ",), ("",), ("éàç",)], ["text"]
    )
    out = [r.n for r in df.select(normalize_text("text").alias("n")).collect()]
    assert out == ["hello world 42", "", ""]


def test_tokenize_empty(spark):
    df = spark.createDataFrame([("a b c",), ("",)], ["t"])
    out = [r.toks for r in df.select(tokenize("t").alias("toks")).collect()]
    assert out == [["a", "b", "c"], []]


def test_char_shingles_short_string(spark):
    df = spark.createDataFrame([("abc",), ("abcdefg",)], ["t"])
    out = [r.s for r in df.select(char_shingles("t", 5).alias("s")).collect()]
    assert out[0] == ["abc"]
    assert out[1] == ["abcde", "bcdef", "cdefg"]


def test_word_ngrams(spark):
    df = spark.createDataFrame([(["a", "b", "c"],)], ["toks"])
    out = df.select(word_ngrams("toks", 2).alias("g")).collect()[0].g
    assert out == ["a b", "b c"]


def test_prefix_key(spark):
    df = spark.createDataFrame([("hello world",)], ["t"])
    assert df.select(prefix_key("t", 6).alias("p")).collect()[0].p == "hello "
