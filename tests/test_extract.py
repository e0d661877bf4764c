from __future__ import annotations

from pyspark.sql import functions as F

from dig_entity_resolution_spark.extract import (
    extract_text,
    extract_text_col,
    render_page,
)

TRICKY = [
    "plain text",
    "entities & <tags> \"quoted\" 'single'",
    "unicode héllo 日本語",
    "",
    "a < b > c & d",
    "multi\nline\n\ttext  with   spaces",
]


def test_roundtrip_scalar():
    for t in TRICKY:
        assert extract_text(render_page(t, "title")) == t


def test_roundtrip_spark(spark):
    rows = [(t, render_page(t, f"t{i}")) for i, t in enumerate(TRICKY)]
    df = spark.createDataFrame(rows, "text string, html binary")
    mism = df.filter(extract_text_col("html") != F.col("text")).count()
    assert mism == 0


def test_extractor_ignores_head_script_style():
    html = (
        b"<html><head><title>T</title><script>bad()</script></head>"
        b"<body>keep<script>drop()</script><style>p{}</style><b>this</b></body>"
        b"</html>"
    )
    assert extract_text(html) == "keepthis"


def test_extractor_no_body():
    assert extract_text(b"<html>no body here</html>") == ""
