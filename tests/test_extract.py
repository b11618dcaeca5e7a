"""Byte-identical text extraction — the per-row invariant of BASELINE
input_hint: same extractor bytes from generator fixtures, pipeline UDF, and
any partitioning/parallelism."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from vector_spark import synth
from vector_spark.extract import (
    extract_text_bytes,
    extract_text_col,
    extract_text_udf,
    text_sha256,
)


def test_extractor_pure_function():
    html = b"<html><head><title>T9</title></head><body><p>hello  world</p></body></html>"
    assert extract_text_bytes(html) == b"T9 hello world"
    assert extract_text_bytes(None) == b""
    assert extract_text_bytes(b"") == b""


def test_extractor_entities_and_scripts():
    html = b"<body><script>var x = 1 < 2;</script><p>a &amp; b &lt;tag&gt;</p></body>"
    assert extract_text_bytes(html) == b'a & b <tag>'
    html2 = b"<style>p { color: red }</style><p>kept</p>"
    assert extract_text_bytes(html2) == b"kept"


def test_udf_matches_local_function(spark):
    docs = synth.documents(spark, 500)
    checked = docs.withColumn("et", extract_text_udf(F.col("html"))).collect()
    for r in checked:
        assert r.et == extract_text_bytes(bytes(r.html)).decode()


def test_jvm_path_matches_reference(spark):
    """The whole-stage-codegen extraction (extract_text_col) is byte-identical
    to the byte-level reference extractor on the corpus AND on adversarial
    ASCII edge cases (nested entities, unclosed tags, case-mixed script tags,
    whitespace runs, NULL)."""
    docs = synth.documents(spark, 500)
    both = docs.select(
        "html",
        extract_text_col("html").alias("jvm"),
        extract_text_udf(F.col("html")).alias("py"),
    ).collect()
    assert all(r.jvm == r.py for r in both)

    tricky = [
        b"<SCRIPT a=b>x</ScRiPt >kept",
        b"<style\n>s</style>ok",
        b"&amp;lt; stays &amp; &lt;goes&gt;",
        b"a   \t\n b",
        b"<p>unclosed",
        b"unopened</p>",
        b"<script>no close tag",
        b"",
        None,
        "café <b>unicode</b> 中文".encode(),
    ]
    df = spark.createDataFrame([(t,) for t in tricky], "html binary")
    rows = df.select("html", extract_text_col("html").alias("jvm")).collect()
    for r in rows:
        assert r.jvm == extract_text_bytes(None if r.html is None else bytes(r.html)).decode()


def test_sha256_invariant_vs_generator_fixture(spark):
    """sha256(extract_text(html)) per url matches the fixture computed
    driver-side from the same seed — the byte-identity contract."""
    n = 300
    pdf = synth.documents_pdf(n)
    expected = {
        f"https://{u.split('//')[1].split('/')[0]}/p/{i}": hashlib.sha256(
            extract_text_bytes(pdf.html[i])
        ).hexdigest()
        for i, u in enumerate(pdf.url)
    }
    docs = synth.documents(spark, n, partitions=7)  # odd partitioning on purpose
    for r in docs.collect():
        assert text_sha256(bytes(r.html)) == expected[r.url]


def test_determinism_across_parallelism(spark):
    """Same doc ids → same bytes at different partition counts (the N vs 4N
    equality requirement, data-generation side)."""
    a = {r.url: (r.text, bytes(r.html)) for r in synth.documents(spark, 200, partitions=2).collect()}
    b = {r.url: (r.text, bytes(r.html)) for r in synth.documents(spark, 200, partitions=16).collect()}
    assert a == b
