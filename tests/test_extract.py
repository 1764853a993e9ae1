"""Byte-identical html→text invariant (BASELINE.json input_hint)."""

import numpy as np

from engine.extract import extract_text, render_html
from engine.fixtures import make_gazetteer, make_pages


def test_roundtrip_simple():
    for t in ["hello world", "", "a & b < c > d", "ümlaut ünïcode ✓", "&amp;lt; tricky &gt;"]:
        assert extract_text(render_html(t)) == t


def test_roundtrip_fixture_pages():
    pages = make_pages(n=300, seed=1)
    for t, h in zip(pages["text"], pages["html"]):
        assert extract_text(h) == t


def test_roundtrip_adversarial():
    rng = np.random.default_rng(2)
    alphabet = list("ab<>&;ltgampq </p><p> \n\t�日本")
    for _ in range(200):
        t = "".join(rng.choice(alphabet, rng.integers(0, 80)))
        assert extract_text(render_html(t)) == t


def test_spark_extraction_matches(spark):
    from engine.extract import with_extracted_text

    pages = make_pages(n=200, gazetteer=make_gazetteer(100), seed=3)
    df = spark.createDataFrame(pages)
    out = with_extracted_text(df).where("text_extracted <> text")
    assert out.count() == 0


def test_simhash64_and_near_pairs(spark):
    import pandas as pd

    from engine import textops
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "the quick brown fox jumps over the lazy dog",
                    "the quick brown fox jumps over the lazy cat",  # near-dup of 1
                    "completely different content about spark engines",
                    "the quick brown fox jumps over the lazy dog",   # exact dup of 1
                ],
            }
        )
    )
    sh = {r.doc_id: r.s for r in docs.select("doc_id", textops.simhash64(F.col("text")).alias("s")).collect()}
    assert sh[1] == sh[4]                       # identical text → identical word
    assert sh[1] != sh[3]
    # hamming(1,2) small, hamming(1,3) large
    h12 = bin((sh[1] ^ sh[2]) & ((1 << 64) - 1)).count("1")
    h13 = bin((sh[1] ^ sh[3]) & ((1 << 64) - 1)).count("1")
    assert h12 < h13
    pairs = {(r.a, r.b): r.hamming for r in textops.simhash_near_pairs(docs, max_hamming=3).collect()}
    assert (1, 4) in pairs and pairs[(1, 4)] == 0
    assert (1, 3) not in pairs
