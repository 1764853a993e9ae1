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
