"""Deterministic, byte-exact html→text extraction (the per-row invariant).

BASELINE.json input_hint: "per-row invariant vs the reference: byte-identical
extracted text per url".  The fixture generator (engine.fixtures) renders
``html`` FROM ``text`` with :func:`render_html`; :func:`extract_text` is its
exact inverse, so ``extract_text(render_html(t)) == t`` byte-for-byte for any
unicode text.  The Spark-side operator is an Arrow-batched pandas UDF
(no per-row Python in the driver path).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_TEMPLATE = (
    '<html><head><meta charset="utf-8"><title>{title}</title></head>'
    "<body><p>{body}</p></body></html>"
)
_BODY_RE = re.compile(r"<body><p>(.*)</p></body></html>$", re.S)


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _unescape(s: str) -> str:
    # reverse order of _escape, so '&amp;lt;' round-trips correctly
    return s.replace("&gt;", ">").replace("&lt;", "<").replace("&amp;", "&")


def render_html(text: str) -> bytes:
    """text → html bytes.  Title = first 40 chars (escaped); body = escaped text."""
    return _TEMPLATE.format(title=_escape(text[:40]), body=_escape(text)).encode("utf-8")


def extract_text(html: bytes) -> str:
    """html bytes → text, the exact inverse of render_html."""
    m = _BODY_RE.search(html.decode("utf-8"))
    if m is None:
        return ""
    return _unescape(m.group(1))


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) html→text extraction."""
    return html.map(lambda b: extract_text(b) if b is not None else None)


def with_extracted_text(df, html_col: str = "html", out_col: str = "text_extracted"):
    """Append the extracted-text column; used by tests to assert
    ``text_extracted == text`` for every row (byte-identical invariant)."""
    return df.withColumn(out_col, extract_text_udf(F.col(html_col)))
