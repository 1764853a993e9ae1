"""OGR SQL semantics compatibility layer (SURVEY.md §2.8).

The reference's OGR SQL dialect (``ogr/swq_op_general.cpp``,
``ogr/ogr_sql.dox``) differs from ANSI SQL / Spark defaults in specific,
documented ways.  These helpers encode each quirk as a Column transformer so
a query written against the reference produces identical rows here:

1. NULL comparisons yield FALSE, not NULL        (swq_op_general.cpp:275-281)
2. division by zero returns INT_MAX = 2147483647 (swq_op_general.cpp:374-391)
3. string =, <>, <, >, <=, >=, IN are case-insensitive (strcasecmp,
   swq_op_general.cpp:570-630 — the code wins over the doc)
4. LIKE is case-insensitive, with optional ESCAPE (swq_test_like,
   swq_op_general.cpp:42-82)
5. int+float promote to float before compare     (swq_op_general.cpp:257-269)
6. CAST(x AS CHARACTER(n)) truncates to width    (SWQCastEvaluator :1094)
7. CONCAT auto-stringifies; SUBSTR is 1-based with negative offsets counting
   from the end (ogr/ogr_sql.dox:134-153); hstore_get_value parses 'k=>v'
   strings (swq_op_general.cpp:216)

Plus the two structural quirks:

* first-match-only LEFT JOIN (one row per primary feature, secondary's first
  match in scan order, ogr_gensql.cpp:1089-1166, ogr/ogr_sql.dox:414-433)
  → :func:`first_match_left_join`
* whole-table summary SELECT (single output row, SWQM_SUMMARY_RECORD,
  ogr_gensql.cpp:761-1005) → :func:`summary_select`
* ORDER BY with NULLs first on every key direction
  (Compare, ogr_gensql.cpp:1826) → :func:`ogr_order_by`
* UNION ALL with FIELD_UNION_ALL_LAYERS schema merge
  (ogrunionlayer.cpp:265-394) → :func:`union_all_layers`
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

INT_MAX = 2147483647


def ogr_eq(a: Column, b: Column) -> Column:
    """Case-insensitive (for strings) equality; NULL → FALSE (quirks 1+3)."""
    return F.coalesce(F.lower(a.cast("string")) == F.lower(b.cast("string")), F.lit(False))


def ogr_num_eq(a: Column, b: Column) -> Column:
    """Numeric equality with NULL → FALSE."""
    return F.coalesce(a == b, F.lit(False))


def ogr_cmp(a: Column, b: Column, op: str) -> Column:
    """Ordered comparison, case-insensitive for strings, NULL → FALSE."""
    la, lb = F.lower(a.cast("string")), F.lower(b.cast("string"))
    cmps = {"<": la < lb, ">": la > lb, "<=": la <= lb, ">=": la >= lb, "<>": la != lb, "=": la == lb}
    return F.coalesce(cmps[op], F.lit(False))


def ogr_in(a: Column, values) -> Column:
    """IN list, case-insensitive, NULL → FALSE (swq_op_general.cpp:570-630)."""
    la = F.lower(a.cast("string"))
    return F.coalesce(la.isin([v.lower() if isinstance(v, str) else v for v in values]), F.lit(False))


def ogr_div(a: Column, b: Column) -> Column:
    """a / b with division-by-zero → INT_MAX (swq_op_general.cpp:374-382)."""
    return F.when(b == 0, F.lit(INT_MAX)).otherwise(a / b)


def ogr_mod(a: Column, b: Column) -> Column:
    """a % b with modulo-by-zero → INT_MAX (swq_op_general.cpp:383-391)."""
    return F.when(b == 0, F.lit(INT_MAX)).otherwise(a % b)


def ogr_like(a: Column, pattern: str, escape: str | None = None) -> Column:
    """Case-insensitive LIKE with optional ESCAPE (swq_op_general.cpp:42-82).

    NULL operand → FALSE (boolean result rule)."""
    pat = pattern.lower()
    if escape:
        expr = F.like(F.lower(a), F.lit(pat), F.lit(escape))
    else:
        expr = F.lower(a).like(pat)
    return F.coalesce(expr, F.lit(False))


def ogr_substr(a: Column, start, length=None) -> Column:
    """SUBSTR with OGR 1-based + negative-offset semantics
    (ogr/ogr_sql.dox:134-153): negative start counts from the string end;
    SUBSTR('abcdef', -2) = 'ef'.  Spark's substring already implements
    exactly this (negative pos counts from end), so this is a thin alias
    that also handles the omitted-length form."""
    return F.substring(a, start, INT_MAX if length is None else length)


def ogr_concat(*cols) -> Column:
    """n-ary CONCAT with auto-stringification; NULL operands propagate NULL
    (string-returning op, not boolean — swq_op_general.cpp:282-295)."""
    return F.concat(*[c.cast("string") for c in cols])


def ogr_cast_character(a: Column, width: int | None = None) -> Column:
    """CAST(x AS CHARACTER(n)): stringify then truncate to width
    (SWQCastEvaluator, swq_op_general.cpp:1094)."""
    s = a.cast("string")
    return F.substring(s, 1, width) if width else s


def hstore_get_value(hstore: Column, key) -> Column:
    """hstore_get_value('a=>x, b=>y', 'a') → 'x' (swq_op_general.cpp:216;
    sqlite variant ogrsqlitesqlfunctions.cpp:1045).  Keys/values may be
    double-quoted; whitespace around '=>' tolerated; missing key → NULL."""
    k = F.lit(key) if isinstance(key, str) else key
    # build regex:  (^|,)\s*"?KEY"?\s*=>\s*"?([^,"]*)"?
    pat = F.concat(
        F.lit('(^|,)\\s*"?'),
        F.regexp_replace(k, r"([.^$*+?()\[\]{}|\\])", r"\\$1"),
        F.lit('"?\\s*=>\\s*"?([^,"]*)"?'),
    )
    ext = F.regexp_extract_all(hstore, pat, 2)
    return F.when(F.size(ext) > 0, ext.getItem(0)).otherwise(F.lit(None))


# ---------------------------------------------------------------------------
# Structural operators
# ---------------------------------------------------------------------------


def first_match_left_join(
    primary: DataFrame,
    secondary: DataFrame,
    primary_key: str,
    secondary_key: str,
    secondary_fid: str,
    broadcast: bool = True,
) -> DataFrame:
    """OGR SQL LEFT JOIN: equi-key only, FIRST matching secondary row only
    (by scan order = ascending fid), primary rows never duplicated, NULLs
    when unmatched (ogr_gensql.cpp:1089-1166; limits ogr/ogr_sql.dox:414-433).

    Spark plan: window first-row-per-key dedupe of the secondary, then a
    plain left join (broadcast for small secondaries — the common OGR case
    where the secondary is a lookup table).
    """
    w = Window.partitionBy(secondary_key).orderBy(F.col(secondary_fid).asc())
    dedup = (
        secondary.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    if broadcast:
        dedup = F.broadcast(dedup)
    return primary.join(dedup, primary[primary_key] == dedup[secondary_key], "left")


def summary_select(df: DataFrame, aggs: dict) -> DataFrame:
    """Whole-table summary (no GROUP BY — one output row, SWQM_SUMMARY_RECORD
    ogr_gensql.cpp:761-1005).  ``aggs``: {alias: ("min"|"max"|"avg"|"sum"|
    "count"|"count_distinct", col)}.  COUNT(*) = ("count", "*").

    Date/timestamp semantics (ogr_gensql.cpp:927-945, ogr/swq.cpp:438-445):
    AVG over a date/timestamp column averages UNIX TIME (whole seconds —
    OGRField carries integer seconds) and yields a double; MIN/MAX keep the
    value as its STRING form (GetFieldAsString 'YYYY/MM/DD HH:MM:SS')."""
    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    dtypes = {f.name: f.dataType for f in df.schema.fields}
    exprs = []
    for alias, (fn, col) in aggs.items():
        if fn == "count" and col == "*":
            exprs.append(F.count(F.lit(1)).alias(alias))
            continue
        if fn == "count_distinct":
            exprs.append(F.countDistinct(col).alias(alias))
            continue
        t = dtypes.get(col) if isinstance(col, str) else None
        if isinstance(t, (DateType, TimestampType, TimestampNTZType)):
            if fn == "avg":
                exprs.append(F.avg(F.unix_timestamp(F.col(col).cast("timestamp"))).alias(alias))
                continue
            if fn in ("min", "max"):
                fmt = "yyyy/MM/dd" if isinstance(t, DateType) else "yyyy/MM/dd HH:mm:ss"
                exprs.append(F.date_format(getattr(F, fn)(F.col(col)), fmt).alias(alias))
                continue
        exprs.append(getattr(F, fn)(col).alias(alias))
    return df.agg(*exprs)


def distinct_list(df: DataFrame, col: str) -> DataFrame:
    """SELECT DISTINCT <single col>, final sort ascending with NULL included
    as an entry (SWQM_DISTINCT_LIST; qsort ogr/swq.cpp:565, NULL entry
    :348-364).  NULLs first to match the reference's sort of the null entry."""
    return df.select(col).distinct().orderBy(F.col(col).asc_nulls_first())


def ogr_order_by(df: DataFrame, keys: list) -> DataFrame:
    """ORDER BY multi-key; NULLs sort FIRST regardless of direction
    (Compare, ogr_gensql.cpp:1826).  keys: [(col, "asc"|"desc"), ...]."""
    cols = [
        F.col(c).asc_nulls_first() if d == "asc" else F.col(c).desc_nulls_first()
        for c, d in keys
    ]
    return df.orderBy(*cols)


def union_all_layers(dfs: list) -> DataFrame:
    """UNION ALL with FIELD_UNION_ALL_LAYERS field-merge strategy
    (ogrunionlayer.cpp:265-394): result schema = union of all field lists,
    missing fields NULL."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out
