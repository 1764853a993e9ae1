"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet (sf0.01 when
present, else sf0.001), compare row count + column names + exact values
order-insensitively."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01" if os.path.isdir("/root/testdata/sf0.01") else "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _dtype_family(s: pd.Series) -> str:
    """Coarse dtype family used to replicate the driver's value-hash
    sensitivity: the driver canonicalizes each cell from its pandas dtype, so
    an int64 10000 vs a float64 10000.0 (e.g. DuckDB HUGEINT from SUM(BIGINT)
    landing in pandas as float) hash-mismatch even though == holds.  The
    local gate must therefore refuse cross-family columns rather than coerce
    them (the r1-r3 `raster_stats` red cell was exactly this)."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "object"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("string")
        else:
            df[c] = df[c].astype("string")
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    got = q(spark, SF_DIR).toPandas()
    if sql is None:
        assert len(got) >= 0  # rows-only check for non-SQL-expressible ops
        return
    exp = ddb.execute(sql).df()
    assert sorted(got.columns) == sorted(exp.columns), f"{name}: column names differ"
    assert len(got) == len(exp), f"{name}: row count {len(got)} vs oracle {len(exp)}"
    for c in got.columns:
        gf, ef = _dtype_family(got[c]), _dtype_family(exp[c])
        assert gf == ef, (
            f"{name}.{c}: dtype family {gf} (spark {got[c].dtype}) vs "
            f"{ef} (oracle {exp[c].dtype}) — the driver's value hash would flag this "
            f"even if values are equal; CAST the oracle (or Spark) side"
        )
    g, e = _canon(got), _canon(exp)
    for c in g.columns:
        if g[c].dtype == "float64":
            eq = (g[c].to_numpy() == e[c].to_numpy()) | (g[c].isna() & e[c].isna()).to_numpy()
            if not eq.all():
                bad = np.nonzero(~eq)[0][:5]
                raise AssertionError(
                    f"{name}.{c}: {len(bad)} float mismatches, first rows {g[c].iloc[bad].tolist()} vs {e[c].iloc[bad].tolist()}"
                )
        else:
            eq = (g[c] == e[c]) | (g[c].isna() & e[c].isna())
            assert eq.all(), f"{name}.{c}: value mismatch rows {g[c][~eq].head().tolist()} vs {e[c][~eq].head().tolist()}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) >= 3
