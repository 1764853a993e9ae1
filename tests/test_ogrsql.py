"""OGR SQL dialect compiler: the documented examples (ogr/ogr_sql.dox) and
quirks (SURVEY.md §2.8) as executable tests."""

import pandas as pd
import pytest

from engine.ogrsql import execute_ogr_sql


@pytest.fixture(scope="module")
def tables(spark):
    towns = spark.createDataFrame(
        pd.DataFrame(
            {
                "fid": [1, 2, 3, 4, 5],
                "name": ["Paris", "lyon", "NICE", None, "Brest"],
                "pop": [2000000, 500000, 340000, 100, 0],
                "state": ["IDF", "ARA", "PAC", None, "BRE"],
                "props": ["a=>1, b=>2", 'k=>"v w"', None, "a=>x", ""],
            }
        )
    )
    states = spark.createDataFrame(
        pd.DataFrame(
            {
                "sid": [10, 11, 12, 13],
                "code": ["IDF", "ARA", "ARA", "PAC"],
                "sname": ["IleDeFrance", "Rhone", "RhoneDup", "Provence"],
            }
        )
    )
    return {"towns": towns, "states": states}


def q(tables, sql):
    return execute_ogr_sql(tables, sql)


def test_select_where_case_insensitive(tables):
    # string '=' is case-insensitive (swq_op_general.cpp:570-630)
    rows = q(tables, "SELECT name FROM towns WHERE name = 'PARIS'").collect()
    assert [r.name for r in rows] == ["Paris"]
    rows = q(tables, "SELECT name FROM towns WHERE name = 'nice'").collect()
    assert [r.name for r in rows] == ["NICE"]


def test_null_comparison_false(tables):
    # NULL name: comparison yields FALSE, row neither in = nor in <>
    eq = q(tables, "SELECT fid FROM towns WHERE name = 'x'").count()
    ne = q(tables, "SELECT fid FROM towns WHERE name <> 'x'").count()
    assert eq + ne == 4  # 5 rows minus the NULL-name row


def test_division_by_zero_intmax(tables):
    rows = {r.fid: r.ratio for r in q(
        tables, "SELECT fid, pop / (fid - 5) AS ratio FROM towns"
    ).collect()}
    assert rows[5] == 2147483647  # fid-5 == 0 → INT_MAX
    assert rows[1] == 2000000 / -4


def test_like_and_escape(tables):
    rows = q(tables, "SELECT name FROM towns WHERE name LIKE 'p%'").collect()
    assert sorted(r.name for r in rows) == ["Paris"]
    # IN is case-insensitive
    rows = q(tables, "SELECT name FROM towns WHERE name IN ('LYON', 'brest')").collect()
    assert sorted(r.name for r in rows) == ["Brest", "lyon"]


def test_between_and_arith(tables):
    rows = q(tables, "SELECT fid FROM towns WHERE pop BETWEEN 100 AND 600000").collect()
    assert sorted(r.fid for r in rows) == [2, 3, 4]


def test_substr_concat_cast(tables):
    # SUBSTR negative offset (ogr_sql.dox:151-153); CONCAT stringifies;
    # CAST CHARACTER(n) truncates
    r = q(
        tables,
        "SELECT SUBSTR(name, -3) AS tail, CONCAT(name, '/', pop) AS label, "
        "CAST(pop AS CHARACTER(3)) AS pop3 FROM towns WHERE fid = 1",
    ).collect()[0]
    assert r.tail == "ris"
    assert r.label == "Paris/2000000"
    assert r.pop3 == "200"


def test_hstore_get_value(tables):
    rows = {
        r.fid: r.v
        for r in q(
            tables, "SELECT fid, HSTORE_GET_VALUE(props, 'a') AS v FROM towns"
        ).collect()
    }
    assert rows[1] == "1" and rows[4] == "x" and rows[2] is None


def test_summary_aggregates(tables):
    r = q(
        tables,
        "SELECT MIN(pop) AS mn, MAX(pop) AS mx, COUNT(*) AS n, "
        "COUNT(DISTINCT state) AS ns, AVG(pop) AS av FROM towns",
    ).collect()[0]
    assert (r.mn, r.mx, r.n, r.ns) == (0, 2000000, 5, 4)
    assert r.av == (2000000 + 500000 + 340000 + 100 + 0) / 5


def test_distinct_sorted_null_first(tables):
    vals = [r.state for r in q(tables, "SELECT DISTINCT state FROM towns").collect()]
    assert vals == [None, "ARA", "BRE", "IDF", "PAC"]


def test_order_by_nulls_first_and_limit(tables):
    rows = q(
        tables, "SELECT name FROM towns ORDER BY name DESC LIMIT 3"
    ).collect()
    # DESC with NULLs first (ogr_gensql.cpp:1826)
    assert [r.name for r in rows] == [None, "lyon", "Paris"]


def test_first_match_left_join(tables):
    # 'ARA' appears twice in states; join must take the FIRST by fid (sid)
    rows = {
        r.fid: (r.sid, r.sname)
        for r in q(
            tables,
            "SELECT fid, sid, sname FROM towns LEFT JOIN states ON towns.state = states.code",
        ).collect()
    }
    assert rows[2] == (11, "Rhone")  # not RhoneDup
    assert rows[1] == (10, "IleDeFrance")
    assert rows[4] == (None, None)  # NULL state unmatched
    assert len(rows) == 5  # primary never duplicated


def test_union_all_schema_merge(tables):
    out = q(
        tables,
        "SELECT fid, name FROM towns UNION ALL SELECT sid AS fid, code AS cc FROM states",
    )
    assert set(out.columns) == {"fid", "name", "cc"}
    assert out.count() == 9


def test_not_and_parens(tables):
    rows = q(
        tables,
        "SELECT fid FROM towns WHERE NOT (pop > 1000 AND name LIKE '%a%') AND state IS NOT NULL",
    ).collect()
    got = sorted(r.fid for r in rows)
    # NOT(...) : Paris(a,2M)→F; lyon(no a... 'lyon' has no 'a')→T; NICE pop340k no 'a'→T;
    # None-state excluded; Brest pop 0 → NOT(F)=T
    assert got == [2, 3, 5]


def test_special_fields(spark, tables):
    # FID / OGR_GEOMETRY / OGR_GEOM_WKT / OGR_GEOM_AREA / OGR_STYLE
    # (ogr/ogr_p.h:104-111, ogr/ogr_sql.dox:459-520)
    from engine import geom

    shapes = spark.createDataFrame(
        pd.DataFrame(
            {
                "sid": pd.array([7, 8], dtype="int32"),
                "geom_wkb": [
                    geom.wkb_polygon([[(0, 0), (4, 0), (4, 3), (0, 3)]]),
                    geom.wkb_linestring([(0.0, 0.0), (2.5, 0.0)]),
                ],
            }
        )
    )
    rows = {r["FID"]: r for r in q(
        {"shapes": shapes},
        "SELECT FID, OGR_GEOMETRY, OGR_GEOM_WKT, OGR_GEOM_AREA, OGR_STYLE FROM shapes",
    ).collect()}
    assert rows[7]["OGR_GEOMETRY"] == "POLYGON"
    assert rows[7]["OGR_GEOM_WKT"] == "POLYGON ((0 0,4 0,4 3,0 3,0 0))"
    assert rows[7]["OGR_GEOM_AREA"] == 12.0
    assert rows[7]["OGR_STYLE"] is None
    assert rows[8]["OGR_GEOMETRY"] == "LINESTRING"
    assert rows[8]["OGR_GEOM_WKT"] == "LINESTRING (0 0,2.5 0)"
    assert rows[8]["OGR_GEOM_AREA"] == 0.0
    # usable in WHERE; real fields shadow special names
    got = q({"shapes": shapes}, "SELECT FID FROM shapes WHERE OGR_GEOMETRY = 'POLYGON'").collect()
    assert [r["FID"] for r in got] == [7]


def test_summary_date_semantics(spark):
    # AVG over timestamps = unix-time average; MIN/MAX string form
    # (ogr_gensql.cpp:927-945, ogr/swq.cpp:438-445)
    ts = pd.to_datetime(["2024-01-01 00:00:10", "2024-01-03 00:00:20"])
    df = spark.createDataFrame(pd.DataFrame({"fid": [1, 2], "d": ts}))
    row = q({"t": df}, "SELECT MIN(d), MAX(d), AVG(d) FROM t").collect()[0]
    assert row[0] == "2024/01/01 00:00:10"
    assert row[1] == "2024/01/03 00:00:20"
    import calendar
    e0 = calendar.timegm((2024, 1, 1, 0, 0, 10))
    e1 = calendar.timegm((2024, 1, 3, 0, 0, 20))
    assert row[2] == (e0 + e1) / 2.0
