"""OGR SQL dialect compiler: SQL string → DataFrame with reference semantics.

The distributed re-expression of ``GDALDataset::ExecuteSQL`` (SURVEY.md §3.1):
a recursive-descent parser for the swq grammar subset
(``ogr/swq_parser.y:57-89``) producing Column trees through engine.sqlcompat,
so every documented quirk (§2.8) holds:

* NULL comparisons → FALSE (swq_op_general.cpp:275-281)
* division/modulo by zero → INT_MAX (:374-391)
* case-insensitive string = <> < > <= >= IN (:570-630)
* LIKE case-insensitive with ESCAPE (:42-82)
* CONCAT auto-stringify; SUBSTR 1-based/negative; hstore_get_value;
  CAST CHARACTER(n) truncation
* summary SELECT (aggregates, single row, SWQM_SUMMARY_RECORD)
* SELECT DISTINCT single column, sorted, NULL first (SWQM_DISTINCT_LIST)
* first-match-only LEFT JOIN, equi-key, secondary fields NULL when
  unmatched (ogr_gensql.cpp:1089-1166)
* ORDER BY with NULLs first both directions (:1826)
* UNION ALL schema merge (ogrunionlayer.cpp:265-394)
* LIMIT/OFFSET accepted as a documented Spark-side superset

Grammar (bison tokens swq_parser.y):

    select    := SELECT [DISTINCT] items FROM table
                 (LEFT JOIN table ON eq)* [WHERE expr]
                 [ORDER BY ident [ASC|DESC] (, ...)* ] [LIMIT n [OFFSET m]]
                 [UNION ALL select]
    items     := '*' | expr [AS ident] (, ...)*
    expr      := or; or := and (OR and)*; and := unary_not (AND unary_not)*
    unary_not := NOT unary_not | predicate
    predicate := sum [ (=|<>|!=|<|>|<=|>=) sum
                     | IS [NOT] NULL
                     | [NOT] LIKE string [ESCAPE string]
                     | [NOT] IN ( literal (, literal)* )
                     | [NOT] BETWEEN sum AND sum ]
    sum       := product ((+|-) product)*
    product   := factor ((*|/|%) factor)*
    factor    := - factor | literal | qualified_ident | func(args)
               | CAST ( expr AS type ) | ( expr )
    func      := CONCAT | SUBSTR | HSTORE_GET_VALUE
               | MIN | MAX | SUM | AVG | COUNT [DISTINCT]
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType

from . import sqlcompat

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<num>\d+\.\d*|\.\d+|\d+) |
        (?P<str>'(?:[^']|'')*') |
        (?P<qid>"[^"]+") |
        (?P<op><=|>=|<>|!=|=|<|>|\(|\)|,|\*|/|%|\+|-|\.) |
        (?P<id>[A-Za-z_][A-Za-z_0-9]*)
    )""",
    re.X,
)

_KEYWORDS = {
    "SELECT", "DISTINCT", "FROM", "WHERE", "ORDER", "BY", "ASC", "DESC",
    "LEFT", "JOIN", "ON", "AS", "AND", "OR", "NOT", "IS", "NULL", "LIKE",
    "ESCAPE", "IN", "BETWEEN", "CAST", "UNION", "ALL", "LIMIT", "OFFSET",
}
_AGGS = {"MIN", "MAX", "SUM", "AVG", "COUNT"}


class _Tok:
    def __init__(self, kind, val):
        self.kind = kind  # num | str | id | qid | op | kw
        self.val = val

    def __repr__(self):
        return f"{self.kind}:{self.val}"


def _tokenize(sql: str):
    toks = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            if sql[pos:].strip() == "":
                break
            raise ValueError(f"OGR SQL: cannot tokenize at: {sql[pos:pos + 20]!r}")
        pos = m.end()
        if m.group("num"):
            toks.append(_Tok("num", m.group("num")))
        elif m.group("str"):
            toks.append(_Tok("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("qid"):
            toks.append(_Tok("id", m.group("qid")[1:-1]))
        elif m.group("op"):
            toks.append(_Tok("op", m.group("op")))
        else:
            word = m.group("id")
            up = word.upper()
            toks.append(_Tok("kw", up) if up in _KEYWORDS else _Tok("id", word))
    return toks


class _Parser:
    """One pass builds an AST of plain tuples; compilation to Columns happens
    against resolved DataFrames (the analog of swq_select::parse binding,
    ogr/swq_select.cpp)."""

    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, kind=None, val=None):
        if self.i >= len(self.toks):
            return None
        t = self.toks[self.i]
        if kind and t.kind != kind:
            return None
        if val and t.val != val:
            return None
        return t

    def eat(self, kind=None, val=None):
        t = self.peek(kind, val)
        if t is None:
            have = self.toks[self.i] if self.i < len(self.toks) else "EOF"
            raise ValueError(f"OGR SQL: expected {val or kind}, got {have}")
        self.i += 1
        return t

    def opt(self, kind=None, val=None):
        if self.peek(kind, val):
            self.i += 1
            return True
        return False

    # --- grammar ---

    def select(self):
        self.eat("kw", "SELECT")
        distinct = self.opt("kw", "DISTINCT")
        items = self.select_items()
        self.eat("kw", "FROM")
        table = self.eat("id").val
        joins = []
        while self.peek("kw", "LEFT"):
            self.eat("kw", "LEFT")
            self.eat("kw", "JOIN")
            jt = self.eat("id").val
            self.eat("kw", "ON")
            left = self.qualified()
            self.eat("op", "=")
            right = self.qualified()
            joins.append((jt, left, right))
        where = None
        if self.opt("kw", "WHERE"):
            where = self.expr()
        order = []
        if self.opt("kw", "ORDER"):
            self.eat("kw", "BY")
            while True:
                col = self.qualified()
                d = "asc"
                if self.opt("kw", "DESC"):
                    d = "desc"
                else:
                    self.opt("kw", "ASC")
                order.append((col, d))
                if not self.opt("op", ","):
                    break
        limit = offset = None
        if self.opt("kw", "LIMIT"):
            limit = int(self.eat("num").val)
            if self.opt("kw", "OFFSET"):
                offset = int(self.eat("num").val)
        union = None
        if self.opt("kw", "UNION"):
            self.eat("kw", "ALL")
            union = self.select()
        return {
            "distinct": distinct, "items": items, "table": table, "joins": joins,
            "where": where, "order": order, "limit": limit, "offset": offset,
            "union": union,
        }

    def select_items(self):
        if self.peek("op", "*"):
            self.eat("op", "*")
            return [("star", None, None)]
        items = []
        while True:
            e = self.expr()
            alias = None
            if self.opt("kw", "AS"):
                alias = self.eat("id").val
            elif self.peek("id") and not self.peek("kw"):
                alias = self.eat("id").val
            items.append(("expr", e, alias))
            if not self.opt("op", ","):
                break
        return items

    def qualified(self):
        name = self.eat("id").val
        if self.opt("op", "."):
            return ("col", name, self.eat("id").val)
        return ("col", None, name)

    def expr(self):
        node = self.and_expr()
        while self.opt("kw", "OR"):
            node = ("or", node, self.and_expr())
        return node

    def and_expr(self):
        node = self.not_expr()
        while self.opt("kw", "AND"):
            node = ("and", node, self.not_expr())
        return node

    def not_expr(self):
        if self.opt("kw", "NOT"):
            return ("not", self.not_expr())
        return self.predicate()

    def predicate(self):
        left = self.sum()
        if self.peek("op") and self.peek().val in ("=", "<>", "!=", "<", ">", "<=", ">="):
            op = self.eat("op").val
            if op == "!=":
                op = "<>"
            return ("cmp", op, left, self.sum())
        if self.opt("kw", "IS"):
            neg = self.opt("kw", "NOT")
            self.eat("kw", "NULL")
            return ("isnull", left) if not neg else ("not", ("isnull", left))
        neg = self.opt("kw", "NOT")
        if self.opt("kw", "LIKE"):
            pat = self.eat("str").val
            esc = None
            if self.opt("kw", "ESCAPE"):
                esc = self.eat("str").val
            node = ("like", left, pat, esc)
            return ("not", node) if neg else node
        if self.opt("kw", "IN"):
            self.eat("op", "(")
            vals = []
            while True:
                t = self.toks[self.i]
                if t.kind == "num":
                    vals.append(float(t.val) if "." in t.val else int(t.val))
                    self.i += 1
                elif t.kind == "str":
                    vals.append(t.val)
                    self.i += 1
                else:
                    raise ValueError("OGR SQL: IN list accepts literals only")
                if not self.opt("op", ","):
                    break
            self.eat("op", ")")
            node = ("in", left, vals)
            return ("not", node) if neg else node
        if self.opt("kw", "BETWEEN"):
            lo = self.sum()
            self.eat("kw", "AND")
            hi = self.sum()
            node = ("between", left, lo, hi)
            return ("not", node) if neg else node
        if neg:
            raise ValueError("OGR SQL: dangling NOT")
        return left

    def sum(self):
        node = self.product()
        while self.peek("op") and self.peek().val in ("+", "-"):
            op = self.eat("op").val
            node = ("arith", op, node, self.product())
        return node

    def product(self):
        node = self.factor()
        while self.peek("op") and self.peek().val in ("*", "/", "%"):
            op = self.eat("op").val
            node = ("arith", op, node, self.factor())
        return node

    def factor(self):
        if self.opt("op", "-"):
            return ("neg", self.factor())
        t = self.peek()
        if t is None:
            raise ValueError("OGR SQL: unexpected end")
        if t.kind == "num":
            self.i += 1
            return ("lit", float(t.val) if "." in t.val else int(t.val))
        if t.kind == "str":
            self.i += 1
            return ("lit", t.val)
        if t.kind == "kw" and t.val == "NULL":
            self.i += 1
            return ("lit", None)
        if t.kind == "kw" and t.val == "CAST":
            self.i += 1
            self.eat("op", "(")
            e = self.expr()
            self.eat("kw", "AS")
            typ = self.eat("id").val.upper()
            width = None
            if self.opt("op", "("):
                width = int(self.eat("num").val)
                if self.opt("op", ","):
                    self.eat("num")  # precision of NUMERIC(w,p) — ignored
                self.eat("op", ")")
            self.eat("op", ")")
            return ("cast", e, typ, width)
        if t.kind == "op" and t.val == "(":
            self.i += 1
            e = self.expr()
            self.eat("op", ")")
            return e
        if t.kind == "id":
            name = t.val
            self.i += 1
            if self.peek("op", "("):
                self.eat("op", "(")
                fname = name.upper()
                distinct = False
                if fname == "COUNT" and self.peek("op", "*"):
                    self.eat("op", "*")
                    self.eat("op", ")")
                    return ("agg", "COUNT", ("star",), False)
                if self.opt("kw", "DISTINCT"):
                    distinct = True
                args = []
                if not self.peek("op", ")"):
                    while True:
                        args.append(self.expr())
                        if not self.opt("op", ","):
                            break
                self.eat("op", ")")
                if fname in _AGGS:
                    return ("agg", fname, args[0], distinct)
                return ("func", fname, args)
            if self.peek("op", "."):
                self.eat("op", ".")
                return ("col", name, self.eat("id").val)
            return ("col", None, name)
        raise ValueError(f"OGR SQL: unexpected token {t}")


def _lit_value(node):
    """Literal (possibly negated) AST node → python value."""
    if node[0] == "lit":
        return node[1]
    if node[0] == "neg":
        return -_lit_value(node[1])
    raise ValueError("OGR SQL: literal argument required")


class _Compiler:
    def __init__(self, resolver, geom_col=None):
        self.resolver = resolver  # (table_or_None, colname) -> (Column, DataType)
        self.geom_col = geom_col  # layer geometry column (geometry CAST gate)
        self.has_agg = False

    def col(self, node) -> Column:
        c, _ = self.typed(node)
        return c

    def typed(self, node):
        kind = node[0]
        if kind == "lit":
            return F.lit(node[1]), (StringType() if isinstance(node[1], str) else None)
        if kind == "col":
            return self.resolver(node[1], node[2])
        if kind == "neg":
            c, t = self.typed(node[1])
            return -c, t
        if kind == "arith":
            op, a, b = node[1], node[2], node[3]
            ca, _ = self.typed(a)
            cb, _ = self.typed(b)
            if op == "+":
                return ca + cb, None
            if op == "-":
                return ca - cb, None
            if op == "*":
                return ca * cb, None
            if op == "/":
                return sqlcompat.ogr_div(ca, cb), None
            return sqlcompat.ogr_mod(ca, cb), None
        if kind == "cmp":
            op, a, b = node[1], node[2], node[3]
            ca, ta = self.typed(a)
            cb, tb = self.typed(b)
            stringy = isinstance(ta, StringType) or isinstance(tb, StringType)
            if stringy:
                return sqlcompat.ogr_cmp(ca, cb, op), None
            if op == "=":
                return sqlcompat.ogr_num_eq(ca, cb), None
            cmps = {"<>": ca != cb, "<": ca < cb, ">": ca > cb, "<=": ca <= cb, ">=": ca >= cb}
            return F.coalesce(cmps[op], F.lit(False)), None
        if kind == "isnull":
            return self.col(node[1]).isNull(), None
        if kind == "like":
            return sqlcompat.ogr_like(self.col(node[1]), node[2], node[3]), None
        if kind == "in":
            return sqlcompat.ogr_in(self.col(node[1]), node[2]), None
        if kind == "between":
            c = self.col(node[1])
            lo = self.col(node[2])
            hi = self.col(node[3])
            return F.coalesce((c >= lo) & (c <= hi), F.lit(False)), None
        if kind == "and":
            return self.col(node[1]) & self.col(node[2]), None
        if kind == "or":
            return self.col(node[1]) | self.col(node[2]), None
        if kind == "not":
            return ~self.col(node[1]), None
        if kind == "cast":
            c, src_t = self.typed(node[1])
            typ, width = node[2], node[3]
            from pyspark.sql.types import BinaryType

            # Geometry CAST only for geometry-ish targets, or CHARACTER on
            # the layer's geometry column — a plain binary field keeps value
            # semantics (CAST(bin AS INTEGER) was wrongly diverted before)
            is_geom_col = (
                isinstance(src_t, BinaryType)
                and isinstance(node[1], tuple)
                and node[1][0] == "col"
                and (node[1][2] or "").lower() == (self.geom_col or "").lower()
            )
            if typ in ("GEOMETRY", "POLYGON", "MULTIPOLYGON", "MULTIPOINT", "MULTILINESTRING") or (
                is_geom_col and typ in ("CHARACTER", "VARCHAR", "TEXT", "STRING")
            ):
                return self._geometry_cast(c, src_t, typ, width)
            if typ in ("CHARACTER", "VARCHAR", "TEXT", "STRING"):
                return sqlcompat.ogr_cast_character(c, width), StringType()
            if typ in ("INTEGER", "INT", "BIGINT"):
                return c.cast("long"), None
            if typ in ("FLOAT", "NUMERIC", "DOUBLE", "REAL"):
                return c.cast("double"), None
            if typ == "DATE":
                return c.cast("date"), None
            if typ == "TIMESTAMP":
                return c.cast("timestamp"), None
            raise ValueError(f"OGR SQL: CAST type {typ} unsupported")
        if kind == "func":
            fname, args = node[1], node[2]
            if fname == "CONCAT":
                return sqlcompat.ogr_concat(*[self.col(a) for a in args]), StringType()
            if fname == "SUBSTR":
                start = _lit_value(args[1])
                length = _lit_value(args[2]) if len(args) > 2 else None
                return sqlcompat.ogr_substr(self.col(args[0]), int(start), None if length is None else int(length)), StringType()
            if fname == "HSTORE_GET_VALUE":
                return sqlcompat.hstore_get_value(self.col(args[0]), _lit_value(args[1])), StringType()
            raise ValueError(f"OGR SQL: function {fname} unsupported")
        if kind == "agg":
            self.has_agg = True
            fname, arg, distinct = node[1], node[2], node[3]
            if fname == "COUNT":
                if arg == ("star",):
                    return F.count(F.lit(1)), None
                return (F.countDistinct(self.col(arg)) if distinct else F.count(self.col(arg))), None
            c, t = self.typed(arg)
            from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

            if isinstance(t, (DateType, TimestampType, TimestampNTZType)):
                # date semantics (ogr_gensql.cpp:927-945, swq.cpp:438-445):
                # AVG = unix-time average (double); MIN/MAX = string form
                if fname == "AVG":
                    return F.avg(F.unix_timestamp(c.cast("timestamp"))), None
                if fname in ("MIN", "MAX"):
                    fmt = "yyyy/MM/dd" if isinstance(t, DateType) else "yyyy/MM/dd HH:mm:ss"
                    return F.date_format({"MIN": F.min, "MAX": F.max}[fname](c), fmt), StringType()
            return {"MIN": F.min, "MAX": F.max, "SUM": F.sum, "AVG": F.avg}[fname](c), None
        raise ValueError(f"OGR SQL: node {kind} unsupported")

    def _geometry_cast(self, c: Column, src_t, typ: str, width):
        """Geometry CAST (ogr_gensql.cpp:1226-1260): geometry → CHARACTER
        gives WKT (truncated to the width); CAST(... AS GEOMETRY) passes
        through; POLYGON / MULTIPOLYGON apply the force-casts
        (ogr/ogrgeometryfactory.cpp:496,575)."""
        from . import geom as geommod
        from . import geomops

        if typ in ("CHARACTER", "VARCHAR", "TEXT", "STRING"):
            @F.pandas_udf("string")
            def _wkt(wkb: pd.Series) -> pd.Series:
                return wkb.map(lambda b: None if b is None else geommod.wkt_dumps(bytes(b)))

            return sqlcompat.ogr_cast_character(_wkt(c), width), StringType()
        if typ == "GEOMETRY":
            return c, src_t
        if typ in ("POLYGON", "MULTIPOLYGON", "MULTIPOINT", "MULTILINESTRING"):
            fn = {
                "POLYGON": geomops.force_polygon,
                "MULTIPOLYGON": geomops.force_multipolygon,
                "MULTIPOINT": geomops.force_multipoint,
                "MULTILINESTRING": geomops.force_multilinestring,
            }[typ]

            @F.pandas_udf("binary")
            def _force(wkb: pd.Series) -> pd.Series:
                return wkb.map(lambda b: None if b is None else fn(b))

            return _force(c), src_t
        raise ValueError(f"OGR SQL: CAST of geometry to {typ} unsupported")


_SPECIAL_FIELDS = {"FID", "OGR_GEOMETRY", "OGR_GEOM_WKT", "OGR_GEOM_AREA", "OGR_STYLE"}


def _special_field(name: str, fid_col: str, geom_col, style_col=None):
    """OGR SQL special fields (ogr/ogr_p.h:104-111, semantics
    ogr/ogr_sql.dox:459-520): FID = feature id (first column, scan order);
    OGR_GEOMETRY = geometry type name; OGR_GEOM_WKT = WKT export;
    OGR_GEOM_AREA = planar area; OGR_STYLE = the layer's ``ogr_style``
    column when present (engine/style.py parses it), else NULL — matching
    featureless OGR sources.  Real fields of the same name shadow these
    (the reference resolves schema fields first)."""
    from . import geom as geommod

    if name == "FID":
        return F.col(fid_col).cast("long"), None
    if name == "OGR_STYLE":
        if style_col is not None:
            return F.col(style_col).cast("string"), StringType()
        return F.lit(None).cast("string"), StringType()
    if geom_col is None:
        raise ValueError(f"OGR SQL: {name} requires a geometry column (geom_wkb)")

    if name == "OGR_GEOMETRY":
        @F.pandas_udf("string")
        def _gname(wkb: pd.Series) -> pd.Series:
            return wkb.map(lambda b: geommod.wkb_geometry_name(b) if b is not None else None)

        return _gname(F.col(geom_col)), StringType()
    if name == "OGR_GEOM_WKT":
        @F.pandas_udf("string")
        def _gwkt(wkb: pd.Series) -> pd.Series:
            return wkb.map(lambda b: geommod.wkt_dumps(bytes(b)) if b is not None else None)

        return _gwkt(F.col(geom_col)), StringType()
    # OGR_GEOM_AREA: 0.0 for non-surface geometries (OGRGeometry::get_Area)
    from .vector import shoelace_area_py

    @F.pandas_udf("double")
    def _garea(wkb: pd.Series) -> pd.Series:
        def one(b):
            if b is None:
                return None
            kind, _ = geommod.wkb_loads(bytes(b))
            return shoelace_area_py(bytes(b)) if kind in ("Polygon", "MultiPolygon") else 0.0

        return wkb.map(one)

    return _garea(F.col(geom_col)), None


def execute_ogr_sql(spark_or_tables, sql: str) -> DataFrame:
    """Execute an OGR-SQL-dialect statement.

    ``spark_or_tables``: a SparkSession (tables resolved from the catalog /
    temp views) or a dict {name: DataFrame}.
    """
    ast = _Parser(_tokenize(sql)).select()
    return _exec(spark_or_tables, ast)


def _get_table(src, name: str) -> DataFrame:
    if isinstance(src, dict):
        return src[name]
    assert isinstance(src, SparkSession)
    return src.table(name)


def _exec(src, ast) -> DataFrame:
    primary = _get_table(src, ast["table"])
    tables = {ast["table"]: primary}
    df = primary
    # first-match LEFT JOINs (one secondary per join, = only)
    for jt, left, right in ast["joins"]:
        sec = _get_table(src, jt)
        # orient: one side references the secondary table
        if left[1] == jt:
            sec_key, pri_key = left[2], right[2]
        else:
            sec_key, pri_key = right[2], left[2]
        fid = sec.columns[0]  # scan order = first column (fid by convention)
        df = sqlcompat.first_match_left_join(df, sec, pri_key, sec_key, fid)
        tables[jt] = sec

    schema_types = {}
    for tname, t in tables.items():
        for f in t.schema.fields:
            schema_types.setdefault(f.name, f.dataType)

    fid_col = primary.columns[0]  # scan order = first column (fid by convention)
    geom_col = "geom_wkb" if "geom_wkb" in primary.columns else None
    style_col = "ogr_style" if "ogr_style" in primary.columns else None

    def resolver(tbl, col):
        if col in schema_types:  # real fields shadow special fields
            return F.col(col), schema_types[col]
        cu = col.upper()
        if cu in _SPECIAL_FIELDS:
            return _special_field(cu, fid_col, geom_col, style_col)
        raise ValueError(f"OGR SQL: unknown column {col}")

    comp = _Compiler(resolver, geom_col=geom_col)

    if ast["where"] is not None:
        df = df.where(comp.col(ast["where"]))

    # select list
    items = ast["items"]
    if items[0][0] == "star":
        out = df
    else:
        cols = []
        agg_mode = False
        compiled = []
        for _, e, alias in items:
            comp.has_agg = False
            c = comp.col(e)
            compiled.append((c, alias, comp.has_agg))
            agg_mode = agg_mode or comp.has_agg
        if agg_mode:
            # SWQM_SUMMARY_RECORD: every item must be an aggregate
            aggs = []
            for idx, (c, alias, is_agg) in enumerate(compiled):
                if not is_agg:
                    raise ValueError("OGR SQL: mixing fields and aggregates is not supported (no GROUP BY in OGR SQL)")
                aggs.append(c.alias(alias or f"field_{idx + 1}"))
            out = df.agg(*aggs)
        else:
            for idx, (c, alias, _) in enumerate(compiled):
                name = alias
                if name is None:
                    e = items[idx][1]
                    name = e[2] if e[0] == "col" else f"field_{idx + 1}"
                cols.append(c.alias(name))
            out = df.select(*cols)

    if ast["distinct"]:
        # SWQM_DISTINCT_LIST: single column, sorted, NULL first
        if len(out.columns) != 1:
            raise ValueError("OGR SQL: SELECT DISTINCT supports a single column")
        out = out.distinct().orderBy(F.col(out.columns[0]).asc_nulls_first())

    if ast["order"]:
        keys = [(c[2], d) for c, d in ast["order"]]
        out = sqlcompat.ogr_order_by(out, keys)

    if ast["offset"]:
        out = out.offset(ast["offset"])
    if ast["limit"] is not None:
        out = out.limit(ast["limit"])

    if ast["union"] is not None:
        out = sqlcompat.union_all_layers([out, _exec(src, ast["union"])])
    return out
