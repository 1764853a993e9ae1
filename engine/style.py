"""OGR feature style strings (ogr/ogrfeaturestyle.cpp; syntax per the
public OGR Feature Style Specification).

A style string is a semicolon-separated list of tool parts, each
``TOOL(param:value,param:value,...)`` with tools PEN / BRUSH / SYMBOL /
LABEL; values may be double-quoted (commas and semicolons inside quotes
are literal, ``\\"`` escapes a quote) and numeric values may carry a unit
suffix (``g`` ground, ``px`` pixel, ``pt`` points, ``mm``, ``cm``,
``in``).  Colors are ``#RRGGBB`` or ``#RRGGBBAA``.

Distributed surface: :func:`style_columns` explodes a per-feature style
column into typed columns (pen color/width, brush fill, label font/size/
text) in one Arrow-batched pass — the engine-side analog of
OGRStyleMgr::GetPartCount/GetPart + OGRStyleTool::GetParam* loops.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOOLS = ("PEN", "BRUSH", "SYMBOL", "LABEL")

# unit → multiplier to millimeters (ground units 'g' and pixels 'px' are
# context-dependent; exposed verbatim with scale hooks like OGR's
# SetUnit(dfScale))
_UNIT_TO_MM = {"mm": 1.0, "cm": 10.0, "in": 25.4, "pt": 25.4 / 72.0}


class StylePart:
    """One parsed tool part: ``tool`` name + ``params`` {name: (value, unit)}."""

    __slots__ = ("tool", "params")

    def __init__(self, tool: str, params: dict):
        self.tool = tool
        self.params = params

    def get(self, name: str, default=None):
        v = self.params.get(name)
        return default if v is None else v[0]

    def get_unit(self, name: str) -> str | None:
        v = self.params.get(name)
        return None if v is None else v[1]

    def __repr__(self):
        return f"StylePart({serialize_part(self)!r})"


def _split_top(s: str, sep: str) -> list:
    """Split on ``sep`` outside quotes and parentheses."""
    out, cur, depth, q = [], [], 0, False
    i = 0
    while i < len(s):
        ch = s[i]
        if q:
            cur.append(ch)
            if ch == "\\" and i + 1 < len(s):
                cur.append(s[i + 1])
                i += 1
            elif ch == '"':
                q = False
        elif ch == '"':
            q = True
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    if cur:
        out.append("".join(cur))
    return out


_NUM_UNIT_RE = re.compile(r"^([+-]?(?:\d+\.?\d*|\.\d+))(g|px|pt|mm|cm|in)?$")


def _parse_value(raw: str):
    """→ (value, unit): quoted → str; numeric w/ optional unit → float;
    else verbatim string."""
    raw = raw.strip()
    if raw.startswith('"') and raw.endswith('"') and len(raw) >= 2:
        body = raw[1:-1].replace('\\"', '"')
        return body, None
    m = _NUM_UNIT_RE.match(raw)
    if m:
        return float(m.group(1)), m.group(2)
    return raw, None


def parse_style(style: str) -> list:
    """Style string → list of :class:`StylePart` (OGRStyleMgr::GetPart
    loop).  Unknown tool names raise; an empty/NULL string → []."""
    if style is None or style.strip() == "":
        return []
    parts = []
    for chunk in _split_top(style, ";"):
        chunk = chunk.strip()
        if not chunk:
            continue
        m = re.match(r"^([A-Za-z]+)\((.*)\)$", chunk, re.S)
        if not m:
            raise ValueError(f"bad style part: {chunk!r}")
        tool = m.group(1).upper()
        if tool not in TOOLS:
            raise ValueError(f"unknown style tool {tool!r}")
        params = {}
        body = m.group(2)
        if body.strip():
            for kv in _split_top(body, ","):
                if not kv.strip():
                    continue
                k, _, v = kv.partition(":")
                if not _:
                    raise ValueError(f"bad style param {kv!r}")
                params[k.strip().lower()] = _parse_value(v)
        parts.append(StylePart(tool, params))
    return parts


def serialize_part(part: StylePart) -> str:
    items = []
    for k, (v, unit) in part.params.items():
        if isinstance(v, float):
            sv = f"{v:g}{unit or ''}"
        elif re.search(r'[,;:()"]', str(v)):
            sv = '"' + str(v).replace('"', '\\"') + '"'
        else:
            sv = str(v)
        items.append(f"{k}:{sv}")
    return f"{part.tool}({','.join(items)})"


def serialize_style(parts: list) -> str:
    return ";".join(serialize_part(p) for p in parts)


def parse_color(c: str):
    """'#RRGGBB[AA]' → (r, g, b, a) ints; None → None."""
    if c is None:
        return None
    m = re.match(r"^#([0-9A-Fa-f]{6})([0-9A-Fa-f]{2})?$", c.strip())
    if not m:
        raise ValueError(f"bad style color {c!r}")
    rgb = int(m.group(1), 16)
    a = int(m.group(2), 16) if m.group(2) else 255
    return ((rgb >> 16) & 255, (rgb >> 8) & 255, rgb & 255, a)


def to_mm(value: float, unit: str | None, ground_to_mm: float = 1.0, px_to_mm: float = 25.4 / 96.0) -> float:
    """Unit conversion (OGRStyleTool::ComputeWithUnit): 'g' scales by the
    caller's ground resolution, 'px' by the dpi-derived factor, absolute
    units by their mm ratio; unitless values pass through."""
    if unit is None:
        return value
    if unit == "g":
        return value * ground_to_mm
    if unit == "px":
        return value * px_to_mm
    return value * _UNIT_TO_MM[unit]


_STYLE_SCHEMA = (
    "pen_color string, pen_width_mm double, brush_fc string, "
    "symbol_id string, label_font string, label_size_mm double, label_text string"
)


def style_columns(df: DataFrame, style_col: str = "ogr_style") -> DataFrame:
    """Explode a per-feature style-string column into typed columns —
    one vectorized pandas stage, no shuffle.  NULL/empty styles yield
    NULL columns (the reference returns NULL from GetStyleString when a
    feature has none)."""

    @F.pandas_udf(_STYLE_SCHEMA)
    def _parse(col: pd.Series) -> pd.DataFrame:
        rows = []
        for s in col:
            rec = dict.fromkeys(
                ("pen_color", "pen_width_mm", "brush_fc", "symbol_id",
                 "label_font", "label_size_mm", "label_text"), None
            )
            if s:
                for part in parse_style(s):
                    if part.tool == "PEN":
                        rec["pen_color"] = part.get("c")
                        w = part.params.get("w")
                        if w is not None:
                            rec["pen_width_mm"] = to_mm(w[0], w[1])
                    elif part.tool == "BRUSH":
                        rec["brush_fc"] = part.get("fc")
                    elif part.tool == "SYMBOL":
                        rec["symbol_id"] = part.get("id")
                    elif part.tool == "LABEL":
                        rec["label_font"] = part.get("f")
                        sz = part.params.get("s")
                        if sz is not None:
                            rec["label_size_mm"] = to_mm(sz[0], sz[1])
                        rec["label_text"] = part.get("t")
            rows.append(rec)
        return pd.DataFrame(rows)

    return df.withColumn("_st", _parse(F.col(style_col))).select(
        *[c for c in df.columns], "_st.*"
    ).drop("_st")
