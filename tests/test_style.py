"""OGR feature style strings (engine/style.py; ogr/ogrfeaturestyle.cpp,
public OGR Feature Style Specification): parse/serialize round-trips,
quoted values, units, colors, and the DataFrame explode stage."""

import pandas as pd
import pytest

from engine import style


def test_parse_pen():
    parts = style.parse_style("PEN(c:#FF0000,w:2px)")
    assert len(parts) == 1
    p = parts[0]
    assert p.tool == "PEN"
    assert p.get("c") == "#FF0000"
    assert p.get("w") == 2.0 and p.get_unit("w") == "px"


def test_parse_multi_tool_and_quotes():
    s = 'BRUSH(fc:#0000FF);PEN(c:#000000);LABEL(f:"Arial, Helvetica",s:12pt,t:"He said \\"hi\\"; ok")'
    parts = style.parse_style(s)
    assert [p.tool for p in parts] == ["BRUSH", "PEN", "LABEL"]
    lab = parts[2]
    assert lab.get("f") == "Arial, Helvetica"          # comma inside quotes
    assert lab.get("s") == 12.0 and lab.get_unit("s") == "pt"
    assert lab.get("t") == 'He said "hi"; ok'          # escaped quote + semicolon


def test_roundtrip_serialize():
    s = 'PEN(c:#FF0000,w:2px);LABEL(f:"Arial, Bold",s:10pt,t:hello)'
    parts = style.parse_style(s)
    again = style.parse_style(style.serialize_style(parts))
    assert [(p.tool, p.params) for p in parts] == [(q.tool, q.params) for q in again]


def test_colors_and_units():
    assert style.parse_color("#FF8000") == (255, 128, 0, 255)
    assert style.parse_color("#FF800080") == (255, 128, 0, 128)
    with pytest.raises(ValueError):
        style.parse_color("red")
    assert style.to_mm(72.0, "pt") == pytest.approx(25.4)
    assert style.to_mm(1.0, "in") == 25.4
    assert style.to_mm(96.0, "px") == pytest.approx(25.4)
    assert style.to_mm(3.5, None) == 3.5
    assert style.to_mm(2.0, "g", ground_to_mm=500.0) == 1000.0


def test_bad_styles_raise():
    with pytest.raises(ValueError):
        style.parse_style("WIDGET(a:1)")
    with pytest.raises(ValueError):
        style.parse_style("PEN[c:#FF0000]")
    assert style.parse_style(None) == []
    assert style.parse_style("  ") == []


def test_style_columns_df(spark):
    rows = [
        (0, "PEN(c:#FF0000,w:2px);BRUSH(fc:#00FF00)"),
        (1, 'LABEL(f:"Arial, Bold",s:12pt,t:"name, with comma")'),
        (2, None),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["fid", "ogr_style"]))
    got = {r.fid: r for r in style.style_columns(df).collect()}
    assert got[0].pen_color == "#FF0000"
    assert got[0].pen_width_mm == pytest.approx(2 * 25.4 / 96.0)
    assert got[0].brush_fc == "#00FF00"
    assert got[1].label_font == "Arial, Bold"
    assert got[1].label_size_mm == pytest.approx(12 * 25.4 / 72.0)
    assert got[1].label_text == "name, with comma"
    assert got[2].pen_color is None and got[2].label_text is None


def test_ogr_style_special_field(spark):
    """OGR_STYLE resolves to the layer's ogr_style column when present."""
    from engine.ogrsql import execute_ogr_sql

    rows = [(0, "PEN(c:#102030)"), (1, None)]
    t = spark.createDataFrame(pd.DataFrame(rows, columns=["fid", "ogr_style"]))
    out = {r.FID: r.OGR_STYLE for r in
           execute_ogr_sql({"layer": t}, "SELECT FID, OGR_STYLE FROM layer").collect()}
    assert out[0] == "PEN(c:#102030)" and out[1] is None
