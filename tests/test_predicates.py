"""Polygon spatial predicates (relate kernel + distributed layer_relate)."""

import numpy as np
import pandas as pd
import pytest

from engine import geom, predicates


def _rect(x0, y0, x1, y1):
    return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1)], dtype=np.float64)


def _rot(ring, deg, cx=0.0, cy=0.0):
    t = np.deg2rad(deg)
    R = np.array([[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]])
    return (ring - [cx, cy]) @ R.T + [cx, cy]


def test_relate_kernel_cases():
    a = _rect(0, 0, 10, 10)
    assert predicates.relate(a, _rect(2, 2, 5, 5)) == "contains"
    assert predicates.relate(_rect(2, 2, 5, 5), a) == "within"
    assert predicates.relate(a, _rect(5, 5, 15, 15)) == "overlaps"
    assert predicates.relate(a, _rect(10, 0, 20, 10)) == "touches"   # shared edge
    assert predicates.relate(a, _rect(10, 10, 20, 20)) == "touches"  # corner point
    assert predicates.relate(a, _rect(11, 0, 20, 10)) == "disjoint"
    assert predicates.relate(a, _rect(0, 0, 10, 10)) == "equals"
    # contains with boundary contact (B hugging A's edge from inside)
    assert predicates.relate(a, _rect(0, 2, 3, 5)) == "contains"
    # rotated concave-ish check: rotated square overlapping
    assert predicates.relate(a, _rot(_rect(4, 4, 14, 14), 30, 9, 9)) == "overlaps"


def test_boundaries_intersect():
    a = _rect(0, 0, 10, 10)
    assert predicates.boundaries_intersect(a, _rect(10, 3, 20, 6))       # edge touch
    assert predicates.boundaries_intersect(a, _rect(5, 5, 15, 15))       # proper cross
    assert not predicates.boundaries_intersect(a, _rect(2, 2, 5, 5))     # strictly inside
    assert not predicates.boundaries_intersect(a, _rect(20, 20, 30, 30))


def test_layer_relate_distributed(spark):
    # squares of side 2 vs the 10-degree grid: relation is floor arithmetic
    cells = [(0, _rect(0, 0, 10, 10)), (1, _rect(10, 0, 20, 10))]
    squares = [
        (0, _rect(3, 3, 5, 5)),     # within cell 0
        (1, _rect(9, 4, 11, 6)),    # overlaps both cells
        (2, _rect(8, 2, 10, 4)),    # within cell 0, touching its east edge... still within
        (3, _rect(10, 7, 12, 9)),   # within cell 1, touching west edge; touches cell 0
    ]
    def _layer(specs):
        pdf = pd.DataFrame(
            {"pid": pd.array([i for i, _ in specs], dtype="int32"),
             "geom_wkb": [geom.wkb_polygon([r]) for _, r in specs]}
        )
        return spark.createDataFrame(pdf)

    out = predicates.layer_relate(_layer(squares), _layer(cells), res=10.0).collect()
    rel = {(r.a_id, r.b_id): r.relation for r in out}
    assert rel[(0, 0)] == "within"
    assert rel[(1, 0)] == "overlaps" and rel[(1, 1)] == "overlaps"
    assert rel[(2, 0)] == "within"
    assert rel[(3, 1)] == "within" and rel[(3, 0)] == "touches"
