"""Embedding-cosine near-duplicate detection (engine/ann.cosine_near_dup)
vs a brute-force all-pairs numpy oracle.

Fixture: 40 well-separated base directions in R^16, each with 1-2 tiny
perturbations planted (cos >= 0.998 to their base), plus the bases
themselves mutually far apart (cos <= ~0.85).  With threshold 0.95 the
true pair set is exactly the planted clusters' internal pairs — no
boundary-sensitive pair exists, so float summation order cannot flip a
verdict.  Everything is seeded/deterministic.
"""

import numpy as np
import pandas as pd
import pytest

from engine import ann

DIM = 16
THRESH = 0.95


@pytest.fixture(scope="module")
def fixture_vectors():
    rng = np.random.RandomState(42)
    rows = []
    vid = 0
    for b in range(40):
        base = rng.standard_normal(DIM)
        base /= np.linalg.norm(base)
        rows.append((vid, base))
        vid += 1
        for _ in range(1 + (b % 2)):
            pert = base + 0.03 * rng.standard_normal(DIM)
            pert /= np.linalg.norm(pert)
            rows.append((vid, pert))
            vid += 1
    return rows


def _brute_pairs(rows, thresh):
    ids = np.array([r[0] for r in rows])
    m = np.stack([r[1] for r in rows])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = m @ m.T
    out = set()
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            if cos[i, j] >= thresh:
                out.add((int(ids[i]), int(ids[j])))
    return out


def test_cosine_near_dup_matches_brute_force(spark, fixture_vectors):
    pdf = pd.DataFrame(
        {
            "vec_id": [r[0] for r in fixture_vectors],
            "embedding": [[float(x) for x in r[1]] for r in fixture_vectors],
        }
    )
    df = spark.createDataFrame(pdf)
    got = {
        (int(r.id_a), int(r.id_b))
        for r in ann.cosine_near_dup(df, threshold=THRESH, nbits=16, n_bands=4).collect()
    }
    brute = _brute_pairs(fixture_vectors, THRESH)
    # exact precision: the refine step guarantees no false positives
    assert got <= brute, f"false positives: {got - brute}"
    # recall: near-parallel planted pairs (cos>=0.998) collide in some band
    # with prob ~1-1e-5 per pair under the fixed seed — deterministic here
    assert got == brute, f"missed pairs: {brute - got}"
    # sanity: the fixture actually plants a non-trivial pair set
    assert len(brute) >= 40


def test_cosine_near_dup_no_pairs_below_threshold(spark):
    rng = np.random.RandomState(3)
    # orthogonal-ish random directions in R^32: max pairwise cos well below 0.9
    m = rng.standard_normal((50, 32))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    pdf = pd.DataFrame(
        {"vec_id": range(50), "embedding": [[float(x) for x in v] for v in m]}
    )
    cos = m @ m.T
    np.fill_diagonal(cos, 0)
    assert cos.max() < 0.9
    df = spark.createDataFrame(pdf)
    assert ann.cosine_near_dup(df, threshold=0.9, nbits=16, n_bands=4).count() == 0


def test_cosine_near_dup_on_testdata_embeddings(spark):
    """Driver-provided embeddings table vs the brute-force all-pairs count.

    NOTE the testdata embeddings contain NO near-dup pairs (max pairwise
    cos ≈ 0.48-0.51 at sf0.001/sf0.01 — measured, not assumed), so the
    meaningful assertion is agreement with the brute-force oracle at a
    threshold near the actual maximum, NOT a bare `count() == 0` (which
    would be vacuous).  The planted-pair fixture above carries the recall
    evidence; this test pins precision + plumbing on the real table."""
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pdf = df.toPandas()
    m = np.stack(pdf["embedding"].map(lambda v: np.asarray(v, dtype=np.float64)))
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = m @ m.T
    thresh = 0.45  # just under the measured max pair cos (~0.479)
    ids = pdf["vec_id"].to_numpy()
    iu = np.triu_indices(len(ids), k=1)
    sel = cos[iu] >= thresh
    brute = {
        (int(min(a, b)), int(max(a, b)))
        for a, b in zip(ids[iu[0]][sel], ids[iu[1]][sel])
    }
    assert brute, "threshold chosen to be non-vacuous"
    res = ann.cosine_near_dup(df, threshold=thresh, nbits=16, n_bands=4).collect()
    got = {(int(r.id_a), int(r.id_b)) for r in res}
    assert len(got) == len(res)  # pair dedupe
    # precision is exact by construction; at cos ~0.45-0.48 per-bit collision
    # p ~ 0.65, band recall ~ 1-(1-p^4)^4 ~ 0.55 — so assert subset, plus
    # exact value agreement on everything reported
    assert got <= brute
    vecs = dict(zip(ids, m))
    for r in res:
        ref = float(vecs[int(r.id_a)] @ vecs[int(r.id_b)])
        assert abs(ref - float(r.cos)) < 1e-9
