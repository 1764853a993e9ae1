"""textops scale-path tests (banded exact Jaccard)."""

from engine import textops




def test_ngram_jaccard_banded_subset_of_exact(spark):
    """Banded exact-Jaccard pairs are a SUBSET of the brute-force all-pairs
    result with IDENTICAL jaccard values (banding only affects recall,
    never the value), and near-identical docs are always caught."""
    import pandas as pd

    rows = [(i, f"alpha beta gamma delta epsilon zeta eta theta doc{i}") for i in range(20)]
    rows += [(100, "the quick brown fox jumps over the lazy dog again and again"),
             (101, "the quick brown fox jumps over the lazy dog again and again")]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    exact = {
        (r.a, r.b): r.jaccard
        for r in textops.ngram_jaccard_pairs(docs, threshold=0.1).collect()
    }
    banded = {
        (r.a, r.b): r.jaccard
        for r in textops.ngram_jaccard_banded(docs, threshold=0.1).collect()
    }
    assert set(banded) <= set(exact)
    for k, v in banded.items():
        assert v == exact[k]
    # identical docs collide in every band: always recalled
    assert (100, 101) in banded and banded[(100, 101)] == 1.0
