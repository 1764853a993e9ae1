"""Byte-identical html→text invariant (BASELINE.json input_hint)."""

import numpy as np

from engine.extract import extract_text, render_html
from engine.fixtures import make_gazetteer, make_pages


def test_roundtrip_simple():
    for t in ["hello world", "", "a & b < c > d", "ümlaut ünïcode ✓", "&amp;lt; tricky &gt;"]:
        assert extract_text(render_html(t)) == t


def test_roundtrip_fixture_pages():
    pages = make_pages(n=300, seed=1)
    for t, h in zip(pages["text"], pages["html"]):
        assert extract_text(h) == t


def test_roundtrip_adversarial():
    rng = np.random.default_rng(2)
    alphabet = list("ab<>&;ltgampq </p><p> \n\t�日本")
    for _ in range(200):
        t = "".join(rng.choice(alphabet, rng.integers(0, 80)))
        assert extract_text(render_html(t)) == t


def test_spark_extraction_matches(spark):
    from engine.extract import with_extracted_text

    pages = make_pages(n=200, gazetteer=make_gazetteer(100), seed=3)
    df = spark.createDataFrame(pages)
    out = with_extracted_text(df).where("text_extracted <> text")
    assert out.count() == 0


def test_simhash64_and_near_pairs(spark):
    import pandas as pd

    from engine import textops
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "the quick brown fox jumps over the lazy dog",
                    "the quick brown fox jumps over the lazy cat",  # near-dup of 1
                    "completely different content about spark engines",
                    "the quick brown fox jumps over the lazy dog",   # exact dup of 1
                ],
            }
        )
    )
    sh = {r.doc_id: r.s for r in docs.select("doc_id", textops.simhash64(F.col("text")).alias("s")).collect()}
    assert sh[1] == sh[4]                       # identical text → identical word
    assert sh[1] != sh[3]
    # hamming(1,2) small, hamming(1,3) large
    h12 = bin((sh[1] ^ sh[2]) & ((1 << 64) - 1)).count("1")
    h13 = bin((sh[1] ^ sh[3]) & ((1 << 64) - 1)).count("1")
    assert h12 < h13
    pairs = {(r.a, r.b): r.hamming for r in textops.simhash_near_pairs(docs, max_hamming=3).collect()}
    assert (1, 4) in pairs and pairs[(1, 4)] == 0
    assert (1, 3) not in pairs


def test_dedup_lines_corpus(spark):
    """Corpus line dedup vs a DuckDB oracle on the same frame: lines whose
    normalized form appears in > 1 distinct docs vanish from every doc;
    blank lines survive; NULL text stays NULL; order preserved."""
    import duckdb
    import pandas as pd
    from engine.textops import dedup_lines_df

    rows = [
        (1, "Keep me\nSHARED boilerplate\n\nunique tail"),
        (2, "shared boilerplate \nanother line"),      # same after trim+lower
        (3, "solo document\nno dupes here"),
        (4, ""),                                        # single blank line
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        dedup_lines_df(docs)
        .orderBy("doc_id")
        .toPandas()
    )
    oracle = duckdb.connect().execute("""
        WITH docs(doc_id, text) AS (VALUES
            (1, 'Keep me' || chr(10) || 'SHARED boilerplate' || chr(10) || chr(10) || 'unique tail'),
            (2, 'shared boilerplate ' || chr(10) || 'another line'),
            (3, 'solo document' || chr(10) || 'no dupes here'),
            (4, ''), (5, NULL)),
        lines AS (
            SELECT doc_id, u.line, u.pos
            FROM docs, LATERAL (
                SELECT unnest(string_split(text, chr(10))) AS line,
                       generate_subscripts(string_split(text, chr(10)), 1) AS pos) u
            WHERE text IS NOT NULL),
        dup AS (
            SELECT lower(trim(line)) AS k FROM lines
            WHERE trim(line) <> ''
            GROUP BY 1 HAVING count(DISTINCT doc_id) > 1),
        kept AS (
            SELECT * FROM lines
            WHERE trim(line) = '' OR lower(trim(line)) NOT IN (SELECT k FROM dup))
        SELECT d.doc_id,
               CASE WHEN d.text IS NULL THEN NULL
                    ELSE coalesce(string_agg(k.line, chr(10) ORDER BY k.pos), '') END AS text_dedup,
               CASE WHEN d.text IS NULL THEN NULL ELSE count(k.line) END AS lines_kept
        FROM docs d LEFT JOIN kept k USING (doc_id)
        GROUP BY d.doc_id, d.text ORDER BY d.doc_id
    """).df()
    assert got.text_dedup.tolist()[:4] == oracle.text_dedup.tolist()[:4]
    assert got.text_dedup.isna().tolist() == [False, False, False, False, True]
    assert got.lines_kept.tolist()[:4] == [3, 1, 2, 1]
    assert got.lines_removed.tolist()[:4] == [1, 1, 0, 0]
    # the shared line is gone from BOTH docs, non-dup content intact
    assert got.text_dedup[0] == "Keep me\n\nunique tail"
    assert got.text_dedup[1] == "another line"


def test_dedup_lines_identity_when_no_dupes(spark):
    from engine.textops import dedup_lines_df

    docs = spark.createDataFrame(
        [(i, f"alpha {i}\nbeta {i}") for i in range(20)], "doc_id long, text string"
    )
    got = dedup_lines_df(docs).orderBy("doc_id").toPandas()
    assert (got.lines_removed == 0).all()
    assert got.text_dedup.tolist() == [f"alpha {i}\nbeta {i}" for i in range(20)]


def test_dedup_clusters_transitive_and_singletons(spark):
    """dedup_clusters_df: near-dup pairs chain transitively into one
    cluster (A~B, B~C => {A,B,C} even if A,C never share a band), exact
    duplicates cluster, untouched docs stay singletons, and the canonical
    member is the minimum doc_id."""
    from engine.textops import dedup_clusters_df

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    rows = [
        (10, base),                       # chain head
        (11, base + "tail one"),          # ~10
        (12, base + "tail one extra"),    # ~11 (and ~10)
        (20, "completely different text about spark shuffles and joins"),
        (21, "completely different text about spark shuffles and joins"),  # exact dup of 20
        (30, "an isolated singleton document with its own vocabulary entirely"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in dedup_clusters_df(docs, n_hashes=16, n_bands=8, shingle_words=3).collect()
    }
    assert got[10]["cluster_id"] == got[11]["cluster_id"] == got[12]["cluster_id"] == 10
    assert got[10]["n_members"] == 3 and got[10]["is_canonical"] == 1
    assert got[11]["is_canonical"] == 0 and got[12]["is_canonical"] == 0
    assert got[20]["cluster_id"] == got[21]["cluster_id"] == 20
    assert got[20]["n_members"] == 2
    assert got[30]["cluster_id"] == 30 and got[30]["n_members"] == 1
    assert got[30]["is_canonical"] == 1


def test_c4_filter_rules(spark):
    """Each published C4 heuristic (Raffel et al. 2020 §2.2) enforced:
    terminal punctuation, >=5 words, 'javascript' line drop, >=3 kept
    lines per page, 'lorem ipsum' and '{' page drops."""
    from engine.textops import c4_filter_df

    good = "this line has five words here.\nanother good sentence with many words!\nis this a kept question line?"
    rows = [
        (1, good),                                           # kept: 3 qualifying lines
        (2, good.replace("?", "")),                          # 3rd line loses punctuation -> 2 kept -> drop
        (3, "too short line.\n" + good),                     # short line dropped, page still kept
        (4, good + "\nenable javascript to view this page."),# js line dropped, page kept
        (5, good + "\nlorem ipsum dolor sit amet."),         # page drop
        (6, good + "\nfunction f() { return 1; }"),          # page drop ('{')
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in c4_filter_df(docs).collect()}
    assert got[1]["c4_keep"] == 1 and got[1]["c4_lines_kept"] == 3
    assert got[1]["c4_text"] == good
    assert got[2]["c4_keep"] == 0 and got[2]["c4_lines_kept"] == 2
    assert got[3]["c4_keep"] == 1 and got[3]["c4_lines_kept"] == 3
    assert got[3]["c4_text"] == good                          # short line removed
    assert got[4]["c4_keep"] == 1 and got[4]["c4_lines_kept"] == 3
    assert got[5]["c4_keep"] == 0 and got[5]["c4_text"] is None
    assert got[6]["c4_keep"] == 0


def test_bpe_token_count_examples(spark):
    """GPT-2-style pretokenizer count: contractions split, digit runs and
    punctuation runs are single tokens, whitespace never counts."""
    from engine.textops import bpe_token_count
    from pyspark.sql import functions as F

    cases = {
        "It's 2026, isn't it?!": 8,   # It|'s| 2026|,| isn|'t| it|?!
        "hello   world": 2,
        "a1b2 c3": 6,                 # a|1|b|2| c|3
        "": 0,
        "tab\tsep\nline": 3,
    }
    df = spark.createDataFrame([(s,) for s in cases], "text string")
    got = {r["text"]: r["n"] for r in df.select("text", bpe_token_count(F.col("text")).alias("n")).collect()}
    assert got == cases


def test_star_edges_linear_on_hot_bucket(spark):
    """The 100-TB blowup guard: a bucket of n identical documents must emit
    O(n) connectivity edges (hub star), NOT n(n-1)/2 pairs — and the dedup
    clustering over it stays exact (one cluster, min id canonical)."""
    from engine.textops import dedup_clusters_df, minhash_lsh_star_edges
    from pyspark.sql import functions as F

    n = 10_000
    base = "the same boilerplate footer text repeated across every page " * 3
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(base).alias("text")
    )
    edges = minhash_lsh_star_edges(docs, n_hashes=16, n_bands=4)
    assert edges.count() == n - 1  # every member ↔ hub 0, once, despite 4 bands

    got = dedup_clusters_df(docs, n_hashes=16, n_bands=4).toPandas()
    assert (got.cluster_id == 0).all()
    assert (got.n_members == n).all()
    assert got.loc[got.doc_id == 0, "is_canonical"].iloc[0] == 1
    assert int(got.is_canonical.sum()) == 1


def test_star_edges_cc_identical_to_pair_clique(spark):
    """Star edges span the same vertex set per bucket as the all-pairs
    clique, so connected components are identical: the star path (ungated)
    must produce the same cluster labels as the pair path with a vacuous
    jaccard gate (>= 0.0 keeps every candidate pair)."""
    from engine.textops import dedup_clusters_df

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    rows = [
        (10, base),
        (11, base + "tail one"),
        (12, base + "tail one extra"),
        (20, "completely different text about spark shuffles and joins"),
        (21, "completely different text about spark shuffles and joins"),
        (30, "an isolated singleton document with its own vocabulary entirely"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(n_hashes=16, n_bands=8, shingle_words=3)
    star = dedup_clusters_df(docs, **kw).orderBy("doc_id").toPandas()
    pair = (
        dedup_clusters_df(docs, min_est_jaccard=0.0, **kw).orderBy("doc_id").toPandas()
    )
    assert star.cluster_id.tolist() == pair.cluster_id.tolist()
    assert star.n_members.tolist() == pair.n_members.tolist()
    assert star.is_canonical.tolist() == pair.is_canonical.tolist()


def test_minhash_pair_cap_and_overflow_accounting(spark):
    """max_bucket deterministically truncates each LSH bucket to its
    smallest ids (pairs only among survivors), and lsh_bucket_overflow
    reports exactly what was dropped."""
    from engine.textops import (
        _minhash_banded, lsh_bucket_overflow, minhash_lsh_pairs,
    )
    from pyspark.sql import functions as F

    n, cap = 200, 5
    base = "identical boilerplate page body shared by every document here " * 3
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(base).alias("text")
    )
    pairs = minhash_lsh_pairs(docs, n_hashes=16, n_bands=4, max_bucket=cap).toPandas()
    # all docs identical -> every band bucket holds all n; survivors are ids 0..cap-1
    assert len(pairs) == cap * (cap - 1) // 2
    assert set(pairs.a) | set(pairs.b) == set(range(cap))
    assert (pairs.est_jaccard == 1.0).all()

    banded = _minhash_banded(docs, "doc_id", "text", 16, 4, 3, 42)
    ov = lsh_bucket_overflow(banded, cap).toPandas()
    assert len(ov) == 4  # one overflowing bucket per band
    assert (ov.n_members == n).all()
    assert (ov.n_dropped == n - cap).all()


def test_simhash_pair_cap(spark):
    from engine import textops
    from pyspark.sql import functions as F

    n, cap = 100, 4
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("same tokens in every single document body").alias("text"),
    )
    pairs = textops.simhash_near_pairs(docs, max_bucket=cap).toPandas()
    assert len(pairs) == cap * (cap - 1) // 2
    assert set(pairs.a) | set(pairs.b) == set(range(cap))
    assert (pairs.hamming == 0).all()
