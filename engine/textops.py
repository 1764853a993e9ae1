"""Text-analysis + deduplication operators for the web-page pipeline.

The training-data-pipeline operator family: exact dedup, MinHash+LSH and
SimHash near-dup, n-gram Jaccard, language ID, quality scoring, token
counting, document fingerprinting.  GDAL has no text operators; these are
the payload-side superset the mission brief requires, built with the same
engine discipline: everything JVM-side (higher-order functions on arrays —
no Python in the hot path), and every hash derived from md5 so an
independent SQL engine can reproduce results bit-for-bit (xxhash64 etc. are
engine-specific; md5 is not).

Hash family: h_i(s) = (A_i * H(s) + B_i) mod P  over  H(s) = first 15 hex
chars of md5(s) as int (60 bits), P = 2^61-1 (Mersenne), with fixed seeded
A_i/B_i — the standard universal-hash MinHash construction.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window, functions as F

MERSENNE_P = (1 << 61) - 1
_HEX_CHARS = 15  # 60 bits < 2^61 and < int64


def _hash_params(n: int, seed: int = 42):
    """A_i < 2^30 and base hash < 2^32, so A*H + B < 2^63 — no int64
    overflow inside the JVM expression (ANSI-safe)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 30, n, dtype=np.int64)
    b = rng.integers(0, 1 << 61, n, dtype=np.int64)
    return a.tolist(), b.tolist()


def md5_int(col: Column) -> Column:
    """First 60 bits of md5 as a long — the base hash H(s), reproducible in
    any SQL engine (DuckDB: CAST(CONCAT('0x', substring(md5(s),1,15)) AS ...))."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, _HEX_CHARS), 16, 10).cast("long")


def md5_int_sql(expr: str) -> str:
    """DuckDB-SQL equivalent of md5_int."""
    return f"CAST(CONCAT('0x', substring(md5({expr}), 1, {_HEX_CHARS})) AS BIGINT)"


def tokens(col: Column, lowercase: bool = True) -> Column:
    """Whitespace tokenization (the engine's token-count basis)."""
    c = F.lower(col) if lowercase else col
    return F.split(c, " ")


def char_shingles(col: Column, k: int = 5) -> Column:
    """All k-char shingles of a string as an array (distinct, sorted) —
    the MinHash input set."""
    n = F.length(col)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_sort(F.array_distinct(F.transform(idx, lambda i: col.substr(i, F.lit(k)))))


def word_shingles(col: Column, n: int = 3) -> Column:
    """n-word shingles (distinct) from whitespace tokens."""
    toks = tokens(col)
    cnt = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def minhash_signature(shingle_col: Column, n_hashes: int = 16, seed: int = 42) -> Column:
    """MinHash signature: array<long> of length n_hashes.

    sig[i] = min over shingles s of (A_i * H32(s) + B_i) mod P, with H32 =
    first 8 md5 hex chars (32 bits — keeps A*H+B inside int64).  Empty
    shingle set → sig[i] = P (sentinel), keeping the column total."""
    a, b = _hash_params(n_hashes, seed)
    base = F.transform(
        shingle_col,
        lambda s: F.conv(F.substring(F.md5(s.cast("binary")), 1, 8), 16, 10).cast("long"),
    )
    mins = [
        F.coalesce(
            F.array_min(F.transform(base, lambda h: (h * ai + bi) % MERSENNE_P)),
            F.lit(MERSENNE_P),
        )
        for ai, bi in zip(a, b)
    ]
    return F.array(*mins)


def lsh_bands(sig_col: Column, n_bands: int = 4, rows_per_band: int = 4) -> Column:
    """Split a MinHash signature into bands; each band keyed by the md5 of
    its joined values → array<struct<band:int, key:string>> ready to explode
    into the LSH bucket join."""
    bands = []
    for bi in range(n_bands):
        seg = F.slice(sig_col, bi * rows_per_band + 1, rows_per_band)
        key = F.md5(F.concat_ws(",", F.transform(seg, lambda x: x.cast("string"))).cast("binary"))
        bands.append(F.struct(F.lit(bi).alias("band"), key.alias("key")))
    return F.array(*bands)


def minhash_signatures_df(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    shingle_words: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(_id, _sig array<long>) via explode + grouped min-aggs.

    The Column-expression form (minhash_signature) re-evaluates the md5 per
    hash function (16× the work — measured); this explodes shingles so the
    base hash is computed ONCE per (doc, shingle) row, then takes the 16
    mins as one JVM hash aggregation with map-side combine — the scalable
    formulation.  Docs with no shingles get the sentinel-P signature.
    """
    a, b = _hash_params(n_hashes, seed)
    sh = docs.select(
        F.col(id_col).alias("_id"),
        F.explode_outer(word_shingles(F.col(text_col), shingle_words)).alias("_s"),
    )
    h = F.conv(F.substring(F.md5(F.col("_s").cast("binary")), 1, 8), 16, 10).cast("long")
    hashed = sh.select("_id", h.alias("_h"))
    aggs = [
        F.coalesce(F.min((F.col("_h") * ai + bi) % MERSENNE_P), F.lit(MERSENNE_P)).alias(f"_m{i}")
        for i, (ai, bi) in enumerate(zip(a, b))
    ]
    sig = hashed.groupBy("_id").agg(*aggs)
    return sig.select("_id", F.array(*[F.col(f"_m{i}") for i in range(n_hashes)]).alias("_sig"))


def cap_lsh_buckets(
    banded: DataFrame, max_bucket: int | None, id_col: str = "_id",
    keys: tuple = ("band", "key"),
) -> DataFrame:
    """Deterministically truncate every LSH bucket to its ``max_bucket``
    smallest ids.

    All-pairs generation within a bucket is quadratic in bucket size: a
    boilerplate cluster of c identical documents collides in EVERY band and
    emits c(c-1)/2 pairs — at web scale (c ~ 10^6) that is 5·10^11 rows out
    of ONE bucket.  Capping bounds pair output at max_bucket²·n_buckets
    while keeping the truncation deterministic (smallest ids survive, so
    the bucket minimum — the dedup hub — is always retained).  Use
    :func:`lsh_bucket_overflow` on the same banded frame to account for
    what the cap dropped; for full-connectivity dedup use the star-edge
    path (:func:`minhash_lsh_star_edges`), which needs no cap at all."""
    if max_bucket is None:
        return banded
    if max_bucket < 2:
        raise ValueError("max_bucket must be >= 2 (a 1-member bucket emits no pairs)")
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(F.col(id_col).asc())
    return (
        banded.withColumn("_bucket_rn", F.row_number().over(w))
        .where(F.col("_bucket_rn") <= int(max_bucket))
        .drop("_bucket_rn")
    )


def lsh_bucket_overflow(
    banded: DataFrame, max_bucket: int, id_col: str = "_id",
    keys: tuple = ("band", "key"),
) -> DataFrame:
    """Overflow accounting for :func:`cap_lsh_buckets`: one row per bucket
    whose membership exceeds ``max_bucket`` — (keys..., n_members,
    n_dropped).  One map-combined groupBy on the band keys; run it on the
    same banded frame the pair generator saw to report exactly what the cap
    truncated."""
    g = banded.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return g.where(F.col("n_members") > int(max_bucket)).select(
        *keys,
        "n_members",
        (F.col("n_members") - F.lit(int(max_bucket))).cast("long").alias("n_dropped"),
    )


def _minhash_banded(
    docs: DataFrame, id_col: str, text_col: str, n_hashes: int, n_bands: int,
    shingle_words: int, seed: int,
) -> DataFrame:
    """(_id, _sig, band, key) — the banded signature frame shared by the
    pair and star-edge generators."""
    sig = minhash_signatures_df(docs, id_col, text_col, n_hashes, shingle_words, seed)
    return sig.select(
        "_id", "_sig", F.explode(lsh_bands(F.col("_sig"), n_bands, n_hashes // n_bands)).alias("_b")
    ).select("_id", "_sig", F.col("_b.band").alias("band"), F.col("_b.key").alias("key"))


def minhash_lsh_star_edges(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    n_bands: int = 4,
    shingle_words: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Connectivity edges for fuzzy dedup, LINEAR in bucket size.

    Per (band, key) bucket, emit (bucket-min id ↔ member) star edges instead
    of all pairs: the star spans the same vertex set as the clique, so
    connected components over the union of stars are IDENTICAL to components
    over the union of cliques — while a c-member boilerplate megabucket
    emits c-1 edges, not c(c-1)/2.  This is the 100-TB-safe edge generator
    behind :func:`dedup_clusters_df`; the pairwise API
    (:func:`minhash_lsh_pairs`) remains for jaccard-gated inspection.

    Plan: one window-min over the band exchange (no self-join), then a
    distinct.  Returns (ka, kb) with ka = bucket hub < kb.
    """
    banded = _minhash_banded(docs, id_col, text_col, n_hashes, n_bands, shingle_words, seed)
    w = Window.partitionBy("band", "key")
    return (
        banded.withColumn("_hub", F.min("_id").over(w))
        .where(F.col("_id") != F.col("_hub"))
        .select(F.col("_hub").alias("ka"), F.col("_id").alias("kb"))
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    n_bands: int = 4,
    shingle_words: int = 3,
    seed: int = 42,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash+LSH banding.

    Plan: per-doc signature (explode + grouped min-agg, see
    minhash_signatures_df) → explode bands → self-equi-join on (band, key) →
    distinct ordered pairs (a < b) → exact signature-agreement fraction as
    the MinHash Jaccard estimate.

    Scale: the self-join shuffles on band keys, but pair output is
    QUADRATIC in bucket size — a duplicate megacluster collides in every
    band.  Pass ``max_bucket`` to deterministically truncate each bucket to
    its ``max_bucket`` smallest ids (see :func:`cap_lsh_buckets`;
    :func:`lsh_bucket_overflow` reports what was dropped).  For
    connectivity-only dedup use :func:`minhash_lsh_star_edges`, which is
    exact for clustering and linear in bucket size without any cap.
    """
    banded = _minhash_banded(docs, id_col, text_col, n_hashes, n_bands, shingle_words, seed)
    if max_bucket is not None:
        # materialize the capped frame once: the self-join below references
        # it from BOTH sides, and Spark plans the shared subtree (signature
        # agg + cap window) twice — measured 2x the exchanges without this
        banded = cap_lsh_buckets(banded, max_bucket).localCheckpoint(eager=True)
    left = banded.select(
        F.col("_id").alias("a"), F.col("_sig").alias("sig_a"), "band", "key"
    )
    right = banded.select(
        F.col("_id").alias("b"), F.col("_sig").alias("sig_b"), "band", "key"
    )
    pairs = (
        left.join(right, on=["band", "key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "sig_a", "sig_b")
        .distinct()
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")), lambda v: v == 1
        )
    )
    return pairs.select(
        "a", "b", (agree.cast("double") / F.lit(float(n_hashes))).alias("est_jaccard")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard over all pairs above threshold (the brute-force
    dedup oracle; quadratic — use minhash_lsh_pairs at scale)."""
    sh = docs.select(
        F.col(id_col).alias("_id"), word_shingles(F.col(text_col), n).alias("_sh")
    )
    a = sh.select(F.col("_id").alias("a"), F.col("_sh").alias("sha"))
    b = sh.select(F.col("_id").alias("b"), F.col("_sh").alias("shb"))
    inter = F.size(F.array_intersect("sha", "shb"))
    union = F.size(F.array_union("sha", "shb"))
    jac = inter.cast("double") / union.cast("double")
    return (
        a.crossJoin(b)
        .where(F.col("a") < F.col("b"))
        .select("a", "b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_banded(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    n_hashes: int = 16,
    n_bands: int = 4,
    seed: int = 42,
    max_bucket: int | None = None,
) -> DataFrame:
    """EXACT n-gram Jaccard computed only on LSH-banded candidate pairs —
    the scale path that replaces :func:`ngram_jaccard_pairs`' cartesian
    product: banding equi-joins on (band, key) (quadratic only within a
    bucket; cap with ``max_bucket``), then each candidate pair joins back
    its two shingle sets by id and the exact Jaccard gates at ``threshold``.
    Same output schema as the brute-force oracle restricted to pairs the
    banding catches; recall vs the oracle is what minhash banding trades
    for linearity."""
    banded = _minhash_banded(docs, id_col, text_col, n_hashes, n_bands, n, seed)
    if max_bucket is not None:
        banded = cap_lsh_buckets(banded, max_bucket).localCheckpoint(eager=True)
    cand = (
        banded.select(F.col("_id").alias("a"), "band", "key")
        .join(banded.select(F.col("_id").alias("b"), "band", "key"), on=["band", "key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    sh = docs.select(
        F.col(id_col).alias("_id"), word_shingles(F.col(text_col), n).alias("_sh")
    )
    out = (
        cand.join(sh.select(F.col("_id").alias("a"), F.col("_sh").alias("sha")), on="a")
        .join(sh.select(F.col("_id").alias("b"), F.col("_sh").alias("shb")), on="b")
    )
    jac = (
        F.size(F.array_intersect("sha", "shb")).cast("double")
        / F.size(F.array_union("sha", "shb")).cast("double")
    )
    return out.select("a", "b", jac.alias("jaccard")).where(F.col("jaccard") >= threshold)


def simhash16(text_col: Column, seed: int = 42) -> Column:
    """16-bit SimHash over whitespace tokens: bit_i = 1 iff
    sum over tokens of (±1 by bit i of H(token)) > 0.  Small width keeps the
    oracle SQL tractable; the construction generalizes to 64."""
    toks = tokens(text_col)
    h = F.transform(toks, lambda t: F.conv(F.substring(F.md5(t.cast("binary")), 1, _HEX_CHARS), 16, 10).cast("long"))
    bits = []
    for i in range(16):
        contrib = F.aggregate(
            h,
            F.lit(0),
            lambda acc, x: acc + F.when(F.shiftright(x, i) % 2 == 1, 1).otherwise(-1),
        )
        bits.append(F.when(contrib > 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def simhash64(text_col: Column, seed: int = 42) -> Column:
    """64-bit SimHash (production width): bits 0..31 from the first md5
    word, 32..63 from the second — same ±1 bit-vote construction as
    :func:`simhash16`, JVM-side throughout.  Bit 63 wraps into the sign
    bit of the BIGINT (two's-complement), which is fine for XOR/Hamming
    use."""
    toks = tokens(text_col)
    h1 = F.transform(toks, lambda t: F.conv(F.substring(F.md5(t.cast("binary")), 1, 8), 16, 10).cast("long"))
    h2 = F.transform(toks, lambda t: F.conv(F.substring(F.md5(t.cast("binary")), 9, 8), 16, 10).cast("long"))
    def _vote(b):
        return lambda acc, x: acc + F.when(F.shiftright(x, b) % 2 == 1, 1).otherwise(-1)

    out = F.lit(0).cast("long")
    for i in range(64):
        src = h1 if i < 32 else h2
        bit = i if i < 32 else i - 32
        contrib = F.aggregate(src, F.lit(0), _vote(bit))
        out = out + F.when(contrib > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
    return out


def simhash64_df(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash as a DataFrame op: explode tokens → ONE hash
    aggregate with 64 conditional bit-count sums → assemble the word.

    Semantically identical to the :func:`simhash64` Column form (every
    token occurrence votes ±1 per bit), but the per-row cost is one md5 +
    64 cheap bit ops instead of 64 array folds — the production path at
    100 TB: a single map-side-combined shuffle on ``id_col``, no Python.
    Docs with NULL text get a NULL simhash64 (matching the Column form).
    Returns (id_col, simhash64)."""
    toks = tokens(F.col(text_col))
    ex = docs.select(
        F.col(id_col).alias("_id"), F.size(toks).alias("_n"), F.explode(toks).alias("_t")
    )
    md5 = F.md5(F.col("_t").cast("binary"))
    h1 = F.conv(F.substring(md5, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(md5, 9, 8), 16, 10).cast("long")
    aggs = []
    for i in range(64):
        src, bit = (h1, i) if i < 32 else (h2, i - 32)
        aggs.append(F.sum(F.shiftright(src, bit).bitwiseAND(F.lit(1))).alias(f"_c{i}"))
    g = ex.groupBy("_id", "_n").agg(*aggs)
    word = F.lit(0).cast("long")
    for i in range(64):
        # bit votes positive ⟺ set-count > n/2 ⟺ 2·count > n
        word = word + F.when(
            2 * F.col(f"_c{i}") > F.col("_n"),
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
    out = g.select(F.col("_id").alias(id_col), word.alias("simhash64"))
    # docs whose token array is NULL never explode: restore them as NULL
    return docs.select(F.col(id_col)).join(out, on=id_col, how="left")


def simhash_all_df(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Both SimHash widths in ONE explode + hash-aggregate pass:
    (id_col, simhash16, simhash64).  simhash16 votes on bits 0..15 of the
    60-bit md5 word (identical to :func:`simhash16`), simhash64 on the two
    32-bit md5 words (identical to :func:`simhash64`) — 80 conditional
    sums in a single map-combined shuffle instead of three document
    scans."""
    toks = tokens(F.col(text_col))
    ex = docs.select(
        F.col(id_col).alias("_id"), F.size(toks).alias("_n"), F.explode(toks).alias("_t")
    )
    md5 = F.md5(F.col("_t").cast("binary"))
    h60 = F.conv(F.substring(md5, 1, _HEX_CHARS), 16, 10).cast("long")
    h1 = F.conv(F.substring(md5, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(md5, 9, 8), 16, 10).cast("long")
    aggs = []
    for i in range(16):
        aggs.append(F.sum(F.shiftright(h60, i).bitwiseAND(F.lit(1))).alias(f"_s{i}"))
    for i in range(64):
        src, bit = (h1, i) if i < 32 else (h2, i - 32)
        aggs.append(F.sum(F.shiftright(src, bit).bitwiseAND(F.lit(1))).alias(f"_c{i}"))
    g = ex.groupBy("_id", "_n").agg(*aggs)
    w16 = F.lit(0).cast("long")
    for i in range(16):
        w16 = w16 + F.when(2 * F.col(f"_s{i}") > F.col("_n"), F.lit(1 << i)).otherwise(F.lit(0))
    w64 = F.lit(0).cast("long")
    for i in range(64):
        w64 = w64 + F.when(
            2 * F.col(f"_c{i}") > F.col("_n"),
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
    out = g.select(
        F.col("_id").alias(id_col), w16.alias("simhash"), w64.alias("simhash64")
    )
    return docs.select(F.col(id_col)).join(out, on=id_col, how="left")


def simhash_hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two simhash words (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    sig: DataFrame | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by 64-bit SimHash with the standard
    chunk-banding index: the 64-bit word splits into 4×16-bit chunks; any
    pair within Hamming distance ≤ 3 must agree on ≥ 1 chunk (pigeonhole),
    so candidates come from a chunk-value equi-join — never an all-pairs
    scan.  Returns (a, b, hamming) with a < b, hamming ≤ ``max_hamming``.

    The 4-chunk index is exact for ``max_hamming`` ≤ 3; larger radii would
    need more/finer bands (documented contract, same trade-off as the
    reference MinHash banding).  Pass ``sig`` — a precomputed
    (id_col, simhash64) frame — to skip recomputing signatures.

    Pair output is quadratic in chunk-bucket size (an exact-duplicate
    megacluster agrees on every chunk); pass ``max_bucket`` to
    deterministically truncate buckets (see :func:`cap_lsh_buckets`) —
    exactness then holds only within the retained members, with
    :func:`lsh_bucket_overflow` accounting for the rest."""
    if max_hamming > 3:
        raise ValueError(
            "the 4x16-bit chunk index is exact only for max_hamming <= 3; "
            "use more/finer bands for larger radii"
        )
    src = sig if sig is not None else simhash64_df(docs, text_col, id_col)
    sh = src.select(
        F.col(id_col).alias("_id"), F.col("simhash64").alias("_sh")
    ).where(F.col("_sh").isNotNull())
    chunks = sh.select(
        "_id", "_sh",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("ci"),
                    # mask, not %: for i=0 the unshifted word keeps its sign
                    # and a negative remainder would differ from the same low
                    # 16 bits of a non-negative word, silently dropping pairs
                    F.shiftrightunsigned(F.col("_sh"), 16 * i)
                    .bitwiseAND(F.lit((1 << 16) - 1))
                    .alias("cv"),
                )
                for i in range(4)
            ])
        ).alias("_c"),
    ).select("_id", "_sh", "_c.ci", "_c.cv")
    chunks = cap_lsh_buckets(chunks, max_bucket, keys=("ci", "cv"))
    a = chunks.select(F.col("_id").alias("a"), F.col("_sh").alias("sa"), "ci", "cv")
    b = chunks.select(F.col("_id").alias("b"), F.col("_sh").alias("sb"), "ci", "cv")
    pairs = (
        a.join(b, on=["ci", "cv"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", simhash_hamming(F.col("sa"), F.col("sb")).alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs


LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "que"],
    "es": ["el", "la", "los", "y", "es", "no", "una", "que"],
    "pt": ["o", "a", "os", "e", "não", "uma", "que", "para"],
}
_LANG_ORDER = ["en", "de", "fr", "es", "pt"]


def lang_scores(text_col: Column) -> dict:
    """Per-language stopword hit counts (the n-gram-heuristic language ID)."""
    toks = tokens(text_col)
    out = {}
    for lang in _LANG_ORDER:
        arr = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def lang_id(text_col: Column) -> Column:
    """argmax language by stopword count; ties broken by fixed order; all
    zero → 'und' (undetermined)."""
    scores = lang_scores(text_col)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(_LANG_ORDER):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def bottom_k_fingerprint(text_col: Column, k: int = 4, shingle: int = 5) -> Column:
    """Bottom-k sketch document fingerprint: the k smallest hashes of the
    5-char shingles, as a comma-joined string (stable identity for
    near-exact content; rolling-hash winnowing analog)."""
    sh = char_shingles(text_col, shingle)
    hashes = F.array_sort(
        F.transform(sh, lambda s: F.conv(F.substring(F.md5(s.cast("binary")), 1, _HEX_CHARS), 16, 10).cast("long"))
    )
    return F.concat_ws(",", F.transform(F.slice(hashes, 1, k), lambda x: x.cast("string")))


def dedup_lines_df(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_docs: int = 1,
    normalize: bool = True,
) -> DataFrame:
    """Corpus-level duplicated-line removal (the C4/CCNet paragraph-dedup
    family): a line whose normalized form (trim + lowercase when
    ``normalize``) occurs in more than ``max_docs`` DISTINCT documents is
    removed from EVERY document; surviving lines reassemble in original
    order.  Blank lines are structural and never removed.  Returns
    (id_col, text_dedup, lines_kept, lines_removed).

    Scale design — all JVM-side, two shuffles total:
    posexplode lines -> groupBy(line-hash) countDistinct(doc) builds the
    duplicate-key set with map-side partial aggregation, a left_anti join
    (AQE picks broadcast when the duplicate set is small — the common
    case) filters occurrences, and one groupBy(doc) reassembles via
    sort_array(collect_list(struct(pos, line))).  No Python, no driver
    materialization of the duplicate set."""
    lines = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    )
    norm = F.trim(F.col("_line"))
    if normalize:
        norm = F.lower(norm)
    keyed = lines.withColumn("_blank", norm == "").withColumn("_key", md5_int(norm))
    dup_keys = (
        keyed.where(~F.col("_blank"))
        .groupBy("_key")
        .agg(F.countDistinct("_id").alias("_docs"))
        .where(F.col("_docs") > max_docs)
        .select("_key")
    )
    survivors = keyed.where(F.col("_blank")).unionByName(
        keyed.where(~F.col("_blank")).join(dup_keys, on="_key", how="left_anti")
    )
    total = lines.groupBy("_id").agg(F.count("*").alias("_total"))
    agg = (
        survivors.groupBy("_id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                    lambda s: s["_line"],
                ),
            ).alias("text_dedup"),
            F.count("*").alias("lines_kept"),
        )
        .join(total, on="_id", how="right")
    )
    # NULL-text docs never explode; restore them with NULL output (the
    # engine-wide NULL-text convention, cf. simhash64_df)
    base = docs.select(F.col(id_col).alias("_id"), F.col(text_col).isNull().alias("_isnull"))
    return (
        base.join(agg, on="_id", how="left")
        .select(
            F.col("_id").alias(id_col),
            F.when(F.col("_isnull"), F.lit(None).cast("string"))
            .otherwise(F.coalesce(F.col("text_dedup"), F.lit("")))
            .alias("text_dedup"),
            F.when(F.col("_isnull"), F.lit(None).cast("long"))
            .otherwise(F.coalesce(F.col("lines_kept"), F.lit(0)).cast("long"))
            .alias("lines_kept"),
            F.when(F.col("_isnull"), F.lit(None).cast("long"))
            .otherwise(
                (F.coalesce(F.col("_total"), F.lit(0)) - F.coalesce(F.col("lines_kept"), F.lit(0))).cast("long")
            )
            .alias("lines_removed"),
        )
    )


def dedup_clusters_df(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    n_bands: int = 4,
    shingle_words: int = 3,
    seed: int = 42,
    min_est_jaccard: float | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Fuzzy-dedup clustering: the full near-duplicate REMOVAL pipeline
    (Gopher/RefinedWeb style), not just candidate pairs.

    MinHash+LSH connectivity edges → distributed connected components over
    the edge graph (components.min_label_propagate — hash-to-min + pointer
    jumping, no driver union-find) → every document labeled with its
    cluster's minimum id; the minimum-id member is the canonical survivor.

    Scale: ungated (``min_est_jaccard`` is None, the production mode), the
    edge generator is :func:`minhash_lsh_star_edges` — per-bucket hub↔member
    stars, LINEAR in bucket size and component-identical to the all-pairs
    clique (a star spans the same vertex set), so a 10^6-member boilerplate
    megabucket emits 10^6-1 edges, not 5·10^11 pairs.  With a jaccard gate
    the graph is defined PAIRWISE (an edge exists iff that pair's estimated
    jaccard clears the gate), so the pair path runs instead — quadratic in
    bucket size; cap it via ``max_bucket``.  CC shuffles edge-proportional
    bytes and converges in O(log diameter) rounds; docs untouched by any
    edge never enter propagation (left-join + coalesce restores them as
    singletons).

    Returns (id_col, cluster_id, n_members, is_canonical:int).
    """
    from engine.components import min_label_propagate

    if min_est_jaccard is None:
        edges = minhash_lsh_star_edges(
            docs, id_col, text_col, n_hashes, n_bands, shingle_words, seed
        )
    else:
        pairs = minhash_lsh_pairs(
            docs, id_col, text_col, n_hashes, n_bands, shingle_words, seed,
            max_bucket=max_bucket,
        ).where(F.col("est_jaccard") >= float(min_est_jaccard))
        edges = pairs.select(F.col("a").alias("ka"), F.col("b").alias("kb"))
    comp = min_label_propagate(edges)
    labeled = (
        docs.select(F.col(id_col).alias("k"))
        .join(comp, on="k", how="left")
        .select("k", F.coalesce(F.col("comp"), F.col("k")).alias("cluster_id"))
    )
    sizes = labeled.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n_members"))
    return labeled.join(sizes, on="cluster_id").select(
        F.col("k").alias(id_col),
        "cluster_id",
        F.col("n_members").cast("long").alias("n_members"),
        (F.col("k") == F.col("cluster_id")).cast("int").alias("is_canonical"),
    )


def c4_kept_lines(text_col: Column) -> Column:
    """C4 line-level quality filter (Raffel et al. 2020, JMLR 21(140) §2.2;
    public heuristics — no reference-repo analog, webtext payload surface):
    keep a line iff it ends in terminal punctuation (. ! ? \"), has >= 5
    whitespace words, and does not contain the word 'javascript'.
    Returns the array of kept lines; all JVM-side."""
    lines = F.split(text_col, "\n")
    return F.filter(
        lines,
        lambda l: F.trim(l).rlike('[.!?"]$')
        & (F.size(F.filter(F.split(l, " "), lambda w: w != F.lit(""))) >= 5)
        & ~F.lower(l).contains("javascript"),
    )


def c4_filter_df(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """C4 document filter: page kept iff >= 3 kept lines, no 'lorem ipsum'
    (case-insensitive), and no '{' anywhere.  Returns per-doc
    (id_col, c4_lines_total, c4_lines_kept, c4_keep:int, c4_text) where
    c4_text is the kept lines rejoined — the text that would enter the
    training corpus.  One scan, no shuffle."""
    t = F.col(text_col)
    kept = c4_kept_lines(t)
    keep_doc = (
        (F.size(kept) >= 3)
        & ~F.lower(t).contains("lorem ipsum")
        & ~t.contains("{")
    )
    return docs.select(
        F.col(id_col),
        F.size(F.split(t, "\n")).cast("long").alias("c4_lines_total"),
        F.size(kept).cast("long").alias("c4_lines_kept"),
        keep_doc.cast("int").alias("c4_keep"),
        F.when(keep_doc, F.concat_ws("\n", kept)).otherwise(F.lit(None)).alias("c4_text"),
    )


# GPT-2-style pretokenizer, lookahead-free form so the same pattern runs
# identically under Java regex (Spark) and RE2 (DuckDB oracle): contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs, then
# residual whitespace.  (The published GPT-2 pattern's trailing-space
# lookahead only affects token BOUNDARIES inside whitespace runs, not
# counts of non-space tokens.)
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def bpe_token_count(text_col: Column) -> Column:
    """BPE-ish token count: number of non-whitespace pretokens under the
    GPT-2-style regex — the standard LLM-pipeline length statistic, fully
    JVM-side (regexp_extract_all + filter)."""
    toks = F.regexp_extract_all(text_col, F.lit("(" + BPE_PRETOKEN_RE + ")"))
    return F.size(F.filter(toks, lambda t: t.rlike(r"\S")))
