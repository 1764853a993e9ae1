"""Corpus-curation operators: Gopher quality/repetition rules, benchmark
decontamination, deterministic stratified sampling, per-domain caps.

These extend the webtext payload surface (exact/near dedup, C4 filter,
line dedup live in engine/textops.py) with the remaining operators a
large-scale training-data pipeline needs.  GDAL has no text analog; the
rule definitions are public:

* Gopher rules — Rae et al. 2021 (arXiv:2112.11446, Appendix A1.1/A1.2):
  document word-count/word-length/symbol/bullet/ellipsis/alpha/stop-word
  gates plus the repetition family (duplicate line/paragraph fractions,
  duplicated-character fractions, top n-gram and duplicated n-gram
  character fractions for n = 2..4 and 5..10).
* Decontamination — the n-gram-overlap eval-set filter used by GPT-3
  (Brown et al. 2020, App. C) and Llama: any document sharing an
  n-token n-gram (n=13 canonical) with the benchmark set is flagged.

Engine discipline (same as textops): everything JVM-side — split /
transform / slice / explode / groupBy — no Python in the hot path; every
hash is md5-derived so DuckDB reproduces results bit-for-bit.

Scale notes (100 TB): the repetition scan explodes ~9 structs per word
(n-grams for n=2..10) plus lines/paragraphs; both aggregations are keyed
by (doc_id, ...) so they map-side combine and never concentrate a doc on
more than one reducer beyond its own key group.  Decontamination
broadcasts only the eval-set n-gram hashes (eval sets are tiny: ~1e5-1e7
grams).  Stratified sampling is a pure filter — no shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from engine.textops import md5_int, md5_int_sql

# Gopher Appendix A1 thresholds (Rae et al. 2021), public constants.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_NGRAM_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def _words(text_col: Column) -> Column:
    """Lowercased whitespace words, empties removed (the n-gram basis)."""
    return F.filter(F.split(F.lower(text_col), r"\s+"), lambda w: w != F.lit(""))


def _word_ngrams(words: Column, n: int) -> Column:
    """Space-joined word n-grams as an array (overlapping, order kept)."""
    cnt = F.size(words) - (n - 1)
    # sequence(1, 0) is DESCENDING [1, 0] in Spark — guard short docs.
    return F.when(cnt >= 1, F.transform(
        F.sequence(F.lit(1), cnt),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )).otherwise(F.array().cast("array<string>"))


def gopher_repetition_df(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher repetition metrics (Rae et al. 2021 App. A1.2), one
    shuffle-free projection.  Per document:

      dup_line_frac        duplicate lines / total lines
      dup_para_frac        duplicate paragraphs / total paragraphs
      dup_line_char_frac   chars in excess line copies / len(text)
      dup_para_char_frac   chars in excess paragraph copies / len(text)
      top{2,3,4}gram_char_frac   chars covered by the most frequent n-gram
      dup{5..10}gram_char_frac   chars in excess copies of repeated n-grams

    Exact definitions (documented variant — Gopher's prose is ambiguous on
    overlap accounting; this engine counts every excess occurrence once,
    chars of a word n-gram = sum of its word lengths + (n-1) separators,
    denominator = length(text)):

      top-n   = max over grams g of count(g) * chars(g) / len(text)
      dup-n   = sum over grams g with count(g) > 1 of
                (count(g) - 1) * chars(g) / len(text)

    "duplicate" for lines/paragraphs = occurrences beyond the first of a
    trimmed non-empty line (paragraphs split on blank lines).

    Plan: ZERO shuffles.  Every metric counts duplicates *within* one
    document, so nothing ever needs to leave the row: each family's items
    hash to (xxhash64, chars) structs, the array is sorted in-row, and one
    sequential fold over adjacent elements yields excess counts, excess
    chars, and the max run cover.  The whole operator is a projection —
    at 100 TB it runs entirely map-side (the fold expressions evaluate on
    Spark's interpreted higher-order-function path, not whole-stage
    codegen, but there is no shuffle and no Python anywhere).  A 64-bit
    hash collision within one (doc, family) would merge two items; at
    ~1e6 items/doc the probability is < 1e-7 corpus-wide, and the DuckDB
    oracle (corpus_curation) groups by the exact strings, so driver
    parity doubles as a standing collision check.
    """
    pre = _rep_prepared(docs, id_col, text_col)
    return pre.select(
        F.col("_id").alias(id_col), *_rep_metric_cols()
    )


_REP_FAMILIES = ("line", "para", *[f"g{n}" for n in range(2, 11)])


def _rep_prepared(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Two-stage projection materializing, per family, the SORTED
    (hash, chars) item array as a column (materialized so the fold reads a
    plain column — an inline array_sort expression would be re-evaluated
    per element reference)."""
    did, t = F.col(id_col), F.col(text_col)
    base = docs.select(
        did.alias("_id"),
        t.alias("_t"),
        F.length(t).alias("_chars"),
        _words(t).alias("_w"),
        F.filter(
            F.transform(F.split(t, "\n"), F.trim), lambda l: l != F.lit("")
        ).alias("_lines"),
        F.filter(
            F.transform(F.split(t, r"\n\s*\n"), F.trim), lambda p: p != F.lit("")
        ).alias("_paras"),
    )

    def _hashed(arr: Column) -> Column:
        return F.array_sort(
            F.transform(
                arr,
                lambda x: F.struct(
                    F.xxhash64(x).alias("h"),
                    F.length(x).cast("long").alias("c"),
                ),
            )
        )

    def _gram_hashed(n: int) -> Column:
        """Sorted (h, c) structs for word n-grams WITHOUT materializing the
        gram strings.  Each word is hashed once (`_wh`) and measured once
        (`_wl`); a gram's identity is xxhash64 over the n-word hash slice
        (equal ⇔ string-equal modulo the same 64-bit collision bound the
        docstring already carries) and its chars are the word-length slice
        sum + (n-1) separators — bit-identical to length(concat_ws(' ', …)).
        Skipping the concat avoids building Σn≈54× the text bytes of
        throwaway gram strings per document."""
        cnt = F.size(F.col("_w")) - (n - 1)
        idx = F.when(cnt >= 1, F.sequence(F.lit(1), cnt)).otherwise(
            F.array().cast("array<int>")
        )
        return F.array_sort(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.xxhash64(F.slice(F.col("_wh"), i, n)).alias("h"),
                    # O(n) primitive-long adds per gram (<=54 per word
                    # position across n=2..10) — same order as the hash's
                    # own slice walk.  A per-doc prefix-sum column would be
                    # O(1) per gram but Spark has no linear scan primitive:
                    # a window is a shuffle (breaking the operator's
                    # shuffle-free plan) and chained dependent projections
                    # risk CollapseProject inlining each level into the
                    # next (re-derivation blowup — see _rep_prepared note).
                    (
                        F.aggregate(
                            F.slice(F.col("_wl"), i, n),
                            F.lit(0).cast("long"),
                            lambda a, x: a + x,
                        )
                        + F.lit(n - 1).cast("long")
                    ).alias("c"),
                ),
            )
        )

    # stage 2: per-word hash + length arrays (each word touched once),
    # stage 3: gram (h, c) structs from slices + sort.  Higher-order
    # functions run on Spark's interpreted path, so flat passes over
    # primitive arrays beat rebuilding concatenated gram strings.
    mid = base.select(
        "_id",
        "_t",
        "_w",
        "_lines",
        "_paras",
        "_chars",
        F.transform(F.col("_w"), lambda w: F.xxhash64(w)).alias("_wh"),
        F.transform(F.col("_w"), lambda w: F.length(w).cast("long")).alias("_wl"),
    )
    fams = [_hashed(F.col("_lines")).alias("_f_line"), _hashed(F.col("_paras")).alias("_f_para")]
    for n in range(2, 11):
        fams.append(_gram_hashed(n).alias(f"_f_g{n}"))
    return mid.select(
        "_id",
        "_t",
        "_w",
        "_lines",
        "_chars",
        F.size("_lines").alias("_n_lines"),
        F.size("_paras").alias("_n_paras"),
        *fams,
    )


def _run_fold(fam: str) -> Column:
    """Fold a sorted (h, c) array into struct(ec, echars, best):
    ec = Σ occurrences beyond the first of each distinct h,
    echars = Σ their chars,  best = max over runs of run_len * chars."""
    s = F.col(f"_f_{fam}")
    n = F.size(s)
    first_c = F.when(n >= 1, s[0]["c"]).otherwise(F.lit(0).cast("long"))
    zero = F.lit(0).cast("long")
    init = F.struct(
        zero.alias("ec"),
        zero.alias("echars"),
        F.lit(1).cast("long").alias("run"),
        first_c.alias("best"),
    )
    idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )

    def step(acc: Column, i: Column) -> Column:
        cur = F.element_at(s, i + 1)
        prev = F.element_at(s, i)
        same = cur["h"] == prev["h"]
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            (acc["ec"] + F.when(same, 1).otherwise(0)).alias("ec"),
            (acc["echars"] + F.when(same, cur["c"]).otherwise(zero)).alias("echars"),
            run.alias("run"),
            F.greatest(acc["best"], run * cur["c"]).alias("best"),
        )

    return F.aggregate(idx, init, step)


def _rep_metric_cols() -> list:
    """Metric Columns over a _rep_prepared frame (names fixed)."""

    def _frac(num: Column, den: Column) -> Column:
        return F.when(den > 0, num / den).otherwise(F.lit(0.0))

    cols = []
    line, para = _run_fold("line"), _run_fold("para")
    cols.append(_frac(line["ec"], F.col("_n_lines")).alias("dup_line_frac"))
    cols.append(_frac(para["ec"], F.col("_n_paras")).alias("dup_para_frac"))
    cols.append(_frac(line["echars"], F.col("_chars")).alias("dup_line_char_frac"))
    cols.append(_frac(para["echars"], F.col("_chars")).alias("dup_para_char_frac"))
    for n in GOPHER_TOP_NGRAM_MAX:
        cols.append(
            _frac(_run_fold(f"g{n}")["best"], F.col("_chars")).alias(
                f"top{n}gram_char_frac"
            )
        )
    for n in GOPHER_DUP_NGRAM_MAX:
        cols.append(
            _frac(_run_fold(f"g{n}")["echars"], F.col("_chars")).alias(
                f"dup{n}gram_char_frac"
            )
        )
    return cols


def gopher_quality_df(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher document-quality metrics + keep decision (App. A1.1 + A1.2).

    Single-scan columns: word_count, mean_word_len, symbol_word_ratio
    ('#' + ellipsis occurrences per word), bullet_line_frac (lines starting
    with a bullet), ellipsis_line_frac (lines ending with an ellipsis),
    alpha_word_frac (words containing a letter), stopword_hits (how many of
    Gopher's 8 required words appear), plus ALL repetition metrics — one
    shuffle-free projection (the repetition folds share the same prepared
    arrays; there is no join).  gopher_keep applies every published
    threshold; per-rule columns are exposed so pipelines can relax rules.
    """
    pre = _rep_prepared(docs, id_col, text_col)
    words, lines, t = F.col("_w"), F.col("_lines"), F.col("_t")
    wc = F.size(words)
    out = pre.select(
        F.col("_id").alias(id_col),
        wc.cast("long").alias("word_count"),
        F.when(
            wc > 0,
            F.aggregate(words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
            / wc,
        )
        .otherwise(F.lit(0.0))
        .alias("mean_word_len"),
        F.when(
            wc > 0,
            (
                F.regexp_count(t, F.lit("#"))
                + F.regexp_count(t, F.lit(r"\.\.\."))
                + F.regexp_count(t, F.lit("…"))
            ).cast("double")
            / wc,
        )
        .otherwise(F.lit(0.0))
        .alias("symbol_word_ratio"),
        F.when(
            F.size(lines) > 0,
            F.size(F.filter(lines, lambda l: l.rlike(r"^[•‣▶\*\-]")))
            / F.size(lines),
        )
        .otherwise(F.lit(0.0))
        .alias("bullet_line_frac"),
        F.when(
            F.size(lines) > 0,
            F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$")))
            / F.size(lines),
        )
        .otherwise(F.lit(0.0))
        .alias("ellipsis_line_frac"),
        F.when(
            wc > 0,
            F.size(F.filter(words, lambda w: w.rlike("[a-z]"))) / wc,
        )
        .otherwise(F.lit(0.0))
        .alias("alpha_word_frac"),
        F.aggregate(
            F.array(*[F.array_contains(words, s).cast("int") for s in GOPHER_STOPWORDS]),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        .cast("long")
        .alias("stopword_hits"),
        *_rep_metric_cols(),
    )
    keep = (
        F.col("word_count").between(50, 100_000)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("symbol_word_ratio") <= 0.1)
        & (F.col("bullet_line_frac") <= 0.9)
        & (F.col("ellipsis_line_frac") <= 0.3)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("stopword_hits") >= 2)
        & (F.col("dup_line_frac") <= 0.30)
        & (F.col("dup_para_frac") <= 0.30)
        & (F.col("dup_line_char_frac") <= 0.20)
        & (F.col("dup_para_char_frac") <= 0.20)
    )
    for n, thr in GOPHER_TOP_NGRAM_MAX.items():
        keep = keep & (F.col(f"top{n}gram_char_frac") <= thr)
    for n, thr in GOPHER_DUP_NGRAM_MAX.items():
        keep = keep & (F.col(f"dup{n}gram_char_frac") <= thr)
    return out.withColumn("gopher_keep", keep.cast("int"))


# --------------------------------------------------------------------------
# Benchmark decontamination
# --------------------------------------------------------------------------

_NORM_RE = r"[^a-z0-9]+"


def _norm_tokens(text_col: Column) -> Column:
    """Decontamination normalization (GPT-3 App. C style): lowercase, strip
    everything but [a-z0-9] to spaces, whitespace-split."""
    return F.filter(
        F.split(F.regexp_replace(F.lower(text_col), _NORM_RE, " "), " "),
        lambda w: w != F.lit(""),
    )


def ngram_hashes(text_col: Column, n: int = 13) -> Column:
    """md5-derived 60-bit hashes of all normalized word n-grams (distinct)."""
    grams = _word_ngrams(_norm_tokens(text_col), n)
    return F.array_distinct(F.transform(grams, lambda g: md5_int(g)))


def decontaminate_df(
    docs: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
) -> DataFrame:
    """Flag training documents sharing any normalized n-token n-gram with
    the evaluation set (GPT-3/Llama decontamination, n=13 canonical).

    Plan: eval set → distinct n-gram hashes (small; broadcast); documents →
    exploded distinct n-gram hashes → broadcast left-semi-style join →
    per-doc hit count.  Docs shorter than n tokens have 0 grams and are
    kept.  Returns (id, ngrams_total, ngrams_hit, contaminated:int).
    """
    eval_grams = (
        eval_df.select(F.explode(ngram_hashes(F.col(eval_text_col), n)).alias("h"))
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col).alias("_id"),
        F.explode_outer(ngram_hashes(F.col(text_col), n)).alias("h"),
    )
    hits = doc_grams.join(
        F.broadcast(eval_grams.withColumn("_hit", F.lit(1))), on="h", how="left"
    )
    out = hits.groupBy("_id").agg(
        F.count("h").alias("ngrams_total"),
        F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("ngrams_hit"),
    )
    return (
        out.withColumn("contaminated", (F.col("ngrams_hit") > 0).cast("int"))
        .withColumnRenamed("_id", id_col)
    )


def ngram_hashes_sql(col: str, n: int) -> str:
    """DuckDB list expression twin of ngram_hashes (distinct 60-bit hashes
    of normalized word n-grams)."""
    toks = (
        f"list_filter(string_split(regexp_replace(lower({col}), "
        f"'{_NORM_RE}', ' ', 'g'), ' '), w -> w <> '')"
    )
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({toks}) - {n - 1}, 0) + 1), "
        f"i -> {md5_int_sql(f'array_to_string({toks}[i:i+{n - 1}], chr(32))')}))"
    )


def decontaminate_sql(
    docs_table: str,
    eval_table: str,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
) -> str:
    """DuckDB oracle for decontaminate_df (same normalization + md5 hash)."""

    def grams(col: str) -> str:
        return ngram_hashes_sql(col, n)

    return f"""
WITH eval_grams AS (
  SELECT DISTINCT unnest({grams(eval_text_col)}) AS h FROM {eval_table}
), doc_grams AS (
  SELECT {id_col}, unnest({grams(text_col)}) AS h FROM {docs_table}
), joined AS (
  SELECT d.{id_col}, d.h, (e.h IS NOT NULL)::INT AS hit
  FROM doc_grams d LEFT JOIN eval_grams e USING (h)
)
SELECT t.{id_col},
       COALESCE(j.ngrams_total, 0) AS ngrams_total,
       COALESCE(j.ngrams_hit, 0) AS ngrams_hit,
       (COALESCE(j.ngrams_hit, 0) > 0)::INT AS contaminated
FROM {docs_table} t
LEFT JOIN (
  SELECT {id_col}, COUNT(*) AS ngrams_total, SUM(hit) AS ngrams_hit
  FROM joined GROUP BY {id_col}
) j USING ({id_col})
"""


# --------------------------------------------------------------------------
# Deterministic sampling / dataset mixing
# --------------------------------------------------------------------------

_HASH_SPACE = float(1 << 60)  # md5_int range


def sample_flag(
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: int = 42,
    default_fraction: float = 0.0,
) -> Column:
    """The stratified-sampling keep predicate as a boolean Column:
    md5(seed || strata || key) < fraction(strata) * 2^60."""
    frac = F.lit(default_fraction)
    for k, v in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(frac)
    h = md5_int(
        F.concat_ws("\x1f", F.lit(str(seed)), F.col(strata_col), F.col(key_col))
    )
    return h < (frac * _HASH_SPACE).cast("long")


def sample_flag_sql(
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: int = 42,
    default_fraction: float = 0.0,
) -> str:
    """DuckDB boolean-expression twin of sample_flag (same md5 predicate)."""
    cases = " ".join(
        f"WHEN {strata_col} = '{k}' THEN {float(v)!r}" for k, v in sorted(fractions.items())
    )
    h = md5_int_sql(
        f"concat('{seed}', chr(31), {strata_col}, chr(31), {key_col})"
    )
    # floor() because Spark's double->long cast truncates while DuckDB's rounds
    return (
        f"({h} < CAST(floor((CASE {cases} ELSE {float(default_fraction)!r} END)"
        f" * {_HASH_SPACE!r}) AS BIGINT))"
    )


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Exact-deterministic stratified sampling (dataset mixing): keep a row
    iff md5(seed || strata || key) < fraction(strata) * 2^60.

    Pure filter — no shuffle, no RNG state, identical at any parallelism
    and re-run (the property plain df.sample does not give across
    repartitions).  Rows whose stratum is absent from `fractions` keep
    with `default_fraction`.  DuckDB reproduces the predicate exactly
    (sample_stratified_sql).
    """
    return df.where(
        sample_flag(strata_col, fractions, key_col, seed, default_fraction)
    )


def sample_stratified_sql(
    table: str,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: int = 42,
    default_fraction: float = 0.0,
) -> str:
    """DuckDB WHERE-clause twin of sample_stratified (same md5 predicate)."""
    flag = sample_flag_sql(strata_col, fractions, key_col, seed, default_fraction)
    return f"SELECT * FROM {table} WHERE {flag}"


def dedup_spans_df(
    docs: DataFrame,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Exact duplicated-substring removal (Lee et al. 2021,
    arXiv:2107.06499, the 'ExactSubstr' dedup): every token position that
    lies inside a token span of length >= k occurring >= min_count times in
    the corpus (within- OR cross-document) is removed; survivors are
    reassembled in order, single-space joined.

    No suffix array needed for the covered set: a position is inside a
    duplicated substring of length >= k  iff  it is covered by a duplicated
    k-token window (every window of a duplicated substring is itself
    duplicated, and a duplicated window IS a duplicated k-substring), so
    counting k-windows gives the exact cover.

    Plan (all JVM-side, md5-hash grams so DuckDB reproduces it):
    posexplode k-gram hashes -> hash groupBy count (map-combined) ->
    join duplicated hashes back -> explode covered positions (distinct)
    -> anti-join token positions -> per-doc ordered reassembly.  Shuffles
    key on gram hash and (doc, pos); a corpus-hot gram (boilerplate) fans
    out one row per occurrence, same cardinality as its input.  Tokens are
    whitespace-split, case-preserved; reassembly normalizes runs of
    whitespace to single spaces (documented deviation: the reference
    method edits raw bytes, this engine edits the token stream).
    """
    did = F.col(id_col)
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit(""))
    base = docs.select(did.alias("_id"), words.alias("_w"))
    cnt = F.size(F.col("_w")) - (k - 1)
    grams = F.when(
        cnt >= 1,
        F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: md5_int(F.concat_ws(" ", F.slice(F.col("_w"), i, k))),
        ),
    ).otherwise(F.array().cast("array<long>"))
    ex = base.select("_id", F.posexplode(grams).alias("start", "h"))
    dup = (
        ex.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
        .select("h")
    )
    covered = (
        ex.join(dup, on="h")
        .select(
            "_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (k - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    toks = base.select("_id", F.posexplode(F.col("_w")).alias("pos", "tok"))
    kept = toks.join(covered, on=["_id", "pos"], how="left_anti")
    agg = kept.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("clean_text"),
    )
    return (
        base.select("_id", F.size("_w").cast("long").alias("n_tokens"))
        .join(agg, on="_id", how="left")
        .select(
            F.col("_id").alias(id_col),
            "n_tokens",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


def dedup_spans_sql(
    table: str,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> str:
    """DuckDB oracle for dedup_spans_df (same tokenization + md5 grams)."""
    h = md5_int_sql(f"array_to_string(words[i:i+{k - 1}], chr(32))")
    return f"""
WITH w AS (
  SELECT {id_col} AS id,
         list_filter(string_split_regex({text_col}, '\\s+'), x -> x <> '') AS words
  FROM {table}
), ex AS (
  SELECT id, i - 1 AS start, {h} AS h
  FROM (SELECT id, words,
               unnest(range(1, greatest(len(words) - {k - 1}, 0) + 1)) AS i
        FROM w)
), dup AS (
  SELECT h FROM ex GROUP BY h HAVING count(*) >= {min_count}
), cov AS (
  SELECT DISTINCT id, start + unnest(range(0, {k})) AS pos
  FROM ex JOIN dup USING (h)
), toks AS (
  SELECT id, i - 1 AS pos, words[i] AS tok
  FROM (SELECT id, words, unnest(range(1, len(words) + 1)) AS i FROM w)
), kept AS (
  SELECT t.id, t.pos, t.tok FROM toks t
  ANTI JOIN cov c ON t.id = c.id AND t.pos = c.pos
), agg AS (
  SELECT id, count(*) AS n_kept, string_agg(tok, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY id
)
SELECT w.id AS {id_col},
       CAST(len(w.words) AS BIGINT) AS n_tokens,
       CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(len(w.words) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
       coalesce(a.clean_text, '') AS clean_text
FROM w LEFT JOIN agg a ON w.id = a.id
"""


# --------------------------------------------------------------------------
# PII scrubbing / token chunking
# --------------------------------------------------------------------------

# Public Dolma/CCNet-style patterns, restricted to syntax with identical
# semantics under Java regex (Spark) and RE2 (DuckDB): no lookaround.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "|||EMAIL|||"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "|||IP|||"),
    ("phone", r"\+?\d{1,3}[-. ]\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}", "|||PHONE|||"),
)


def pii_scrub_df(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII redaction (the public Dolma/CCNet pipeline stage): emails, IPv4
    addresses and phone numbers are counted and replaced with typed masks,
    applied in the fixed order email -> ipv4 -> phone (each pass sees the
    previous pass's masks, so counts are disjoint).  Pure projection — one
    scan, no shuffle at any scale; DuckDB twin in pii_scrub_sql."""
    t = F.col(text_col)
    out_cols: list[Column] = [F.col(id_col)]
    clean = t
    for name, pat, mask in PII_PATTERNS:
        out_cols.append(F.regexp_count(clean, F.lit(pat)).cast("long").alias(f"n_{name}"))
        clean = F.regexp_replace(clean, pat, mask)
    out_cols.append(clean.alias("clean_text"))
    return docs.select(*out_cols)


def pii_scrub_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB oracle for pii_scrub_df (same patterns, same pass order)."""
    counts, clean = [], text_col
    for name, pat, mask in PII_PATTERNS:
        counts.append(
            f"CAST(len(regexp_extract_all({clean}, '{pat}')) AS BIGINT) AS n_{name}"
        )
        clean = f"regexp_replace({clean}, '{pat}', '{mask}', 'g')"
    return (
        f"SELECT {id_col}, {', '.join(counts)}, {clean} AS clean_text FROM {table}"
    )


def chunk_tokens_df(
    docs: DataFrame,
    size: int = 512,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document's token stream into training windows of `size`
    tokens stepping by `stride` (= size when None: disjoint; < size:
    overlapping).  The final partial window is kept (sequence packing pads
    downstream).  Explode-only plan — no shuffle; rows are
    (id, chunk_id, n_tokens, chunk_text) with chunk_id = 0-based window
    ordinal, so (id, chunk_id) is a deterministic global key."""
    stride = size if stride is None else stride
    if stride < 1 or size < 1:
        raise ValueError("size and stride must be >= 1")
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit(""))
    base = docs.select(F.col(id_col).alias("_id"), words.alias("_w"))
    m = F.size(F.col("_w"))
    # number of windows: 1 + ceil(max(m - size, 0) / stride), 0 when m == 0
    n_win = F.when(
        m > 0,
        F.lit(1)
        + F.ceil((F.greatest(m - size, F.lit(0))).cast("double") / stride).cast("int"),
    ).otherwise(F.lit(0))
    chunks = F.when(
        n_win > 0,
        F.transform(
            F.sequence(F.lit(0), n_win - 1),
            lambda i: F.struct(
                i.cast("long").alias("chunk_id"),
                F.size(F.slice(F.col("_w"), i * stride + 1, size))
                .cast("long")
                .alias("n_tokens"),
                F.concat_ws(" ", F.slice(F.col("_w"), i * stride + 1, size)).alias(
                    "chunk_text"
                ),
            ),
        ),
    ).otherwise(
        F.array().cast("array<struct<chunk_id:bigint,n_tokens:bigint,chunk_text:string>>")
    )
    return base.select(
        F.col("_id").alias(id_col), F.explode(chunks).alias("c")
    ).select(id_col, "c.chunk_id", "c.n_tokens", "c.chunk_text")


def chunk_tokens_sql(
    table: str,
    size: int = 512,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB oracle for chunk_tokens_df."""
    stride = size if stride is None else stride
    return f"""
WITH w AS (
  SELECT {id_col},
         list_filter(string_split_regex({text_col}, '\\s+'), x -> x <> '') AS words
  FROM {table}
), nw AS (
  SELECT {id_col}, words,
         CASE WHEN len(words) > 0
              THEN 1 + CAST(ceil(greatest(len(words) - {size}, 0)::DOUBLE / {stride}) AS INT)
              ELSE 0 END AS n_win
  FROM w
)
SELECT {id_col},
       CAST(i AS BIGINT) AS chunk_id,
       CAST(len(words[i * {stride} + 1 : i * {stride} + {size}]) AS BIGINT) AS n_tokens,
       array_to_string(words[i * {stride} + 1 : i * {stride} + {size}], ' ') AS chunk_text
FROM (SELECT {id_col}, words, unnest(range(0, n_win)) AS i FROM nw)
"""


def domain_cap_df(
    df: DataFrame,
    domain_col: str,
    cap: int,
    key_col: str,
    seed: int = 42,
    prefilter: bool = False,
    slack: float = 4.0,
) -> DataFrame:
    """Per-domain document cap (domain balancing): keep at most `cap` rows
    per domain, chosen deterministically by md5(seed || key) rank.

    Exact form: row_number over (partitionBy domain, orderBy hash, key) —
    one shuffle.  A single hot domain serializes into one task's sort, so
    with ``prefilter=True`` (the 100-TB path) a hash-threshold pass first
    discards rows that cannot be in the winning ``cap`` ranks: per-domain
    counts (broadcast — the domain dimension is small by definition),
    keep hash < cap/count * slack * 2^60.  The survivor set is verified to
    still hold >= cap rows for every capped domain (the threshold is
    doubled and re-checked, up to 3 times) so the final window is EXACTLY
    the unfiltered answer, computed over a bounded input.
    """
    from pyspark.sql import Window

    h = md5_int(F.concat_ws("\x1f", F.lit(str(seed)), F.col(key_col)))

    def _exact(frame: DataFrame) -> DataFrame:
        w = Window.partitionBy(domain_col).orderBy(h, F.col(key_col))
        return (
            frame.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= cap)
            .drop("_rn")
        )

    if not prefilter:
        return _exact(df)

    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("_dn"))
    cur = float(slack)
    for _ in range(3):
        frac = F.least(F.lit(1.0), F.lit(cap) * cur / F.col("_dn"))
        thr = (frac * _HASH_SPACE).cast("long")
        survivors = df.join(F.broadcast(counts), on=domain_col).where(
            (F.col("_dn") <= cap) | (h < thr)
        )
        # exactness check: every domain with more rows than cap must keep
        # >= cap survivors, else the winning ranks might have been cut.
        # Anchor on `counts` (LEFT join) so a domain whose rows ALL failed
        # the threshold — zero survivor rows — is still visible as short.
        surv_counts = survivors.groupBy(domain_col).agg(
            F.count(F.lit(1)).alias("_sn")
        )
        short = (
            counts.where(F.col("_dn") > cap)
            .join(surv_counts, on=domain_col, how="left")
            .where(F.coalesce(F.col("_sn"), F.lit(0)) < cap)
            .limit(1)
            .count()
        )
        if short == 0:
            return _exact(survivors.drop("_dn"))
        cur *= 2.0
    # pathological hash clustering: fall back to the exact full window
    return _exact(df)


# --------------------------------------------------------------------------
# Perplexity-style quality scoring (CCNet pipeline shape)
# --------------------------------------------------------------------------


def unigram_logprob_df(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    reference: DataFrame | None = None,
    ref_text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """Perplexity-style quality score (the CCNet pipeline stage, Wenzek et
    al. 2019): per-document mean negative log-probability of its words
    under an add-alpha-smoothed UNIGRAM model.  CCNet ranks by KenLM
    5-gram perplexity, which needs external model files; this re-expresses
    the same pipeline shape — train model, score docs, rank — with the
    model TRAINED IN-QUERY: from ``reference`` when given (the
    train-on-Wikipedia shape) else from the scored corpus itself.

    p(w) = (count(w) + alpha) / (N + alpha * (V + 1)); words absent from
    the reference take count 0 (the +1 in the vocabulary term is the
    unseen-word mass).  Returns (id, n_scored, mean_neg_logprob).

    Plan: one groupBy builds the frequency table; totals attach via a
    broadcast single-row cross join (no collect); scoring is an equi-join
    from exploded words to the table.  Scale notes: the frequency table
    is Zipf-headed — AQE's skew-join split handles the hot stopword keys,
    and the table itself broadcasts while it fits (vocabulary grows
    sub-linearly in corpus size).
    """
    model_src = reference if reference is not None else docs
    mcol = ref_text_col if reference is not None else text_col
    freq = (
        model_src.select(F.explode(_words(F.col(mcol))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = freq.agg(
        F.sum("c").alias("_N"), F.count(F.lit(1)).alias("_V")
    )
    ex = docs.select(F.col(id_col).alias("_id"), F.explode_outer(_words(F.col(text_col))).alias("w"))
    scored = (
        ex.join(freq, on="w", how="left")
        .crossJoin(F.broadcast(totals))
        .select(
            "_id",
            F.when(
                F.col("w").isNotNull(),
                -F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + F.lit(float(alpha)))
                    / (F.col("_N") + F.lit(float(alpha)) * (F.col("_V") + 1))
                ),
            ).alias("nlp"),
        )
    )
    return (
        scored.groupBy("_id")
        .agg(
            F.count("nlp").alias("n_scored"),
            F.coalesce(F.avg("nlp"), F.lit(0.0)).alias("mean_neg_logprob"),
        )
        .withColumnRenamed("_id", id_col)
    )


def ccnet_buckets(
    scores: DataFrame, score_col: str = "mean_neg_logprob", rel_err: float = 0.001
) -> DataFrame:
    """CCNet's head/middle/tail split: docs ranked by LM score into thirds.
    Thresholds come from percentile_approx at 1/3 and 2/3 (a bounded-error
    sketch — the exact split would need a global sort); the two scalars
    attach via a broadcast cross join, the bucketing itself is a pure
    projection."""
    thr = scores.agg(
        F.percentile_approx(score_col, [1.0 / 3.0, 2.0 / 3.0], int(1.0 / rel_err)).alias("_t")
    ).select(F.col("_t")[0].alias("_t1"), F.col("_t")[1].alias("_t2"))
    return scores.crossJoin(F.broadcast(thr)).withColumn(
        "bucket",
        F.when(F.col(score_col) <= F.col("_t1"), F.lit("head"))
        .when(F.col(score_col) <= F.col("_t2"), F.lit("middle"))
        .otherwise(F.lit("tail")),
    ).drop("_t1", "_t2")


def pack_sequences(
    docs: DataFrame,
    size: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sequence packing with document concatenation (the GPT-style training
    prep): documents in deterministic ``id`` order form one global token
    stream, cut into fixed ``size``-token sequences; documents crossing a
    boundary are split across the adjacent sequences (no padding waste —
    every sequence except the last is exactly full).

    Output: one row per (seq_id, doc) overlap —
    (seq_id, id, offset_in_seq, n_tokens, part_text); a trainer reassembles
    a sequence by concatenating its parts ordered by offset_in_seq.

    Plan: TWO passes, no global sort.  Pass 1 derives contiguous id-range
    buckets (quantile-sketch split points of the id column, collected ONCE
    and embedded as literals — both passes therefore share one bucket
    mapping, and the output is bucketing-INVARIANT: any contiguous split
    yields the same global stream) and one tiny per-bucket token-total agg
    that the driver folds into cumulative bucket offsets (bucket-count
    rows).  Pass 2 runs the running sum as a PER-BUCKET window (parallel
    across buckets) plus the broadcast bucket offset — identical semantics
    to a single global window, with wall-clock bounded by the largest
    bucket instead of the whole corpus.  Non-numeric id columns fall back
    to the single-task global window (documented; the engine's fixtures
    and the driver tables use integer ids).
    """
    from pyspark.sql import Window

    if size < 1:
        raise ValueError("size must be >= 1")
    base = docs.select(
        F.col(id_col).alias("_id"),
        F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit("")).alias(
            "_w"
        ),
    ).withColumn("_n", F.size("_w").cast("long"))
    nz = base.where(F.col("_n") > 0)
    id_type = dict(docs.dtypes)[id_col]
    numeric_id = id_type in ("tinyint", "smallint", "int", "bigint", "float", "double", "decimal")
    nbuckets = docs.sparkSession.sparkContext.defaultParallelism
    if numeric_id and nbuckets > 1:
        # materialize the tokenized frame ONCE: the split-points agg, the
        # per-bucket totals agg, and the output job would otherwise each
        # re-run the tokenization (the dominant cost of pass 1)
        nz = nz.localCheckpoint(eager=True)
        # deterministic contiguous buckets: quantile split points of the id
        # values themselves (balance is best-effort, correctness never
        # depends on it — any contiguous split yields the same stream)
        splits = nz.agg(
            F.percentile_approx(
                "_id", [i / nbuckets for i in range(1, nbuckets)], 10000
            ).alias("_s")
        ).collect()[0]._s or []
        # NULL ids sort first (the global window's nulls-first order):
        # pin them to bucket -1 rather than letting NULL > split poison
        # the bucket expression and the driver-side cumulative fold
        bucket = F.lit(0)
        for s in splits:
            bucket = bucket + (F.col("_id") > F.lit(s)).cast("int")
        nz = nz.withColumn(
            "_b", F.when(F.col("_id").isNull(), F.lit(-1)).otherwise(bucket)
        )
        wp = (
            Window.partitionBy("_b").orderBy("_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        totals = {
            r._b: r.tot
            for r in nz.groupBy("_b").agg(F.sum("_n").alias("tot")).collect()
        }
        acc = 0
        offs = []
        for b in sorted(totals):
            offs.append((b, acc))
            acc += totals[b]
        off_map = F.create_map(
            *[F.lit(v) for pair in offs for v in pair]
        ) if offs else F.create_map()
        pos = nz.withColumn(
            "_end", F.sum("_n").over(wp) + off_map[F.col("_b")]
        ).withColumn("_start", F.col("_end") - F.col("_n"))
    else:
        w = Window.orderBy("_id").rowsBetween(Window.unboundedPreceding, 0)
        pos = nz.withColumn("_end", F.sum("_n").over(w)).withColumn(
            "_start", F.col("_end") - F.col("_n")
        )
    first_seq = F.floor(F.col("_start") / size)
    last_seq = F.floor((F.col("_end") - 1) / size)
    ex = pos.select(
        "_id",
        "_w",
        "_n",
        "_start",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    lo = F.greatest(F.col("seq_id") * size, F.col("_start"))
    hi = F.least((F.col("seq_id") + 1) * size, F.col("_start") + F.col("_n"))
    a = (lo - F.col("_start")).cast("int")  # 0-based offset within the doc
    ln = (hi - lo).cast("int")
    return ex.select(
        F.col("seq_id"),
        F.col("_id").alias(id_col),
        (lo - F.col("seq_id") * size).cast("long").alias("offset_in_seq"),
        ln.cast("long").alias("n_tokens"),
        F.concat_ws(" ", F.slice(F.col("_w"), a + 1, ln)).alias("part_text"),
    )


def pack_sequences_sql(
    table: str, size: int = 2048, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB oracle for pack_sequences (same id-ordered token stream)."""
    return f"""
WITH w AS (
  SELECT {id_col} AS id,
         list_filter(string_split_regex({text_col}, '\\s+'), x -> x <> '') AS words
  FROM {table}
), pos AS (
  SELECT id, words, len(words)::BIGINT AS n,
         sum(len(words)) OVER (ORDER BY id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS e
  FROM w
), nz AS (
  SELECT id, words, n, e - n AS s FROM pos WHERE n > 0
), ex AS (
  SELECT id, words, n, s,
         unnest(range(s // {size}, (s + n - 1) // {size} + 1)) AS seq_id
  FROM nz
)
SELECT seq_id,
       id AS {id_col},
       (greatest(seq_id * {size}, s) - seq_id * {size})::BIGINT AS offset_in_seq,
       (least((seq_id + 1) * {size}, s + n) - greatest(seq_id * {size}, s))::BIGINT AS n_tokens,
       array_to_string(
         words[(greatest(seq_id * {size}, s) - s + 1) :
               (least((seq_id + 1) * {size}, s + n) - s)], ' ') AS part_text
FROM ex
"""
