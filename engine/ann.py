"""Approximate nearest neighbors over embedding columns (mission brief):
IVF (inverted-file) search as the scale path beside the LSH variant.

Design: a small centroid table (the coarse quantizer) is equi-joined
against the embedding table; every vector gets its nearest centroid id
(the inverted list key), and a query probes only its ``nprobe`` nearest
lists before the exact cosine top-k.  All distance arithmetic is JVM-side
``zip_with``/``aggregate`` folds (whole-stage codegen, no Python in the
hot path) with sequential element order, so a SQL transcription via
``list_dot_product`` is bit-identical — the same device the brute-force
``embedding_topk`` baseline uses.

At cluster scale the assignment is one broadcast join over the (tiny)
centroid table, the inverted lists are a partitioned column (`cluster`),
and a probe touches nprobe/K of the data — the IVF speedup.  Centroid
TRAINING (k-means) is orthogonal to the index structure; callers pass any
deterministic centroid table (e.g. sampled seed vectors), which keeps the
whole pipeline reproducible across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm2(a):
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ivf_assign(emb: DataFrame, centroids: DataFrame,
               vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Nearest-centroid assignment: (id_col, cluster).  L2² via the
    dot-product identity |e|² − 2e·c + |c|²; ties break to the smaller
    centroid id.  One broadcast join + window — no shuffle of the
    embedding payload."""
    c = centroids.select(F.col("cid"), F.col("cvec"))
    l2 = _norm2(F.col(vec_col)) - 2.0 * _dot(F.col(vec_col), F.col("cvec")) + _norm2(F.col("cvec"))
    w = Window.partitionBy(id_col).orderBy(F.col("_l2").asc(), F.col("cid").asc())
    return (
        emb.join(F.broadcast(c))
        .select(id_col, vec_col, F.col("cid"), l2.alias("_l2"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, F.col("cid").alias("cluster"))
    )


def ivf_topk(
    emb: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF cosine top-k: probe the query's ``nprobe`` nearest inverted
    lists, exact cosine rank within.  queries: (qid, qv).
    Output (qid, neighbor, rank).

    ``exclude_self`` drops candidates with ``id == qid`` — correct when
    queries are drawn from the embedding table (qid shares its id space);
    pass False for external query vectors whose ids are unrelated."""
    assigned = ivf_assign(emb, centroids, vec_col, id_col)
    inv = emb.join(assigned, on=id_col)

    c = centroids.select("cid", "cvec")
    ql2 = _norm2(F.col("qv")) - 2.0 * _dot(F.col("qv"), F.col("cvec")) + _norm2(F.col("cvec"))
    wq = Window.partitionBy("qid").orderBy(F.col("_l2").asc(), F.col("cid").asc())
    probes = (
        queries.join(F.broadcast(c))
        .select("qid", "qv", F.col("cid"), ql2.alias("_l2"))
        .withColumn("_rn", F.row_number().over(wq))
        .where(F.col("_rn") <= nprobe)
        .select("qid", "qv", F.col("cid").alias("cluster"))
    )
    cos = _dot(F.col("qv"), F.col(vec_col)) / (
        F.sqrt(_norm2(F.col("qv"))) * F.sqrt(_norm2(F.col(vec_col)))
    )
    cand = probes.join(inv, on="cluster")
    if exclude_self:
        cand = cand.where(F.col(id_col) != F.col("qid"))
    cand = cand.select("qid", F.col(id_col), cos.alias("cos"))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", F.col(id_col).alias("neighbor"), F.col("rank").cast("int").alias("rank"))
    )
