"""Similarity search over embedding columns (``array<float>``):
brute-force cosine top-k (exact baseline) and sign-LSH bucketed ANN
(the scale path) — everything in JVM higher-order functions; no Python
UDFs in the hot path.

Scale notes
-----------
* Brute force is a broadcast of the query vector + one codegen'd
  ``aggregate(zip_with(...))`` pass over n rows, then
  TakeOrderedAndProject — embarrassingly parallel, no shuffle.
* Sign-LSH: bucket = sign-bit signature of the first ``nbits``
  dimensions. Bucketing is a narrow map; ANN queries prune to one
  bucket (candidate set ~ n / 2^nbits). Hamming-radius probing extends
  recall by scanning neighbor buckets. For production-recall ANN an IVF
  (k-means coarse quantizer) drops in the same shape: assign → bucket
  column → partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_to_query(embeddings: DataFrame, query_vec: list[float],
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """(id, cosine) of every row vs a literal query vector."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    qn = sum(float(v) * float(v) for v in query_vec) ** 0.5
    return embeddings.select(
        F.col(id_col).cast("long").alias(id_col),
        (_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))).alias("cosine"),
    )


def brute_force_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     exclude_id: int | None = None) -> DataFrame:
    """Exact cosine top-k; ties broken by id asc for determinism."""
    sims = cosine_to_query(embeddings, query_vec, id_col, vec_col)
    if exclude_id is not None:
        sims = sims.filter(F.col(id_col) != exclude_id)
    return sims.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def sign_lsh_bucket(vec_col, nbits: int = 16) -> F.Column:
    """Sign-bit LSH bucket id: Σ_{i<nbits} (v_i > 0) << i."""
    return F.aggregate(
        F.zip_with(
            F.slice(vec_col, 1, nbits),
            F.sequence(F.lit(0), F.lit(nbits - 1)),
            # 2^i via pow — exact in float64 for i < 53; avoids
            # shiftleft's int-literal-only python signature
            lambda v, i: F.when(v > 0, F.pow(F.lit(2.0), i)).otherwise(F.lit(0.0)),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ).cast("long")


def with_lsh_buckets(embeddings: DataFrame, nbits: int = 16,
                     vec_col: str = "embedding") -> DataFrame:
    return embeddings.withColumn("bucket", sign_lsh_bucket(F.col(vec_col), nbits))


def ann_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
             nbits: int = 16, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Bucketed ANN: scan only rows whose sign-LSH bucket equals the
    query's (partition-prunable when the table is written bucketed)."""
    qbucket = 0
    for i, v in enumerate(query_vec[:nbits]):
        if float(v) > 0:
            qbucket |= 1 << i
    cand = with_lsh_buckets(embeddings, nbits, vec_col).filter(
        F.col("bucket") == F.lit(qbucket)
    )
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)
