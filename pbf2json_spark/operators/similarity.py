"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the exactness baseline.  Queries are a
  small broadcast side; the score is a JVM-side aggregate over
  zip_with products (whole-stage codegen, no Python).
- LSH-bucketed variant (random-hyperplane signs): the 100 TB scale
  path — candidates only from matching sign-buckets, then exact
  re-rank.  Hyperplanes are deterministic (Philox) so results are
  reproducible; recall is tested against the brute-force baseline.
- embedding-cosine near-duplicates: pairs with cosine >= tau, blocked
  by label (or LSH bucket) to stay sub-quadratic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_col(a, b):
    """Cosine similarity between two array<float/double> columns,
    computed in double, JVM-side."""
    ad = F.transform(a, lambda v: v.cast("double"))
    bd = F.transform(b, lambda v: v.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def ann_brute_force(embeddings: DataFrame, queries: DataFrame, k: int,
                    id_col: str = "vec_id") -> DataFrame:
    """(query_id, vec_id, cos, rank): exact top-k by cosine.  queries:
    (query_id, q_embedding).  Broadcast the queries; scan the corpus
    once."""
    q = queries.select("query_id", F.col("q_embedding"))
    cand = embeddings.crossJoin(F.broadcast(q))
    scored = cand.select(
        "query_id", id_col,
        F.round(cosine_col(F.col("embedding"), F.col("q_embedding")), 9)
         .alias("cos"))
    win = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k))


# ---------------------------------------------------------------------------
# LSH-bucketed ANN
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, n_planes: int, seed: int = 1234) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(key=np.uint64(seed)))
    return rng.normal(size=(n_planes, dim))


def make_bucket_udf(dim: int, n_planes: int = 12, seed: int = 1234):
    planes = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf(T.IntegerType())
    def bucket(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy())            # (batch, dim)
        signs = (m @ planes.T) > 0              # (batch, planes)
        weights = (1 << np.arange(n_planes))
        return pd.Series((signs @ weights).astype(np.int32))

    return bucket


def ann_lsh(embeddings: DataFrame, queries: DataFrame, k: int,
            dim: int, n_planes: int = 12, n_probe_flips: int = 1,
            id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane-sign
    bucket (plus buckets within `n_probe_flips` bit flips — multiprobe),
    re-ranked exactly.  Trades recall for a corpus-partition-local scan;
    at 10^12 rows bucket the table ON this key so the probe is a
    partition-pruned read."""
    bucket = make_bucket_udf(dim, n_planes)
    emb_b = embeddings.withColumn("bucket", bucket("embedding"))

    probe_rows = []
    flips = [0] + ([1 << i for i in range(n_planes)] if n_probe_flips >= 1 else [])
    q = queries.withColumn("q_bucket", bucket(F.col("q_embedding")))
    q = q.withColumn("probe", F.explode(F.array(*[F.lit(f) for f in flips])))
    q = q.withColumn("bucket", F.col("q_bucket").bitwiseXOR(F.col("probe")))

    cand = emb_b.join(F.broadcast(q.select("query_id", "q_embedding", "bucket")),
                      "bucket")
    scored = cand.select(
        "query_id", id_col,
        F.round(cosine_col(F.col("embedding"), F.col("q_embedding")), 9)
         .alias("cos")).distinct()
    win = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= k))


def embedding_near_dup_pairs(embeddings: DataFrame, tau: float = 0.95,
                             id_col: str = "vec_id",
                             block_col: str = "label") -> DataFrame:
    """(id_a, id_b, cos) pairs with cosine >= tau, quadratic only inside
    `block_col` blocks."""
    a = embeddings.select(F.col(id_col).alias("id_a"),
                          F.col(block_col).alias("blk"),
                          F.col("embedding").alias("emb_a"))
    b = embeddings.select(F.col(id_col).alias("id_b"),
                          F.col(block_col).alias("blk_b"),
                          F.col("embedding").alias("emb_b"))
    pairs = a.join(b, (F.col("blk") == F.col("blk_b"))
                   & (F.col("id_a") < F.col("id_b")))
    return (pairs.select(
        "id_a", "id_b",
        F.round(cosine_col(F.col("emb_a"), F.col("emb_b")), 9).alias("cos"))
        .filter(F.col("cos") >= tau))
