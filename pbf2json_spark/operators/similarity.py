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

def _hyperplanes(dim: int, n_tables: int, n_planes: int,
                 seed: int = 1234) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(key=np.uint64(seed)))
    return rng.normal(size=(n_tables, n_planes, dim))


def make_buckets_udf(dim: int, n_tables: int = 8, n_planes: int = 6,
                     seed: int = 1234):
    """array<int> of one sign-bucket per hash table (multi-table LSH:
    independent tables recover the recall single-bucket sign hashing
    lacks on weakly-clustered embeddings)."""
    planes = _hyperplanes(dim, n_tables, n_planes, seed)
    weights = (1 << np.arange(n_planes))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def buckets(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy()).astype(np.float64)   # (batch, dim)
        signs = np.einsum("nd,lpd->nlp", m, planes) > 0   # (batch, L, P)
        b = (signs @ weights).astype(np.int32)            # (batch, L)
        return pd.Series(list(b))

    return buckets


def ann_lsh(embeddings: DataFrame, queries: DataFrame, k: int,
            dim: int, n_tables: int = 8, n_planes: int = 6,
            id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: candidates share the query's sign-bucket in at
    least one of `n_tables` hyperplane tables, re-ranked exactly.  At
    10^12 rows, bucket/partition the corpus ON (table, bucket) so each
    probe is a partition-pruned read instead of a full scan; recall/cost
    is tuned by (n_tables, n_planes) — defaults measured at ~0.5 recall
    touching ~13% of a weakly-clustered corpus."""
    buckets = make_buckets_udf(dim, n_tables, n_planes)
    emb_b = embeddings.select(
        id_col, "embedding",
        F.posexplode(buckets("embedding")).alias("tbl", "bucket"))
    q = queries.select(
        "query_id", "q_embedding",
        F.posexplode(buckets(F.col("q_embedding"))).alias("tbl", "bucket"))

    cand = emb_b.join(F.broadcast(q), ["tbl", "bucket"]) \
                .select("query_id", id_col, "embedding", "q_embedding") \
                .dropDuplicates(["query_id", id_col])
    scored = cand.select(
        "query_id", id_col,
        F.round(cosine_col(F.col("embedding"), F.col("q_embedding")), 9)
         .alias("cos"))
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
