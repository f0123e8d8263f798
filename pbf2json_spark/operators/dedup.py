"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, and n-gram Jaccard — over `documents`.

Spark-first shapes:

- exact: one hash-groupBy (map-side partial agg).
- MinHash+LSH: shingle -> K permutation min-hashes computed as JVM
  array expressions (no Python), band signatures exploded, candidate
  pairs from a self-equi-join on (band, signature), then exact Jaccard
  verification on the candidates only.  The constants are module-level
  so the SQL oracle reproduces the identical pipeline.
- SimHash: 64-bit sign-of-sum signature in a vectorized pandas UDF,
  near-dup candidates from banding the signature into 16-bit chunks
  (hamming<=3 pigeonhole), verified by exact hamming distance.
- n-gram Jaccard: exact pairwise within a blocking key (length bucket
  x lang) — the quadratic fallback, bounded by the block sizes.

At 100 TB the LSH path is the only quadratic-free variant; banding
keys are salted-friendly (band index is part of the join key, so hot
signatures spread across B bands).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# MinHash constants — shared verbatim with the SQL oracle
MINHASH_PRIME = 1073741789          # ~2^30, keeps a*h+b < 2^63
MINHASH_K = 16
# 4 bands x 4 rows: candidate probability j^4 per band — the r=2 variant
# drowned in noise pairs on corpora whose baseline pairwise jaccard is
# ~0.02 (40k false candidates at 5k docs); r=4 keeps the 50%-detection
# threshold at (1/4)^(1/4) ~ 0.71, i.e. a true near-dup finder
MINHASH_BANDS = 4
MINHASH_ROWS = MINHASH_K // MINHASH_BANDS
# deterministic (a, b) per permutation: splitmix-ish constants
MINHASH_A = [(2654435761 * (i + 1)) % MINHASH_PRIME for i in range(MINHASH_K)]
MINHASH_B = [(40503 * (i + 7) ** 2) % MINHASH_PRIME for i in range(MINHASH_K)]

SHINGLE_N = 3


def _tokens():
    return F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")


def _shingles():
    """Distinct token 3-gram strings."""
    toks = _tokens()
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (SHINGLE_N - 1), F.lit(1)))
    return F.array_distinct(F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, SHINGLE_N).cast("array<string>"))
    ))


def _shingle_hashes():
    """Portable shingle hash: md5 prefix -> bigint mod prime."""
    return F.transform(
        _shingles(),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10)
                   .cast("bigint") % MINHASH_PRIME,
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """(text_md5, rep_doc_id, n_dups): duplicate groups by exact content
    hash; representative = smallest doc_id."""
    return (docs.select(F.md5("text").alias("text_md5"), "doc_id")
            .groupBy("text_md5")
            .agg(F.min("doc_id").alias("rep_doc_id"),
                 F.count("*").alias("n_dups")))


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, mh_0..mh_{K-1}) minhash signature columns, all JVM-side."""
    out = docs.select("doc_id", _shingle_hashes().alias("sh"))

    def perm(a, b):
        # one-arg closure (default-arg lambdas trip pyspark's HOF arity)
        return lambda h: (h * a + b) % MINHASH_PRIME

    for i in range(MINHASH_K):
        out = out.withColumn(
            f"mh_{i}",
            F.array_min(F.transform("sh", perm(MINHASH_A[i], MINHASH_B[i]))))
    return out.drop("sh")


def minhash_lsh_pairs(docs: DataFrame, tau: float = 0.5) -> DataFrame:
    """(doc_a, doc_b, jaccard) candidate pairs from LSH banding, verified
    by exact shingle Jaccard >= tau.  doc_a < doc_b."""
    sig = minhash_signatures(docs)
    bands = []
    for b in range(MINHASH_BANDS):
        cols = [F.col(f"mh_{b * MINHASH_ROWS + r}") for r in range(MINHASH_ROWS)]
        bands.append(F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("_", *[c.cast("string") for c in cols])).alias("sig")))
    banded = sig.select(
        "doc_id", F.explode(F.array(*bands)).alias("bs")
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.sig") == F.col("b.sig"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
             .distinct())

    sh = docs.select("doc_id", _shingles().alias("sh"))
    j = (cand
         .join(sh.select(F.col("doc_id").alias("doc_a"),
                         F.col("sh").alias("sh_a")), "doc_a")
         .join(sh.select(F.col("doc_id").alias("doc_b"),
                         F.col("sh").alias("sh_b")), "doc_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (j.select("doc_a", "doc_b",
                     F.round(inter / union, 9).alias("jaccard"))
             .filter(F.col("jaccard") >= tau))


def ngram_jaccard_pairs(docs: DataFrame, tau: float = 0.3,
                        length_bucket: int = 100) -> DataFrame:
    """Exact pairwise n-gram Jaccard within (lang, length-bucket) blocks
    — quadratic inside blocks only.  (doc_a, doc_b, jaccard >= tau)."""
    base = docs.select(
        "doc_id", "lang",
        (F.col("n_chars") / length_bucket).cast("int").alias("lb"),
        _shingles().alias("sh"))
    a = base.select(F.col("doc_id").alias("doc_a"), "lang", "lb",
                    F.col("sh").alias("sh_a"))
    b = base.select(F.col("doc_id").alias("doc_b"),
                    F.col("lang").alias("lang_b"),
                    F.col("lb").alias("lb_b"), F.col("sh").alias("sh_b"))
    pairs = a.join(b, (F.col("lang") == F.col("lang_b"))
                   & (F.col("lb") == F.col("lb_b"))
                   & (F.col("doc_a") < F.col("doc_b")))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (pairs.select("doc_a", "doc_b",
                         F.round(inter / union, 9).alias("jaccard"))
            .filter(F.col("jaccard") >= tau))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

@F.pandas_udf(T.LongType())
def _simhash64(tokens: pd.Series) -> pd.Series:
    """64-bit SimHash over token multisets (vectorized numpy: one
    matmul-style popcount accumulation per batch)."""
    out = np.empty(len(tokens), dtype=np.int64)
    from ..functions.imagecodec import splitmix64
    for i, toks in enumerate(tokens):
        if toks is None or len(toks) == 0:
            out[i] = 0
            continue
        hs = splitmix64(np.array(
            [hash_str(t) for t in toks], dtype=np.uint64))
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        sig = np.uint64(0)
        for j in np.nonzero(votes > 0)[0]:
            sig |= np.uint64(1) << np.uint64(j)
        out[i] = np.int64(sig.astype(np.int64))
    return pd.Series(out)


def hash_str(s: str) -> int:
    """Deterministic 64-bit string hash (FNV-1a), process-independent."""
    h = 0xCBF29CE484222325
    for ch in s.encode("utf-8"):
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash_signatures(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", _simhash64(_tokens()).alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming, candidates
    from 4x16-bit chunk equality (pigeonhole: <=3 differing bits leave
    at least one chunk equal)."""
    sig = simhash_signatures(docs)
    chunks = sig.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"),
                     F.shiftright("simhash", 16 * c)
                      .bitwiseAND(F.lit(0xFFFF)).alias("val"))
            for c in range(4)])).alias("cv"),
    ).select("doc_id", "simhash",
             F.col("cv.chunk").alias("chunk"), F.col("cv.val").alias("val"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
                   & (F.col("a.val") == F.col("b.val"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"),
                     F.col("a.simhash").alias("sh_a"),
                     F.col("b.simhash").alias("sh_b"))
             .distinct())
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.select("doc_a", "doc_b", hamming.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))
