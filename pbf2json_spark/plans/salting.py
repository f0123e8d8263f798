"""Explicit hot-key salting for shuffle hash joins (north rule:
"salted broadcast-vs-shuffle hash join of member references against a
distributed node store").

AQE's skew-join split (plans/session.py) repairs skew at SORT-MERGE
join time by splitting oversized partitions, but it cannot help when
(a) the join must be a shuffled hash join (build side too big to
broadcast, sort undesirable), or (b) a single KEY — not just a
partition — is hot: every probe row for that key still lands on one
task.  Explicit salting fixes the single-hot-key case:

- probe rows for hot keys get a salt in [0, n_salts) derived from
  STABLE ROW CONTENT (xxhash64 of the row's hashable columns — never
  from monotonically_increasing_id or an RNG: a partition-layout- or
  retry-dependent salt is a shuffle-key correctness bug of the
  SPARK-23207 class, because a re-executed map task could route the
  same row to a different reducer than the committed shuffle files);
- build rows for hot keys are replicated across ALL salts;
- the join key becomes (key, salt), spreading each hot key over
  n_salts tasks at the cost of replicating only the HOT build rows.

Cold keys keep salt 0 on both sides, so the replication factor is
bounded by |hot| * n_salts, not |build| * n_salts.

Only inner and left joins are supported: a right/full-outer join
would emit one null-extended row PER SALT REPLICA of every unmatched
hot build row (n_salts duplicates), which is not the unsalted join's
output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def hot_keys(df: DataFrame, key: str, threshold: int,
             sample_fraction: float | None = None) -> DataFrame:
    """Keys whose probe-side row count exceeds `threshold`.  At scale
    pass a sample_fraction: the count runs on the sample and the
    threshold is scaled down accordingly (an over-approximation of the
    hot set only costs a little extra build replication)."""
    src = df
    eff = threshold
    if sample_fraction and sample_fraction < 1.0:
        src = df.sample(fraction=sample_fraction, seed=7)
        eff = max(1, int(threshold * sample_fraction))
    return (src.groupBy(key).count()
            .filter(F.col("count") >= eff)
            .select(key))


MAX_HOT_KEYS = 100_000


def salted_equijoin(probe: DataFrame, build: DataFrame, key: str,
                    n_salts: int = 16,
                    hot: DataFrame | list | None = None,
                    hot_threshold: int = 50_000,
                    sample_fraction: float | None = None,
                    how: str = "inner",
                    salt_cols: list | None = None) -> DataFrame:
    """Equi-join `probe` with `build` on `key` with the hot keys salted
    across `n_salts` sub-keys.  Column sets (minus `key`) must be
    disjoint.  Output columns = probe columns + build columns (key
    once), exactly like probe.join(build, key, how) for how in
    {inner, left} (other join types raise — see module docstring).

    The probe salt is pmod(xxhash64(<salt_cols>), n_salts): a pure
    function of row CONTENT, so speculative/retried map tasks assign
    the identical salt (a layout-dependent salt loses or duplicates
    rows on retry).  salt_cols defaults to every probe column with a
    hashable type (map columns are skipped — Spark's hash functions
    reject MapType); pass an explicit unique row-id column for the
    best spread when probe rows can be wholly duplicated.

    The hot set is MATERIALIZED once (driver-side list — hot keys are
    few by definition, and leaving them as a lazy plan re-runs the
    detection scan inside every downstream branch) and tested with a
    literal set predicate, so salting adds zero extra joins."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_equijoin supports inner/left joins only, got {how!r}: "
            f"outer-build joins would emit n_salts duplicates of every "
            f"unmatched hot build row")
    if hot is None:
        hot = hot_keys(probe, key, hot_threshold, sample_fraction)
    if isinstance(hot, DataFrame):
        hot_list = [r[0] for r in hot.select(key).distinct().collect()]
    else:
        hot_list = list(hot)
    if not hot_list:
        return probe.join(build, key, how)
    assert len(hot_list) <= MAX_HOT_KEYS, (
        f"{len(hot_list)} hot keys — raise hot_threshold; a 'hot set' "
        f"this large means the distribution is not actually skewed")

    from pyspark.sql import types as T
    if salt_cols is None:
        salt_cols = [f.name for f in probe.schema.fields
                     if not isinstance(f.dataType, T.MapType)]
    if not salt_cols:
        raise ValueError("salted_equijoin: no hashable probe columns to "
                         "derive a deterministic salt from; pass salt_cols")
    is_hot = F.col(key).isin(hot_list)
    p = probe.withColumn(
        SALT_COL,
        F.when(is_hot,
               F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]),
                      F.lit(n_salts)).cast("int"))
         .otherwise(F.lit(0)))
    b = build.withColumn(
        SALT_COL,
        F.explode(F.when(is_hot, F.sequence(F.lit(0), F.lit(n_salts - 1)))
                   .otherwise(F.array(F.lit(0)))))
    return p.join(b, [key, SALT_COL], how).drop(SALT_COL)
