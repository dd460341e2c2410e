"""Skew-handling operators: salted aggregation and salted broadcast-free
joins.

At 100 TB a handful of hot keys (one downtown trip_id with millions of
pings, one power user_id) can pin a whole stage on one task.  Two
defenses, complementary to the AQE skew-join splitting already enabled in
session.TUNING:

- ``salted_agg``: two-phase aggregation.  Phase 1 groups by
  (key, salt) — the hot key's rows spread over ``buckets`` tasks and
  map-side partial aggregation bounds what each shuffles.  Phase 2
  re-aggregates by key alone over ``buckets`` rows per key.  Only
  decomposable aggregates (sum/count/min/max) are accepted; avg is
  derived as sum/count.
- ``salted_join``: fact⨝dim equi-join where the dim is too big to
  broadcast but some fact keys are hot: the fact side gets a random salt
  in [0, buckets), the dim side is replicated ``buckets`` times, and the
  join runs on (key, salt) — hot fact keys spread across buckets at the
  cost of dim replication (dim_rows x buckets shuffled, chosen only when
  dim is mid-sized).

The salt uses ``rand(seed)`` — per-row nondeterminism across retries is
safe because phase 2 (or the join) is salt-agnostic: any salt assignment
produces the same final result, verified in tests against unsalted plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: agg name -> (phase-1 fn, phase-2 fn) — decomposable pairs only.
_DECOMPOSABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def with_salt(df: DataFrame, buckets: int = 16, seed: int = 42,
              out_col: str = "_salt") -> DataFrame:
    return df.withColumn(
        out_col, F.floor(F.rand(seed) * buckets).cast("int")
    )


def salted_agg(df: DataFrame, keys: list[str],
               aggs: dict[str, tuple[str, str]],
               buckets: int = 16) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (agg_name, input_col), e.g.
    ``{"total": ("sum", "value"), "n": ("count", "value")}``.
    """
    for out, (name, _) in aggs.items():
        if name not in _DECOMPOSABLE:
            raise ValueError(f"{out}: '{name}' is not decomposable; "
                             f"supported: {sorted(_DECOMPOSABLE)}")
    salted = with_salt(df, buckets)
    phase1 = salted.groupBy(*keys, "_salt").agg(*[
        _DECOMPOSABLE[name][0](col).alias(f"_p_{out}")
        for out, (name, col) in aggs.items()
    ])
    return phase1.groupBy(*keys).agg(*[
        _DECOMPOSABLE[name][1](f"_p_{out}").alias(out)
        for out, (name, _) in aggs.items()
    ])


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                buckets: int = 8, how: str = "inner") -> DataFrame:
    """Skew-safe fact⨝dim equi-join on ``key``: fact rows get a random
    salt, dim rows are exploded into every salt bucket, and the join key
    becomes (key, salt) so one hot key spans ``buckets`` tasks."""
    f = with_salt(fact, buckets)
    d = dim.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(buckets)])),
    )
    out = f.join(d, [key, "_salt"], how)
    return out.drop("_salt")
