"""Scalar-function parity suites beyond the reference's §2.8 list —
array algebra, regular expressions, and math/bitwise — each checked
value-identical against DuckDB on the driver tables.

These extend fn_string_suite / fn_datetime_suite (plans/analytics.py):
the engine's answer to "can a user port arbitrary scalar expressions?"
Every expression is a built-in JVM codegen'd Column — no Python — so the
suites also pin that the scalar surface stays on the fast path.

Dialect notes are inline per suite; the rule (FIXTURES.md) is that the
Spark side and the oracle side must *name and round* identically so the
driver's sorted-column value hash is bit-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from busdata_pipeline_spark.plans.registry import query
from busdata_pipeline_spark.sources import table


@query(
    "fn_array_suite",
    # DuckDB list functions are 1-indexed like Spark's element_at/slice;
    # FLOAT list elements compare exactly (no arithmetic performed).
    # The slice output is projected element-wise (mid_1..mid_3) because
    # the driver's pandas-based canonicalizer cannot hash list cells —
    # scalar floats keep the comparison exact AND hashable.
    oracle="""
SELECT vec_id,
  CAST(len(embedding) AS INTEGER) AS n,
  embedding[1] AS first_elem,
  embedding[len(embedding)] AS last_elem,
  list_max(embedding) AS mx,
  list_min(embedding) AS mn,
  list_sort(embedding)[1] AS sorted_first,
  list_slice(embedding, 2, 4)[1] AS mid_1,
  list_slice(embedding, 2, 4)[2] AS mid_2,
  list_slice(embedding, 2, 4)[3] AS mid_3,
  list_reverse(embedding)[1] AS rev_first,
  CAST(list_contains(embedding, embedding[1]) AS BOOLEAN) AS has_first
FROM embeddings
""",
)
def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function parity: length, positional access, extremes,
    sort, slice, reverse, membership — pure element shuffling on the
    float vectors, no float arithmetic, so equality is exact.  The
    3-element slice is flattened to scalar columns so the output schema
    is driver-hashable (no array cells)."""
    emb = table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    mid = F.slice(e, 2, 3)
    return emb.select(
        "vec_id",
        F.size(e).alias("n"),
        F.element_at(e, 1).alias("first_elem"),
        F.element_at(e, F.size(e)).alias("last_elem"),
        F.array_max(e).alias("mx"),
        F.array_min(e).alias("mn"),
        F.element_at(F.sort_array(e), 1).alias("sorted_first"),
        F.element_at(mid, 1).alias("mid_1"),
        F.element_at(mid, 2).alias("mid_2"),
        F.element_at(mid, 3).alias("mid_3"),
        F.element_at(F.reverse(e), 1).alias("rev_first"),
        F.array_contains(e, F.element_at(e, 1)).alias("has_first"),
    )


@query(
    "fn_regex_suite",
    # Spark regexp_replace is replace-ALL by default; DuckDB needs the
    # 'g' flag.  Both use capture-group-1 extraction with empty-string
    # (not NULL) on no-match for regexp_extract.
    oracle="""
SELECT doc_id,
  regexp_extract(text, '([A-Za-z]{4,})', 1) AS first_long_word,
  CAST(len(regexp_extract_all(text, '[aeiou]+')) AS INTEGER) AS vowel_runs,
  regexp_replace(SUBSTRING(text, 1, 24), '[aeiou]', '*', 'g') AS starred,
  CAST(regexp_matches(text, '^[a-z]') AS BOOLEAN) AS starts_lower,
  regexp_extract(text, '(\\w+)\\s+(\\w+)', 2) AS second_word
FROM documents
""",
)
def fn_regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex parity: group extraction, match counting via extract-all,
    global replacement, anchored match test, multi-group indexing."""
    docs = table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.regexp_extract(t, r"([A-Za-z]{4,})", 1).alias("first_long_word"),
        F.size(F.regexp_extract_all(t, F.lit(r"[aeiou]+"), 0))
         .alias("vowel_runs"),
        F.regexp_replace(F.substring(t, 1, 24), r"[aeiou]", "*")
         .alias("starred"),
        t.rlike(r"^[a-z]").alias("starts_lower"),
        F.regexp_extract(t, r"(\w+)\s+(\w+)", 2).alias("second_word"),
    )


@query(
    "fn_math_bitwise_suite",
    # sqrt is IEEE-exact in both engines; ln/exp agree only to the last
    # ulp across libm implementations, so transcendentals are rounded at
    # 6 — integer/bitwise ops need nothing.
    oracle="""
SELECT event_id,
  ABS(value - 50) AS abs_dev,
  CAST(SIGN(value - 50) AS DOUBLE) AS sgn,
  CAST(FLOOR(value) AS BIGINT) AS flr,
  CAST(CEIL(value) AS BIGINT) AS cel,
  ROUND(SQRT(ABS(value)), 6) AS sq,
  ROUND(LN(1 + ABS(value)), 6) AS lg,
  ROUND(POWER(value / 100, 3), 6) AS cube,
  MOD(event_id, 7) AS m7,
  xor(event_id, 255) AS x255,
  event_id & 15 AS lo4,
  event_id << 2 AS shl,
  event_id >> 3 AS shr
FROM events
""",
)
def fn_math_bitwise_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + bitwise parity: IEEE-exact ops unrounded, transcendentals
    at round-6, and the integer bit algebra (xor/and/shifts) exact."""
    ev = table(spark, sf_dir, "events")
    v, eid = F.col("value"), F.col("event_id")
    return ev.select(
        "event_id",
        F.abs(v - 50).alias("abs_dev"),
        F.signum(v - 50).alias("sgn"),
        F.floor(v).alias("flr"),
        F.ceil(v).alias("cel"),
        F.round(F.sqrt(F.abs(v)), 6).alias("sq"),
        F.round(F.log(F.lit(1) + F.abs(v)), 6).alias("lg"),
        F.round(F.pow(v / 100, 3), 6).alias("cube"),
        (eid % 7).alias("m7"),
        eid.bitwiseXOR(255).alias("x255"),
        eid.bitwiseAND(15).alias("lo4"),
        F.shiftleft(eid, 2).alias("shl"),
        F.shiftright(eid, 3).alias("shr"),
    )


@query(
    "fn_window_suite",
    # IGNORE NULLS variants need NULLs: value is nulled on a deterministic
    # id condition identically on both sides.  (ts, event_id) is a unique
    # order key, so every window function here is tie-deterministic.
    oracle="""
WITH src AS (
  SELECT event_id, user_id, ts, value,
         CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v_null
  FROM events
)
SELECT event_id, user_id,
  CAST(DENSE_RANK() OVER w AS INTEGER) AS dr,
  NTH_VALUE(value, 3) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS nth3,
  FIRST_VALUE(v_null IGNORE NULLS) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS first_nn,
  LAST_VALUE(v_null IGNORE NULLS) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS last_nn,
  LAG(value, 2, -1.0) OVER w AS lag2
FROM src
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def fn_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function parity beyond W1-W4: DENSE_RANK, NTH_VALUE over a
    running frame, FIRST/LAST_VALUE IGNORE NULLS, and LAG with an offset
    and default.  One hash-partition shuffle on user_id; every function
    evaluates in a single sorted streaming pass per partition."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    v_null = F.when(F.col("event_id") % 5 == 0, F.lit(None)) \
              .otherwise(F.col("value"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.withColumn("v_null", v_null).select(
        "event_id", "user_id",
        F.dense_rank().over(w).alias("dr"),
        F.nth_value("value", 3).over(w_run).alias("nth3"),
        F.first("v_null", ignorenulls=True).over(w_run).alias("first_nn"),
        F.last("v_null", ignorenulls=True).over(w_run).alias("last_nn"),
        F.lag("value", 2, -1.0).over(w).alias("lag2"),
    )


@query(
    "rel_stats_aggregates",
    # Both engines implement the SQL-standard one-pass co-moment forms
    # (verified identical on a fixture before registration); round-6
    # absorbs summation-order noise.
    oracle="""
SELECT event_type,
  ROUND(stddev_samp(value), 6) AS sd_samp,
  ROUND(var_pop(value), 6) AS var_pop,
  ROUND(corr(value, CAST(user_id AS DOUBLE)), 6) AS corr_vu,
  ROUND(covar_samp(value, CAST(user_id AS DOUBLE)), 6) AS covar_vu,
  ROUND(regr_slope(value, CAST(user_id AS DOUBLE)), 6) AS slope,
  ROUND(regr_intercept(value, CAST(user_id AS DOUBLE)), 6) AS intercept,
  ROUND(regr_r2(value, CAST(user_id AS DOUBLE)), 6) AS r2,
  CAST(regr_count(value, CAST(user_id AS DOUBLE)) AS BIGINT) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def rel_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate parity: stddev/variance, correlation,
    covariance, and the regr_* linear-fit family — one partial+final
    hash agg (each statistic is a merged co-moment sketch, so the
    shuffle moves O(groups) rows)."""
    ev = table(spark, sf_dir, "events")
    u = F.col("user_id").cast("double")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.stddev_samp("value"), 6).alias("sd_samp"),
            F.round(F.var_pop("value"), 6).alias("var_pop"),
            F.round(F.corr("value", u), 6).alias("corr_vu"),
            F.round(F.covar_samp(F.col("value"), u), 6).alias("covar_vu"),
            F.round(F.expr("regr_slope(value, CAST(user_id AS DOUBLE))"), 6)
             .alias("slope"),
            F.round(F.expr("regr_intercept(value, CAST(user_id AS DOUBLE))"), 6)
             .alias("intercept"),
            F.round(F.expr("regr_r2(value, CAST(user_id AS DOUBLE))"), 6)
             .alias("r2"),
            F.expr("regr_count(value, CAST(user_id AS DOUBLE))").alias("n"),
        )
        .orderBy("event_type")
    )


@query(
    "rel_array_agg_sorted",
    # collect_set/list(DISTINCT) have no inherent order in either
    # engine; sorting inside the aggregate expression makes the CSV
    # deterministic and hash-comparable.  The sorted array itself is
    # exercised internally (it feeds the CSV) but only scalar columns
    # leave the query — the driver's pandas canonicalizer cannot hash
    # list cells.
    oracle="""
SELECT user_id,
  COALESCE(string_agg(DISTINCT event_type, ',' ORDER BY event_type), '')
    AS type_csv,
  CAST(COUNT(DISTINCT event_type) AS INTEGER) AS n_types
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def rel_array_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic grouped array/string aggregation: collect_set →
    sorted array → CSV.  The sort happens per group post-aggregation
    (O(types log types) on tiny arrays), keeping the shuffle at one
    partial+final distinct-agg."""
    ev = table(spark, sf_dir, "events")
    types = F.array_sort(F.collect_set("event_type"))
    return (
        ev.groupBy("user_id")
        .agg(
            F.concat_ws(",", types).alias("type_csv"),
            F.count_distinct("event_type").cast("int").alias("n_types"),
        )
        .orderBy("user_id")
    )


@query(
    "sql_recursive_date_spine",
    oracle="""
WITH RECURSIVE spine(day) AS (
  SELECT DATE '2024-01-01'
  UNION ALL
  SELECT day + INTERVAL 1 DAY FROM spine WHERE day < DATE '2024-01-31'
)
SELECT s.day AS day, CAST(COALESCE(e.cnt, 0) AS BIGINT) AS n_events
FROM spine s
LEFT JOIN (
  SELECT CAST(ts AS DATE) AS dd, COUNT(*) AS cnt FROM events GROUP BY dd
) e ON e.dd = s.day
ORDER BY day
""",
)
def sql_recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 WITH RECURSIVE, run as literal SQL: a 31-day date spine
    generated recursively, left-joined to per-day event counts so days
    with no events surface as explicit zeros (the gap-filling calendar
    pattern).  The recursion is driver-side-trivial (31 rows) and the
    join broadcasts the spine; the fact side stays one grouped scan."""
    table(spark, sf_dir, "events").createOrReplaceTempView("events_spine_src")
    return spark.sql("""
WITH RECURSIVE spine(day) AS (
  SELECT DATE '2024-01-01'
  UNION ALL
  SELECT day + INTERVAL '1' DAY FROM spine WHERE day < DATE '2024-01-31'
)
SELECT s.day AS day, CAST(COALESCE(e.cnt, 0) AS BIGINT) AS n_events
FROM spine s
LEFT JOIN (
  SELECT CAST(ts AS DATE) AS dd, COUNT(*) AS cnt
  FROM events_spine_src GROUP BY dd
) e ON e.dd = s.day
ORDER BY day
""")


@query(
    "rel_lateral_top2_orders",
    oracle="""
SELECT c.c_custkey AS c_custkey, t.o_orderkey AS o_orderkey,
       ROUND(t.o_totalprice, 2) AS o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders
  WHERE orders.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t
ORDER BY c_custkey, o_totalprice DESC, o_orderkey
""",
)
def rel_lateral_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-group ORDER BY + LIMIT (the
    SQL spelling of top-N-per-group), run as literal Spark SQL.
    Catalyst decorrelates the lateral into a ranked window — same
    physical plan family as rel_rank_top_order_per_customer, so there is
    no per-customer re-execution; ties broken by orderkey on both
    engines."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("cust_lat_src")
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat_src")
    return spark.sql("""
SELECT c.c_custkey AS c_custkey, t.o_orderkey AS o_orderkey,
       ROUND(t.o_totalprice, 2) AS o_totalprice
FROM cust_lat_src c,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders_lat_src o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t
ORDER BY c_custkey, o_totalprice DESC, o_orderkey
""")


@query(
    "fn_try_suite",
    # Error-safe expression parity: Spark's try_* family vs DuckDB's
    # NULL-on-div-zero + TRY_CAST (+ a CASE emulation for try_add
    # overflow, which DuckDB would raise on).  Same NULL sites, same
    # values elsewhere.
    oracle="""
SELECT event_id,
  value / NULLIF(event_id % 3, 0) AS div3,
  TRY_CAST(event_type AS INTEGER) AS bad_int,
  TRY_CAST(CAST(event_id AS VARCHAR) AS BIGINT) AS roundtrip_id,
  TRY_CAST(event_type AS TIMESTAMP) AS bad_ts,
  CASE WHEN event_id > 7 THEN NULL
       ELSE event_id + 9223372036854775800 END AS near_overflow
FROM events
""",
)
def fn_try_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-error-safe function parity: try_divide (NULL at zero),
    try_cast (NULL on malformed), try_to_timestamp, and try_add (NULL on
    BIGINT overflow) — the graceful-degradation surface a pipeline needs
    when ANSI mode is on (Spark 4 default) but a batch must not die on
    one bad row."""
    ev = table(spark, sf_dir, "events")
    eid = F.col("event_id")
    return ev.select(
        "event_id",
        F.try_divide(F.col("value"), eid % 3).alias("div3"),
        F.col("event_type").try_cast("int").alias("bad_int"),
        eid.cast("string").try_cast("bigint").alias("roundtrip_id"),
        F.try_to_timestamp(F.col("event_type")).alias("bad_ts"),
        F.try_add(eid, F.lit(9223372036854775800)).alias("near_overflow"),
    )


@query(
    "fn_hof_suite",
    # Higher-order array lambdas.  DuckDB range(1, n+1) == Spark
    # sequence(1, n); arithmetic stays integral so every value is exact.
    # The lambda outputs are CSV-serialized (array_to_string ↔
    # concat_ws) because the driver's pandas canonicalizer cannot hash
    # list cells; integer rendering is digit-identical cross-engine.
    oracle="""
SELECT event_id,
  COALESCE(array_to_string(
      list_transform(range(1, event_id % 5 + 4), x -> x * 2), ','), '')
    AS doubled_csv,
  COALESCE(array_to_string(
      list_filter(range(1, event_id % 5 + 4), x -> x % 2 = 1), ','), '')
    AS odds_csv,
  CAST(list_sum(range(1, event_id % 5 + 4)) AS BIGINT) AS total,
  CAST(len(list_filter(range(1, event_id % 5 + 4), x -> x > 4)) > 0
       AS BOOLEAN) AS any_gt4
FROM events
""",
)
def fn_hof_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order function parity: transform / filter / aggregate /
    exists lambdas over a per-row generated sequence.  Lambdas compile
    to codegen'd loops inside the project — no UDF, no shuffle.  Array
    results leave the query as comma-joined strings so every output
    cell is a driver-hashable scalar."""
    ev = table(spark, sf_dir, "events")
    n = F.col("event_id") % 5 + 3
    arr = F.sequence(F.lit(1).cast("long"), n)
    return ev.select(
        "event_id",
        F.concat_ws(",", F.transform(arr, lambda x: (x * 2).cast("string")))
         .alias("doubled_csv"),
        F.concat_ws(
            ",",
            F.transform(F.filter(arr, lambda x: x % 2 == 1),
                        lambda x: x.cast("string")),
        ).alias("odds_csv"),
        F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + x)
         .alias("total"),
        F.exists(arr, lambda x: x > 4).alias("any_gt4"),
    )


@query(
    "fn_map_suite",
    # Both engines preserve literal entry order in map_keys/map_values;
    # DuckDB's m[k] yields a 1-element list, so the oracle indexes [1].
    # keys/values arrays are CSV-serialized (array_to_string ↔
    # concat_ws) so every output cell is a driver-hashable scalar.
    oracle="""
SELECT event_id,
  (MAP {'evt': event_type, 'uid': CAST(user_id AS VARCHAR)})['evt'][1] AS evt,
  COALESCE(array_to_string(map_keys(MAP {'evt': event_type,
      'uid': CAST(user_id AS VARCHAR)}), ','), '') AS ks_csv,
  COALESCE(array_to_string(map_values(MAP {'evt': event_type,
      'uid': CAST(user_id AS VARCHAR)}), ','), '') AS vs_csv,
  CAST(cardinality(MAP {'evt': event_type,
                        'uid': CAST(user_id AS VARCHAR)}) AS INTEGER) AS n,
  CAST(list_contains(map_keys(MAP {'evt': event_type,
       'uid': CAST(user_id AS VARCHAR)}), 'uid') AS BOOLEAN) AS has_uid
FROM events
""",
)
def fn_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type parity: construction, key lookup, keys/values extraction
    in entry order, cardinality, key membership — all codegen'd; the map
    never leaves the projection, and the keys/values arrays leave it as
    comma-joined strings (both engines preserve literal entry order)."""
    ev = table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("evt"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "evt").alias("evt"),
        F.concat_ws(",", F.map_keys(m)).alias("ks_csv"),
        F.concat_ws(",", F.map_values(m)).alias("vs_csv"),
        F.size(m).alias("n"),
        F.array_contains(F.map_keys(m), "uid").alias("has_uid"),
    )


@query(
    "fn_hash_mask_suite",
    # md5 / sha256 agree cross-engine (DuckDB lacks sha1 — omitted);
    # masking = deterministic regex redaction over a synthesized
    # email-ish string, plus crc-free length-preserving star mask.
    oracle="""
SELECT event_id,
       md5(event_type) AS etype_md5,
       sha256(CAST(event_id AS VARCHAR)) AS id_sha256,
       regexp_replace(event_type || '_' || CAST(user_id AS VARCHAR)
                      || '@example.com',
                      '[^@]+@', '***@', 'g') AS masked_email,
       repeat('*', LENGTH(event_type)) AS star_mask
FROM events
WHERE event_id % 97 = 0
ORDER BY event_id
""",
)
def fn_hash_mask_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing + data-masking parity: md5 / sha2-256 digests and the two
    standard PII-redaction shapes (regex local-part mask,
    length-preserving star mask) — all codegen'd column expressions."""
    ev = table(spark, sf_dir, "events").where(F.col("event_id") % 97 == 0)
    email = F.concat(
        F.col("event_type"), F.lit("_"),
        F.col("user_id").cast("string"), F.lit("@example.com"),
    )
    return ev.select(
        "event_id",
        F.md5("event_type").alias("etype_md5"),
        F.sha2(F.col("event_id").cast("string"), 256).alias("id_sha256"),
        F.regexp_replace(email, "[^@]+@", "***@").alias("masked_email"),
        F.repeat(F.lit("*"), F.length("event_type")).alias("star_mask"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# geodesic scalar surface (haversine + bearing over derived coordinates)

#: shared literals: embedding the SAME python-repr double in both
#: engines keeps x*PI/180 bit-identical (radians() internals may
#: associate differently per engine).
_PI = 3.141592653589793
_EARTH_KM = 6371.0088


@query(
    "fn_geo_suite",
    # Transcendental parity discipline: sin/cos/asin/atan2 may differ by
    # 1 ulp between libm and JDK Math; at km magnitude that is ~1e-12
    # absolute, so ROUND(_, 4) (1e-4 boundaries) leaves ~8 orders of
    # margin — the same reasoning as fn_math_bitwise_suite, derated for
    # the larger value range.
    oracle=f"""
WITH pts AS (
  SELECT event_id, user_id, ts,
         value / 10.0 - 25.0 AS lat,
         CAST(user_id AS DOUBLE) - 75.0 AS lon
  FROM events
  WHERE CAST(ts AS DATE) = DATE '2024-01-01' AND value IS NOT NULL),
seq AS (
  SELECT event_id, user_id, lat, lon,
         LAG(lat) OVER w AS plat, LAG(lon) OVER w AS plon
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT event_id,
  ROUND(2 * {_EARTH_KM!r} * asin(sqrt(
      sin((lat - plat) * {_PI!r} / 180 / 2)
        * sin((lat - plat) * {_PI!r} / 180 / 2)
      + cos(plat * {_PI!r} / 180) * cos(lat * {_PI!r} / 180)
        * sin((lon - plon) * {_PI!r} / 180 / 2)
        * sin((lon - plon) * {_PI!r} / 180 / 2))), 4) AS dist_km,
  ROUND(atan2(
      sin((lon - plon) * {_PI!r} / 180) * cos(lat * {_PI!r} / 180),
      cos(plat * {_PI!r} / 180) * sin(lat * {_PI!r} / 180)
      - sin(plat * {_PI!r} / 180) * cos(lat * {_PI!r} / 180)
        * cos((lon - plon) * {_PI!r} / 180)) * 180 / {_PI!r}, 4)
    AS bearing_deg,
  (lat BETWEEN -10 AND 10 AND lon BETWEEN -40 AND 40) AS in_bbox
FROM seq WHERE plat IS NOT NULL
""",
)
def fn_geo_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geodesic scalars over consecutive per-user points — the exact
    computation the reference derives speed from (consecutive GPS
    breadcrumbs, `/root/reference/transform.py:219-230`), on the
    (value, user_id)-derived coordinate plane: haversine great-circle
    distance, initial bearing, bounding-box membership.  One window
    exchange supplies the lagged point; everything else is codegen'd
    column math (no UDF)."""
    from busdata_pipeline_spark.sources import table as _table

    ev = _table(spark, sf_dir, "events")
    pts = ev.where(
        (F.to_date("ts") == F.lit("2024-01-01").cast("date"))
        & F.col("value").isNotNull()
    ).select(
        "event_id", "user_id", "ts",
        (F.col("value") / 10.0 - 25.0).alias("lat"),
        (F.col("user_id").cast("double") - 75.0).alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = pts.select(
        "event_id", "lat", "lon",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
    ).where(F.col("plat").isNotNull())

    def rad(c):
        return c * F.lit(_PI) / 180

    dphi2 = rad(F.col("lat") - F.col("plat")) / 2
    dlam = rad(F.col("lon") - F.col("plon"))
    dlam2 = dlam / 2
    hav = (
        F.sin(dphi2) * F.sin(dphi2)
        + F.cos(rad(F.col("plat"))) * F.cos(rad(F.col("lat")))
        * F.sin(dlam2) * F.sin(dlam2)
    )
    dist = F.lit(2.0) * F.lit(_EARTH_KM) * F.asin(F.sqrt(hav))
    bearing = F.atan2(
        F.sin(dlam) * F.cos(rad(F.col("lat"))),
        F.cos(rad(F.col("plat"))) * F.sin(rad(F.col("lat")))
        - F.sin(rad(F.col("plat"))) * F.cos(rad(F.col("lat")))
        * F.cos(dlam),
    ) * 180 / F.lit(_PI)
    return seq.select(
        "event_id",
        F.round(dist, 4).alias("dist_km"),
        F.round(bearing, 4).alias("bearing_deg"),
        (
            F.col("lat").between(-10, 10) & F.col("lon").between(-40, 40)
        ).alias("in_bbox"),
    )


@query(
    "bus_stop_detection",
    # The dwell flag compares the ROUND(_,4) distance (shared-literal
    # transcendental parity per fn_geo_suite's margin argument), so both
    # engines quantize before the threshold compare; everything after the
    # flag is integer islands arithmetic — exact by construction.
    oracle=f"""
WITH pts AS (
  SELECT event_id, user_id, ts,
         value / 10.0 - 25.0 AS lat,
         CAST(user_id AS DOUBLE) - 75.0 AS lon
  FROM events
  WHERE value IS NOT NULL),
seq AS (
  SELECT event_id, user_id, ts, lat, lon,
         LAG(lat) OVER w AS plat, LAG(lon) OVER w AS plon
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
d AS (
  SELECT event_id, user_id, ts,
    CASE WHEN plat IS NULL THEN FALSE
         ELSE ROUND(2 * {_EARTH_KM!r} * asin(sqrt(
             sin((lat - plat) * {_PI!r} / 180 / 2)
               * sin((lat - plat) * {_PI!r} / 180 / 2)
             + cos(plat * {_PI!r} / 180) * cos(lat * {_PI!r} / 180)
               * sin((lon - plon) * {_PI!r} / 180 / 2)
               * sin((lon - plon) * {_PI!r} / 180 / 2))), 4) <= 300.0
    END AS dwell
  FROM seq),
g AS (
  SELECT event_id, user_id, ts, dwell,
    CAST(SUM(CASE WHEN chg THEN 1 ELSE 0 END) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS grp
  FROM (
    SELECT *, dwell <> COALESCE(LAG(dwell) OVER w, NOT dwell) AS chg
    FROM d WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) x)
SELECT user_id, MIN(ts) AS dwell_start, MAX(ts) AS dwell_end,
       CAST(COUNT(*) AS BIGINT) AS n_points
FROM g WHERE dwell
GROUP BY user_id, grp
HAVING COUNT(*) >= 3
""",
)
def bus_stop_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stop/dwell detection over the GPS breadcrumb stream — the
    bus-domain operator downstream of the reference's speed derivation
    (`/root/reference/transform.py:219-230`): a point is 'dwelling' when
    it moved ≤ 300 km (rounded haversine — the threshold is scaled to the
    synthetic (value, user_id) coordinate plane, whose consecutive-point
    steps are continent-sized; on real GPS it would be ~0.1 km) from its
    predecessor; maximal
    runs of ≥ 3 consecutive dwell points become stop episodes via
    gaps-and-islands (change-flag running sum — no self-join).  All on
    ONE user-keyed window exchange + a per-episode rollup reusing the
    same partitioning."""
    from busdata_pipeline_spark.sources import table as _table

    ev = _table(spark, sf_dir, "events")
    pts = ev.where(F.col("value").isNotNull()).select(
        "event_id", "user_id", "ts",
        (F.col("value") / 10.0 - 25.0).alias("lat"),
        (F.col("user_id").cast("double") - 75.0).alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = pts.select(
        "event_id", "user_id", "ts", "lat", "lon",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
    )

    def rad(c):
        return c * F.lit(_PI) / 180

    dphi2 = rad(F.col("lat") - F.col("plat")) / 2
    dlam2 = rad(F.col("lon") - F.col("plon")) / 2
    hav = (
        F.sin(dphi2) * F.sin(dphi2)
        + F.cos(rad(F.col("plat"))) * F.cos(rad(F.col("lat")))
        * F.sin(dlam2) * F.sin(dlam2)
    )
    dist = F.lit(2) * F.lit(_EARTH_KM) * F.asin(F.sqrt(hav))
    d = seq.select(
        "event_id", "user_id", "ts",
        F.when(F.col("plat").isNull(), F.lit(False))
        .otherwise(F.round(dist, 4) <= 300.0).alias("dwell"),
    )
    chg = F.col("dwell") != F.coalesce(
        F.lag("dwell").over(w), ~F.col("dwell")
    )
    g = d.withColumn("chg", chg).withColumn(
        "grp",
        F.sum(F.when(F.col("chg"), 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long"),
    )
    return (
        g.where("dwell")
        .groupBy("user_id", "grp")
        .agg(
            F.min("ts").alias("dwell_start"),
            F.max("ts").alias("dwell_end"),
            F.count(F.lit(1)).cast("long").alias("n_points"),
        )
        .where(F.col("n_points") >= 3)
        .drop("grp")
    )


@query(
    "fn_url_suite",
    oracle="""
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.org/docs/' ||
         CAST(doc_id AS VARCHAR) || '/view?lang=' || lang || '&ref=feed'
           AS url
  FROM documents)
SELECT doc_id, url,
  regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
  regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host,
  regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
  regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param,
  regexp_extract(url, '\\.([a-z]+)/', 1) AS tld,
  CAST(len(string_split(regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1),
                        '/')) - 1 AS BIGINT) AS path_depth
FROM u
""",
)
def fn_url_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL construction + parsing scalar surface: scheme / host / path /
    query-param / TLD / path-depth extraction, all via the SAME regex
    literals on both engines (Spark's parse_url is JVM-specific, so the
    portable contract is the regex set — the one a crawl-data pipeline
    normalizes domains with for per-domain quotas, td_domain_quota)."""
    docs = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org/docs/"),
        F.col("doc_id").cast("string"), F.lit("/view?lang="),
        F.col("lang"), F.lit("&ref=feed"),
    )
    u = docs.select("doc_id", url.alias("url"))
    path = F.regexp_extract("url", r"^[a-z]+://[^/]+(/[^?]*)", 1)
    return u.select(
        "doc_id", "url",
        F.regexp_extract("url", r"^([a-z]+)://", 1).alias("scheme"),
        F.regexp_extract("url", r"^[a-z]+://([^/]+)/", 1).alias("host"),
        path.alias("path"),
        F.regexp_extract("url", r"[?&]lang=([^&]*)", 1).alias("lang_param"),
        F.regexp_extract("url", r"\.([a-z]+)/", 1).alias("tld"),
        (F.size(F.split(path, "/")) - 1).cast("long").alias("path_depth"),
    )


@query(
    "bus_daily_distance",
    # Per-hop distances quantize to integer 1e-4-km units right after the
    # shared-literal transcendental (fn_geo_suite's parity margin), so
    # the per-day SUM is an exact BIGINT — order-independent.
    oracle=f"""
WITH pts AS (
  SELECT event_id, user_id, ts,
         value / 10.0 - 25.0 AS lat,
         CAST(user_id AS DOUBLE) - 75.0 AS lon
  FROM events WHERE value IS NOT NULL),
seq AS (
  SELECT event_id, user_id, ts, lat, lon,
         LAG(lat) OVER w AS plat, LAG(lon) OVER w AS plon
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
hops AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
    CAST(FLOOR(ROUND(2 * {_EARTH_KM!r} * asin(sqrt(
        sin((lat - plat) * {_PI!r} / 180 / 2)
          * sin((lat - plat) * {_PI!r} / 180 / 2)
        + cos(plat * {_PI!r} / 180) * cos(lat * {_PI!r} / 180)
          * sin((lon - plon) * {_PI!r} / 180 / 2)
          * sin((lon - plon) * {_PI!r} / 180 / 2))), 4)
      * 10000.0 + 0.5) AS BIGINT) AS du
  FROM seq WHERE plat IS NOT NULL)
SELECT user_id, day,
  CAST(COUNT(*) AS BIGINT) AS n_hops,
  ROUND(CAST(SUM(du) AS DOUBLE) / 10000.0, 4) AS dist_km
FROM hops GROUP BY user_id, day
""",
)
def bus_daily_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily traveled distance: the rollup downstream of the
    reference's consecutive-breadcrumb differencing (it differences the
    METERS odometer, `/root/reference/transform.py:219-230`; here the
    odometer is reconstructed as summed haversine hops on the synthetic
    plane).  One user-keyed window supplies the lagged point; hop
    distances quantize to exact 1e-4-km integer units before the per-day
    SUM, so the rollup is order-independent and engine-identical."""
    from busdata_pipeline_spark.sources import table as _table

    ev = _table(spark, sf_dir, "events")
    pts = ev.where(F.col("value").isNotNull()).select(
        "event_id", "user_id", "ts",
        (F.col("value") / 10.0 - 25.0).alias("lat"),
        (F.col("user_id").cast("double") - 75.0).alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = pts.select(
        "user_id", "ts", "lat", "lon",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
    ).where(F.col("plat").isNotNull())

    def rad(c):
        return c * F.lit(_PI) / 180

    dphi2 = rad(F.col("lat") - F.col("plat")) / 2
    dlam2 = rad(F.col("lon") - F.col("plon")) / 2
    hav = (
        F.sin(dphi2) * F.sin(dphi2)
        + F.cos(rad(F.col("plat"))) * F.cos(rad(F.col("lat")))
        * F.sin(dlam2) * F.sin(dlam2)
    )
    dist = F.lit(2) * F.lit(_EARTH_KM) * F.asin(F.sqrt(hav))
    hops = seq.select(
        "user_id", F.to_date("ts").alias("day"),
        F.floor(F.round(dist, 4) * F.lit(10000.0) + F.lit(0.5))
        .cast("long").alias("du"),
    )
    return hops.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n_hops"),
        F.round(F.sum("du").cast("double") / F.lit(10000.0), 4)
        .alias("dist_km"),
    )
