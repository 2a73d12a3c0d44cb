"""Scalar function surface — SURVEY.md §2.8 (X1-X10) and §2.1 S8 (JSON).

The reference's entire expression language is JS idioms inside route
handlers; each maps to a built-in Catalyst expression (no UDFs — everything
here stays inside whole-stage codegen).

Portability notes baked into the oracle SQL (DuckDB dialect differences):
* double→int casts: Spark ANSI truncates, DuckDB rounds → use explicit
  `floor` on both sides;
* rounding to cents: `floor(x*100 + 0.5)` on both sides instead of `round`,
  whose half-way tie-breaking differs between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..registry import register

_SCALAR_ORACLE = """
SELECT
  o_orderkey,
  coalesce(nullif(o_orderpriority, '5-LOW'), 'unprioritized')    AS priority_or_default,
  CASE WHEN o_orderstatus = 'O' THEN 'open' ELSE 'closed' END    AS status_label,
  'order-' || CAST(o_orderkey AS VARCHAR)                        AS order_tag,
  CAST(floor(o_totalprice) AS BIGINT)                            AS price_int,
  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)                AS price_cents,
  floor(o_totalprice * 0.9 * 100 + 0.5) / 100.0                  AS discounted,
  (o_orderpriority IN ('1-URGENT', '2-HIGH'))                    AS is_priority,
  lpad(CAST(o_custkey AS VARCHAR), 10, '0')                      AS custkey_padded
FROM orders
WHERE o_orderkey < 50
ORDER BY o_orderkey
"""


@register("scalar_expressions", oracle=_SCALAR_ORACLE, tags=("scalar",))
def scalar_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1-X9 in one projection.

    Reference idioms: `x || 0` coalescing (index.js:340,398,...), ternaries
    (index.js:150-153,393), template-string concat (index.js:151-153),
    parseInt/parseFloat (index.js:470-471), `Math.round(usd*100)` cents
    conversion (index.js:267), arithmetic (index.js:482), ObjectId
    stringify (index.js:551).
    """
    orders = load_tables(spark, sf_dir)["orders"]
    return (
        orders.filter(F.col("o_orderkey") < 50)
        .select(
            "o_orderkey",
            F.coalesce(
                F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")),
                F.lit("unprioritized"),
            ).alias("priority_or_default"),
            F.when(F.col("o_orderstatus") == "O", "open")
            .otherwise("closed")
            .alias("status_label"),
            F.concat(F.lit("order-"), F.col("o_orderkey").cast("string")).alias(
                "order_tag"
            ),
            F.floor(F.col("o_totalprice")).cast("long").alias("price_int"),
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("price_cents"),
            # floor-round, not round(x, 2): the discounted double can land
            # within float error of a .xx5 boundary (sf0.001 stress sweep:
            # 255874.545), where Spark's BigDecimal-exact HALF_UP and
            # DuckDB's multiply-based round disagree on the SAME double;
            # floor(x*100 + 0.5) is one exact IEEE op on identical operands
            (
                F.floor(F.col("o_totalprice") * 0.9 * 100 + F.lit(0.5)) / 100.0
            ).alias("discounted"),
            F.col("o_orderpriority")
            .isin("1-URGENT", "2-HIGH")
            .alias("is_priority"),
            F.lpad(F.col("o_custkey").cast("string"), 10, "0").alias("custkey_padded"),
        )
        .orderBy("o_orderkey")
    )


_STRING_ORACLE = """
SELECT
  c_custkey,
  starts_with(c_name, 'Customer#')       AS has_prefix,
  string_split(c_name, '#')[2]           AS id_part,
  regexp_matches(string_split(c_name, '#')[2], '^[0-9]+$') AS id_is_valid,
  upper(c_mktsegment)                    AS seg_upper,
  lower(c_name)                          AS name_lower,
  length(c_name)                         AS name_len,
  substr(c_name, 1, 8)                   AS name_head
FROM customer
WHERE c_custkey < 25
ORDER BY c_custkey
"""


@register("string_functions", oracle=_STRING_ORACLE, tags=("scalar", "string"))
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10: string prefix test / split (`authHeader.startsWith('Bearer ')`,
    `split(' ')[1]` — index.js:95-99) plus the standard string surface."""
    customer = load_tables(spark, sf_dir)["customer"]
    return (
        customer.filter(F.col("c_custkey") < 25)
        .select(
            "c_custkey",
            F.col("c_name").startswith("Customer#").alias("has_prefix"),
            F.element_at(F.split(F.col("c_name"), "#"), 2).alias("id_part"),
            # X7's ObjectId.isValid analog (index.js:1179): regex validity
            F.element_at(F.split(F.col("c_name"), "#"), 2)
            .rlike("^[0-9]+$")
            .alias("id_is_valid"),
            F.upper(F.col("c_mktsegment")).alias("seg_upper"),
            F.lower(F.col("c_name")).alias("name_lower"),
            F.length(F.col("c_name")).alias("name_len"),
            F.substring(F.col("c_name"), 1, 8).alias("name_head"),
        )
        .orderBy("c_custkey")
    )


_JSON_ORACLE = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("json_ingest_extract", oracle=_JSON_ORACLE, tags=("scalar", "json", "source"))
def json_ingest_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: JSON ingestion — `express.json()` body parsing where client
    documents pass straight into storage (index.js:14,199,925). The events
    fixture's `props` column is a JSON string; extract a typed field and
    aggregate it. `get_json_object` is codegen'd — no Python in the loop."""
    events = load_tables(spark, sf_dir)["events"]
    return (
        events.select(
            "event_type",
            F.get_json_object(F.col("props"), "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("sum_k"))
        .orderBy("event_type")
    )


# ----------------------------------------------------- VARIANT extraction

_VARIANT_ORACLE = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("events_variant_props", oracle=_VARIANT_ORACLE, tags=("scalar", "json", "source"))
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via the VARIANT type (Spark 4): parse the
    JSON once into the binary variant encoding, then `variant_get` typed
    paths — the engine-native answer to schemaless columns, replacing
    repeated `get_json_object` string re-parsing (each call re-tokenizes
    the JSON; variant decodes once and path-reads are offset lookups,
    ~an order of magnitude cheaper on wide props at scale). The twin of
    `json_ingest_extract`, which demonstrates the classic
    schema-on-read path over the same column.

    Plan: parse + extract are map-side codegen; the aggregate is one
    partial-agg'd shuffle on event_type. The oracle reads the same paths
    with DuckDB's JSON extraction — typed BIGINT on both sides."""
    events = load_tables(spark, sf_dir)["events"]
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
        .orderBy("event_type")
    )


_PIPE_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
WHERE o_orderstatus <> 'F'
GROUP BY o_orderpriority
HAVING count(*) > 10
ORDER BY o_orderpriority
"""


@register("sql_pipe_syntax", oracle=_PIPE_ORACLE, tags=("sql", "agg"))
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4, SPARK-49555): the same
    scan→filter→aggregate→having→order pipeline written as `|>` stages in
    dataflow order — the third authoring surface next to the DataFrame
    API and classic SQL. The point for parity: a user migrating analytics
    written in the piped dialect runs them unchanged; Catalyst compiles
    both spellings to the identical partial-agg'd plan (the oracle IS the
    classic-SQL spelling, so the equivalence is driver-checked, not
    claimed). Parameter markers bind the status literal through
    `spark.sql(..., args=...)` — the injection-safe form of the
    reference's string-built Mongo filters (index.js route handlers
    interpolate request fields directly)."""
    load_tables(spark, sf_dir)["orders"].createOrReplaceTempView(
        "pipe_orders_v"
    )
    return spark.sql(
        """
        FROM pipe_orders_v
        |> WHERE o_orderstatus <> :excluded
        |> AGGREGATE count(*) AS n_orders,
                     round(sum(o_totalprice), 2) AS revenue
           GROUP BY o_orderpriority
        |> WHERE n_orders > 10
        |> ORDER BY o_orderpriority
        """,
        args={"excluded": "F"},
    )


_SQL_UDF_ORACLE = """
WITH scored AS (
  SELECT l_orderkey,
         CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100
                    + 0.5) AS BIGINT) AS charged_cents,
         CASE WHEN l_quantity >= 40 THEN 'bulk'
              WHEN l_quantity >= 10 THEN 'standard'
              ELSE 'small' END AS tier
  FROM lineitem
)
SELECT tier,
       count(*) AS n_lines,
       round(sum(charged_cents) / CAST(100 AS DOUBLE), 2) AS total_charged
FROM scored
GROUP BY tier
ORDER BY tier
"""


@register("sql_scalar_udf", oracle=_SQL_UDF_ORACLE, tags=("sql", "udf"))
def sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-language UDFs (Spark 4, CREATE FUNCTION ... RETURN expr): the
    charged-amount formula and a quantity tier register as named catalog
    functions and a query calls them like builtins. The money UDF folds
    straight to exact integer cents via the module's floor(x*100 + 0.5)
    house rule — per-line 2dp floats would re-associate across the
    distributed sum, and round()'s tie handling differs between engines
    at binary boundaries; floor on a double is the same IEEE op
    everywhere. Unlike Python UDFs,
    a SQL UDF's body INLINES into the calling plan at analysis time —
    whole-stage codegen sees the raw expression, so this is the one UDF
    flavor with zero serialization boundary and zero scale penalty
    (verified: the plan shows the expanded arithmetic, no BatchEvalPython
    — tests/test_plans.py). The sanctioned way to share business logic
    across queries without leaving the JVM."""
    load_tables(spark, sf_dir)["lineitem"].createOrReplaceTempView(
        "udf_lineitem_v"
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION charged_cents(
            price DOUBLE, discount DOUBLE, tax DOUBLE)
        RETURNS BIGINT
        RETURN CAST(floor(price * (1 - discount) * (1 + tax) * 100 + 0.5)
                    AS BIGINT)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION quantity_tier(q DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN q >= 40 THEN 'bulk'
                    WHEN q >= 10 THEN 'standard'
                    ELSE 'small' END
        """
    )
    return spark.sql(
        """
        SELECT quantity_tier(l_quantity) AS tier,
               count(*) AS n_lines,
               round(sum(charged_cents(l_extendedprice, l_discount, l_tax))
                     / CAST(100 AS DOUBLE), 2) AS total_charged
        FROM udf_lineitem_v
        GROUP BY quantity_tier(l_quantity)
        ORDER BY tier
        """
    )
