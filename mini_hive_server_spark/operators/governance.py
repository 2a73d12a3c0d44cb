"""Data-governance operators: declared-constraint audits and cascading
erasure.

Extension family (the reference trusts Mongoose to hold its invariants —
ObjectId refs index.js:60-120 are never re-validated after write; and its
deletes are single-collection, index.js:1239-1247): a warehouse engine
needs both an explicit audit (Deequ/Great-Expectations-style: run the
declared constraints as queries, report violation counts) and
referential erasure (GDPR right-to-be-forgotten: delete a key set and
everything transitively reachable from it).

Scale notes: every check is one key-shuffled anti/semi join or one
partial-agg'd count — constraints audit in a single pass per table pair,
never row-by-row. The erasure cascade is two chained semi-joins whose
probe sides are the victim key sets (SF-proportional, so NO broadcast
hint — AQE picks the strategy at runtime); surviving data is produced by
anti-join, the same plan `mutation_delete_anti` ships. All outputs are
exact integer counts.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..registry import register

# --------------------------------------------------------- constraint audit

_AUDIT_ORACLE = """
SELECT * FROM (
  SELECT 'fk_customer_nation' AS constraint_name,
         count(*) FILTER (WHERE n_nationkey IS NULL) AS n_violations
  FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
  UNION ALL
  SELECT 'fk_lineitem_orders',
         count(*) FILTER (WHERE o_orderkey IS NULL)
  FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
  UNION ALL
  SELECT 'fk_lineitem_part',
         count(*) FILTER (WHERE p_partkey IS NULL)
  FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
  UNION ALL
  SELECT 'fk_lineitem_supplier',
         count(*) FILTER (WHERE s_suppkey IS NULL)
  FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
  UNION ALL
  SELECT 'fk_orders_customer',
         count(*) FILTER (WHERE c_custkey IS NULL)
  FROM orders LEFT JOIN customer ON o_custkey = c_custkey
  UNION ALL
  SELECT 'not_null_orders_custkey',
         count(*) FILTER (WHERE o_custkey IS NULL)
  FROM orders
  UNION ALL
  -- distinct-subquery form, not count(DISTINCT (a, b)): DuckDB's row-struct
  -- distinct counts partially-null structs while Spark's count_distinct(a, b)
  -- skips them; SELECT DISTINCT groups NULL keys identically in both engines.
  SELECT 'unique_lineitem_order_line',
         count(*) - (SELECT count(*) FROM
                     (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem))
  FROM lineitem
  UNION ALL
  SELECT 'unique_orders_orderkey',
         count(*) - count(DISTINCT o_orderkey)
  FROM orders
)
ORDER BY constraint_name
"""


def _anti_count(fact: DataFrame, dim: DataFrame, cond, name: str) -> DataFrame:
    return (
        fact.join(dim, cond, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit(name).alias("constraint_name"), "n_violations")
    )


@register("constraint_referential_audit", oracle=_AUDIT_ORACLE, tags=("governance", "agg"))
def constraint_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-constraint audit in the Deequ style: run every foreign-key,
    uniqueness, and not-null constraint of the star schema as a query and
    report one violation count per constraint. The reference never
    re-checks its ObjectId refs after write (index.js:60-120); a
    warehouse audits them explicitly and continuously.

    Plan: each FK check is one anti-join on its key (null FK rows count
    as violations in both engines: a null key matches nothing); each
    uniqueness check is count(*) minus a partial-agg'd distinct count;
    the union of eight 1-row aggregates is driver-free. At 100 TB each
    check is an independent single-shuffle job — they parallelize across
    the cluster and none holds more than (key column) per row in
    flight."""
    t = load_tables(spark, sf_dir)
    cust, ords, li = t["customer"], t["orders"], t["lineitem"]
    checks = [
        _anti_count(
            cust,
            t["nation"],
            cust["c_nationkey"] == t["nation"]["n_nationkey"],
            "fk_customer_nation",
        ),
        _anti_count(
            li, ords, li["l_orderkey"] == ords["o_orderkey"], "fk_lineitem_orders"
        ),
        _anti_count(
            li, t["part"], li["l_partkey"] == t["part"]["p_partkey"], "fk_lineitem_part"
        ),
        _anti_count(
            li,
            t["supplier"],
            li["l_suppkey"] == t["supplier"]["s_suppkey"],
            "fk_lineitem_supplier",
        ),
        _anti_count(
            ords, cust, ords["o_custkey"] == cust["c_custkey"], "fk_orders_customer"
        ),
        ords.agg(
            F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("n_violations")
        ).select(F.lit("not_null_orders_custkey").alias("constraint_name"), "n_violations"),
        # Null-safe composite distinct: count_distinct(a, b) skips rows where
        # ANY argument is NULL (exactly the dirty rows an audit exists to
        # count), so the distinct count comes from a groupBy-style DISTINCT
        # subquery — NULL keys group together, matching the oracle's
        # SELECT DISTINCT. Two 1-row aggregates, broadcast crossJoin.
        li.agg(F.count(F.lit(1)).alias("n_total"))
        .crossJoin(
            li.select("l_orderkey", "l_linenumber")
            .distinct()
            .agg(F.count(F.lit(1)).alias("n_distinct"))
        )
        .select(
            F.lit("unique_lineitem_order_line").alias("constraint_name"),
            (F.col("n_total") - F.col("n_distinct")).alias("n_violations"),
        ),
        ords.agg(
            (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))).alias(
                "n_violations"
            )
        ).select(F.lit("unique_orders_orderkey").alias("constraint_name"), "n_violations"),
    ]
    return reduce(DataFrame.unionAll, checks).orderBy("constraint_name")


# --------------------------------------------------------- cascading erasure

_CASCADE_ORACLE = """
WITH victims AS (
  SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0
),
dead_orders AS (
  SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM victims)
),
dead_lines AS (
  SELECT l_orderkey, l_linenumber FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM dead_orders)
)
SELECT * FROM (
  SELECT 'customer' AS table_name,
         (SELECT count(*) FROM customer) AS n_before,
         (SELECT count(*) FROM victims) AS n_deleted,
         (SELECT count(*) FROM customer) - (SELECT count(*) FROM victims) AS n_after
  UNION ALL
  SELECT 'lineitem',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM dead_lines),
         (SELECT count(*) FROM lineitem) - (SELECT count(*) FROM dead_lines)
  UNION ALL
  SELECT 'orders',
         (SELECT count(*) FROM orders),
         (SELECT count(*) FROM dead_orders),
         (SELECT count(*) FROM orders) - (SELECT count(*) FROM dead_orders)
)
ORDER BY table_name
"""


@register("mutation_cascade_delete", oracle=_CASCADE_ORACLE, tags=("governance", "mutation"))
def mutation_cascade_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade: erase a victim key set (every 97th
    customer) and everything transitively reachable through declared FKs
    (their orders, those orders' lineitems), reporting per-table
    before/deleted/after counts — the audit record an erasure job must
    emit. The reference deletes one collection at a time with no cascade
    (index.js:1239-1247); referential erasure is the compliant version.

    Plan: the cascade is two chained semi-joins (orders ⋉ victims,
    lineitem ⋉ dead-orders); each deleted set is then only COUNTED — the
    surviving relation, were it materialized, is the `left_anti` twin of
    the same join, the exact plan `mutation_delete_anti` ships. Victim
    sets are SF-proportional, so no broadcast hints — AQE chooses. Counts
    are partial-agg'd; nothing but 1-row aggregates reaches the union."""
    t = load_tables(spark, sf_dir)
    cust, ords, li = t["customer"], t["orders"], t["lineitem"]
    victims = cust.filter(F.col("c_custkey") % 97 == 0).select("c_custkey")
    dead_orders = ords.join(
        victims, ords["o_custkey"] == victims["c_custkey"], "left_semi"
    ).select("o_orderkey")
    dead_lines = li.join(
        dead_orders, li["l_orderkey"] == dead_orders["o_orderkey"], "left_semi"
    ).select("l_orderkey", "l_linenumber")

    def report(name: str, full: DataFrame, dead: DataFrame) -> DataFrame:
        total = full.agg(F.count(F.lit(1)).alias("n_before"))
        gone = dead.agg(F.count(F.lit(1)).alias("n_deleted"))
        return total.crossJoin(F.broadcast(gone)).select(
            F.lit(name).alias("table_name"),
            "n_before",
            "n_deleted",
            (F.col("n_before") - F.col("n_deleted")).alias("n_after"),
        )

    return (
        report("customer", cust, victims)
        .unionAll(report("lineitem", li, dead_lines))
        .unionAll(report("orders", ords, dead_orders))
        .orderBy("table_name")
    )


# -------------------------------------------------- duplicate-payment scan

_DUP_PAY_ORACLE = """
WITH o AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CAST(o_orderdate AS DATE) AS d
  FROM orders
),
pairs AS (
  SELECT a.o_custkey,
         abs(date_diff('day', a.d, b.d)) AS gap_days
  FROM o a JOIN o b
    ON a.o_custkey = b.o_custkey
   AND a.o_totalprice = b.o_totalprice
   AND a.o_orderkey < b.o_orderkey
   AND abs(date_diff('day', a.d, b.d)) <= 2
)
SELECT gap_days,
       count(*) AS n_suspect_pairs,
       count(DISTINCT o_custkey) AS n_customers
FROM pairs
GROUP BY gap_days
ORDER BY gap_days
"""


@register("orders_duplicate_payments", oracle=_DUP_PAY_ORACLE, tags=("governance", "join", "dedup"))
def orders_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-charge detection: order pairs from the same customer with
    the IDENTICAL total within 2 days — the double-submit / retry-billing
    scan every payments platform runs (the reference IS a coin-payments
    backend; its Stripe flow — intent at index.js:259-274, record at
    index.js:292-310 — has no such guard: a
    double-clicked checkout charges twice). Histogrammed by day gap.

    Plan: the self-join is keyed on (customer, exact amount) — a genuine
    EQUI-join; the 2-day window is a residual predicate evaluated inside
    each join group, and per-(customer, amount) group sizes are order
    counts per customer (TPC-H: ~10), so pair expansion is O(1) per key
    and one shuffle moves a 4-column pruned relation. The classic
    fuzzy-matching escalation (amount within epsilon -> band the amount
    like the similarity tiers band cosine space) keeps the same shape."""
    o = load_tables(spark, sf_dir)["orders"].select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.col("o_orderdate").cast("date").alias("d"),
    )
    a, b = o.alias("a"), o.alias("b")
    pairs = a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.o_totalprice") == F.col("b.o_totalprice"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
        & (
            F.abs(F.datediff(F.col("a.d"), F.col("b.d"))) <= 2
        ),
    ).select(
        F.col("a.o_custkey").alias("o_custkey"),
        F.abs(F.datediff(F.col("a.d"), F.col("b.d"))).alias("gap_days"),
    )
    return (
        pairs.groupBy("gap_days")
        .agg(
            F.count(F.lit(1)).alias("n_suspect_pairs"),
            F.count_distinct("o_custkey").alias("n_customers"),
        )
        .orderBy("gap_days")
    )


# ------------------------------------------------ differential privacy

_DP_EPSILON = 0.5  # privacy budget; Laplace scale b = sensitivity/eps = 2.0

_DP_ORACLE = f"""
WITH counts AS (
  SELECT lang, count(*) AS n_true FROM documents GROUP BY lang
),
seeded AS (
  SELECT lang, n_true,
         CAST(('0x' || substr(md5('dp:' || lang), 1, 8)) AS UBIGINT)
           / 4294967296.0 AS u
  FROM counts
),
noised AS (
  SELECT lang, n_true, u,
         round(-(1.0 / {_DP_EPSILON})
               * (CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
               * ln(1.0 - 2.0 * abs(u - 0.5)), 4) AS noise
  FROM seeded
)
SELECT lang, n_true, noise,
       round(n_true + noise, 4) AS n_noisy,
       CAST({_DP_EPSILON} AS DOUBLE) AS epsilon
FROM noised
ORDER BY lang
"""


@register("privacy_dp_lang_counts", oracle=_DP_ORACLE, tags=("governance", "privacy"))
def privacy_dp_lang_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private per-language counts: the Laplace mechanism
    (sensitivity 1 for a counting query, scale 1/epsilon) applied to the
    language census — the release pattern for sharing corpus statistics
    without exposing any single document's membership. The noise draw is
    SEEDED (inverse-CDF over an md5-derived uniform per group), which is
    how production DP systems make releases reproducible/auditable — and
    what makes this oracle-EXACT: both engines derive the identical
    uniform, apply the identical inverse CDF, and round identically.
    (True n_true is emitted alongside for the oracle check; a real
    release drops that column — the mechanism, not the redaction, is
    what is under test.)

    Plan: one partial-agg'd census, map-side noise arithmetic on the
    lang-cardinality result. Composes with any census in the registry:
    the mechanism is a projection."""
    docs = load_tables(spark, sf_dir)["documents"]
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_true"))
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit("dp:"), F.col("lang"))), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    noise = F.round(
        -(1.0 / _DP_EPSILON)
        * F.when(u >= 0.5, 1.0).otherwise(-1.0)
        * F.log(1.0 - 2.0 * F.abs(u - 0.5)),
        4,
    )
    return (
        counts.select(
            "lang",
            "n_true",
            noise.alias("noise"),
            F.round(F.col("n_true") + noise, 4).alias("n_noisy"),
            F.lit(_DP_EPSILON).alias("epsilon"),
        )
        .orderBy("lang")
    )


# ------------------------------------------------------ Benford's-law audit

_BENFORD_ORACLE = """
WITH digits AS (
  SELECT CAST(floor(o_totalprice / power(10.0, floor(log10(o_totalprice))))
              AS BIGINT) AS d
  FROM orders WHERE o_totalprice > 0
),
tot AS (SELECT count(*) AS n FROM digits),
obs AS (
  SELECT d, count(*) AS n_obs FROM digits GROUP BY d
)
SELECT obs.d AS digit,
       n_obs,
       round(n_obs * 1.0 / tot.n, 6) AS p_observed,
       round(log10(1.0 + 1.0 / obs.d), 6) AS p_benford,
       round(abs(n_obs * 1.0 / tot.n - log10(1.0 + 1.0 / obs.d)), 6)
         AS abs_dev
FROM obs, tot
ORDER BY digit
"""


@register("orders_benford_audit", oracle=_BENFORD_ORACLE, tags=("governance", "agg", "stats"))
def orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals: observed
    first-significant-digit frequencies against the log10(1 + 1/d)
    expectation — the forensic-accounting screen for fabricated or
    systematically-generated amounts (real transactional money follows
    Benford closely; invented numbers and uniform generators do not —
    which the FIXTURE's uniform generator itself demonstrates: this
    audit flags synthetic data as synthetic, reported via abs_dev).

    Plan: the digit map is floor(v / 10^floor(log10 v)) inside codegen —
    map-only; the census is a 9-row groupBy crossed with the 1-row
    total. Deviations compare quantities computed from identical
    integers and IEEE log10 on both engines, rounded before output."""
    orders = load_tables(spark, sf_dir)["orders"].filter(F.col("o_totalprice") > 0)
    digits = orders.select(
        F.floor(
            F.col("o_totalprice")
            / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
        ).cast("bigint").alias("d")
    )
    tot = digits.agg(F.count(F.lit(1)).alias("n"))
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n_obs"))
    p_obs = F.col("n_obs") / F.col("n")
    p_ben = F.log10(1.0 + 1.0 / F.col("d"))
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("digit"),
            "n_obs",
            F.round(p_obs, 6).alias("p_observed"),
            F.round(p_ben, 6).alias("p_benford"),
            F.round(F.abs(p_obs - p_ben), 6).alias("abs_dev"),
        )
        .orderBy("digit")
    )


# ------------------------------------------------------- k-anonymity census

_K_ANON = 5

_K_ANON_ORACLE = f"""
WITH eq AS (
  SELECT c_mktsegment, n_nationkey.n_name AS nation, count(*) AS class_size
  FROM customer c
  JOIN (SELECT n_nationkey, n_name FROM nation) n_nationkey
    ON c.c_nationkey = n_nationkey.n_nationkey
  GROUP BY 1, 2
)
SELECT CAST(floor(log2(class_size)) AS BIGINT) AS size_pow2,
       count(*) AS n_classes,
       CAST(sum(class_size) AS BIGINT) AS n_rows,
       count(*) FILTER (WHERE class_size < {_K_ANON}) AS n_violating_classes,
       CAST(coalesce(sum(class_size) FILTER (WHERE class_size < {_K_ANON}), 0)
            AS BIGINT) AS n_reidentifiable_rows
FROM eq
GROUP BY 1
ORDER BY size_pow2
"""


@register("privacy_k_anonymity", oracle=_K_ANON_ORACLE, tags=("governance", "privacy", "agg"))
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity census over the (market segment, nation)
    quasi-identifier pair: equivalence-class sizes histogrammed in log2
    buckets with the k=5 violation counts — the release-readiness check
    a dataset passes BEFORE publication (a class of size < k means those
    rows are re-identifiable by the quasi-identifiers alone; the fix is
    generalization/suppression of exactly the violating classes, which
    this census enumerates by bucket). Complements
    `privacy_dp_lang_counts` (aggregate-release protection) and
    `pii_scrub` (direct-identifier removal) as the third leg of the
    governance stand: quasi-identifier protection.

    Plan: one broadcast dimension join (nation is 25 rows at every SF),
    ONE partial-agg'd groupBy on the quasi-identifier pair, then a
    dozen-bucket histogram — the equivalence-class relation is
    |segments|×|nations| (bounded), so everything after the first
    exchange is constant-sized at any corpus scale."""
    t = load_tables(spark, sf_dir)

    def count_if(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    eq = (
        t["customer"]
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_mktsegment", F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("class_size"))
    )
    return (
        eq.select(
            F.floor(F.log2("class_size")).cast("bigint").alias("size_pow2"),
            "class_size",
        )
        .groupBy("size_pow2")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("class_size").cast("bigint").alias("n_rows"),
            count_if(F.col("class_size") < _K_ANON).alias(
                "n_violating_classes"
            ),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("class_size") < _K_ANON, F.col("class_size")
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_reidentifiable_rows"),
        )
        .orderBy("size_pow2")
    )


# ------------------------------------------------------ l-diversity census

_L_DIV = 3

_L_DIV_ORACLE = f"""
WITH sens AS (
  SELECT c_mktsegment,
         n.n_name AS nation,
         CASE WHEN c_acctbal < 0 THEN 'debt'
              WHEN c_acctbal < 3000 THEN 'low'
              WHEN c_acctbal < 7000 THEN 'mid'
              ELSE 'high' END AS sensitive
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
),
cell AS (
  SELECT c_mktsegment, nation, sensitive, count(*) AS n
  FROM sens GROUP BY 1, 2, 3
),
eq AS (
  SELECT c_mktsegment, nation,
         count(*) AS l_distinct,
         CAST(sum(n) AS BIGINT) AS class_size,
         CAST(max(n) AS BIGINT) AS top_freq
  FROM cell GROUP BY 1, 2
)
SELECT l_distinct,
       count(*) AS n_classes,
       CAST(sum(class_size) AS BIGINT) AS n_rows,
       count(*) FILTER (WHERE l_distinct < {_L_DIV}) AS n_violating_classes,
       CAST(coalesce(sum(class_size) FILTER (WHERE l_distinct < {_L_DIV}), 0)
            AS BIGINT) AS n_exposed_rows,
       round(max(CAST(top_freq AS DOUBLE) / CAST(class_size AS DOUBLE)), 6)
         AS max_homogeneity
FROM eq
GROUP BY l_distinct
ORDER BY l_distinct
"""


@register("privacy_l_diversity", oracle=_L_DIV_ORACLE, tags=("governance", "privacy", "agg"))
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity census (Machanavajjhala et al. 2007) — the attack
    k-anonymity misses: a class can hold >= k rows yet expose everyone
    if they all share one SENSITIVE value (homogeneity attack). Over the
    same (market segment, nation) quasi-identifier pair as
    `privacy_k_anonymity`, with account-balance band as the sensitive
    attribute: per equivalence class, count distinct sensitive values
    (the class's l) and its dominant-value share; the census buckets
    classes by l with violation counts at l=3 and the worst homogeneity
    ratio per bucket (1.0 = a fully homogeneous class — re-identification
    without even singling the row out). Fourth leg of the governance
    stand after k-anonymity, DP release, and PII scrub.

    Plan: one broadcast dimension join, then a two-level aggregation
    tree — (qi-pair, sensitive) cells, folded to qi-pair classes, folded
    to an l-histogram. The cell relation is bounded by
    |segments| x |nations| x |bands|, so everything after the first
    partial-agg'd exchange is constant-sized at any SF; the homogeneity
    ratio divides two exact integers, rounded before output."""
    t = load_tables(spark, sf_dir)
    sens = (
        t["customer"]
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "c_mktsegment",
            F.col("n_name").alias("nation"),
            F.when(F.col("c_acctbal") < 0, "debt")
            .when(F.col("c_acctbal") < 3000, "low")
            .when(F.col("c_acctbal") < 7000, "mid")
            .otherwise("high")
            .alias("sensitive"),
        )
    )
    cell = sens.groupBy("c_mktsegment", "nation", "sensitive").agg(
        F.count(F.lit(1)).alias("n")
    )
    eq = cell.groupBy("c_mktsegment", "nation").agg(
        F.count(F.lit(1)).alias("l_distinct"),
        F.sum("n").cast("bigint").alias("class_size"),
        F.max("n").cast("bigint").alias("top_freq"),
    )
    return (
        eq.groupBy("l_distinct")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("class_size").cast("bigint").alias("n_rows"),
            F.sum(
                F.when(F.col("l_distinct") < _L_DIV, 1).otherwise(0)
            ).alias("n_violating_classes"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("l_distinct") < _L_DIV, F.col("class_size")
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_exposed_rows"),
            F.round(
                F.max(
                    F.col("top_freq").cast("double")
                    / F.col("class_size").cast("double")
                ),
                6,
            ).alias("max_homogeneity"),
        )
        .orderBy("l_distinct")
    )


# ----------------------------------------------------- t-closeness census

_T_CLOSE_NUM, _T_CLOSE_DEN = 1, 4  # threshold t = 0.25

_T_CLOSE_ORACLE = """
WITH sens AS (
  SELECT c_mktsegment, n.n_name AS nation,
         CASE WHEN c_acctbal < 0 THEN 0
              WHEN c_acctbal < 3000 THEN 1
              WHEN c_acctbal < 7000 THEN 2
              ELSE 3 END AS band
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
),
cells AS (
  SELECT c_mktsegment, nation, band, count(*) AS n
  FROM sens GROUP BY 1, 2, 3
),
classes AS (
  SELECT c_mktsegment, nation, CAST(count(*) AS BIGINT) AS class_size
  FROM sens GROUP BY 1, 2
),
gband AS (
  SELECT band, CAST(count(*) AS BIGINT) AS g FROM sens GROUP BY band
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM sens),
grid AS (
  SELECT cl.c_mktsegment, cl.nation, cl.class_size, gl.band,
         CAST(coalesce(ce.n, 0) AS BIGINT) * tot.total
           - gl.g * cl.class_size AS num
  FROM classes cl
  CROSS JOIN gband gl
  CROSS JOIN tot
  LEFT JOIN cells ce
    ON ce.c_mktsegment = cl.c_mktsegment AND ce.nation = cl.nation
   AND ce.band = gl.band
),
cum AS (
  SELECT c_mktsegment, nation, class_size, band,
         sum(num) OVER (
           PARTITION BY c_mktsegment, nation ORDER BY band
         ) AS cum_num
  FROM grid
),
t AS (
  SELECT c_mktsegment, nation, class_size,
         CAST(sum(abs(cum_num)) AS BIGINT) AS t_num
  FROM cum GROUP BY 1, 2, 3
)
SELECT t.c_mktsegment, t.nation, t.class_size,
       round(CAST(t_num AS DOUBLE)
             / CAST(3 * class_size * tot.total AS DOUBLE), 6) AS t_closeness,
       CASE WHEN 4 * t_num > 3 * class_size * tot.total
            THEN 1 ELSE 0 END AS violates
FROM t CROSS JOIN tot
ORDER BY t.c_mktsegment, t.nation
"""


@register("privacy_t_closeness", oracle=_T_CLOSE_ORACLE, tags=("governance", "privacy", "agg"))
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness (Li et al. 2007) — the attack l-diversity misses: a
    class can hold many DISTINCT sensitive values yet still leak if its
    distribution is skewed far from the table's (skewness attack). Per
    (segment, nation) class, the Earth Mover's Distance between the
    class's account-band distribution and the global one over the
    ordered 4-band domain — EMD on an ordered domain is the mean of
    absolute cumulative differences — flagged at t > 0.25. Completes the
    quasi-identifier release gate: k-anonymity (size), l-diversity
    (variety), t-closeness (distribution).

    Exactness: each cumulative difference is carried as the integer
    numerator n_j*total - g_j*size over the common denominator
    size*total, so the EMD sum and the threshold test (cross-multiplied)
    are exact integer arithmetic; the single division happens once,
    rounded, at output.

    Plan: one fact-table agg to dimension-bounded cells, a 4-row band
    grid crossed with the class relation (both bounded), a partitioned
    window for the cumulative walk, and 1-row total broadcasts — after
    the first exchange nothing is SF-proportional."""
    t = load_tables(spark, sf_dir)
    sens = (
        t["customer"]
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "c_mktsegment",
            F.col("n_name").alias("nation"),
            F.when(F.col("c_acctbal") < 0, 0)
            .when(F.col("c_acctbal") < 3000, 1)
            .when(F.col("c_acctbal") < 7000, 2)
            .otherwise(3)
            .alias("band"),
        )
    )
    cells = sens.groupBy("c_mktsegment", "nation", "band").agg(
        F.count(F.lit(1)).alias("n")
    )
    classes = sens.groupBy("c_mktsegment", "nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("class_size")
    )
    glob = sens.groupBy("band").agg(F.count(F.lit(1)).cast("bigint").alias("g"))
    tot = sens.agg(F.count(F.lit(1)).cast("bigint").alias("total"))
    grid = (
        classes.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(tot))
        .join(cells, ["c_mktsegment", "nation", "band"], "left")
        .select(
            "c_mktsegment",
            "nation",
            "class_size",
            "band",
            "total",
            (
                F.coalesce(F.col("n"), F.lit(0)).cast("bigint") * F.col("total")
                - F.col("g") * F.col("class_size")
            ).alias("num"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("c_mktsegment", "nation")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "c_mktsegment",
        "nation",
        "class_size",
        "total",
        F.sum("num").over(w).alias("cum_num"),
    )
    tt = cum.groupBy("c_mktsegment", "nation", "class_size", "total").agg(
        F.sum(F.abs(F.col("cum_num"))).cast("bigint").alias("t_num")
    )
    return tt.select(
        "c_mktsegment",
        "nation",
        "class_size",
        F.round(
            F.col("t_num").cast("double")
            / (3 * F.col("class_size") * F.col("total")).cast("double"),
            6,
        ).alias("t_closeness"),
        F.when(
            4 * F.col("t_num") > 3 * F.col("class_size") * F.col("total"), 1
        )
        .otherwise(0)
        .alias("violates"),
    ).orderBy("c_mktsegment", "nation")
