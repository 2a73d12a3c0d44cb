"""Substring-level deduplication and fingerprint selection.

Document-level dedup (exact / MinHash / SimHash — `operators/dedup.py`)
misses the dominant failure mode in web-scale training data: long spans
repeated across otherwise-distinct documents (boilerplate, licenses,
quoted passages). The published treatment is suffix-array substring
dedup (Lee et al. 2021, "Deduplicating Training Data Makes Language
Models Better"); a suffix array is a single-machine construction, so the
distributed approximation every large pipeline actually ships is
fixed-width rolling windows: hash every W-token window, find windows
seen in more than one document, and report/remove the covered spans.

Scale shape (the reason this form wins at 100 TB):

* window generation is a map-only explode — no shuffle, no state;
* the "seen in >1 doc" pass is one hash aggregation keyed on the window
  hash (partial map-side count-distinct via the (wh, doc_id) pre-agg);
* the flag-back join is keyed on the same window hash, so AQE plans it
  from the measured size of the repeated set (duplicate-volume-
  proportional, NOT corpus-proportional — never statically broadcast);
* only 16-byte hashes shuffle, never the W-token text.

A true suffix array finds arbitrary-length repeats; fixed-W windows
find every repeat of length >= W (any such repeat contains a repeated
W-window) at 1/W-th the candidate volume of per-position suffixes.

`text_winnowing_fingerprints` adds the offset-robust selection variant
(Schleimer et al. 2003): fixed windows break when one token shifts every
subsequent window; winnowed window-minima survive insertions, at ~2/(w+1)
the fingerprint density.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables, parallelize_scan
from ..persistence import tracked_persist
from ..registry import register

from ._text import WORDS_DUCK as _WORDS_DUCK  # noqa: E402
from ._text import WORDS_SPARK as _WORDS_SPARK  # noqa: E402

_W = 12  # span window width in tokens (50 in published pipelines; 12 so
# the 10-99-word synthetic fixture docs carry multi-window spans)

_SPAN_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source, {_WORDS_DUCK} AS arr FROM documents
),
wins AS (
  SELECT doc_id, source,
         md5(array_to_string(arr[i:i+{_W - 1}], ' ')) AS wh
  FROM toks, unnest(generate_series(1, len(arr) - {_W - 1})) AS t(i)
  WHERE len(arr) >= {_W}
),
rep AS (
  SELECT wh FROM wins GROUP BY wh HAVING count(DISTINCT doc_id) > 1
),
per_doc AS (
  SELECT w.doc_id,
         any_value(w.source) AS source,
         count(*) AS n_pos,
         count(r.wh) AS n_rep_pos
  FROM wins w LEFT JOIN rep r ON w.wh = r.wh
  GROUP BY w.doc_id
),
src_docs AS (
  SELECT source, count(*) AS n_docs FROM toks GROUP BY source
),
src_flag AS (
  SELECT source,
         count(*) AS n_docs_windowed,
         count(*) FILTER (WHERE n_rep_pos > 0) AS n_docs_flagged,
         CAST(sum(n_pos) AS BIGINT) AS n_windows,
         CAST(sum(n_rep_pos) AS BIGINT) AS n_rep_windows
  FROM per_doc GROUP BY source
),
src_distinct AS (
  SELECT w.source, count(DISTINCT w.wh) AS n_distinct_rep
  FROM wins w JOIN rep r ON w.wh = r.wh
  GROUP BY w.source
)
SELECT d.source,
       d.n_docs,
       coalesce(f.n_docs_flagged, 0) AS n_docs_flagged,
       coalesce(f.n_windows, 0) AS n_windows,
       coalesce(f.n_rep_windows, 0) AS n_rep_windows,
       coalesce(x.n_distinct_rep, 0) AS n_distinct_rep
FROM src_docs d
LEFT JOIN src_flag f ON d.source = f.source
LEFT JOIN src_distinct x ON d.source = x.source
ORDER BY d.source
"""


@register("text_span_dedup", oracle=_SPAN_ORACLE, tags=("llm", "dedup", "text"))
def text_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-span census: hash every W-token window, mark windows
    appearing in more than one document, and report per source how many
    documents carry at least one corpus-repeated span, how many window
    positions are repeated, and how many distinct repeated windows the
    source contributes — the decision table for substring-level dedup
    thresholds (the distributed approximation of Lee et al. 2021's
    suffix-array dedup; see module docstring for the scale argument).

    Plan: one map-only window explode; one hash agg on the window hash
    (the only corpus-wide shuffle); a hash-keyed flag-back join whose
    build side is duplicate-volume-proportional (AQE-sized, no static
    broadcast hint); then per-doc and per-source aggregations over
    already-tiny relations.
    """
    docs = parallelize_scan(
        load_tables(spark, sf_dir)["documents"].select("doc_id", "source", "text"),
        "doc_id",
    )
    toks = docs.select("doc_id", "source", F.expr(_WORDS_SPARK).alias("arr"))
    wins = (
        toks.filter(F.size("arr") >= _W)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(arr) - {_W - 1}),"
                    f" i -> md5(concat_ws(' ', slice(arr, i, {_W}))))"
                )
            ).alias("wh"),
        )
    )
    # wins feeds three consumers (repeated-set agg, flag-back join, the
    # per-source distinct) — persist so the explode runs once per query.
    wins = tracked_persist(wins)
    rep = tracked_persist(
        wins.groupBy("wh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("wh")
    )
    flagged = wins.join(rep.withColumn("is_rep", F.lit(1)), "wh", "left")
    per_doc = flagged.groupBy("doc_id").agg(
        F.first("source").alias("source"),
        F.count(F.lit(1)).alias("n_pos"),
        F.count("is_rep").alias("n_rep_pos"),
    )
    src_docs = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    src_flag = per_doc.groupBy("source").agg(
        F.sum(F.when(F.col("n_rep_pos") > 0, 1).otherwise(0)).alias(
            "n_docs_flagged"
        ),
        F.sum("n_pos").alias("n_windows"),
        F.sum("n_rep_pos").alias("n_rep_windows"),
    )
    src_distinct = (
        wins.join(rep, "wh")
        .groupBy("source")
        .agg(F.countDistinct("wh").alias("n_distinct_rep"))
    )
    return (
        src_docs.join(src_flag, "source", "left")
        .join(src_distinct, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_docs_flagged", F.lit(0)).alias("n_docs_flagged"),
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("n_rep_windows", F.lit(0)).alias("n_rep_windows"),
            F.coalesce("n_distinct_rep", F.lit(0)).alias("n_distinct_rep"),
        )
        .orderBy("source")
    )


# ----------------------------------------------- winnowing fingerprints

_WIN_K = 5  # tokens per k-gram
_WIN_W = 4  # hashes per winnowing window
_WIN_BIG = 1 << 62  # out-of-boundary sentinel: larger than any 32-bit code

_WINNOW_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source, {_WORDS_DUCK} AS arr FROM documents
),
grams AS (
  SELECT doc_id, source, CAST(i AS BIGINT) AS pos,
         ('0x' || substr(md5(array_to_string(arr[i:i+{_WIN_K - 1}], ' ')), 1, 8))::BIGINT AS kh
  FROM toks, unnest(generate_series(1, len(arr) - {_WIN_K - 1})) AS t(i)
  WHERE len(arr) >= {_WIN_K}
),
runs AS (
  SELECT doc_id, source, pos, kh,
         CASE WHEN coalesce(lag(kh, 1) OVER w, {_WIN_BIG}) > kh THEN
           CASE WHEN coalesce(lag(kh, 2) OVER w, {_WIN_BIG}) > kh THEN
             CASE WHEN coalesce(lag(kh, 3) OVER w, {_WIN_BIG}) > kh
                  THEN 3 ELSE 2 END
           ELSE 1 END
         ELSE 0 END AS lr,
         CASE WHEN coalesce(lead(kh, 1) OVER w, {_WIN_BIG}) > kh THEN
           CASE WHEN coalesce(lead(kh, 2) OVER w, {_WIN_BIG}) > kh THEN
             CASE WHEN coalesce(lead(kh, 3) OVER w, {_WIN_BIG}) > kh
                  THEN 3 ELSE 2 END
           ELSE 1 END
         ELSE 0 END AS rr
  FROM grams
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sel AS (
  SELECT DISTINCT doc_id, source, kh
  FROM runs WHERE lr + rr >= {_WIN_W - 1}
),
shared AS (
  SELECT kh FROM sel GROUP BY kh HAVING count(DISTINCT doc_id) > 1
)
SELECT s.source,
       count(DISTINCT s.doc_id) AS n_docs,
       count(*) AS n_fingerprints,
       count(sh.kh) AS n_shared,
       count(DISTINCT CASE WHEN sh.kh IS NOT NULL THEN s.doc_id END)
         AS n_docs_overlapping
FROM sel s LEFT JOIN shared sh ON s.kh = sh.kh
GROUP BY s.source
ORDER BY s.source
"""


@register("text_winnowing_fingerprints", oracle=_WINNOW_ORACLE, tags=("llm", "dedup", "text"))
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer et al. 2003 — the MOSS
    algorithm): hash every 5-token k-gram, then keep a hash iff it is the
    minimum of at least one 4-hash sliding window. Guarantee: any match
    of length >= w+k-1 = 8 tokens between two documents shares at least
    one selected fingerprint, at ~2/(w+1) the storage of all-gram
    fingerprinting — the offset-robust dedup/plagiarism signature
    (`text_span_dedup`'s fixed windows break under single-token
    insertions; winnowed minima survive them).

    The is-window-minimum test is O(1) per position: with (effectively
    collision-free) distinct hashes, kh[pos] is a window minimum iff its
    run of strictly-larger neighbors spans a full window — left_run +
    right_run >= w-1 — and runs capped at w-1 need exactly w-1 lags and
    w-1 leads, so selection is ONE window pass per document partition,
    no per-window explode (w-times fewer rows than materializing every
    window). Boundary positions treat out-of-range neighbors as +inf
    (selection on the padded extension; identical rule in both engines).

    Scale shape: gram hashing is a map-only explode; selection is one
    per-doc window sort; the shared-fingerprint census is one hash agg on
    the 8-byte fingerprint + a fingerprint-keyed flag-back join
    (duplicate-volume-proportional build side, AQE-sized) — the same
    corpus-wide shape as `text_span_dedup`, at winnowing density."""
    docs = parallelize_scan(
        load_tables(spark, sf_dir)["documents"].select("doc_id", "source", "text"),
        "doc_id",
    )
    toks = docs.select("doc_id", "source", F.expr(_WORDS_SPARK).alias("arr"))
    grams = toks.filter(F.size("arr") >= _WIN_K).select(
        "doc_id",
        "source",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, size(arr) - {_WIN_K - 1}),"
                f" i -> CAST(conv(substr(md5(concat_ws(' ', slice(arr, i, {_WIN_K}))), 1, 8), 16, 10) AS BIGINT))"
            )
        ).alias("pos", "kh"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")

    def _run(direction) -> "F.Column":
        n1, n2, n3 = (
            F.coalesce(direction("kh", j).over(w), F.lit(_WIN_BIG))
            for j in (1, 2, 3)
        )
        kh = F.col("kh")
        return (
            F.when(
                n1 > kh,
                F.when(n2 > kh, F.when(n3 > kh, 3).otherwise(2)).otherwise(1),
            ).otherwise(0)
        )

    sel = (
        grams.withColumn("lr", _run(F.lag))
        .withColumn("rr", _run(F.lead))
        .filter(F.col("lr") + F.col("rr") >= _WIN_W - 1)
        .select("doc_id", "source", "kh")
        .distinct()
    )
    sel = tracked_persist(sel)
    shared = (
        sel.groupBy("kh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("kh")
    )
    flagged = sel.join(shared.withColumn("is_shared", F.lit(1)), "kh", "left")
    return (
        flagged.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_fingerprints"),
            F.count("is_shared").alias("n_shared"),
            F.countDistinct(
                F.when(F.col("is_shared").isNotNull(), F.col("doc_id"))
            ).alias("n_docs_overlapping"),
        )
        .orderBy("source")
    )
