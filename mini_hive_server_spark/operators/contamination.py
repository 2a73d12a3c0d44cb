"""Contamination control and text cleaning over `documents` — the corpus
-hygiene operations a training-data build runs between raw ingest and
packing: benchmark decontamination (n-gram overlap against a held-out eval
set), PII scrubbing, and intra-document repetition removal.

All three are pure built-in-expression plans (split / slice / transform /
regexp_replace / window-free aggregations) — zero Python in the hot path,
and each is oracle-paired via the registry determinism rules (md5
fingerprints instead of emitting full rewritten text keeps the comparison
compact while pinning every output character).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables, parallelize_scan
from ..registry import register

from ._text import WORDS_DUCK as _WORDS_DUCK  # noqa: E402
from ._text import WORDS_SPARK as _WORDS_SPARK  # noqa: E402

# --------------------------------------------- n-gram decontamination

_NGRAM = 8  # tokens per contamination shingle (13 in most published
# pipelines; 8 here so the short synthetic fixture docs produce overlaps)
_EVAL_MOD = 97  # doc_id % 97 == 0 → held-out eval set

_DECONTAM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, {_WORDS_DUCK} AS arr FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(arr[i:i+{_NGRAM - 1}], ' ') AS g
  FROM toks, unnest(generate_series(1, len(arr) - {_NGRAM - 1})) AS t(i)
  WHERE len(arr) >= {_NGRAM}
),
eval_grams AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % {_EVAL_MOD} = 0
),
contam AS (
  SELECT DISTINCT doc_id FROM grams
  WHERE doc_id % {_EVAL_MOD} <> 0 AND g IN (SELECT g FROM eval_grams)
)
SELECT lang,
       count(*) AS n_train,
       count(*) FILTER (WHERE doc_id IN (SELECT doc_id FROM contam))
         AS n_contaminated,
       count(*) FILTER (WHERE doc_id NOT IN (SELECT doc_id FROM contam))
         AS n_kept
FROM toks
WHERE doc_id % {_EVAL_MOD} <> 0
GROUP BY lang
ORDER BY lang
"""


@register("decontaminate_ngram", oracle=_DECONTAM_ORACLE, tags=("llm", "dedup", "pipeline"))
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: drop training documents that share any
    token 8-gram with the held-out eval split (here doc_id % 97 == 0; in
    production, the benchmark suites). Reports per-language train /
    contaminated / kept counts.

    Scale shape: gram generation is a map-only explode on both sides; the
    eval side is benchmark-sized (MBs, not corpus-sized), so its distinct
    gram set broadcasts and the contamination probe is a broadcast
    semi-join the 100 TB training side streams through without shuffling.
    The only shuffles are the eval-gram distinct (tiny) and the final
    per-language aggregation (map-side partial). This is the standard
    n-gram decontamination pass (GPT-3 appendix C / PaLM style) expressed
    as one Catalyst plan."""
    docs = parallelize_scan(
        load_tables(spark, sf_dir)["documents"].select("doc_id", "lang", "text"),
        "doc_id",
    )
    toks = docs.select("doc_id", "lang", F.expr(_WORDS_SPARK).alias("arr"))
    grams = toks.filter(F.size("arr") >= _NGRAM).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(arr) - {_NGRAM - 1}),"
                f" i -> concat_ws(' ', slice(arr, i, {_NGRAM})))"
            )
        ).alias("g"),
    )
    is_eval = F.col("doc_id") % _EVAL_MOD == 0
    eval_grams = grams.filter(is_eval).select("g").distinct()
    contam = (
        grams.filter(~is_eval)
        .join(F.broadcast(eval_grams), "g")
        .select("doc_id")
        .distinct()
    )
    train = toks.filter(~is_eval).select("doc_id", "lang")
    flagged = train.join(
        contam.withColumn("is_contam", F.lit(1)), "doc_id", "left"
    )
    return (
        flagged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.count("is_contam").alias("n_contaminated"),
            (F.count(F.lit(1)) - F.count("is_contam")).alias("n_kept"),
        )
        .orderBy("lang")
    )


# ------------------------------------------------------- PII scrubbing

# Patterns restricted to syntax Java regex and RE2 interpret identically
# (character classes, +, bounded repeat) so Spark and DuckDB agree byte
# -for-byte.
_EMAIL_RE = "[a-z0-9.]+@[a-z][a-z.]+[a-z]"
_NUM_RE = "[0-9]{7,}"

# The synthetic fixture text contains no PII, so the query plants a
# deterministic contact line per document and then scrubs it — the scrub
# path (not the planting) is what production runs on raw crawl text.
_AUGMENT_DUCK = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com phone ' || CAST(doc_id * 7919 + 1000000 AS VARCHAR)"
)

_PII_ORACLE = f"""
WITH aug AS (
  SELECT doc_id, {_AUGMENT_DUCK} AS raw FROM documents WHERE doc_id < 100
),
scrubbed AS (
  SELECT doc_id,
         len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS n_emails,
         len(regexp_extract_all(
               regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_NUM_RE}')) AS n_numbers,
         regexp_replace(
           regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
           '{_NUM_RE}', '<NUM>', 'g') AS clean
  FROM aug
)
SELECT doc_id,
       CAST(n_emails AS BIGINT) AS n_emails,
       CAST(n_numbers AS BIGINT) AS n_numbers,
       md5(clean) AS clean_fp
FROM scrubbed
ORDER BY doc_id
"""


@register("text_pii_scrub", oracle=_PII_ORACLE, tags=("llm", "text", "pipeline"))
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: replace email addresses and long digit runs with
    typed placeholders, reporting per-document replacement counts and an
    md5 fingerprint of the cleaned text (pins every byte of the rewrite
    without shipping full documents through the comparison).

    Scale shape: map-only — two regexp_replace passes and two
    regexp_count, all JVM codegen; at 100 TB this fuses into the ingest
    scan with zero shuffles (the presentation sort exists only for the
    oracle's total order). Emails are scrubbed before digit runs so the
    digits inside an address are not double-counted."""
    docs = load_tables(spark, sf_dir)["documents"].filter(F.col("doc_id") < 100)
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com phone "),
        (F.col("doc_id") * 7919 + 1000000).cast("string"),
    )
    aug = docs.select("doc_id", raw.alias("raw"))
    no_email = F.regexp_replace(F.col("raw"), _EMAIL_RE, "<EMAIL>")
    return aug.select(
        "doc_id",
        F.regexp_count(F.col("raw"), F.lit(_EMAIL_RE))
        .cast("long")
        .alias("n_emails"),
        F.regexp_count(no_email, F.lit(_NUM_RE)).cast("long").alias("n_numbers"),
        F.md5(F.regexp_replace(no_email, _NUM_RE, "<NUM>")).alias("clean_fp"),
    ).orderBy("doc_id")


# ------------------------------------- intra-document repetition removal

_CHUNK = 8  # tokens per chunk; repeated chunks beyond the first are dropped

_CHUNK_DEDUP_ORACLE = f"""
WITH arrtab AS (
  SELECT doc_id, {_WORDS_DUCK} AS arr FROM documents WHERE doc_id < 100
),
chunks AS (
  SELECT doc_id, i,
         array_to_string(arr[(i * {_CHUNK} + 1):((i + 1) * {_CHUNK})], ' ')
           AS chunk
  FROM arrtab,
       unnest(generate_series(
         0, CAST(ceil(len(arr) / {_CHUNK}.0) AS INT) - 1)) AS t(i)
),
firsts AS (
  SELECT doc_id, chunk, min(i) AS mi FROM chunks GROUP BY doc_id, chunk
)
SELECT f.doc_id,
       any_value(a.n_chunks) AS n_chunks,
       count(*) AS n_unique_chunks,
       md5(string_agg(f.chunk, ' ' ORDER BY f.mi)) AS dedup_fp
FROM firsts f
JOIN (SELECT doc_id, CAST(ceil(len(arr) / {_CHUNK}.0) AS BIGINT) AS n_chunks
      FROM arrtab) a USING (doc_id)
GROUP BY f.doc_id
ORDER BY f.doc_id
"""


@register("text_chunk_dedup", oracle=_CHUNK_DEDUP_ORACLE, tags=("llm", "text", "dedup"))
def text_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition removal: split each document into
    fixed-size token chunks, keep only the FIRST occurrence of each
    repeated chunk, and reassemble in original order — the within-doc
    analogue of corpus dedup (boilerplate headers, navigation text,
    template repeats). Output is chunk counts plus an md5 of the
    reassembled text.

    Scale shape: per-document work only — chunking is a map-only
    transform/slice; first-occurrence selection is one hash aggregation
    keyed (doc_id, chunk); reassembly is sort_array over an
    in-aggregation collect_list, which is safe because chunk lists are
    document-sized (KBs), never corpus-sized. No window over a global
    order, so documents process independently — embarrassingly parallel
    at 100 TB."""
    docs = parallelize_scan(
        load_tables(spark, sf_dir)["documents"]
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text"),
        "doc_id",
    )
    arrtab = docs.select("doc_id", F.expr(_WORDS_SPARK).alias("arr"))
    chunks = arrtab.select(
        "doc_id",
        F.expr(f"CAST(ceil(size(arr) / {_CHUNK}.0) AS BIGINT)").alias("n_chunks"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, CAST(ceil(size(arr) / {_CHUNK}.0) AS INT) - 1),"
                f" i -> concat_ws(' ', slice(arr, i * {_CHUNK} + 1, {_CHUNK})))"
            )
        ).alias("i", "chunk"),
    )
    firsts = chunks.groupBy("doc_id", "chunk").agg(
        F.min("i").alias("mi"), F.first("n_chunks").alias("n_chunks")
    )
    return (
        firsts.groupBy("doc_id")
        .agg(
            F.first("n_chunks").alias("n_chunks"),
            F.count(F.lit(1)).alias("n_unique_chunks"),
            F.md5(
                F.expr(
                    "array_join(transform(array_sort(collect_list(struct(mi, chunk))),"
                    " x -> x.chunk), ' ')"
                )
            ).alias("dedup_fp"),
        )
        .orderBy("doc_id")
    )
