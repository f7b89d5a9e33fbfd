"""Transcript/event analogues of the reference's Java-side dataflow
operators (SURVEY.md §2A), each as a (Spark, DuckDB-oracle) pair.

| here                  | reference operator                                  |
|-----------------------|-----------------------------------------------------|
| coalesce_into_map     | A3 CoalesceIntoMap (PlanetSearchProfile.java:102-111)|
| multivalue_split      | A4 ;-split + trim + distinct (:119-136)             |
| classifier            | A6 case-when classifier (OsmFeatureClassifier.java:80-249)|
| prominence            | A7 scalar scoring (ProminenceCalculator.java:14-30) |
| number_parsing        | A8 dirty-number parse (OsmNumberParser.java:17-62)  |
| conv_merge            | A10 group-by-key merge (MinWayIdFinder.java:27-84)  |
| conv_cogroup          | A11 relation co-group w/ sum+min_by (:259-310,:407-448)|
| container_minby       | A13 min-by/arg-min (:725-737)                       |
| name_set_union        | A14 set-union agg (:727-739)                        |
| area_normalize        | A16 log-normalize (:672-678)                        |
| stable_turn_order     | window: stable turn ordering / dense doc ids (§2C)  |
| source_union          | set op: union of sources (MainClass.java:91-94)     |
| recency_window_boost  | B24 viewport/time-window boost (points_search.json:145-157)|
"""
from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import analysis as A
from .. import scoring as S
from ..transcripts import TRANSCRIPTS_CTE, transcripts_from_documents
from .logical import _register

# -- A3: first-non-empty coalesce of tag variants into a map -----------------
# analogue: per conversation, coalesce the first non-empty text per role into
# a role->snippet map (the reference coalesces name:<lang> variants).


@_register("coalesce_into_map", f"""
WITH {TRANSCRIPTS_CTE.strip()},
firsts AS (
  SELECT conv_id, role, min(turn_idx) AS first_turn
  FROM transcripts WHERE length(trim(text)) > 0
  GROUP BY conv_id, role
)
SELECT f.conv_id, f.role, CAST(f.first_turn AS BIGINT) AS first_turn,
       substr(t.text, 1, 40) AS snippet
FROM firsts f
JOIN transcripts t
  ON t.conv_id = f.conv_id AND t.role = f.role AND t.turn_idx = f.first_turn
""")
def q_coalesce_into_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    tx = transcripts_from_documents(spark, sf_dir)
    nz = tx.where(F.length(F.trim("text")) > 0)
    firsts = nz.groupBy("conv_id", "role").agg(
        F.min("turn_idx").alias("first_turn"))
    return (firsts.join(
        nz.select("conv_id", "role",
                  F.col("turn_idx").alias("first_turn"), "text"),
        ["conv_id", "role", "first_turn"])
        .select("conv_id", "role",
                F.col("first_turn").cast("long").alias("first_turn"),
                F.substring("text", 1, 40).alias("snippet")))


# -- A4: multi-value split + trim + distinct ---------------------------------

@_register("multivalue_split", """
SELECT doc_id,
       array_to_string(list_sort(list_distinct(
         list_filter(list_transform(string_split(text, ' the '), x -> trim(x)),
                     x -> length(x) > 0))), '|') AS alt_values
FROM documents
""")
def q_multivalue_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vals = F.array_sort(F.array_distinct(
        F.filter(F.transform(F.split("text", " the "), F.trim),
                 lambda x: F.length(x) > 0)))
    return docs.select("doc_id", F.array_join(vals, "|").alias("alt_values"))


# -- A6: case-when classifier (the 50-way enum analogue) ----------------------

@_register("classifier", """
SELECT event_id,
       CASE
         WHEN event_type = 'error' AND value >= 100 THEN 'critical-error'
         WHEN event_type = 'error' THEN 'error'
         WHEN event_type = 'purchase' AND value >= 50 THEN 'big-purchase'
         WHEN event_type = 'purchase' THEN 'purchase'
         WHEN event_type IN ('click', 'view') AND value < 10 THEN 'low-engagement'
         WHEN event_type IN ('click', 'view') THEN 'engagement'
         WHEN event_type = 'signup' THEN 'conversion'
         ELSE 'other'
       END AS feature_class,
       CASE
         WHEN event_type = 'error' AND value >= 100 THEN 0.9
         WHEN event_type = 'error' THEN 0.7
         WHEN event_type = 'purchase' AND value >= 50 THEN 0.8
         WHEN event_type = 'purchase' THEN 0.6
         WHEN event_type IN ('click', 'view') AND value < 10 THEN 0.1
         WHEN event_type IN ('click', 'view') THEN 0.3
         WHEN event_type = 'signup' THEN 0.75
         ELSE 0.0
       END AS base_score
FROM events
""")
def q_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    et, v = F.col("event_type"), F.col("value")
    cls = (F.when((et == "error") & (v >= 100), "critical-error")
            .when(et == "error", "error")
            .when((et == "purchase") & (v >= 50), "big-purchase")
            .when(et == "purchase", "purchase")
            .when(et.isin("click", "view") & (v < 10), "low-engagement")
            .when(et.isin("click", "view"), "engagement")
            .when(et == "signup", "conversion")
            .otherwise("other"))
    score = (F.when((et == "error") & (v >= 100), 0.9)
              .when(et == "error", 0.7)
              .when((et == "purchase") & (v >= 50), 0.8)
              .when(et == "purchase", 0.6)
              .when(et.isin("click", "view") & (v < 10), 0.1)
              .when(et.isin("click", "view"), 0.3)
              .when(et == "signup", 0.75)
              .otherwise(0.0))
    return ev.select("event_id", cls.alias("feature_class"),
                     score.alias("base_score"))


# -- A7: prominence formula (floor + weighted base/log-norm/meta, clamped) ----

_LOG1P_200 = repr(math.log1p(200.0))


@_register("prominence", f"""
SELECT event_id,
       {S.SQL_QUANTIZE.format(x=(
           "least(1.0, greatest(0.05, 0.05"
           " + 0.45 * (CASE event_type WHEN 'purchase' THEN 1.0"
           "            WHEN 'signup' THEN 0.8 WHEN 'error' THEN 0.4"
           "            ELSE 0.2 END)"
           f" + 0.40 * least(1.0, ln(1.0 + greatest(value, 0.0)) / {_LOG1P_200})"
           " + 0.10 * (CASE WHEN user_id % 2 = 0 THEN 1.0 ELSE 0.0 END)))"
       ))} AS prominence_q
FROM events
""")
def q_prominence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    base = (F.when(F.col("event_type") == "purchase", 1.0)
             .when(F.col("event_type") == "signup", 0.8)
             .when(F.col("event_type") == "error", 0.4)
             .otherwise(0.2))
    lognorm = F.least(F.lit(1.0),
                      F.log(F.lit(1.0) + F.greatest(F.col("value"), F.lit(0.0)))
                      / F.lit(math.log1p(200.0)))
    meta = F.when(F.col("user_id") % 2 == 0, 1.0).otherwise(0.0)
    raw = F.lit(0.05) + 0.45 * base + 0.40 * lognorm + 0.10 * meta
    prom = F.least(F.lit(1.0), F.greatest(F.lit(0.05), raw))
    return ev.select("event_id", S.quantize(prom).alias("prominence_q"))


# -- A8: dirty-number parsing (first number in a string, with default) --------

@_register("number_parsing", """
SELECT event_id,
       CAST(coalesce(try_cast(regexp_extract(props, '-?[0-9]+', 0) AS BIGINT),
                     -1) AS BIGINT) AS parsed_k
FROM events
""")
def q_number_parsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    num = F.regexp_extract("props", r"-?[0-9]+", 0)
    return ev.select(
        "event_id",
        F.coalesce(num.try_cast("long"), F.lit(-1)).alias("parsed_k"))


# -- A10: group-by-key ordered merge (linestring-merge analogue) --------------
# merge each conversation's turns, in turn order, into one document;
# aggregate min turn id + summed length (MinWayIdFinder: min(id)+sum(length)).

@_register("conv_merge", f"""
WITH {TRANSCRIPTS_CTE.strip()}
SELECT conv_id,
       CAST(min(turn_idx) AS BIGINT) AS min_turn,
       CAST(sum(length(text)) AS BIGINT) AS total_len,
       md5(string_agg(text, chr(30) ORDER BY turn_idx)) AS merged_hash
FROM transcripts
GROUP BY conv_id
""")
def q_conv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    tx = transcripts_from_documents(spark, sf_dir)
    merged = F.array_join(
        F.transform(F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                    lambda s: s["text"]), "\x1e")
    return (tx.groupBy("conv_id")
            .agg(F.min("turn_idx").cast("long").alias("min_turn"),
                 F.sum(F.length("text")).cast("long").alias("total_len"),
                 F.md5(merged).alias("merged_hash")))


# -- A11: co-group completeness check (relation-membership analogue) ----------
# a conversation is "complete" when its turn_idx set is exactly 0..max gap-free
# (the reference counts down member ways until a relation is complete).

@_register("conv_cogroup", f"""
WITH {TRANSCRIPTS_CTE.strip()}
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(max(turn_idx) AS BIGINT) AS max_turn,
       (count(*) = max(turn_idx) + 1
        AND count(DISTINCT turn_idx) = count(*)) AS complete
FROM transcripts
GROUP BY conv_id
""")
def q_conv_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    tx = transcripts_from_documents(spark, sf_dir)
    return (tx.groupBy("conv_id")
            .agg(F.count("*").cast("long").alias("n_turns"),
                 F.max("turn_idx").cast("long").alias("max_turn"),
                 ((F.count("*") == F.max("turn_idx") + 1)
                  & (F.count_distinct("turn_idx") == F.count("*")))
                 .alias("complete")))


# -- A13: min-by / arg-min per group (tightest container analogue) ------------

@_register("container_minby", """
WITH m AS (SELECT user_id, min(value) AS mv FROM events GROUP BY user_id)
SELECT e.user_id,
       CAST(min(e.event_id) AS BIGINT) AS cheapest_event,
       min(e.value) AS min_value
FROM events e JOIN m ON e.user_id = m.user_id AND e.value = m.mv
GROUP BY e.user_id
""")
def q_container_minby(spark: SparkSession, sf_dir: str) -> DataFrame:
    # arg-min with a DETERMINISTIC tie-break: minimize (value, event_id) —
    # bare min_by(event_id, value) picks an arbitrary winner on value ties
    # (bit us at sf0.01), exactly the reference's min-area tie hazard
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (ev.groupBy("user_id")
            .agg(F.min_by("event_id", F.struct("value", "event_id"))
                 .cast("long").alias("cheapest_event"),
                 F.min("value").alias("min_value")))


# -- A14: ordered distinct set-union aggregation ------------------------------

@_register("name_set_union", """
SELECT user_id,
       array_to_string(list_sort(list_distinct(list(event_type))), '|')
         AS event_types
FROM events GROUP BY user_id
""")
def q_name_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (ev.groupBy("user_id")
            .agg(F.array_join(
                F.array_sort(F.array_distinct(F.collect_list("event_type"))),
                "|").alias("event_types")))


# -- A16: area normalization log1p(x)/log1p(cap), clamped ---------------------

_LOG1P_CAP = repr(math.log1p(1e4))


@_register("area_normalize", f"""
SELECT event_id,
       {S.SQL_QUANTIZE.format(
           x=f"least(1.0, ln(1.0 + greatest(value, 0.0)) / {_LOG1P_CAP})")}
       AS value_norm_q
FROM events
""")
def q_area_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    norm = F.least(F.lit(1.0),
                   F.log(F.lit(1.0) + F.greatest(F.col("value"), F.lit(0.0)))
                   / F.lit(math.log1p(1e4)))
    return ev.select("event_id", S.quantize(norm).alias("value_norm_q"))


# -- window: stable turn ordering (dense per-conversation sequence) -----------

@_register("stable_turn_order", f"""
WITH {TRANSCRIPTS_CTE.strip()}
SELECT conv_id, turn_idx,
       CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx)
            AS BIGINT) AS seq,
       CAST(lag(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx)
            AS BIGINT) AS prev_turn
FROM transcripts
""")
def q_stable_turn_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    tx = transcripts_from_documents(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return tx.select(
        "conv_id", "turn_idx",
        F.row_number().over(w).cast("long").alias("seq"),
        F.lag("turn_idx").over(w).cast("long").alias("prev_turn"))


# -- set op: union of two sources (OSM + GeoJSON analogue) --------------------

@_register("source_union", f"""
WITH {TRANSCRIPTS_CTE.strip()},
src_a AS (
  SELECT conv_id, turn_idx, text, 'transcript' AS src FROM transcripts
),
src_b AS (
  SELECT printf('ev_%d', user_id) AS conv_id,
         CAST(event_id AS INT) AS turn_idx,
         event_type AS text, 'event' AS src
  FROM events
)
SELECT src, CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_groups
FROM (SELECT * FROM src_a UNION ALL SELECT * FROM src_b)
GROUP BY src
""")
def q_source_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    tx = transcripts_from_documents(spark, sf_dir) \
        .select("conv_id", "turn_idx", "text", F.lit("transcript").alias("src"))
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.format_string("ev_%d", F.col("user_id")).alias("conv_id"),
        F.col("event_id").cast("int").alias("turn_idx"),
        F.col("event_type").alias("text"),
        F.lit("event").alias("src"))
    u = tx.unionByName(ev)
    return u.groupBy("src").agg(
        F.count("*").cast("long").alias("n"),
        F.count_distinct("conv_id").cast("long").alias("n_groups"))


# -- B24: time-window boost (viewport-box analogue) ---------------------------

@_register("recency_window_boost", f"""
WITH {TRANSCRIPTS_CTE.strip()}
SELECT conv_id, turn_idx,
       {S.SQL_QUANTIZE.format(
           x="CASE WHEN ts >= TIMESTAMP '2026-01-01 01:00:00'"
             " AND ts < TIMESTAMP '2026-01-01 05:00:00'"
             " THEN 0.15 ELSE 0.0 END")} AS boost_q
FROM transcripts
WHERE ts >= TIMESTAMP '2026-01-01 01:00:00'
  AND ts < TIMESTAMP '2026-01-01 05:00:00'
""")
def q_recency_window_boost(spark: SparkSession, sf_dir: str) -> DataFrame:
    tx = transcripts_from_documents(spark, sf_dir)
    # epoch bounds, not naive literals — identical in any session timezone
    w0, w1 = 1_767_229_200, 1_767_243_600  # 01:00 / 05:00 UTC on 2026-01-01
    in_win = (F.unix_timestamp("ts") >= w0) & (F.unix_timestamp("ts") < w1)
    return (tx.where(in_win)
            .select("conv_id", "turn_idx",
                    S.quantize(F.when(in_win, 0.15).otherwise(0.0))
                     .alias("boost_q")))


# -- container-style conversation aggregation (bbox_container analogue) -------
# Roll turn-level BM25 hits up to conversations (the "which container holds
# these points" query, bbox_container.json): conversation score = max turn
# score + 0.1 * matched-turn count; min_by gives the best turn.

from .logical import _sql_bm25_scores, _bm25_scores, Q_TERMS  # noqa: E402


@_register("conv_container_search", _sql_bm25_scores(Q_TERMS, False) + f"""
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns_matched,
       {S.SQL_QUANTIZE.format(x='max(score) + 0.1 * count(*)')} AS conv_score_q,
       CAST(min_by(turn_idx, -score) AS BIGINT) AS best_turn
FROM scores
GROUP BY conv_id
""")
def q_conv_container_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    tx = transcripts_from_documents(spark, sf_dir)
    scored = _bm25_scores(tx, Q_TERMS)
    return (scored.groupBy("conv_id")
            .agg(F.count("*").cast("long").alias("n_turns_matched"),
                 S.quantize(F.max("score") + 0.1 * F.count("*"))
                  .alias("conv_score_q"),
                 F.min_by("turn_idx", -F.col("score")).cast("long")
                  .alias("best_turn")))


# -- A9: broadcast hash-lookup join (QRank analogue, QRankLookup.java:33-94) --
# small static dimension (tool -> popularity weight) loaded from a GZIPPED
# CSV — the reference's QRank source shape (a ~363 MB qrank.csv.gz scanned
# into an in-RAM map) — and broadcast onto turns; like QRank, a missing key
# keeps the row (left join, default 0). At 100 TB the dimension stays a
# broadcast: it scales with the entity universe, not the corpus.

import os as _os

TOOL_RANK_CSV = _os.path.abspath(_os.path.join(
    _os.path.dirname(__file__), "..", "..", "fixtures", "tool_rank.csv.gz"))


@_register("broadcast_lookup", f"""
WITH {TRANSCRIPTS_CTE.strip()},
dim AS (SELECT tool, rank_weight
        FROM read_csv('{TOOL_RANK_CSV}', header=true,
                      columns={{'tool': 'VARCHAR', 'rank_weight': 'INT'}}))
SELECT t.conv_id, t.turn_idx,
       CAST(coalesce(d.rank_weight, 0) AS BIGINT) AS rank_weight
FROM transcripts t LEFT JOIN dim d ON t.tool = d.tool
""")
def q_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = (spark.read.option("header", True)
           .schema("tool string, rank_weight int")
           .csv(TOOL_RANK_CSV))
    tx = transcripts_from_documents(spark, sf_dir)
    return (tx.join(F.broadcast(dim), "tool", "left")
            .select("conv_id", "turn_idx",
                    F.coalesce(F.col("rank_weight"), F.lit(0))
                     .cast("long").alias("rank_weight")))


# -- B7: edge n-gram expansion (edge_ngram_2_15, ElasticsearchHelper.java:115-127)

@_register("edge_ngram_expand", f"""
WITH {TRANSCRIPTS_CTE.strip()},
toks AS (
  SELECT conv_id, turn_idx,
         unnest(list_distinct({A.sql_tokens_expr('text')})) AS tok
  FROM transcripts WHERE turn_idx = 0
),
grams AS (
  SELECT conv_id, turn_idx, tok, substr(tok, 1, g) AS gram
  FROM toks, unnest(range(2, least(length(tok), 15) + 1)) AS r(g)
  WHERE length(tok) >= 2
)
SELECT conv_id, tok, gram FROM grams
""")
def q_edge_ngram_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    tx = transcripts_from_documents(spark, sf_dir).where(F.col("turn_idx") == 0)
    toks = tx.select("conv_id", "turn_idx",
                     F.explode(F.array_distinct(
                         A.tokens_col(F.col("text")))).alias("tok"))
    return (toks.select("conv_id", "tok",
                        F.explode(A.edge_ngrams_col(F.col("tok"))).alias("gram")))


# -- bbox_contains analogue (the 4th and last stored template,
#    bbox_contains.json:1-12: polygons CONTAINING a point, sort area asc,
#    size 1 = the tightest container). Transcript form: containers are
#    per-conversation turn windows of widths {2,4,8} (nested "areas");
#    for every turn (the point) return the single tightest containing
#    window — containment join + area-asc top-1 with a deterministic
#    (w asc, start desc) tie-break. At scale the join is an equi-join on
#    conv_id (co-partitioned) with the range predicate as a residual
#    filter, never an all-pairs interval join.

_WIN_WIDTHS = (2, 4, 8)


@_register("conv_contains_top1", f"""
WITH {TRANSCRIPTS_CTE.strip()},
pts AS (SELECT conv_id, turn_idx FROM transcripts),
maxt AS (SELECT conv_id, max(turn_idx) AS mt FROM transcripts GROUP BY conv_id),
wins AS (
  SELECT m.conv_id, ww.w, ss.s
  FROM maxt m,
       unnest([{', '.join(map(str, _WIN_WIDTHS))}]) AS ww(w),
       unnest(range(0, m.mt - ww.w + 2)) AS ss(s)
),
per AS (
  SELECT p.conv_id, p.turn_idx, w.w, w.s
  FROM pts p JOIN wins w
    ON w.conv_id = p.conv_id
   AND p.turn_idx >= w.s AND p.turn_idx < w.s + w.w
),
best AS (
  SELECT conv_id, turn_idx, min(w) AS best_w
  FROM per GROUP BY conv_id, turn_idx
)
SELECT b.conv_id, b.turn_idx,
       CAST(b.best_w AS BIGINT) AS best_w,
       CAST(max(p.s) AS BIGINT) AS best_start
FROM best b
JOIN per p ON p.conv_id = b.conv_id AND p.turn_idx = b.turn_idx
          AND p.w = b.best_w
GROUP BY b.conv_id, b.turn_idx, b.best_w
""")
def q_conv_contains_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    tx = transcripts_from_documents(spark, sf_dir)
    pts = tx.select("conv_id", "turn_idx")
    maxt = tx.groupBy("conv_id").agg(F.max("turn_idx").alias("mt"))
    widths = F.explode(F.array(*[F.lit(w) for w in _WIN_WIDTHS])).alias("w")
    wins = (maxt.select("conv_id", "mt", widths)
            .where(F.col("mt") - F.col("w") + 1 >= 0)
            .select("conv_id", "w",
                    F.explode(F.sequence(
                        F.lit(0), F.col("mt") - F.col("w") + 1)).alias("s")))
    per = pts.join(wins, "conv_id").where(
        (F.col("turn_idx") >= F.col("s"))
        & (F.col("turn_idx") < F.col("s") + F.col("w")))
    best = per.groupBy("conv_id", "turn_idx").agg(F.min("w").alias("best_w"))
    return (best.join(per.withColumnRenamed("w", "best_w"),
                      ["conv_id", "turn_idx", "best_w"])
            .groupBy("conv_id", "turn_idx",
                     F.col("best_w").cast("long").alias("best_w"))
            .agg(F.max("s").cast("long").alias("best_start")))


# -- bbox_container analogue #2 (bbox_container.json:2-4: polygons containing
#    the point, sort area DESC, size 1 = the LARGEST container — the 4th
#    stored template's other sort direction; conv_contains_top1 above covers
#    bbox_contains' area-asc "tightest container"). Same containment join,
#    argmax window width with the mirrored deterministic tie-break
#    (w desc, start asc). Scale shape identical: equi-join on conv_id with
#    the range predicate residual, never an all-pairs interval join.

@_register("conv_container_top1_desc", f"""
WITH {TRANSCRIPTS_CTE.strip()},
pts AS (SELECT conv_id, turn_idx FROM transcripts),
maxt AS (SELECT conv_id, max(turn_idx) AS mt FROM transcripts GROUP BY conv_id),
wins AS (
  SELECT m.conv_id, ww.w, ss.s
  FROM maxt m,
       unnest([{', '.join(map(str, _WIN_WIDTHS))}]) AS ww(w),
       unnest(range(0, m.mt - ww.w + 2)) AS ss(s)
),
per AS (
  SELECT p.conv_id, p.turn_idx, w.w, w.s
  FROM pts p JOIN wins w
    ON w.conv_id = p.conv_id
   AND p.turn_idx >= w.s AND p.turn_idx < w.s + w.w
),
best AS (
  SELECT conv_id, turn_idx, max(w) AS best_w
  FROM per GROUP BY conv_id, turn_idx
)
SELECT b.conv_id, b.turn_idx,
       CAST(b.best_w AS BIGINT) AS best_w,
       CAST(min(p.s) AS BIGINT) AS best_start
FROM best b
JOIN per p ON p.conv_id = b.conv_id AND p.turn_idx = b.turn_idx
          AND p.w = b.best_w
GROUP BY b.conv_id, b.turn_idx, b.best_w
""")
def q_conv_container_top1_desc(spark: SparkSession, sf_dir: str) -> DataFrame:
    tx = transcripts_from_documents(spark, sf_dir)
    pts = tx.select("conv_id", "turn_idx")
    maxt = tx.groupBy("conv_id").agg(F.max("turn_idx").alias("mt"))
    widths = F.explode(F.array(*[F.lit(w) for w in _WIN_WIDTHS])).alias("w")
    wins = (maxt.select("conv_id", "mt", widths)
            .where(F.col("mt") - F.col("w") + 1 >= 0)
            .select("conv_id", "w",
                    F.explode(F.sequence(
                        F.lit(0), F.col("mt") - F.col("w") + 1)).alias("s")))
    per = pts.join(wins, "conv_id").where(
        (F.col("turn_idx") >= F.col("s"))
        & (F.col("turn_idx") < F.col("s") + F.col("w")))
    best = per.groupBy("conv_id", "turn_idx").agg(F.max("w").alias("best_w"))
    return (best.join(per.withColumnRenamed("w", "best_w"),
                      ["conv_id", "turn_idx", "best_w"])
            .groupBy("conv_id", "turn_idx",
                     F.col("best_w").cast("long").alias("best_w"))
            .agg(F.min("s").cast("long").alias("best_start")))


# -- A11 super-relation FIXPOINT (PlanetSearchProfile.java:876-903): the
#    reference resolves relations whose members are themselves relations by
#    iterating membership joins until no unresolved reference remains. The
#    transcript analogue: conversation k references parent conversation
#    k // 4 (k > 0) — a deterministic forest rooted at conv_0000 — and the
#    query resolves every conversation's ROOT ancestor + depth. Engine side
#    is a bounded POINTER-DOUBLING iterative join (depth D resolves in
#    ceil(log2 D) + 1 rounds — at 10^12 convs with depth 40 that is 7
#    shuffle rounds, vs 40 for naive parent-following), lineage cut per
#    round; oracle is an independent recursive CTE.

FIXPOINT_MAX_ROUNDS = 16  # 2^16-deep chains; the test asserts fewer


def resolve_fixpoint(refs: DataFrame) -> tuple[DataFrame, int]:
    """refs(node, parent|null) -> ((node, root, depth), rounds_used).

    Pointer doubling: state maps node -> (anc, hops); roots self-map with
    0 hops so composition is stable at the fixpoint. Each round composes
    the map with itself (anc := anc's anc, hops += anc's hops) and stops
    when nothing moved — bounded by FIXPOINT_MAX_ROUNDS.
    """
    jump = refs.select(
        "node",
        F.coalesce("parent", F.col("node")).alias("anc"),
        F.when(F.col("parent").isNull(), F.lit(0))
         .otherwise(F.lit(1)).alias("hops")).localCheckpoint(eager=True)
    for rounds in range(1, FIXPOINT_MAX_ROUNDS + 1):
        # LEFT join: a node whose current ancestor is NOT itself present
        # in refs (a dangling parent id in a sparse id space) must be kept
        # with its ancestor treated as a root — an inner join would
        # silently drop it while the recursive-CTE oracle reports the
        # dangling parent as the root.
        nxt = (jump.alias("a")
               .join(jump.alias("b"),
                     F.col("a.anc") == F.col("b.node"), "left")
               .select(F.col("a.node").alias("node"),
                       F.coalesce(F.col("b.anc"), F.col("a.anc"))
                        .alias("anc"),
                       (F.col("a.hops")
                        + F.coalesce(F.col("b.hops"), F.lit(0)))
                       .alias("hops"))
               .localCheckpoint(eager=True))
        moved = (nxt.join(jump.select("node",
                                      F.col("hops").alias("old_hops")),
                          "node")
                 .where(F.col("hops") != F.col("old_hops")).count())
        jump = nxt
        if moved == 0:
            return jump, rounds
    raise RuntimeError("fixpoint did not converge "
                       f"in {FIXPOINT_MAX_ROUNDS} rounds")


@_register("conv_fixpoint", f"""
WITH RECURSIVE {TRANSCRIPTS_CTE.strip()},
convs AS (
  SELECT DISTINCT conv_id, CAST(substr(conv_id, 6) AS INT) AS n
  FROM transcripts
),
refs AS (
  SELECT conv_id, CASE WHEN n > 0 THEN printf('conv_%04d', n // 4) END AS parent
  FROM convs
),
walk(conv_id, anc, depth) AS (
  SELECT conv_id, conv_id, 0 FROM refs
  UNION ALL
  SELECT w.conv_id, r.parent, w.depth + 1
  FROM walk w JOIN refs r ON r.conv_id = w.anc
  WHERE r.parent IS NOT NULL
)
SELECT conv_id, arg_max(anc, depth) AS root_conv,
       CAST(max(depth) AS BIGINT) AS depth
FROM walk GROUP BY conv_id
""")
def q_conv_fixpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    tx = transcripts_from_documents(spark, sf_dir)
    n = F.substring("conv_id", 6, 10).cast("int")
    refs = (tx.select("conv_id").distinct()
            .select(F.col("conv_id").alias("node"),
                    F.when(n > 0, F.format_string(
                        "conv_%04d", F.floor(n / 4).cast("int")))
                     .alias("parent")))
    resolved, _rounds = resolve_fixpoint(refs)
    return resolved.select(F.col("node").alias("conv_id"),
                           F.col("anc").alias("root_conv"),
                           F.col("hops").cast("long").alias("depth"))


# -- JSON source parsing (GeoJSON-scan analogue, A2/MainClass.java:92-94) -----

@_register("json_props_parse", """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k_value
FROM events
""")
def q_json_props_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"))


# -- Sessionization: Spark-native session_window over the events stream ------
# The one windowed-aggregation shape a transcript/event pipeline needs that
# the reference lacks entirely (it is a pure batch job, SURVEY.md §2.9).
# Engine side uses the BUILT-IN F.session_window (the same operator runs
# under Structured Streaming with a watermark — streaming/sessionize.py);
# the DuckDB oracle is an independent formulation (lag + gap-flag cumsum),
# so the gate proves the two session definitions coincide.

from ..streaming.sessionize import SESSION_GAP_SEC, session_agg  # noqa: E402


@_register("event_sessionize", f"""
WITH marks AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) >= {SESSION_GAP_SEC}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marks
)
SELECT user_id,
       CAST(floor(epoch(min(ts)) * 10000.0) AS BIGINT) AS session_start_q,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(floor(sum(value) * 10000.0) AS BIGINT) AS value_sum_q
FROM sess GROUP BY user_id, session_no
""")
def q_event_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_agg(spark.read.parquet(f"{sf_dir}/events.parquet"))
