package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Transforms
import Tables.{t, AsOfDate}

/**
 * The reference's own operator surface (SURVEY.md §2.3/§2.5/§2.6) mapped onto
 * the driver testdata tables. Each entry cites the reference behavior it
 * reproduces.
 *
 * Scale notes: every query here is either a narrow scan+project (P-ops) or a
 * single hash-aggregate shuffle on low-cardinality keys (A-ops); nothing
 * collects to the driver, all filters/projections push into the parquet scan.
 */
object CoreQueries {

  val defs: Map[String, QueryDef] = Map(

    // P1+P4: cast + projection + alias (`Real_Time_Data.py:45,85-101`).
    "p1_cast_project" -> QueryDef(
      (s, dir) => t(s, dir, "events")
        .select(
          col("event_id"),
          col("user_id").cast("string").as("user_str"),
          col("event_type")),
      Some("""SELECT event_id, CAST(user_id AS VARCHAR) AS user_str, event_type
              FROM events"""),
      "cast column + projection with alias"),

    // P2: schema'd JSON parse of a string column (`Real_Time_Data.py:83`).
    "p2_json_parse" -> QueryDef(
      (s, dir) => t(s, dir, "events")
        .select(
          col("event_id"),
          from_json(col("props"), "k INT", Map.empty[String, String]).getField("k").as("k")),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
              FROM events"""),
      "from_json with explicit schema + nested field projection"),

    // P3: explode/generator — one row per array element (`Real_Time_Data.py:83`),
    // aggregated to a deterministic word histogram.
    "p3_explode_words" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n")),
      Some("""SELECT word, count(*) AS n
              FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
              GROUP BY word"""),
      "explode(split(text)) + group-count"),

    // P5+P9: derived year-difference age with frozen as-of date + strict
    // threshold filter (`Real_Time_Data.py:92,109`).
    "p5_age_filter" -> QueryDef(
      (s, dir) => t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          Transforms.ageAsOfDate(col("o_orderdate"), AsOfDate).as("age"))
        .filter(col("age") > 18),
      Some("""SELECT o_orderkey,
                     CAST(year(DATE '2026-01-01') - year(o_orderdate) AS INTEGER) AS age
              FROM orders
              WHERE year(DATE '2026-01-01') - year(o_orderdate) > 18"""),
      "derived age (year-difference semantics) + GDPR-style threshold filter"),

    // P6+P7+P12: concat_ws derived columns + sha2 pseudonymization over a
    // broadcast dimension join (`Real_Time_Data.py:104-105`, sha2 import :4).
    "p6_derive_profile" -> QueryDef(
      (s, dir) => t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(
          col("c_custkey"),
          concat_ws(" ", col("c_name"), col("n_name")).as("full_label"),
          sha2(col("c_name").cast("string"), 256).as("name_hash")),
      Some("""SELECT c_custkey,
                     concat_ws(' ', c_name, n_name) AS full_label,
                     sha256(c_name) AS name_hash
              FROM customer JOIN nation ON c_nationkey = n_nationkey"""),
      "concat_ws derivation + sha2 PII hash over broadcast dim join"),

    // P10+P11: null-key guard and drop-any-null-row
    // (`Real_Time_Data.py:137`, `transformation_data-checkpoint.py:88`).
    "p10_notnull_filter" -> QueryDef(
      (s, dir) => Transforms.dropNullRows(t(s, dir, "events"))
        .filter(col("event_id").isNotNull)
        .select(col("event_id"), col("user_id"), col("event_type")),
      Some("""SELECT event_id, user_id, event_type
              FROM events
              WHERE event_id IS NOT NULL AND ts IS NOT NULL
                AND user_id IS NOT NULL AND event_type IS NOT NULL
                AND value IS NOT NULL AND props IS NOT NULL"""),
      "na.drop + IS NOT NULL key guard"),

    // Semi-structured properties through Spark 4's VARIANT type:
    // parse_json + typed variant_get extraction + predicate — the
    // open-schema path for event properties that would otherwise force a
    // rigid from_json schema per producer version. (This query parses the
    // stored JSON string inline, so it demonstrates the open-schema API;
    // the no-re-parse-per-access benefit arrives when the VARIANT binary
    // itself is what's stored, e.g. a parse-once ingest writing variant
    // columns.)
    "p13_variant_json" -> QueryDef(
      (s, dir) => t(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          variant_get(parse_json(col("props")), "$.k", "int").as("k"))
        .filter(col("k") >= 50),
      Some("""SELECT event_id, event_type,
                     CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
              FROM events
              WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50"""),
      "VARIANT semi-structured extraction with typed predicate"),

    // A1: total count (`dashbord/dashbord.py:101`).
    "a1_count" -> QueryDef(
      (s, dir) => t(s, dir, "customer").agg(count(lit(1)).as("n_users")),
      Some("SELECT count(*) AS n_users FROM customer"),
      "global count"),

    // A2: group-by count (`dashbord/dashbord.py:98`).
    "a2_group_count" -> QueryDef(
      (s, dir) => t(s, dir, "events")
        .groupBy("event_type").agg(count(lit(1)).as("n")),
      Some("SELECT event_type, count(*) AS n FROM events GROUP BY event_type"),
      "group-by count (gender-distribution analog)"),

    // A3: derived key + group count + deterministic top-k
    // (`dashbord/dashbord.py:99-100` — top-5 email domains).
    "a3_topk_sources" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .groupBy("source").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("source"))
        .limit(5),
      Some("""SELECT source, count(*) AS n FROM documents
              GROUP BY source ORDER BY n DESC, source LIMIT 5"""),
      "top-k by count with deterministic tie-break (TakeOrderedAndProject)"),

    // A4: age ECDF (`dashbord/dashbord.py:104-109`) — scalable form: group to
    // distinct ages first (small), then a running sum over the tiny grouped
    // set, instead of a global row_number over every row.
    "a4_ecdf_age" -> QueryDef(
      (s, dir) => t(s, dir, "orders")
        .select(Transforms.ageAsOfDate(col("o_orderdate"), AsOfDate).as("age"))
        .groupBy("age").agg(count(lit(1)).as("n"))
        .withColumn("cum_n",
          sum(col("n")).over(
            Window.orderBy("age")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))),
      Some("""WITH g AS (
                SELECT CAST(year(DATE '2026-01-01') - year(o_orderdate) AS INTEGER) AS age,
                       count(*) AS n
                FROM orders GROUP BY 1)
              SELECT age, n,
                     CAST(sum(n) OVER (ORDER BY age
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
              FROM g"""),
      "ECDF via pre-aggregated running sum (scalable window)"))
}
