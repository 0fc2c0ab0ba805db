package graft.ops

import java.sql.Date

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.schema.RandomUserSchema

/**
 * The ETL spine of the reference pipeline, re-expressed as pure
 * `DataFrame => DataFrame` stages so every stage unit-tests in batch mode and
 * composes unchanged under Structured Streaming (all stages are stateless
 * narrow transforms — one WholeStageCodegen span, no shuffle).
 *
 * Operator inventory coverage (SURVEY.md §2.3):
 *   P1  cast binary→string        (`Real_Time_Data.py:45`)
 *   P2  from_json with schema     (`Real_Time_Data.py:83`)
 *   P3  explode(results)          (`Real_Time_Data.py:83`)
 *   P4  nested-field projection   (`Real_Time_Data.py:85-101`)
 *   P5  derived age (year diff)   (`Real_Time_Data.py:92`)
 *   P6  full_name concat_ws       (`Real_Time_Data.py:104`)
 *   P7  full_address concat_ws    (`Real_Time_Data.py:105`)
 *   P8  drop intermediates        (`Real_Time_Data.py:106`)
 *   P9  age threshold filter      (`Real_Time_Data.py:109`)
 *   P10 non-null key filter       (`Real_Time_Data.py:137`)
 *   P11 na.drop                   (`transformation_data-checkpoint.py:88`)
 *   P12 sha2 PII pseudonymization (imported but unused in the reference,
 *                                  `Real_Time_Data.py:4`; realized here)
 */
object Transforms {

  /** P1: Kafka-style binary `value` column → UTF-8 string. */
  def castValueToString(df: DataFrame): DataFrame =
    df.select(col("value").cast(StringType).as("value"))

  /** P2: parse the JSON envelope with the canonical schema (PERMISSIVE —
   * malformed input yields null columns, matching the reference). */
  def parseEnvelope(df: DataFrame): DataFrame =
    df.select(from_json(col("value"), RandomUserSchema.envelope).as("values"))

  /** P3: one output row per element of `results` (drops empty/null arrays,
   * matching `explode` semantics in the reference). */
  def explodeResults(df: DataFrame): DataFrame =
    df.select(explode(col("values.results")).as("r"))

  /**
   * P4–P8: flatten the nested struct into the 9-column profile row.
   *
   * `asOf` freezes the reference's `current_date()` so the derived age is
   * deterministic and oracle-testable; pass `current_date()` semantics via
   * `Transforms.flattenProfile(df, java.sql.Date.valueOf(LocalDate.now))`.
   *
   * Age semantics preserved exactly: year-difference, NOT true age
   * (`year(asOf) - year(dob.date)` — off by one before birthdays), per
   * `Real_Time_Data.py:92`.
   */
  def flattenProfile(df: DataFrame, asOf: Date): DataFrame =
    df.select(
      col("r.login.uuid").as("id"),
      col("r.login.username").as("username"),
      col("r.gender").as("gender"),
      col("r.name.title").as("title"),
      ageAsOf(col("r.dob.date"), asOf).as("age"),
      col("r.email").as("email"),
      col("r.registered.date").as("inscription"),
      concat_ws(" ", col("r.name.first"), col("r.name.last")).as("full_name"),
      concat_ws(" ",
        col("r.location.country"), col("r.location.state"),
        col("r.location.city"), col("r.location.street.number"),
        col("r.location.postcode")).as("full_address"))

  /** P5 as a reusable column: year-difference age (reference semantics),
   * for ISO-8601 string dob columns. */
  def ageAsOf(dobIso: Column, asOf: Date): Column =
    year(lit(asOf)) - year(to_date(dobIso))

  /** P5 for native date/timestamp columns — no string round-trip. */
  def ageAsOfDate(dob: Column, asOf: Date): Column =
    year(lit(asOf)) - year(dob)

  /** P9+P10: compliance filters — age strictly above threshold, non-null key. */
  def gdprFilter(df: DataFrame, minAge: Int = 18): DataFrame =
    df.filter(col("age") > minAge).filter(col("id").isNotNull)

  /** P11: drop any row containing a null (variant pipeline behavior). */
  def dropNullRows(df: DataFrame): DataFrame = df.na.drop()

  /** P12: PII pseudonymization — replace a column with its SHA-256 hex. */
  def pseudonymize(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, sha2(col(c).cast(StringType), 256)))

  /** Multi-label public suffixes (the common two-label entries of the
   * Mozilla Public Suffix List — the ones covering the fixtures plus the
   * high-traffic ccTLD families). A registrable domain sits one label LEFT
   * of its public suffix, so `a@b.co.uk` → `b`, not `co`. */
  private val PublicSuffix2: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "co.nz", "net.nz", "org.nz", "govt.nz",
    "co.za", "org.za", "web.za",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "org.mx", "com.ar", "com.tr", "com.sg", "com.my",
    "co.kr", "or.kr", "co.th", "co.id", "com.hk", "com.tw")

  /** A3 helper: registered-domain extraction from an email address
   * (`user@mail.example.com` → `example`). Matches
   * `tldextract.extract().domain` for single-label TLDs AND for the
   * two-label public suffixes above (`a@b.co.uk` → `b`); suffix-only hosts
   * degrade to the suffix's first label, as no registrable domain exists. */
  def emailDomain(email: Column): Column = {
    val host = substring_index(email, "@", -1)
    val last2 = lower(substring_index(host, ".", -2))
    when(last2.isin(PublicSuffix2: _*),
        substring_index(substring_index(host, ".", -3), ".", 1))
      .otherwise(substring_index(substring_index(host, ".", -2), ".", 1))
  }

  /** The full E1 chain: raw Kafka-shaped rows → filtered 9-column profiles. */
  def etlSpine(raw: DataFrame, asOf: Date, minAge: Int = 18): DataFrame = {
    val parsed = parseEnvelope(castValueToString(raw))
    gdprFilter(flattenProfile(explodeResults(parsed), asOf), minAge)
  }
}
