package graft.schema

import org.apache.spark.sql.types._

/**
 * Canonical envelope schema for the randomuser.me-shaped JSON documents the
 * reference pipeline ingests from Kafka.
 *
 * Single source of truth — the reference declares four divergent copies of
 * this schema (`/root/reference/Real_Time_Data.py:47-81` and the three
 * `.ipynb_checkpoints` variants); we keep exactly one, matching the fullest
 * variant (`Real_Time_Data.py:47-81`), every field nullable.
 */
object RandomUserSchema {

  val streetType: StructType = StructType(Seq(
    StructField("number", IntegerType),
    StructField("name", StringType)))

  val locationType: StructType = StructType(Seq(
    StructField("street", streetType),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("country", StringType),
    StructField("postcode", IntegerType)))

  val nameType: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("first", StringType),
    StructField("last", StringType)))

  val dobType: StructType = StructType(Seq(
    StructField("date", StringType),
    StructField("age", IntegerType)))

  val loginType: StructType = StructType(Seq(
    StructField("uuid", StringType),
    StructField("username", StringType)))

  val registeredType: StructType = StructType(Seq(
    StructField("date", StringType)))

  val resultType: StructType = StructType(Seq(
    StructField("gender", StringType),
    StructField("name", nameType),
    StructField("dob", dobType),
    StructField("location", locationType),
    StructField("email", StringType),
    StructField("login", loginType),
    StructField("registered", registeredType)))

  /** The full envelope: `{results: array<struct<...>>}`. */
  val envelope: StructType = StructType(Seq(
    StructField("results", ArrayType(resultType))))
}

/**
 * The flat relational row produced by the ETL spine — 9 columns matching the
 * reference's Cassandra DDL (`/root/reference/Real_Time_Data.py:124-135`).
 */
final case class UserProfile(
    id: String,
    username: String,
    gender: String,
    title: String,
    age: Int,
    email: String,
    inscription: String,
    full_name: String,
    full_address: String)
