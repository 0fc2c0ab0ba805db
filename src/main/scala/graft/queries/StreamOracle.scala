package graft.queries

/**
 * Shared constants + DuckDB SQL for replaying the deterministic producer
 * stream inside the oracle gate (st1/st2 — formerly rows-only entries).
 *
 * `Verify` materializes the same seeded envelopes the query defs generate
 * (`EnvelopeGenerator.generate(Count, Seed)`) to `EnvelopePath` as
 * newline-delimited JSON; the oracle replays the FULL spine — typed JSON
 * parse, results unnest, nested projection, derived age, concat_ws
 * derivations, GDPR filter — in DuckDB from that identical input.
 *
 * The JSON is read with an explicit column structure (mirror of
 * `RandomUserSchema`) rather than auto-inference: DuckDB's sniffer would
 * type the ISO-8601 `dob.date`/`registered.date` strings as TIMESTAMP and
 * re-format them on cast, silently diverging from Spark's raw strings.
 */
object StreamOracle {

  val Count = 500
  val Seed = 42L
  val EnvelopePath = "/root/repo/target/envelopes_seed42.jsonl"

  private val ResultStruct: String =
    "STRUCT(gender VARCHAR, " +
      "name STRUCT(title VARCHAR, first VARCHAR, last VARCHAR), " +
      "dob STRUCT(date VARCHAR, age INTEGER), " +
      "location STRUCT(street STRUCT(number INTEGER, name VARCHAR), " +
      "city VARCHAR, state VARCHAR, country VARCHAR, postcode INTEGER), " +
      "email VARCHAR, " +
      "login STRUCT(uuid VARCHAR, username VARCHAR), " +
      "registered STRUCT(date VARCHAR))[]"

  /** CTE chain ending in `spine` = the 9-column filtered profile relation
   * (mirrors Transforms.etlSpine at Tables.AsOfDate = 2026-01-01). */
  val SpineCte: String =
    s"""env AS (
          SELECT unnest(results) AS r
          FROM read_ndjson('$EnvelopePath',
                           columns = {results: '$ResultStruct'})),
        prof AS (
          SELECT r['login']['uuid'] AS id,
                 r['login']['username'] AS username,
                 r['gender'] AS gender,
                 r['name']['title'] AS title,
                 CAST(2026 - year(substr(r['dob']['date'], 1, 10)::DATE) AS INTEGER) AS age,
                 r['email'] AS email,
                 r['registered']['date'] AS inscription,
                 concat_ws(' ', r['name']['first'], r['name']['last']) AS full_name,
                 concat_ws(' ', r['location']['country'], r['location']['state'],
                   r['location']['city'], r['location']['street']['number'],
                   r['location']['postcode']) AS full_address
          FROM env),
        spine AS (SELECT * FROM prof WHERE age > 18 AND id IS NOT NULL)"""
}
