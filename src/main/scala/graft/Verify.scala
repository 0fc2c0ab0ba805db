package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // The engine's canonical session factory: same confs as before (UTC,
    // shuffle=cpus, nanos-as-long, no UI) PLUS GraftExtensions — the gate
    // must run the session a library user gets, including the injected
    // native functions and the range-join optimizer rule (x6 plan-locks
    // on the latter).
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Materialize the deterministic producer envelopes (same seed/count as
    // the st1/st2 query defs) so their DuckDB oracles can replay the whole
    // spine from the identical input — closes the former no_oracle rows.
    // Fixed absolute path: it is baked into the static oracle SQL.
    new java.io.File(graft.queries.StreamOracle.EnvelopePath).getParentFile.mkdirs()
    Files.writeString(Paths.get(graft.queries.StreamOracle.EnvelopePath),
      graft.sources.EnvelopeGenerator.generate(
        graft.queries.StreamOracle.Count, graft.queries.StreamOracle.Seed)
        .mkString("", "\n", "\n"))
    // Optional local-iteration filter: SPARK_GRAFT_ONLY=<regex> restricts
    // the dump (and the emitted oracle set) to matching query names, so a
    // single query's gate replays in seconds instead of the full 134.
    // Unset (the driver's path) = everything, unchanged.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    def selected(name: String): Boolean =
      only.forall(_.findFirstIn(name).isDefined)
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
