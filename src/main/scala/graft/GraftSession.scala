package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's canonical local-mode configuration.
 *
 * Scale posture: shuffle partitions sized to cores (not the 200 default the
 * reference inherited — see `checkpoint/data/offsets/524` conf block), AQE on
 * for runtime coalesce/skew handling, UTC timezone pinned for oracle parity.
 */
object GraftSession {

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    graft.functions.GraftFunctions.register(s)
    s
  }

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      // canonical library registration path: native functions injected at
      // session build (the registry re-registration in query defs stays as
      // a defensive no-op for externally-built sessions)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // testdata events.parquet carries TIMESTAMP(NANOS): read as long nanos.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
}
