package graft

/** Dev probe: time named sf1 queries in a fresh context, min-of-2 with both
 * samples printed. Run: sbt "Test/runMain graft.ProbeSf1 d6_dup_clusters ..."
 * (SPARK_GRAFT_PROBE_DIR overrides the input dir). */
object ProbeSf1 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR",
      "/root/repo/target/bench_sf1")
    val names = if (args.nonEmpty) args.toSeq else Seq("d6_dup_clusters")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names; i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"PROBE $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
