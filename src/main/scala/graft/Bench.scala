package graft

/** Benchmark main — runs every registered query against
 * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line for the driver
 * (`BENCH_r{N}.json`). Failures are NOT silent: failed queries get value -1
 * and are listed under "failed". */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Warm the JVM/IO path once (codegen, parquet footers, JIT) so per-query
    // numbers measure the query, not first-touch overhead.
    Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())

    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // First run compiles the plan + codegen (and reports heavy queries
      // as-is to bound total bench time); cheap queries get two more timed
      // runs with min taken — this VM has multi-second CPU-steal bursts.
      System.err.println(s"[bench] running $name")
      val first =
        try {
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed ::= name; -1.0
        }
      if (first >= 0 && first < 5.0) {
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        name -> math.min(first, times.min)
      } else name -> first
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fs = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum

    // Baseline comparison: the reference sustains 0.153 records/s end-to-end
    // through its E1 chain (BASELINE.md — source-rate-bound). Same chain
    // here, measured over the deterministic producer stand-in.
    val spineRate = {
      val n = 20000
      import spark.implicits._
      val docs = graft.sources.EnvelopeGenerator.generate(n).toDF("value")
        .select(org.apache.spark.sql.functions.col("value").cast("binary").as("value"))
      val t0 = System.nanoTime()
      graft.ops.Transforms.etlSpine(docs, graft.queries.Tables.AsOfDate).count()
      n / ((System.nanoTime() - t0) / 1e9)
    }

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fs,"spine_envelopes_per_sec":${spineRate.round},"sf":"$sfDir"}""")
    spark.stop()
  }
}
