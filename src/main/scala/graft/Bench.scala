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
    val cpuRatios = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    // Every query is measured at least twice and the min is reported — this
    // VM has multi-second CPU-steal bursts, so no number may be a single
    // sample (round-1 verdict finding 3). Cheap queries (<5 s) get a third
    // run. Re-runs are fault-guarded: a flaky re-run falls back to the
    // completed measurements instead of losing the whole bench line. The
    // process-CPU/wall ratio is emitted per query so a steal-hit sample is
    // recognizable after the fact (ratio collapses when the VM is starved).
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      System.err.println(s"[bench] running $name")
      def run(): (Double, Double) = {
        val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        (wall, (osBean.getProcessCpuTime - c0) / 1e9)
      }
      val first =
        try Some(run())
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed ::= name; None
        }
      first match {
        case None => (name, -1.0, -1.0)
        case Some((w1, c1)) =>
          val extraRuns = if (w1 < 5.0) 2 else 1
          val extras = (1 to extraRuns).flatMap { _ =>
            try Some(run())
            catch { case e: Throwable =>
              System.err.println(s"[bench] $name re-run failed (keeping " +
                s"completed samples): ${e.getMessage}")
              None
            }
          }
          val (bestW, bestC) = ((w1, c1) +: extras).minBy(_._1)
          (name, bestW, if (bestW > 0) bestC / bestW else -1.0)
      }
    }.map { case (name, wall, cpuRatio) =>
      cpuRatios += (name -> cpuRatio)
      name -> wall
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

    val ratios = cpuRatios.map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fs,"cpu_per_wall":$ratios,"spine_envelopes_per_sec":${spineRate.round},"sf":"$sfDir"}""")
    spark.stop()
  }
}
