package graft

import org.apache.spark.sql.functions._

import graft.sources.WriteLayout

/** The write path must produce a layout the read path can PRUNE: partition
 * directories skipped by partition predicates, zstd files, bounded file
 * counts. Round-trip fidelity is the base requirement. */
class WriteLayoutSpec extends SparkTestBase {

  private val out = "/root/repo/target/test_write_layout"

  test("partitioned zstd layout: round-trip, directory pruning, bounded files") {
    val orders = spark.read.parquet(s"$Sf/orders.parquet")
    WriteLayout.writePartitioned(orders, out,
      partitionCols = Seq("o_orderpriority"), sortCols = Seq("o_custkey"))

    val back = spark.read.parquet(out)
    // fidelity: same rows (modulo column order — partition col moves last)
    assert(back.count() == orders.count())
    assert(back.columns.toSet == orders.columns.toSet)
    val sumBack = back.agg(sum("o_orderkey")).head().getLong(0)
    val sumOrig = orders.agg(sum("o_orderkey")).head().getLong(0)
    assert(sumBack == sumOrig)

    // layout: hive partition dirs, zstd parquet files inside
    val root = new java.io.File(out)
    val dirs = root.listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("o_orderpriority=")), dirs.mkString(","))
    val files = root.listFiles().filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    assert(files.forall(_.getName.contains(".zstd.")),
      files.map(_.getName).take(3).mkString(","))

    // pruning: a partition predicate lands in PartitionFilters (directory
    // skip), NOT PushedFilters (per-file footer evaluation)
    val plan = back.filter(col("o_orderpriority") === "1-URGENT")
      .queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters:")).getOrElse("")
    assert(pf.contains("o_orderpriority"), plan)
  }

  test("zorderKey matches a reference bit-interleave; clustered write is z-sorted") {
    import spark.implicits._
    // reference Morton interleave for k=2, LSB-first round-robin
    def morton(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (i * 2)) | (((b >> i) & 1L) << (i * 2 + 1))
      }
    val pts = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val got = pts.toDF("a", "b")
      .select($"a", $"b",
        WriteLayout.zorderKey(Seq(col("a"), col("b")), 4).as("z"))
      .as[(Long, Long, Long)].collect()
    assert(got.forall { case (a, b, z) => z == morton(a, b, 4) })
    // z covers [0, 256) exactly once: the interleave is a bijection
    assert(got.map(_._3).toSet == (0L until 256L).toSet)

    // clustered write: rows within each output file are z-sorted
    val zout = "/root/repo/target/test_zorder"
    val df = pts.toDF("a", "b")
    WriteLayout.writeZOrdered(df, zout, Seq("a", "b"),
      bitsPerCol = 4, numFiles = 4)
    val back = spark.read.parquet(zout)
    assert(back.count() == 256)
    val perFile = back
      .select(org.apache.spark.sql.functions.input_file_name().as("f"),
        WriteLayoutSpecHelper.z4(col("a"), col("b")).as("z"))
      .as[(String, Long)].collect()
      .groupBy(_._1).values
    assert(perFile.forall { rows =>
      val zs = rows.map(_._2)
      zs.sameElements(zs.sorted)
    }, "each file must be internally z-sorted")
  }

  test("writeZOrdered: empty input writes empty output, __z collision rejected") {
    import spark.implicits._
    val zout = "/root/repo/target/test_zorder_edge"
    WriteLayout.writeZOrdered(
      Seq.empty[(Long, Long)].toDF("a", "b"), zout, Seq("a", "b"),
      bitsPerCol = 4, numFiles = 2)
    assert(spark.read.parquet(zout).isEmpty)
    val withZ = Seq((1L, 2L)).toDF("a", "__z")
    intercept[IllegalArgumentException](
      WriteLayout.writeZOrdered(withZ, zout, Seq("a"),
        bitsPerCol = 4, numFiles = 2))
  }

  test("compactTable merges small files exactly; second run is a no-op; " +
    "recovery promotes a completed stage") {
    val dir = "/root/repo/target/test_compact/t"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path("/root/repo/target/test_compact"), true)
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    docs.repartition(20).write.parquet(dir)
    val before = docs.orderBy("doc_id").collect().toSeq
    val (nb, na) = WriteLayout.compactTable(spark, dir, targetBytes = 256 * 1024)
    assert(nb == 20 && na < nb, s"before=$nb after=$na")
    val after = spark.read.parquet(dir).orderBy("doc_id").collect().toSeq
    assert(after == before, "row content preserved exactly")
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .count(s => s.isFile && s.getPath.getName.startsWith("part-")) == na)
    // a compacted table (every file its own target bin) is untouched
    val (nb2, na2) = WriteLayout.compactTable(spark, dir, 256 * 1024)
    assert(nb2 == na && na2 == na, "no-gain compaction must not rewrite")
    // crash between the two renames: live gone, stage complete -> the
    // recovery promotes the staged rewrite
    fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(s"$dir.tmp"))
    WriteLayout.recoverCompaction(spark, dir)
    assert(spark.read.parquet(dir).orderBy("doc_id").collect().toSeq == before)
    // crash before any rename: only .bak -> restored
    fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(s"$dir.bak"))
    WriteLayout.recoverCompaction(spark, dir)
    assert(spark.read.parquet(dir).orderBy("doc_id").collect().toSeq == before)
  }

  test("compactTable preserves the clustering sort: each output file " +
    "holds a contiguous name-order run") {
    val dir = "/root/repo/target/test_compact_order/t"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(
      "/root/repo/target/test_compact_order"), true)
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "text")
    // many SMALL ordered files: a sorted single-partition write chunked
    // by maxRecordsPerFile emits name-ascending, id-ascending parts —
    // the shape a clustered write leaves behind
    docs.orderBy("doc_id").coalesce(1).write
      .option("maxRecordsPerFile", 30).parquet(dir)
    val (nb, na) = WriteLayout.compactTable(spark, dir, 64 * 1024)
    assert(na < nb, s"must merge: $nb -> $na")
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val outFiles = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
    val runs = outFiles.map(f =>
      spark.read.parquet(f.getPath.toString).select("doc_id")
        .collect().map(_.getLong(0)).toSeq)
    runs.foreach(r => assert(r == r.sorted,
      "rows inside an output file must stay in clustering order"))
    assert(runs.flatten.toSeq == ids.toSeq,
      "name-ordered concatenation reproduces the global sort")
  }

  test("compactionPlan groups contiguously per dir and matches the " +
    "executor's bin arithmetic") {
    import spark.implicits._
    val files = Seq(
      ("a", "f1", 60L), ("a", "f2", 60L), ("a", "f3", 60L),
      ("a", "f4", 200L), ("a", "f5", 10L),
      ("b", "f1", 10L)).toDF("dir", "path", "bytes")
    val plan = WriteLayout.compactionPlan(files, 100L)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(3)))
      .toMap
    // a: cum-before 0,60,120,180,380 -> bins 0,0,1,1,3
    assert(plan(("a", "f1")) == 0 && plan(("a", "f2")) == 0)
    assert(plan(("a", "f3")) == 1 && plan(("a", "f4")) == 1)
    assert(plan(("a", "f5")) == 3, "an oversized file advances the bin")
    assert(plan(("b", "f1")) == 0, "dirs plan independently")
  }
}

/** Spec helper kept outside the test body so the closure that reaches
 * executors does not capture the suite. */
object WriteLayoutSpecHelper {
  def z4(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    WriteLayout.zorderKey(Seq(a, b), 4)
}
