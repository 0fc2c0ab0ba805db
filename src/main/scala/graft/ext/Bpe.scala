package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer, trained and applied in-engine
 * (Sennrich, Haddow & Birch, ACL 2016 — the published word-internal BPE:
 * words split to characters plus an end-of-word marker, then the most
 * frequent adjacent symbol pair merges, iterated).
 *
 * Scale posture — the same split as codebook training:
 *  - the CORPUS-SCALE part is one distributed word-frequency hash-agg
 *    (map-side combine; the corpus is scanned once, only (word, count)
 *    rows cross the wire);
 *  - the merge loop runs driver-side over that BOUNDED vocabulary table
 *    (capped at `maxVocabWords` by frequency) — model FITTING on model-
 *    sized data, exactly like `Similarity.trainCodebook`'s centroid
 *    collect, never a corpus-sized driver loop;
 *  - ENCODE is a pure column expression: chained whole-symbol `replace`
 *    calls over a space-separated symbol string, applied per word inside
 *    a `transform` lambda — no UDF, stays in codegen, linear in the scan,
 *    and replays verbatim in any SQL engine with `replace` (the oracle).
 *
 * Determinism: pair counts are exact longs; the argmax tie-breaks to the
 * lexicographically smallest (first, second) pair, so the merge table is
 * a pure function of the word-frequency table.
 */
object Bpe {

  /** End-of-word marker (the published formulation — so "est " in
   * "smallest" and "est" in "estimate" learn separate units). Chosen to
   * never collide with corpus characters. */
  val Eow = "</w>"

  /** A 24-merge table FROZEN from one [[train]] run over the synthetic
   * corpus' word-frequency table — the deployment shape of every real
   * tokenizer (train once, version the merge table, apply it to any
   * corpus). Frozen so the sp16 encode query and its oracle share one
   * static model (training itself is iterative-argmax and SQL cannot
   * replay it; it is spec-gated against hand-computed merges instead). */
  val FrozenMerges: Seq[(String, String)] = Seq(
    ("e", "r"),
    ("e", Eow),
    ("n", Eow),
    ("er", Eow),
    ("o", "w"),
    ("ow", Eow),
    ("o", "r"),
    ("s", "t"),
    ("h", Eow),
    ("a", "t"),
    ("l", "u"),
    ("i", "n"),
    ("a", Eow),
    ("g", Eow),
    ("y", Eow),
    ("a", "r"),
    ("p", "ar"),
    ("t", Eow),
    ("i", "n" + Eow),
    ("j", "o"),
    ("jo", "in" + Eow),
    ("a", "s"),
    ("as", "h" + Eow),
    ("h", "ash" + Eow))

  /** Train `nMerges` BPE merges on the corpus' word-frequency table.
   * Returns the ordered merge list [(first, second), ...] — order IS the
   * model (encode must apply them in training order). */
  def train(docs: DataFrame, nMerges: Int,
      maxVocabWords: Int = 100000): Seq[(String, String)] = {
    require(nMerges >= 0, "nMerges must be >= 0")
    // The only corpus-scale step: (word, count), frequency-capped. The
    // orderBy+limit is a TakeOrderedAndProject — top-k per partition then
    // a bounded driver merge, not a global sort.
    val vocab = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocabWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // Driver-side fitting over the bounded vocab: symbol sequences start
    // as characters + the end-of-word marker.
    var seqs: Array[(Vector[String], Long)] =
      vocab.map { case (w, c) => (w.map(_.toString).toVector :+ Eow, c) }
    val merges = Vector.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      seqs.foreach { case (s, c) =>
        var j = 0
        while (j < s.length - 1) {
          val p = (s(j), s(j + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        seqs = seqs.map { case (s, c) => (mergeOnce(s, best), c) }
        i += 1
      }
    }
    merges.result()
  }

  /** Reference greedy left-to-right pair merge over a symbol sequence —
   * the published algorithm's inner step (merge, then continue scanning
   * AFTER the merged symbol, so "a a a" under (a,a) gives [aa, a]). */
  private[graft] def mergeOnce(s: Vector[String],
      pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < s.length) {
      if (j < s.length - 1 && s(j) == pair._1 && s(j + 1) == pair._2) {
        out += (pair._1 + pair._2)
        j += 2
      } else {
        out += s(j)
        j += 1
      }
    }
    out.result()
  }

  /** Reference (driver-side) encode of one word — the spec's independent
   * twin of [[encodeWordExpr]]. */
  private[graft] def encodeWord(w: String,
      merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(w.map(_.toString).toVector :+ Eow)(
      (s, m) => mergeOnce(s, m))

  /** Column expression: one word column → its space-separated BPE symbol
   * string. The symbol sequence rides as " s1 s2 ... " (space-delimited,
   * space-bracketed) and each merge applies as a whole-symbol string
   * replace of " a b " with " ab " — run TWICE because `replace` scans
   * left-to-right consuming the shared boundary space (adjacent
   * occurrences "a b a b" need the second pass; merged symbols are never
   * re-split, so the second pass cannot over-merge). Equivalent to the
   * published greedy merge; the spec proves it against [[encodeWord]]
   * over the whole corpus vocabulary. */
  def encodeWordExpr(w: Column, merges: Seq[(String, String)]): Column = {
    val start = concat(lit(" "),
      regexp_replace(w, "(.)", "$1 "), lit(Eow + " "))
    val merged = merges.foldLeft(start) { case (s, (a, b)) =>
      val from = lit(s" $a $b ")
      val to = lit(s" $a$b ")
      replace(replace(s, from, to), from, to)
    }
    trim(merged)
  }

  /** Persist a trained merge table as a parquet artifact — the tokenizer
   * deployment loop ([[train]] once on a corpus snapshot, version the
   * artifact, [[load]] it anywhere): rows (merge_id, first, second) with
   * merge_id preserving training order, which IS the model. KB-scale
   * (like the ANN index's params file), written in one file. */
  def save(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)], dir: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }
      .toDF("merge_id", "first", "second")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/merges.parquet")
  }

  /** Load a persisted merge table in training order. The collect is the
   * model-parameter read (KB-scale), not a data path. */
  def load(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(String, String)] =
    spark.read.parquet(s"$dir/merges.parquet")
      .orderBy("merge_id")
      .collect()
      .map(r => (r.getAs[String]("first"), r.getAs[String]("second")))
      .toSeq

  /** Per-document BPE token count under a trained merge table: whitespace
   * tokens, BPE symbols, and the subword fan-out ratio. One narrow
   * projection (the per-word encode runs inside a `transform` lambda over
   * the split array — no explode, no shuffle, linear in the scan). */
  def tokenCounts(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val words = filter(split(col("text"), " "), w => w =!= "")
    val nBpe = aggregate(
      transform(words,
        w => size(split(encodeWordExpr(w, merges), " ")).cast("long")),
      lit(0L), (acc, x) => acc + x)
    docs.select(col("doc_id"),
      size(words).as("n_words"),
      nBpe.as("n_bpe"),
      round(nBpe.cast("double") / size(words), 4).as("fanout"))
  }

  /** Tokenizer-fertility audit at (source, lang) grain: subword tokens
   * per whitespace word, in exact integer PERMILLE
   * (`1000·Σn_bpe div Σn_words` — one integer division over exact group
   * sums, no float drift). THE number a tokenizer review reads per
   * corpus slice: fertility far above the corpus norm means the merge
   * table under-serves that source/language (script not in the training
   * slice, boilerplate markup, transliteration) and its token BUDGET —
   * and so its effective mixture weight after packing — is silently
   * inflated. One [[tokenCounts]] pass + a doc-grain join for the group
   * keys + one hash-agg; output is slice-count-sized. */
  def fertilityBySource(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame =
    tokenCounts(docs, merges)
      .join(docs.select("doc_id", "source", "lang"), "doc_id")
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("n_words"),
        sum("n_bpe").as("n_bpe"))
      .withColumn("fertility_permille",
        expr("(1000 * n_bpe) div n_words"))
}
