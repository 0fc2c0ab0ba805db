package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis primitives for a large-scale training-data pipeline:
 * token counting, quality scoring, language ID, document fingerprinting.
 * All are codegen'd builtin compositions (no UDFs) — they stay inside
 * WholeStageCodegen and scale linearly with the scan.
 */
object TextAnalysis {

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(split(text, " "))

  /** Regex token count (BPE-ish word/number pieces). */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-z0-9]+"))

  /** Tiny public stopword lexicons per language — enough for a coarse,
   * deterministic n-gram/stopword language heuristic. */
  val Lexicons: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "es" -> Seq("el", "la", "los", "y", "es", "un"),
    "fr" -> Seq("le", "les", "et", "est", "un", "une"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  /** Fraction of whitespace tokens that hit a lexicon. */
  def stopwordRatio(text: Column, lexicon: Seq[String]): Column = {
    val toks = split(text, " ")
    size(filter(toks, t => t.isInCollection(lexicon))) / size(toks)
  }

  /** Deterministic language ID: pick the language whose lexicon covers the
   * largest fraction of tokens; ties resolve in fixed order en,de,es,fr,zh
   * (each language wins only if its score beats-or-ties every later one). */
  def langId(text: Column): Column = {
    val scores = Seq("en", "de", "es", "fr", "zh")
      .map(l => l -> stopwordRatio(text, Lexicons(l)))
    def best(remaining: List[(String, Column)]): Column = remaining match {
      case (lang, _) :: Nil => lit(lang)
      case (lang, score) :: rest =>
        when(rest.map(_._2).foldLeft(lit(true))((acc, other) => acc && score >= other), lit(lang))
          .otherwise(best(rest))
      case Nil => lit("und")
    }
    best(scores.toList)
  }

  /** Full text cleanup: Unicode NFC (native codegen'd expression — the
   * engine's canonical spelling step before shingles/fingerprints/tokens),
   * C0/DEL control chars → space, whitespace runs collapsed, ends trimmed.
   * Requires `GraftFunctions.register(spark)` (GraftSession does it). */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(graft.functions.GraftFunctions.nfc(text),
        "[\\x00-\\x1f\\x7f]", " "),
      "\\s+", " "))

  /** Quality score components: chars, tokens, mean token length, stopword
   * ratio. Compose/filter downstream as needed. */
  def qualityColumns(text: Column): Seq[(String, Column)] = Seq(
    "n_chars" -> length(text),
    "n_tokens" -> wsTokenCount(text),
    "mean_token_len" -> round((length(text) - wsTokenCount(text) + 1).cast("double") / wsTokenCount(text), 4),
    "stopword_ratio" -> round(stopwordRatio(text, Lexicons("en")), 4))

  /** Normalized rolling fingerprint: md5 of lowercase, whitespace-collapsed
   * text — the exact-dedup key that survives formatting noise. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** The Gopher stop-word panel (Rae et al. 2021, appendix A quality
   * filtering): a document must contain at least two of these words. */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style WORD-LEVEL quality rule panel (Rae et al. 2021,
   * appendix A — the published pre-training quality filter): per-document
   * exact rule statistics plus the pass verdict under the paper's
   * thresholds (parameterized). Rules carried: word count in
   * [minWords, maxWords]; mean word length in [minMeanWordLen,
   * maxMeanWordLen]; hash and ellipsis symbol-to-word ratios ≤
   * maxSymbolRatio each; ≥ minAlphaWordFrac of words contain an
   * alphabetic character; ≥ minStopKinds distinct [[GopherStops]] words
   * present. The paper's LINE-level rules (bullet/ellipsis line
   * fractions) need newline structure this document model does not carry;
   * within-doc repetition lives in [[repetitionStats]].
   *
   * One narrow projection over the scan — no shuffle, linear at any
   * corpus size. Ratios round to 4 decimals and the verdict compares the
   * ROUNDED values, so the whole panel replays bit-for-bit in the
   * oracle. */
  def gopherRules(docs: org.apache.spark.sql.DataFrame,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaWordFrac: Double = 0.8,
      minStopKinds: Int = 2): org.apache.spark.sql.DataFrame = {
    val text = col("text")
    val toks = split(text, " ")
    val n = size(toks)
    val meanLen =
      round(length(translate(text, " ", "")).cast("double") / n, 4)
    val hashRatio = round(
      (length(text) - length(translate(text, "#", ""))).cast("double") / n, 4)
    val ellipsisRatio = round(
      ((length(text) - length(replace(text, lit("..."), lit("")))) / lit(3))
        .cast("double") / n, 4)
    val alphaFrac = round(
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") / n, 4)
    val stopKinds = size(filter(
      array(GopherStops.map(lit): _*), s => array_contains(toks, s)))
    docs.select(col("doc_id"),
      n.as("n_words"), meanLen.as("mean_word_len"),
      hashRatio.as("hash_ratio"), ellipsisRatio.as("ellipsis_ratio"),
      alphaFrac.as("alpha_word_frac"), stopKinds.as("n_stop_kinds"))
      .withColumn("pass",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
        col("mean_word_len") >= minMeanWordLen &&
        col("mean_word_len") <= maxMeanWordLen &&
        col("hash_ratio") <= maxSymbolRatio &&
        col("ellipsis_ratio") <= maxSymbolRatio &&
        col("alpha_word_frac") >= minAlphaWordFrac &&
        col("n_stop_kinds") >= minStopKinds)
  }

  /** Positional word n-grams as an array column (one entry per start
   * position, NOT distinct — counts matter here): built by folding
   * `zip_with` over shifted slices of the token array, the same narrow
   * derivation as [[bigramCrossEntropy]]'s bigrams generalized to width n.
   * No window, no positional self-join, no explode amplification beyond
   * the final consumer's own. */
  private[ext] def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, "n-gram width must be >= 1")
    val w = split(text, " ")
    (2 to n).foldLeft(w: Column)((acc, i) =>
      zip_with(
        slice(acc, lit(1), size(w) - (i - 1)),
        slice(w, lit(i), size(w) - (i - 1)),
        (a, b) => concat(a, lit(" "), b)))
  }

  /** The Gopher REPETITION rule panel (Rae et al. 2021, appendix A —
   * the within-document repetition filters that complement the word-level
   * panel of [[gopherRules]]): per document,
   *
   *  - `top{2,3,4}_frac` — fraction of characters in the most common
   *    word n-gram: `count(top gram) · chars(top gram) / chars(doc)`
   *    (the public datatrove formulation; gram chars include its internal
   *    spaces; ties break to the lexicographically smallest gram so the
   *    argmax is deterministic);
   *  - `dup{dupN}_frac` — fraction of TOKENS covered by any word
   *    `dupN`-gram that occurs more than once in the document, ALL
   *    occurrences included (overlaps counted once — exact coverage via
   *    the same positions→covered-index expansion as the d18 span
   *    machinery, not the count·len over-estimate). The paper states this
   *    family at character grain; this document model is space-tokenized,
   *    so token grain is the faithful equivalent;
   *  - `rep_pass` — the panel verdict at the paper's thresholds
   *    (top-2 ≤ 0.20, top-3 ≤ 0.18, top-4 ≤ 0.16, dup-5 ≤ 0.15),
   *    compared on the ROUNDED fractions so the verdict replays
   *    bit-for-bit in the oracle.
   *
   * Scale shape: one n-gram explode per width feeding a (doc, gram)
   * hash-agg with map-side partial combine, per-doc argmax as a struct-min
   * agg (no window sort anywhere), and a bounded ×dupN coverage expansion
   * on duplicated-gram positions only. Everything is doc-keyed after the
   * first agg, so the assembly joins reuse one hash partitioning; nothing
   * corpus-quadratic, nothing driver-side. Docs shorter than a width score
   * 0.0 for that signal (nothing can repeat). */
  def gopherRepetition(docs: org.apache.spark.sql.DataFrame,
      topNs: Seq[Int] = Seq(2, 3, 4), dupN: Int = 5,
      topMax: Map[Int, Double] = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16),
      dupMax: Double = 0.15): org.apache.spark.sql.DataFrame = {
    require(topNs.nonEmpty && topNs.forall(_ >= 2),
      "top-gram widths must be >= 2")
    require(topNs.forall(topMax.contains), "every top width needs a threshold")
    val base = docs.select(col("doc_id"), length(col("text")).as("n_chars"),
      wsTokenCount(col("text")).as("n_tokens"))
    val topCols = topNs.map { n =>
      val frac = docs
        .filter(size(split(col("text"), " ")) >= n)
        .select(col("doc_id"), length(col("text")).as("n_chars"),
          explode(wordNgrams(col("text"), n)).as("g"))
        .groupBy("doc_id", "n_chars", "g")
        .agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(min(struct((-col("c")).as("neg"), col("g"),
          col("n_chars"))).as("m"))
        .select(col("doc_id"),
          round((-col("m.neg")).cast("double") * length(col("m.g")) /
            col("m.n_chars"), 4).as(s"top${n}_frac"))
      frac
    }
    val dupPos = docs
      .filter(size(split(col("text"), " ")) >= dupN)
      .select(col("doc_id"), posexplode(wordNgrams(col("text"), dupN)))
      .toDF("doc_id", "pos", "g")
    val dupGrams = dupPos.groupBy("doc_id", "g")
      .agg(count(lit(1)).as("c")).filter(col("c") > 1)
      .select("doc_id", "g")
    val covered = dupPos.join(dupGrams, Seq("doc_id", "g"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(dupN - 1))).as("ti"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_cov"))
    val dupCol = base.select(col("doc_id"), col("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(coalesce(col("n_cov"), lit(0L)).cast("double") /
          col("n_tokens"), 4).as(s"dup${dupN}_frac"))
    val joined = (topCols :+ dupCol).foldLeft(base)(
      (acc, c) => acc.join(c, Seq("doc_id"), "left"))
    val filled = topNs.foldLeft(joined)((acc, n) =>
      acc.withColumn(s"top${n}_frac",
        coalesce(col(s"top${n}_frac"), lit(0.0))))
      .withColumn(s"dup${dupN}_frac",
        coalesce(col(s"dup${dupN}_frac"), lit(0.0)))
    filled.withColumn("rep_pass",
      topNs.map(n => col(s"top${n}_frac") <= topMax(n))
        .reduce(_ && _) && col(s"dup${dupN}_frac") <= dupMax)
  }

  /** Within-document 3-gram repetition: total vs distinct shingle counts
   * and the repetition ratio `1 - distinct/total` — the canonical "looping
   * text" quality signal (high ratio = the document repeats itself).
   * Total shingles come free from the token count (n - 2); the distinct
   * count reuses the dedup shingle derivation, so the whole signal costs
   * one extra per-doc aggregation over rows the dedup pass produces
   * anyway. */
  def repetitionStats(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val tot = docs
      .filter(size(split(col("text"), " ")) >= Dedup.ShingleWidth)
      .select(col("doc_id"),
        (wsTokenCount(col("text")) - (Dedup.ShingleWidth - 1)).cast("int").as("n_total"))
    val dis = Dedup.shingles(docs).groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_distinct"))
    tot.join(dis, Seq("doc_id"))
      .withColumn("rep_ratio",
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_total"), 4))
  }

  /** PII patterns shared by the Spark plan and the oracle SQL. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val LongNumberRe = "[0-9]{4,}"

  /** PII scrubbing: emails and long digit runs become typed placeholder
   * tokens — the standard pre-training redaction pass. Pure replace-all
   * `regexp_replace` composition, stays in WholeStageCodegen. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "<EMAIL>"),
      LongNumberRe, "<NUM>")

  /** Redaction count for audit columns (emails + long digit runs). */
  def piiCount(text: Column): Column =
    regexp_count(text, lit(EmailRe)) + regexp_count(text, lit(LongNumberRe))

  /** Corpus TF-IDF at document grain: Σ_term tf·idf with idf = ln(N/df).
   * Scale shape: two hash-aggs (term frequencies per doc, document
   * frequencies per term) + ONE join keyed on the term (the df relation is
   * vocabulary-sized — AQE broadcasts it when small, shuffles when a
   * billion-key n-gram domain makes it big) + a final doc-grain agg. The
   * corpus size N is a 1-row broadcast.
   *
   * Determinism: idf is quantized to integer MICROS immediately after the
   * (single, deterministic-input) `ln`, so per-term weights tf·idf_q are
   * exact BIGINTs and the per-doc sum is summation-order independent — the
   * same micro-grid discipline as the IVF family. Output:
   * (doc_id, n_terms, tfidf_q, tfidf = tfidf_q/1e6). */
  def tfIdf(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = toks.select("doc_id", "tok").distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct("doc_id").as("n_docs"))
    tf.join(dfreq, "tok")
      .crossJoin(broadcast(n))
      .withColumn("idf_q",
        floor(log(col("n_docs").cast("double") / col("df")) * lit(1e6) + lit(0.5))
          .cast("long"))
      .withColumn("w_q", col("tf") * col("idf_q"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("w_q").as("tfidf_q"))
      .withColumn("tfidf", col("tfidf_q").cast("double") / lit(1e6))
  }

  /** Corpus-unigram cross-entropy per document — the perplexity-filter
   * shape of the CCNet/RedPajama quality pipelines, with the language
   * model reduced to the corpus' own unigram distribution (no external LM
   * in this container; the dataflow — token probabilities from one
   * corpus-wide aggregation, per-doc mean negative log-likelihood — is
   * identical with a real LM probability table swapped in). High score =
   * tokens rare in the corpus (gibberish, wrong-language, OCR noise);
   * low = templated/common text. Cost shape: one vocabulary-sized count
   * agg + one join keyed by token (AQE broadcasts small vocabularies) + a
   * doc-grain agg; the corpus total is a 1-row broadcast.
   *
   * Determinism: -ln p is quantized to integer MICROS immediately (one
   * deterministic ln per token occurrence of identical IEEE doubles), so
   * per-doc sums are exact BIGINTs — same micro-grid discipline as tfIdf.
   * Output: (doc_id, n_toks, s_q, xent = s_q/1e6/n_toks). */
  def unigramCrossEntropy(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // The token relation feeds the vocabulary agg AND the join probe side.
    // Deliberately NOT materialized (unlike boilerplateFraction's shingle
    // relation): token explode is ~1x amplification — recomputing it once
    // costs one extra narrow pass, while an eager checkpoint would run a
    // corpus job at DataFrame-CONSTRUCTION time (breaking .explain/dry
    // plan inspection) and pin a token-grain relation in executor blocks.
    // The corpus total derives from the vocabulary-sized counts relation,
    // not a third corpus pass.
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val total = counts.agg(sum("c").as("n_total"))
    toks.join(counts, "tok")
      .crossJoin(broadcast(total))
      .withColumn("nll_q",
        floor(-log(col("c").cast("double") / col("n_total")) * lit(1e6)
          + lit(0.5)).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"), sum("nll_q").as("s_q"))
      .select(col("doc_id"), col("n_toks"), col("s_q"),
        round(col("s_q").cast("double") / lit(1e6) / col("n_toks"), 6)
          .as("xent"))
  }

  /** Boilerplate fraction per document — the C4-style corpus-frequency
   * filter: the share of a doc's distinct shingles whose corpus document
   * frequency is at least `minDf` (navigation chrome, license headers,
   * templated footers all light this up). Cost shape: the shingle
   * relation aggregates once to (shingle, df) — vocabulary-sized, AQE
   * broadcasts it when small — and joins back keyed by shingle; both
   * sides of the join are the ALREADY-EXPLODED relation, so nothing
   * corpus-quadratic exists. Output: (doc_id, n_sh, boiler_frac). */
  /** Vocabulary-coverage audit at a `vocabSize`-token head: per document,
   * the fraction of tokens OUTSIDE the corpus's top-`vocabSize` vocabulary
   * (count desc, token asc ties) — the pre-tokenizer check that a frozen
   * vocab/merge table will cover a corpus (a doc mostly OOV either isn't
   * the target language or will explode into byte-fallback tokens).
   * `flagged` marks docs past `maxOovFrac`.
   *
   * Scale shape: the vocabulary head is a partial-agg count +
   * `TakeOrderedAndProject` (k rows per partition cross the wire — the t9
   * plan), broadcast back onto one corpus token scan; one doc-grain
   * hash-agg. Output: (doc_id, n_toks, n_oov, oov_frac, flagged). */
  def vocabCoverage(docs: org.apache.spark.sql.DataFrame, vocabSize: Int,
      maxOovFrac: Double = 0.5): org.apache.spark.sql.DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val vocab = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("__n"))
      .orderBy(desc("__n"), asc("tok"))
      .limit(vocabSize)
      .select(col("tok"), lit(true).as("__in_v"))
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
        sum(when(col("__in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .select(col("doc_id"), col("n_toks"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_toks"), 4).as("oov_frac"))
      .withColumn("flagged", col("oov_frac") > maxOovFrac)
  }

  def boilerplateFraction(docs: org.apache.spark.sql.DataFrame,
      minDf: Int): org.apache.spark.sql.DataFrame = {
    // The shingle relation feeds BOTH the df aggregation and the join-back
    // side — materialize once (eager checkpoint) so the ~100x explode
    // pipeline doesn't execute twice (same posture as minhashDedupPairs).
    val sh = Dedup.materialize(Dedup.shingles(docs))
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    sh.join(dfreq, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("df") >= minDf, 1L).otherwise(0L)).as("n_boiler"))
      .select(col("doc_id"), col("n_sh"),
        round(col("n_boiler").cast("double") / col("n_sh"), 4).as("boiler_frac"))
  }

  /** Bigram-LM cross-entropy per document — the CCNet/RedPajama perplexity
   * filter with its KenLM replaced by a bigram model TRAINED IN-ENGINE on a
   * reference subset (`isRef`, e.g. a trusted high-quality slice): score
   * every document by `−(1/n) Σ ln p(w_i | w_{i−1})` under add-1-smoothed
   * bigram probabilities `p(w2|w1) = (c(w1 w2)+1)/(c(w1)+V)` fit on the
   * reference. Unlike [[unigramCrossEntropy]] (corpus-self unigram), this
   * is the two-corpus shape of the published filter: a model fit on the
   * distribution you want, applied to the pool you're cleaning — word
   * order now matters (scrambled text scores high even when its unigrams
   * are common).
   *
   * Determinism: `−ln p` quantizes to integer MICROS per bigram
   * occurrence; per-doc sums are exact BIGINTs (the repo's micro-grid
   * discipline), so the oracle replays bit-for-bit.
   *
   * Scale shape: bigrams derive NARROWLY (`zip_with` over two array
   * slices — no window, no positional self-join); the model is one
   * bigram-vocabulary-sized count agg + one unigram-sized agg over the
   * REFERENCE slice only; scoring joins the pool's bigram relation keyed
   * by bigram (AQE broadcasts small models; a web-scale model shuffles
   * both sides on the bigram key — still linear); V and the doc-grain sum
   * are the only other exchanges. Output: (doc_id, n_bg, s_q, xent),
   * pool docs with ≥ 1 bigram. */
  def bigramCrossEntropy(docs: org.apache.spark.sql.DataFrame,
      isRef: Column): org.apache.spark.sql.DataFrame = {
    val w = split(col("text"), " ")
    def bigrams(df: org.apache.spark.sql.DataFrame) = df
      .filter(size(w) >= 2)
      .select(col("doc_id"),
        explode(zip_with(
          slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
          (a, b) => concat(a, lit(" "), b))).as("bg"))
    val ref = docs.filter(isRef)
    val c2 = bigrams(ref).groupBy("bg").agg(count(lit(1)).as("c2"))
    // Context (first-word) counts and vocabulary size from the same
    // reference token relation — one explode feeds both aggregates.
    val refToks = ref.select(explode(w).as("tok"))
    // Materialized: c1 feeds both the vocabulary count and the scoring
    // join — un-checkpointed, the vocab reference re-derives it from a
    // second full reference scan. Unigram-vocabulary-sized, so cheap.
    val c1 = Dedup.materialize(
      refToks.groupBy("tok").agg(count(lit(1)).as("c1")))
    val vocab = c1.agg(count(lit(1)).as("v"))
    bigrams(docs.filter(!isRef))
      .join(c2, Seq("bg"), "left")
      .select(col("doc_id"), col("bg"),
        coalesce(col("c2"), lit(0L)).as("c2"),
        split(col("bg"), " ").getItem(0).as("tok"))
      .join(c1, Seq("tok"), "left")
      .select(col("doc_id"), col("c2"),
        coalesce(col("c1"), lit(0L)).as("c1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        floor(-log((col("c2") + lit(1L)).cast("double") /
            (col("c1") + col("v")).cast("double")) * lit(1e6) + lit(0.5))
          .cast("long").as("nll_q"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bg"), sum("nll_q").as("s_q"))
      .select(col("doc_id"), col("n_bg"), col("s_q"),
        round(col("s_q").cast("double") / lit(1e6) / col("n_bg"), 6)
          .as("xent"))
  }

  /** Collocation / phrase detection (the word2phrase scoring of Mikolov
   * et al., NeurIPS 2013 — "Distributed Representations of Words and
   * Phrases and their Compositionality" §4): score every adjacent word
   * pair by `(c(ab) − δ) · N / (c(a) · c(b))` — the discounted lift of
   * the bigram over independence — and keep pairs with `c(ab) ≥ minCount`.
   * The standard pre-tokenization pass that decides which word pairs
   * deserve a single vocabulary entry ("new", "york" → "new_york") before
   * a tokenizer or embedding vocabulary is fit; δ discounts rare-pair
   * noise exactly as published.
   *
   * Determinism: counts are exact BIGINTs; the score is ONE double
   * expression — `(double(c_ab − δ) · N) / (double(c_a) · c_b)` — whose
   * conversions, products, and division are all IEEE-correctly-rounded
   * operations on exact integers, so an independent engine reproduces the
   * double bit-for-bit at any magnitude (exactness of the PRODUCTS is not
   * required — only identical rounding, which correctly-rounded ops
   * guarantee). Ranking orders by the ROUNDED score with the phrase
   * string as tiebreak.
   *
   * Scale shape: bigrams derive narrowly (zip_with over two array
   * slices); the corpus explodes twice (tokens, bigrams), each feeding
   * one vocabulary-sized count agg; the scoring joins are keyed on the
   * unigram relation (AQE broadcasts small vocabularies; a web-scale
   * vocabulary shuffles on the token key — still linear). Nothing
   * corpus-sized survives past the two aggs. */
  def phraseDetect(docs: org.apache.spark.sql.DataFrame,
      minCount: Long = 5L, delta: Long = 5L): org.apache.spark.sql.DataFrame = {
    val w = split(col("text"), " ")
    val bigrams = docs.filter(size(w) >= 2)
      .select(explode(zip_with(
        slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
    // Materialized: feeds the total-token scalar AND both scoring joins.
    val c1 = Dedup.materialize(
      docs.select(explode(w).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c1")))
    val total = c1.agg(sum("c1").as("n"))
    val c2 = bigrams.groupBy("bg").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    c2
      .select(col("bg").as("phrase"), col("c_ab"),
        split(col("bg"), " ").getItem(0).as("__a"),
        split(col("bg"), " ").getItem(1).as("__b"))
      .join(c1.select(col("tok").as("__a"), col("c1").as("c_a")), Seq("__a"))
      .join(c1.select(col("tok").as("__b"), col("c1").as("c_b")), Seq("__b"))
      .crossJoin(broadcast(total))
      .select(col("phrase"), col("c_ab"), col("c_a"), col("c_b"),
        round(((col("c_ab") - lit(delta)).cast("double") * col("n")) /
          (col("c_a").cast("double") * col("c_b")), 4).as("score"))
  }

  /** Trigram Stupid Backoff scorer (Brants et al., EMNLP 2007 — "Large
   * Language Models in Machine Translation", the score built FOR
   * distributed count tables: no discounting, no normalization, just
   * relative frequencies with a fixed backoff factor α = 0.4):
   *
   *   S(w3|w1 w2) = c(w1 w2 w3)/c(w1 w2)            if the trigram is seen
   *               = α · c(w2 w3)/c(w2)              else if the bigram is
   *               = α² · max(c(w3), 1)/N            else (the 1-clamp keeps
   *                                                  OOV finite — log(0)
   *                                                  has no place in a
   *                                                  filter score)
   *
   * fit on the `isRef` slice, scoring every pool document by the mean
   * −ln S over its trigram positions — the next step up from
   * [[bigramCrossEntropy]] on the same two-corpus CCNet shape, now seeing
   * two words of context.
   *
   * Scale shape: pool trigrams derive narrowly ([[wordNgrams]] — zip_with
   * folds, no window); the context/backoff keys (both bigrams, w2, w3)
   * re-derive from the trigram STRING after the one explode, so the
   * corpus explodes once. The model is four reference-sized count aggs;
   * scoring joins are all keyed on model-sized relations (AQE broadcasts
   * small models, shuffles keyed joins for web-scale ones — still
   * linear); N is a 1-row broadcast. Micro-quantized NLL ⇒ exact BIGINT
   * doc sums, bit-for-bit oracle replay. Output: (doc_id, n_tri, s_q,
   * xent), pool docs with ≥ 1 trigram. */
  def stupidBackoffXent(docs: org.apache.spark.sql.DataFrame,
      isRef: Column, alpha: Double = 0.4)
      : org.apache.spark.sql.DataFrame = {
    val ref = docs.filter(isRef)
    def grams(df: org.apache.spark.sql.DataFrame, n: Int) = df
      .filter(size(split(col("text"), " ")) >= n)
      .select(col("doc_id"), explode(wordNgrams(col("text"), n)).as("g"))
    val c3 = grams(ref, 3).groupBy("g").agg(count(lit(1)).as("c3"))
      .withColumnRenamed("g", "tri")
    val c2 = Dedup.materialize(
      grams(ref, 2).groupBy("g").agg(count(lit(1)).as("c")))
    val c1 = Dedup.materialize(
      ref.select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c")))
    val n = c1.agg(sum("c").as("n_total"))
    val a = lit(alpha)
    grams(docs.filter(!isRef), 3)
      .select(col("doc_id"), col("g").as("tri"),
        regexp_replace(col("g"), " [^ ]+$", "").as("bg12"),
        regexp_replace(col("g"), "^[^ ]+ ", "").as("bg23"),
        split(col("g"), " ").getItem(1).as("w2"),
        split(col("g"), " ").getItem(2).as("w3"))
      .join(c3, Seq("tri"), "left")
      .join(c2.toDF("bg12", "c2a"), Seq("bg12"), "left")
      .join(c2.toDF("bg23", "c2b"), Seq("bg23"), "left")
      .join(c1.toDF("w2", "c1w2"), Seq("w2"), "left")
      .join(c1.toDF("w3", "c1w3"), Seq("w3"), "left")
      .crossJoin(broadcast(n))
      .select(col("doc_id"),
        when(coalesce(col("c3"), lit(0L)) > 0,
          col("c3").cast("double") / col("c2a"))
          .when(coalesce(col("c2b"), lit(0L)) > 0,
            a * (col("c2b").cast("double") / col("c1w2")))
          .otherwise(a * a *
            (greatest(coalesce(col("c1w3"), lit(0L)), lit(1L)).cast("double")
              / col("n_total")))
          .as("s"))
      .select(col("doc_id"),
        floor(-log(col("s")) * lit(1e6) + lit(0.5)).cast("long").as("nll_q"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tri"), sum("nll_q").as("s_q"))
      .select(col("doc_id"), col("n_tri"), col("s_q"),
        round(col("s_q").cast("double") / lit(1e6) / col("n_tri"), 6)
          .as("xent"))
  }

  /** Interpolated Kneser-Ney bigram cross-entropy (Kneser & Ney, ICASSP
   * 1995; the interpolated form of Chen & Goodman, 1998 §2.7) — the
   * smoothing every production n-gram LM ships with (KenLM, and through
   * it the CCNet perplexity filter that curates web corpora for LLM
   * pretraining). Fit on the `isRef` slice, score every pool document:
   *
   *   P(w2|w1) = max(c(w1 w2) − D, 0)/c(w1·)
   *            + (D · N1+(w1 ·)/c(w1·)) · (N1+(· w2)/T)      [seen w1]
   *            = max(N1+(· w2), 1)/T                          [unseen w1]
   *
   * with D = 0.75 (exactly representable in binary), c(w1·) the context
   * total (sum of bigram counts starting with w1), N1+(w1 ·) the distinct-
   * successor count, N1+(· w2) the CONTINUATION count — how many distinct
   * contexts w2 follows, the KN insight ("Francisco" is frequent but
   * follows only "San") — and T the total distinct bigram types. The
   * 1-clamp on the continuation count keeps unseen-continuation scores
   * finite (log 0 has no place in a filter score), same OOV discipline as
   * [[stupidBackoffXent]]; it binds only where standard KN would hand the
   * mass to an explicit <unk> token.
   *
   * Determinism: all five model statistics are exact BIGINTs; the score
   * is one fixed-shape double expression over exact integers (every
   * conversion, product, quotient, and the single sum IEEE-correctly
   * rounded), so an independent engine replays it bit-for-bit.
   * Per-position NLLs micro-quantize to BIGINT before the doc-grain sum —
   * partitioning-independent totals.
   *
   * Scale shape: identical to [[bigramCrossEntropy]] — bigrams derive
   * narrowly (zip_with over two array slices), the model is ONE
   * bigram-vocabulary count agg (c2) from which contexts, successor
   * counts, continuation counts, and T all re-derive by vocabulary-sized
   * aggs (the corpus is scanned once per side); scoring joins are keyed
   * on model-sized relations (AQE broadcasts small models, a web-scale
   * model shuffles on the token key — still linear). Output: (doc_id,
   * n_bg, s_q, xent), pool docs with ≥ 1 bigram. */
  def kneserNeyXent(docs: org.apache.spark.sql.DataFrame,
      isRef: Column, discount: Double = 0.75)
      : org.apache.spark.sql.DataFrame = {
    val w = split(col("text"), " ")
    def bigrams(df: org.apache.spark.sql.DataFrame) = df
      .filter(size(w) >= 2)
      .select(col("doc_id"),
        explode(zip_with(
          slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
          (a, b) => concat(a, lit(" "), b))).as("bg"))
    // ONE bigram-type relation feeds every model statistic (materialized:
    // four consumers would otherwise each re-scan the reference corpus).
    val c2 = Dedup.materialize(
      bigrams(docs.filter(isRef)).groupBy("bg")
        .agg(count(lit(1)).as("c2"))
        .select(col("bg"), col("c2"),
          split(col("bg"), " ").getItem(0).as("w1"),
          split(col("bg"), " ").getItem(1).as("w2")))
    val ctx = c2.groupBy("w1").agg(
      sum("c2").as("c_ctx"), count(lit(1)).as("n1p"))
    val cont = c2.groupBy("w2").agg(count(lit(1)).as("ncont"))
    val types = c2.agg(count(lit(1)).as("t_types"))
    val d = lit(discount)
    bigrams(docs.filter(!isRef))
      .select(col("doc_id"),
        split(col("bg"), " ").getItem(0).as("w1"),
        split(col("bg"), " ").getItem(1).as("w2"),
        col("bg"))
      .join(c2.select(col("bg"), col("c2")), Seq("bg"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(types))
      .select(col("doc_id"),
        when(coalesce(col("c_ctx"), lit(0L)) > 0,
          greatest(coalesce(col("c2"), lit(0L)).cast("double") - d, lit(0.0))
              / col("c_ctx") +
            ((d * col("n1p").cast("double")) / col("c_ctx")) *
              (greatest(coalesce(col("ncont"), lit(0L)), lit(1L))
                .cast("double") / col("t_types")))
          .otherwise(
            greatest(coalesce(col("ncont"), lit(0L)), lit(1L)).cast("double")
              / col("t_types"))
          .as("s"))
      .select(col("doc_id"),
        floor(-log(col("s")) * lit(1e6) + lit(0.5)).cast("long").as("nll_q"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bg"), sum("nll_q").as("s_q"))
      .select(col("doc_id"), col("n_bg"), col("s_q"),
        round(col("s_q").cast("double") / lit(1e6) / col("n_bg"), 6)
          .as("xent"))
  }

  /** Zipf rank-frequency fit (Zipf 1949): OLS slope of ln(freq) against
   * ln(rank) over the top-`k` vocabulary — natural language sits near
   * slope −1, and a corpus that drifts from it is telling on itself
   * (template/boilerplate floods flatten the head, OCR noise and
   * tokenizer breakage fatten the tail), which makes the slope a
   * one-number vocabulary-health audit beside [[vocabCoverage]].
   *
   * Determinism: ranks are exact ((freq DESC, token) total order);
   * ln(rank) and ln(freq) micro-quantize per value (the t11 idf
   * discipline — one libm call on an exact integer input, empirically
   * engine-agreeing, then floor+0.5); all regression sums are exact
   * BIGINTs; slope and intercept are the CUPED-shape fixed double
   * expressions over them (products taken AFTER int→double so nothing
   * overflows). Scale shape: one vocabulary-sized count agg, a
   * TakeOrderedAndProject cut to `k`, then a k-row window + 1-row agg —
   * the corpus is scanned once. Output: (n_points, slope, intercept). */
  def zipfFit(docs: org.apache.spark.sql.DataFrame,
      k: Int = 500): org.apache.spark.sql.DataFrame = {
    require(k >= 3, s"k must be >= 3, got $k")
    val freqs = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("tok")).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("c"), asc("tok"))
    val pts = freqs
      .select(row_number().over(w).as("rank"), col("c"))
      .select(
        floor(log(col("rank").cast("double")) * lit(1e6) + lit(0.5))
          .cast("long").as("xq"),
        floor(log(col("c").cast("double")) * lit(1e6) + lit(0.5))
          .cast("long").as("yq"))
    pts.agg(count(lit(1)).as("n"), sum("xq").as("sx"), sum("yq").as("sy"),
        sum(col("xq") * col("xq")).as("sxx"),
        sum(col("xq") * col("yq")).as("sxy"))
      .select(col("n").as("n_points"),
        round((col("n").cast("double") * col("sxy") -
          col("sx").cast("double") * col("sy")) /
          (col("n").cast("double") * col("sxx") -
            col("sx").cast("double") * col("sx")), 6).as("slope"),
        round((col("sy").cast("double") -
          ((col("n").cast("double") * col("sxy") -
            col("sx").cast("double") * col("sy")) /
           (col("n").cast("double") * col("sxx") -
            col("sx").cast("double") * col("sx"))) * col("sx")) /
          col("n") / lit(1e6), 6).as("intercept"))
  }

  /** Frequent co-occurring word pairs (Apriori 2-itemsets, Agrawal &
   * Srikant): pairs of words appearing together in ≥ `minSup` documents
   * at ANY distance — the market-basket view of a corpus, beside
   * [[phraseDetect]]'s ADJACENT-bigram collocations (a phrase is a
   * syntax signal; an any-distance pair is a topical one — the
   * template/boilerplate fingerprint that survives reordering). Support
   * pruning IS the scale guard, exactly as published: only words
   * individually frequent (≥ minSup docs — the Apriori monotonicity
   * bound) enter the per-document pair expansion, which is then bounded
   * by (frequent items per doc)² — document-length-bounded, and the
   * minSup knob shrinks it further on a heavy-tailed vocabulary. `lift`
   * (support·N / (sup_a·sup_b), micro-quantized) separates genuinely
   * associated pairs from two-popular-words coincidence. Output:
   * top-`k` pairs by (support DESC, a, b):
   * (a, b, sup_ab, sup_a, sup_b, lift_micro). */
  def itemsetPairs(docs: org.apache.spark.sql.DataFrame, minSup: Int,
      k: Int): org.apache.spark.sql.DataFrame = {
    require(minSup >= 1, s"minSup must be >= 1, got $minSup")
    require(k >= 1, s"k must be >= 1, got $k")
    val items = Dedup.materialize(Dedup.wordSets(docs))
    val nDocs = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    val freq = Dedup.materialize(items.groupBy("sh")
      .agg(count(lit(1)).as("sup")).filter(col("sup") >= minSup))
    val fi = items.join(broadcast(freq.select("sh")), Seq("sh"),
      "left_semi")
    fi.select(col("doc_id"), col("sh").as("a"))
      .join(fi.select(col("doc_id"), col("sh").as("b")), Seq("doc_id"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("sup_ab"))
      .filter(col("sup_ab") >= minSup)
      .join(broadcast(freq.select(col("sh").as("a"),
        col("sup").as("sup_a"))), Seq("a"))
      .join(broadcast(freq.select(col("sh").as("b"),
        col("sup").as("sup_b"))), Seq("b"))
      .crossJoin(broadcast(nDocs))
      .select(col("a"), col("b"), col("sup_ab"), col("sup_a"),
        col("sup_b"),
        floor(lit(1e6) * col("sup_ab").cast("double") *
          col("n_docs").cast("double") /
          (col("sup_a").cast("double") * col("sup_b").cast("double"))
          + lit(0.5)).cast("long").as("lift_micro"))
      .orderBy(col("sup_ab").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Corpus distinct-n diversity (the distinct-1/distinct-2 metrics of
   * Li et al. 2016, the standard generation-diversity panel applied to
   * training data: a corpus whose n-gram mass concentrates on few
   * distinct n-grams is template-heavy): for n = 1..3, total n-gram
   * occurrences vs distinct n-grams and the exact ppm ratio. ONE
   * tokenization serves all three widths (posexplode + two leads over
   * the per-doc position sort, then a 3-way explode — the pipe1
   * tokenize-once discipline); two aggs. Output: (ngram_n, n_total,
   * n_distinct, distinct_ppm). */
  def distinctNgramDiversity(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val toks = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .withColumn("l1", lead("tok", 1).over(w))
      .withColumn("l2", lead("tok", 2).over(w))
    toks.select(explode(array(
        struct(lit(1).as("ngram_n"), col("tok").as("gram")),
        struct(lit(2).as("ngram_n"),
          when(col("l1").isNotNull,
            concat_ws(" ", col("tok"), col("l1"))).as("gram")),
        struct(lit(3).as("ngram_n"),
          when(col("l2").isNotNull,
            concat_ws(" ", col("tok"), col("l1"), col("l2"))).as("gram"))))
        .as("g"))
      .select(col("g.ngram_n"), col("g.gram"))
      .filter(col("gram").isNotNull)
      .groupBy("ngram_n")
      .agg(count(lit(1)).as("n_total"),
        countDistinct("gram").as("n_distinct"))
      .withColumn("distinct_ppm",
        expr("(1000000 * n_distinct) div n_total"))
  }

  /** Clipped ROUGE-N overlap F1 (Lin 2004) between candidate/reference
   * text pairs — the n-gram-recall eval behind every summarization /
   * compression / dedup-quality readout: per pair, overlapping n-grams
   * count CLIPPED (min of the two sides' frequencies — repeating a
   * reference bigram five times in the candidate earns it once), then
   * precision ov/total_cand, recall ov/total_ref, and F1. Exact BIGINT
   * gram counts; P/R in exact ppm integer division; F1 = 2PR/(P+R) as
   * ONE fixed-shape double over the exact overlap/total integers,
   * micro-quantized — both engines replay it bit-for-bit. Zero-gram
   * sides (text shorter than n) yield zero scores, never NaN; a pair
   * whose BOTH sides have zero n-grams contributes no gram rows and is
   * absent from the output (identically in both engines).
   *
   * Scale shape: two narrow n-gram explodes at (pair, gram) grain, one
   * full-outer join AT THAT GRAIN (never a cross product), one
   * pair-grain agg. Output: (pair_id, n_cand, n_ref, n_overlap,
   * p_ppm, r_ppm, f1_micro). */
  def rougeN(pairs: org.apache.spark.sql.DataFrame, n: Int = 2)
      : org.apache.spark.sql.DataFrame = {
    require(n >= 1 && n <= 8, s"n must be in [1, 8], got $n")
    def grams(c: String, side: String) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("pair_id").orderBy("pos")
      val base = pairs.select(col("pair_id"),
        posexplode(split(col(c), " ")).as(Seq("pos", "tok")))
      val withLeads = (1 until n).foldLeft(base)((df, i) =>
        df.withColumn(s"l$i", lead("tok", i).over(w)))
      val gram = concat_ws(" ",
        (col("tok") +: (1 until n).map(i => col(s"l$i"))): _*)
      withLeads
        .filter((1 until n).map(i => col(s"l$i").isNotNull)
          .foldLeft(lit(true))(_ && _))
        .groupBy(col("pair_id"), gram.as("gram"))
        .agg(count(lit(1)).as(s"c_$side"))
    }
    val joined = grams("cand", "cand")
      .join(grams("ref", "ref"), Seq("pair_id", "gram"), "full_outer")
    val per = joined.groupBy("pair_id").agg(
      sum(coalesce(col("c_cand"), lit(0L))).as("n_cand"),
      sum(coalesce(col("c_ref"), lit(0L))).as("n_ref"),
      sum(least(coalesce(col("c_cand"), lit(0L)),
        coalesce(col("c_ref"), lit(0L)))).as("n_overlap"))
    val pD = col("n_overlap").cast("double") / col("n_cand").cast("double")
    val rD = col("n_overlap").cast("double") / col("n_ref").cast("double")
    per.select(col("pair_id"), col("n_cand"), col("n_ref"),
      col("n_overlap"),
      when(col("n_cand") === 0L, lit(0L))
        .otherwise(expr("(n_overlap * 1000000) div n_cand")).as("p_ppm"),
      when(col("n_ref") === 0L, lit(0L))
        .otherwise(expr("(n_overlap * 1000000) div n_ref")).as("r_ppm"),
      when(col("n_cand") === 0L || col("n_ref") === 0L ||
          col("n_overlap") === 0L, lit(0L))
        .otherwise(floor(lit(2.0) * pD * rD / (pD + rD) * lit(1e6) +
          lit(0.5)).cast("long")).as("f1_micro"))
  }

  /** Vocabulary richness estimators: bias-corrected Chao1 and the
   * Good-Turing unseen mass. Chao1 (Chao 1984, the species-richness
   * classic) estimates how many word TYPES the corpus's source actually
   * has — observed types + f₁(f₁−1)/(2(f₂+1)) from the singleton/
   * doubleton counts: a corpus still discovering its vocabulary (f₁
   * large vs f₂) is far from covering its domain, one whose estimate ≈
   * observed has converged. The Good-Turing mass f₁/N is the
   * probability the NEXT token is an unseen type — the number a
   * sampling-more-data decision actually needs ([[zipfFit]] reads the
   * distribution's slope; these read its open end).
   *
   * All exact integers (floor division). One tokenize + one vocab-grain
   * hash-agg + one 1-row agg; nothing beyond vocabulary size shuffles.
   * Output 1 row: (n_tokens, n_types, f1, f2, chao1_est,
   * gt_unseen_ppm, singleton_ppm). */
  def vocabRichness(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val freq = docs.select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    freq.agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2L, 1L).otherwise(0L)).as("f2"))
      .select(col("n_tokens"), col("n_types"), col("f1"), col("f2"),
        expr("n_types + (f1 * (f1 - 1)) div (2 * (f2 + 1))")
          .as("chao1_est"),
        expr("(f1 * 1000000) div n_tokens").as("gt_unseen_ppm"),
        expr("(f1 * 1000000) div n_types").as("singleton_ppm"))
  }

  /** Association rules (Agrawal & Srikant 1994) over the [[itemsetPairs]]
   * co-occurrence relation: each frequent unordered pair {a, b} yields
   * BOTH directed rules a→b and b→a, scored by confidence
   * `sup_ab/sup_antecedent` (kept in exact parts-per-million via BIGINT
   * floor division — no doubles) and the same micro-quantized lift as
   * t35 (direction-independent). Rules below `minConfPpm` drop; output
   * is the top-`k` by (conf DESC, antecedent, consequent) — the rule
   * mining layer on top of the support counting, same bounded-expansion
   * scale shape (minSup prunes the item set BEFORE the pair join; the
   * directed doubling is a 2× union of an already-small relation). */
  def assocRules(docs: org.apache.spark.sql.DataFrame, minSup: Int,
      minConfPpm: Long, k: Int): org.apache.spark.sql.DataFrame = {
    require(minSup >= 1, s"minSup must be >= 1, got $minSup")
    require(minConfPpm >= 0 && minConfPpm <= 1000000L,
      s"minConfPpm must be in [0, 1e6], got $minConfPpm")
    require(k >= 1, s"k must be >= 1, got $k")
    val items = Dedup.materialize(Dedup.wordSets(docs))
    val nDocs = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    val freq = Dedup.materialize(items.groupBy("sh")
      .agg(count(lit(1)).as("sup")).filter(col("sup") >= minSup))
    val fi = items.join(broadcast(freq.select("sh")), Seq("sh"),
      "left_semi")
    val pairs = fi.select(col("doc_id"), col("sh").as("a"))
      .join(fi.select(col("doc_id"), col("sh").as("b")), Seq("doc_id"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("sup_ab"))
      .filter(col("sup_ab") >= minSup)
      .join(broadcast(freq.select(col("sh").as("a"),
        col("sup").as("sup_a"))), Seq("a"))
      .join(broadcast(freq.select(col("sh").as("b"),
        col("sup").as("sup_b"))), Seq("b"))
      .crossJoin(broadcast(nDocs))
      .withColumn("lift_micro",
        floor(lit(1e6) * col("sup_ab").cast("double") *
          col("n_docs").cast("double") /
          (col("sup_a").cast("double") * col("sup_b").cast("double"))
          + lit(0.5)).cast("long"))
    val fwd = pairs.select(col("a").as("ant"), col("b").as("cons"),
      col("sup_ab"), col("sup_a").as("sup_ant"), col("lift_micro"))
    val bwd = pairs.select(col("b").as("ant"), col("a").as("cons"),
      col("sup_ab"), col("sup_b").as("sup_ant"), col("lift_micro"))
    fwd.unionByName(bwd)
      .withColumn("conf_ppm", expr("(1000000 * sup_ab) div sup_ant"))
      .filter(col("conf_ppm") >= minConfPpm)
      .select("ant", "cons", "sup_ab", "sup_ant", "conf_ppm", "lift_micro")
      .orderBy(col("conf_ppm").desc, col("ant"), col("cons"))
      .limit(k)
  }

  /** Conversation assembly — the chat/SFT data-prep step that turns an
   * event stream into per-session training DOCUMENTS: gap-sessionize per
   * user (the s1 lag+flag-sum derivation — a `gapNs` quiet period starts
   * a new session), then serialize each session's turns in
   * (ts, event_id) order as one newline-joined `type:props` text.
   * The serialized transcript feeds the SAME downstream the `documents`
   * table does — dedup, quality panels, chunking, packing — which is the
   * point: interaction logs become corpus documents inside the engine.
   *
   * Determinism: the turn order is the total (ts, event_id) order, and
   * the ordered concat rides an `array_sort(collect_list(struct(...)))`
   * (struct field order = sort key) so the text is identical under any
   * partitioning; the oracle replays it with an ORDER BY string_agg.
   * Scale shape: one per-user window pass (lag + running flag-sum share
   * the partition sort) + one (user, session) hash-agg; per-group state
   * is one session's turns — nothing corpus-sized anywhere. Output:
   * (user_id, session_id, n_turns, ts_start, ts_end, text). */
  def conversationAssembly(events: org.apache.spark.sql.DataFrame,
      gapNs: Long = 3600L * 1000000000L): org.apache.spark.sql.DataFrame = {
    require(gapNs >= 1, s"gapNs must be >= 1, got $gapNs")
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("__new",
        when(lag("ts", 1).over(wOrd).isNull ||
          col("ts") - lag("ts", 1).over(wOrd) > gapNs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("__new").over(wOrd))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_turns"),
        min("ts").as("ts_start"),
        max("ts").as("ts_end"),
        array_sort(collect_list(struct(col("ts"), col("event_id"),
          concat(col("event_type"), lit(":"),
            coalesce(col("props"), lit(""))).as("turn")))).as("__t"))
      .select(col("user_id"), col("session_id"), col("n_turns"),
        col("ts_start"), col("ts_end"),
        concat_ws("\n", transform(col("__t"), t => t.getField("turn")))
          .as("text"))
  }
}
