package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines, over the
 * `documents` table: tokenization + counting, quality scoring, language-ID
 * heuristic, and document fingerprinting.
 *
 * All pure column expressions (whole-stage codegen, no shuffle except where
 * noted), so they stream over a 100 TB corpus at scan speed with full
 * predicate/column pushdown into the source.
 */
/** Tokenization strategy threaded through the text/dedup family. Whitespace
  * split is the default (cheap, oracle-mirrored); the BPE-ish variant
  * separates punctuation-glued words — on real corpora whitespace
  * under-tokenizes ("quick,brown" is one token) and near-dup detection
  * misses pairs that differ only in punctuation spacing. */
sealed trait Tokenizer extends Serializable {
  def tokens(text: Column): Column
}

object Tokenizer {
  /** Split on single spaces, empties dropped. */
  case object Whitespace extends Tokenizer {
    override def tokens(text: Column): Column =
      filter(split(text, " "), t => t =!= "")
  }

  /** BPE-ish pre-tokenization: alphanumeric runs or single non-space
    * symbols — the shape of byte-pair-encoder pre-splitting. */
  case object BpeIsh extends Tokenizer {
    override def tokens(text: Column): Column =
      regexp_extract_all(text, lit(TextAnalysis.BpeRegex), lit(0))
  }
}

object TextAnalysis {

  /** Whitespace tokens, empties dropped (the default [[Tokenizer]]). */
  def tokens(text: Column): Column = Tokenizer.Whitespace.tokens(text)

  /** BPE-ish pre-tokenization: alphanumeric runs or single non-space symbols —
    * the shape of byte-pair-encoder pre-splitting. */
  val BpeRegex = "[a-zA-Z0-9]+|[^a-zA-Z0-9 ]"

  /** doc_id, whitespace-token count, BPE-ish token count, char count. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).as("n_tokens_ws"),
      size(regexp_extract_all(col("text"), lit(BpeRegex), lit(0))).as("n_tokens_bpe"),
      length(col("text")).as("n_chars"))

  /** Small public stopword lists for the language-ID heuristic. */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "von"),
    "es" -> Seq("el", "la", "de", "y", "en", "es", "un", "una", "por", "con"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans", "pour", "que", "il", "au"))

  private def stopCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** n-gram-free language-ID heuristic: stopword hit counts per language,
    * winner by count with a fixed en>de>es>fr priority on ties. */
  def langId(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val en = stopCount(t, Stopwords("en")); val de = stopCount(t, Stopwords("de"))
    val es = stopCount(t, Stopwords("es")); val fr = stopCount(t, Stopwords("fr"))
    docs.select(
      col("doc_id"),
      en.as("score_en"), de.as("score_de"), es.as("score_es"), fr.as("score_fr"),
      when(en >= de && en >= es && en >= fr, "en")
        .when(de >= es && de >= fr, "de")
        .when(es >= fr, "es")
        .otherwise("fr").as("lang_guess"))
  }

  /** Quality scoring: length/alpha/stopword/token-shape signals combined into
    * one [0,1] score. Division order is fixed so the oracle reproduces the
    * exact doubles. */
  def quality(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val nChars = length(col("text"))
    val nToks = size(t)
    val alpha = length(regexp_replace(col("text"), "[^a-z]", ""))
    val stops = stopCount(t, Stopwords("en"))
    val avgTokLen =
      aggregate(t, lit(0), (acc, x) => acc + length(x)).cast("double") / nToks
    val alphaRatio = alpha.cast("double") / nChars
    val stopRatio = stops.cast("double") / nToks
    val score = stopRatio * 0.4 + least(avgTokLen / 10.0, lit(1.0)) * 0.3 +
      alphaRatio * 0.3
    docs.select(
      col("doc_id"), nChars.as("n_chars"), nToks.as("n_tokens"),
      avgTokLen.as("avg_token_len"), alphaRatio.as("alpha_ratio"),
      stopRatio.as("stopword_ratio"), score.as("quality"))
  }

  /** Document fingerprints: md5 of the lowercased text (exact identity), plus
    * the minimum bigram hash (a 1-feature winnowing sketch robust to
    * local edits). */
  def fingerprint(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    val n = size(t)
    val bigrams = zip_with(
      slice(t, lit(1), greatest(n - 1, lit(0))),
      slice(t, lit(2), greatest(n - 1, lit(0))),
      (x, y) => concat(x, lit(" "), y))
    docs.select(
      col("doc_id"),
      md5(lower(col("text")).cast("binary")).as("fp_md5"),
      array_min(transform(bigrams, b => md5(b.cast("binary")))).as("fp_min_bigram"))
  }

  /** Corpus vocabulary: the top-K tokens by document frequency, with
    * `minDf` dropping hapax noise. The document-frequency aggregation is one
    * map-side-combining groupBy over distinct per-doc tokens; the top-K is a
    * distributed TakeOrdered (`orderBy.limit`), NOT a global window sort —
    * only K rows ever reach one place, so the op holds at any corpus size.
    * The rank column is then a window over just those K rows. Vocabulary
    * building is the input to tokenizer training. */
  def vocabulary(docs: DataFrame, minDf: Int = 2, topK: Int = 1000,
      tokenizer: Tokenizer = Tokenizer.Whitespace): DataFrame = {
    val postings = docs.select(
      explode(array_distinct(tokenizer.tokens(col("text")))).as("tok"))
    val dfs = postings.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val top = dfs.orderBy(col("df").desc, col("tok")).limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("df").desc, col("tok"))
    top.withColumn("rank", row_number().over(w))
      .select(col("rank"), col("tok"), col("df"))
  }

  /** Deterministic train/validation split: the split is a pure function of
    * doc_id (md5 lane mod 100 vs `trainPct`), so it is stable across runs,
    * cluster layouts, and engine versions — no sampling state, no seed
    * coordination; a pure per-row projection at scan speed. */
  def hashSplit(docs: DataFrame, trainPct: Int = 90): DataFrame = {
    val lane = conv(substring(
      md5(col("doc_id").cast("string").cast("binary")), 1, 7), 16, 10).cast("long")
    docs.select(col("doc_id"),
      when(lane % 100 < trainPct, lit("train")).otherwise(lit("val")).as("split"))
  }
}
