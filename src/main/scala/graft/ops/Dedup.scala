package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines over the `documents`
 * table: exact, MinHash+LSH, SimHash, and n-gram Jaccard.
 *
 * Scale design (the 100 TB story):
 *  - exact dedup is one hash-shuffle on a 16-byte digest — the minimal
 *    possible shuffle width for exact identity;
 *  - MinHash signatures are ONE `groupBy(doc)` with K aggregate expressions
 *    (no K-way row explosion), then candidate generation is an equi-join on
 *    band buckets — never an all-pairs product;
 *  - SimHash is likewise one groupBy with 16 bit-plane sums;
 *  - verification joins (exact Jaccard) run only on LSH candidates.
 *
 * Hashes are md5-based so the DuckDB oracle reproduces them bit-for-bit;
 * min-hashes compare as fixed-width hex strings (lexicographic = numeric).
 * A production deployment would swap md5 for xxhash64 — one function constant.
 */
object Dedup {

  /** Exact dedup: canonical (minimum) doc_id and multiplicity per distinct
    * text digest. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).cast("int").as("n_copies"))

  /** (doc_id, tok) with distinct tokens per doc — the token-set relation. */
  private def docTokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(array_distinct(TextAnalysis.tokens(col("text")))).as("tok"))

  /** K min-hashes per doc, as 16-hex-char strings: seed k's hash of token t is
    * substr(md5("k:t"), 1, 16). One groupBy, K aggregate expressions. */
  def minhashSignatures(docs: DataFrame, k: Int = 32): DataFrame = {
    val aggs = (0 until k).map { s =>
      min(substring(md5(concat(lit(s.toString), lit(":"), col("tok")).cast("binary")),
        1, 16)).as(s"mh$s")
    }
    docTokens(docs).groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH band signatures: `bands` bands of `k/bands` rows; band b's signature
    * is the md5 of its concatenated min-hashes. */
  def lshBands(sigs: DataFrame, k: Int = 32, bands: Int = 2): DataFrame = {
    val rows = k / bands
    val bandCols = (0 until bands).map { b =>
      md5(concat((b * rows until (b + 1) * rows).map(i => col(s"mh$i")): _*)
        .cast("binary")).as(s"band$b")
    }
    sigs.select(col("doc_id") +: bandCols: _*)
  }

  /** Exact Jaccard similarity over distinct-token sets for a given pair
    * relation (a, b): |A∩B| / |A∪B|. Computed with `array_intersect` on
    * per-doc token-set arrays (token sets are bounded and small), so the only
    * joins are candidate→doc-set lookups — no skew-prone token-level join. */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame): DataFrame = {
    // the set table is joined twice (a-side and b-side); persist so the
    // tokenization subtree is computed once, not per join branch
    val sets = docs.select(col("doc_id"),
      array_distinct(TextAnalysis.tokens(col("text"))).as("tks")).persist()
    val joined = pairs
      .join(sets.as("sa"), col("a") === col("sa.doc_id"))
      .join(sets.as("sb"), col("b") === col("sb.doc_id"))
    val inter = size(array_intersect(col("sa.tks"), col("sb.tks")))
    joined.select(col("a"), col("b"),
      (inter.cast("double") / (size(col("sa.tks")) + size(col("sb.tks")) - inter))
        .as("jaccard"))
  }

  /** MinHash+LSH near-dup pairs: distinct candidate pairs from any shared
    * band bucket, verified by exact Jaccard >= `threshold`. */
  def minhashLsh(docs: DataFrame, k: Int = 32, bands: Int = 2,
      threshold: Double = 0.8): DataFrame = {
    // signatures feed 2*bands join branches; persist the (tiny: one row per
    // doc) banded table so the signature aggregation runs once
    val banded = lshBands(minhashSignatures(docs, k), k, bands).persist()
    val candidates = (0 until bands).map { b =>
      banded.as("l").join(banded.as("r"),
          col(s"l.band$b") === col(s"r.band$b") &&
            col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
    }.reduce(_ unionByName _).distinct()
    jaccardVerify(candidates, docs)
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** 16-bit integer hash of a token: first 4 hex chars of its md5. */
  private def tokVal(tok: Column): Column =
    conv(substring(md5(tok.cast("binary")), 1, 4), 16, 10).cast("int")

  /** 16-bit SimHash per doc over the token multiset: bit j is the sign of the
    * sum of (+1/-1) contributions of every token's j-th hash bit. */
  def simhash(docs: DataFrame): DataFrame = {
    val toksAll = docs.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val tv = tokVal(col("tok"))
    val planeSums = (0 until 16).map { j =>
      sum(when(shiftright(tv, j).bitwiseAND(lit(1)) === 1, 1).otherwise(-1)).as(s"s$j")
    }
    toksAll.groupBy(col("doc_id")).agg(planeSums.head, planeSums.tail: _*)
      .select(col("doc_id"),
        (0 until 16).map(j =>
          when(col(s"s$j") >= 0, lit(1L << j)).otherwise(lit(0L))
        ).reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs: Hamming distance <= maxHamming. All-pairs here
    * (the corpus of fingerprints is tiny relative to the corpus of docs); at
    * extreme scale the standard trick is joining on (16/maxHamming)-bit
    * chunks, same shape as [[minhashLsh]] banding. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val fps = simhash(docs).persist()
    fps.as("l").join(fps.as("r"), col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Word-bigram Jaccard near-dup pairs. Candidates come from an inverted
    * index on bigrams with a document-frequency cap (`dfCap`): postings of
    * ubiquitous bigrams are dropped — the standard skew guard; a pair is only
    * missed if it shares NO rare bigram. Jaccard is then exact over the full
    * bigram sets via `array_intersect`. */
  def ngramJaccard(docs: DataFrame, threshold: Double = 0.3, dfCap: Int = 200): DataFrame = {
    val t = TextAnalysis.tokens(col("text"))
    val n = size(t)
    val sets = docs.select(col("doc_id"),
      array_distinct(zip_with(
        slice(t, lit(1), greatest(n - 1, lit(0))),
        slice(t, lit(2), greatest(n - 1, lit(0))),
        (x, y) => concat(x, lit(" "), y))).as("bgs"))
    val postings = sets.select(col("doc_id"), explode(col("bgs")).as("bg"))
    val rare = postings.groupBy(col("bg")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap).select(col("bg"))
    val rarePostings = postings.join(rare, "bg")
    val candidates = rarePostings.as("l").join(rarePostings.as("r"),
        col("l.bg") === col("r.bg") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b")).distinct()
    val joined = candidates
      .join(sets.as("sa"), col("a") === col("sa.doc_id"))
      .join(sets.as("sb"), col("b") === col("sb.doc_id"))
    val inter = size(array_intersect(col("sa.bgs"), col("sb.bgs")))
    joined.select(col("a"), col("b"),
      (inter.cast("double") / (size(col("sa.bgs")) + size(col("sb.bgs")) - inter))
        .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
