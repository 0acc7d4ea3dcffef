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

  /** K min-hashes per doc, as longs. ONE md5 per distinct token yields two
    * 28-bit lanes (hex chars 1-7 and 9-15 of the digest); seed s's hash of
    * token t is the affine h1(t) + s*h2(t) — the standard (a + s·b) family —
    * so K min-hashes cost one digest plus K multiply-adds per token (vs K
    * digests). One groupBy with K `min` aggregates: map-side partial
    * aggregation shrinks the shuffle to one row per doc. */
  def minhashSignatures(docs: DataFrame, k: Int = 32): DataFrame = {
    val d = md5(col("tok").cast("binary"))
    val h1 = conv(substring(d, 1, 7), 16, 10).cast("long")
    val h2 = conv(substring(d, 9, 7), 16, 10).cast("long")
    val aggs = (0 until k).map { s =>
      min(col("h1") + lit(s.toLong) * col("h2")).as(s"mh$s")
    }
    docTokens(docs).select(col("doc_id"), h1.as("h1"), h2.as("h2"))
      .groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH band signatures: `bands` bands of `k/bands` rows; band b's signature
    * is the md5 of its ':'-joined min-hashes. */
  def lshBands(sigs: DataFrame, k: Int = 32, bands: Int = 2): DataFrame = {
    val rows = k / bands
    val bandCols = (0 until bands).map { b =>
      md5(concat_ws(":",
        (b * rows until (b + 1) * rows).map(i => col(s"mh$i").cast("string")): _*)
        .cast("binary")).as(s"band$b")
    }
    sigs.select(col("doc_id") +: bandCols: _*)
  }

  /** 28-bit token hash (md5 hex chars 1-7) — shingle hashing, the standard
    * large-corpus dedup representation: set ops compare ints, not strings. */
  private def tokHash(t: Column): Column =
    conv(substring(md5(t.cast("binary")), 1, 7), 16, 10).cast("int")

  /** Jaccard similarity over hashed-token sets for a given pair relation
    * (a, b): |A∩B| / |A∪B|. Each doc's set is built ONCE as a sorted int
    * array; per-pair intersection is then a codegen'd merge pass
    * ([[graft.functions.ArrayExprs.sortedIntersectSize]]) — the verify stage
    * runs once per candidate pair (quadratic in cluster size), so per-pair
    * cost is the whole game at corpus scale. */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame): DataFrame = {
    // the set table is joined twice (a-side and b-side); persist so the
    // tokenization subtree is computed once, not per join branch. Candidate
    // pairs are quadratic in cluster size while the set table is one bounded
    // row per doc, so the set side is broadcast — at corpus scale where even
    // that side outgrows a broadcast, drop the hint and these become
    // hash-partitioned joins on doc_id (AQE picks the strategy).
    val sets = docs.select(col("doc_id"),
      array_sort(array_distinct(
        transform(TextAnalysis.tokens(col("text")), t => tokHash(t)))).as("tks")).persist()
    val joined = pairs
      .join(broadcast(sets.as("sa")), col("a") === col("sa.doc_id"))
      .join(broadcast(sets.as("sb")), col("b") === col("sb.doc_id"))
    val inter = graft.functions.ArrayExprs.sortedIntersectSize(
      col("sa.tks"), col("sb.tks"))
    joined.select(col("a"), col("b"),
      (inter.cast("double") / (size(col("sa.tks")) + size(col("sb.tks")) - inter))
        .as("jaccard"))
  }

  /** MinHash+LSH near-dup pairs: distinct candidate pairs from any shared
    * band bucket, verified by exact Jaccard >= `threshold`.
    *
    * Candidate pairs are emitted exactly once WITHOUT a dedup shuffle: branch
    * b's join requires all earlier bands to differ, so the branches are
    * disjoint by construction and their union is already the distinct pair
    * set. The one exchange that remains is a round-robin rebalance before the
    * verify stage — intra-bucket pair generation is quadratic in bucket size,
    * so a skewed bucket (near-identical template docs all sharing one band
    * signature) would otherwise pin the whole verify on one task. */
  def minhashLsh(docs: DataFrame, k: Int = 32, bands: Int = 2,
      threshold: Double = 0.8): DataFrame = {
    // signatures feed `bands` join branches; persist the (tiny: one row per
    // doc) banded table so the signature aggregation runs once
    val banded = lshBands(minhashSignatures(docs, k), k, bands).persist()
    val candidates = (0 until bands).map { b =>
      val guard = (0 until b)
        .map(p => col(s"l.band$p") =!= col(s"r.band$p"))
        .foldLeft(col(s"l.band$b") === col(s"r.band$b"))(_ && _)
      // broadcast the build side: the stream side then stays partitioned by
      // doc_id (its groupBy output), so a giant band bucket's quadratic pair
      // emission spreads across all tasks instead of collapsing onto the one
      // task that would own that band key under a sort-merge join. At corpus
      // scale (banded too big to broadcast) the scale path is partition-by-
      // band plus intra-bucket salting — same disjoint-branch shape.
      banded.as("l").join(broadcast(banded.as("r")),
          guard && col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
    }.reduce(_ unionByName _)
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
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

  /** SimHash near-dup pairs: Hamming distance <= maxHamming, found EXACTLY
    * without an all-pairs product via the pigeonhole chunk-join: the 16-bit
    * fingerprint splits into maxHamming+1 chunks, and any pair within
    * distance maxHamming must agree exactly on at least one chunk — so
    * equi-joins on each chunk (with a branch guard requiring earlier chunks
    * to differ, making branches disjoint) generate every qualifying pair
    * exactly once, then the cheap bit_count filter verifies. At corpus scale
    * this is a hash-partitioned join per chunk instead of an n² scan. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val nChunks = maxHamming + 1
    val bitsPer = 16 / nChunks
    val mask = (1L << bitsPer) - 1
    val chunkCols = (0 until nChunks).map { c =>
      shiftright(col("simhash"), c * bitsPer).bitwiseAND(lit(mask)).as(s"c$c")
    }
    val fps = simhash(docs).select(col("doc_id") +: col("simhash") +: chunkCols: _*)
      .persist()
    (0 until nChunks).map { c =>
      val guard = (0 until c)
        .map(p => col(s"l.c$p") =!= col(s"r.c$p"))
        .foldLeft(col(s"l.c$c") === col(s"r.c$c"))(_ && _)
      // broadcast build side: a 4-bit chunk has only 16 distinct values, so
      // a shuffle join would collapse the corpus onto <=16 tasks; with the
      // broadcast, the doc_id-partitioned stream side emits pairs in parallel
      fps.as("l").join(broadcast(fps.as("r")), guard && col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"),
          bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("hamming"))
    }.reduce(_ unionByName _)
      .filter(col("hamming") <= maxHamming)
  }

  /** Word-bigram Jaccard near-dup pairs. Candidates come from an inverted
    * index on hashed bigrams with a document-frequency cap (`dfCap`):
    * postings of ubiquitous bigrams are dropped — the standard skew guard; a
    * pair is only missed if it shares NO rare bigram. Bigrams are 28-bit
    * shingle hashes throughout (postings shuffle ints, not strings), and the
    * Jaccard over the full hashed-bigram sets is a codegen'd sorted-merge
    * pass, as in [[jaccardVerify]]. */
  def ngramJaccard(docs: DataFrame, threshold: Double = 0.3, dfCap: Int = 200): DataFrame = {
    val t = TextAnalysis.tokens(col("text"))
    val n = size(t)
    val bigrams = zip_with(
      slice(t, lit(1), greatest(n - 1, lit(0))),
      slice(t, lit(2), greatest(n - 1, lit(0))),
      (x, y) => concat(x, lit(" "), y))
    val sets = docs.select(col("doc_id"),
      array_sort(array_distinct(transform(bigrams, b => tokHash(b)))).as("bgs"))
      .persist()
    // ONE shuffle builds the inverted index: postings group to per-bigram
    // doc lists, the df cap drops ubiquitous bigrams (bounding every bucket
    // at dfCap docs = dfCap² pair expansions), and candidate pairs expand
    // in place by double explode — no posting self-join, no second shuffle.
    val postings = sets.select(col("doc_id"), explode(col("bgs")).as("bg"))
    val buckets = postings.groupBy(col("bg"))
      .agg(collect_list(col("doc_id")).as("ds"))
      .filter(size(col("ds")).between(2, dfCap))
    val candidates = buckets
      .select(explode(col("ds")).as("a"), col("ds"))
      .select(col("a"), explode(col("ds")).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
    val joined = candidates
      .join(broadcast(sets.as("sa")), col("a") === col("sa.doc_id"))
      .join(broadcast(sets.as("sb")), col("b") === col("sb.doc_id"))
    val inter = graft.functions.ArrayExprs.sortedIntersectSize(
      col("sa.bgs"), col("sb.bgs"))
    joined.select(col("a"), col("b"),
      (inter.cast("double") / (size(col("sa.bgs")) + size(col("sb.bgs")) - inter))
        .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
