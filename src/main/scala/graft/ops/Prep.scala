package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end corpus-preparation job, composed from the operator
  * library as ONE declarative plan — the "crawl in, training shards out"
  * query a data team actually runs:
  *
  *   1. deduplicate ([[Dedup.dedupPipeline]]: exact-first, near-dup on
  *      representatives, components) and keep each cluster's canonical doc;
  *   2. drop low-quality documents ([[TextAnalysis.quality]] score floor);
  *   3. thin over-represented sources toward uniform token shares
  *      ([[TextAnalysis.mixToShares]]);
  *   4. assign the deterministic train/val split ([[TextAnalysis.hashSplit]])
  *      and the fixed-budget sequence-packing layout ([[TextAnalysis.pack]]).
  *
  * Every stage is a pure function of the corpus (hash lanes, no seeds, no
  * sampling state), so the whole job is reproducible bit-for-bit — the
  * composed DuckDB oracle proves it end to end. Each stage's keep-set is a
  * tiny id projection joined back; the survivor frames feeding 2+ downstream
  * branches are persisted through [[CacheScope]] (memory/disk on a cluster),
  * so the corpus is scanned once per STAGE, not once per downstream branch —
  * the standard multi-pass prep-job I/O shape.
  */
object Prep {

  def prepCorpus(docs: DataFrame, qualityMin: Double = 0.40,
      budget: Int = 2048, shards: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    val canonIds = Dedup.dedupPipeline(docs, threshold = threshold)
      .filter(col("is_canonical")).select(col("doc_id"))
    val canon = CacheScope.track(docs.join(canonIds, "doc_id"))
    val qIds = TextAnalysis.quality(canon)
      .filter(col("quality") >= qualityMin).select(col("doc_id"))
    val qualified = CacheScope.track(canon.join(qIds, "doc_id"))
    // mix rates are computed over the POST-filter corpus: thinning targets
    // the shares of what survives, not of what was crawled
    val mixIds = TextAnalysis.mixToShares(qualified)
      .filter(col("kept")).select(col("doc_id"))
    val mixed = CacheScope.track(qualified.join(mixIds, "doc_id"))
    TextAnalysis.pack(mixed, budget, shards)
      .join(TextAnalysis.hashSplit(mixed), "doc_id")
      .select(col("doc_id"), col("split"), col("shard"), col("seq"),
        col("tok_offset"), col("n_tokens"))
  }

  /** The FineWeb-shaped recipe, composed from the round-7 operator surface —
    * the second end-to-end prep job, proving the filters compose the same
    * way [[prepCorpus]]'s dedup-first recipe does:
    *
    *   1. rule filtering first ([[TextAnalysis.gopherRules]] — the cheap
    *      per-row pass runs BEFORE anything that shuffles);
    *   2. normalized-exact dedup on the survivors
    *      ([[Dedup.exactNormalized]] canonicals — crawl case/punctuation
    *      variants collapse at one digest shuffle);
    *   3. per-source top-fraction quality retention
    *      ([[TextAnalysis.qualityTopFrac]] — FineWeb's keep-the-best cut,
    *      histogram-exact);
    *   4. split + pack ([[TextAnalysis.hashSplit]] / [[TextAnalysis.pack]]).
    *
    * Same reproducibility contract as [[prepCorpus]]: every stage is a pure
    * function of the corpus, keep-sets are id projections joined back,
    * multi-branch survivor frames are [[CacheScope]]-tracked so each stage
    * scans once. */
  def prepFineWeb(docs: DataFrame, keepFrac: Double = 0.3,
      budget: Int = 2048, shards: Int = 32): DataFrame = {
    val gIds = TextAnalysis.gopherRules(docs)
      .filter(col("kept")).select(col("doc_id"))
    val g = CacheScope.track(docs.join(gIds, "doc_id"))
    val canonIds = Dedup.exactNormalized(g)
      .select(col("keep_id").as("doc_id"))
    val canon = CacheScope.track(g.join(canonIds, "doc_id"))
    val qIds = TextAnalysis.qualityTopFrac(canon, keepFrac)
      .filter(col("kept")).select(col("doc_id"))
    val selected = CacheScope.track(canon.join(qIds, "doc_id"))
    TextAnalysis.pack(selected, budget, shards)
      .join(TextAnalysis.hashSplit(selected), "doc_id")
      .select(col("doc_id"), col("split"), col("shard"), col("seq"),
        col("tok_offset"), col("n_tokens"))
  }

  /** [[prepFineWeb]] re-rooted at STAGE ZERO: raw HTML pages → boilerplate-
    * stripped text ([[TextExtract.extract]]) → the FineWeb recipe. The
    * fixture has no crawl table, so the pages come from the deterministic
    * renderer ([[TextExtract.htmlPages]]); a real deployment feeds its
    * crawl table straight into the same extract → prep chain. Extraction
    * is pure per-row expression compute and adds no shuffle of its own;
    * the extracted frame is EAGERLY materialized because the recipe's
    * first stage consumes it twice (the Gopher gate and the survivor
    * join) and several of its later jobs run before a lazy cache would
    * land — measured at sf0.1, the lazy version recomputed the extraction
    * chain into 14.3 s where the eager one runs the same plan in ~7 s. */
  def prepFineWebHtml(docs: DataFrame, keepFrac: Double = 0.3,
      budget: Int = 2048, shards: Int = 32): DataFrame =
    prepFineWeb(
      CacheScope.trackEager(TextExtract.extract(TextExtract.htmlPages(docs))
        .select(col("doc_id"), col("text"), col("source"))),
      keepFrac, budget, shards)

  /** The FULL crawl-to-shards pipeline, starting one stage earlier still —
    * at the URL GATE (the first thing a CCNet/FineWeb-style crawl recipe
    * evaluates, before fetching or extracting anything):
    *
    *   0. URL filter ([[UrlOps.filterReason]] — blocklist/spam/length
    *      rules as a pure per-row FILTER, no id join, fused into the scan);
    *   1. stage-zero extraction ([[TextExtract.extract]]);
    *   2. corpus-level line dedup ([[TextAnalysis.lineDedup]] — lines
    *      repeating across ≥ 2 documents are boilerplate and drop from
    *      every copy; the surviving per-doc text feeds everything below);
    *   3. the FineWeb recipe on the CLEANED text ([[prepFineWeb]]:
    *      Gopher rules → normalized-exact canonicals → per-source
    *      top-fraction quality → split + pack).
    *
    * Stages 0–1 are expression-only and run at scan speed; stage 2 is the
    * first shuffle (digest-keyed); stage 3 is the audited prep chain. The
    * fixture URLs/pages come from the deterministic renderers; a real
    * deployment points the same chain at its crawl table's (url, html). */
  def prepWeb(docs: DataFrame, keepFrac: Double = 0.3,
      budget: Int = 2048, shards: Int = 32): DataFrame = {
    val gated = UrlOps.pageUrls(docs)
      .filter(UrlOps.filterReason(col("url")) === "ok")
      .select(col("doc_id"), col("text"), col("source"))
    crawlChain(TextExtract.htmlPages(gated), keepFrac, budget, shards)
  }

  /** Stages 1–3 of the crawl pipeline over an already-URL-gated pages
    * table `(doc_id, source, html)` — shared by [[prepWeb]] (rendered
    * fixture pages) and [[prepWarc]] (WARC-parsed pages): stage-zero
    * extraction → corpus-level line dedup → the FineWeb chain. Both stage
    * frames feed 2+ consumers and carry the expensive (render→)extract
    * (→dedup) lineage — EAGER materialization, for the same measured
    * reason as [[prepFineWebHtml]] (lazy caches lose the race to the
    * chain's first jobs and the lineage recomputes). */
  private def crawlChain(pages: DataFrame, keepFrac: Double,
      budget: Int, shards: Int): DataFrame = {
    val extracted = CacheScope.trackEager(
      TextExtract.extract(pages)
        .select(col("doc_id"), col("text"), col("source")))
    val clean = CacheScope.trackEager(TextAnalysis.lineDedup(extracted)
      .select(col("doc_id"), col("cleaned_text").as("text"))
      .join(extracted.select(col("doc_id"), col("source")), "doc_id"))
    prepFineWeb(clean, keepFrac, budget, shards)
  }

  /** The crawl pipeline rooted one stage earlier still — at the RAW CRAWL
    * FILES: parse the WARC fixture ([[Warc.webWarc]]'s render → parse
    * round trip), keep `response` records, apply the URL gate to the
    * PARSED target URI, extract from the PARSED payload, and run the
    * shared [[crawlChain]]. `source` rides outside the WARC record in the
    * fixture and is restored by one equi-join on `doc_id` (a real fetcher
    * stashes such metadata in a WARC extension header; the join stands in
    * for reading it). By the round-trip identity the result must equal
    * [[prepWeb]] exactly — and the oracle holds it to that. */
  def prepWarc(docs: DataFrame, keepFrac: Double = 0.3,
      budget: Int = 2048, shards: Int = 32): DataFrame = {
    val pages = Warc.records(Warc.files(docs))
      .filter(col("warc_type") === "response" &&
        UrlOps.filterReason(col("target_uri")) === "ok")
      .select(col("doc_id"), col("body").as("html"))
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
    crawlChain(pages, keepFrac, budget, shards)
  }
}
