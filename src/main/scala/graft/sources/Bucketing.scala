package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/**
 * Bucketed-table materialization — the storage-layout half of the engine's
 * shuffle story. Every REPEATED equi-join against a durable table (the
 * incremental-dedup history index re-probed by every batch, an ANN
 * codebook-assignment table re-joined by every query wave, a per-domain
 * stats table joined into each crawl refresh) pays a full exchange of the
 * durable side on EVERY run when that side is stored as plain files.
 * Writing it ONCE bucketed by the join key makes Spark's planner prove
 * co-location from the catalog and drop that exchange from every
 * subsequent plan: at 100 TB the exchange is the dominant cost, and it is
 * paid once at write time instead of per run.
 *
 * Mechanics (all public Spark): `DataFrameWriter.bucketBy(n, key)` +
 * `saveAsTable` records the bucket spec in the catalog; a join whose keys
 * cover the bucket key of two tables with the SAME bucket count plans as
 * a sort-merge join with zero `ShuffleExchange` nodes (sorted buckets via
 * `sortBy` also drop the per-task sort). [[hasShuffle]] is the plan
 * assertion used by the spec — layout claims are verified against the
 * physical plan, not asserted in prose.
 */
object Bucketing {

  /** Write `df` as an external parquet table bucketed (and bucket-sorted)
    * by `key` — the one-time layout cost that removes this side's
    * exchange from every future equi-join on `key`.
    *
    * The frame is first repartitioned on `key` to exactly `buckets`
    * partitions: `repartition`'s `HashPartitioning` and the writer's
    * bucket-id function are the same Murmur3-pmod hash, so each write task
    * holds exactly one bucket's rows and each bucket lands in ONE file.
    * Without it every writer task emits a file per bucket it touches
    * (tasks × buckets small files — measured 1024 for a 32×32 write): the
    * later scan then pays per-file open/footer overhead on every probe —
    * 8× amplified when the table feeds the near tier's 8 band branches —
    * and multi-file buckets forfeit the sorted-scan guarantee `sortBy`
    * exists for (Spark only trusts bucket order when a bucket is a single
    * file). One extra exchange at write time buys both back for every
    * subsequent read. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit = {
    require(buckets > 0, s"buckets > 0: $buckets")
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite").format("parquet").option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** Equi-join two same-bucketed catalog tables on `key` — plans with no
    * exchange on either side when both were written via [[writeBucketed]]
    * with the same bucket count. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Whether the physical plan contains any shuffle exchange (descending
    * into AQE-wrapped subtrees). */
  def hasShuffle(df: DataFrame): Boolean = countShuffles(df) > 0

  /** Number of shuffle exchanges in the physical plan (descending into
    * AQE-wrapped subtrees) — the bucketed-vs-plain layout delta the specs
    * assert on. */
  def countShuffles(df: DataFrame): Int = {
    def scan(p: org.apache.spark.sql.execution.SparkPlan): Int =
      p.collect { case _: ShuffleExchangeExec => 1 }.sum +
        p.collect { case a: AdaptiveSparkPlanExec => a }
          .map(a => scan(a.executedPlan)).sum
    scan(df.queryExecution.executedPlan)
  }
}
