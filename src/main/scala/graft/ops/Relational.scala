package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal-relational operators beyond Spark's built-in join set. */
object Relational {

  /** Point-in-time ("as-of") join: for every left row, attach the most
    * recent right row with `right(rightTs) <= left(leftTs)` for the same
    * `key` — the temporal lookup behind feature backfills, slowly-changing
    * dimensions, and "state at event time" queries.
    *
    * Spark-first shape: the naive formulation (`JOIN ON key = key AND
    * rts <= lts` + max) is an O(|L|·|R|) range join per key that Catalyst
    * can only nested-loop. Instead both sides are union-tagged into ONE
    * timeline per key and sorted once; a running `last(_, ignoreNulls)`
    * window carries each right payload forward to the left rows that follow
    * it. Cost: one hash shuffle per side (by `key`) + one sort per key —
    * the sort-merge as-of, linear in |L|+|R|, no pair blow-up, skew handled
    * by AQE like any keyed window.
    *
    * Tie semantics: right rows order before left rows at the same
    * timestamp, so an equal-timestamp right row IS visible (inclusive
    * backward join). Among multiple right rows at the same (key, ts) the
    * last in an unspecified order wins — disambiguate upstream if that
    * matters.
    *
    * @param rightPayload right-side columns to carry, as (srcName, outName)
    *   pairs; left rows with no prior right row get nulls.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      rightPayload: Seq[(String, String)]): DataFrame = {
    val outNames = rightPayload.map(_._2)
    require(!left.columns.exists(c => c == "__ts" || c == "__side"),
      "left side may not use the reserved column names __ts/__side")
    require(outNames.distinct == outNames &&
      outNames.forall(o => !left.columns.contains(o)),
      s"payload output names must be unique and not collide with left " +
        s"columns: $outNames vs ${left.columns.mkString(",")}")
    val leftRest = left.columns.toSeq.filterNot(c => c == key || c == leftTs)
    val lSel = Seq(col(key), col(leftTs).as("__ts"), lit(1).as("__side")) ++
      leftRest.map(col) ++
      rightPayload.map { case (src, out) =>
        lit(null).cast(right.schema(src).dataType).as(out)
      }
    val rSel = Seq(col(key), col(rightTs).as("__ts"), lit(0).as("__side")) ++
      leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
      rightPayload.map { case (src, out) => col(src).as(out) }
    // a null-timestamp right row satisfies no `rts <= lts` and must not be
    // carried anywhere (unfiltered it sorts NULLS FIRST, i.e. before every
    // left row of its key)
    val merged = left.select(lSel: _*)
      .unionByName(right.filter(col(rightTs).isNotNull).select(rSel: _*))
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = rightPayload.foldLeft(merged) { case (df, (_, out)) =>
      df.withColumn(out, last(col(out), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__side")
      .withColumnRenamed("__ts", leftTs)
  }

  /** Trailing-window spike detection over a keyed event stream: bucket
    * events into fixed windows per key, then flag buckets whose count
    * exceeds `factor`× the mean of the previous `lookback` OBSERVED buckets
    * — the rate-anomaly monitor a pipeline runs over its ingest/error
    * streams. The comparison is INTEGER-exact (`cnt · n_prev >
    * factor · sum_prev` — no float mean, no stddev whose shuffle-order sum
    * would diverge between engines), so the flag is bit-reproducible.
    *
    * Scale shape: one map-side-combining groupBy to the per-(key, bucket)
    * counts — the shuffled relation is buckets, not events — then one
    * window per key over those bounded rows. The trailing frame is ROWS
    * over observed buckets (empty buckets don't exist as rows; a gap
    * therefore compresses, which is the right semantics for sparse keys
    * and keeps the frame a pure rows-frame both engines sort identically).
    *
    * @param tsUs    event-time column in epoch MICROSECONDS (long)
    * @param bucketUs window width in microseconds (default 1 hour)
    */
  def trailingSpikes(events: DataFrame, key: String, tsUs: String,
      bucketUs: Long = 3600000000L, lookback: Int = 24,
      factor: Int = 3): DataFrame = {
    // ts − (ts mod width): pure integer bucketing (a double division could
    // truncate the wrong way at exact multiples)
    val counts = events
      .select(col(key), (col(tsUs) - pmod(col(tsUs), lit(bucketUs)))
        .as("bucket_us"))
      .groupBy(col(key), col("bucket_us")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(key)).orderBy(col("bucket_us"))
      .rowsBetween(-lookback, -1)
    counts
      .withColumn("prev_buckets", count(col("cnt")).over(w))
      .withColumn("prev_total", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("is_spike",
        col("prev_buckets") > 0 &&
          col("cnt") * col("prev_buckets") > lit(factor) * col("prev_total"))
  }
}
