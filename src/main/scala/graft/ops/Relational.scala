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
}
