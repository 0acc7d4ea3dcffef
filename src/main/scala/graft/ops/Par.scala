package graft.ops

import org.apache.spark.sql.DataFrame

/** Partition-width guard for inputs feeding super-linear operators. */
object Par {

  /**
   * Ensure a scan fans out to the session's full parallelism before
   * super-linear work (self-joins, per-row sketching, header synthesis).
   *
   * A small parquet file (one row group under
   * `spark.sql.files.maxPartitionBytes`) arrives as a SINGLE partition, so a
   * pair-join or heavy per-row projection downstream runs on one core no
   * matter how many executors exist. At cluster scale the scan already has
   * thousands of partitions and this is a no-op — it never adds a shuffle to
   * a genuinely large input, only rescues the degenerate small-file case.
   */
  def spread(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= want) df else df.repartition(want)
  }
}
