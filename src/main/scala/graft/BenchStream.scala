package graft

import graft.streaming.StreamingAnalyzer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/**
 * Streaming throughput bench: drives [[StreamingAnalyzer.unified]] +
 * [[StreamingAnalyzer.fanOut]] (the full four-sink production topology,
 * including the stateful statistics operator) over a `MemoryStream` replay of
 * the deterministic dead-letter envelope at `SPARK_GRAFT_SF_DIR`, and reports
 * sustained records/second — the number BENCH's batch queries cannot see
 * (the reference is a streaming app; its operative metric is stream
 * throughput, not one-shot scan time).
 *
 * Knobs (env):
 *   SPARK_GRAFT_SF_DIR       source scale dir   (default /root/testdata/sf0.1)
 *   SPARK_GRAFT_CPUS         local[N]           (default all cores)
 *   SPARK_GRAFT_STREAM_MULT  replay multiplier  (default 1; 100 ≈ the 100×
 *                            stress stream — same key space, offsets shifted,
 *                            so state cardinality stays fixed while volume
 *                            scales)
 *   SPARK_GRAFT_STREAM_BATCH rows per micro-batch (default 20000)
 *   SPARK_GRAFT_STREAM_MODE  full | state | parse  (default full) — the
 *                            r8 profiling knob: `full` drives the four-sink
 *                            topology; `state` times ONLY parse→enrich→
 *                            flatMapGroupsWithState with a count sink (no
 *                            fan-out, no commit markers, no persist);
 *                            `parse` times only the stateless parse chain.
 *                            Comparing the three at a fixed batch size
 *                            splits per-record cost into parse / state /
 *                            fan-out shares; sweeping BATCH at fixed mode
 *                            splits per-batch fixed cost from per-record
 *                            marginal cost.
 *
 * Output: ONE JSON line
 *   {"metric":"stream_records_per_sec","value":...,"providers":{...},...}
 * with per-state-store-provider throughput (hdfs = Spark's heap default,
 * rocksdb = the AnalyzerMain production default).
 */
object BenchStream {

  final case class Hdr(key: String, value: Array[Byte])
  final case class Rec(topic: String, partition: Int, offset: Long,
      timestamp: java.sql.Timestamp, key: Array[Byte], value: Array[Byte],
      headers: Seq[Hdr])

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val mult = sys.env.getOrElse("SPARK_GRAFT_STREAM_MULT", "1").toInt
    val batchRows = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCH", "20000").toInt
    val mode = sys.env.getOrElse("SPARK_GRAFT_STREAM_MODE", "full")
    require(Seq("full", "state", "parse").contains(mode), s"bad mode $mode")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the deterministic envelope, collected once: MemoryStream feeds from
    // driver memory so the measured path is the TOPOLOGY, not parquet I/O.
    // ~100k rows at sf0.1 — bounded; the multiplier replays with shifted
    // offsets rather than materializing mult× rows up front.
    val base = sources.DeadLetterSource.envelope(spark, sfDir)
      .collect().map { r =>
        Rec(r.getString(0), r.getInt(1), r.getLong(2), r.getTimestamp(3),
          r.getAs[Array[Byte]](4), r.getAs[Array[Byte]](5),
          r.getSeq[org.apache.spark.sql.Row](6)
            .map(h => Hdr(h.getString(0), h.getAs[Array[Byte]](1))))
      }
    val totalRecords = base.length.toLong * mult
    println(s"[bench-stream] ${base.length} base records x $mult")

    def run(provider: String): (Double, Long) = {
      val key = "spark.sql.streaming.stateStore.providerClass"
      AnalyzerMain.stateStoreProviderClass(provider) match {
        case Some(cls) => spark.conf.set(key, cls)
        case None => spark.conf.unset(key)
      }
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val stream = MemoryStream[Rec]
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft-bench-stream-$provider").toString
      val sunk = new java.util.concurrent.atomic.AtomicLong(0L)
      import org.apache.spark.sql.functions.col
      def countSink(df: org.apache.spark.sql.DataFrame) =
        df.writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            sunk.addAndGet(b.count()); ()
          }.option("checkpointLocation", ckpt)
      val writer = mode match {
        case "full" =>
          StreamingAnalyzer.fanOut(StreamingAnalyzer.unified(stream.toDF()), ckpt) {
            (_, frame) => sunk.addAndGet(frame.count()); ()
          }
        case "state" =>
          val p = plans.Analyzer.parsed(stream.toDF())
          val good = plans.Analyzer
            .enriched(p.filter(col("parsed").getField("error").isNull))
            .filter(col("enrich_error").isNull)
          countSink(StreamingAnalyzer.statResults(good, _ => (), None))
        case "parse" =>
          countSink(plans.Analyzer.parsed(stream.toDF()))
      }
      val q = writer.queryName(s"bench_stream_$provider").start()
      try {
        // warm-up micro-batch (codegen + state store init), untimed
        stream.addData(base.take(math.min(1000, base.length)).toSeq)
        q.processAllAvailable()
        val t0 = System.nanoTime()
        var m = 0
        while (m < mult) {
          val shift = (m.toLong + 1) * 10_000_000L
          var i = 0
          while (i < base.length) {
            val chunk = base.slice(i, math.min(i + batchRows, base.length))
              .map(r => r.copy(offset = r.offset + shift))
            stream.addData(chunk.toSeq)
            q.processAllAvailable()
            i += batchRows
          }
          m += 1
        }
        val sec = (System.nanoTime() - t0) / 1e9
        (totalRecords / sec, sunk.get())
      } finally q.stop()
    }

    val providers = Seq("hdfs", "rocksdb")
    val results = providers.map { p =>
      val (rps, sunk) = run(p)
      println(f"[bench-stream] $p%-8s ${rps}%10.0f rec/s (sink rows $sunk)")
      p -> rps
    }
    val pj = results.map { case (p, v) => s"\"$p\":${v.toLong}" }
      .mkString("{", ",", "}")
    val headline = results.map(_._2).max.toLong
    println(s"""{"metric":"stream_records_per_sec","value":$headline,"unit":"rec/s","providers":$pj,"records":$totalRecords,"mult":$mult,"batch":$batchRows,"mode":"$mode","sf":"$sfDir"}""")
    spark.stop()
  }
}
