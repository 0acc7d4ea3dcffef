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
 *   SPARK_GRAFT_STREAM_SOURCE memory | rate (default memory) — what FEEDS
 *                            the topology. `memory` replays through
 *                            `MemoryStream`: the driver materializes every
 *                            chunk and `processAllAvailable()` round-trips
 *                            per chunk — the shape the r8 batch control
 *                            (`DevBatchParseR8`, 330k rec/s for the same
 *                            parse chain) showed dominates the measured
 *                            number. `rate` feeds from Spark's
 *                            `rate-micro-batch` source instead: executors
 *                            render the deterministic envelope from the
 *                            source's `value` id against a BROADCAST base
 *                            table (offset-shifted per replay epoch, same
 *                            key space — state cardinality fixed), so no
 *                            record bytes ever cross the driver and the
 *                            query triggers continuously. This is the
 *                            closest offline stand-in for a partitioned
 *                            Kafka source; per-batch timings come from the
 *                            query progress stream (first two batches
 *                            dropped as codegen/state warm-up) rather than
 *                            a driver stopwatch around a feeding loop.
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
    val source = sys.env.getOrElse("SPARK_GRAFT_STREAM_SOURCE", "memory")
    require(Seq("memory", "rate").contains(source), s"bad source $source")
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

    def setProvider(provider: String): Unit = {
      val key = "spark.sql.streaming.stateStore.providerClass"
      AnalyzerMain.stateStoreProviderClass(provider) match {
        case Some(cls) => spark.conf.set(key, cls)
        case None => spark.conf.unset(key)
      }
    }

    /** The mode's topology over an arbitrary Kafka-shaped streaming frame —
      * shared by both sources so the rate path measures the IDENTICAL plan. */
    def makeWriter(input: org.apache.spark.sql.DataFrame, ckpt: String,
        sunk: java.util.concurrent.atomic.AtomicLong)
        : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
      import org.apache.spark.sql.functions.col
      def countSink(df: org.apache.spark.sql.DataFrame) =
        df.writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
          .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            sunk.addAndGet(b.count()); ()
          }.option("checkpointLocation", ckpt)
      mode match {
        case "full" =>
          StreamingAnalyzer.fanOut(StreamingAnalyzer.unified(input), ckpt) {
            (_, frame) => sunk.addAndGet(frame.count()); ()
          }
        case "state" =>
          val p = plans.Analyzer.parsed(input)
          val good = plans.Analyzer
            .enriched(p.filter(col("parsed").getField("error").isNull))
            .filter(col("enrich_error").isNull)
          countSink(StreamingAnalyzer.statResults(good, _ => (), None))
        case "parse" =>
          countSink(plans.Analyzer.parsed(input))
      }
    }

    def run(provider: String): (Double, Long) = {
      setProvider(provider)
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val stream = MemoryStream[Rec]
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft-bench-stream-$provider").toString
      val sunk = new java.util.concurrent.atomic.AtomicLong(0L)
      val writer = makeWriter(stream.toDF(), ckpt, sunk)
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

    /** Rate-micro-batch drive: executors render the envelope from the
      * source's monotone `value` against the broadcast base table — no
      * record bytes cross the driver, no per-chunk `processAllAvailable`
      * barrier. Throughput is computed from the query-progress stream
      * (per-batch `triggerExecution` over input rows, first two non-empty
      * batches dropped as warm-up) — the measurement a Kafka-fed deployment
      * would take from its own progress metrics. */
    def runRate(provider: String): (Double, Long) = {
      import org.apache.spark.sql.functions.col
      setProvider(provider)
      val baseB = spark.sparkContext.broadcast(base)
      val nBase = base.length
      val src = spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", batchRows.toLong)
        .option("numPartitions", cpus.toInt)
        .load()
      val recs = src.select(col("value")).as[Long].mapPartitions { it =>
        val b = baseB.value
        it.map { v =>
          val r = b((v % b.length).toInt)
          // same per-epoch offset shift as the memory replay: dedup_id
          // stays unique across epochs, the key space (state cardinality)
          // stays fixed
          r.copy(offset = r.offset + (v / b.length + 1L) * 10_000_000L)
        }
      }
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft-bench-rate-$provider").toString
      val sunk = new java.util.concurrent.atomic.AtomicLong(0L)
      val qname = s"bench_stream_rate_$provider"
      // warm-up = first 2 non-empty batches (codegen + state-store init)
      val warmBatches = 2
      // records per batch is the GENERATED count (rate-micro-batch emits
      // exactly rowsPerBatch per trigger) — NOT progress.numInputRows,
      // which counts source SCANS and doubles under the topology's
      // multi-branch source reuse (observed: 40k reported for a 20k batch
      // in `full` mode)
      val needBatches = warmBatches +
        math.max(1, ((totalRecords + batchRows - 1) / batchRows).toInt)
      val batches = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      val done = new java.util.concurrent.CountDownLatch(1)
      import org.apache.spark.sql.streaming.StreamingQueryListener
      val listener = new StreamingQueryListener {
        override def onQueryStarted(
            e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(
            e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(
            e: StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          if (sys.env.contains("SPARK_GRAFT_STREAM_DEBUG"))
            println(s"[bench-stream] progress name=${p.name} " +
              s"rows=${p.numInputRows} durs=${p.durationMs}")
          if (p.name == qname && p.numInputRows > 0) {
            // a progress event without a positive triggerExecution would
            // contribute rows at zero cost and inflate rec/s (advisor r8) —
            // skip it; the drive loop just waits for one more real batch
            val trig = p.durationMs.getOrDefault("triggerExecution", 0L)
            if (trig > 0L) {
              val sec = trig / 1e3
              val n = batches.synchronized {
                batches += ((batchRows.toLong, sec)); batches.size
              }
              if (n >= needBatches) done.countDown()
            }
          }
        }
      }
      spark.streams.addListener(listener)
      try {
        val q = makeWriter(recs.toDF(), ckpt, sunk).queryName(qname).start()
        try {
          if (!done.await(30, java.util.concurrent.TimeUnit.MINUTES))
            sys.error("rate drive timed out at " +
              s"${batches.synchronized(batches.size)} batches")
        } finally q.stop()
      } finally spark.streams.removeListener(listener)
      val timed = batches.synchronized(batches.toVector).drop(warmBatches)
      val rows = timed.map(_._1).sum
      val secs = timed.map(_._2).sum
      (rows / secs, sunk.get())
    }

    val providers = Seq("hdfs", "rocksdb")
    val results = providers.map { p =>
      val (rps, sunk) = if (source == "rate") runRate(p) else run(p)
      println(f"[bench-stream] $p%-8s ${rps}%10.0f rec/s (sink rows $sunk)")
      p -> rps
    }
    val pj = results.map { case (p, v) => s"\"$p\":${v.toLong}" }
      .mkString("{", ",", "}")
    val headline = results.map(_._2).max.toLong
    println(s"""{"metric":"stream_records_per_sec","value":$headline,"unit":"rec/s","providers":$pj,"records":$totalRecords,"mult":$mult,"batch":$batchRows,"mode":"$mode","source":"$source","sf":"$sfDir"}""")
    spark.stop()
  }
}
