package graft

import graft.sources.DeadLetterSource
import graft.streaming.StreamingAnalyzer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/**
 * Production entry point: regex-pattern Kafka source → streaming analyzer →
 * the four Kafka sinks from ONE query and ONE checkpoint (reference
 * `DeadLetterAnalyzerApplication.java:43-71`, CLI surface `README.md:33-41`).
 *
 * CLI mirrors the reference:
 *   --brokers host:port            Kafka bootstrap servers        (required)
 *   --input-pattern regex          topic subscription pattern     (required)
 *   --output-topic name            "all" sink topic               (required)
 *   --error-topic name             engine-failure dead letters    (required)
 *   --extra-output-topics stats=name,examples=name  labeled sinks
 *                                  (default: <output-topic>-stats/-examples,
 *                                  mirroring the reference's topic labels)
 *   --checkpoint-dir path          checkpoint location of the unified query
 *
 * Pointing --error-topic at a topic matching --input-pattern closes the
 * reference's feedback loop: the engine re-analyzes its own failures (the
 * cycle passes through Kafka; the Spark plan stays acyclic, SURVEY §2.1 S5).
 *
 * The whole topology is ONE streaming query: the statistics state exists
 * once, recovery replays one checkpoint, and each micro-batch fans out to
 * the four topics via batch Kafka writes
 * ([[StreamingAnalyzer.unified]]/[[StreamingAnalyzer.fanOut]]) — the
 * compute-once-and-branch shape of the reference
 * (DeadLetterAnalyzerTopology.java:139-158). Honest caveat: the unified plan
 * forks the parsed source into a stateless branch and a stateful branch, and
 * Spark cannot persist upstream of a stateful streaming operator, so each
 * micro-batch's offset range is scanned/decoded twice within the one query —
 * versus 4 source reads and 3 duplicate state stores in the pre-unified
 * layout, and versus once in Kafka Streams' record-at-a-time fork.
 */
object AnalyzerMain {

  final case class Config(
      brokers: String, inputPattern: String, outputTopic: String,
      errorTopic: String, statsTopic: String, examplesTopic: String,
      checkpointDir: String, avroSchemaFiles: Map[Int, String] = Map.empty,
      schemaRegistryUrl: Option[String] = None,
      timestampZone: Option[String] = None,
      stateStore: String = "rocksdb") {
    /** Decode configuration: schema files read AND parse-validated once at
      * startup (fail fast on malformed schema JSON instead of at first
      * decode on an executor), wrapped in the static [[graft.functions
      * .SchemaProvider]]. With `--schema-registry-url` the live
      * [[graft.functions.HttpRegistrySchemas]] client resolves ids
      * registry-first (the reference's chain,
      * DeadLetterAnalyzerTopology.java:102-105), falling back to the static
      * files for ids the registry doesn't know. */
    def decodeConfig: graft.functions.DecodeConfig = {
      val static = graft.functions.StaticSchemas(
        avroSchemaFiles.map { case (id, path) =>
          val json = new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8)
          try new org.apache.avro.Schema.Parser().parse(json)
          catch { case e: Exception => throw new IllegalArgumentException(
            s"--avro-schema-files $id=$path: not a valid Avro schema: ${e.getMessage}") }
          id -> json
        })
      val provider = schemaRegistryUrl
        .map(u => graft.functions.HttpRegistrySchemas(u, fallback = static))
        .getOrElse[graft.functions.SchemaProvider](static)
      graft.functions.DecodeConfig(provider, timestampZone = timestampZone)
    }
  }

  private val Usage =
    "usage: AnalyzerMain --brokers B --input-pattern P --output-topic T " +
      "--error-topic E [--extra-output-topics stats=S,examples=X] " +
      "[--checkpoint-dir DIR] [--avro-schema-files id=path,...] " +
      "[--schema-registry-url URL] [--timestamp-zone host|ZONE_ID] " +
      "[--state-store rocksdb|hdfs]"

  def parseArgs(args: Array[String]): Config = {
    // strict pairwise parse: every token must be a --flag followed by its
    // value — a lone or mispositioned flag fails loudly with usage instead
    // of silently shifting the pairing
    val kv = scala.collection.mutable.Map[String, String]()
    var i = 0
    while (i < args.length) {
      val k = args(i)
      if (!k.startsWith("--") || i + 1 >= args.length)
        throw new IllegalArgumentException(s"unexpected argument '$k'\n$Usage")
      kv(k.drop(2)) = args(i + 1)
      i += 2
    }
    def req(k: String): String =
      kv.getOrElse(k, throw new IllegalArgumentException(s"missing --$k\n$Usage"))
    val out = req("output-topic")
    val extra = kv.get("extra-output-topics")
      .map(_.split(",").map { e =>
        e.split("=", 2) match {
          case Array(label, topic) => label -> topic
          case _ => throw new IllegalArgumentException(
            s"malformed --extra-output-topics entry '$e' (want label=topic)\n$Usage")
        }
      }.toMap)
      .getOrElse(Map.empty)
    val schemaFiles = kv.get("avro-schema-files")
      .map(_.split(",").map { e =>
        e.split("=", 2) match {
          case Array(id, path) if id.forall(_.isDigit) => id.toInt -> path
          case _ => throw new IllegalArgumentException(
            s"malformed --avro-schema-files entry '$e' (want numericId=path)\n$Usage")
        }
      }.toMap)
      .getOrElse(Map.empty[Int, String])
    // reference parity: it renders sink timestamps in the HOST zone
    // (Formatter.java:60-62); "host" resolves the submitting JVM's zone.
    // Default (absent) keeps the engine's deterministic session-UTC rendering.
    val tsZone = kv.get("timestamp-zone").map {
      case "host" => java.time.ZoneId.systemDefault().getId
      case z => java.time.ZoneId.of(z).getId // validates, fails fast
    }
    // state-store backend: RocksDB by default — the statistics state is keyed
    // by (topic, type) but at 100 TB-scale topic cardinality (plus the
    // streaming-dedup stores keyed by digest) the default HDFS-backed
    // provider holds every key on the executor HEAP; RocksDB (in Spark core
    // since 3.2, no extra dependency) spills to local disk and bounds memory.
    // "hdfs" restores the heap provider for tiny-state deployments.
    val stateStore = kv.getOrElse("state-store", "rocksdb")
    if (!Set("rocksdb", "hdfs").contains(stateStore))
      throw new IllegalArgumentException(
        s"unknown --state-store '$stateStore' (want rocksdb|hdfs)\n$Usage")
    Config(
      brokers = req("brokers"),
      inputPattern = req("input-pattern"),
      outputTopic = out,
      errorTopic = req("error-topic"),
      statsTopic = extra.getOrElse("stats", s"$out-stats"),
      examplesTopic = extra.getOrElse("examples", s"$out-examples"),
      checkpointDir = kv.getOrElse("checkpoint-dir", {
        // a node-local default silently restarts exactly-once state from
        // scratch when the driver lands on a different node — acceptable
        // only for local smoke runs, so make the choice loud
        System.err.println(
          "[graft] WARNING: no --checkpoint-dir given; defaulting to " +
            "/tmp/graft-analyzer-checkpoints (NODE-LOCAL). A restart on " +
            "another node starts offsets and statistics state from scratch " +
            "— pass a durable shared path (HDFS/S3) for any real deployment.")
        "/tmp/graft-analyzer-checkpoints"
      }),
      avroSchemaFiles = schemaFiles,
      schemaRegistryUrl = kv.get("schema-registry-url"),
      timestampZone = tsZone,
      stateStore = stateStore)
  }

  /** The provider class behind a `--state-store` choice. */
  def stateStoreProviderClass(stateStore: String): Option[String] =
    stateStore match {
      case "rocksdb" => Some(
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      case _ => None // "hdfs": Spark's default heap-backed provider
    }

  /** Build the full production topology as ONE streaming query: a single
    * Kafka source read, a single statistics state, one checkpoint; each
    * micro-batch fans the tagged unified frame out to the four topics via
    * batch Kafka writes. Construction validates the plan (source + transforms
    * analyzed by Catalyst); nothing starts until `.start()`. */
  def topology(spark: SparkSession, cfg: Config): DataStreamWriter[Row] = {
    implicit val dc: graft.functions.DecodeConfig = cfg.decodeConfig
    val input = DeadLetterSource.kafka(spark, cfg.brokers, cfg.inputPattern)
    val topicOf = Map(
      "all" -> cfg.outputTopic, "stats" -> cfg.statsTopic,
      "examples" -> cfg.examplesTopic, "errors" -> cfg.errorTopic)
    StreamingAnalyzer.fanOut(
      StreamingAnalyzer.unified(input), cfg.checkpointDir) { (name, frame) =>
      frame
        .select(col("key").cast("binary").as("key"), col("value"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", cfg.brokers)
        .option("topic", topicOf(name))
        .save()
    }
  }

  /** Refuse to silently discard pre-unified state. The four-query layout
    * checkpointed each sink under `$dir/<sink>`; the unified query
    * checkpoints at `$dir` itself. An in-place upgrade restarted on the old
    * root would come up as a brand-new query — Kafka offsets reset and the
    * statistics state (counts, first-example-ever flags) silently dropped.
    * Detecting legacy sink checkpoints with no unified state fails fast and
    * tells the operator to decide. */
  def assertCheckpointLayout(spark: SparkSession, dir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val legacy = Seq("all", "stats", "examples", "errors")
      .filter(s => fs.exists(new org.apache.hadoop.fs.Path(root, s"$s/offsets")))
    val unifiedStarted = fs.exists(new org.apache.hadoop.fs.Path(root, "offsets"))
    if (legacy.nonEmpty && !unifiedStarted)
      throw new IllegalStateException(
        s"checkpoint dir $dir holds per-sink checkpoints of the pre-unified " +
          s"topology (${legacy.mkString(", ")}) but no unified-query state; " +
          "starting here would reset Kafka offsets and discard the " +
          "statistics state. Move the legacy checkpoints aside to start " +
          "fresh, or point --checkpoint-dir at a new location.")
  }

  def main(args: Array[String]): Unit = {
    val cfg = parseArgs(args)
    val builder = SparkSession.builder()
      .appName(s"dead-letter-analyzer-${cfg.outputTopic}")
      .config("spark.sql.session.timeZone", "UTC")
    val spark = stateStoreProviderClass(cfg.stateStore)
      .map(builder.config("spark.sql.streaming.stateStore.providerClass", _))
      .getOrElse(builder)
      .getOrCreate()
    assertCheckpointLayout(spark, cfg.checkpointDir)
    topology(spark, cfg).queryName("dead-letter-analyzer").start()
    spark.streams.awaitAnyTermination()
  }
}
