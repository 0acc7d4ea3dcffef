package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for suites (one per suite via lazy val). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** DataFrame with the Kafka envelope schema from raw rows. */
  def envelopeDf(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      graft.model.Schemas.kafkaEnvelope)
}

/** Literal fixtures from the reference test-suite (FIXTURES.md). */
object Fixtures {
  /** reference StackTraceClassifierTest.java:36-56 */
  val StackTrace: String = "org.jdbi.v3.core.ConnectionException: java.sql" +
    ".SQLTransientConnectionException: HikariPool-1 - Connection is not available, " +
    "request timed out after 30000ms.\n\tat org.jdbi.v3.core.Jdbi.open(Jdbi.java:319)" +
    "\n\tat org.jdbi.v3.core.LazyHandleSupplier.initHandle(LazyHandleSupplier" +
    ".java:65)\n\tat org.jdbi.v3.core.LazyHandleSupplier.getHandle(LazyHandleSupplier" +
    ".java:53)\n\tat org.jdbi.v3.sqlobject.statement.internal" +
    ".CustomizingStatementHandler.invoke(CustomizingStatementHandler.java:171)\n\tat " +
    "org.jdbi.v3.sqlobject.statement.internal.SqlQueryHandler.invoke(SqlQueryHandler" +
    ".java:27)\n\tat org.jdbi.v3.sqlobject.internal.SqlObjectInitData$1" +
    ".lambda$invoke$0(SqlObjectInitData.java:132)\n\tat org.jdbi.v3.core.internal" +
    ".Invocations.invokeWith(Invocations.java:44)\n\tat org.jdbi.v3.core.internal" +
    ".Invocations.invokeWith(Invocations.java:26)\n\tat org.jdbi.v3.core" +
    ".LazyHandleSupplier.lambda$invokeInContext$1(LazyHandleSupplier.java:77)\n\tat " +
    "org.jdbi.v3.core.internal.Invocations.invokeWith(Invocations.java:44)\n\tat org" +
    ".jdbi.v3.core.internal.Invocations.invokeWith(Invocations.java:26)\n\tat org" +
    ".jdbi.v3.core.LazyHandleSupplier.invokeInContext(LazyHandleSupplier.java:76)" +
    "\n\tat org.jdbi.v3.sqlobject.internal.SqlObjectInitData$1.call(SqlObjectInitData" +
    ".java:138)\n\tat org.jdbi.v3.sqlobject.internal.SqlObjectInitData$1.invoke" +
    "(SqlObjectInitData.java:132)\n\tat org.jdbi.v3.sqlobject.SqlObjectFactory" +
    ".lambda$attach$2(SqlObjectFactory.java:110)\n\tat com.sun.proxy.$Proxy41" +
    ".findById(Unknown Source)\n\t... 40 more\n"

  /** expected classification of [[StackTrace]] (reference :72) */
  val StackTraceType = "org.jdbi.v3.core.Jdbi.open(Jdbi.java:319)"

  /** reference StackTraceClassifierTest.java:60-69 */
  val ElasticTrace: String =
    "io.confluent.connect.elasticsearch.ElasticsearchClient$ReportingException: Indexing failed: " +
      "ElasticsearchException[Elasticsearch exception [type=mapper_parsing_exception, " +
      "reason=failed to parse field [timestamp] of type [date] in document with id " +
      "'brs10610'. Preview of field's value: '20120515']]; nested: " +
      "ElasticsearchException[Elasticsearch exception [type=illegal_argument_exception, " +
      "reason=failed to parse date field [20120515] with format [yyyy]]]; nested: " +
      "ElasticsearchException[Elasticsearch exception [type=date_time_parse_exception, " +
      "reason=date_time_parse_exception: Text '20120515' could not be parsed at index " +
      "0]];\n"
  val ElasticType = "io.confluent.connect.elasticsearch.ElasticsearchClient$ReportingException"

  def utf8(s: String): Array[Byte] =
    if (s == null) null else s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Kafka header entry row. */
  def h(key: String, value: String): Row = Row(key, utf8(value))

  /** Envelope row: topic/partition/offset/timestampMs/key/value/headers. */
  def rec(topic: String, partition: Int, offset: Long, tsMillis: Long,
      key: String, value: String, headers: Seq[Row]): Row =
    Row(topic, partition, offset, new java.sql.Timestamp(tsMillis),
      utf8(key), utf8(value), headers)

  /** The canonical Avro-format dead-letter value as engine JSON interchange
    * (reference DeadLetterAnalyzerTopologyTest.java:139-149). */
  def deadLetterJson(stackTrace: String): String = {
    val st = Option(stackTrace)
      .map(s => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")
        .replace("\t", "\\t") + "\"")
      .getOrElse("null")
    s"""{"input_value":"foo","description":"description","cause":{"message":"message","stack_trace":$st},"input_timestamp":200}"""
  }
}
