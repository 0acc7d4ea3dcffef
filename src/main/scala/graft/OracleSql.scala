package graft

/**
 * DuckDB oracle SQL for the dead-letter pipeline queries: independent
 * closed-form recomputation of every pipeline output straight from the `events`
 * table, mirroring the scenario matrix of
 * [[graft.sources.DeadLetterSource]] (see its doc for the mode table).
 *
 * The SQL deliberately avoids re-using the engine's own mechanisms (no regex
 * classification, no header parsing): expected values are CASE closed forms,
 * so a Spark-side bug cannot cancel out against the oracle.
 */
object OracleSql {

  /** Shared CTE prelude: scenario fields, the per-branch parsed relation, and
    * the happy-path subset. Timestamps are handled at microsecond precision
    * (`epoch_us`) because Spark reads the nanos parquet as longs and truncates
    * to micros. */
  val prelude: String = """WITH base AS (
  SELECT event_id, user_id, event_type, props,
         epoch_us(ts) AS ts_us,
         event_id % 20 AS mode,
         (event_id % 20) % 4 AS fmt,
         event_id % 3 AS st_kind,
         event_type || '-dead-letters' AS topic,
         CAST(user_id % 8 AS INT) AS part,
         event_id AS off,
         'key-' || user_id AS key_string,
         'error for event ' || event_id AS msg,
         'orig-' || event_type AS orig_topic,
         CAST(user_id % 4 AS INT) AS orig_partition,
         event_id * 10 AS orig_offset,
         'failure in ' || event_type AS descr
  FROM events
), shaped AS (
  SELECT *,
    CASE st_kind
      WHEN 0 THEN 'org.example.FailureException: handling event ' || event_id || chr(10) || chr(9) || 'at com.example.app.Handler.handle(Handler.java:' || (event_id % 500 + 1) || ')' || chr(10) || chr(9) || 'at org.example.Runner.run(Runner.java:42)'
      WHEN 1 THEN 'java.lang.IllegalStateException: bad state ' || (event_id % 7)
      ELSE '!! corrupted frame ' || (event_id % 5) END AS stack_trace,
    CASE st_kind WHEN 0 THEN 'org.example.FailureException' WHEN 1 THEN 'java.lang.IllegalStateException' ELSE 'java.lang.RuntimeException' END AS error_class,
    CASE st_kind
      WHEN 0 THEN 'com.example.app.Handler.handle(Handler.java:' || (event_id % 500 + 1) || ')'
      WHEN 1 THEN 'java.lang.IllegalStateException'
      ELSE '!! corrupted frame ' || (event_id % 5) END AS etype
  FROM base
), parsed AS (
  SELECT *, 'avro_value' AS branch,
    CAST(NULL AS VARCHAR) AS parse_error,
    props AS dl_input_value,
    orig_partition AS dl_partition,
    orig_topic AS dl_topic,
    orig_offset AS dl_offset,
    descr AS dl_description,
    CASE WHEN st_kind = 2 THEN NULL ELSE error_class END AS dl_error_class,
    msg AS dl_message,
    CASE WHEN mode = 0 THEN NULL ELSE stack_trace END AS dl_stack_trace,
    ts_us // 1000 * 1000 AS dl_input_ts_us
  FROM shaped WHERE fmt = 0
  UNION ALL
  SELECT *, 'streams_headers',
    CASE WHEN mode = 1 THEN 'Missing required header __streams.errors.topic' END,
    props,
    orig_partition,
    CASE WHEN mode = 1 THEN NULL ELSE orig_topic END,
    orig_offset,
    descr,
    error_class,
    CASE WHEN mode = 17 THEN NULL ELSE msg END,
    stack_trace,
    ts_us
  FROM shaped WHERE fmt = 1
  UNION ALL
  SELECT *, 'native_headers',
    CASE WHEN mode = 2 THEN 'Cannot parse int from null' END,
    props,
    orig_partition,
    CASE WHEN mode = 6 THEN NULL ELSE orig_topic END,
    orig_offset,
    'Error in processor node ' || (CASE WHEN mode = 10 THEN '[unknown]' ELSE 'proc-' || (user_id % 3) END) || ' in task ' || (CASE WHEN mode = 10 THEN '[unknown]' ELSE 'task-' || (user_id % 5) END),
    error_class,
    msg,
    stack_trace,
    ts_us
  FROM shaped WHERE fmt = 2
  UNION ALL
  SELECT *, 'connect_headers',
    CASE WHEN mode = 3 THEN 'For input string: "NaN"' END,
    props,
    CASE WHEN mode = 7 THEN NULL ELSE orig_partition END,
    CASE WHEN mode = 7 THEN NULL ELSE orig_topic END,
    CASE WHEN mode = 7 THEN NULL ELSE orig_offset END,
    'Error in stage ' || (CASE WHEN event_id % 2 = 0 THEN 'VALUE_CONVERTER' ELSE 'KEY_CONVERTER' END) || ' (org.apache.kafka.connect.json.JsonConverter) in conn-' || event_type || '[' || (user_id % 10) || ']',
    CASE WHEN mode = 7 OR st_kind = 2 THEN NULL ELSE error_class END,
    CASE WHEN mode = 7 THEN NULL ELSE msg END,
    CASE WHEN mode = 7 THEN NULL ELSE stack_trace END,
    ts_us
  FROM shaped WHERE fmt = 3
  UNION ALL
  SELECT *, 'connect_headers',
    CAST(NULL AS VARCHAR),
    props,
    orig_partition,
    orig_topic,
    orig_offset,
    'Error in stage ' || (CASE WHEN event_id % 2 = 0 THEN 'VALUE_CONVERTER' ELSE 'KEY_CONVERTER' END) || ' (org.apache.kafka.connect.json.JsonConverter) in conn-' || event_type || '[' || (user_id % 10) || ']',
    CASE WHEN st_kind = 2 THEN NULL ELSE error_class END,
    msg,
    stack_trace,
    ts_us
  FROM shaped WHERE mode = 5
), good AS (
  SELECT * FROM parsed WHERE parse_error IS NULL AND dl_stack_trace IS NOT NULL
)
"""

  private val tsFmt = "'%Y-%m-%dT%H:%M:%S.%g'"

  val classify: String = prelude +
    "SELECT event_id, etype AS error_type FROM shaped"

  val parsedAll: String = prelude + """SELECT off AS offset, branch, parse_error,
  CASE WHEN parse_error IS NULL THEN dl_input_value END AS input_value,
  CASE WHEN parse_error IS NULL THEN dl_partition END AS dl_partition,
  CASE WHEN parse_error IS NULL THEN dl_topic END AS dl_topic,
  CASE WHEN parse_error IS NULL THEN dl_offset END AS dl_offset,
  CASE WHEN parse_error IS NULL THEN dl_description END AS description,
  CASE WHEN parse_error IS NULL THEN dl_error_class END AS error_class,
  CASE WHEN parse_error IS NULL THEN dl_message END AS message,
  CASE WHEN parse_error IS NULL THEN dl_stack_trace END AS stack_trace,
  CASE WHEN parse_error IS NULL THEN dl_input_ts_us END AS input_ts_us
FROM parsed"""

  val all: String = prelude + s"""SELECT
  topic || '+' || part || '+' || off AS key,
  key_string AS context_key,
  off AS offset,
  part AS partition,
  strftime(make_timestamp(ts_us), $tsFmt) AS timestamp,
  topic,
  etype AS type,
  dl_description AS description,
  dl_offset,
  dl_topic,
  dl_input_ts_us AS input_ts_us
FROM good"""

  val stats: String = prelude + s"""SELECT
  topic || ':' || etype AS key,
  CAST(count(*) AS INT) AS count,
  strftime(make_timestamp(min(ts_us)), $tsFmt) AS created,
  strftime(make_timestamp(max(ts_us)), $tsFmt) AS updated,
  topic,
  etype AS type
FROM good GROUP BY topic, etype"""

  val examples: String = prelude + s"""SELECT
  topic || ':' || etype AS key,
  topic,
  etype AS type,
  arg_min(key_string, arrival) AS example_key,
  arg_min(off, arrival) AS example_offset,
  arg_min(part, arrival) AS example_partition,
  arg_min(strftime(make_timestamp(ts_us), $tsFmt), arrival) AS example_timestamp,
  arg_min(dl_description, arrival) AS example_description
FROM (SELECT *, printf('%020d:%s', off, branch) AS arrival FROM good)
GROUP BY topic, etype"""

  val errors: String = prelude + """SELECT key_string AS key,
  'Error converting errors to dead letters' AS description,
  CASE WHEN starts_with(parse_error, 'For input string') THEN 'java.lang.NumberFormatException'
       ELSE 'java.lang.IllegalArgumentException' END AS error_class,
  parse_error AS message,
  ts_us
FROM parsed WHERE parse_error IS NOT NULL
UNION ALL
SELECT key_string,
  'Error analyzing dead letter',
  'java.util.NoSuchElementException',
  'No value present',
  ts_us
FROM parsed WHERE parse_error IS NULL AND dl_stack_trace IS NULL"""
}
