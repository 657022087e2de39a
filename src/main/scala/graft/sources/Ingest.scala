package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-enforced ingest from the text-based interchange formats (CSV,
  * JSON-lines) plus ORC as a second columnar tier — the on-ramp that
  * turns raw exports into the canonical tables the rest of the library
  * consumes.
  *
  * Design rules, all of them 100 TB rules:
  *   - **Schemas are always explicit.** Inference is a second full pass
  *     over the input (and a schema lottery on dirty data) — at scale
  *     you pay the scan twice and still get `string` columns where a
  *     malformed row won the vote.
  *   - **PERMISSIVE + a corrupt-record column**, never FAILFAST on bulk
  *     ingest: one bad row out of 10^11 should quarantine, not kill the
  *     job. [[badRecords]] filters the quarantine line for audit.
  *   - **Canonicalize immediately** ([[canonicalEvents]]): event time
  *     to µs-since-epoch BIGINT (`ts_us`, the library-wide convention —
  *     see [[Tables.events]]), so downstream plans never re-parse
  *     strings.
  *
  * CSV/JSONL scans split by line and parallelize like any file source;
  * they lose parquet/ORC's column pruning and min-max skipping, which
  * is why ingest lands in a columnar format and analytics never read
  * the text tier twice.
  */
object Ingest {

  /** Raw-events interchange schema (string event time as exported by
    * typical log shippers; parsed to µs in [[canonicalEvents]]). */
  val rawEventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", StringType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
    StructField("_corrupt", StringType)))

  /** Custom schemas MUST include a `_corrupt` StringType field — Spark
    * silently ignores columnNameOfCorruptRecord when the column is
    * absent, turning malformed rows into unquarantined all-null rows. */
  private def requireQuarantine(schema: StructType): Unit =
    require(
      schema.fieldNames.contains("_corrupt") &&
        schema("_corrupt").dataType == StringType,
      "ingest schema must include a `_corrupt` string column (the " +
        "PERMISSIVE quarantine contract is silently disabled without it)")

  def readCsv(s: SparkSession, path: String, schema: StructType = rawEventSchema): DataFrame = {
    requireQuarantine(schema)
    s.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("header", "true")
      .csv(path)
  }

  def readJsonl(s: SparkSession, path: String, schema: StructType = rawEventSchema): DataFrame = {
    requireQuarantine(schema)
    s.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
  }

  /** Rows the permissive parser quarantined: the full row, with the raw
    * line in `_corrupt` and whatever fields DID parse alongside (useful
    * for triage). Returned unprojected on purpose — Spark refuses a
    * text-source query whose referenced columns are ONLY the corrupt
    * column (the parser never ran for the others), so a bare
    * `select(_corrupt)` off the raw scan is an analysis error; keeping
    * the full row keeps the scan legal. For bulk audits, land the raw
    * frame in columnar first and filter there. */
  def badRecords(raw: DataFrame): DataFrame =
    raw.filter(col("_corrupt").isNotNull)

  /** Clean rows canonicalized to the events convention: `ts_us`
    * µs-since-epoch BIGINT, corrupt column dropped. Rows whose
    * timestamp fails to parse are NOT silently nulled — they land in
    * the returned frame with `ts_us` null so the caller can route them
    * to the same quarantine as [[badRecords]].
    *
    * Zone-less timestamps are interpreted as UTC — pinned explicitly,
    * not left to `spark.sql.session.timeZone`: the cast parses the
    * wall-clock in the session zone (instant = wallclock − offset), and
    * `from_utc_timestamp(·, session zone)` adds that offset back, so
    * the composition yields wallclock-as-UTC on EVERY deployment. (A
    * zoned input like `...Z`/`+02:00` needs a UTC session zone to land
    * exactly — same requirement as before — and offsets are evaluated
    * per-timestamp, so inputs inside a DST transition window of an
    * exotic session zone can land ±1h; pin the session zone to UTC to
    * eliminate both caveats.) */
  def canonicalEvents(raw: DataFrame): DataFrame = {
    val sessionZone = raw.sparkSession.sessionState.conf.sessionLocalTimeZone
    raw
      .filter(col("_corrupt").isNull)
      .select(
        col("event_id"),
        unix_micros(from_utc_timestamp(col("ts").cast("timestamp"), sessionZone))
          .as("ts_us"),
        col("user_id"),
        col("event_type"),
        col("value"),
        col("props"))
  }

  /** Land a canonical table in ORC (the second columnar tier — same
    * pushdown/pruning class as parquet; useful when the downstream
    * stack is ORC-native). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(s: SparkSession, path: String): DataFrame = s.read.orc(path)
}
