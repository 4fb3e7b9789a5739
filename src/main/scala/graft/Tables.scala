package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Accessors for the driver-provided parquet fixtures (TESTDATA.md).
  *
  * One parquet file per table under the sf directory. All query
  * entry points receive the sf directory, so every table read funnels
  * through here — keeping scan options (and any future schema pinning)
  * in one place.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts has shipped in several parquet encodings across fixture
    * generations; normalize them all to a session-TZ TIMESTAMP here so
    * every downstream query (window lag, as-of joins, session windows)
    * can rely on `unix_millis(ts)` analyzing:
    *
    *  - TIMESTAMP(NANOS): Spark 4 refuses to read it as a timestamp
    *    (PARQUET_TYPE_ILLEGAL). Read as long (legacy nanosAsLong) and
    *    truncate to micros — the same floor-truncation DuckDB applies
    *    when casting its ns timestamp, so oracles agree.
    *  - TIMESTAMP_NTZ (isAdjustedToUTC=false): cast to TIMESTAMP. Exact
    *    under the pinned UTC session TZ (every entry point sets
    *    spark.sql.session.timeZone=UTC), and matches DuckDB, whose
    *    TIMESTAMP is TZ-naive.
    */
  private def eventsNormalized(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = eventsNormalized(s, d)
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
