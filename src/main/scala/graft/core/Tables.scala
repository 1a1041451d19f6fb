package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loaders. One parquet file per table under a scale-factor
  * directory (see TESTDATA.md). Reading parquet directly (rather than via
  * a metastore) keeps the library self-contained; Spark's vectorized
  * parquet reader provides columnar scans, predicate pushdown and column
  * pruning for free.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** events.ts arrives in either of two encodings the fixture
    * generator has used across rounds: parquet TIMESTAMP(NANOS) — which
    * Spark's vectorized reader refuses unless
    * `spark.sql.legacy.parquet.nanosAsLong=true` turns it into raw
    * int64 nanos (STATIC plan-time conf; [[Session.local]] and the
    * Verify/Bench/test builders all set it) — or plain TIMESTAMP(MICROS),
    * which reads as a timestamp directly. Dispatch on the INFERRED
    * column type, not a fixture-version flag, so the loader keeps
    * working when the driver regenerates the data either way; both
    * paths normalize to session-tz TimestampType (UTC everywhere here)
    * so downstream query semantics are identical. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType => // nanos-as-long: convert, sub-µs precision unused
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => df
      case TimestampNTZType => // same instant under the fixed UTC session
        df.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.ts arrived as $other — expected TIMESTAMP(MICROS), " +
          "TIMESTAMP_NTZ, or int64 nanos (the latter requires " +
          "spark.sql.legacy.parquet.nanosAsLong=true at session build; " +
          "see Session.local). The fixture generator changed encoding " +
          "again: extend this dispatch deliberately, don't cast blindly.")
    }
  }
  /** Note on fixture shape: documents/embeddings are ONE parquet file
    * with ONE row group, so their scans yield a single partition and the
    * first map stage of each doc query runs on one core locally. An
    * eager `repartition(parallelism)` at load was MEASURED to make the
    * suite 40% slower (round-robin repartition local-sorts full text
    * rows per table reference — sortBeforeRepartition — and the extra
    * exchanges don't reuse), so the loaders deliberately stay plain
    * scans; production corpora arrive as many splits and parallelize
    * naturally. */
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
