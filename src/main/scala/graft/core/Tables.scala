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
  /** events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
    * reader refuses; read it as raw nanos and convert to a microsecond
    * timestamp in the plan (loses sub-microsecond precision only, which
    * no query semantics here depend on). The required
    * `spark.sql.legacy.parquet.nanosAsLong` conf is STATIC (plan-time):
    * it must be set at session build ([[Session.local]] does; so do the
    * Verify/Bench/test builders) — a loader mutating session conf as a
    * side effect would leak into unrelated queries, so this one doesn't,
    * and instead fails fast with a pointer when the conf is missing. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events.parquet needs spark.sql.legacy.parquet.nanosAsLong=true set at " +
        "session build (see graft.core.Session.local)")
    table(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
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
