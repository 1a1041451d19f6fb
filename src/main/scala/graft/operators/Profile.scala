package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the "describe my table" primitive every
  * warehouse engine ships (row/null/distinct counts, min/max per
  * column), used here as the first gate of data-quality monitoring on
  * incoming training-data drops.
  *
  * Scale design: ALL columns profile in a SINGLE aggregation over one
  * scan — partial aggregation is map-side, the shuffle carries one
  * state row per partition. Distinct counts default to
  * `approx_count_distinct` (HLL++, one pass, mergeable sketch);
  * `exact = true` switches to `count(DISTINCT …)`, which Catalyst plans
  * via Expand — the input replicates once per distinct column, so keep
  * exact mode for oracle checks and small tables, approx for the
  * 100 TB path. min/max are cast to string AFTER aggregating (typed
  * comparisons, uniform output schema).
  */
object Profile {

  /** (column_name, n_notnull, n_nulls, n_distinct, min_value, max_value)
    * — one output row per profiled column. */
  def profile(df: DataFrame, cols: Seq[String],
              exact: Boolean = false, rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__cnt"),
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c), rsd)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `${c}__cnt`, `${c}__nulls`, `${c}__nd`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_notnull, n_nulls, n_distinct, min_value, max_value)"))
  }

  /** Schema drift between two snapshots of "the same" table — the
    * monitoring twin of the reference's add-column evolution (D1):
    * one row per added / removed / retyped column, empty when the
    * schemas agree. Pure metadata (no job runs); returned as a
    * DataFrame so drift reports compose with the rest of a monitoring
    * pipeline (union over tables, sink to the catalog, alert filter). */
  def schemaDrift(before: DataFrame, after: DataFrame): DataFrame = {
    val b = before.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val a = after.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val names = (before.schema.fieldNames ++ after.schema.fieldNames).distinct
    val drift = names.flatMap { n =>
      (b.get(n), a.get(n)) match {
        case (None, Some(t))              => Some((n, "added", null: String, t))
        case (Some(t), None)              => Some((n, "removed", t, null: String))
        case (Some(x), Some(y)) if x != y => Some((n, "retyped", x, y))
        case _                            => None
      }
    }
    val spark = before.sparkSession
    import spark.implicits._
    drift.toSeq.toDF("column_name", "change", "before_type", "after_type")
  }

  /** Out-of-vocabulary profile: build the corpus vocabulary (tokens
    * appearing in ≥ `minDf` distinct documents) and report, per
    * document, total token occurrences, occurrences outside the
    * vocabulary, and the OOV rate — the standard proxy for
    * noise/garbled text and for tokenizer coverage planning.
    *
    * Scale shape: the vocabulary aggregation shuffles (token) with
    * map-side partials; the membership probe is an equi-join that AQE
    * broadcasts when the vocabulary is small (vocabularies grow
    * sub-linearly in corpus size — Heaps' law — so the broadcast only
    * gets relatively cheaper at 100 TB); the per-doc rollup shuffles
    * the doc id. The OOV rate is ONE IEEE division of two exact longs —
    * bit-reproducible across engines. */
  def oovStats(df: DataFrame, idCol: String, textCol: String,
               minDf: Int = 5): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("tok"))
    val vocab = toks.groupBy("tok")
      .agg(countDistinct(col("id")).as("df"))
      .filter(col("df") >= minDf)
      .select(col("tok"), lit(1).as("__v"))
    toks.join(vocab, Seq("tok"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("__v").isNull, 1)).as("n_oov"))
      .select(col("id").as(idCol), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .as("oov_rate"))
  }
}
