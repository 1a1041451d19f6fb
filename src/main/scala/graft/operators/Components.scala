package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Subst

/** The reference's "Compress" layer re-expressed Spark-first (reference:
  * `CompressComponents`, `bin/fetcher.bash:139-162`): vertical
  * partitioning of wide source tables into deduplicated, conformed
  * component tables.
  *
  * The reference emits, per (component, source):
  * `CREATE TABLE … AS SELECT … LIMIT 0` (schema derive),
  * `CREATE UNIQUE INDEX` (full-row uniqueness) and
  * `INSERT OR IGNORE … SELECT DISTINCT <subst exprs>` (conflict-ignoring
  * merge). Because the unique key is the *entire* component row, the
  * arrival-order-dependent INSERT OR IGNORE collapses to an
  * order-insensitive `union.distinct()` — Catalyst plans it as a
  * partial (map-side) + final hash aggregate, so at 100 TB each source
  * pre-reduces locally before the single shuffle on the full-row key.
  *
  * For the general subset-key case (which the shipped reference config
  * never uses) SQLite semantics are first-writer-wins in source order;
  * [[mergeFirstWriterWins]] reproduces that deterministically with a
  * priority column + one shuffle (window row_number), instead of the
  * sequential per-source anti-join loop a literal port would do.
  */
object Components {

  /** Conform one source onto a component schema via subst expressions. */
  def conform(source: DataFrame, columns: Seq[String],
              subst: Map[String, String] = Map.empty): DataFrame =
    source.select(Subst.compile(columns, subst): _*)

  /** Schema-only derivation (`CREATE TABLE … LIMIT 0`): Catalyst folds
    * limit(0) via PropagateEmptyRelation — no scan happens. */
  def emptyLike(source: DataFrame, columns: Seq[String],
                subst: Map[String, String] = Map.empty): DataFrame =
    conform(source, columns, subst).limit(0)

  /** Full-row-key merge: union all conformed sources, dedup on the whole
    * row. Exactly equivalent to the reference's unique-index +
    * INSERT OR IGNORE loop when the key is all columns. */
  def merge(conformed: Seq[DataFrame]): DataFrame =
    conformed.reduce(_ unionByName _).distinct()

  /** Subset-key merge with SQLite's first-writer-wins semantics made
    * explicit: earlier sources win, and within a source ties are broken
    * by the given ordering (or arbitrarily-but-deterministically by the
    * remaining columns if none given). One shuffle on the key. */
  def mergeFirstWriterWins(conformed: Seq[DataFrame], keys: Seq[String],
                           tieBreak: Seq[Column] = Nil): DataFrame = {
    val prioritized = conformed.zipWithIndex.map { case (df, i) =>
      df.withColumn("__graft_pri", lit(i))
    }.reduce(_ unionByName _)
    val ordering =
      if (tieBreak.nonEmpty) col("__graft_pri") +: tieBreak
      else col("__graft_pri") +: prioritized.columns
        .filterNot(c => keys.contains(c) || c == "__graft_pri").map(col).toSeq
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    prioritized
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_pri", "__graft_rn")
  }

  /** Load-time schema evolution (reference D1: `ALTER TABLE … ADD COLUMN
    * "email" TEXT`): emit the extra nullable column in the load
    * projection — parquet tables need no post-hoc ALTER. */
  def withNullColumn(df: DataFrame, name: String): DataFrame =
    df.withColumn(name, lit(null).cast("string"))

  /** Slowly-changing-dimension Type 2 merge: apply a full key snapshot
    * to a versioned dimension (the warehouse-side sibling of the
    * reference's drop-and-recreate cycle — history kept instead of
    * overwritten). `current` carries `keys ++ attrs ++ (valid_from,
    * valid_to)` with `valid_to IS NULL` marking open rows; `snapshot`
    * carries `keys ++ attrs` as of `asOf`. Per key:
    *  - open row, attrs unchanged in snapshot → stays open;
    *  - open row, attrs changed → closed at `asOf` + new open row;
    *  - open row, key gone from snapshot → closed at `asOf` (delete);
    *  - key new to the dimension → new open row from `asOf`;
    *  - already-closed rows pass through untouched.
    *
    * Scale shape: ONE full-outer equi-join of the open slice against
    * the snapshot on the key; the changed-key double row comes from
    * exploding a filtered two-struct array in the same pass, not a
    * second join branch. Attr comparison is null-safe (`<=>`). */
  def scd2Merge(current: DataFrame, snapshot: DataFrame, keys: Seq[String],
                attrs: Seq[String], asOf: Column,
                validFrom: String = "valid_from",
                validTo: String = "valid_to"): DataFrame = {
    val outCols = keys ++ attrs ++ Seq(validFrom, validTo)
    val closed = current.filter(col(validTo).isNotNull)
      .select(outCols.map(col): _*)
    val vtType = current.schema(validTo).dataType
    val open = current.filter(col(validTo).isNull)
      .select(keys.map(col) ++ attrs.map(c => col(c).as(s"__o_$c")) :+
        col(validFrom).as("__o_vf"): _*)
      .withColumn("__o", lit(true))
    val snap = snapshot
      .select(keys.map(col) ++ attrs.map(c => col(c).as(s"__s_$c")): _*)
      .withColumn("__s", lit(true))
    val j = open.join(snap, keys, "full_outer")
      .withColumn("__o", coalesce(col("__o"), lit(false)))
      .withColumn("__s", coalesce(col("__s"), lit(false)))
    val same = attrs.map(c => col(s"__o_$c") <=> col(s"__s_$c")).reduce(_ && _)
    def row(attr: String => Column, vf: Column, vt: Column, keep: Column) =
      struct(attrs.map(c => attr(c).as(c)) :+ vf.as(validFrom) :+
        vt.as(validTo) :+ keep.as("__keep"): _*)
    val oldRow = row(c => col(s"__o_$c"), col("__o_vf"),
      when(col("__s") && same, lit(null).cast(vtType)).otherwise(asOf),
      col("__o"))
    val newRow = row(c => col(s"__s_$c"), asOf, lit(null).cast(vtType),
      col("__s") && !(col("__o") && same))
    j.select(keys.map(col) :+
        explode(filter(array(oldRow, newRow),
          x => x.getField("__keep"))).as("__r"): _*)
      .select(keys.map(col) ++
        (attrs ++ Seq(validFrom, validTo)).map(c => col(s"__r.$c").as(c)): _*)
      .unionByName(closed)
  }
}
