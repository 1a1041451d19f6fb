package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter pre-filtering for cross-corpus membership probes
  * (benchmark decontamination, blocklist lookups).
  *
  * The scale problem: an exact n-gram join from a 100 TB training
  * corpus against a tiny benchmark set still EXPLODES the corpus to
  * (doc, gram) rows before the broadcast probe — a ~100× row inflation
  * on the big side just to discover that ~all docs hit nothing. A Bloom
  * filter over the benchmark's distinct grams (MBs, no false negatives)
  * lets the scan-side row test happen BEFORE any explode or join: one
  * codegen'd per-row pass over the doc's shingle array. Only the
  * surviving sliver (true hits + fpp of the rest) pays the exact join,
  * which also removes the false positives — exactness is preserved by
  * construction.
  *
  * Build and probe both hash raw UTF-8 bytes (`putBinary` /
  * `mightContainBinary`), so parity does not depend on the sketch
  * library's String handling.
  */
object BloomExpressions {

  /** Distributed build: per-partition partial filters (one pass, no
    * shuffle of the values), OR-merged on the driver. The result is
    * `ceil(-n·ln(fpp)/ln2²)` bits — MB-scale model state for millions
    * of distinct items, same posture as a broadcast hash relation. */
  def buildBloom(values: DataFrame, valueCol: String,
                 expectedItems: Long, fpp: Double = 0.03): BloomFilter = {
    val partials = values.select(valueCol).na.drop()
      .as[String](Encoders.STRING)
      .mapPartitions { it =>
        val bf = BloomFilter.create(expectedItems, fpp)
        it.foreach(v => bf.putBinary(v.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        Iterator.single(bf)
      }(Encoders.javaSerialization[BloomFilter])
      .collect()
    val zero = BloomFilter.create(expectedItems, fpp)
    partials.foldLeft(zero)((acc, b) => acc.mergeInPlace(b).asInstanceOf[BloomFilter])
  }

  /** Count of array elements possibly present in the filter (0 ⇒
    * certainly none present). */
  def hits(arr: ArrayData, bf: BloomFilter): Int = {
    val n = arr.numElements()
    var c = 0; var i = 0
    while (i < n) {
      if (bf.mightContainBinary(arr.getUTF8String(i).getBytes)) c += 1
      i += 1
    }
    c
  }

  /** `bloom_hits(array<string>, filter)` — the filter rides as a
    * reference object (serialized once into the broadcast task binary,
    * not an expression-tree literal), the loop is a codegen'd call. */
  case class BloomHits(child: Expression, filter: BloomFilter)
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "bloom_hits"

    override protected def nullSafeEval(v: Any): Any =
      hits(v.asInstanceOf[ArrayData], filter)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bf = ctx.addReferenceObj("bloomFilter", filter,
        classOf[BloomFilter].getName)
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.plans.BloomExpressions$$.MODULE$$.hits($input, $bf);")
    }

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def bloom_hits(arr: Column, filter: BloomFilter): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      BloomHits(org.apache.spark.sql.graftbridge.ColumnBridge.expression(arr), filter))
}
