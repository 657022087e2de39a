package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

import graft.functions.Hashing

/** 120-bit SimHash off the token ARRAY: the wide sibling of
  * [[SimhashTokens]], for corpora past the 60-bit band-space saturation
  * point (≥10⁷ docs at radius 6 the narrow fingerprint's 7 bands have
  * ≤2⁹ buckets each and candidates grow ~n²; 120 bits buys 15–20-bit
  * bands in the same join shape).
  *
  * Returns `array<bigint>` `[sim_lo, sim_hi]` — two non-negative 60-bit
  * words, the lower fold over [[Hashing.md5LongJvm]] (bit-identical to
  * the narrow signature at bits = 60) and the upper over
  * [[Hashing.md5LongHiJvm]], BOTH halves of ONE md5 digest per token
  * ([[Hashing.md5LongPairJvm]]) so widening costs no extra hashing.
  * DuckDB replays each half exactly (`duckMd5Long` / `duckMd5LongHi`).
  * Null array elements are ignored (not hashed, not counted), matching
  * [[SimhashTokens.compute]].
  */
case class SimhashTokensWide(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_simhash_wide expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    SimhashTokensWide.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"graft.functions.expressions.SimhashTokensWide.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash_wide"
}

object SimhashTokensWide {

  val Bits = 120 // two 60-bit md5 halves
  private val Half = 60

  /** Flat one-pass fold over 120 counters; one md5 per token. */
  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val ones = new Array[Int](Bits)
    val h2 = new Array[Long](2)
    var m = 0
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        m += 1
        Hashing.md5LongPairJvm(toks.getUTF8String(i).getBytes, h2)
        var j = 0
        while (j < Half) {
          ones(j) += ((h2(0) >>> j) & 1L).toInt
          ones(Half + j) += ((h2(1) >>> j) & 1L).toInt
          j += 1
        }
      }
      i += 1
    }
    var lo = 0L
    var hi = 0L
    var j = 0
    while (j < Half) {
      if (2L * ones(j) > m) lo |= (1L << j)
      if (2L * ones(Half + j) > m) hi |= (1L << j)
      j += 1
    }
    new GenericArrayData(Array(lo, hi))
  }
}
