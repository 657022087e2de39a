package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** All upper-triangle fixed-point component products of one embedding
  * row as ONE primitive long array, in (j ≤ k) row-major order — the
  * covariance sufficient-statistics kernel of `q_embed_cov` /
  * `q_pca_top`.
  *
  * Replaces the SQL formulation
  * `flatten(transform(sequence(0,d-1), j -> transform(sequence(j,d-1),
  * k -> named_struct('j',…,'k',…,'p', qv[j]*qv[k]))))`, which
  * allocated d·(d+1)/2 structs per row (≈2080 at 64 dims — measured
  * 24–72 s of summed task time per pass at sf0.1, nearly all
  * allocation/GC). The quantization is the identical
  * `CAST(floor(CAST(x AS DOUBLE) * fp) AS BIGINT)` arithmetic
  * (float→double widening is exact; IEEE floor), so every product —
  * and therefore every downstream decimal sum — is bit-equal to the
  * SQL path (spec-asserted). Output element `pos` maps to the dim pair
  * via the caller's (pos → j,k) table.
  */
case class QuantizedPairProducts(child: Expression, fp: Long)
    extends UnaryExpression {

  require(fp > 0, "fixed-point scale must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double>, got ${t.simpleString}")
  }

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    QuantizedPairProducts.compute(
      input.asInstanceOf[ArrayData], isFloat, fp.toDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c =>
        s"graft.functions.expressions.QuantizedPairProducts.compute($c, $isFloat, ${fp.toDouble})")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_cov_products"
}

object QuantizedPairProducts {

  /** Called from generated code, once per row. Null elements are
    * rejected (embedding arrays are null-free by schema; the SQL
    * formulation would propagate element nulls into the sum's skip
    * path, a case the data cannot produce — fail loudly over silently
    * diverging). */
  def compute(arr: ArrayData, isFloat: Boolean, fp: Double): ArrayData = {
    val n = arr.numElements()
    val qv = new Array[Long](n)
    var i = 0
    while (i < n) {
      require(!arr.isNullAt(i), "graft_cov_products: null embedding component")
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      qv(i) = math.floor(x * fp).toLong
      i += 1
    }
    val out = new Array[Long](n * (n + 1) / 2)
    var idx = 0
    var j = 0
    while (j < n) {
      val qj = qv(j)
      var k = j
      while (k < n) {
        out(idx) = qj * qv(k)
        idx += 1
        k += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
