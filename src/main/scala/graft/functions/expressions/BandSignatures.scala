package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** All `bands` sign-LSH band signatures of one vector in ONE codegen'd
  * expression: returns `array<long>` of length `bands`, element b =
  * Σ_i [dot(v, plane_{b·bits+i}) > 0]·2^i.
  *
  * The per-plane formulation ([[graft.functions.VectorFns.hyperplaneSignature]]
  * — one `typedLit` array and one [[DotProduct]] per plane) builds
  * bands×bits literal expression trees; at auto-tuned geometry
  * ([[graft.dedup.Dedup.lshTune]] — e.g. 45 bands × 15 bits at 20k
  * vectors) that is ~700 plane literals and the PLAN (analysis, codegen,
  * broadcast) becomes the dominant cost, growing with corpus size.
  * Here the planes arrive as one flattened `array<double>` literal of
  * length bands·bits·dim (component (p, j) at index p·dim + j — the
  * [[graft.functions.VectorFns.hpComponent]] family in plane order) and
  * the whole signature matrix is one tight primitive loop: plan size
  * O(1), runtime identical FMAs.
  *
  * Bit-exactness: each plane's dot folds sequentially over j — the same
  * order as [[DotProduct]] and DuckDB's `list_dot_product` — and the
  * signature assembly is integer, so results are bit-identical to the
  * per-plane formulation and to the SQL oracle.
  */
case class BandSignatures(
    vec: Expression,
    planes: Expression,
    bands: Int,
    bits: Int,
    dim: Int)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = planes

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (!ok(vec.dataType) || !ok(planes.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_band_sigs expects (array<double>, array<double>), " +
          s"got (${vec.dataType.simpleString}, ${planes.dataType.simpleString})")
    else if (bands <= 0 || bits <= 0 || bits > 62 || dim <= 0)
      TypeCheckResult.TypeCheckFailure(
        s"graft_band_sigs needs bands > 0, 0 < bits <= 62, dim > 0 (got $bands, $bits, $dim)")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any, p: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val pl = p.asInstanceOf[ArrayData]
    BandSignatures.checkLengths(x.numElements(), pl.numElements(), bands, bits, dim)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var i = 0
      while (i < bits) {
        val base = (b * bits + i) * dim
        var s = 0.0
        var j = 0
        while (j < dim) {
          s += x.getDouble(j) * pl.getDouble(base + j)
          j += 1
        }
        if (s > 0) sig |= (1L << i)
        i += 1
      }
      out(b) = sig
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (v, p) => {
        val b = ctx.freshName("b")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val s = ctx.freshName("s")
        val sig = ctx.freshName("sig")
        val base = ctx.freshName("base")
        val out = ctx.freshName("out")
        s"""
           |graft.functions.expressions.BandSignatures.checkLengths(
           |  $v.numElements(), $p.numElements(), $bands, $bits, $dim);
           |long[] $out = new long[$bands];
           |for (int $b = 0; $b < $bands; $b++) {
           |  long $sig = 0L;
           |  for (int $i = 0; $i < $bits; $i++) {
           |    int $base = ($b * $bits + $i) * $dim;
           |    double $s = 0.0;
           |    for (int $j = 0; $j < $dim; $j++) {
           |      $s += $v.getDouble($j) * $p.getDouble($base + $j);
           |    }
           |    if ($s > 0) $sig |= (1L << $i);
           |  }
           |  $out[$b] = $sig;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(vec = newLeft, planes = newRight)

  override def prettyName: String = "graft_band_sigs"
}

object BandSignatures {

  /** Ragged input must throw, not silently mis-index the plane matrix
    * (same contract as [[DotProduct.checkLengths]]). */
  def checkLengths(vecLen: Int, planesLen: Int, bands: Int, bits: Int, dim: Int): Unit = {
    if (vecLen != dim)
      throw new IllegalArgumentException(
        s"graft_band_sigs: vector length $vecLen != dim $dim")
    if (planesLen != bands * bits * dim)
      throw new IllegalArgumentException(
        s"graft_band_sigs: plane matrix length $planesLen != bands*bits*dim ${bands * bits * dim}")
  }
}
