package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

import graft.functions.Hashing

/** Per-doc SimHash straight off the token ARRAY, as one codegen'd
  * per-row expression — no explode, no `bits`-column aggregate, no
  * shuffle at all: the signature pipeline becomes a pure projection
  * over the corpus scan (or a materialized token table).
  *
  * Bit-identical to the aggregate formulation in
  * [[graft.dedup.Dedup.simhashSignatures]] (per bit j, set iff
  * `2·ones_j > n` over md5Long token hashes WITH multiplicity — the
  * sign of `w_j = 2·ones_j − n`): the token hash is
  * [[Hashing.md5LongJvm]], whose parity with the Column-side
  * `conv(substring(md5(x),1,15),16,10)` is spec-asserted, so DuckDB
  * oracles replay the same signatures either way. Parity between the
  * two formulations is itself spec-asserted (DedupAnnApiSpec).
  */
case class SimhashTokens(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 60, s"simhash width must be in [1, 60], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_simhash expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimhashTokens.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"graft.functions.expressions.SimhashTokens.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

object SimhashTokens {

  /** Flat one-pass fold; called from generated code, once per row.
    * Null elements are ignored entirely (not hashed, not counted in the
    * majority threshold) — `graft_tokens` output is null-free, but the
    * expression is publicly constructible over any `array<string>` and
    * must not NPE on `containsNull = true` inputs. */
  def compute(toks: ArrayData, bits: Int): Long = {
    val n = toks.numElements()
    val ones = new Array[Int](bits)
    var m = 0
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        m += 1
        val h = Hashing.md5LongJvm(toks.getUTF8String(i).getBytes)
        var j = 0
        while (j < bits) {
          ones(j) += ((h >>> j) & 1L).toInt
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (2L * ones(j) > m) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
