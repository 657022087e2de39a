package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.expressions.DotProduct

/** Dense-vector column functions over `array<float>` embedding columns.
  *
  * All dot products route through the codegen'd [[DotProduct]]
  * expression. Its fold is sequential in array order, so double-precision
  * results are bit-reproducible and match a same-order DuckDB list fold
  * (`list_dot_product`).
  */
object VectorFns {

  /** Widen an array<float> to array<double> (native element-wise cast —
    * stays inside whole-stage codegen, unlike a `transform` lambda). */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Codegen'd sequential-fold dot product. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine denominator with a zero floor: a zero-norm vector has dot 0
    * against everything, so the floor maps its cosine to exactly 0.0
    * ("no direction" ≈ orthogonal) instead of 0/0 = NaN — which Spark
    * sorts as the LARGEST double, silently crowning zero vectors rank-1
    * in every cosine ordering (and poisoning a k-means argmax CASE
    * chain, where NaN === NaN matches). Identity for every non-zero
    * product. SQL mirror: `greatest(x * y, 1e-300)`. */
  def safeDen(a: Column, b: Column): Column = greatest(a * b, lit(1e-300))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / safeDen(norm(a), norm(b))

  /** Per-vector int8 scalar quantization: symmetric, zero-centered,
    * scale = max(|x|)/127 (floored so the all-zero vector quantizes to
    * all-zero codes instead of 0/0). Codes are `floor(x/scale + 0.5)`
    * — explicit floor, NOT `round()`, so both engines resolve ties
    * identically and the DuckDB oracle is bit-exact. Returns the codes
    * plus the reconstruction scale; at 100 TB this is the 4× memory /
    * shuffle-width reduction that makes billion-vector ANN shortlists
    * fit in executor memory (codes rerank via [[dequantize]], exact
    * vectors touched only for the final shortlist — same pattern as
    * the PQ path, coarser but transposition-free). */
  def quantizeScale(v: Column): Column =
    greatest(array_max(transform(v, x => abs(x))), lit(1e-30)) / 127.0

  def quantizeCodes(v: Column, scale: Column): Column =
    transform(v, x => floor(x / scale + 0.5).cast("int"))

  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale)

  /** JVM twin of [[Hashing.md5Long]] for driver-side constants. */
  private def md5Long(s: String): Long = {
    val d = java.security.MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Component j of deterministic pseudo-random hyperplane i, in [-1, 1].
    * Identical to the value the in-plan formulation derives from Spark's
    * `md5("hp:i:j")`. Exposed package-wide so the DuckDB oracle can bake
    * the SAME doubles as SQL literals (Double.toString round-trips). */
  private[graft] def hpComponent(i: Int, j: Int): Double =
    md5Long(s"hp:$i:$j").toDouble / 5.764607523034235e17 - 1.0

  /** Signed random-hyperplane LSH bucket from `nBits` deterministic
    * hyperplanes of dimension `dim`. The planes are *literal* arrays
    * baked into the plan — per row the bucket costs nBits codegen'd dot
    * products, instead of re-deriving every plane component from md5 on
    * every row. `planeOffset` selects which planes of the shared family
    * participate (plane index = planeOffset + bit), so banded callers
    * (one signature per band) draw independent planes from the same
    * deterministic family the oracle can reproduce. */
  def hyperplaneSignature(
      v: Column,
      nBits: Int,
      dim: Int = 64,
      planeOffset: Int = 0): Column = {
    val comps = (0 until nBits).map { i =>
      val plane = typedLit((0 until dim).map(j => hpComponent(planeOffset + i, j)))
      when(dot(v, plane) > 0, lit(1L << i)).otherwise(0L)
    }
    comps.reduce(_ + _)
  }

  /** ALL `bands` sign signatures at once as `array<long>` (element b =
    * the signature of planes `b*bits .. b*bits+bits-1` — the same
    * family/offsets as per-band [[hyperplaneSignature]] calls, so the
    * SQL oracle is unchanged). One flattened plane-matrix literal + one
    * codegen'd loop ([[graft.functions.expressions.BandSignatures]]):
    * plan size stays O(1) at auto-tuned geometry where the per-plane
    * formulation builds hundreds of literal trees and plan overhead
    * dominates the query. */
  def bandSignatures(v: Column, bands: Int, bits: Int, dim: Int = 64): Column = {
    val planes = typedLit(
      (0 until bands * bits).flatMap(p => (0 until dim).map(j => hpComponent(p, j))))
    ColumnBridge.column(
      graft.functions.expressions.BandSignatures(
        ColumnBridge.expression(v),
        ColumnBridge.expression(planes),
        bands,
        bits,
        dim))
  }
}
