package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float>` embedding columns.
  *
  * Implemented with `zip_with`/`aggregate` higher-order functions: the
  * fold is sequential in array order, so double-precision results are
  * bit-reproducible (and match a same-order DuckDB list fold).
  */
object VectorFns {

  /** Cast an array<float> to array<double> before arithmetic. */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Signed random-hyperplane LSH bucket from `nBits` deterministic
    * pseudo-random hyperplanes. Component j of plane i is derived from the
    * portable hash family, mapped into [-1, 1]. */
  def hyperplaneSignature(v: Column, nBits: Int): Column = {
    val comps = (0 until nBits).map { i =>
      val proj = aggregate(
        zip_with(
          v,
          sequence(lit(0), size(v) - 1),
          (x, j) =>
            x * (Hashing
              .md5Long(concat(lit(s"hp:$i:"), j.cast("string")))
              .cast("double") / lit(5.764607523034235e17) - lit(1.0))),
        lit(0.0),
        (acc, x) => acc + x)
      when(proj > 0, lit(1L << i)).otherwise(lit(0L))
    }
    comps.reduce((a, b) => a + b)
  }
}
