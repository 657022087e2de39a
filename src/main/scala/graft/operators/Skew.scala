package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the cases AQE's skew-join split does not
  * cover: broadcast-infeasible joins against a hot-keyed build side, and
  * aggregation state that map-side partials cannot shrink
  * (`count_distinct` over a hot group).
  *
  * For algebraic aggregates (sum/count/min/max) salting is *not* needed —
  * hash-aggregate partials already combine per input partition before the
  * shuffle. Reach for these only when the shuffled state itself is the
  * skew.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Equi-join where `big` has hot keys and `small` is too large to
    * broadcast: the big side is salted into `buckets` sub-keys (spreading
    * each hot key over `buckets` reducers), the small side replicated
    * `buckets`× so every sub-key finds its match. Result is identical to
    * `big.join(small, keys, joinType)`.
    *
    * Supported joinType: inner / left (right/full would need the salt on
    * the preserved side's null rows). */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      buckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(
      Seq("inner", "left", "left_outer").contains(joinType),
      s"unsupported salted join type: $joinType")
    // Deterministic PER-ROW salt: hash of the row CONTENT, so (a) rows
    // of a hot key spread over all buckets even when the big side
    // arrives clustered by the join key (a per-partition salt would
    // give such a key one salt and spread nothing), and (b) the salt is
    // stable under task/stage retry — a positional id
    // (monotonically_increasing_id / spark_partition_id) changes when a
    // recomputed partition reorders, which can duplicate or drop join
    // rows when only some downstream tasks retry. Map-typed columns are
    // excluded (xxhash64 rejects them — map element order is
    // undefined); rows identical in every hashed column share a salt,
    // which is harmless: such rows are interchangeable.
    import org.apache.spark.sql.types._
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case ArrayType(et, _) => hasMap(et)
      case StructType(fs) => fs.exists(f => hasMap(f.dataType))
      case _ => false
    }
    val hashable = big.schema.fields
      .filterNot(f => hasMap(f.dataType))
      .map(f => col(f.name))
    val saltInput = if (hashable.nonEmpty) hashable.toSeq else keys.map(col)
    val salted = big.withColumn(
      SaltCol,
      pmod(xxhash64(saltInput: _*), lit(buckets.toLong)).cast("int"))
    val replicated = small.withColumn(
      SaltCol,
      explode(array((0 until buckets).map(lit(_)): _*)))
    salted.join(replicated, keys :+ SaltCol, joinType).drop(SaltCol)
  }

  /** `groupBy(keys).agg(count_distinct(value))` without a hot-group
    * state: phase 1 distincts (keys, value) pairs — partials shrink the
    * duplicates map-side — phase 2 counts per key. Identical result
    * (`count(value)` in phase 2, because `count_distinct` ignores NULL
    * values and the distinct pass keeps one (keys, NULL) row), skew
    * spread over the (keys, value) space. */
  def countDistinct(
      df: DataFrame,
      keys: Seq[String],
      value: String,
      resultName: String = "n_distinct"): DataFrame = {
    val keyCols = keys.map(col)
    df.select((keyCols :+ col(value)): _*)
      .distinct()
      .groupBy(keyCols: _*)
      .agg(count(col(value)).as(resultName))
  }
}
