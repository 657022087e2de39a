package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Shared output-ordering helpers for query heads. */
private[graft] object SortUtil {

  /** Deterministic total order for small (group-bounded) outputs: one
    * shuffle into a single partition + local sort. A trailing global
    * `orderBy` range-samples its child first, re-executing the upstream
    * plan a second time — pure waste when the output is a bounded set
    * of groups. Apply ONLY where output cardinality is group-bounded
    * (flags, nations, event types, segments); full-table outputs keep
    * the scalable range sort. If the bounded cardinality ever reaches
    * tens of millions, switch the head back to `orderBy`. */
  def sortSmall(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)
}
