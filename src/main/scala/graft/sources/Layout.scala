package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.format.converter.ParquetMetadataConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering plus a
  * parquet-footer min/max manifest for file-level skipping.
  *
  * Spark's parquet reader already skips ROW GROUPS via pushed-down
  * predicates, but vanilla file listing reads every footer of every
  * file on every query. At 100 TB the missing piece is FILE-level
  * skipping from a small manifest — and a layout under which min/max
  * ranges are actually selective. Linear orders cluster one dimension
  * perfectly and leave every other dimension's (min, max) spanning the
  * whole domain; the Z-curve interleaves the dimensions' bits so every
  * file covers a small hyper-rectangle and a predicate on ANY indexed
  * dimension prunes.
  *
  * The z-value is composed entirely from codegen'd bitwise builtins
  * (shiftleft / & / |) — no UDF — and the shift/mask spread table is
  * shared with the DuckDB oracle so the two engines cannot drift.
  */
object Layout {

  /** Bit-spread rounds: after masking to 31 bits, bit i of the input
    * lands at bit 2i. Classic Morton interleave table (the 64-bit
    * variant of the "Bit Twiddling Hacks" spread). */
  val SpreadRounds: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** Low 31 bits of a non-negative long, spread to even bit positions
    * (≤ 60), so two interleaved dims stay inside a positive 64-bit
    * long. */
  def spreadBits(c: Column): Column =
    SpreadRounds.foldLeft(c.bitwiseAND(lit(0x7FFFFFFFL))) {
      case (x, (shift, mask)) =>
        x.bitwiseOR(shiftleft(x, shift)).bitwiseAND(lit(mask))
    }

  /** Z-value of two non-negative dimension columns: `a`'s bits on the
    * even positions, `b`'s on the odd. Total order = the Z-curve. */
  def zvalue(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** The same spread, as DuckDB SQL over an expression string — built
    * from [[SpreadRounds]] so oracle and engine share one table. The
    * operand is cast to BIGINT first: DuckDB's shift-overflow check
    * uses the operand's own width, so an INT32 column would raise
    * "Overflow in left shift" for any value ≥ 2^15. */
  def spreadSql(e: String): String =
    SpreadRounds.foldLeft(s"(CAST($e AS BIGINT) & 2147483647)") {
      case (x, (shift, mask)) =>
        s"((($x | ($x << $shift)) & $mask))"
    }

  def zvalueSql(a: String, b: String): String =
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"

  /** Hilbert-curve distance of two `bits`-bit dimensions — the
    * locality upgrade over [[zvalue]]: consecutive curve positions are
    * always grid neighbors (the Z-curve jumps across the plane at
    * quadrant seams), so range-partitioned files cover tighter
    * hyper-rectangles and the manifest prunes harder on both
    * dimensions. Delegates to the native
    * [[graft.functions.expressions.HilbertDistance]] codegen loop — a
    * Column formulation of the per-bit recurrence grows ~5^bits
    * expression nodes and is unusable past ~8 bits (see the
    * expression's Scaladoc). Inputs are masked to `bits`; LayoutSpec
    * asserts the defining adjacency property over every cell of a
    * 16×16 grid. */
  def hilbertValue(aIn: Column, bIn: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 30, "1 <= bits <= 30")
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      graft.functions.expressions.HilbertDistance(
        ColumnBridge.expression(aIn.cast("long")),
        ColumnBridge.expression(bIn.cast("long")),
        ColumnBridge.expression(lit(bits))))
  }

  /** The same unrolled walk as DuckDB CTE rounds (one CTE per bit, so
    * each round's x/y/d are named once — a nested scalar expression
    * would blow up exponentially). `base` must expose columns `hx`,
    * `hy` plus whatever `carry` columns the caller needs threaded
    * through; returns the WITH-clause body whose final relation
    * `hr$bits` has the curve distance in `hd`. `base` must also expose
    * `hd` initialized to 0. */
  def hilbertCtes(base: String, bits: Int, carry: Seq[String]): String = {
    val n = 1L << bits
    val cols = carry.mkString(", ")
    val rounds = (0 until bits).map { r =>
      val i = bits - 1 - r
      val s = 1L << i
      val prev = if (r == 0) base else s"hr$r"
      s"""hr${r + 1} AS (
         |  SELECT $cols,
         |         CASE WHEN (hy & $s) = 0 THEN CASE WHEN (hx & $s) > 0 THEN ${n - 1} - hy ELSE hy END ELSE hx END AS hx,
         |         CASE WHEN (hy & $s) = 0 THEN CASE WHEN (hx & $s) > 0 THEN ${n - 1} - hx ELSE hx END ELSE hy END AS hy,
         |         hd + $s * $s * (xor(3 * (CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END), CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)) AS hd
         |  FROM $prev)""".stripMargin
    }
    rounds.mkString(",\n")
  }

  /** Bucket id of `c` under the quantile `boundaries` (ascending):
    * count of boundaries ≤ c, as a codegen'd when-chain — no UDF, no
    * HOF. ≤ 255 boundaries keeps the generated code small. */
  def rankBucket(c: Column, boundaries: Seq[Double]): Column =
    boundaries.foldLeft(lit(0L)) { (acc, b) =>
      acc + when(c >= lit(b), 1L).otherwise(0L)
    }

  /** [[zvalue]] after rank-normalizing both dimensions to `buckets`
    * quantile buckets — the shape real tables need: raw interleaving
    * weights dimensions by their absolute bit positions, so a 16-bit id
    * next to a 40-bit id never prunes on the small one. Quantile
    * boundaries come from `approxQuantile` (a sampled driver action,
    * one linear scan for both columns), exactly the sampled
    * range-boundary approach production Z-order writers use. */
  def zvalueRanked(
      df: DataFrame,
      a: String,
      b: String,
      buckets: Int = 64): Column = {
    require(buckets >= 2 && buckets <= 256, "2 ≤ buckets ≤ 256")
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val Array(aBounds, bBounds) =
      df.stat.approxQuantile(Array(a, b), probs, 0.001)
    zvalue(
      rankBucket(col(a), aBounds.toSeq),
      rankBucket(col(b), bBounds.toSeq))
  }

  /** Write `df` Z-clustered on (a, b) into `numFiles` range-partitioned
    * files. Each output file then covers one z-range = one small
    * hyper-rectangle in (a, b) — the layout [[manifest]] pruning needs.
    * Range partitioning samples the z distribution, so file sizes stay
    * balanced even when the dimensions are skewed. Dimensions with
    * incomparable ranges should go through [[zvalueRanked]] (pass
    * `ranked = true`). */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      a: String,
      b: String,
      numFiles: Int,
      ranked: Boolean = false): Unit =
    df.withColumn(
        "__z",
        if (ranked) zvalueRanked(df, a, b) else zvalue(col(a), col(b)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write
      .mode("overwrite")
      .parquet(path)

  /** [[writeZOrdered]]'s Hilbert sibling: range-partitioned on the
    * curve distance, so each file covers one contiguous curve run —
    * the tightest hyper-rectangles a linear order can give. */
  def writeHilbertOrdered(
      df: DataFrame,
      path: String,
      a: String,
      b: String,
      numFiles: Int,
      bits: Int = 16): Unit =
    df.withColumn("__h", hilbertValue(col(a), col(b), bits))
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
      .write
      .mode("overwrite")
      .parquet(path)

  /** Per-file (min, max) of one int64 column across all row groups —
    * read from parquet FOOTERS only (no data pages touched), so
    * building the manifest over a 100 TB table is a metadata operation,
    * not a scan. Footers are fetched with a parallel stream: a serial
    * loop over tens of thousands of remote footers would take the
    * driver minutes; the read itself stays per-file independent.
    *
    * A skipping index must FAIL OPEN: a row group without statistics
    * for `column` widens its file's range to (MinValue, MaxValue) so
    * [[prune]] always keeps it — stats are an optimization, never a
    * correctness gate. Files with no row groups at all hold no rows
    * and are safely omitted. */
  final case class FileRange(file: String, min: Long, max: Long)

  def manifest(spark: org.apache.spark.sql.SparkSession, path: String, column: String): Seq[FileRange] = {
    val conf = spark.sparkContext.hadoopConfiguration
    // Path.getFileSystem, NOT FileSystem.get(new URI(path)): a raw URI
    // parse throws on paths needing encoding (spaces, '%'), which every
    // surrounding Hadoop/Spark API accepts
    val fs = new Path(path).getFileSystem(conf)
    val files = fs
      .listStatus(new Path(path))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    java.util.Arrays
      .stream(files)
      .parallel()
      .map[Option[FileRange]] { st =>
        val footer = ParquetFileReader.readFooter(
          conf,
          st.getPath,
          ParquetMetadataConverter.NO_FILTER)
        val blocks = footer.getBlocks
          .toArray(Array.empty[org.apache.parquet.hadoop.metadata.BlockMetaData])
          .toSeq
        if (blocks.isEmpty) None // zero row groups = zero rows
        else {
          val ranges = blocks.map { block =>
            block.getColumns
              .toArray(
                Array.empty[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData])
              .find(_.getPath.toDotString == column)
              .map(_.getStatistics)
              .filter(s => s != null && s.hasNonNullValue)
              .map(s =>
                (s.genericGetMin.asInstanceOf[Number].longValue(),
                 s.genericGetMax.asInstanceOf[Number].longValue()))
              // fail open: no stats for this row group → unbounded
              .getOrElse((Long.MinValue, Long.MaxValue))
          }
          Some(FileRange(
            st.getPath.toString,
            ranges.map(_._1).min,
            ranges.map(_._2).max))
        }
      }
      .toArray((n: Int) => new Array[Option[FileRange]](n))
      .toSeq
      .flatten
  }

  /** Files whose [min, max] overlaps [lo, hi] — the read set for a
    * range predicate on the manifested column. May be EMPTY when the
    * predicate overlaps nothing — consume through [[readPruned]]
    * (`spark.read.parquet()` with zero paths throws). Parquet
    * row-group pushdown then finishes the job inside each kept file. */
  def prune(m: Seq[FileRange], lo: Long, hi: Long): Seq[String] =
    m.filter(r => r.max >= lo && r.min <= hi).map(_.file)

  /** Read the pruned file subset for a range predicate on `column` —
    * the fully-selective case (no file overlaps) correctly yields an
    * empty DataFrame in the table's schema instead of the
    * empty-path-list error `spark.read.parquet(files: _*)` raises. */
  def readPruned(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      column: String,
      lo: Long,
      hi: Long): DataFrame =
    readPruned(spark, path, manifest(spark, path, column), lo, hi)

  /** Prebuilt-manifest variant — the shape repeated queries should use:
    * [[manifest]] is a driver-side footer fetch per file (O(#files)
    * remote reads), built ONCE per table generation and reused across
    * every query window; rebuilding it per query would pay the exact
    * cost the manifest exists to amortize. */
  def readPruned(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      man: Seq[FileRange],
      lo: Long,
      hi: Long): DataFrame = {
    val files = prune(man, lo, hi)
    if (files.isEmpty) spark.read.parquet(path).limit(0)
    else spark.read.parquet(files: _*)
  }
}
