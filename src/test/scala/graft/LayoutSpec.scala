package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Layout

/** Z-order layout + footer-manifest file skipping. Dimensions in the
  * raw-interleave tests share a 0..255 range — the comparable-bit-width
  * precondition the Layout docs state (bit interleaving weights
  * dimensions by their raw bit positions). */
class LayoutSpec extends SparkSpec {

  private def withDirs[A](prefixes: String*)(body: Seq[String] => A): A = {
    val dirs = prefixes.map(p => Files.createTempDirectory(p).toString)
    try body(dirs)
    finally dirs.foreach { d =>
      val root = new java.io.File(d)
      Option(root.listFiles).foreach(_.foreach(_.delete()))
      root.delete()
    }
  }

  // 65k points on a 256×256 grid, row-major — "a" is the natural
  // (linear) order, "b" cycles fast
  private def grid = {
    spark
      .range(0, 65536, 1, 8)
      .select(
        (col("id") / 256).cast("long").as("a"),
        (col("id") % 256).cast("long").as("b"))
  }

  private def interleaveRef(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  private def kept(dir: String, column: String, lo: Long, hi: Long): Int =
    Layout.prune(Layout.manifest(spark, dir, column), lo, hi).size

  test("zvalue matches the bit-interleave reference, including 31-bit masking") {
    val rows = spark
      .range(0, 1000)
      .select(
        col("id"),
        Layout.zvalue(col("id") * 2097169L, col("id") * 613L).as("z"))
      .collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val expected =
        interleaveRef((id * 2097169L) & 0x7FFFFFFFL, (id * 613L) & 0x7FFFFFFFL)
      assert(r.getLong(1) == expected, s"id=$id")
    }
  }

  test("z-ordered files prune on both dimensions; linear layout prunes only its own") {
    withDirs("graft-zorder", "graft-linear") { case Seq(zdir, ldir) =>
      Layout.writeZOrdered(grid, zdir, "a", "b", numFiles = 16)
      // the linear counter-layout: perfectly clustered on "a" only
      grid
        .repartitionByRange(16, col("a"))
        .sortWithinPartitions("a", "b")
        .write
        .mode("overwrite")
        .parquet(ldir)

      val zFiles = Layout.manifest(spark, zdir, "a").size
      val lFiles = Layout.manifest(spark, ldir, "a").size
      assert(zFiles == 16 && lFiles == 16)

      // a narrow band on each dimension (1/8 of the domain)
      assert(kept(zdir, "a", 0, 31) <= zFiles / 2)
      assert(kept(zdir, "b", 0, 31) <= zFiles / 2)
      assert(kept(ldir, "a", 0, 31) <= 3) // linear wins on its own key…
      assert(kept(ldir, "b", 0, 31) == lFiles) // …and prunes nothing else

      // pruned read + residual filter ≡ full filter (row-group pushdown
      // finishes inside kept files)
      val viaPruned = Layout
        .readPruned(spark, zdir, "b", 0, 31)
        .filter(col("b") <= 31)
        .agg(count(lit(1)), sum("a"), sum("b"))
        .collect()(0)
      val viaFull = spark.read
        .parquet(zdir)
        .filter(col("b") <= 31)
        .agg(count(lit(1)), sum("a"), sum("b"))
        .collect()(0)
      assert(viaPruned == viaFull)
      assert(viaPruned.getLong(0) == 256L * 32)

      // the fully-selective case: no file overlaps → empty result in
      // the table's schema, not an empty-path-list error
      val none = Layout.readPruned(spark, zdir, "a", 1000, 2000)
      assert(none.columns.toSeq == Seq("a", "b") && none.count() == 0)
    }
  }

  test("ranked z-order prunes dimensions whose raw ranges are incomparable") {
    // "small" is 8-bit, "big" is ~38-bit: raw interleave masks big to
    // 31 bits (wrapping scrambles it) and big's surviving high bits
    // drown small's — neither dimension prunes. Rank-bucketing first
    // restores the comparable-width precondition.
    val df = spark
      .range(0, 65536, 1, 8)
      .select(
        (col("id") % 256).cast("long").as("small"),
        ((col("id") / 256).cast("long") * 1000000000L).as("big"))
    withDirs("graft-zrank", "graft-zraw") { case Seq(rdir, wdir) =>
      Layout.writeZOrdered(df, rdir, "small", "big", numFiles = 16, ranked = true)
      Layout.writeZOrdered(df, wdir, "small", "big", numFiles = 16)

      // 1/8-of-domain bands on each dimension
      assert(kept(rdir, "small", 0, 31) <= 8)
      assert(kept(rdir, "big", 0, 31L * 1000000000L) <= 8)
      assert(kept(wdir, "small", 0, 31) >= 12) // raw layout: no skipping
    }
  }
}
