package graft

import org.apache.spark.sql.functions._
import graft.functions.{HilbertOps, ZOrderOps}
import graft.operators.Layout

class ZOrderSpec extends SparkSpec {

  private def bucketed = spark.read.parquet(s"$sf/orders.parquet")
    .select(col("o_orderkey"),
      col("o_custkey").bitwiseAND(lit(255L)).as("xb"),
      floor(col("o_totalprice") / lit(2048.0)).cast("long")
        .bitwiseAND(lit(255L)).as("yb"))

  test("codegen'd interleave equals the expanded shift/mask arithmetic") {
    val mismatches = bucketed
      .withColumn("z", ZOrderOps.zorder2(col("xb"), col("yb")))
      .withColumn("z2", expr(ZOrderOps.expandedSql("xb", "yb")))
      .filter(col("z") =!= col("z2")).count()
    assert(mismatches === 0L)
  }

  test("interleave is a bijection on the 16-bit grid (corner values)") {
    for ((x, y) <- Seq((0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L),
                       (0xFFFFL, 0xFFFFL), (1L, 2L))) {
      val z = ZOrderOps.interleave16(x, y)
      // de-interleave by extracting even/odd bits
      var (dx, dy) = (0L, 0L)
      for (i <- 0 until 16) {
        dx |= ((z >> (2 * i)) & 1L) << i
        dy |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert((dx, dy) === (x & 0xFFFFL, y & 0xFFFFL))
    }
  }

  test("range-partitioning by z shrinks per-partition bboxes on BOTH dims") {
    val parts = bucketed
      .withColumn("z", ZOrderOps.zorder2(col("xb"), col("yb")))
      .repartitionByRange(16, col("z"))
      .select(spark_partition_id().as("p"), col("xb"), col("yb"))
      .groupBy(col("p"))
      .agg((max(col("xb")) - min(col("xb"))).as("xr"),
           (max(col("yb")) - min(col("yb"))).as("yr"))
      .collect()
    val avgPerim = parts.map(r =>
      r.getAs[Long]("xr") + r.getAs[Long]("yr")).sum.toDouble / parts.length
    // Unclustered both ranges are ~255+255 = 510 in every partition; a
    // 16-way z-range split must cut the average bounding-box perimeter
    // substantially on the two dims TOGETHER (that's the whole point).
    assert(parts.length > 1 && avgPerim < 300, s"avgPerim=$avgPerim")
  }

  test("q104 returns the 100 lowest z-values with deterministic ties") {
    val rows = Layout.zorderCluster(spark, sf).collect()
    assert(rows.length === 100)
    val zs = rows.map(_.getAs[Long]("z"))
    assert(zs.sameElements(zs.sorted))
    // z must actually be the interleave of the row's buckets
    rows.foreach { r =>
      assert(r.getAs[Long]("z") ===
        ZOrderOps.interleave16(r.getAs[Long]("xb"), r.getAs[Long]("yb")))
    }
  }

  test("hilbert8 is a bijection and consecutive indices are grid-adjacent") {
    // Exhaustive over the whole 256x256 grid: THE defining property of a
    // Hilbert curve (and what Morton lacks — the z-curve jumps). Each
    // h value hit exactly once; |Δx|+|Δy| = 1 between h and h+1.
    val pos = new Array[Int](65536)
    java.util.Arrays.fill(pos, -1)
    for (x <- 0 until 256; y <- 0 until 256) {
      val h = HilbertOps.hilbert8(x.toLong, y.toLong).toInt
      assert(h >= 0 && h < 65536 && pos(h) == -1, s"collision at h=$h")
      pos(h) = (x << 8) | y
    }
    for (h <- 1 until 65536) {
      val (px, py) = (pos(h - 1) >> 8, pos(h - 1) & 255)
      val (cx, cy) = (pos(h) >> 8, pos(h) & 255)
      assert(math.abs(cx - px) + math.abs(cy - py) === 1,
        s"jump at h=$h: ($px,$py)->($cx,$cy)")
    }
  }

  test("codegen'd hilbert equals the interpreted walk on real data") {
    val rows = bucketed
      .withColumn("h", HilbertOps.hilbert2(col("xb"), col("yb")))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("h") ===
        HilbertOps.hilbert8(r.getAs[Long]("xb"), r.getAs[Long]("yb")))
    }
  }

  test("hilbert range partitions are at least as tight as zorder's") {
    def avgPerim(keyed: org.apache.spark.sql.DataFrame): Double = {
      val parts = keyed.repartitionByRange(16, col("k"))
        .select(spark_partition_id().as("p"), col("xb"), col("yb"))
        .groupBy(col("p"))
        .agg((max(col("xb")) - min(col("xb"))).as("xr"),
             (max(col("yb")) - min(col("yb"))).as("yr"))
        .collect()
      parts.map(r => r.getAs[Long]("xr") + r.getAs[Long]("yr"))
        .sum.toDouble / parts.length
    }
    val hp = avgPerim(bucketed
      .withColumn("k", HilbertOps.hilbert2(col("xb"), col("yb"))))
    val zp = avgPerim(bucketed
      .withColumn("k", ZOrderOps.zorder2(col("xb"), col("yb"))))
    // jump-free walk => equal-count ranges have tighter-or-equal bboxes
    assert(hp < 300, s"hilbert avgPerim=$hp")
    assert(hp <= zp * 1.05, s"hilbert=$hp vs zorder=$zp")
  }

  test("q157: z-prefix buckets prune the box query, natural order cannot") {
    val rows = Layout.layoutPruning(spark, sf).collect()
      .map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("n_buckets"), r.getAs[Long]("n_hit_buckets"),
         r.getAs[Long]("rows_scanned"), r.getAs[Long]("rows_matching"))).toMap
    val (natB, natHit, natScan, natMatch) = rows("natural")
    val (zB, zHit, zScan, zMatch) = rows("zorder")
    val (_, hHit, hScan, hMatch) = rows("hilbert")
    // same predicate, same rows — only the layout differs
    assert(natMatch === zMatch && natMatch > 0)
    assert(hMatch === zMatch)
    // 64 hilbert prefix buckets = 1024-cell curve segments = level-3
    // 32x32 subquadrants; the box [64,128)x[0,64) is exactly 4 of them
    assert(hHit <= 4, s"hilbert hit $hHit buckets")
    assert(hScan === hMatch, "hilbert prefix buckets should be exact")
    // the query box [64,128)x[0,64) is a Morton-aligned quad: its top-4
    // interleaved bits are fixed, so it spans exactly 4 of the 64
    // z-prefix buckets — and those buckets contain ONLY box rows
    assert(zHit <= 4, s"zorder hit $zHit of $zB buckets")
    assert(zScan === zMatch, "z-prefix buckets should be exact")
    // natural (insertion) order is selective on neither dimension:
    // nearly every bucket's bbox intersects the box
    assert(natHit >= natB / 2, s"natural hit only $natHit of $natB")
    // the box covers 1/16 of the space; natural order reads ~everything
    assert(natScan > 5L * natMatch,
      s"natural order scanned $natScan for $natMatch matches")
  }
}
