package graft

import org.apache.spark.sql.functions._
import graft.ext.ZOrder

/** Laws for the Z-order layout operator: the codegen'd Morton key equals
  * a plain-Scala reference interleave (clamping included), loses no bits
  * on in-range input, and clusterByZ really produces disjoint key ranges
  * per partition — the property min/max file pruning depends on. The
  * registry query `q_zorder_key` then hash-certifies the identical
  * arithmetic against the DuckDB rendering.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue matches the reference interleave, clamps included") {
    // grid covering interior values, 0, mask, overflow and negatives
    val vals = Seq(0L, 1L, 2L, 3L, 5L, 255L, 256L, 65535L, 65536L, 999999L,
      -1L, -42L)
    val rows = for (x <- vals; y <- vals) yield (x, y)
    val df = rows.toDF("x", "y")
    val got = df.select(col("x"), col("y"),
        ZOrder.zValue(Seq(col("x"), col("y")), bits = 16).as("z"))
      .as[(Long, Long, Long)].collect()
    for ((x, y, z) <- got)
      assert(z == ZOrder.zValueRef(Seq(x, y), 16), s"($x, $y)")
  }

  test("zValue is injective on in-range pairs (interleave loses no bits)") {
    val rows = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val zs = rows.toDF("x", "y")
      .select(ZOrder.zValue(Seq(col("x"), col("y")), bits = 6))
      .as[Long].collect()
    assert(zs.distinct.length == rows.length)
  }

  test("zValue refuses widths that overflow a long") {
    intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq(col("x"), col("y")), bits = 32)
    }
    intercept[IllegalArgumentException] { ZOrder.zValue(Nil) }
  }

  test("three-dimension interleave round-trips through the reference") {
    val rows = Seq((1L, 2L, 3L), (7L, 0L, 7L), (5L, 5L, 5L))
    val got = rows.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        ZOrder.zValue(Seq(col("a"), col("b"), col("c")), bits = 3).as("z"))
      .as[(Long, Long, Long, Long)].collect()
    for ((a, b, c, z) <- got)
      assert(z == ZOrder.zValueRef(Seq(a, b, c), 3), s"($a, $b, $c)")
  }

  test("clusterByZ lets a second-dimension predicate prune files; a 1-D sort cannot") {
    // The property min/max file skipping rests on: under an x-sorted
    // layout every file's y-envelope spans the full domain (a y-predicate
    // prunes nothing), while Z-clustered files cover compact boxes in
    // BOTH dimensions. Measured on real written files' stats, not claims.
    val df = (0 until 4096).map { i =>
      (i.toLong, graft.ext.DualHash.base60(s"px:$i") % 1024L,
        graft.ext.DualHash.base60(s"py:$i") % 1024L)
    }.toDF("id", "x", "y")
    def envelopes(out: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_zorder_prune").toFile
      try {
        out.write.mode("overwrite").parquet(dir.getAbsolutePath)
        dir.listFiles().toSeq.filter(_.getName.endsWith(".parquet")).map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min("y"), max("y")).head()
          (r.getLong(0), r.getLong(1))
        }
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(dir)
      }
    }
    val sorted1d = envelopes(
      df.repartitionByRange(16, col("x")).sortWithinPartitions("x"))
    val zorder = envelopes(graft.ext.ZOrder.clusterByZ(
      df, Seq(col("x"), col("y")), bits = 10, numPartitions = Some(16)))
    assert(sorted1d.size >= 8 && zorder.size >= 8, "too few files written")
    // files a reader must open for point predicates y = y0
    def hits(env: Seq[(Long, Long)], y0: Long): Int =
      env.count { case (lo, hi) => lo <= y0 && y0 <= hi }
    val probes = Seq(100L, 400L, 700L, 1000L)
    val s = probes.map(hits(sorted1d, _)).sum
    val z = probes.map(hits(zorder, _)).sum
    info(s"files hit across ${probes.size} y-probes: x-sorted $s, z-ordered $z")
    assert(s >= sorted1d.size * probes.size * 9 / 10,
      s"x-sorted layout unexpectedly prunes on y ($s)")
    assert(z * 2 <= s, s"z-order should halve files hit: $z vs $s")
  }

  test("clusterByZ yields non-overlapping z ranges across partitions") {
    val df = (0 until 4096).map { i =>
      (i.toLong, graft.ext.DualHash.base60(s"zx:$i") % 1024L,
        graft.ext.DualHash.base60(s"zy:$i") % 1024L)
    }.toDF("id", "x", "y")
    val clustered = ZOrder.clusterByZ(df, Seq(col("x"), col("y")),
      bits = 10, numPartitions = Some(8))
    // recompute z per row alongside its partition id; ranges must not
    // overlap if the layout really is a range partition on the key
    val perPart = clustered
      .withColumn("z", ZOrder.zValue(Seq(col("x"), col("y")), bits = 10))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("pid")
      .as[(Int, Long, Long)].collect()
    assert(perPart.length > 1, "fixture landed in one partition")
    for (Array((_, _, hi1), (_, lo2, _)) <- perPart.sliding(2))
      assert(hi1 <= lo2, s"partition z ranges overlap: $hi1 > $lo2")
  }
}
