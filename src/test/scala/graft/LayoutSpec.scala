package graft

import org.apache.spark.sql.functions._

/** Z-order layout: Morton key correctness against a reference
  * implementation, and a quantitative pruning gate — per-file min-max
  * spans must shrink in BOTH dimensions vs a one-key range layout. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 21) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("part1by1/zValue match a bit-by-bit reference interleave") {
    val max = (1L << 21) - 1
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (max, max),
      (12345L, 54321L), (max, 0L), (0L, max), (1048576L, 7L))
    val got = samples.toDF("a", "b")
      // min 0 / max 2^21-1 makes scale() the identity
      .select(Layout.zValue(col("a"), 0L, max, col("b"), 0L, max).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == samples.map { case (a, b) => mortonRef(a, b) })
  }

  test("zorder files bound both dimensions; one-key range layout does not") {
    val n = 20000
    val rnd = new scala.util.Random(7)
    val df = (1 to n).map(_ => (rnd.nextInt(100000).toLong,
      rnd.nextInt(100000).toLong, rnd.nextDouble())).toDF("ka", "kb", "v")
    val zdir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val rdir = java.nio.file.Files.createTempDirectory("graft_range").toString
    Layout.zorderWrite(df, "ka", "kb", zdir, nFiles = 16)
    df.repartitionByRange(16, col("ka")).sortWithinPartitions("ka")
      .write.mode("overwrite").parquet(rdir)

    // average per-file span of each dimension, normalized to the domain
    def spans(dir: String): (Double, Double) = {
      val per = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(((max("ka") - min("ka")) / 100000.0).as("sa"),
          ((max("kb") - min("kb")) / 100000.0).as("sb"))
        .agg(avg("sa"), avg("sb")).head()
      (per.getDouble(0), per.getDouble(1))
    }
    val (za, zb) = spans(zdir)
    val (ra, rb) = spans(rdir)
    // one-key layout: ka tightly bounded, kb unbounded (~full domain)
    assert(ra < 0.15 && rb > 0.9, s"range layout spans: ($ra, $rb)")
    // zorder: BOTH dimensions bounded — 16 files ~ 4x4 grid, so ~1/4
    // of the domain each (loose factor-2 margin)
    assert(za < 0.5 && zb < 0.5, s"zorder spans: ($za, $zb)")
    Streams.deleteRec(new java.io.File(zdir))
    Streams.deleteRec(new java.io.File(rdir))
  }

  test("compactFiles: target-sized file arithmetic, row count and digest preserved") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact_t")
    val o = Tables.orders(spark, sf)
    val n = o.count()
    o.repartition(10).write.mode("overwrite").parquet(s"$base/frag")
    val target = 400L
    val r = Layout.compactFiles(spark, s"$base/frag", s"$base/out", target).head()
    assert(r.getAs[Long]("files_before") == 10L)
    assert(r.getAs[Long]("files_after") == (n + target - 1) / target)
    assert(r.getAs[Long]("files_after") < r.getAs[Long]("files_before"))
    assert(r.getAs[Long]("rows_before") == n && r.getAs[Long]("rows_after") == n)
    assert(r.getAs[Long]("checksum_before") == r.getAs[Long]("checksum_after"))
    Streams.deleteRec(base.toFile)
  }
}
