package graft.engine

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables.t

/** Z-order layout: file-level min/max skipping on BOTH clustered columns.
  *
  * The comparison is footer-equivalent: per output file, the min/max of
  * each dimension (what parquet row-group/file stats give a reader),
  * then the candidate-file count for a small 2-D box predicate. The
  * single-column sort must answer box predicates on the other column by
  * touching ~every file; the z-layout bounds both dims per file.
  */
class ZOrderSpec extends SparkSpec {

  private def fileSpans(dir: String, a: String, b: String) = {
    import spark.implicits._
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(a)).as("a_lo"), max(col(a)).as("a_hi"),
        min(col(b)).as("b_lo"), max(col(b)).as("b_hi"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
  }

  test("zOrderWrite: box predicates prune files on both dimensions") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_zorder").toString
    val df = t(spark, sf("sf0.01"), "lineitem")
      .select($"l_partkey", $"l_suppkey", $"l_quantity")
    val nFiles = 16

    Layout.zOrderWrite(df, "l_partkey", "l_suppkey", s"$root/z", nFiles)
    df.sort($"l_partkey").repartitionByRange(nFiles, $"l_partkey")
      .sortWithinPartitions($"l_partkey")
      .write.parquet(s"$root/linear")

    // row multiset is preserved by the rewrite
    val zDf = spark.read.parquet(s"$root/z")
    assert(zDf.count() == df.count())
    assert(zDf.agg(sum($"l_partkey"), sum($"l_suppkey")).head() ==
      df.agg(sum($"l_partkey"), sum($"l_suppkey")).head())

    val zSpans = fileSpans(s"$root/z", "l_partkey", "l_suppkey")
    val lSpans = fileSpans(s"$root/linear", "l_partkey", "l_suppkey")
    assert(zSpans.length > 4 && lSpans.length > 4, "need real file counts")

    // z-order's value is pruning on EACH dimension alone: a sort on A
    // answers A-slices perfectly but B-slices by touching every file;
    // the z-layout bounds both dims per file, so a narrow slice on
    // EITHER column skips most files. Probe a centered ~1/8-wide slice
    // of each dimension independently.
    val (aLo, aHi) = (df.agg(min($"l_partkey")).head().getLong(0),
      df.agg(max($"l_partkey")).head().getLong(0))
    val (bLo, bHi) = (df.agg(min($"l_suppkey")).head().getLong(0),
      df.agg(max($"l_suppkey")).head().getLong(0))
    def slice(lo: Long, hi: Long): (Long, Long) = {
      val w = hi - lo
      (lo + w / 2 - w / 16, lo + w / 2 + w / 16)
    }
    val (qaLo, qaHi) = slice(aLo, aHi)
    val (qbLo, qbHi) = slice(bLo, bHi)
    def candA(spans: Array[(Long, Long, Long, Long)]): Int =
      spans.count { case (alo, ahi, _, _) => ahi >= qaLo && alo <= qaHi }
    def candB(spans: Array[(Long, Long, Long, Long)]): Int =
      spans.count { case (_, _, blo, bhi) => bhi >= qbLo && blo <= qbHi }

    // B-slice: the A-sorted layout cannot prune (every file spans ~all
    // of B); z-order must skip about half the files — a 1/8 slice hits
    // at most 2 of the 4 tile columns (ceil accounts for a fused
    // near-empty tile making the file count odd)
    assert(candB(lSpans) >= lSpans.length - 1,
      s"linear layout unexpectedly prunes B: ${candB(lSpans)}/${lSpans.length}")
    assert(candB(zSpans) <= (zSpans.length + 1) / 2,
      s"z-order kept ${candB(zSpans)}/${zSpans.length} files for a 1/8 B-slice")
    // A-slice: z-order still prunes most files (it trades perfect
    // A-pruning for good pruning on both dims)
    assert(candA(zSpans) <= (zSpans.length + 1) / 2,
      s"z-order kept ${candA(zSpans)}/${zSpans.length} files for a 1/8 A-slice")

    // and the zkey itself is a correct Morton interleave (bit-exact)
    val checked = spark.range(256)
      .select($"id".cast("int").as("a"), (lit(255) - $"id").cast("int").as("b"))
      .select($"a", $"b", Layout.zKey($"a", $"b").as("z")).collect()
    checked.foreach { r =>
      val (a, b, z) = (r.getInt(0), r.getInt(1), r.getInt(2))
      val expected = (0 until 8).map { i =>
        (((a >> i) & 1) << (2 * i + 1)) | (((b >> i) & 1) << (2 * i))
      }.sum
      assert(z == expected, s"zKey($a, $b) = $z, expected $expected")
    }

    // conf isolation: the dense-sampling override zOrderWrite needs must
    // never leak into the caller's session (it runs on a cloned one)
    assert(spark.conf.get(
      "spark.sql.execution.rangeExchange.sampleSizePerPartition") != "5000",
      "zOrderWrite leaked its range-sampling override into the session")
    // and no temp view is left behind
    assert(!spark.catalog.listTables("global_temp").collect()
      .exists(_.name.startsWith("graft_zorder_")))
  }

  test("zKey rejects inputs outside [0, 255] loudly") {
    import spark.implicits._
    val bad = spark.range(1).select(lit(256).as("a"), lit(0).as("b"))
    val e = intercept[Exception] {
      bad.select(Layout.zKey($"a", $"b")).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("zKey"),
      s"expected a zKey domain error, got: ${e.getMessage}")
    // negative inputs fail too
    intercept[Exception] {
      spark.range(1).select(Layout.zKey(lit(-1), lit(0))).collect()
    }
  }
}
