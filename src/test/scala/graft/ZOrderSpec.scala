package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("zValue interleaves bits (known values)") {
    // x = 0b11, y = 0b01 at bits=2 → z bits: x0@0, y0@1, x1@2, y1@3
    //   = 1 + 2 + 4 + 0 = 7
    val out = Seq((3L, 1L)).toDF("x", "y")
      .select(ZOrder.zValue(Seq(col("x"), col("y")), 2).as("z"))
      .as[Long].head()
    assert(out === 7L)
    // identity on a single column
    val one = Seq(13L).toDF("x")
      .select(ZOrder.zValue(Seq(col("x")), 4).as("z")).as[Long].head()
    assert(one === 13L)
  }

  test("zValue rejects layouts that overflow a long") {
    intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq(col("x"), col("y")), 32)
    }
  }

  test("z-order layout skips files on the SECOND dimension; linear cannot") {
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey", "l_quantity")
    val base = Files.createTempDirectory("graft_zorder").toString
    val zPath = s"$base/z"
    val linPath = s"$base/lin"
    val nFiles = 16

    ZOrder.writeZOrdered(li, Seq("l_orderkey", "l_partkey"), zPath, nFiles)
    // the comparison layout: sorted by the leading column only
    li.repartitionByRange(nFiles, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(linPath)

    // a ~12.5%-wide predicate on the SECOND clustering column
    val maxPk = li.agg(max("l_partkey")).as[Long].head()
    val (lo, hi) = (0L, maxPk / 8)
    val (zTouched, zTotal) =
      ZOrder.overlapCount(spark.read.parquet(zPath), "l_partkey", lo, hi)
    val (linTouched, linTotal) =
      ZOrder.overlapCount(spark.read.parquet(linPath), "l_partkey", lo, hi)

    assert(zTotal === nFiles && linTotal === nFiles)
    // linear-by-orderkey files all span ~the full partkey range
    assert(linTouched >= nFiles - 1,
      s"linear layout unexpectedly skipped: $linTouched/$linTotal")
    // z-order confines the predicate to a minority of files
    assert(zTouched <= nFiles / 2,
      s"z-order skipped too little: $zTouched/$zTotal")
    // and the layout loses no rows
    assert(spark.read.parquet(zPath).count() === li.count())
    assert(spark.read.parquet(zPath).columns.sorted
      === Array("l_orderkey", "l_partkey", "l_quantity"))
  }
}
