package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Z-order layout: locality of the curve and the file-skipping payoff. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleaveBits is the Morton curve") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L), (3L, 5L))
      .toDF("x", "y")
      .select(ZOrder.interleaveBits(Seq(col("x"), col("y")), bits = 3))
      .collect().map(_.getLong(0)).toSeq
    // interleave(x,y): bit i of x -> bit 2i, bit i of y -> bit 2i+1
    assert(got == Seq(0L, 1L, 2L, 3L, 12L, 0x27L))
  }

  test("z-ordered files have tight per-file bounding boxes in BOTH dims") {
    // 64x64 uniform grid, written two ways: z-ordered vs round-robin
    val grid = for (x <- 0 until 64; y <- 0 until 64) yield (x, y)
    val df = grid.toDF("x", "y")
    val zDir = java.nio.file.Files.createTempDirectory("zord").toString + "/z"
    val rrDir = java.nio.file.Files.createTempDirectory("zord").toString + "/rr"
    ZOrder.writeZOrdered(df, zDir, Seq("x", "y"), numFiles = 16, bits = 6)
    df.repartition(16).write.mode("overwrite").parquet(rrDir)

    def avgBoxArea(dir: String): Double = {
      val boxes = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg((max("x") - min("x") + 1).as("dx"), (max("y") - min("y") + 1).as("dy"))
        .select((col("dx") * col("dy")).cast("double"))
        .collect().map(_.getDouble(0))
      boxes.sum / boxes.length
    }
    val zArea = avgBoxArea(zDir)
    val rrArea = avgBoxArea(rrDir)
    // domain area 4096; 16 Morton blocks cover ~256 each; round-robin files
    // span essentially the whole domain
    assert(zArea <= 4096.0 / 8, s"z-ordered files not local: avg box $zArea")
    assert(zArea * 4 < rrArea,
      s"z-order ($zArea) should beat round-robin ($rrArea) by >4x")

    // the payoff: a small box predicate overlaps few z-files, all rr-files
    def filesTouched(dir: String): Long =
      spark.read.parquet(dir)
        .filter(col("x").between(8, 15) && col("y").between(8, 15))
        .select(input_file_name()).distinct().count()
    assert(filesTouched(zDir) <= 4,
      s"box query touched ${filesTouched(zDir)} z-ordered files")
    assert(filesTouched(rrDir) >= 12,
      "round-robin control should spread the box across most files")
  }
}
