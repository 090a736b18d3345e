package graft

import graft.ops.Layout

class LayoutSpec extends SparkSpec {

  test("zorder plan: conservation, tile ranges, and 8x8 block locality per file") {
    val total = Tables.orders(spark, sfDir).count()
    val files = Layout.zorderPlan(spark, sfDir).collect()
    assert(files.nonEmpty && files.length <= 64)
    assert(files.map(_.getAs[Long]("n_rows")).sum == total)
    files.foreach { f =>
      Seq("min_ctile", "max_ctile", "min_dtile", "max_dtile").foreach { c =>
        val v = f.getAs[Long](c)
        assert(v >= 0 && v < Layout.ZTiles, s"$c=$v out of grid")
      }
      // file_id keeps the top 3 interleaved bits of EACH dimension, so a
      // file covers exactly one 8x8 block of the 64x64 grid — this is the
      // locality a single-dimension sort cannot give (its secondary
      // dimension spreads across the full 64-tile range)
      assert(f.getAs[Long]("max_ctile") - f.getAs[Long]("min_ctile") < 8, f.toString)
      assert(f.getAs[Long]("max_dtile") - f.getAs[Long]("min_dtile") < 8, f.toString)
      // and the block is the one the file_id encodes
      val fid = f.getAs[Long]("file_id")
      val cBlock = ((fid >> 5) & 1) << 2 | ((fid >> 3) & 1) << 1 | ((fid >> 1) & 1)
      val dBlock = ((fid >> 4) & 1) << 2 | ((fid >> 2) & 1) << 1 | (fid & 1)
      assert(f.getAs[Long]("min_ctile") / 8 == cBlock, f.toString)
      assert(f.getAs[Long]("min_dtile") / 8 == dBlock, f.toString)
    }
    // a point predicate on either dimension prunes to at most 8 of the
    // up-to-64 files (one block row/column of the grid)
    val byCBlock = files.groupBy(_.getAs[Long]("min_ctile") / 8)
    assert(byCBlock.values.forall(_.length <= 8))
  }
}
