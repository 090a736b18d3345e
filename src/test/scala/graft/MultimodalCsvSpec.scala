package graft

import graft.ops.Multimodal
import graft.sources.CsvSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class MultimodalCsvSpec extends SparkSpec {

  test("media table carries binary payload + typed metadata struct") {
    val df = Multimodal.mediaTable(spark, sfDir)
    assert(df.schema("payload").dataType == BinaryType)
    val meta = df.schema("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSeq == Seq("mime", "width", "height", "channels"))
    assert(df.count() == Tables.documents(spark, sfDir).count())
  }

  test("decodeFeatures is deterministic and byte-length-correct") {
    val a = Multimodal.decodeFeatures(spark, sfDir).orderBy("doc_id").collect()
    val b = Multimodal.decodeFeatures(spark, sfDir).orderBy("doc_id").collect()
    assert(a.map(_.getAs[Long]("checksum")).sameElements(b.map(_.getAs[Long]("checksum"))))
    a.take(20).foreach { r =>
      assert(r.getAs[Long]("n_bytes") > 0)
      val feat = r.getAs[scala.collection.Seq[Float]]("feature")
      assert(feat.length == 8)
      assert(math.abs(feat.sum - 1.0f) < 1e-3) // normalized histogram
    }
  }

  test("resize shrinks payload and metadata consistently") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val resized = Multimodal.resize(media, 4)
    val before = media.select(col("doc_id"), length(col("payload")).as("n"),
      col("meta.width").as("w")).collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    resized.select(col("doc_id"), length(col("payload")).as("n"),
      col("meta.width").as("w")).collect().foreach { r =>
      val (n0, w0) = before(r.getLong(0))
      assert(r.getInt(1) == (n0 + 3) / 4)
      assert(r.getInt(2) == w0 / 4)
    }
  }

  test("frame sample emits every 4th frame index") {
    val rows = Multimodal.frameSample(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("frame_idx") % 4 == 0))
  }

  test("manifest plan: contiguous non-overlapping ranges, every payload placed once") {
    val media = Multimodal.mediaTable(spark, sfDir)
    val nDocs = media.count()
    val rows = Multimodal.manifestPlan(spark, sfDir).collect()
    assert(rows.length.toLong == nDocs, "one manifest row per payload")
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length.toLong == nDocs)
    rows.foreach(r => assert(r.getAs[Long]("byte_len") > 0))
    // within each blob file: ranges tile the file with no gaps/overlap,
    // starting at 0 and filling to roughly the target before rolling over
    rows.groupBy(_.getAs[String]("uri")).foreach { case (uri, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("byte_start"))
      assert(sorted.head.getAs[Long]("byte_start") == 0L, s"$uri does not start at 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("byte_start") + a.getAs[Long]("byte_len") ==
            b.getAs[Long]("byte_start"), s"gap/overlap in $uri")
        case _ => ()
      }
    }
    // per-mime file sequence is dense from 0 (blob-0, blob-1, ...)
    rows.map(_.getAs[String]("uri")).distinct.groupBy(_.split("/blob-")(0))
      .foreach { case (mime, uris) =>
        val seqs = uris.map(_.split("/blob-")(1).toLong).sorted
        assert(seqs.head == 0L && seqs.last == seqs.length - 1L,
          s"$mime file sequence not dense: ${seqs.mkString(",")}")
      }
  }

  test("manifest plan: distributed prefix sum ≡ single global window (bucket widening)") {
    // bucketDocs larger than any doc_id → one bucket per mime, i.e. the
    // original single-window global running sum; the default multi-bucket
    // path must reconstruct it exactly
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("uri"),
        r.getAs[Long]("byte_start"), r.getAs[Long]("byte_len"))).sorted.toSeq
    val widened = canon(Multimodal.manifestPlan(spark, sfDir, bucketDocs = 32L))
    val global = canon(Multimodal.manifestPlan(spark, sfDir, bucketDocs = Long.MaxValue))
    assert(widened == global)
    // the widening must actually bite at this SF: >1 bucket per mime
    val nBuckets = Multimodal.mediaTable(spark, sfDir)
      .select(floor(col("doc_id") / 32L)).distinct().count()
    assert(nBuckets > 1, "test corpus too small to exercise multi-bucket prefix sum")
  }

  test("manifest plan pin: running sum windows by (mime, bucket), never mime alone") {
    val df = Multimodal.manifestPlan(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // row-level running sum partitioned by (mime, bucket), ordered by doc_id
    assert("windowspecdefinition\\(mime#\\d+, bucket#\\d+L?, doc_id#\\d+L? ASC".r
      .findFirstIn(plan).isDefined, plan.take(3000))
    // the unwidened shape — a doc-level window keyed by mime alone — must not return
    assert("windowspecdefinition\\(mime#\\d+, doc_id#\\d+L? ASC".r
      .findFirstIn(plan).isEmpty, plan.take(3000))
  }

  test("binaryFile source -> imageio decode end-to-end on real files") {
    import graft.ops.Multimodal
    def png(rgb: Int, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val dir = Files.createTempDirectory("graftbin")
    Files.write(dir.resolve("a.png"), png(0x000000, 5, 4))
    Files.write(dir.resolve("b.png"), png(0xffffff, 7, 3))
    val media = Multimodal.fromBinaryFiles(spark, dir.toString, "image/png")
    val out = Multimodal.decodeFeaturesDf(spark, media).collect()
      .sortBy(_.getAs[Double]("mean_intensity"))
    assert(out.length == 2)
    assert(out(0).getAs[Int]("width") == 5 && out(0).getAs[Int]("height") == 4)
    assert(out(1).getAs[Int]("width") == 7 && out(1).getAs[Int]("height") == 3)
    assert(out(0).getAs[Double]("mean_intensity") == 0.0)
    assert(out(1).getAs[Double]("mean_intensity") == 255.0)
    // ids are stable path hashes, distinct per file
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length == 2)
  }

  test("csv source: reference lexing (null tokens, booleans, ; delimiter)") {
    val dir = Files.createTempDirectory("graftcsv")
    val f = dir.resolve("t.csv")
    Files.writeString(f,
      """id;name;active;score
        |1;alice;t;9.5
        |2;;1;null
        |3;carol;FALSE;
        |4;dave;0;7.25
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("active", BooleanType), StructField("score", DoubleType)))
    val df = CsvSource.read(spark, f.toString, schema, delimiter = ";")
    val rows = df.orderBy("id").collect()
    assert(rows.length == 4)
    assert(rows(0).getBoolean(2) && rows(1).getBoolean(2))
    assert(!rows(2).getBoolean(2) && !rows(3).getBoolean(2))
    assert(rows(1).isNullAt(1)) // "" -> null
    assert(rows(1).isNullAt(3)) // "null" -> null
    assert(rows(2).isNullAt(3)) // trailing empty -> null
    assert(rows(3).getDouble(3) == 7.25)
  }

  test("decodeFeatures decodes REAL PNG payloads via javax.imageio") {
    import spark.implicits._
    import graft.ops.Multimodal
    def png(rgb: Int, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // metadata deliberately claims 0x0 — real decode must correct it
    val media = Seq(
      Multimodal.MediaRow(1L, Multimodal.MediaMeta("image/png", 0, 0, 3), png(0x000000, 8, 6)),
      Multimodal.MediaRow(2L, Multimodal.MediaMeta("image/png", 0, 0, 3), png(0xffffff, 8, 6)))
      .toDS().toDF()
    val out = Multimodal.decodeFeaturesDf(spark, media).collect()
      .sortBy(_.getAs[Long]("doc_id"))
    val (black, white) = (out(0), out(1))
    assert(black.getAs[Int]("width") == 8 && black.getAs[Int]("height") == 6)
    assert(white.getAs[Int]("width") == 8 && white.getAs[Int]("height") == 6)
    assert(math.abs(black.getAs[Double]("mean_intensity") - 0.0) < 1e-9)
    // white luminance = (255*299 + 255*587 + 255*114)/1000 = 255
    assert(math.abs(white.getAs[Double]("mean_intensity") - 255.0) < 1e-9)
    assert(math.abs(black.getAs[Seq[Float]]("feature").head - 1.0f) < 1e-6) // bin 0
    assert(math.abs(white.getAs[Seq[Float]]("feature").last - 1.0f) < 1e-6) // bin 7
  }
}
