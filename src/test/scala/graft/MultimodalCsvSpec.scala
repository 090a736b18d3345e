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
    rows.foreach(r => assert(r.getAs[Int]("frame_idx") % 4 == 0))
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
}
