package graft

import org.apache.spark.sql.functions._
import graft.operators.{MediaRecord, Multimodal}

/** Gates for the multimodal decode (VERDICT r4 #2: real header parse).
  * The synthesized payloads are format-real PNG byte streams; the decode
  * paths must (a) agree bit-for-bit with each other and (b) correctly
  * parse a GENUINE PNG produced by an independent encoder (Java ImageIO
  * — real CRC, real zlib IDAT), proving the parser reads the public
  * format, not a private convention.
  */
class MultimodalSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = graft.queries.Tables.documents(spark, sf)

  test("payloads are signature-valid PNGs with IHDR dims matching the derivation") {
    val media = Multimodal.mediaTable(docs)
    val rows = Multimodal.metaExpressions(media)
      .join(docs.select(col("doc_id"), length(col("text")).as("n")), "doc_id")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Int]("n")
      assert(r.getAs[Int]("width") == 16 + n % 240)
      assert(r.getAs[Int]("height") == 16 + (n * 7) % 240)
      assert(r.getAs[Int]("channels") == (if (n % 2 == 0) 1 else 3))
      assert(r.getAs[Int]("n_bytes") > 33) // header + data section
    }
  }

  test("expression and mapPartitions decode paths agree bit-for-bit") {
    val media = Multimodal.mediaTable(docs)
    val a = Multimodal.metaExpressions(media).collect()
      .map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val b = Multimodal.decodePartitions(media).toDF().collect()
      .map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(a.toSeq == b.toSeq)
  }

  test("parser reads a genuine ImageIO-encoded PNG (independent encoder)") {
    val img = new java.awt.image.BufferedImage(
      37, 21, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(3, 5, 0xCAFE42)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", baos))
    val realPng = baos.toByteArray

    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, realPng, 0, "image"))),
      org.apache.spark.sql.Encoders.product[MediaRecord].schema)
    val viaExpr = Multimodal.metaExpressions(media).collect().head
    assert(viaExpr.getAs[Int]("width") == 37)
    assert(viaExpr.getAs[Int]("height") == 21)
    assert(viaExpr.getAs[Int]("channels") == 3) // TYPE_INT_RGB → color type 2
    val viaPartitions = Multimodal.decodePartitions(media).collect().head
    assert(viaPartitions.width.contains(37) && viaPartitions.height.contains(21)
      && viaPartitions.channels.contains(3))
  }

  test("non-PNG payload yields NULL dims, not garbage") {
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(7L, "definitely not a png".getBytes("UTF-8"), 0, "text"))),
      org.apache.spark.sql.Encoders.product[MediaRecord].schema)
    val r = Multimodal.metaExpressions(media).collect().head
    assert(r.isNullAt(r.fieldIndex("width")) &&
      r.isNullAt(r.fieldIndex("height")) && r.isNullAt(r.fieldIndex("channels")))
    val p = Multimodal.decodePartitions(media).collect().head
    assert(p.width.isEmpty && p.height.isEmpty && p.channels.isEmpty)
  }

  test("TRUNCATED signature-valid payload: NULL dims on BOTH paths") {
    // 8-byte PNG signature + 12 bytes — a torn file; the expression path
    // must not parse garbage ints from the short header (review r5)
    val torn = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte) ++ Array.fill[Byte](12)(1)
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(8L, torn, 0, "image"))),
      org.apache.spark.sql.Encoders.product[MediaRecord].schema)
    val r = Multimodal.metaExpressions(media).collect().head
    assert(r.isNullAt(r.fieldIndex("width")) &&
      r.isNullAt(r.fieldIndex("height")) && r.isNullAt(r.fieldIndex("channels")))
    val p = Multimodal.decodePartitions(media).collect().head
    assert(p.width.isEmpty && p.height.isEmpty && p.channels.isEmpty)
  }
}
