package graft

import graft.multimodal._

class MultimodalOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def assets = Seq(
    RawAsset(1L, "image/fake", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)),
    RawAsset(2L, "image/fake", "hello world".getBytes("UTF-8")),
    RawAsset(3L, "video/fake", Array.tabulate(1000)(_.toByte))
  ).toDS()

  test("synthesized assets are REAL PNGs (magic bytes + ImageIO parse)") {
    val docs = Seq((0L, "x"), (5L, "y"), (300L, "z")).toDF("doc_id", "text")
    val rows = MultimodalOps.syntheticPngAssets(docs).collect()
    assert(rows.length === 3)
    rows.foreach { a =>
      val b = a.bytes
      // PNG signature: 89 50 4E 47 0D 0A 1A 0A
      assert((b(0) & 0xff) === 0x89 && b(1) === 'P' && b(2) === 'N' && b(3) === 'G',
        s"asset ${a.asset_id} lacks the PNG signature")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      assert(img != null, s"asset ${a.asset_id} is not ImageIO-decodable")
      assert(img.getWidth === 16 + (a.asset_id % 16).toInt)
      assert(img.getHeight === 16 + ((a.asset_id / 16) % 16).toInt)
    }
  }

  test("decodeImageFeatures recovers the synthesis closed form from decoded pixels") {
    val docs = Seq((0L, ""), (7L, ""), (123L, ""), (4095L, "")).toDF("doc_id", "text")
    val feats = MultimodalOps.decodeImageFeatures(
      MultimodalOps.syntheticPngAssets(docs)).collect().map(f => f.asset_id -> f).toMap
    assert(feats.size === 4)
    Seq(0L, 7L, 123L, 4095L).foreach { id =>
      val w = 16 + (id % 16).toInt
      val h = 16 + ((id / 16) % 16).toInt
      var expect = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val base = x * 7L + y * 13L + id
        expect += base % 256 + (base + 85) % 256 + (base + 170) % 256
      }
      val f = feats(id)
      assert(f.width === w && f.height === h && f.channels === 3)
      assert(f.pixel_sum === expect,
        s"id=$id: decoded pixel sum ${f.pixel_sum} != closed form $expect")
      assert(f.mean_milli === expect * 1000L / (w.toLong * h * 3))
    }
  }

  test("decodeImageFeatures fails loudly on undecodable bytes, not silently") {
    val junk = Seq(RawAsset(9L, "image/fake", Array[Byte](1, 2, 3))).toDS()
    intercept[Exception] {
      MultimodalOps.decodeImageFeatures(junk).collect()
    }
  }

  test("sampleFrames fans out 1..8 evenly-strided frames per asset") {
    val frames = MultimodalOps.sampleFrames(assets).collect().groupBy(_.asset_id)
    frames.foreach { case (_, fs) =>
      assert(fs.length >= 1 && fs.length <= 8)
      assert(fs.map(_.frame_idx).sorted.toSeq === (0 until fs.length))
      val stride = if (fs.length > 1) fs.sortBy(_.frame_idx).apply(1).byte_offset else 0
      fs.foreach(f => assert(f.byte_offset === f.frame_idx * stride || fs.length == 1))
    }
  }

  test("encode+decode is a narrow transform: no shuffle, partition count preserved") {
    val docs = Tables.documents(spark, sfDir)
    val decoded = MultimodalOps.decodeImageFeatures(
      MultimodalOps.syntheticPngAssets(docs))
    assert(!decoded.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(decoded.rdd.getNumPartitions ===
      MultimodalOps.syntheticPngAssets(docs).rdd.getNumPartitions)
  }

  test("documentsAsAssets payload is the exact UTF-8 bytes of the text") {
    val row = MultimodalOps.documentsAsAssets(Tables.documents(spark, sfDir))
      .limit(1).collect().head
    val doc = Tables.documents(spark, sfDir).limit(1).collect().head
    assert(row.getAs[Array[Byte]]("bytes").toSeq ===
      doc.getAs[String]("text").getBytes("UTF-8").toSeq)
  }
}
