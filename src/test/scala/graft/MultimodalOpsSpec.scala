package graft

import java.security.MessageDigest

import graft.multimodal._

class MultimodalOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def assets = Seq(
    RawAsset(1L, "image/fake", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)),
    RawAsset(2L, "image/fake", "hello world".getBytes("UTF-8")),
    RawAsset(3L, "video/fake", Array.tabulate(1000)(_.toByte))
  ).toDS()

  test("decodeFeatures emits deterministic md5-derived pseudo-headers") {
    val out = MultimodalOps.decodeFeatures(assets).collect().map(f => f.asset_id -> f).toMap
    assert(out.size === 3)
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest("hello world".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 7), 16)
    val f2 = out(2L)
    assert(f2.feature_hash === h)
    assert(f2.n_bytes === 11)
    assert(f2.width === 16 + (h % 1024).toInt)
    assert(f2.height === 16 + ((h / 1024) % 1024).toInt)
    assert((1 to 4).contains(f2.channels))
    // stable across runs
    assert(MultimodalOps.decodeFeatures(assets).collect().toSet ===
      MultimodalOps.decodeFeatures(assets).collect().toSet)
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

  test("decode is a narrow transform: no shuffle, partition count preserved") {
    val ds = MultimodalOps.documentsAsAssets(Tables.documents(spark, sfDir)).as[RawAsset]
    val decoded = MultimodalOps.decodeFeatures(ds)
    assert(!decoded.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(decoded.rdd.getNumPartitions === ds.rdd.getNumPartitions)
  }

  test("documentsAsAssets payload is the exact UTF-8 bytes of the text") {
    val row = MultimodalOps.documentsAsAssets(Tables.documents(spark, sfDir))
      .limit(1).collect().head
    val doc = Tables.documents(spark, sfDir).limit(1).collect().head
    assert(row.getAs[Array[Byte]]("bytes").toSeq ===
      doc.getAs[String]("text").getBytes("UTF-8").toSeq)
  }
}
