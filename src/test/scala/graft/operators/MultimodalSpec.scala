package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mediaDf(rows: (Long, Array[Byte])*) =
    rows.toSeq.toDF("media_id", "content")

  test("decode stub parses dimensions from the fake header") {
    val df = mediaDf(
      1L -> Multimodal.fakeImageBytes(640, 480, "xyz".getBytes),
      2L -> "not an image".getBytes)
    val out = Multimodal.decodeImages(df).collect()
      .map(d => d.mediaId -> ((d.width, d.height))).toMap
    assert(out(1L) == (640, 480))
    assert(out(2L) == (-1, -1)) // undecodable marked, not dropped
  }

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  test("real PNG bytes decode to true dimensions via ImageIO") {
    val df = mediaDf(1L -> pngBytes(17, 9), 2L -> pngBytes(3, 300))
    val out = Multimodal.decodeImages(df).collect()
      .map(d => d.mediaId -> ((d.width, d.height))).toMap
    assert(out(1L) == (17, 9))
    assert(out(2L) == (3, 300))
  }

  test("real PNG resize re-encodes a scaled bitmap") {
    val resized = Multimodal.resizeImage(pngBytes(64, 48), 16, 12)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized))
    assert(img.getWidth == 16 && img.getHeight == 12)
  }

  test("byte histogram features are L1-normalized with stable schema") {
    val df = mediaDf(1L -> Array.tabulate[Byte](256)(_.toByte))
    val row = Multimodal.byteHistogramFeatures(df).head()
    val feats = row.getSeq[Float](1)
    assert(feats.length == 16)
    assert(math.abs(feats.sum - 1.0f) < 1e-5) // uniform bytes → 1/16 each
    assert(feats.forall(f => math.abs(f - 1f / 16) < 1e-5))
    // schema matches the embeddings table convention
    val schema = Multimodal.byteHistogramFeatures(df).schema
    assert(schema("features").dataType.simpleString == "array<float>")
  }

  test("resize stub rewrites header and bounds payload") {
    val resized = Multimodal.resizeImage(
      Multimodal.fakeImageBytes(640, 480, ("p" * 100).getBytes), 4, 5)
    val s = new String(resized, "UTF-8").split("\\|", 4)
    assert(s(1) == "4" && s(2) == "5")
    assert(s(3).length == 20) // w*h payload bound
  }

  test("frame sampling keeps every Nth chunk with ordinals") {
    val df = mediaDf(7L -> (0 until 32).map(_.toByte).toArray)
    val frames = Multimodal.sampleFrames(df, frameBytes = 8, everyN = 2)
      .orderBy("frame_ordinal").collect()
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 2))
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length == 8))
  }

  test("null content yields defined rows, not executor NPEs") {
    val df = mediaDf(1L -> null, 2L -> "abcdefgh".getBytes)
    val hist = Multimodal.byteHistogramFeatures(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(hist(1L).forall(_ == 0f)) // zero histogram, row present
    assert(hist(2L).sum > 0f)
    val frames = Multimodal.sampleFrames(df)
    assert(frames.filter(col("media_id") === 1L).count() == 0) // no frames
    assert(frames.filter(col("media_id") === 2L).count() > 0)
  }
}
