package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, sf001, "documents")
    .withColumn("payload", col("text").cast("binary"))

  test("feature extraction: dim rows per doc, normalized histogram sums to ~1") {
    val feats = Multimodal.extractFeatures(docs.limit(20), "doc_id", "payload", dim = 16)
    val byDoc = feats.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sum("feat_value").as("s"))
      .collect()
    assert(byDoc.length == 20)
    byDoc.foreach { r =>
      assert(r.getAs[Long]("n") == 16)
      assert(math.abs(r.getAs[Double]("s") - 1.0) < 1e-9)
    }
  }

  test("frame sampling: stride-4 indices, md5 matches whole-payload slices") {
    val frames = Multimodal.sampleFrames(docs.limit(5), "doc_id", "payload").collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 4 == 0))
    // cross-check one fingerprint against a direct computation
    val d0 = docs.limit(5).select("doc_id", "text").as[(Long, String)].collect().head
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest(d0._2.getBytes("UTF-8").take(256)).map("%02x".format(_)).mkString
    assert(frames.filter(f => f.doc_id == d0._1 && f.frame_idx == 0).head.frame_md5 == expect)
  }

  test("binary payload round-trips through parquet") {
    val dir = java.nio.file.Files.createTempDirectory("mm").toString + "/out"
    docs.select("doc_id", "payload").limit(10).write.parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("payload").dataType.typeName == "binary")
    assert(back.count() == 10)
  }
}
