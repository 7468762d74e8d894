package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeAssets is deterministic and batch-shaped (stub decoder)") {
    val docs = Seq((1L, "hello world"), (2L, "other payload")).toDF("doc_id", "text")
    val decoded = Multimodal.decodeAssets(Multimodal.asAsset(docs, "text", "text/plain"), "asset")
    val rows = decoded.orderBy("doc_id").collect()
    assert(rows.length == 2)
    val r = rows(0)
    assert(r.getAs[Int]("width") >= 1 && r.getAs[Int]("width") <= 1024)
    assert(r.getAs[Int]("height") >= 1 && r.getAs[Int]("height") <= 640)
    // determinism: same input → same features
    val again = Multimodal.decodeAssets(Multimodal.asAsset(docs, "text", "text/plain"), "asset")
      .orderBy("doc_id").collect()(0)
    assert(r.getAs[Double]("f0") == again.getAs[Double]("f0"))
  }

  test("pluggable decoder replaces the stub") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val fixed = new Multimodal.AssetDecoder {
      def decode(bytes: Array[Byte]): Multimodal.DecodedAsset =
        Multimodal.DecodedAsset(10, 20, 30L, Array(0.5, 0.5, 0.5, 0.5))
    }
    val got = Multimodal.decodeAssets(
      Multimodal.asAsset(docs, "text", "image/png"), "asset", fixed).collect()(0)
    assert(got.getAs[Int]("width") == 10 && got.getAs[Long]("duration_ms") == 30L)
  }

  test("sampleFrames explodes metadata without touching bytes; resizeMeta keeps aspect") {
    val df = Seq((1L, 100, 50, 100L)).toDF("id", "width", "height", "duration_ms")
    val frames = Multimodal.sampleFrames(df, "duration_ms", 40L)
      .select("frame_ms").as[Long].collect().toSeq
    assert(frames == Seq(0L, 40L, 80L))
    val resized = Multimodal.resizeMeta(df, 50).select("resized_width", "resized_height").collect()(0)
    assert(resized.getInt(0) == 50 && resized.getInt(1) == 25)
  }

  test("metadata-only projection prunes the binary column from the scan") {
    val docs = Seq((1L, "payload")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_mm").toString
    Multimodal.asAsset(docs, "text", "text/plain").write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir).select("doc_id", "mime")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.split("ReadSchema")(1).split("\n")(0).contains("asset"),
      "binary column must be pruned from ReadSchema:\n" + plan)
  }

  test("decodeAssets: a NULL asset yields NULL metadata, not an NPE inside the partition map") {
    import spark.implicits._
    val docs = Seq((1L, "real payload"), (2L, null: String)).toDF("doc_id", "text")
    val decoded = Multimodal.decodeAssets(
      Multimodal.asAsset(docs, "text", "text/plain"), "asset")
    val rows = decoded.orderBy("doc_id").select("doc_id", "width", "f0").collect()
    assert(!rows(0).isNullAt(1) && !rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }
}
