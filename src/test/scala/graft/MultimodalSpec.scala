package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{MediaRecord, MultimodalOps}

class MultimodalSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def rec(id: Long, payload: String) =
    MediaRecord(id, "image", payload.getBytes("UTF-8"), Map("w" -> "64"))

  test("decode stub is deterministic and batch shape preserves all records") {
    val ds = spark.createDataset(Seq(rec(1, "aaa"), rec(2, "bbb"), rec(3, "aaa")))
    val out = MultimodalOps.decodeAndFeaturize(ds, batchSize = 2).collect().sortBy(_.id)
    assert(out.length == 3)
    assert(out(0).sha256 == out(2).sha256)                    // same payload → same hash
    assert(out(0).features.toSeq == out(2).features.toSeq)    // deterministic features
    assert(out(0).sha256 != out(1).sha256)
    assert(out.forall(_.features.length == MultimodalOps.FakeDecoder.Dim))
    assert(out(0).n_bytes == 3)
  }

  test("frame sampling takes fixed-size chunks at the given stride") {
    val ds = spark.createDataset(Seq(rec(1, "0123456789")))
    val frames = MultimodalOps.sampleFrames(ds, frameBytes = 3, stride = 4).collect().sortBy(_._2)
    // chunks: 0123|4567|89 → last chunk shorter than frameBytes is dropped
    assert(frames.map(f => new String(f._3)).toSeq == Seq("012", "456"))
  }

  test("documents lift into MediaRecords with utf8 payloads") {
    val dir = fixtureDir("documents" -> Seq(DocRow(7, "hello world", "en", "s0", 11)).toDF)
    val m = MultimodalOps.documentsAsMedia(spark, dir).collect()(0)
    assert(m.id == 7 && new String(m.payload) == "hello world" && m.meta("lang") == "en")
  }
}
