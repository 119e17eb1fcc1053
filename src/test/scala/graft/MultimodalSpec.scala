package graft

/** Typed multimodal decode plumbing: the mapPartitions pipeline runs
  * end-to-end with a deterministic stubbed decoder. */
class MultimodalSpec extends SparkSpecBase {

  test("decode pipeline produces one feature row per record, deterministically") {
    val recs = multimodal.Multimodal.mediaRecords(spark, sf)
    val feats = multimodal.Multimodal.decodeAll(recs).collect()
    assert(feats.length == 500)
    feats.foreach { f =>
      assert(f.byte_len > 0)
      assert(f.mean_level > 0 && f.mean_level < 255, s"mean_level ${f.mean_level}")
      assert(f.n_frames == f.byte_len / 100 + 1)
    }
    val again = multimodal.Multimodal.decodeAll(recs).collect()
    assert(feats.map(f => f.doc_id -> f.mean_level).toMap ==
      again.map(f => f.doc_id -> f.mean_level).toMap)
  }

  test("frame sampling emits ceil(len/stride) frames whose levels are the payload bytes") {
    val recs = multimodal.Multimodal.mediaRecords(spark, sf)
    val byDoc = multimodal.Multimodal.frameFeatures(recs).collect().groupBy(_.doc_id)
    val raw = recs.collect().map(r => r.doc_id -> r.payload).toMap
    assert(byDoc.keySet == raw.keySet)
    byDoc.foreach { case (id, frames) =>
      val payload = raw(id)
      assert(frames.length == (payload.length + 99) / 100)
      frames.foreach { f =>
        assert(f.offset == f.frame_idx * 100)
        assert(f.level == (payload(f.offset) & 0xff).toDouble)
      }
    }
  }

  test("payload metadata matches the typed records") {
    val meta = multimodal.Multimodal.multimodalMeta(spark, sf)
      .select("doc_id", "byte_len").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recs = multimodal.Multimodal.mediaRecords(spark, sf).collect()
    recs.foreach(r => assert(meta(r.doc_id) == r.payload.length.toLong))
  }

  test("binaryFile ingestion feeds the typed decode pipeline end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toFile
    try {
      java.nio.file.Files.write(new java.io.File(dir, "a.img").toPath,
        Array.tabulate[Byte](250)(i => (i % 128).toByte))
      java.nio.file.Files.write(new java.io.File(dir, "b.img").toPath,
        Array[Byte](10, 20, 30))
      java.nio.file.Files.writeString(new java.io.File(dir, "skip.txt").toPath, "no")
      val recs = multimodal.Multimodal.mediaRecordsFromFiles(spark, dir.getPath, "*.img")
      val feats = multimodal.Multimodal.decodeAll(recs).collect()
      assert(feats.length == 2, "glob must keep only the .img payloads")
      val byLen = feats.map(f => f.byte_len -> f).toMap
      assert(byLen(3).mean_level == 20.0)
      assert(byLen(250).n_frames == 3) // 250 bytes at stride 100
      assert(recs.collect().forall(_.fmt == "img"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }
}
