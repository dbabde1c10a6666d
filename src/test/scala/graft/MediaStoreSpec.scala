package graft

import graft.queries.StreamMultimodalQueries

/** Perceptual hashes at rest (MediaStore): the registered perceptual
  * queries over the landed per-modality tables must produce EXACTLY the
  * decode-path results while planning NO decode at all — at 100 TB the
  * per-session decode is orders more expensive than the ~16 B/row it
  * produces, and this spec pins that the store path actually removes it
  * (result parity + object-boundary-free plans) and that the corpusDir
  * guard keeps a store from serving a different corpus. */
class MediaStoreSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"
  private val Prefix = "media_store_spec"
  // every registered consumer of the store, across all three modalities
  private val MediaQueries = Seq(
    "q117_image_phash_dedup", "q118_image_neardup",
    "q120_image_chunk_buckets", "q121_audio_fingerprint_dedup",
    "q123_audio_neardup", "q124_audio_chunk_buckets",
    "q125_video_neardup", "q126_video_frame_buckets",
    "q127_video_neardup_hamming")
  private val StoreTableOf = Map(
    "q117_image_phash_dedup" -> s"${Prefix}_imgx",
    "q118_image_neardup" -> s"${Prefix}_img",
    "q120_image_chunk_buckets" -> s"${Prefix}_img",
    "q121_audio_fingerprint_dedup" -> s"${Prefix}_audx",
    "q123_audio_neardup" -> s"${Prefix}_aud",
    "q124_audio_chunk_buckets" -> s"${Prefix}_aud",
    "q125_video_neardup" -> s"${Prefix}_vid",
    "q126_video_frame_buckets" -> s"${Prefix}_vid",
    "q127_video_neardup_hamming" -> s"${Prefix}_vidf")

  test("registered perceptual queries ride the store: identical results, no decode planned") {
    val tmp = graft.TempDirs.create("graft-mediastore")
    StreamMultimodalQueries.landMediaStore(spark, d, Prefix,
      buckets = 8, tmp.toString)
    try {
      // decode-path ground truth FIRST (conf unset), then the store path
      val want = MediaQueries
        .map(q => q -> SparkEntry.queries(q)(spark, d).collect().toSeq).toMap
      spark.conf.set("spark.graft.mediaStore", s"$d=$Prefix")
      try {
        MediaQueries.foreach { q =>
          val df = SparkEntry.queries(q)(spark, d)
          assert(df.collect().toSeq == want(q),
            s"$q over the store must equal the decode path")
          val p = df.queryExecution.executedPlan.toString
          // the decode path is a typed mapPartitions (DeserializeToObject
          // → MapPartitions → SerializeFromObject); the store path must
          // read the landed table and cross no object boundary at all
          assert(!p.contains("MapPartitions"),
            s"$q store path must plan no decode:\n${p.take(2000)}")
          assert(p.contains(StoreTableOf(q)),
            s"$q store path must scan ${StoreTableOf(q)}:\n${p.take(2000)}")
        }
      } finally spark.conf.unset("spark.graft.mediaStore")
    } finally {
      StreamMultimodalQueries.mediaStoreTables(Prefix)
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      graft.TempDirs.deleteRec(tmp.toString)
    }
  }

  test("the corpusDir guard: a store landed for another corpus is never consulted") {
    // tables may even exist under the prefix — the DIR mismatch alone
    // must force the decode path (a store silently serving a different
    // corpus than the query names is the failure mode the guard exists
    // for, same as DocStore/TermStore/VecStore)
    spark.conf.set("spark.graft.mediaStore", s"/not/this/corpus=$Prefix")
    try {
      val p = SparkEntry.queries("q118_image_neardup")(spark, d)
        .queryExecution.executedPlan.toString
      assert(p.contains("MapPartitions"),
        s"mismatched corpusDir must fall back to the decode path:\n${p.take(2000)}")
    } finally spark.conf.unset("spark.graft.mediaStore")
  }
}
