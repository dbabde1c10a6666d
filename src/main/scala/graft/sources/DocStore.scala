package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{NormalizeExpr, TextFns}

/** Content-fingerprinted document storage — the at-rest layout for the
  * dedup family at 100 TB, the text twin of [[graft.argo.AtlasStore]].
  *
  * Exact dedup, dedup-group assignment and decontamination all key on a
  * normalized content fingerprint (the hash-groupBy the q30/q37 oracles
  * verify). From a plain store, every run of every such pass re-shuffles
  * the whole corpus on that key — and in a training-data pipeline these
  * passes run per ingest batch. Landing documents bucketed (and sorted)
  * by the fingerprint makes the dedup groupBy a co-located scan-side
  * aggregation (zero exchange), and a fingerprint equi-join between two
  * stores with the SAME bucket count (training corpus × eval benchmark)
  * co-locates both sides. The fingerprint is the same native rolling-hash
  * expression q37 hash-checks against the DuckDB oracle, so the stored
  * key is verified semantics, not a parallel implementation.
  */
object DocStore {
  /** documents + `fp` content fingerprint — built by
    * [[TextFns.contentFingerprint]], the same expression q37 verifies,
    * over NFC-NORMALIZED text (q131's operator, [[NormalizeExpr]]): real
    * ingest sources mix Unicode forms (web crawls compose, macOS-origin
    * content decomposes), and a byte-level landing key would split
    * documents that render identically. `spark.graft.docStore.nfc=false`
    * opts a landing out (e.g. to match a legacy store's raw keys); the
    * default is on for new landings. Identity on all-ASCII text — the
    * codegen'd isNormalized fast path — so composed-form corpora land
    * byte-identical keys either way. */
  def fingerprint(docs: DataFrame): DataFrame = {
    val nfcOn = docs.sparkSession.conf
      .get("spark.graft.docStore.nfc", "true").toBoolean
    val t = if (nfcOn) NormalizeExpr.nfcNormalize(col("text")) else col("text")
    docs.drop("fp").withColumn("fp", TextFns.contentFingerprint(t))
  }

  /** Land `docs` as a parquet table bucketed and sorted on the
    * fingerprint. `buckets` sizes the parallelism of every later dedup
    * pass reading this store — pick ~2-4× the cluster's cores at the
    * target scale. */
  def saveBucketed(docs: DataFrame, table: String, buckets: Int,
                   path: Option[String] = None): Unit =
    Stores.landBucketed(fingerprint(docs), table, buckets, Seq("fp"), path)

  /** Per-ingest increment: fingerprint the BATCH only and append it into
    * the existing store — O(batch) work per sync, the corpus never
    * re-fingerprinted. `buckets` must match the landing. */
  def appendBatch(docsBatch: DataFrame, table: String, buckets: Int): Unit =
    Stores.appendBucketed(fingerprint(docsBatch), table, buckets, Seq("fp"))

  def loadBucketed(s: SparkSession, table: String): DataFrame = s.table(table)
}
