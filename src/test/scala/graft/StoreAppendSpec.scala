package graft

import org.apache.spark.sql.functions._

import graft.sources.{BandStore, DocStore}

/** Incremental store maintenance: appending an ingest batch into an
  * existing bucketed store must (a) produce a table CONTENT-identical to
  * re-landing the full corpus, (b) keep the consumers' results identical
  * to the cold path, and (c) preserve the exchange-free bucketed plans —
  * each append adds a file set per bucket, which may cost a sort but
  * never a shuffle. This is the merge-not-rescan discipline (q115/q116)
  * applied to the stores themselves: a 100 TB sync writes O(batch). */
class StoreAppendSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$d/documents.parquet")
  // the q110/q128 ingest split: batch = doc_id % 10 == 7
  private def corpus = docs.filter(col("doc_id") % 10 =!= 7)
  private def batch = docs.filter(col("doc_id") % 10 === 7)

  test("BandStore append ≡ full land: content, consumer results, plan") {
    val tmp = graft.TempDirs.create("graft-bandappend")
    BandStore.saveBucketed(corpus, "bands_app", buckets = 8,
      path = Some(tmp.resolve("a").toString))
    BandStore.appendBatch(batch, "bands_app", buckets = 8)
    // a BLIND re-run of the same sync (crashed-coordinator retry): the
    // doc_id anti-join must drop the whole already-landed batch —
    // duplicate band rows would change q110's best-match multiplicities
    BandStore.appendBatch(batch, "bands_app", buckets = 8)
    BandStore.saveBucketed(docs, "bands_full", buckets = 8,
      path = Some(tmp.resolve("f").toString))
    try {
      def content(t: String) = BandStore.loadBucketed(spark, t)
        .select(col("doc_id"), col("band"), col("key"), hex(col("hs")))
        .collect().map(_.toSeq).toSet
      assert(content("bands_app") == content("bands_full"))
      // registered consumers over the appended store = the cold path
      val want = Seq("q34_minhash_lsh", "q110_ingest_dedup").map { q =>
        q -> SparkEntry.queries(q)(spark, d).collect().toSeq
      }
      spark.conf.set("spark.graft.bandStore", s"$d=bands_app")
      try want.foreach { case (q, w) =>
        assert(SparkEntry.queries(q)(spark, d).collect().toSeq == w,
          s"$q over the appended store differs")
        if (q == "q34_minhash_lsh") {
          val df = SparkEntry.queries(q)(spark, d)
          df.collect()
          val p = df.queryExecution.executedPlan.toString
          assert(p.contains("Bucketed: true"), s"append lost bucketing:\n$p")
          assert(!p.contains("Exchange hashpartitioning(band"),
            s"append made the self-join shuffle:\n$p")
        }
      } finally spark.conf.unset("spark.graft.bandStore")
    } finally Seq("bands_app", "bands_full")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("TermStore append merges the sidecars: q97 ≡ full land, dfreq exact") {
    val tmp = graft.TempDirs.create("graft-termappend")
    graft.sources.TermStore.saveBucketed(corpus, "terms_app", buckets = 8,
      path = Some(tmp.resolve("a").toString))
    graft.sources.TermStore.appendBatch(batch, "terms_app", buckets = 8)
    graft.sources.TermStore.saveBucketed(docs, "terms_full", buckets = 8,
      path = Some(tmp.resolve("f").toString))
    try {
      def side(t: String) = (
        spark.table(s"${t}_df").collect().map(_.toSeq).toSet,
        spark.table(s"${t}_meta").collect().map(_.toSeq).toSet,
        spark.table(s"${t}_docs").collect().map(_.toSeq).toSet,
        spark.table(s"${t}_norms").collect().map(_.toSeq).toSet,
        spark.table(t).collect().map(_.toSeq).toSet)
      assert(side("terms_app") == side("terms_full"),
        "appended index + merged sidecars must equal the full re-land")
      val want = SparkEntry.queries("q97_sparse_cosine")(spark, d).collect().toSeq
      spark.conf.set("spark.graft.termStore", s"$d=terms_app")
      try assert(
        SparkEntry.queries("q97_sparse_cosine")(spark, d).collect().toSeq == want,
        "q97 over the appended store differs from the cold path")
      finally spark.conf.unset("spark.graft.termStore")
    } finally (graft.sources.TermStore.tablesOf("terms_app") ++
      graft.sources.TermStore.tablesOf("terms_full"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("TermStore crashed sync: re-run never double-appends; reconcile restores sidecars") {
    import graft.sources.{Stores, TermStore}
    val tmp = graft.TempDirs.create("graft-termrec")
    TermStore.saveBucketed(corpus, "terms_rec", buckets = 8,
      path = Some(tmp.resolve("a").toString))
    TermStore.saveBucketed(docs, "terms_recfull", buckets = 8,
      path = Some(tmp.resolve("f").toString))
    try {
      // simulate the documented crash window: the batch postings landed
      // (the append job commits atomically) but the sidecar rewrites
      // never ran — dfreq/n_docs are stale at their pre-batch values
      Stores.appendBucketed(TermStore.forwardIndex(batch), "terms_rec",
        buckets = 8, Seq("doc_id"))
      // a BLIND re-run of the same sync: the anti-join must drop the
      // already-landed batch, postings must not double
      TermStore.appendBatch(batch, "terms_rec", buckets = 8)
      def content(t: String) = spark.table(t).collect().map(_.toSeq).toSet
      assert(content("terms_rec") == content("terms_recfull"),
        "re-run double-appended (or dropped) postings")
      // ground-truth reconciliation rebuilds both sidecars exactly (the
      // default n_docs reconstruction: every fixture doc has tokens)
      TermStore.reconcileSidecars(spark, "terms_rec")
      assert(content("terms_rec_df") == content("terms_recfull_df"),
        "reconciled dfreq differs from the full re-land")
      assert(content("terms_rec_meta") == content("terms_recfull_meta"),
        "reconciled n_docs differs from the full re-land")
    } finally (TermStore.tablesOf("terms_rec") ++
      TermStore.tablesOf("terms_recfull"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("TermStore: token-EMPTY docs never inflate n_docs (the _docs ledger)") {
    import graft.sources.TermStore
    import spark.implicits._
    val tmp = graft.TempDirs.create("graft-termempty")
    val base = Seq((0L, "alpha beta gamma"), (1L, "beta gamma delta"))
    val emptyBatch = Seq((10L, " "), (11L, "solo token here"))
    def mk(rows: Seq[(Long, String)]) = rows
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    TermStore.saveBucketed(mk(base), "terms_empty", buckets = 4,
      path = Some(tmp.resolve("e").toString))
    try {
      def nDocs = spark.table("terms_empty_meta").head().getLong(0)
      assert(nDocs == 2L)
      TermStore.appendBatch(mk(emptyBatch), "terms_empty", buckets = 4)
      assert(nDocs == 4L, "first sync must count the empty doc once")
      // the r13 advice bug: a BLIND re-run of a batch holding a token-
      // EMPTY doc re-counted it every retry (postings can't witness it);
      // the _docs ledger witnesses it now
      TermStore.appendBatch(mk(emptyBatch), "terms_empty", buckets = 4)
      TermStore.appendBatch(mk(emptyBatch), "terms_empty", buckets = 4)
      assert(nDocs == 4L, s"re-runs inflated n_docs to $nDocs")
      // and ground-truth reconciliation agrees WITHOUT an external count
      TermStore.reconcileSidecars(spark, "terms_empty")
      assert(nDocs == 4L, s"reconcile lost the empty doc: $nDocs")
    } finally TermStore.tablesOf("terms_empty")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("VecStore append routes by the FROZEN quantizer and stays prunable") {
    import spark.implicits._
    val embs = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val store = embs.filter(col("vec_id") % 10 =!= 7)
    val delta = embs.filter(col("vec_id") % 10 === 7)
    // the quantizer is trained on the STORED corpus and frozen (q122's
    // rule); append must route the delta by it, never re-train
    val model = graft.operators.KMeans.fit(store, "vec_id", "embedding",
      dim = 16, k = 8, iters = 5)
    val dir = graft.TempDirs.create("graft-vecappend").resolve("v").toString
    graft.sources.VecStore.savePartitioned(store, model, dir)
    graft.sources.VecStore.appendPartitioned(delta, model, dir)
    // content ≡ the whole corpus assigned by the SAME frozen model
    val got = graft.sources.VecStore.load(spark, dir)
      .select(col("vec_id"), col("cell")).as[(Long, Int)].collect().toSet
    val want = graft.sources.VecStore.assign(embs, model)
      .select(col("vec_id"), col("cell")).as[(Long, Int)].collect().toSet
    assert(got == want && got.nonEmpty)
    // an appended vector is partition-prunable the sync it lands
    val one = graft.sources.VecStore.assign(delta, model)
      .select(col("vec_id"), col("cell")).as[(Long, Int)].head()
    val scan = graft.sources.VecStore.load(spark, dir)
      .filter(col("cell") === one._2)
    scan.collect()
    val p = scan.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(cell"),
      s"cell filter must prune partitions:\n${p.take(1500)}")
    assert(scan.filter(col("vec_id") === one._1).count() == 1,
      "the appended vector must be findable in its routed cell")
  }

  test("VecStore append with PQ sidecar: delta codes land, search sees them") {
    import spark.implicits._
    // full land (store + sidecar) from the corpus dir, then a synthetic
    // delta of fresh ids carrying EXISTING vectors — known ground truth
    val dir = graft.TempDirs.create("graft-vecpq").resolve("v").toString
    graft.queries.EmbeddingQueries.landVecStore(spark, d, dir)
    val embs = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val nBefore = graft.sources.VecStore.loadPqCodes(spark, dir).count()
    val delta = embs.filter(col("vec_id") < 5)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    // no model argument: the routing quantizer comes off the _ivfmodel
    // sidecar the landing wrote — a sync needs zero Lloyd iterations
    assert(graft.sources.VecStore.hasIvfModel(spark, dir),
      "landing must write _ivfmodel")
    graft.queries.EmbeddingQueries.appendVecStore(spark, delta, dir)
    val codes = graft.sources.VecStore.loadPqCodes(spark, dir)
    assert(codes.count() == nBefore + 5, "delta codes must land in _pqcodes")
    // frozen-model parity: the landed delta codes ARE the frozen encode
    val (coarse, books) = graft.sources.VecStore.loadPqModel(spark, dir)
    val want = graft.queries.EmbeddingQueries
      .pqEncodeFrozen(delta, coarse, books)
      .select(col("vec_id"), col("cell"), hex(col("code")))
      .collect().map(_.toSeq).toSet
    val got = codes.filter(col("vec_id") >= 1000000L)
      .select(col("vec_id"), col("cell"), hex(col("code")))
      .collect().map(_.toSeq).toSet
    assert(got == want && got.size == 5)
    // a delta twin of vec v carries v's EXACT code (same bytes in, same
    // frozen quantizers) — the searchability witness without re-running
    // the whole q78 probe machinery
    val base = codes.filter(col("vec_id") < 5)
      .select(col("vec_id"), hex(col("code"))).as[(Long, String)]
      .collect().toMap
    val twins = codes.filter(col("vec_id") >= 1000000L)
      .select(col("vec_id"), hex(col("code"))).as[(Long, String)]
      .collect().toMap
    assert(base.forall { case (id, c) => twins.get(id + 1000000L).contains(c) },
      "a byte-identical delta twin must encode to its base's exact code")
  }

  test("compactBuckets: appended buckets collapse to one SORTED file; parity; plans") {
    import graft.sources.Stores
    val tmp = graft.TempDirs.create("graft-compact")
    val dir = tmp.resolve("c").toString
    // 1 land + 3 appends → up to 4 file sets per bucket
    BandStore.saveBucketed(docs.filter(col("doc_id") % 4 === 0), "bands_cmp",
      buckets = 8, path = Some(dir))
    (1 to 3).foreach(i =>
      BandStore.appendBatch(docs.filter(col("doc_id") % 4 === i), "bands_cmp", 8))
    def content() = BandStore.loadBucketed(spark, "bands_cmp")
      .select(col("doc_id"), col("band"), col("key"), hex(col("hs")))
      .collect().map(_.toSeq).toSet
    def bucketFiles() = new java.io.File(dir).listFiles.toSeq
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .groupBy(f => """_(\d+)\.""".r.findFirstMatchIn(f.getName).get.group(1).toInt)
    try {
      val before = content()
      assert(bucketFiles().exists(_._2.size > 1), "appends produced no multi-file bucket")
      val q34Cold = SparkEntry.queries("q34_minhash_lsh")(spark, d).collect().toSeq
      val n = Stores.compactBuckets(spark, "bands_cmp", Seq("band", "key"),
        maxFilesPerBucket = 1)
      assert(n > 0, "no bucket was compacted")
      // (a) content parity with the pre-compaction store
      assert(content() == before, "compaction changed the table content")
      // (b) one file per bucket, each internally sorted on (band, key) —
      // the property Spark only trusts on single-file buckets
      val byBucket = bucketFiles()
      assert(byBucket.nonEmpty && byBucket.forall(_._2.size == 1),
        s"buckets not single-file after compaction: ${byBucket.view.mapValues(_.size).toMap}")
      byBucket.values.flatten.foreach { f =>
        val rows = spark.read.parquet(f.getPath)
          .select(col("band"), col("key")).collect()
          .map(r => (r.getInt(0), r.getString(1))).toSeq
        assert(rows == rows.sorted, s"${f.getName} lost the per-bucket sort")
      }
      // idempotence: nothing left above the threshold
      assert(Stores.compactBuckets(spark, "bands_cmp", Seq("band", "key"),
        maxFilesPerBucket = 1) == 0)
      // (c) the consumer still matches and stays exchange-free
      spark.conf.set("spark.graft.bandStore", s"$d=bands_cmp")
      try {
        val df = SparkEntry.queries("q34_minhash_lsh")(spark, d)
        assert(df.collect().toSeq == q34Cold, "q34 over the compacted store differs")
        val p = df.queryExecution.executedPlan.toString
        assert(p.contains("Bucketed: true"), s"compaction lost bucketing:\n$p")
        assert(!p.contains("Exchange hashpartitioning(band"),
          s"compaction made the self-join shuffle:\n$p")
      } finally spark.conf.unset("spark.graft.bandStore")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bands_cmp")
      graft.TempDirs.deleteRec(tmp.toString)
    }
  }

  test("compactPartitions: appended cell dirs collapse to one file; parity; pruning") {
    import org.apache.spark.sql.functions.{col => c}
    import graft.sources.{Stores, VecStore}
    val embs = Tables.embeddings(spark, d).select(c("vec_id"), c("embedding"))
    val store = embs.filter(c("vec_id") % 10 =!= 7)
    val model = graft.operators.KMeans.fit(store, "vec_id", "embedding",
      dim = 16, k = 8, iters = 5)
    val dir = graft.TempDirs.create("graft-veccompact").resolve("v").toString
    VecStore.savePartitioned(store, model, dir)
    // three delta syncs: every touched cell dir accumulates file sets
    (0 until 3).foreach { i =>
      VecStore.appendPartitioned(
        embs.filter(c("vec_id") % 10 === 7 && c("vec_id") % 3 === i), model, dir)
    }
    def cellDirs() = new java.io.File(dir).listFiles.toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    def filesOf(cd: java.io.File) = cd.listFiles.toSeq
      .filter(f => f.isFile && f.getName.startsWith("part-"))
    assert(cellDirs().exists(filesOf(_).size > 1),
      "appends produced no multi-file cell")
    def content() = VecStore.load(spark, dir)
      .select(c("vec_id"), c("cell")).collect().map(_.toSeq).toSet
    val before = content()
    val n = Stores.compactPartitions(spark, dir, maxFilesPerDir = 1)
    assert(n > 0, "no cell dir was compacted")
    assert(cellDirs().nonEmpty && cellDirs().forall(filesOf(_).size == 1),
      s"cells not single-file: ${cellDirs().map(cd => cd.getName -> filesOf(cd).size)}")
    assert(content() == before, "compaction changed the store content")
    // idempotence + pruning untouched: a cell filter still prunes
    assert(Stores.compactPartitions(spark, dir, maxFilesPerDir = 1) == 0)
    val one = before.head(1).asInstanceOf[Int]
    val scan = VecStore.load(spark, dir).filter(c("cell") === one)
    scan.collect()
    val p = scan.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(cell"),
      s"cell filter must still prune partitions:\n${p.take(1500)}")
  }

  test("compactBuckets recovers an interrupted run before re-compacting") {
    import graft.sources.Stores
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = graft.TempDirs.create("graft-compactrec")
    val dir = tmp.resolve("c").toString
    BandStore.saveBucketed(docs, "bands_rec", buckets = 4, path = Some(dir))
    def content() = BandStore.loadBucketed(spark, "bands_rec")
      .select(col("doc_id"), col("band"), col("key")).collect().map(_.toSeq).toSet
    try {
      val before = content()
      val aFile = new java.io.File(dir).listFiles
        .filter(f => f.isFile && f.getName.startsWith("part-")).head
      // simulate a crash between steps 2 and 3: the compacted part still
      // sits in the tmp dir, a real data file already moved to replaced/
      val crashTmp = Paths.get(dir, "_compact_tmp_99")
      Files.createDirectories(crashTmp.resolve("replaced"))
      Files.copy(aFile.toPath, crashTmp.resolve("part-compacted.parquet"),
        StandardCopyOption.COPY_ATTRIBUTES) // stands in for the merged file
      Files.move(aFile.toPath,
        crashTmp.resolve("replaced").resolve(aFile.getName))
      spark.catalog.refreshTable("bands_rec")
      assert(content() != before, "crash simulation removed nothing")
      // recovery rolls the replaced file back and drops the tmp
      Stores.compactBuckets(spark, "bands_rec", Seq("band", "key"))
      assert(content() == before, "recovery did not restore the table")
      assert(!Files.exists(crashTmp), "recovery left the tmp dir behind")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bands_rec")
      graft.TempDirs.deleteRec(tmp.toString)
    }
  }

  test("compactEventsZStore: frozen-curve re-sort; parity; idempotent; crash recovery (manifest rule + marker protocol)") {
    import graft.queries.{RelationalQueries => RQ}
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val want = SparkEntry.queries("q129_zorder_scan")(spark, d).collect().toSeq
    val tmp = graft.TempDirs.create("graft-zcompact")
    val store = tmp.resolve("ez").toString
    val isBatch = col("event_id") % 4 === 3
    RQ.landEventsZStore(spark, d, store, !isBatch)
    // three syncs, each its own per-batch file set — the pruning
    // granularity the compactor exists to restore
    (0 until 3).foreach { i =>
      RQ.appendEventsZStore(spark,
        Tables.events(spark, d).filter(col("event_id") % 12 === 3 + 4 * i),
        store)
    }
    def dataFiles() = new java.io.File(store).listFiles.toSeq
      .filter(f => f.isFile && f.getName.startsWith("part-"))
    def q129() = {
      spark.conf.set("spark.graft.eventsZStore", s"$d=$store")
      try SparkEntry.queries("q129_zorder_scan")(spark, d).collect().toSeq
      finally spark.conf.unset("spark.graft.eventsZStore")
    }
    try {
      assert(q129() == want, "appended store broke parity before compaction")
      val before = dataFiles().size
      val curve = spark.read.parquet(s"$store/_curve").head
      val bounds = spark.read.parquet(s"$store/_bounds").head
      val n = RQ.compactEventsZStore(spark, store)
      assert(n == before, s"compaction replaced $n of $before files")
      assert(dataFiles().size < before,
        "compaction did not reduce the per-batch file sets")
      assert(q129() == want, "compaction changed the answer")
      // sidecars untouched: the curve is FROZEN, the bounds are already
      // the full table's (min/max monoids merged per sync)
      assert(spark.read.parquet(s"$store/_curve").head == curve)
      assert(spark.read.parquet(s"$store/_bounds").head == bounds)
      // idempotence: a second full rewrite is bit-equal again
      RQ.compactEventsZStore(spark, store)
      assert(q129() == want, "re-compaction changed the answer")
      // crash BEFORE the manifest commit (the manifested store's swap is
      // manifest-as-commit — see the snapshot-manifest tests for the
      // post-commit side): a new file already joined the dir, strays
      // still in the tmp, manifest unrenamed — recovery must roll BACK
      // by the manifest rule (drop tmp + every un-manifested data file)
      val f1 = dataFiles().head
      val crashA = Paths.get(store, "_compact_tmp_rewrite")
      Files.createDirectories(crashA)
      Files.copy(f1.toPath, crashA.resolve("part-straystage.parquet"),
        StandardCopyOption.COPY_ATTRIBUTES)
      Files.copy(f1.toPath, Paths.get(store, "part-movedin.parquet"),
        StandardCopyOption.COPY_ATTRIBUTES)
      RQ.compactEventsZStore(spark, store)
      assert(q129() == want, "pre-commit crash recovery broke parity")
      assert(!Files.exists(Paths.get(store, "_compact_tmp_rewrite")),
        "recovery left the tmp behind")
      assert(!Files.exists(Paths.get(store, "_compact_lock")),
        "compaction left the reader lock behind")
      // the marker protocol still governs manifest-LESS dirs: same
      // pre/post-marker states on a plain rewriteDir-managed directory
      val plain = tmp.resolve("plain").toString
      spark.range(100).selectExpr("id", "id * 2 AS v").coalesce(2)
        .write.parquet(plain)
      val pf = new java.io.File(plain).listFiles.toSeq
        .filter(f => f.isFile && f.getName.startsWith("part-")).head
      val crashB = Paths.get(plain, "_compact_tmp_rewrite")
      Files.createDirectories(crashB.resolve("replaced"))
      Files.copy(pf.toPath, crashB.resolve("part-merged.parquet"),
        StandardCopyOption.COPY_ATTRIBUTES)
      Files.move(pf.toPath, crashB.resolve("replaced").resolve(pf.getName))
      // no _commit → roll BACK: the moved-out file returns, staging drops
      graft.sources.Stores.rewriteDir(spark, plain) { (df, out) =>
        df.coalesce(1).write.parquet(out)
      }
      assert(spark.read.parquet(plain).count() == 100,
        "marker-protocol rollback lost rows on a manifest-less dir")
    } finally graft.TempDirs.deleteRec(tmp.toString)
  }

  test("rewriteDir: a THROWN rewrite settles the directory and releases the lock") {
    import graft.queries.{RelationalQueries => RQ}
    import graft.sources.Stores
    // a transient failure inside the swap body must not leave either a
    // half-swapped listing or a stuck lock behind — the reader contract
    // holds across thrown exceptions, not just clean runs
    val tmp = graft.TempDirs.create("graft-rewritethrow")
    val store = tmp.resolve("ez").toString
    RQ.landEventsZStore(spark, d, store)
    val want = spark.read.parquet(store).count()
    try {
      intercept[RuntimeException] {
        Stores.rewriteDir(spark, store) { (_, _) =>
          throw new RuntimeException("injected rewrite failure")
        }
      }
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(store, "_compact_lock")),
        "a thrown rewrite left the reader lock behind")
      assert(spark.read.parquet(store).count() == want,
        "a thrown rewrite changed the directory's content")
      // and a guarded reader works immediately (no stale window)
      spark.conf.set("spark.graft.eventsZStore", s"$d=$store")
      try assert(SparkEntry.queries("q129_zorder_scan")(spark, d)
        .collect().nonEmpty)
      finally spark.conf.unset("spark.graft.eventsZStore")
    } finally graft.TempDirs.deleteRec(tmp.toString)
  }

  test("pre-split Z-store (mn0/g0 in _bounds, no _curve) migrates on first touch") {
    import graft.queries.{RelationalQueries => RQ}
    import spark.implicits._
    val tmp = graft.TempDirs.create("graft-zmigrate")
    val store = tmp.resolve("ez").toString
    val isBatch = col("event_id") % 4 === 3
    val want = SparkEntry.queries("q129_zorder_scan")(spark, d).collect().toSeq
    RQ.landEventsZStore(spark, d, store, !isBatch)
    // rewrite the sidecars into the PRE-round-13 single-file format:
    // mn0/g0 live inside _bounds, no _curve exists
    val c = spark.read.parquet(s"$store/_curve").head
    val (mn0, g0) = (c.getAs[Long]("mn0"), c.getAs[Long]("g0"))
    val b = spark.read.parquet(s"$store/_bounds").head
    Seq((b.getAs[Long]("mn"), b.getAs[Long]("mx"), b.getAs[Long]("umax"),
      mn0, g0)).toDF("mn", "mx", "umax", "mn0", "g0")
      .coalesce(1).write.mode("overwrite").parquet(s"$store/_bounds")
    graft.TempDirs.deleteRec(s"$store/_curve")
    try {
      // a sync against the legacy store must migrate, not fail — and
      // must encode with the ORIGINAL frozen curve
      RQ.appendEventsZStore(spark,
        Tables.events(spark, d).filter(isBatch), store)
      val migrated = spark.read.parquet(s"$store/_curve").head
      assert(migrated.getAs[Long]("mn0") == mn0 &&
        migrated.getAs[Long]("g0") == g0,
        "migration must carry the original frozen curve into _curve")
      // reconcile (which rewrites _bounds to the live-only schema) must
      // never destroy the curve — the exact hazard the migration closes
      RQ.reconcileEventsZBounds(spark, store)
      assert(spark.read.parquet(s"$store/_curve").head == migrated)
      spark.conf.set("spark.graft.eventsZStore", s"$d=$store")
      try assert(SparkEntry.queries("q129_zorder_scan")(spark, d)
        .collect().toSeq == want,
        "the migrated, synced, reconciled store must answer exactly")
      finally spark.conf.unset("spark.graft.eventsZStore")
    } finally graft.TempDirs.deleteRec(tmp.toString)
  }

  test("compaction window: guarded readers fail fast on the lock, release after") {
    import graft.sources.Stores
    val tmp = graft.TempDirs.create("graft-lock")
    val dir = tmp.resolve("b").toString
    BandStore.saveBucketed(corpus, "bands_lock", buckets = 4, path = Some(dir))
    try {
      val lock = java.nio.file.Paths.get(dir, "_compact_lock")
      java.nio.file.Files.createFile(lock)
      // a read STARTING inside the window must fail fast, not silently
      // scan a half-swapped listing (the task-6 reader contract)
      val e = intercept[IllegalStateException] {
        BandStore.loadBucketed(spark, "bands_lock")
      }
      assert(e.getMessage.contains("compaction window"))
      // the conf-wired Z-store consumer: a MANIFESTED store reads its
      // snapshot right through the lock (task 6 lifted fail-fast there);
      // strip the manifests to simulate a pre-manifest store and the
      // same lock fails the read fast, as before
      val ezDir = tmp.resolve("ez").toString
      graft.queries.RelationalQueries.landEventsZStore(spark, d, ezDir)
      java.nio.file.Files.createFile(
        java.nio.file.Paths.get(ezDir, "_compact_lock"))
      spark.conf.set("spark.graft.eventsZStore", s"$d=$ezDir")
      try {
        assert(SparkEntry.queries("q129_zorder_scan")(spark, d).count() > 0,
          "a manifested store must serve its snapshot through the lock")
        java.nio.file.Files.list(java.nio.file.Paths.get(ezDir)).toArray
          .map(_.toString)
          .filter(_.split("/").last.startsWith("_manifest_v"))
          .foreach(p => java.nio.file.Files.delete(java.nio.file.Paths.get(p)))
        intercept[IllegalStateException] {
          SparkEntry.queries("q129_zorder_scan")(spark, d).collect()
        }
      } finally spark.conf.unset("spark.graft.eventsZStore")
      java.nio.file.Files.delete(lock)
      assert(BandStore.loadBucketed(spark, "bands_lock").count() > 0,
        "reader must recover once the lock releases")
      // a real compaction run (multi-file buckets from a genuine append;
      // the sort-restoring default maxFilesPerBucket = 1) releases its
      // own lock
      BandStore.appendBatch(batch, "bands_lock", 4)
      assert(Stores.compactBuckets(spark, "bands_lock", Seq("band", "key")) > 0)
      assert(!java.nio.file.Files.exists(lock),
        "compactBuckets left its lock behind")
      assert(BandStore.loadBucketed(spark, "bands_lock").count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bands_lock")
      graft.TempDirs.deleteRec(tmp.toString)
    }
  }

  test("snapshot manifest: a guarded read ISSUED mid-window sees the full pre-compaction rows") {
    // VERDICT r13 task 6 — the availability upgrade over fail-fast: the
    // events Z-store publishes `_manifest_v<N>` on land/append/compact,
    // and the conf-wired reader resolves the newest manifest's files to
    // wherever they currently live (dir, or the compactor's tmp/replaced
    // mid-swap) — so a read concurrent with a swap returns the complete
    // OLD snapshot instead of throwing on the lock.
    import org.apache.hadoop.fs.Path
    import graft.queries.RelationalQueries
    val tmp = graft.TempDirs.create("graft-snapread")
    val store = tmp.resolve("events").toString
    RelationalQueries.landEventsZStore(spark, d, store)
    spark.conf.set("spark.graft.eventsZStore", s"$d=$store")
    try {
      val want = SparkEntry.queries("q129_zorder_scan")(spark, d)
        .collect().toSeq
      assert(want.nonEmpty)
      // open a swap window BY HAND at its most hostile point under the
      // manifest-as-commit protocol: a NEW (here: duplicate) data file
      // already moved into the directory, the manifest not yet renamed,
      // the lock held — a directory listing would double-count rows, the
      // old fail-fast contract would throw; the snapshot read does
      // neither, because the still-current manifest names exactly the
      // old file set
      val dir = new Path(store)
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(new Path(dir, "_compact_tmp_rewrite"))
      val first = fs.listStatus(dir)
        .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
        .head.getPath
      org.apache.hadoop.fs.FileUtil.copy(fs, first, fs,
        new Path(dir, "part-stray-" + first.getName), false,
        spark.sparkContext.hadoopConfiguration)
      fs.create(new Path(dir, "_compact_lock"), true).close()
      spark.catalog.refreshByPath(store)
      val got = SparkEntry.queries("q129_zorder_scan")(spark, d)
        .collect().toSeq
      assert(got == want,
        "mid-window guarded read must return the full pre-compaction rows")
      // settle the window through the real compactor (the manifest rule
      // drops the un-manifested stray), then rewrite; reads stay identical
      RelationalQueries.compactEventsZStore(spark, store)
      assert(SparkEntry.queries("q129_zorder_scan")(spark, d)
        .collect().toSeq == want)
    } finally {
      spark.conf.unset("spark.graft.eventsZStore")
    }
  }

  test("snapshot manifest: appends advance it; recovery republishes after a marker crash") {
    import org.apache.hadoop.fs.Path
    import graft.queries.RelationalQueries
    val tmp = graft.TempDirs.create("graft-snapadv")
    val store = tmp.resolve("events").toString
    RelationalQueries.landEventsZStore(spark, d, store,
      col("event_id") % 2 === 0)
    val dir = new Path(store)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def snapCount = spark.read.parquet(
      graft.sources.Stores.snapshotFiles(spark, store).get: _*).count()
    val n0 = snapCount
    RelationalQueries.appendEventsZStore(spark,
      graft.Tables.events(spark, d).filter(col("event_id") % 2 === 1), store)
    assert(snapCount > n0, "the sync must advance the snapshot manifest")
    val nAll = snapCount
    // crash just AFTER the manifest-commit rename, mid-vacuum: the new
    // manifest names a strict subset (the "rewrite output"), superseded
    // files still sit in the directory, the staging tmp and the lock
    // remain — the settlement must finish the vacuum by the manifest
    // rule (delete tmp + every data file the manifest does not name)
    val tmpDir = new Path(dir, "_compact_tmp_rewrite")
    fs.mkdirs(tmpDir)
    val parts = fs.listStatus(dir)
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
    assert(parts.length > 1)
    graft.sources.Stores.writeManifest(fs, dir,
      Seq(parts.head.getPath.getName))
    fs.create(new Path(dir, "_compact_lock"), true).close()
    // the next compaction call settles, then rewrites the survivor
    RelationalQueries.compactEventsZStore(spark, store)
    val files = graft.sources.Stores.snapshotFiles(spark, store).get
    assert(files.nonEmpty, "recovery must leave a resolvable manifest")
    assert(snapCount < nAll,
      "settlement keeps only the committed snapshot's rows")
  }

  test("MediaStore append ≡ full land: all six modality tables, consumers, no decode") {
    import graft.queries.{StreamMultimodalQueries => SMQ}
    val tmp = graft.TempDirs.create("graft-mediaappend")
    val corpusF = col("doc_id") % 10 =!= 7
    val batchF = col("doc_id") % 10 === 7
    // land the pre-batch corpus, sync the batch (decode O(batch) only),
    // and a full re-land as ground truth
    SMQ.landMediaStore(spark, d, "media_app", buckets = 8,
      tmp.resolve("a").toString, corpusF)
    SMQ.appendMediaStore(spark, d, "media_app", buckets = 8, batchF)
    // blind re-run: all four modality appends must anti-join the landed
    // doc_ids — duplicated hash rows change the consumers' group counts
    SMQ.appendMediaStore(spark, d, "media_app", buckets = 8, batchF)
    SMQ.landMediaStore(spark, d, "media_full", buckets = 8,
      tmp.resolve("f").toString)
    try {
      // (a) content parity per modality: perceptual hashes are pure
      // functions of the bytes, so append is EXACT, not approximate
      SMQ.mediaStoreTables("media_app").zip(SMQ.mediaStoreTables("media_full"))
        .foreach { case (a, f) =>
          val ca = spark.table(a).collect().map(_.toSeq).toSet
          assert(ca == spark.table(f).collect().map(_.toSeq).toSet,
            s"$a differs from the full re-land")
          assert(ca.nonEmpty, s"$a landed empty")
        }
      // (b) every registered perceptual consumer over the appended store
      // equals the decode path, and (c) still plans NO decode (the
      // MediaStoreSpec object-boundary assertion)
      val qs = Seq("q117_image_phash_dedup", "q118_image_neardup",
        "q120_image_chunk_buckets", "q121_audio_fingerprint_dedup",
        "q123_audio_neardup", "q124_audio_chunk_buckets",
        "q125_video_neardup", "q126_video_frame_buckets",
        "q127_video_neardup_hamming")
      val want = qs.map(q => q -> SparkEntry.queries(q)(spark, d).collect().toSeq)
      spark.conf.set("spark.graft.mediaStore", s"$d=media_app")
      try want.foreach { case (q, w) =>
        val df = SparkEntry.queries(q)(spark, d)
        assert(df.collect().toSeq == w, s"$q over the appended store differs")
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("MapPartitions"),
          s"$q appended-store path must plan no decode:\n${p.take(2000)}")
      } finally spark.conf.unset("spark.graft.mediaStore")
    } finally (SMQ.mediaStoreTables("media_app") ++
      SMQ.mediaStoreTables("media_full"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("DocStore append ≡ full land: content and the q37 consumer") {
    val tmp = graft.TempDirs.create("graft-docappend")
    DocStore.saveBucketed(corpus, "docs_app", buckets = 8,
      path = Some(tmp.resolve("a").toString))
    DocStore.appendBatch(batch, "docs_app", buckets = 8)
    // blind re-run: the anti-join must drop the already-landed batch —
    // duplicate fp rows would inflate q37's group counts
    DocStore.appendBatch(batch, "docs_app", buckets = 8)
    DocStore.saveBucketed(docs, "docs_full", buckets = 8,
      path = Some(tmp.resolve("f").toString))
    try {
      def content(t: String) = DocStore.loadBucketed(spark, t)
        .select(col("doc_id"), col("fp")).collect().map(_.toSeq).toSet
      assert(content("docs_app") == content("docs_full"))
      val want = SparkEntry.queries("q37_fingerprint")(spark, d).collect().toSeq
      spark.conf.set("spark.graft.docStore", s"$d=docs_app")
      try assert(
        SparkEntry.queries("q37_fingerprint")(spark, d).collect().toSeq == want,
        "q37 over the appended store differs")
      finally spark.conf.unset("spark.graft.docStore")
    } finally Seq("docs_app", "docs_full")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
