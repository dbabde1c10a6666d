package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry}

// Scratch: sub-stage attribution for the scale10 heavies (q43/q67, q36,
// q134, q97) on the same perturbed 10x blowup the bench builds. Each
// stage is timed twice (warm number) with the session memos invalidated
// between queries the way the bench's scale10 stage leaves them.
object ProbeScale10 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.lift(1).getOrElse("all")
    val dir = graft.Bench.buildScale10(spark, src)
    spark.conf.set("spark.graft.nearDupBits", "8")
    def time(tag: String)(f: => Long): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (dt, n) = runs.minBy(_._1)
      println(f"[s10] $tag%-32s $dt%7.2f s (n=$n%d, first=${runs.head._1}%.2f)")
    }
    def count(df: org.apache.spark.sql.DataFrame): Long = df.count()

    if (which == "parts") {
      // how many partitions do the checkpointed/fan-out frames ACTUALLY
      // carry after AQE's coalescing of REPARTITION_BY_COL exchanges?
      val bands = graft.queries.EmbeddingQueries.nearDupCandidates(spark, dir)
      println("[s10] q43 cand rdd partitions: " + bands.rdd.getNumPartitions)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .repartition(col("doc_id")).localCheckpoint()
      println("[s10] repartition(col) checkpoint partitions: " +
        docs.rdd.getNumPartitions)
      val docsN = spark.read.parquet(s"$dir/documents.parquet")
        .repartition(32, col("doc_id")).localCheckpoint()
      println("[s10] repartition(32, col) checkpoint partitions: " +
        docsN.rdd.getNumPartitions)
    }
    if (which == "all" || which == "q43") {
      // replicate the banding inline to time sub-pieces (scratch only)
      val bits = 8
      val nTables = 4
      import graft.functions.{VecFns => V}
      val th = graft.queries.EmbeddingQueries.planeThresholdsProbe(spark, dir, nTables * bits)
      val dim = 64
      val packed = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("vec"))
        .select(Seq(col("vec_id"), V.packVec(col("vec")).as("pv"),
          V.norm(col("vec")).as("nrm")) ++
          (0 until nTables).map(t =>
            V.opaqueBucket(V.lshBucketCentered(col("vec"), bits, dim, th,
              t * bits)).as(s"__b$t")): _*)
      val bandedIds = packed
        .select(col("vec_id"),
          explode(array((0 until nTables).map(t =>
            struct(lit(t).as("tbl"), col(s"__b$t").as("bucket"))): _*)).as("tb"))
        .select(col("vec_id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
      time("q43 banded ids")(count(bandedIds))
      val l = bandedIds.repartition(col("vec_id"))
        .select(col("bucket"), col("tbl"), col("vec_id").as("d1"))
      val r = bandedIds.select(col("bucket"), col("tbl"), col("vec_id").as("d2"))
      val raw = graft.operators.Joins.blockJoin(l, r, Seq("bucket", "tbl"),
        hash(col("d1")), buildRows = 200000L * nTables)
        .filter(col("d1") < col("d2"))
      time("q43 raw pairs (pre-distinct)")(count(raw))
      time("q43 distinct cand")(count(raw.select(col("d1"), col("d2")).distinct()))
      val candDf = graft.queries.EmbeddingQueries.nearDupCandidates(spark, dir)
      time("q43 cand (registered)")(count(candDf))
      println("[s10] cand AQE final plan:\n" +
        candDf.queryExecution.executedPlan.toString.linesIterator
          .map(_.take(120)).mkString("\n"))
      time("q43 scored pairs")(count(
        graft.queries.EmbeddingQueries.nearDupPairs(spark, dir)))
      // isolate SCORING from a checkpointed candidate frame
      val candCk = graft.queries.EmbeddingQueries.nearDupCandidates(spark, dir)
        .localCheckpoint()
      import graft.functions.{FP, VecFns => V2}
      val pk = packed.select(col("vec_id"), col("pv"), col("nrm")).localCheckpoint()
      def score(j: (org.apache.spark.sql.DataFrame, Seq[String]) => org.apache.spark.sql.DataFrame) =
        j(j(candCk, Seq("d1")), Seq("d2"))
      def side(n: String) = pk.select(col("vec_id").as(n),
        col("pv").as(s"v$n"), col("nrm").as(s"n$n"))
      val smj = candCk
        .join(side("d1").withColumnRenamed("vd1", "v1"), Seq("d1"))
        .join(side("d2"), Seq("d2"))
      val scoredSmj = candCk
        .join(pk.select(col("vec_id").as("d1"), col("pv").as("v1"), col("nrm").as("n1")), Seq("d1"))
        .join(pk.select(col("vec_id").as("d2"), col("pv").as("v2"), col("nrm").as("n2")), Seq("d2"))
        .select(col("d1"), col("d2"),
          FP.nano(V2.dotPacked(col("v1"), col("v2")) / (col("n1") * col("n2"))).as("cos_n"))
        .filter(col("cos_n") >= 350000000L)
      time("scoring only (default plan)")(count(scoredSmj))
      val scoredBc = candCk
        .join(broadcast(pk.select(col("vec_id").as("d1"), col("pv").as("v1"), col("nrm").as("n1"))), Seq("d1"))
        .join(broadcast(pk.select(col("vec_id").as("d2"), col("pv").as("v2"), col("nrm").as("n2"))), Seq("d2"))
        .select(col("d1"), col("d2"),
          FP.nano(V2.dotPacked(col("v1"), col("v2")) / (col("n1") * col("n2"))).as("cos_n"))
        .filter(col("cos_n") >= 350000000L)
      time("scoring only (explicit bcast)")(count(scoredBc))
      // and the pure dot cost: join-free synthetic pairing
      println("[s10] default scoring joins: " + scoredSmj.queryExecution.executedPlan
        .toString.linesIterator.filter(_.contains("Join")).map(_.trim.take(60)).mkString(" | "))
      time("q43 full")(count(SparkEntry.queries("q43_embedding_neardup")(spark, dir)))
      time("q67 full")(count(SparkEntry.queries("q67_semantic_clusters")(spark, dir)))
    }
    if (which == "all" || which == "q36") {
      time("q36 cand")(count(
        graft.queries.TextQueries.scale10Candidates("q36_ngram_jaccard")(spark, dir)))
      time("q36 full")(count(SparkEntry.queries("q36_ngram_jaccard")(spark, dir)))
    }
    if (which == "all" || which == "q134") {
      time("q134 anchors")(count(
        graft.queries.TextQueries.substringAnchorsProbe(spark, dir)))
      time("q134 cand")(count(
        graft.queries.TextQueries.scale10Candidates("q134_substring_dedup")(spark, dir)))
      time("q134 full")(count(SparkEntry.queries("q134_substring_dedup")(spark, dir)))
    }
    if (which == "all" || which == "q97") {
      time("q97 dots")(count(
        graft.queries.TextQueries.scale10Candidates("q97_sparse_cosine")(spark, dir)))
      time("q97 full")(count(SparkEntry.queries("q97_sparse_cosine")(spark, dir)))
      time("q102 full")(count(SparkEntry.queries("q102_hybrid_rank")(spark, dir)))
    }
    graft.Bench.deleteRec(dir)
    spark.stop()
  }
}
