package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Integer-exact PageRank: the distributed iteration must match a naive
  * single-threaded reference bit-for-bit (the associativity claim that
  * lets q130 carry an unrolled SQL oracle), be partition-invariant, and
  * respect hand-computable structure (symmetry, star concentration). */
class PageRankSpec extends SparkSuite {
  import spark.implicits._

  /** Naive reference: same truncating integer arithmetic, Maps + loops —
    * including the dangling-mass redistribution (damped dangling sum,
    * truncating even split, remainder to the min-id node). */
  private def naive(edges: Seq[(Long, Long)], iters: Int,
                    dampPm: Long = 850L): Map[Long, Long] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size.toLong
    val minId = nodes.min
    var r = nodes.map(_ -> 1000000L).toMap
    val base = 1000L * (1000L - dampPm)
    for (_ <- 1 to iters) {
      val dm = nodes.filterNot(out.contains).map(r).sum * dampPm / 1000L
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) * dampPm / 1000L / out(s) }.sum).toMap
      r = nodes.map(x => x -> (base + dm / n +
        (if (x == minId) dm % n else 0L) + contrib.getOrElse(x, 0L))).toMap
    }
    r
  }

  private val web: Seq[(Long, Long)] = {
    // a lumpy synthetic web: hub 0 cited by everyone, two cliques, a
    // chain — plus the reverse edges (symmetric, no dangling mass)
    val fwd = (1L to 12L).map(i => (i, 0L)) ++
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (5L, 6L), (6L, 5L),
        (7L, 8L), (8L, 9L), (9L, 10L))
    (fwd ++ fwd.map(_.swap)).distinct
  }

  test("distributed ranks equal the naive integer reference bit-for-bit") {
    // fast path pinned off: this case owns the DISTRIBUTED loop's parity
    // (every test graph here is under the driver cap)
    val got = Graph.pageRank(web.toDF("src", "dst"), iters = 5,
      allowDriverFastPath = false)
      .as[(Long, Long)].collect().toMap
    assert(got == naive(web, 5))
  }

  test("driver fast path ≡ distributed loop on both graph shapes") {
    // the size-conditional fast path (same integer recurrence on a
    // collected edge array) must be output-invisible — symmetric
    // no-dangling AND directed dangling shapes both bit-match the loop
    for (g <- Seq(web, Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 5L),
      (6L, 4L), (7L, 4L), (6L, 1L)))) {
      val fast = Graph.pageRank(g.toDF("src", "dst"), 5)
        .as[(Long, Long)].collect().toMap
      val loop = Graph.pageRank(g.toDF("src", "dst"), 5,
        allowDriverFastPath = false)
        .as[(Long, Long)].collect().toMap
      assert(fast == loop, "fast path diverged from the distributed loop")
      assert(fast == naive(g, 5), "fast path diverged from the reference")
    }
  }

  test("BYTE budget alone forces the distributed loop, output-invariant (r15)") {
    // the r15 byte-aware fast-path cap (Joins.maxRowsSized with
    // Graph.EdgeRowBytes): a graph whose edges × estimated width exceed
    // spark.graft.broadcastMaxBytes must run the loop even under the row
    // cap — pin the budget to 1 and the ranks must not move a bit
    val fast = Graph.pageRank(web.toDF("src", "dst"), 5)
      .as[(Long, Long)].collect().toMap
    val prior = spark.conf.getOption("spark.graft.broadcastMaxBytes")
    spark.conf.set("spark.graft.broadcastMaxBytes", "1")
    val overByte = try Graph.pageRank(web.toDF("src", "dst"), 5)
      .as[(Long, Long)].collect().toMap
    finally prior match {
      case Some(v) => spark.conf.set("spark.graft.broadcastMaxBytes", v)
      case None => spark.conf.unset("spark.graft.broadcastMaxBytes")
    }
    assert(fast == overByte,
      "byte-capped loop diverged from the driver fast path")
  }

  test("partition-invariant: any edge partitioning, identical ranks") {
    val a = Graph.pageRank(web.toDF("src", "dst").repartition(1), 4,
      allowDriverFastPath = false)
      .as[(Long, Long)].collect().toMap
    val b = Graph.pageRank(web.toDF("src", "dst").repartition(7, col("dst")), 4,
      allowDriverFastPath = false)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("structure: a symmetric pair ties; the star center dominates") {
    val pair = Seq((1L, 2L), (2L, 1L))
    val p = Graph.pageRank(pair.toDF("src", "dst"), 3)
      .as[(Long, Long)].collect().toMap
    assert(p(1L) == p(2L))
    val star = (1L to 6L).flatMap(i => Seq((i, 0L), (0L, i)))
    val s = Graph.pageRank(star.toDF("src", "dst"), 5)
      .as[(Long, Long)].collect().toMap
    assert((1L to 6L).forall(i => s(0L) > 2 * s(i)),
      s"star center must dominate its leaves: $s")
  }

  test("per-iteration plan: the checkpointed edge layout never re-shuffles") {
    // the pageRank scale claim — edges are partitioned by src ONCE and
    // every pass moves only the rank vector — rests on localCheckpoint
    // preserving the child's output partitioning in its LogicalRDD; this
    // pins that mechanism on the exact join shape the loop builds
    val edges = web.toDF("src", "dst")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    val e = edges.join(deg, Seq("src"))
      .repartition(col("src")).localCheckpoint()
    val ranks = e.select(col("src").as("id")).distinct()
      .withColumn("r", lit(1000000L)).localCheckpoint()
    val contrib = e.join(ranks, e("src") === ranks("id"))
      .groupBy(col("dst")).agg(sum(col("r")).as("s"))
    contrib.collect()
    val p = contrib.queryExecution.executedPlan.toString
    // only the rank vector may move (a broadcast or an id-keyed shuffle)
    // plus the partial-summed dst aggregation; a src-keyed exchange
    // means the edge layout itself moved again
    assert(!p.contains("Exchange hashpartitioning(src"),
      s"edge layout re-shuffled on src:\n$p")
    // and the dst exchange must carry partial sums, not raw join output
    val lines = p.linesIterator.toVector
    lines.zipWithIndex.foreach { case (ln, i) =>
      if (ln.contains("Exchange hashpartitioning(dst")) {
        val below = lines.drop(i + 1).take(2).mkString("\n")
        assert(below.contains("HashAggregate"),
          s"dst exchange fed by raw join output:\n$ln\n$below")
      }
    }
  }

  test("dangling mass is redistributed, not leaked: naive parity + conservation") {
    // a directed graph with planted dangling nodes: 4 and 5 have no
    // out-edges, and they receive most of the in-links
    val directed = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 5L),
      (6L, 4L), (7L, 4L), (6L, 1L))
    val got = Graph.pageRank(directed.toDF("src", "dst"), 5,
      allowDriverFastPath = false)
      .as[(Long, Long)].collect().toMap
    assert(got == naive(directed, 5),
      "distributed dangling handling differs from the naive reference")
    // total mass is conserved to the truncation bound: exact arithmetic
    // keeps Σr = N·1e6 every iteration (base adds N·(1−d), damping keeps
    // d, dangling redistribution returns the rest); each truncating op
    // loses < 1 µ-unit, ≤ 2 per edge contribution + 1 for the dangling
    // damp per iteration. Without redistribution the two dangling nodes
    // alone would leak ~0.85 × their ~2.9M µ-units EVERY iteration.
    val n = got.size.toLong
    val total = got.values.sum
    val bound = 5L * (2L * directed.size + n + 2L)
    assert(total <= n * 1000000L,
      s"mass created from nothing: $total > ${n * 1000000L}")
    assert(n * 1000000L - total <= bound,
      s"mass leaked beyond the truncation bound: Σr=$total, " +
        s"expected ≥ ${n * 1000000L - bound}")
    // and the redistribution is partition-invariant like the rest
    val rep = Graph.pageRank(
      directed.toDF("src", "dst").repartition(5, col("dst")), 5,
      allowDriverFastPath = false)
      .as[(Long, Long)].collect().toMap
    assert(rep == got)
  }

  test("q133 end-to-end: dangling suppliers keep authority on the directed graph") {
    val rows = SparkEntry.queries("q133_pagerank_dangling")(
      spark, "/root/testdata/sf0.001").as[(Long, Long)].collect().toSeq
    assert(rows.size == 25)
    assert(rows.map(_._2) == rows.map(_._2).sorted.reverse, "not rank-ordered")
    // suppliers (odd ids) are the sinks: with redistribution they still
    // top the list because all link mass flows INTO them before the even
    // split hands it back
    assert(rows.take(5).forall(_._1 % 2 == 1),
      s"expected supplier authorities at the top: ${rows.take(5)}")
  }

  test("q130 end-to-end: 25 authorities, suppliers outrank on the trade graph") {
    val rows = SparkEntry.queries("q130_pagerank")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long)].collect().toSeq
    assert(rows.size == 25)
    assert(rows.map(_._2) == rows.map(_._2).sorted.reverse, "not rank-ordered")
    // sf0.001: far fewer suppliers than customers share the same trade
    // volume, so the top of the authority list is supplier-heavy (odd ids)
    assert(rows.take(5).forall(_._1 % 2 == 1),
      s"expected supplier authorities at the top: ${rows.take(5)}")
  }
}
