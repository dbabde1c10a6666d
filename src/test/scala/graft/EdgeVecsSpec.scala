package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Degenerate-EMBEDDING robustness, the vector twin of [[EdgeDocsSpec]]:
  * the generator's embeddings are always non-null, full-width and
  * non-zero, so the driver's oracle gate cannot catch a kernel that only
  * crashes on a dirty one — and under ANSI a single zero-norm vector
  * aborted every cosine query (DIVIDE_BY_ZERO), a null embedding NPE'd
  * the trainer collects, and a short array would throw
  * INVALID_ARRAY_INDEX (all observed before the `vecs` validity gate).
  * Semantics pinned here: degenerate vectors never enter similarity
  * results; every id still appears where the query promises totality
  * (q67's clusters). */
class EdgeVecsSpec extends SparkSuite {
  import spark.implicits._

  private val Dim = 64
  // ids of the planted degenerates
  private val ZeroId = 7L
  private val NullId = 13L
  private val ShortId = 21L

  /** sf0.001 with its embeddings REPLACED by a dirty corpus: 80 rows
    * (above the PQ trainers' 64-vector minimum) including a zero-norm
    * vector, a NULL embedding and a wrong-width array. */
  private lazy val dir: String = {
    val dst = graft.TempDirs.create("graft-edgevecs")
    val src = java.nio.file.Paths.get("/root/testdata/sf0.001")
    Files.list(src).forEach { p =>
      Files.copy(p, dst.resolve(p.getFileName.toString))
    }
    Files.delete(dst.resolve("embeddings.parquet"))
    val rows = (0 until 80).map { i =>
      val v: Seq[Float] =
        if (i == ZeroId) Seq.fill(Dim)(0.0f)
        else if (i == NullId) null
        else if (i == ShortId) Seq(1.0f, 2.0f) // wrong width
        else (0 until Dim).map(k => ((i * 31 + k * 7) % 17 - 8).toFloat / 8f)
      (i.toLong, v, i % 4)
    }
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(dst.resolve("embeddings.parquet").toString)
    dst.toString
  }

  test("sweep: every embedding query survives the dirty corpus") {
    val embQs = SparkEntry.queries.keys.toSeq.sorted.filter(n =>
      Seq("q39", "q40", "q41", "q42", "q43", "q44", "q45", "q46", "q67",
        "q69", "q78", "q87", "q99", "q106", "q107", "q111",
        "q113", "q119", "q122").exists(n.startsWith))
    val failures = embQs.flatMap { name =>
      try { SparkEntry.queries(name)(spark, dir).count(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    assert(failures.isEmpty,
      s"queries crashed on the dirty embeddings:\n${failures.mkString("\n")}")
  }

  test("degenerate vectors never appear as neighbors or near-dup endpoints") {
    val bad = Set(ZeroId, NullId, ShortId)
    val knn = SparkEntry.queries("q40_knn_bruteforce")(spark, dir)
      .select($"q_id", $"n_id").as[(Long, Long)].collect()
    assert(knn.nonEmpty)
    assert(!knn.exists { case (q, n) => bad(q) || bad(n) })
    val pairs = SparkEntry.queries("q43_embedding_neardup")(spark, dir)
      .select($"d1", $"d2").as[(Long, Long)].collect()
    assert(!pairs.exists { case (a, b) => bad(a) || bad(b) })
  }

  test("q67 still clusters EVERY id — degenerates as their own singletons") {
    val out = SparkEntry.queries("q67_semantic_clusters")(spark, dir)
      .select($"vec_id", $"cluster", $"is_canonical")
      .as[(Long, Long, Boolean)].collect()
    assert(out.map(_._1).toSet == (0L until 80L).toSet,
      "cluster resolution must stay total over vec_ids")
    for (id <- Seq(ZeroId, NullId, ShortId)) {
      val r = out.find(_._1 == id).get
      assert(r._2 == id && r._3, s"degenerate $id must be its own canonical")
    }
  }
}
