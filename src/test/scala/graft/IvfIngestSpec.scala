package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.EmbeddingQueries

/** Semantics of q122 (incremental vector ingest) the oracle gate cannot
  * see — the gate proves both engines compute the identical frozen-
  * quantizer routing and union search; these tests pin WHY the operator
  * is shaped that way:
  *  - a vector ingested after the index was built is immediately
  *    searchable, served from the delta tier (src = 'delta') at the rank
  *    its similarity earns — here rank 1, beating every stored neighbor;
  *  - arrivals are routed BY the frozen quantizer, not by their own
  *    metadata: a delta row whose label says cell 2 but whose vector
  *    sits at cell 0's centroid must be found by a cell-0 probe (label
  *    routing would file it in an unprobed cell and silently lose it);
  *  - the quantizer is FROZEN: an adversarial delta batch (a huge
  *    anti-aligned vector that would yank a centroid if ingest
  *    re-trained) must not change which cells a probe scans — the
  *    store-side candidate set is identical under any delta.
  * All vector components are small dyadic rationals (exact in Float),
  * so the double↔float casts inside the helper are lossless.
  */
class IvfIngestSpec extends SparkSuite {
  import spark.implicits._

  private val Dim = 64

  /** A Dim-wide vector with the given (index -> value) components. */
  private def v(parts: (Int, Double)*): Seq[Double] = {
    val a = Array.fill(Dim)(0.0)
    parts.foreach { case (i, x) => a(i) = x }
    a.toSeq
  }

  private def df(rows: Seq[(Int, Long, Seq[Double])]): DataFrame =
    rows.toDF("label", "vec_id", "vec")

  // Three well-separated stored cells. Label 1's vectors carry a small
  // +e0 component so a cell-0 probe prefers cell 1 over cell 2 as its
  // second probe WITHOUT relying on the tie-break (see the freeze test).
  // vec_id 0 satisfies the probe predicate (id % 50 == 0, id < 2000).
  private val stored = Seq(
    (0, 0L, v(0 -> 1.0)),
    (0, 2L, v(0 -> 1.0, 3 -> 0.25)),
    (0, 4L, v(0 -> 1.0, 4 -> 0.25)),
    (1, 1L, v(1 -> 1.0, 0 -> 0.125)),
    (1, 11L, v(1 -> 1.0, 0 -> 0.125, 5 -> 0.25)),
    (1, 21L, v(1 -> 1.0, 0 -> 0.125, 6 -> 0.25)),
    (2, 7L, v(2 -> 1.0)),
    (2, 17L, v(2 -> 1.0, 7 -> 0.25)))

  test("an ingested vector is immediately searchable — and routed by the quantizer, not its label") {
    // the arrival CLAIMS label 2 but its vector sits on cell 0's
    // centroid direction; probe 0 scans cells {0, 1}, so label routing
    // would lose it while quantizer routing must surface it at rank 1
    val delta = Seq((2, 103L, v(0 -> 1.0, 8 -> 0.125)))
    val out = EmbeddingQueries
      .ivfIngestSearch(df(stored), df(delta))
      .filter($"q_id" === 0L)
      .select($"rank", $"n_id", $"src")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(out.nonEmpty, "probe 0 returned no neighbors")
    assert(out.head == ((1L, 103L, "delta")),
      s"expected the ingested vector at rank 1 from the delta tier, got ${out.head}")
    assert(out.tail.forall(_._3 == "store"),
      s"every other neighbor is stored, got $out")
  }

  test("the quantizer is frozen: an adversarial delta batch cannot re-route probes") {
    // -10000*e0 anti-aligns with cell 0; if ingest re-trained cells on
    // store+delta it would drag the centroid it lands in (cell 1, the
    // least-negative cosine) and flip probe 0's second probed cell from
    // 1 to 2 — observable as a different store-side candidate set
    val benign = Seq((0, 103L, v(9 -> 0.5)))
    val adversarial = Seq((0, 103L, v(0 -> -10000.0)))
    def storeSide(delta: Seq[(Int, Long, Seq[Double])]): Set[Long] =
      EmbeddingQueries.ivfIngestSearch(df(stored), df(delta), topK = 100)
        .filter($"q_id" === 0L && $"src" === "store")
        .select($"n_id").as[Long].collect().toSet
    val a = storeSide(benign)
    val b = storeSide(adversarial)
    assert(a == b,
      s"store-side candidates moved under an adversarial delta: $a vs $b")
    // the probe scans cells {0, 1}: its own cellmates plus label 1
    assert(a == Set(2L, 4L, 1L, 11L, 21L),
      s"expected cells {0,1}'s stored rows, got $a")
  }

  test("q122 on the test corpus: delta rows appear in results and every probe keeps top-3 totality") {
    val out = SparkEntry.queries("q122_ivf_ingest")(spark, "/root/testdata/sf0.001")
      .select($"q_id", $"rank", $"n_id", $"src")
      .as[(Long, Long, Long, String)].collect()
    assert(out.nonEmpty)
    // every returned delta-tier hit is really a delta id (ids ≡ 3 mod 5)
    val wrongTier = out.filter { case (_, _, n, src) =>
      (src == "delta") != (n % 5 == 3)
    }
    assert(wrongTier.isEmpty, s"tier/id mismatch: ${wrongTier.take(5).toSeq}")
    // the ingest is not a no-op on this corpus: some delta rows rank
    val deltaHits = out.count(_._4 == "delta")
    assert(deltaHits > 0, "no ingested vector reached any top-3 — degenerate")
    // totality: each probe returns exactly 3 ranked rows
    val perProbe = out.groupBy(_._1).values
    assert(perProbe.forall(rs => rs.map(_._2).sorted.sameElements(Seq(1L, 2L, 3L))))
  }
}
