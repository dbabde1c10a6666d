package graft

import graft.operators.Bpe

class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("symbolize: chars + end marker, merges replay in learned order") {
    assert(Bpe.symbolize("abc", Nil).toSeq === Seq("a", "b", "c", "</w>"))
    // one merge
    assert(Bpe.symbolize("abc", Seq(("a", "b"))).toSeq ===
      Seq("ab", "c", "</w>"))
    // chained: (a,b) then (ab,c) builds on the first merge's output
    assert(Bpe.symbolize("abc", Seq(("a", "b"), ("ab", "c"))).toSeq ===
      Seq("abc", "</w>"))
    // order matters: (ab,c) before (a,b) never fires on raw chars
    assert(Bpe.symbolize("abc", Seq(("ab", "c"), ("a", "b"))).toSeq ===
      Seq("ab", "c", "</w>"))
  }

  test("symbolize: overlapping pairs consume leftmost-first (greedy)") {
    // "aaa" + (a,a): pairs at (1,2) and (2,3) overlap; greedy takes the
    // first -> [aa, a], not [a, aa]
    assert(Bpe.symbolize("aaa", Seq(("a", "a"))).toSeq ===
      Seq("aa", "a", "</w>"))
    // "aaaa" -> [aa, aa]
    assert(Bpe.symbolize("aaaa", Seq(("a", "a"))).toSeq ===
      Seq("aa", "aa", "</w>"))
  }

  test("train: hand-derived merges on a tiny weighted histogram") {
    // corpus: "low" x5, "lower" x2, "newest" x6, "widest" x3  (the
    // canonical BPE walkthrough shape). Initial pair counts include
    // (e,s): 6+3=9, (s,t): 9, (t,</w>): 9, (w,e): 2+6=8, ...
    // Ties 9-9-9 break lexicographically by (left, right):
    //   (e,s) < (s,t) < (t,</w>)  => first merge is (e,s).
    // Then (es,t): 9 and (t,</w>): 9 -> (es,t) wins lexicographically
    // ('e' < 't'); then (est,</w>): 9 wins over everything at 8.
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L)).toDF("w", "wc")
    val merges = Bpe.train(words, "w", "wc", 4)
    assert(merges.map(m => (m.left, m.right, m.count)).take(3) === Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", "</w>", 9L)))
    // 4th merge: highest remaining is (l,o) 5+2=7 vs (o,w) 7 vs (w,e) 2...
    // (l,o)=7, (o,w)=7, tie -> (l,o) first lexicographically
    assert(merges(3).left === "l" && merges(3).right === "o" &&
      merges(3).count === 7L)
    assert(merges.map(_.step) === Seq(0, 1, 2, 3))
  }

  test("train: stops early when every word is fully merged") {
    val words = Seq(("ab", 3L)).toDF("w", "wc")
    // "ab" = [a, b, </w>] is 3 symbols: 2 merges collapse it to ONE
    // symbol, after which no pairs remain and training stops
    val merges = Bpe.train(words, "w", "wc", 10)
    assert(merges.size === 2)
    assert(Bpe.symbolize("ab",
      merges.map(m => (m.left, m.right))).toSeq.size === 1)
  }

  test("train: partition-invariant (1 vs 4 partitions, distributed loop pinned)") {
    val rows = Seq("the", "cat", "sat", "on", "the", "mat", "the", "cat")
      .groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toSeq
    val w1 = rows.toDF("w", "wc").repartition(1)
    val w4 = rows.toDF("w", "wc").repartition(4)
    assert(Bpe.train(w1, "w", "wc", 6, allowDriverFastPath = false) ===
      Bpe.train(w4, "w", "wc", 6, allowDriverFastPath = false))
  }

  test("train: driver fast path is bit-identical to the distributed loop") {
    // irregular weights so ties and non-ties both occur; enough merges to
    // hit the early-stop region on some words
    val rows = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L), ("wide", 4L), ("nest", 1L))
    val df = rows.toDF("w", "wc")
    val driver = Bpe.train(df, "w", "wc", 10)
    val loop = Bpe.train(df, "w", "wc", 10, allowDriverFastPath = false)
    assert(driver === loop)
  }
}
