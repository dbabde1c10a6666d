package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline primitives shared between the Spark queries and their
  * DuckDB oracles.
  *
  * Everything here is built from codegen'd higher-order functions
  * (`transform`/`filter`/`aggregate`) over array columns — no UDFs — so the
  * hot path stays inside whole-stage codegen and the exact same arithmetic
  * can be written as DuckDB SQL (`list_transform`/`list_filter`/
  * `list_reduce`). Each Spark helper has a `sql*` twin generating the oracle
  * fragment from the SAME constants, so the two engines cannot drift.
  *
  * Scale note: all operators below are per-row (narrow) until an explicit
  * groupBy/join; at 100 TB they run map-side with zero shuffle.
  */
object TextFns {
  /** Modulus for the canonical polynomial char hash: a prime below 1e15 so
    * `acc*31 + code` (< 3.2e16) never overflows a signed 64-bit long. */
  val HashMod = 999999999999989L
  val HashMult = 31L
  val HashSeed = 7L

  /** MinHash parameterization: K permutations h_j(x) = (a_j·x + b_j) mod P,
    * banded into BANDS groups of ROWS for LSH bucketing. */
  val MinHashK = 8
  val MinHashBands = 4
  val MinHashRows: Int = MinHashK / MinHashBands
  def permA(j: Int): Long = 2L * j + 3L // odd, tiny: a·x < 2e16 stays in Long
  def permB(j: Int): Long = 12345L * j + 678L

  /** SimHash over the low `SimHashBits` bits of the char hash (our hash is
    * < 1e15 ≈ 2^50, so higher bits carry no signal). */
  val SimHashBits = 48
  /** Hamming-LSH: split the fingerprint into chunks; near-dups (small
    * Hamming distance) must agree on at least one chunk. */
  val SimHashChunkBits = 12
  val SimHashChunks: Int = SimHashBits / SimHashChunkBits

  // ---- canonical char hash ------------------------------------------------

  /** Polynomial rolling hash of a string: fold (acc·31 + codepoint) mod P
    * over the characters. Deterministic, engine-portable (ASCII + BMP). */
  def charHash(s: Column): Column =
    aggregate(
      transform(split(s, ""), c => ascii(c).cast("long")),
      lit(HashSeed),
      (acc, c) => (acc * HashMult + c) % HashMod)

  /** DuckDB twin of [[charHash]] for an SQL expression `e`. */
  def sqlCharHash(e: String): String =
    s"list_reduce(list_prepend(CAST($HashSeed AS BIGINT), " +
      s"list_transform(string_split($e, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(acc, c) -> (acc * $HashMult + c) % $HashMod)"

  /** Normalized content fingerprint: the rolling hash over the
    * whitespace-collapsed lowercased text. THE dedup key — q37 verifies it
    * against the DuckDB oracle and [[graft.sources.DocStore]] buckets on
    * it, so both must build the identical expression from here (a second
    * copy drifting would silently split dedup groups). */
  def contentFingerprint(text: Column): Column =
    CharHashExpr.charHashNative(regexp_replace(lower(text), "\\s+", " "))

  /** DuckDB twin of [[contentFingerprint]]. */
  def sqlContentFingerprint(e: String): String =
    sqlCharHash(s"regexp_replace(lower($e), '\\s+', ' ', 'g')")

  // ---- tokenization -------------------------------------------------------

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  def sqlTokens(e: String): String = s"string_split_regex(lower($e), '\\s+')"

  /** Word k-shingles joined by a single space. */
  def shingles(words: Column, k: Int): Column =
    transform(
      sequence(lit(0), greatest(size(words) - k, lit(-1))),
      i => concat_ws(" ", (0 until k).map(o => element_at(words, i + o + 1)): _*))

  /** DuckDB twin: `w` must be a list expression (1-based indexing). */
  def sqlShingles(w: String, k: Int): String = {
    val parts = (0 until k).map(o => s"$w[i + $o]").mkString(" || ' ' || ")
    s"list_transform(range(1, len($w) - ${k - 2}), i -> $parts)"
  }

  // ---- minhash ------------------------------------------------------------

  /** MinHash signature j (0-based): min over shingle hashes of the j-th
    * permutation. `hashes` is an array<long> of shingle char-hashes. */
  def minhash(hashes: Column, j: Int): Column =
    array_min(transform(hashes, x => (x * permA(j) + permB(j)) % HashMod))

  def sqlMinhash(hashesExpr: String, j: Int): String =
    s"list_min(list_transform($hashesExpr, x -> (x * ${permA(j)} + ${permB(j)}) % $HashMod))"

  // ---- simhash ------------------------------------------------------------

  /** Intra-row SimHash of an array of token hashes: bit b of the fingerprint
    * is set iff more than half the tokens have bit b set.
    * (`call_function` because the Scala `shiftright` helper only accepts a
    * literal shift; the underlying SQL expression takes any column.) */
  def simhash(hashes: Column): Column =
    aggregate(
      sequence(lit(0), lit(SimHashBits - 1)),
      lit(0L),
      (acc, b) =>
        acc + when(
          size(filter(hashes,
            h => call_function("shiftright", h, b) % 2 === 1)) * 2
            > size(hashes),
          call_function("shiftleft", lit(1L), b)).otherwise(0L))

  def sqlSimhash(hashesExpr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, $SimHashBits), " +
      s"b -> CASE WHEN 2 * len(list_filter($hashesExpr, h -> (h >> b) % 2 = 1)) " +
      s"> len($hashesExpr) THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)), " +
      s"(acc, x) -> acc + x)"

  /** Chunk c of a SimHash fingerprint for Hamming-LSH bucketing. */
  def simhashChunk(sig: Column, c: Int): Column =
    shiftright(sig, c * SimHashChunkBits) % (1 << SimHashChunkBits)

  def sqlSimhashChunk(sigExpr: String, c: Int): String =
    s"(($sigExpr >> ${c * SimHashChunkBits}) % ${1 << SimHashChunkBits})"

  /** Hamming distance between two fingerprints (popcount of XOR). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  def sqlHamming(a: String, b: String): String = s"bit_count(xor($a, $b))"

  // ---- compiled kernels (hot path) ----------------------------------------
  // The HOF forms above are the executable specification (and generate the
  // DuckDB oracles); these compiled twins produce BIT-IDENTICAL results and
  // run ~100× faster — higher-order-function lambdas are interpreted
  // per-element, which dominates wall-time once documents × shingles ×
  // chars reaches millions. Queries use these; oracles stay on the SQL.

  private[graft] def charHashJvm(s: String): Long = {
    // split("", "") yields [""] in both Spark and DuckDB, so the spec hash
    // of the empty string takes ONE fold step with codepoint 0
    if (s.isEmpty) return (HashSeed * HashMult) % HashMod
    var acc = HashSeed
    var i = 0
    while (i < s.length) { acc = (acc * HashMult + s.charAt(i)) % HashMod; i += 1 }
    acc
  }

  private[graft] def tokensJvm(text: String): Array[String] =
    text.toLowerCase.split("\\s+", -1) // limit -1 matches Spark's split

  private[graft] def shinglesJvm(words: Array[String], k: Int): Array[String] =
    if (words.length < k) Array.empty
    else Array.tabulate(words.length - k + 1)(i => words.slice(i, i + k).mkString(" "))

  // ---- packed hash sets ---------------------------------------------------
  // Distinct shingle hashes SORTED and packed to flat bytes (8 B each):
  // pair-joins then carry one binary value per document, equality (LSH
  // candidate dedup) is a byte compare, and pairwise Jaccard is a
  // merge-walk over two long streams with zero boxing. Sorting is free
  // semantically — every consumer (minhash, Jaccard, SimHash votes) is
  // order-independent over the SET.

  private def sortedHashes(text: String, k: Int): Array[Long] = {
    val set = scala.collection.mutable.LinkedHashSet.empty[Long]
    shinglesJvm(tokensJvm(text), k).foreach(sh => set += charHashJvm(sh))
    val arr = set.toArray
    java.util.Arrays.sort(arr)
    arr
  }

  private def packLongs(arr: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * arr.length)
    var i = 0
    while (i < arr.length) { bb.putLong(arr(i)); i += 1 }
    bb.array()
  }

  /** text → sorted distinct k-shingle hashes, packed. */
  def shingleHashesPacked(k: Int): Column => Column = {
    val u = udf((text: String) => packLongs(sortedHashes(text, k)))
    u(_)
  }

  /** text → sorted distinct k-shingle hashes as array<long> (the unpacked
    * twin, for queries that explode the set into a join — q57). */
  def shingleHashes(k: Int): Column => Column = {
    val u = udf((text: String) => sortedHashes(text, k))
    u(_)
  }

  /** packed hashes → the first `k` minhash signatures in one pass.
    * Overflow-safe for any practical k: permA(k-1)·x < (2k+1)·1e15 stays
    * far inside a signed 64-bit long. */
  def minhashSigsPackedK(k: Int): Column => Column = {
    val u = udf((p: Array[Byte]) => {
      val bb = java.nio.ByteBuffer.wrap(p)
      val sigs = Array.fill(k)(Long.MaxValue)
      var off = 0
      while (off < p.length) {
        val x = bb.getLong(off)
        var j = 0
        while (j < k) {
          val h = (x * permA(j) + permB(j)) % HashMod
          if (h < sigs(j)) sigs(j) = h
          j += 1
        }
        off += 8
      }
      sigs.toSeq
    })
    u(_)
  }

  /** packed hashes → all [[MinHashK]] signatures (the q34 LSH banding). */
  val minhashSigsPacked: Column => Column = minhashSigsPackedK(MinHashK)

  /** (doc_id, hs, band, key) LSH band buckets for a (doc_id, text)
    * frame — THE band construction, shared (via the delegating alias in
    * [[graft.queries.TextQueries.minhashBandFrame]]) by the q34 pair
    * join, the q110 ingest tiers, the q101 streaming first-seen dedup,
    * and the StreamingSpec replay (a second copy drifting would bucket
    * one consumer's docs differently from another's and silently miss
    * duplicates). Lives with the other text primitives so at-rest
    * sources can build it without reaching into the query layer. */
  def minhashBandFrame(docsDf: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val base = docsDf
      .select(col("doc_id"), shingleHashesPacked(3)(col("text")).as("hs"))
    val withSigs = base
      .withColumn("sigs", minhashSigsPacked(col("hs")))
      .select(
        (col("doc_id") +: col("hs") +:
          (0 until MinHashK).map(j =>
            element_at(col("sigs"), j + 1).as(s"sig$j"))): _*)
    // band key = the signature slice, stringified (portable join key)
    withSigs.select(
      col("doc_id"), col("hs"),
      explode(array((0 until MinHashBands).map { b =>
        struct(lit(b).as("band"),
          concat_ws(":", (0 until MinHashRows)
            .map(r => col(s"sig${b * MinHashRows + r}")): _*).as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("hs"), col("bk.band"), col("bk.key"))
  }

  /** packed hashes → SimHash fingerprint (same semantics as [[simhash]]). */
  val simhashPacked: Column => Column = {
    val u = udf((p: Array[Byte]) => {
      val bb = java.nio.ByteBuffer.wrap(p)
      val n = p.length / 8
      var sig = 0L
      var b = 0
      while (b < SimHashBits) {
        var set = 0
        var off = 0
        while (off < p.length) {
          if (((bb.getLong(off) >>> b) & 1L) == 1L) set += 1
          off += 8
        }
        if (2 * set > n) sig |= (1L << b)
        b += 1
      }
      sig
    })
    u(_)
  }

  /** Exact Jaccard in micro-units over two packed SORTED hash sets:
    * merge-walk over the byte streams, zero per-pair allocation. Native
    * codegen expression, not a UDF — the per-pair dispatch matters once
    * LSH hands over millions of candidates ([[JaccardMicroPackedExpr]]). */
  val jaccardMicroPacked: (Column, Column) => Column =
    JaccardMicroPackedExpr.jaccardMicroNative(_, _)
}
