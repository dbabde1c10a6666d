package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verified engine capability: a Spark query over the test tables and,
  * when SQL-expressible, an equivalent DuckDB oracle query. Column names and
  * row ordering must match between the two (the harness hash-compares). */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def defs: Map[String, QueryDef]
}

/** Session-scoped memo on a (session, key) pair — the ArgoQueries
  * FrameCache discipline generalized: keyed WEAKLY by the session object
  * (a stopped session must never be pinned — it holds the whole
  * SparkContext + plan graph; an identity-hash key would both pin it
  * forever and risk serving another session's entry on a hash collision),
  * with stopped-session eviction on every touch, so a process cycling
  * sessions is bounded at live sessions plus at most the stopped ones
  * created since the last touch. */
private[graft] final class SessionMemo[V] {
  /** Lazy cell: TrieMap.getOrElseUpdate may evaluate its default in TWO
    * racing first callers (only one insertion wins, but both builds run)
    * — for a memo whose build materializes a localCheckpoint that means
    * a duplicate checkpoint whose orphaned blocks stay pinned until
    * session end. Racing callers may construct two Holders (cheap), but
    * both receive the WINNING one and force its single lazy build. */
  private final class Holder(build: () => V) { lazy val value: V = build() }

  private val cache = new java.util.WeakHashMap[SparkSession,
    scala.collection.concurrent.TrieMap[String, Holder]]()

  def getOrElseUpdate(s: SparkSession, key: String)(build: => V): V = {
    val per = cache.synchronized {
      val it = cache.entrySet().iterator()
      while (it.hasNext) {
        val k = it.next().getKey
        if (k != null && k.sparkContext.isStopped) it.remove()
      }
      cache.computeIfAbsent(s,
        _ => scala.collection.concurrent.TrieMap.empty[String, Holder])
    }
    per.getOrElseUpdate(key, new Holder(() => build)).value
  }

  /** Drop this session's entries (e.g. after the caller destroyed their
    * backing blocks — a truncated-lineage checkpoint cannot be rebuilt,
    * so the memo must forget it rather than serve a dead frame). */
  def invalidate(s: SparkSession): Unit =
    cache.synchronized { Option(cache.get(s)).foreach(_.clear()) }
}

/** Golden-fixture oracles for queries whose kernels are not reasonably
  * SQL-expressible (cubic spline, gammat bisection, the EAPE aggregation).
  *
  * The engine's numeric SEMANTICS for these are validated by analytic
  * oracles in the ScalaTest suite (ArgoPipelineSpec's smooth-field
  * reproduction, InterpSpec/Teos10Spec check values); the fixture makes the
  * result additionally verifiable by the driver's DuckDB gate: every
  * contributing kernel is deterministic per-row and every aggregation is
  * fixed-point (partition-invariant), so a re-run must be bit-identical to
  * the committed parquet, under any parallelism. Fixtures are produced by
  * `graft.tools.MakeFixtures` for each testdata scale factor; the SQL
  * selects the right one by probing the customer table's row count. */
object FixtureOracle {
  /** (sf directory name, customer row count) for each generated scale. */
  val Scales: Seq[(String, Long)] =
    Seq(("sf0.001", 150L), ("sf0.01", 1500L), ("sf0.1", 15000L))

  /** Fixture location; override with -Dgraft.fixtures.dir for checkouts
    * living elsewhere (the SQL bakes the path at Verify time, so the
    * property must be set on the JVM that runs Verify). */
  val Root: String =
    sys.props.getOrElse("graft.fixtures.dir", "/root/repo/fixtures")

  def sql(name: String): String =
    Scales.map { case (sf, nCust) =>
      s"""SELECT * FROM read_parquet('$Root/$sf/$name.parquet/*.parquet')
         |WHERE (SELECT count(*) FROM customer) = $nCust""".stripMargin
    }.mkString("\nUNION ALL\n")
}
