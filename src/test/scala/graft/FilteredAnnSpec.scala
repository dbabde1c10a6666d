package graft

import org.apache.spark.sql.functions._

/** Properties of q111 (metadata-filtered ANN) the oracle gate cannot
  * see. The oracle proves the engine computes the pre-filter semantics
  * it declares; these tests pin WHY that semantics (and plan) is the
  * production-correct one:
  *  - post-filtering an unfiltered top-k silently loses most of the
  *    answer for a selective predicate (the measured loss, asserted);
  *  - the predicate reaches the documents parquet scan as a pushed
  *    filter (at rest the column lives beside the vector and this
  *    becomes a scan-side predicate; either way, never a filter above
  *    the ranking);
  *  - every returned neighbor satisfies the predicate and per-probe
  *    ranks stay contiguous from 1 (no post-hoc holes).
  */
class FilteredAnnSpec extends SparkSuite {
  private val d = "/root/testdata/sf0.001"

  test("post-filtering an unfiltered top-k loses neighbors; pre-filter returns the full eligible top-k") {
    val en = Tables.documents(spark, d).filter(col("lang") === "en")
      .select(col("doc_id").as("n_id"))
    // the naive construction a deployment must NOT run: rank over the
    // whole corpus (q111 shares q44's index), then filter the answer
    val post = SparkEntry.queries("q44_ann_ivf")(spark, d)
      .join(en, Seq("n_id")).count()
    val pre = SparkEntry.queries("q111_filtered_ann")(spark, d)
    val preRows = pre.count()
    info(s"post-filter keeps $post of $preRows pre-filter rows " +
      f"(${100.0 * post / preRows}%.0f%%)")
    // ~44% of docs are en, so post-filtering a top-3 keeps ~44% of the
    // slots on average; pre-filtering refills them from the eligible set
    assert(post < preRows,
      s"post-filter ($post) should lose rows vs pre-filter ($preRows)")
    assert(post <= preRows * 3 / 4,
      s"expected a selective predicate to cost post-filter >1/4 of the " +
        s"answer ($post of $preRows)")
  }

  test("every neighbor satisfies the predicate and per-probe ranks are contiguous from 1") {
    val pre = SparkEntry.queries("q111_filtered_ann")(spark, d)
    val nonEn = pre.join(
      Tables.documents(spark, d).filter(col("lang") =!= "en")
        .select(col("doc_id").as("n_id")), Seq("n_id")).count()
    assert(nonEn == 0, s"$nonEn neighbors violate the predicate")
    // rank r present → ranks 1..r present (dense per-probe prefixes)
    val holes = pre.groupBy("q_id")
      .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"))
      .filter(col("n") =!= col("mx")).count()
    assert(holes == 0, s"$holes probes have rank holes (post-hoc filtering?)")
  }

  test("the metadata predicate pushes into the documents scan") {
    val p = SparkEntry.queries("q111_filtered_ann")(spark, d)
      .queryExecution.executedPlan.toString
    assert(p.contains("EqualTo(lang,en)"),
      s"lang predicate not pushed to the parquet scan:\n$p")
  }
}
