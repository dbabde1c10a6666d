package graft

/** Temp-dir factory with JVM-exit cleanup — the hygiene backstop for
  * every scratch tree this project lands under java.io.tmpdir.
  *
  * Explicit, prompt deletes (Bench's stage `finally` blocks, spec
  * afterAll) remain the first line: they free corpus-sized trees while
  * the process still runs. This factory covers everything that CANNOT be
  * deleted eagerly — session-lifetime artifacts (q108's memoized stream
  * source must outlive every bench rep), spec fixtures whose suite has
  * no afterAll, aborted runs that never reach their finally — which
  * otherwise accumulate for the host's lifetime (measured: 488 leaked
  * `graft-*` trees / 161 MB after eight rounds of test+bench runs).
  * Deletion happens in a shutdown hook, so a crashed JVM cleans up the
  * same as a healthy one (kill -9 excepted — nothing can cover that).
  */
object TempDirs {
  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  // registered lazily so a JVM that never creates a temp dir never
  // installs a hook
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach(deleteRec(_))
    }, "graft-tempdir-cleanup"))

  /** Create a temp directory that is best-effort deleted at JVM exit.
    * Same contract as `Files.createTempDirectory(prefix)`. */
  def create(prefix: String): java.nio.file.Path = {
    hookInstalled
    val p = java.nio.file.Files.createTempDirectory(prefix)
    registered.add(p.toString)
    p
  }

  /** Best-effort recursive delete. A partial delete is reported to
    * stderr, not swallowed — the caller's run still succeeds, but the
    * leak is visible. Safe to call on an already-deleted tree. */
  def deleteRec(root: String): Unit =
    try {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(root)
      if (java.nio.file.Files.exists(p))
        scala.util.Using.resource(java.nio.file.Files.walk(p)) { stream =>
          stream.iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
    } catch { case e: Throwable =>
      System.err.println(s"[tempdirs] deleteRec($root) incomplete: " +
        s"${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(200)}")
    }
}
