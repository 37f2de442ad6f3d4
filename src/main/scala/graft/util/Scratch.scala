package graft.util

import java.nio.file.{Files, Path, Paths}

/** /tmp hygiene for the per-run scratch dirs (r10 advice: repeated
  * Verify/Bench runs accumulated unbounded `/tmp/graft_run_<pid>` and
  * warmup temp data).
  *
  * Two disciplines, because the lifetimes differ:
  *  - [[deleteOnExit]] — for dirs only this JVM reads (Bench warmup /
  *    headline staging). Best-effort recursive delete in a shutdown
  *    hook.
  *  - [[sweepStaleRuns]] — for `SparkEntry.runScratch`, which MUST
  *    outlive the JVM: the driver replays `oracle_sql.json` in DuckDB
  *    after Verify exits, and the roundtrip queries' oracle SQL reads
  *    files under that dir. So the current run's dir is never touched;
  *    instead each Verify/Bench startup deletes sibling run dirs whose
  *    owning pid is dead (or, for non-pid SPARK_GRAFT_RUN_ID names,
  *    whose mtime is older than a day) — accumulation is bounded to
  *    the last run per live JVM.
  */
object Scratch {
  private val registered = java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()
  @volatile private var hooked = false
  private def ensureHook(): Unit = if (!hooked) synchronized {
    if (!hooked) {
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        registered.forEach(p => deleteRecursively(p))))
      hooked = true
    }
  }

  /** Register a dir for best-effort recursive deletion at JVM exit. */
  def deleteOnExit(p: Path): Path = { ensureHook(); registered.add(p); p }

  def deleteRecursively(p: Path): Unit =
    try {
      if (Files.exists(p)) {
        val s = Files.walk(p)
        try s.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
        finally s.close()
      }
    } catch { case _: Exception => () } // best-effort: never fail a run over /tmp

  /** Create the current run's scratch dir and record the owning pid in
    * an `OWNER_PID` marker, so a custom-SPARK_GRAFT_RUN_ID run that
    * outlives `maxAgeMs` is liveness-checked (not mtime-guessed) by a
    * later startup's [[sweepStaleRuns]]. */
  def claim(self: String): Unit =
    try {
      val dir = Paths.get(self)
      Files.createDirectories(dir)
      Files.write(dir.resolve("OWNER_PID"),
        ProcessHandle.current().pid().toString.getBytes("UTF-8"))
    } catch { case _: Exception => () }

  /** Delete stale `/tmp/graft_run_*` dirs from PREVIOUS runs: numeric
    * suffixes are pids — removed when the pid is dead; opaque
    * SPARK_GRAFT_RUN_ID suffixes are removed when their `OWNER_PID`
    * marker names a dead pid (falling back to age > `maxAgeMs` for
    * dirs without a marker). A marker naming a LIVE pid always keeps
    * the dir, however old — a >24h run can no longer lose its scratch
    * to a concurrent startup. The current run's dir (`self`) is always
    * kept for the post-exit DuckDB replay. */
  def sweepStaleRuns(self: String, maxAgeMs: Long = 24L * 3600 * 1000): Unit =
    try {
      val tmp = Paths.get("/tmp")
      if (Files.isDirectory(tmp)) {
        val s = Files.list(tmp)
        try s.filter(p => p.getFileName.toString.startsWith("graft_run_"))
          .forEach { p =>
            if (p.toString != self) {
              val suffix = p.getFileName.toString.stripPrefix("graft_run_")
              def pidDead(pid: Long): Boolean =
                ProcessHandle.of(pid).map[Boolean](!_.isAlive).orElse(true)
              val stale = suffix.toLongOption match {
                case Some(pid) => pidDead(pid)
                case None =>
                  val marker = p.resolve("OWNER_PID")
                  val owner =
                    if (Files.isRegularFile(marker))
                      new String(Files.readAllBytes(marker), "UTF-8").trim.toLongOption
                    else None
                  owner match {
                    case Some(pid) => pidDead(pid)
                    case None =>
                      System.currentTimeMillis() - Files.getLastModifiedTime(p).toMillis > maxAgeMs
                  }
              }
              if (stale) deleteRecursively(p)
            }
          }
        finally s.close()
      }
    } catch { case _: Exception => () }
}
