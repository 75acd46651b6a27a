package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** R12: atomic append-commit fencing shared by the streaming indexes
  * ([[IncrementalIndex]], [[NearDupIndex]]) — closes the crash window
  * the r11 protocol had between "parquet files appended" and "commit
  * marker written", where a restart would replay with `replay = false`
  * and double-append (ADVICE r11).
  *
  * Protocol per batch:
  *
  *  1. [[beginOrRecover]] — if the COMMIT marker exists the batch is a
  *     replay (mutation is skipped; [[committedFiles]] lists exactly the
  *     files it appended, for index exclusion). Otherwise, a leftover
  *     INTENT marker means a prior attempt crashed mid-append: the live
  *     data-file listing is diffed against the intent's pre-append
  *     snapshot and the orphaned half-commit is DELETED, restoring the
  *     exact pre-append state before anything is read.
  *  2. [[commit]] — writes the intent marker (atomic rename) carrying
  *     the current listing, runs the append, writes the commit marker
  *     (atomic rename) carrying the appended-file diff, then drops the
  *     intent. A crash at ANY point leaves either a recoverable intent
  *     or a completed commit — never an unfenced half-append.
  *
  * Marker writes go through a same-directory temp file + ATOMIC_MOVE so
  * a torn marker can't be misread as a (partial) file list. On object
  * stores without atomic rename a deployment maps this onto the store's
  * conditional-put; the protocol shape is unchanged.
  */
final class CommitProtocol(dataDir: String, commitsDir: String, batchId: Long) {

  private val commitPath: Path = Paths.get(commitsDir, batchId.toString)
  private val intentPath: Path = Paths.get(commitsDir, s"$batchId.intent")

  private def readMarker(p: Path): Set[String] = {
    import scala.jdk.CollectionConverters._
    Files.readAllLines(p).asScala.filter(_.nonEmpty).toSet
  }

  private def writeMarkerAtomic(p: Path, names: Set[String]): Unit = {
    Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(s"${p.getFileName}.tmp")
    Files.write(tmp, names.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  @volatile private var rolled = false

  /** Did [[beginOrRecover]] delete a half-committed append? (Callers
    * holding cached file listings over `dataDir` must refresh.) */
  def rolledBack: Boolean = rolled

  /** True = this batchId already committed (skip mutation). Side
    * effects: rolls back a crashed half-append (intent without commit)
    * by deleting the orphaned data files; clears a stale intent left by
    * a crash between commit-marker write and intent delete. */
  def beginOrRecover(): Boolean =
    if (Files.exists(commitPath)) {
      Files.deleteIfExists(intentPath)
      true
    } else {
      if (Files.exists(intentPath)) {
        val snapshot = readMarker(intentPath)
        val orphans = CommitProtocol.listParquet(dataDir) -- snapshot
        orphans.foreach(n => Files.deleteIfExists(Paths.get(dataDir, n)))
        rolled = orphans.nonEmpty
      }
      false
    }

  /** The files this batch appended (valid only when [[beginOrRecover]]
    * returned true). */
  def committedFiles: Set[String] =
    if (Files.exists(commitPath)) readMarker(commitPath) else Set.empty

  /** Fence `append` between the intent and commit markers. */
  def commit(append: => Unit): Unit = {
    val before = CommitProtocol.listParquet(dataDir)
    writeMarkerAtomic(intentPath, before)
    append
    writeMarkerAtomic(commitPath, CommitProtocol.listParquet(dataDir) -- before)
    Files.deleteIfExists(intentPath)
  }
}

object CommitProtocol {
  def apply(dataDir: String, commitsDir: String, batchId: Long): CommitProtocol =
    new CommitProtocol(dataDir, commitsDir, batchId)

  /** Drop every intent/commit marker under `commitsDir` — MUST run in
    * every index `init`/reset: a re-initialized index that keeps old
    * markers would treat the first re-served batchIds as replays and
    * silently skip their appends (every later duplicate of those docs
    * then passes as new). */
  def resetMarkers(commitsDir: String): Unit = {
    val d = Paths.get(commitsDir)
    if (Files.isDirectory(d)) {
      import scala.jdk.CollectionConverters._
      Files.walk(d).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
    }
  }

  /** Flat listing of the committed parquet files in a directory
    * (Spark's in-flight `_temporary`/dot files excluded). */
  def listParquet(dir: String): Set[String] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) Set.empty
    else {
      import scala.jdk.CollectionConverters._
      val s = Files.list(d)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
        .toSet
      finally s.close()
    }
  }
}
