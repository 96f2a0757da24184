package graft.ops

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Closed-stream directory listing. `Files.list`/`Files.walk` return
  * lazy streams backed by an open directory handle; materializing
  * through `.iterator().asScala` without closing leaks one handle per
  * call — fatal in a long-running follower that re-lists the commit
  * manifest every batch. These helpers materialize eagerly and close.
  */
object Fs {

  def ls(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala.toSeq
    finally s.close()
  }

  /** Depth-first walk, deepest entries LAST (callers reverse for
    * delete order).
    */
  def walk(dir: Path): Seq[Path] = {
    val s = Files.walk(dir)
    try s.iterator().asScala.toSeq
    finally s.close()
  }

  /** Recursive delete; no-op on a missing path. The ONE copy of the
    * recursive-delete protocol — the stores (ArtifactStore,
    * StreamNswInsert, StreamTokenCounts) and the governance queries
    * all share it, so a hardening lands everywhere at once. */
  def deleteRec(p: Path): Unit = {
    if (Files.isDirectory(p)) ls(p).foreach(deleteRec)
    Files.deleteIfExists(p)
    ()
  }

  /** Wipe a directory by path string (the governance queries' fixture
    * reset). */
  def wipe(dir: String): Unit =
    deleteRec(java.nio.file.Paths.get(dir))
}
