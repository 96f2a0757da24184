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
}
