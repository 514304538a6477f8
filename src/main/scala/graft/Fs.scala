package graft

/** Filesystem helpers for scratch artifacts (temp index/table dirs
  * that queries and specs mint and must clean up).
  */
object Fs {

  /** Recursive delete, children before parents; missing paths are a
    * no-op. The one shared copy of the walk-and-reverse idiom the
    * scratch-dir queries and specs all need.
    */
  def deleteRecursively(root: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (!java.nio.file.Files.exists(root)) return
    scala.util.Using.resource(java.nio.file.Files.walk(root)) { st =>
      st.iterator().asScala.toSeq.reverseIterator
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
