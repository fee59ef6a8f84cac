package graft.operators

import org.apache.spark.sql.DataFrame
import scala.collection.concurrent.TrieMap

/** Registry of the per-(session, corpus) materialized intermediates
  * (LSH signatures, candidate pairs, component labels, simhashes, anagram
  * vocabulary, IVF centroids, gram frames). Each is persisted on first use
  * and shared by every consumer of the same corpus; a long-lived session
  * that finishes with a corpus calls `clearAll()` (or lets the caches die
  * with the session) so the pinned storage is released. */
object Materialized {

  private val caches =
    scala.collection.mutable.ListBuffer.empty[TrieMap[(String, String), DataFrame]]

  /** Called once per cache at object init; returns the cache for inline use. */
  private[operators] def register(
      c: TrieMap[(String, String), DataFrame]): TrieMap[(String, String), DataFrame] =
    caches.synchronized { caches += c; c }

  /** Number of live materialized frames (diagnostics/tests). */
  def size: Int = caches.synchronized(caches.map(_.size).sum)

  /** Unpersist and forget every materialized intermediate, in every
    * registered cache. Safe to call with stopped sessions (unpersist
    * failures are swallowed); subsequent queries re-materialize. */
  def clearAll(): Unit = caches.synchronized {
    caches.foreach { c =>
      c.values.foreach(df => try df.unpersist() catch { case _: Throwable => () })
      c.clear()
    }
  }
}
