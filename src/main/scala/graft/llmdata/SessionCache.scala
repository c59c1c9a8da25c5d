package graft.llmdata

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped materialization cache — the "materialize once per corpus
  * snapshot" artifact store behind the shingle/pair/signature/codebook/
  * PQ-index caches (SURVEY.md §9). One implementation so the three-part
  * idiom every cache needs — key on the session OBJECT (reference equality;
  * hash values can collide across sessions and would hand one session a
  * frame bound to another's stopped context), sweep entries of stopped
  * sessions, release storage on clear — cannot drift between copies.
  *
  * Staleness contract (shared by every user): the key is (session, logical
  * key), not a data fingerprint — rewrite the parquet under a cached dir
  * within a live session and the cache keeps serving the old snapshot
  * until `clear` (reachable via `Dedup.uncacheShingles`).
  */
private[graft] final class SessionCache[V](onRemove: V => Unit) {
  private val entries =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), V]

  /** Fetch-or-build. Entries of stopped sessions are swept first; their
    * contexts (and any pinned storage) are already gone, so `onRemove` is
    * deliberately NOT called for them — only the strong references drop. */
  def get(spark: SparkSession, key: String)(build: => V): V = {
    entries.keys.filter(_._1.sparkContext.isStopped).foreach(entries.remove)
    entries.getOrElseUpdate((spark, key), build)
  }

  /** Drop this session's entries, releasing each via `onRemove`. */
  def clear(spark: SparkSession): Unit =
    entries.keys.filter(_._1 eq spark).foreach { k =>
      entries.remove(k).foreach(onRemove)
    }
}

private[graft] object SessionCache {
  /** The common case: cached PERSISTED DataFrames, unpersisted on clear. */
  def persisted(): SessionCache[DataFrame] =
    new SessionCache[DataFrame](_.unpersist(blocking = false))
}
