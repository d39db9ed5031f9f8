package graft

import scala.collection.concurrent.TrieMap

/** Race-safe memoization over the layout/compare caches.
  *
  * `TrieMap.getOrElseUpdate` is atomic for the INSERT but may evaluate the
  * body more than once under concurrent first calls — harmless for a pure
  * value, wrong for a body that writes a parquet layout directory or
  * persists a DataFrame (two builders racing on one path / two persisted
  * copies leaking storage). Verify runs driver queries on a thread pool, so
  * every side-effecting cache goes through this double-checked lock instead:
  * the fast path is a lock-free read; only a miss serializes on the cache.
  * Bodies are one-off layout builds keyed per sf-dir, so the coarse
  * per-cache lock costs nothing in practice (and `synchronized` is
  * reentrant, which the compare cache's tolerance-derivation recursion
  * relies on).
  */
object Memo {
  def memo[K, V](cache: TrieMap[K, V], key: K, body: => V): V =
    cache.get(key) match {
      case Some(v) => v
      case None => cache.synchronized(cache.getOrElseUpdate(key, body))
    }
}
