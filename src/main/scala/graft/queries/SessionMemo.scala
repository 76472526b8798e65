package graft.queries

import java.lang.ref.WeakReference

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** A per-SparkSession memo with automatic eviction — the shared backing
  * for every `Shared*` fixture/index cache in the query packs.
  *
  * The round-3 memos were plain `TrieMap`s keyed on
  * `identityHashCode(session)`: bounded per fixture, fine for bench/
  * Verify lifetimes, but a long-lived multi-tenant driver that opens and
  * closes sessions would accumulate pinned plans forever. This class
  * closes that hole with two mechanisms, neither on the hot path:
  *
  *  - **Weak session tracking**: the memo never holds a strong reference
  *    to the session. Each `apply` sweeps sessions that have been GC'd or
  *    whose SparkContext has stopped, running `onEvict` (typically
  *    `DataFrame.unpersist`) on their cached values.
  *  - **Application-end listener**: one `SparkListener` per distinct
  *    SparkContext drops every entry the moment the context stops — the
  *    cached plans are unusable from then on anyway.
  *
  * Entries are keyed `(identityHashCode(session), key)`; values compute
  * at most once per live session (TrieMap `getOrElseUpdate` semantics).
  */
final class SessionMemo[K, V](onEvict: V => Unit = (_: V) => ()) {

  private val entries = TrieMap[(Int, K), V]()
  /** One weak ref per session seen, for staleness sweeps. */
  private val sessions = TrieMap[Int, WeakReference[SparkSession]]()
  /** Contexts that already carry our application-end listener. */
  private val hookedContexts = TrieMap[Int, Unit]()

  def apply(s: SparkSession, key: K)(compute: => V): V = {
    val sid = System.identityHashCode(s)
    sessions.putIfAbsent(sid, new WeakReference(s))
    hookContext(s)
    sweep()
    entries.getOrElseUpdate((sid, key), compute)
  }

  /** Evict entries of sessions that are gone (GC'd or context stopped).
    * Cheap — proportional to distinct sessions seen, not entries — and
    * safe to call from anywhere.
    */
  def sweep(): Unit =
    sessions.foreach { case (sid, ref) =>
      val s = ref.get()
      if (s == null || s.sparkContext.isStopped) evictSession(sid)
    }

  private def evictSession(sid: Int): Unit = {
    sessions.remove(sid)
    entries.keys.filter(_._1 == sid).foreach { k =>
      entries.remove(k).foreach { v =>
        try onEvict(v)
        catch { case scala.util.control.NonFatal(_) => () } // best-effort
      }
    }
  }

  private def hookContext(s: SparkSession): Unit = {
    val sc = s.sparkContext
    hookedContexts.getOrElseUpdate(System.identityHashCode(sc), {
      sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          sweep()
      })
    })
  }

  /** Live entry count — observability for the eviction tests. */
  def pinned: Int = entries.size

  /** Live entry count for one session. */
  def pinnedFor(s: SparkSession): Int = {
    val sid = System.identityHashCode(s)
    entries.count(_._1._1 == sid)
  }
}

object SessionMemo {
  /** The standard evictor for memoized persisted DataFrames: unpin the
    * plan if its context is still alive (a stopped context already
    * dropped every cached block).
    */
  val unpersistDf: org.apache.spark.sql.DataFrame => Unit = df =>
    if (!df.sparkSession.sparkContext.isStopped) df.unpersist(blocking = false)
}
