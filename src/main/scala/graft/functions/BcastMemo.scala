package graft.functions

import java.lang.ref.WeakReference

import scala.reflect.ClassTag

import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast

/** Identity-keyed broadcast memo shared by the sketch/quantizer
  * probe paths ([[graft.text.Bloom]], [[graft.stats.Cms]],
  * [[graft.vector.Ivf]]): one Spark broadcast per artifact INSTANCE,
  * however many probe columns are built over it, so iterative callers
  * don't pile up multi-MB handles.
  *
  * Both sides of each entry are weak (advice r8): keys via
  * `WeakHashMap`, values via [[WeakReference]]. With a strong value,
  * the chain map → Broadcast → artifact array kept the KEY strongly
  * reachable, so entries never collected and every distinct artifact
  * leaked its broadcast blocks for the session lifetime. Now the
  * artifact is strongly reachable only through the Broadcast, which
  * the map holds weakly — once the caller drops both the artifact and
  * the plans that carry the handle, the Broadcast is collectable, the
  * ContextCleaner reclaims its blocks, and the map entry clears. A
  * cleared value under a live key (caller kept the artifact, dropped
  * the plans) simply re-broadcasts on next use.
  */
private[graft] final class BcastMemo[T <: AnyRef: ClassTag] {
  private val memo =
    new java.util.WeakHashMap[T, WeakReference[Broadcast[T]]]

  def getOrBroadcast(sc: SparkContext, value: T): Broadcast[T] =
    memo.synchronized {
      val ref = memo.get(value)
      val cached = if (ref != null) ref.get() else null
      if (cached != null) cached
      else {
        val fresh = sc.broadcast(value)
        memo.put(value, new WeakReference(fresh))
        fresh
      }
    }
}
