package graft.ops

import org.apache.spark.sql.DataFrame

/** A result plus the intermediate tables that were persisted to build it.
  * The candidate miners persist their narrow signature tables so one
  * shingle/signature pass feeds both sides of the bucket self-join; the
  * persisted frame must outlive the returned (lazy) DataFrame, so the
  * miner cannot unpersist it itself. This handle gives the CALLER that
  * power deterministically — consume `value`, then `close()` — instead of
  * the round-1/2 contract of "call spark.catalog.clearCache() eventually"
  * which nukes every cached table in the session.
  */
final case class Cached[+A](value: A, handles: Seq[DataFrame])
    extends AutoCloseable {
  /** Unpersist every intermediate this result pinned (blocking = false:
    * eviction proceeds in the background, safe because the caller is done
    * consuming `value`).
    */
  override def close(): Unit = handles.foreach(_.unpersist())
}

object Cached {
  def apply[A](value: A): Cached[A] = Cached(value, Nil)
}
