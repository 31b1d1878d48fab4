package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

import graft.sinks.KvSink

/** T8 — liveness telemetry: every micro-batch progress event refreshes
  * a per-query heartbeat key `"1"` with a TTL, so consumers detect a
  * dead pipeline by key absence — the reference's container heartbeat
  * contract (helper/redis_utility.py:10-35: value "1" every 60 s,
  * TTL 180 s; docker healthchecks grep the key). Termination with an
  * exception writes the dead-letter-style flag instead of silently
  * expiring. */
final class HealthListener(
    kv: KvSink,
    ttlSeconds: Long = 180) extends StreamingQueryListener {

  private def key(name: String) = s"health:heartbeat:$name"

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    kv.set(key(Option(event.name).getOrElse(event.id.toString)), "1", Some(ttlSeconds))

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val name = Option(event.progress.name).getOrElse(event.progress.id.toString)
    kv.set(key(name), "1", Some(ttlSeconds))
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    if (event.exception.isDefined)
      kv.set(key(event.id.toString), "0", Some(ttlSeconds))
}
