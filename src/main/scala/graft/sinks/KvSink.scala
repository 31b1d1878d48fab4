package graft.sinks

import scala.collection.concurrent.TrieMap

/** K3 — key-value stats sink with per-key TTL, the engine-side contract
  * for the reference's Redis hash publishes (udbf_file_analysis.py:69-87,
  * sens_file_analysis.py:93-101: HSET mapping + EXPIRE in one pipeline;
  * plain SET for health flags, Pipeline.py:194,201).
  *
  * TTL and connection concerns live in the sink implementation, never in
  * the DataFrame layer (SURVEY.md §7.5.6). The in-memory implementation
  * backs tests and local runs; a networked implementation would keep the
  * same trait.
  */
trait KvSink {
  /** HSET + EXPIRE, atomically per key. Empty mappings are the caller's
    * guard (A7). */
  def hset(key: String, mapping: Map[String, String], ttlSeconds: Option[Long]): Unit
  def set(key: String, value: String, ttlSeconds: Option[Long]): Unit
  def get(key: String): Option[String]
  def hget(key: String, field: String): Option[String]
  def hgetAll(key: String): Map[String, String]
  /** Keys matching a glob-style prefix pattern like `stats:*`
    * (modbus_writer.py:100). */
  def scan(pattern: String): Seq[String]
}

/** TTL-aware in-memory KvSink; `clock` is injectable so expiry is
  * testable without sleeping. */
final class InMemoryKvSink(clock: () => Long = () => System.currentTimeMillis)
    extends KvSink {
  import InMemoryKvSink.Entry

  private val store = TrieMap.empty[String, Entry]

  private def live(key: String): Option[Entry] =
    store.get(key).filter { e =>
      val ok = e.deadlineMs.forall(_ > clock())
      if (!ok) store.remove(key)
      ok
    }

  override def hset(key: String, mapping: Map[String, String],
      ttlSeconds: Option[Long]): Unit = {
    val merged = live(key).map(_.value.getOrElse(Map.empty)).getOrElse(Map.empty) ++ mapping
    store.put(key, Entry(Right(merged), ttlSeconds.map(clock() + _ * 1000)))
  }

  override def set(key: String, value: String, ttlSeconds: Option[Long]): Unit =
    store.put(key, Entry(Left(value), ttlSeconds.map(clock() + _ * 1000)))

  override def get(key: String): Option[String] =
    live(key).flatMap(_.value.left.toOption)

  override def hget(key: String, field: String): Option[String] =
    live(key).flatMap(_.value.toOption).flatMap(_.get(field))

  override def hgetAll(key: String): Map[String, String] =
    live(key).flatMap(_.value.toOption).getOrElse(Map.empty)

  override def scan(pattern: String): Seq[String] = {
    val re = ("^" + java.util.regex.Pattern.quote(pattern).replace("*", "\\E.*\\Q") + "$").r
    store.keys.toSeq.filter(k => re.findFirstIn(k).isDefined && live(k).isDefined).sorted
  }
}

object InMemoryKvSink {
  private[sinks] final case class Entry(
      value: Either[String, Map[String, String]], deadlineMs: Option[Long])
}
