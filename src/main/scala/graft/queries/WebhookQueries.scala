package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.WebhookGate
import QueryDef.sql

/** Webhook admission over a deterministic request fixture derived from
  * the events table (props = the raw JSON body). Fault injection by
  * event-id modulus exercises every status branch except 413 (the
  * corpus has no oversized bodies — the size cap is spec-covered):
  *
  *   - id % 11 == 0 → mimetype text/plain                  → 415
  *   - id %  7 == 0 → wrong shared token                   → 401
  *   - id %  5 == 0 → signature over a DIFFERENT body      → 401
  *   - id %  3 == 0 → body corrupted to invalid JSON, but
  *                    signature computed over the corrupted
  *                    body (sig valid, parse fails)        → 400
  *   - otherwise    → well-formed request                  → 200
  *
  * Overlapping ids resolve by the reference's check order (415 before
  * token before signature before parse — `sevenio/app.py:40-60`).
  * HMAC-SHA256 is not DuckDB-expressible (sha256 there is VARCHAR-only;
  * the inner digest is raw bytes), so the gate is golden-oracled like
  * the xxhash64 detectors; `WebhookGateSpec` pins the MAC bit-identical
  * to javax.crypto.Mac and the precedence table closed-form. */
object WebhookQueries {

  private val Secret = "graft-webhook-secret"

  val all: Seq[QueryDef] = Seq(
    sql("u11_webhook_gate")(
      graft.GoldenGen.oracleSql("u11_webhook_gate", "event_id")) { (s, d) =>
      val ev = Tables.events(s, d)
      val body = when(col("event_id") % 3 === 0, concat(col("props"), lit("x")))
        .otherwise(col("props"))
      val requests = ev.select(
        col("event_id"),
        body.as("body"),
        // % 5: signature computed over a body the receiver never saw
        when(col("event_id") % 5 === 0,
          WebhookGate.hmacSha256Hex(Secret, concat(col("props"), lit("tampered"))))
          .otherwise(WebhookGate.hmacSha256Hex(Secret, body)).as("sig"),
        when(col("event_id") % 7 === 0, "wrong-token")
          .otherwise(Secret).as("token"),
        when(col("event_id") % 11 === 0, "text/plain")
          .otherwise("application/json").as("mime"))
      WebhookGate.admit(requests, "event_id", "body", "sig", "token", "mime", Secret)
        .select(col("event_id"), col("status"),
          col("admitted").cast("int").as("admitted"),
          coalesce(col("payload"), lit("")).as("payload"))
        .orderBy(col("event_id"))
    }
  )
}
