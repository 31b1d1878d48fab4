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
  *
  * The oracle is FULL closed-form SQL: on this fixture the signature
  * check's outcome is decided by CONSTRUCTION (sig is the MAC of the
  * received body except on %5, where it was computed over a body the
  * receiver never saw), so the oracle re-derives every status from the
  * modulus rules + the reference's check order + DuckDB's own
  * json_valid — no engine output feeds it. That is a STRONGER gate
  * than a golden replay: an HMAC implementation that collapsed
  * (constant digest) would admit the %5 rows and go red here, while a
  * golden generated from the same engine would stay green.
  * `WebhookGateSpec` separately pins the MAC bit-identical to
  * javax.crypto.Mac and the precedence table closed-form.
  *
  * Parity caveats, both corpus-checked: DuckDB `json_valid` rejects
  * the NaN/Infinity literals `graft_json_strict` accepts (json.loads
  * parity) — the corpus contains none — and a NULL props would 401 in
  * the engine (NULL sig never matches) where the mirror branch below
  * keeps the same verdict. */
object WebhookQueries {

  private val Secret = "graft-webhook-secret"

  val all: Seq[QueryDef] = Seq(
    sql("u11_webhook_gate")(
      """WITH req AS (
        |  SELECT event_id,
        |    CASE WHEN event_id % 3 = 0 THEN props || 'x' ELSE props END AS body
        |  FROM events),
        |v AS (
        |  SELECT event_id, coalesce(body, '') AS body,
        |    CASE WHEN event_id % 11 = 0 THEN 415
        |         WHEN event_id % 7 = 0 THEN 401
        |         WHEN strlen(coalesce(body, '')) > 16384 THEN 413
        |         WHEN event_id % 5 = 0 THEN 401
        |         WHEN body IS NULL THEN 401
        |         WHEN NOT json_valid(coalesce(body, '')) THEN 400
        |         ELSE 200 END AS status
        |  FROM req)
        |SELECT event_id, status,
        |  CASE WHEN status = 200 THEN 1 ELSE 0 END AS admitted,
        |  CASE WHEN status = 200 THEN body ELSE '' END AS payload
        |FROM v ORDER BY event_id""".stripMargin) { (s, d) =>
      // widened (r19): two HMAC-SHA256 evaluations per row run in the
      // events scan stage, and events.parquet is one split at oracle
      // SFs — see Tables.widened (identity at real scale)
      val ev = Tables.widened(Tables.events(s, d))
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
