package graft.sinks

import java.util.concurrent.ConcurrentHashMap

/** K4 — Modbus-style holding-register sink (modbus_writer.py:64-70,
  * 105-122): a float32 value occupies two consecutive 16-bit registers
  * (high word first, the conventional Modbus "f" packing); registers are
  * prefilled with 0.0f up to the mapping's highest register (A6); each
  * stats key is consumed exactly once (D2 — the consumer tracks
  * processed keys). */
final class RegisterSink(highestRegister: Int) {
  private val regs = new ConcurrentHashMap[Int, Int]() // register -> u16
  // prefill pairs with 0.0f (modbus_writer.py:67-69)
  (0 to highestRegister by 2).foreach(writeFloat(_, 0.0f))

  def writeFloat(register: Int, value: Float): Unit = {
    val bits = java.lang.Float.floatToIntBits(value)
    regs.put(register, (bits >>> 16) & 0xffff)
    regs.put(register + 1, bits & 0xffff)
  }

  def readFloat(register: Int): Float = {
    val hi = regs.getOrDefault(register, 0)
    val lo = regs.getOrDefault(register + 1, 0)
    java.lang.Float.intBitsToFloat((hi << 16) | lo)
  }

  def readRaw(register: Int): Int = regs.getOrDefault(register, 0)
}

/** The Redis→registers one-shot writer loop, engine-side: scan stats
  * keys, look up each mapped field (inner-join semantics: missing field
  * → skip), decimal-comma parse (P8), write to the mapped register; a
  * key is consumed once per consumer lifetime (modbus_writer.py:94-126). */
final class RegisterWriter(
    kv: KvSink,
    registers: RegisterSink,
    mapping: Seq[(String, Int)]) { // (field, register)

  private val processed = scala.collection.mutable.Set.empty[String]

  /** One sweep; returns the number of stats keys consumed. */
  def sweep(pattern: String = "stats:*"): Int = {
    var consumed = 0
    kv.scan(pattern).foreach { key =>
      if (!processed.contains(key)) {
        mapping.foreach { case (field, register) =>
          kv.hget(key, field).foreach { raw =>
            // P8 decimal-comma tolerance; unparsable values are skipped
            // with the reference's warn-and-continue behavior
            raw.replace(',', '.').toDoubleOption.foreach { d =>
              registers.writeFloat(register, d.toFloat)
            }
          }
        }
        processed.add(key)
        consumed += 1
      }
    }
    consumed
  }
}
