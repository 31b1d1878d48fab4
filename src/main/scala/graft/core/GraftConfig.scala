package graft.core

/** The reference's behavioral constants, honored under the same
  * environment-variable names with the same defaults (BASELINE.md's
  * config table). Engine components take these as parameter defaults so
  * tests can override per-instance while deployments keep the
  * reference's env contract. */
object GraftConfig {

  private def envDouble(name: String, default: Double): Double =
    sys.env.get(name).flatMap(_.toDoubleOption).getOrElse(default)
  private def envInt(name: String, default: Int): Int =
    sys.env.get(name).flatMap(_.toIntOption).getOrElse(default)

  /** REF_FILE_SIZE_100HZ — DataConverterUDBF.py:51 */
  def refFileSize100HzKb: Double = envDouble("REF_FILE_SIZE_100HZ", 447.2)
  /** REF_FILE_SIZE_1HZ — DataConverterUDBF.py:52 */
  def refFileSize1HzKb: Double = envDouble("REF_FILE_SIZE_1HZ", 27.2)
  /** STABLE_CHECKS — Pipeline.py:24 */
  def stableChecks: Int = envInt("STABLE_CHECKS", 2)
  /** MIN_FILE_AGE_SEC — Pipeline.py:25 */
  def minFileAgeMs: Long = (envDouble("MIN_FILE_AGE_SEC", 40.0) * 1000).toLong
  /** TICKER_INTERVAL_SEC — Pipeline.py:26 */
  def tickerIntervalSec: Double = envDouble("TICKER_INTERVAL_SEC", 2.0)
  /** BASIC_REDIS_TTL — Pipeline.py:22 */
  def basicTtlSeconds: Long = envInt("BASIC_REDIS_TTL", 60).toLong
  /** BASIC_ROUNDING — udbf_file_analysis.py:19 */
  def basicRounding: Int = envInt("BASIC_ROUNDING", 3)
}
