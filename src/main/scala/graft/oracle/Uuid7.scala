package graft.oracle

import java.security.SecureRandom
import java.time.Instant

/** Minimal UUIDv7 utilities (RFC 9562 layout: 48-bit unix millis,
  * 4-bit version, 12+62 random bits).
  *
  * The reference leans on uuid-rs (crates/oracle/src/db/mod.rs:79-84) and
  * extracts the embedded millis for the score tiebreak
  * (crates/oracle/src/oracle.rs:553-575).
  */
object Uuid7 {

  private val rng = new SecureRandom()

  /** Generate a v7 UUID for the given instant (random tail). */
  def generate(at: Instant = Instant.now()): String =
    generateDeterministic(at, rng.nextLong(), rng.nextLong())

  /** Fully deterministic variant for tests: caller supplies the random
    * bits (the golden ETL test pins ids to fixed timestamps,
    * crates/oracle/tests/api/etl_workflow.rs:21-37). */
  def generateDeterministic(at: Instant, randA: Long, randB: Long): String = {
    val ms = at.toEpochMilli
    val hi = (ms << 16) | 0x7000L | (randA & 0x0FFFL)
    val lo = 0x8000000000000000L | (randB & 0x3FFFFFFFFFFFFFFFL)
    f"${(hi >>> 32) & 0xFFFFFFFFL}%08x-${(hi >>> 16) & 0xFFFFL}%04x-${hi & 0xFFFFL}%04x-" +
      f"${(lo >>> 48) & 0xFFFFL}%04x-${lo & 0xFFFFFFFFFFFFL}%012x"
  }

  /** Extract the embedded unix milliseconds (first 48 bits). */
  def millis(uuid: String): Long =
    java.lang.Long.parseLong(uuid.replace("-", "").substring(0, 12), 16)

  /** SQL expression extracting the same millis from a UUID string column —
    * keeps the tiebreak inside codegen (no UDF). */
  def millisSqlExpr(col: String): String =
    s"cast(conv(substring(replace($col, '-', ''), 1, 12), 16, 10) as bigint)"

  def isValid(uuid: String): Boolean =
    uuid.matches("[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-7[0-9a-fA-F]{3}-[89abAB][0-9a-fA-F]{3}-[0-9a-fA-F]{12}")
}
