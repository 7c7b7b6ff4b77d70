package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F5 — deterministic user-agent rotation (reference
  * pyspider-master/pyspider/fetcher/tornado_fetcher.py:60-101 keeps a UA pool
  * and :274-294 picks per request). A random pick is not replayable, so the
  * engine picks by URL hash: the SAME url always fetches with the SAME agent
  * (stable across rounds and retries), while the pool still spreads load.
  *
  * The index is the first byte of md5(url) mod pool size — one arithmetic
  * form shared by the Scala row path ([[pick]]), the Spark column path
  * ([[idxCol]]) and the DuckDB oracle (instr-over-hex in UrlQueries), so all
  * three are bit-identical.
  */
object UaPool {

  /** Generic pool (shape of the reference's browser pool; strings are
    * placeholders, not real browser fingerprints). */
  val pool: IndexedSeq[String] = IndexedSeq(
    "Mozilla/5.0 (compatible; graftbot/1.0; +http://example.com/bot)",
    "Mozilla/5.0 (X11; Linux x86_64) graft-fetch/1.0",
    "Mozilla/5.0 (Macintosh) graft-fetch/1.0",
    "Mozilla/5.0 (Windows NT 10.0) graft-fetch/1.0")

  def idx(url: String, n: Int = pool.size): Int = {
    val hex = graft.url.UrlCanon.md5Hex(url)
    Integer.parseInt(hex.substring(0, 2), 16) % n
  }

  def pick(url: String): String = pool(idx(url))

  /** Column twin: (hexByte of the first two md5 chars) % n. */
  def idxCol(url: Column, n: Int = pool.size): Column = {
    val hexDigit = (c: Column) =>
      (instr(lit("0123456789abcdef"), c) - 1).cast("int")
    val b = hexDigit(substring(md5(url), 1, 1)) * 16 +
      hexDigit(substring(md5(url), 2, 1))
    pmod(b, lit(n))
  }

  def pickCol(url: Column): Column = {
    val i = idxCol(url)
    pool.zipWithIndex.foldLeft(lit(pool.head)) { case (acc, (ua, j)) =>
      when(i === j, lit(ua)).otherwise(acc)
    }
  }
}
