package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Shared, engine-portable hashing primitives for the dedup/similarity
 * operators. Everything here is defined over md5 (bit-identical in any
 * engine) rather than an engine-private hash (Spark's Murmur3 vs DuckDB's
 * internal hash differ), so results are reproducible across engines and
 * stable across Spark versions — important when a 100 TB dedup job is
 * resumed or audited with different tooling.
 *
 * All functions are pure per-row Catalyst expressions (no UDFs, no shuffle):
 * at scale they run inside whole-stage codegen over the scan.
 */
object TextHashing {

  /** Mersenne prime 2^31-1: hash values stay < 2^31 so (a*h+b) stays well
    * inside 64-bit — identical overflow-free arithmetic in any engine. */
  val P: Long = 2147483647L
  /** Multiplier constants for the k-wise hash family (Knuth + arbitrary odd). */
  val A: Long = 2654435761L
  val B: Long = 2654592567L

  /** First 60 bits of md5 as a non-negative BIGINT — the portable base hash.
    * (15 hex chars < 2^60; engine equivalent: `('0x'||substr(md5(x),1,15))::BIGINT`.) */
  def md5Long60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Base hash reduced mod P for the minhash family. */
  def baseHash(c: Column): Column = pmod(md5Long60(c), lit(P))

  /** The j-th universal hash of a reduced base hash h:
    * `((j+1)*A % P) * h + ((j+1)*B % P)) % P`. `j` is a Column. */
  def universalHash(h: Column, j: Column): Column =
    pmod(pmod((j + 1) * lit(A), lit(P)) * h + pmod((j + 1) * lit(B), lit(P)), lit(P))

  /** Whitespace word split matching `string_split(text, ' ')`. */
  def words(text: Column): Column = split(text, " ")

  /**
   * Distinct word n-gram shingles of a text column. Pure array expression —
   * the shingle *set* never leaves the row until an operator explicitly
   * explodes it, which is what keeps the 100 TB plan shuffle-free until the
   * candidate-generation stage.
   */
  def wordShingles(text: Column, n: Int): Column = {
    val ws = words(text)
    val count = size(ws) - lit(n - 1)
    val grams = transform(sequence(lit(0), count - 1), i =>
      concat_ws(" ", (0 until n).map(k => element_at(ws, i + k + 1)): _*))
    array_distinct(when(count > 0, grams).otherwise(array()))
  }

  /** All word n-gram occurrences, NOT deduped (corpus-frequency form of
    * [[wordShingles]] — dedup would undercount repeated phrases). */
  def wordNgrams(text: Column, n: Int): Column = {
    val ws = words(text)
    val count = size(ws) - lit(n - 1)
    val grams = transform(sequence(lit(0), count - 1), i =>
      concat_ws(" ", (0 until n).map(k => element_at(ws, i + k + 1)): _*))
    when(count > 0, grams).otherwise(array())
  }

  /** Reduced hashes of a shingle array (mod P). */
  def shingleHashes(shinglesCol: Column): Column =
    transform(shinglesCol, s => baseHash(s))

  // ---- JVM kernels: bit-identical to the expression forms above (integer
  // arithmetic only), JIT-compiled — used where interpreted higher-order
  // functions dominate (millions of signature evaluations).

  /** Kernel replica of [[md5Long60]]. */
  def md5Long60Kernel(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = first 7.5 bytes
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    (acc << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** Kernel replica of the whole shingle → k-minhash pipeline. */
  def minhashSignatureKernel(shingles: Array[String], k: Int): Array[Long] = {
    val sig = Array.fill(k)(P)
    if (shingles.isEmpty) return sig
    val hs = shingles.map(s => md5Long60Kernel(s) % P)
    var j = 0
    while (j < k) {
      val a = ((j + 1) * A) % P
      val b = ((j + 1) * B) % P
      var m = Long.MaxValue
      var i = 0
      while (i < hs.length) {
        val v = (a * hs(i) + b) % P
        if (v < m) m = v
        i += 1
      }
      sig(j) = m
      j += 1
    }
    sig
  }

  /** Kernel replica of [[wordShingles]] (distinct word n-grams,
    * first-occurrence order). */
  def wordShinglesKernel(text: String, n: Int): Array[String] =
    wordNgramsKernel(text, n).distinct

  /** The single gram-building loop every kernel variant shares — one place
    * to keep the split/join semantics bit-identical to the expression forms. */
  def wordNgramsKernel(ws: Array[String], n: Int): Array[String] =
    if (ws.length < n) Array.empty
    else {
      val out = new Array[String](ws.length - n + 1)
      var i = 0
      while (i <= ws.length - n) {
        val sb = new StringBuilder(ws(i))
        var k = 1
        while (k < n) { sb.append(' ').append(ws(i + k)); k += 1 }
        out(i) = sb.toString
        i += 1
      }
      out
    }

  /** Kernel replica of [[wordNgrams]] (all occurrences, NOT deduped). */
  def wordNgramsKernel(text: String, n: Int): Array[String] =
    wordNgramsKernel(text.split(" ", -1), n)

  /** Kernel replica of `conv(substring(md5(s), 1, 11), 16, 10)` — the
    * first 44 bits of md5 (first 5 digest bytes plus the high nibble of
    * the 6th), the winnowing gram hash. */
  def md5Long44Kernel(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var acc = 0L
    var i = 0
    while (i < 5) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    (acc << 4) | ((d(5) >>> 4) & 0xfL)
  }

  /** Hex md5 of a string (band-key kernel, equals Spark/DuckDB `md5`). */
  def md5HexKernel(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map(b => f"${b & 0xff}%02x").mkString
  }

  /** The typed-kernel id contract: kernels key their rows by `id.cast(long)`,
    * which on a non-integral column silently NULLs every id and collapses the
    * whole corpus onto one key — a silent, data-destroying divergence from
    * the expression paths (which preserve any id type). Fail at plan time
    * instead. */
  def requireIntegralId(df: org.apache.spark.sql.DataFrame, idCol: String,
                        op: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(idCol).dataType
    require(dt.isInstanceOf[ByteType] || dt.isInstanceOf[ShortType] ||
        dt.isInstanceOf[IntegerType] || dt.isInstanceOf[LongType],
      s"$op's typed kernel keys rows by `$idCol` cast to BIGINT; column is " +
        s"${dt.simpleString} — a non-integral id would silently cast to NULL " +
        "and collapse every row onto one key. Use an integral id column " +
        "(or the typed=false expression path, which preserves any id type).")
  }
}
