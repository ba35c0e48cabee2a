package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash-signature aggregator (SURVEY §2.9: the one UDAF the
  * north-star extensions need): folds a group of shingle strings into a
  * K-wide signature of per-seed md5 minima. Equivalent to the column-
  * expression form used by q27_minhash_lsh (array_min of md5s), but as a
  * reusable `Aggregator` for `Dataset.groupByKey(...).agg(...)` flows
  * where shingles arrive as rows rather than arrays — partial aggregation
  * (map-side combine) comes for free from the Aggregator contract.
  *
  * Hot-path notes: ONE MessageDigest instance per executor thread
  * (getInstance per row measured as the dominant cost), table-driven hex
  * encoding, and a Tungsten ExpressionEncoder buffer (Java serialization
  * per partial row defeats the point of partial aggregation).
  */
class MinHashAgg(val k: Int)
    extends Aggregator[String, Array[String], Seq[String]] {

  @transient private lazy val md: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private def md5Hex(s: String): String = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      val b = bytes(i) & 0xff
      out(2 * i) = MinHashAgg.HexChars(b >> 4)
      out(2 * i + 1) = MinHashAgg.HexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }

  override def zero: Array[String] = Array.fill(k)(null)

  override def reduce(buf: Array[String], shingle: String): Array[String] = {
    var i = 0
    while (i < k) {
      val h = md5Hex(s"$i:$shingle")
      if (buf(i) == null || h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < k) {
      if (a(i) == null || (b(i) != null && b(i) < a(i))) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[String]): Seq[String] = buf.toSeq
  override def bufferEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object MinHashAgg {
  private val HexChars = "0123456789abcdef".toCharArray
}
