package graft.functions

import java.util.Arrays

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** K-Minimum-Values distinct-count sketch (Bar-Yossef et al. 2002): the
  * aggregate state is the k smallest DISTINCT hash values seen, kept as
  * a sorted array. States merge by sorted-merge-dedup-truncate, so the
  * sketch is a true distributed aggregate — partial per task, map-side
  * combined, one k-element row per group crossing the shuffle (the whole
  * point at 100 TB: a 128-value sketch summarizes any number of distinct
  * keys; an exact COUNT(DISTINCT) shuffles every distinct value).
  *
  * Works over any uniformly-distributed hex-string hash (callers feed
  * md5, matching the engine's other deterministic-hash recipes — e.g.
  * SampleOps' salted md5). Fully deterministic: the k smallest distinct
  * md5 strings are a set property of the input, independent of row
  * order, partitioning, and merge shape — which is what lets the
  * estimate sit under the bit-exact oracle gate (vs HLL, whose register
  * layout is engine-specific).
  *
  * The estimator itself stays OUT of the aggregator (finish returns the
  * sorted state): estimate = (k-1) / R where R is the k-th smallest
  * hash mapped to [0,1) — derived in plain column arithmetic so both
  * engines run the identical IEEE ops (see SketchOps.q88).
  */
class KmvAgg(val k: Int)
    extends Aggregator[String, Array[String], Seq[String]] {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def zero: Array[String] = Array.empty

  /** Insert h if it belongs among the k smallest distinct values.
    * Binary search gives the dedup check and the insertion point in one
    * pass; the shift is O(k) on the small fixed-size state. */
  override def reduce(buf: Array[String], h: String): Array[String] = {
    if (h == null) return buf
    val pos = Arrays.binarySearch(buf.asInstanceOf[Array[AnyRef]], h)
    if (pos >= 0) return buf // already present
    val ins = -pos - 1
    if (ins >= k) return buf // larger than the current k-th smallest
    val n = math.min(buf.length + 1, k)
    val out = new Array[String](n)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = h
    System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
    out
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[String](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (i < a.length && a(i) == v) i += 1 // cross-array duplicate
      if (j < b.length && b(j) == v) j += 1
      out(o) = v
      o += 1
    }
    if (o == out.length) out else Arrays.copyOf(out, o)
  }

  override def finish(buf: Array[String]): Seq[String] = buf.toSeq
  override def bufferEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
