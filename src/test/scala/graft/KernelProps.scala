package graft

import graft.media.{FakeCodec, Media}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Generative properties over the pure kernels (frame-index policies,
  * pixel preprocessing, fake codec determinism) — the invariants that
  * must hold for ANY clip geometry, not just the fixtures KernelSpec
  * pins. */
object KernelProps extends Properties("kernels") {

  private val nFrames = Gen.chooseNum(1L, 1000000L)

  property("fractional indices are in [0, n) and monotone in p") =
    forAll(nFrames) { n =>
      val idx = Media.FrameIndex.fractional(n, Seq(0.2, 0.5, 0.8))
      idx.forall(i => i >= 0 && i < n) && idx == idx.sorted
    }

  property("firstMidLast is 3 in-range indices; degenerate -> zeros") =
    forAll(nFrames) { n =>
      val idx = Media.FrameIndex.firstMidLast(n)
      idx.length == 3 &&
        (if (n <= 3) idx.forall(_ == 0L)
         else idx == Seq(0L, n / 2, n - 1) && idx.forall(_ < n))
    }

  property("strided covers frame 0, steps by stride, stays < n") =
    forAll(nFrames, Gen.chooseNum(1L, 100L)) { (n, s) =>
      val idx = Media.FrameIndex.strided(n, s)
      idx.headOption.contains(0L) && idx.forall(_ < n) &&
        idx.sliding(2).forall {
          case Seq(a, b) => b - a == s
          case _ => true
        } &&
        idx.length == (n + s - 1) / s // every frame within one stride
    }

  private val dims = Gen.chooseNum(1, 64)

  property("resize emits ow*oh pixels drawn from the source plane") =
    forAll(dims, dims, dims, dims) { (w, h, ow, oh) =>
      val px = Array.tabulate(w * h)(_.toDouble)
      val out = Media.Pixels.resize(px, w, h, ow, oh)
      out.length == ow * oh && out.forall(px.contains)
    }

  property("centerCrop keeps exactly cw*ch source pixels") =
    forAll(dims, dims) { (w, h) =>
      forAll(Gen.chooseNum(1, w), Gen.chooseNum(1, h)) { (cw, ch) =>
        val px = Array.tabulate(w * h)(_.toDouble)
        val out = Media.Pixels.centerCrop(px, w, h, cw, ch)
        out.length == cw * ch && out.forall(px.contains)
      }
    }

  property("div255 lands in [0,1] and signed in [-1,1] for byte planes") =
    forAll(Gen.listOfN(32, Gen.chooseNum(0, 255))) { bytes =>
      val px = bytes.map(_.toDouble).toArray
      Media.Pixels.div255(px).forall(v => v >= 0.0 && v <= 1.0) &&
        Media.Pixels.signed(px).forall(v => v >= -1.0 && v <= 1.0)
    }

  property("shorterSideDims makes the shorter side exactly the target " +
    "and preserves orientation") =
    forAll(Gen.chooseNum(1, 4096), Gen.chooseNum(1, 4096)) { (w, h) =>
      val (ow, oh) = Media.Pixels.shorterSideDims(w, h, 512)
      math.min(ow, oh) == 512 && ((w <= h) == (ow <= oh))
    }

  property("FakeCodec probe/decode are pure functions of their inputs") =
    forAll(Gen.identifier, Gen.chooseNum(0L, 10000L)) { (name, idx) =>
      val p = s"/v/$name.mp4"
      FakeCodec.probe(p) == FakeCodec.probe(p) &&
        FakeCodec.decodeFrame(p, idx).toSeq ==
          FakeCodec.decodeFrame(p, idx).toSeq
    }

  property("encodeClip output length is bounded and span-dependent") =
    forAll(Gen.identifier, Gen.chooseNum(0L, 5000L), Gen.chooseNum(1L, 5000L)) {
      (name, s, len) =>
        val bytes = FakeCodec.encodeClip(s"/v/$name.mp4", s, s + len)
        bytes.length == 32 + math.min(len, 4096L).toInt
    }

  property("encodeClip rejects empty spans") =
    forAll(Gen.chooseNum(0L, 100L)) { s =>
      Prop.throws(classOf[IllegalArgumentException]) {
        FakeCodec.encodeClip("/v/x.mp4", s, s)
      }
    }

  property("GrfCodec round-trips arbitrary frame planes through disk") =
    forAll(Gen.chooseNum(1, 8), Gen.chooseNum(1, 8), Gen.chooseNum(0, 12),
      Gen.chooseNum(1L, Long.MaxValue)) { (w, h, n, seed) =>
      val rnd = new scala.util.Random(seed)
      val frames = Seq.fill(n)(Array.fill(w * h)(rnd.nextInt(256).toByte))
      val p = java.nio.file.Files
        .createTempFile("grfprop", ".grf").toString
      try {
        graft.media.GrfCodec.write(p, w, h, 24.0, frames)
        val info = graft.media.GrfCodec.probe(p)
        info.width == w && info.height == h && info.nFrames == n &&
          frames.indices.forall(i =>
            graft.media.GrfCodec.decodeFrame(p, i.toLong).toSeq ==
              frames(i).toSeq) &&
          (n == 0 || {
            // clip re-encode preserves the exact plane bytes
            val clip = graft.media.GrfCodec.encodeClip(p, 0L, n.toLong)
            val cp = java.nio.file.Files
              .createTempFile("grfclip", ".grf").toString
            try {
              java.nio.file.Files.write(java.nio.file.Paths.get(cp), clip)
              graft.media.GrfCodec.decodeFrame(cp, (n - 1).toLong).toSeq ==
                frames(n - 1).toSeq
            } finally java.nio.file.Files
              .deleteIfExists(java.nio.file.Paths.get(cp))
          })
      } finally java.nio.file.Files
        .deleteIfExists(java.nio.file.Paths.get(p))
    }

  property("sortedIntersectCount equals set-intersection size") = {
    val xs = Gen.listOf(Gen.chooseNum(-100L, 100L))
    forAll(xs, xs) { (a, b) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.catalyst.util.ArrayData
      import org.apache.spark.sql.types.{ArrayType, LongType}
      val (sa, sb) = (a.distinct.sorted, b.distinct.sorted)
      val e = graft.functions.SortedIntersectCount(
        Literal(ArrayData.toArrayData(sa.toArray), ArrayType(LongType)),
        Literal(ArrayData.toArrayData(sb.toArray), ArrayType(LongType)))
      e.eval(null) == (sa.toSet & sb.toSet).size.toLong
    }
  }

  // q29's DuckDB oracle is BRUTE-FORCE, so the banded equi-join matches
  // it only because <= 6 flipped bits across 7 bands must leave one band
  // untouched (pigeonhole). This property is load-bearing for the
  // correctness gate: a wrong band layout would diverge only on inputs
  // whose flips straddle every band.
  private val simBits = 60
  private val bandOf: Long => Seq[Long] = v =>
    graft.ops.DedupOps.simBands.map { case (_, sh, mask) => (v >> sh) & mask }

  property("simhash bands: any <= 6-bit flip leaves >= 1 band equal") = {
    val base = Gen.chooseNum(0L, (1L << simBits) - 1)
    val flips = Gen.chooseNum(0, 6).flatMap(k =>
      Gen.listOfN(k, Gen.chooseNum(0, simBits - 1)))
    forAll(base, flips) { (v, bits) =>
      val w = bits.foldLeft(v)((acc, b) => acc ^ (1L << b))
      bandOf(v).zip(bandOf(w)).exists { case (a, b) => a == b }
    }
  }

  property("simhash bands tile all 60 bits exactly once") = Prop {
    val bands = graft.ops.DedupOps.simBands
    val covered = bands.flatMap { case (_, sh, mask) =>
      (0 until 64).filter(b => ((mask << sh) >> b & 1L) == 1L)
    }
    covered.sorted == (0 until simBits).toList
  }

  // KMV state law: for ANY inputs (duplicates included), ANY split, and
  // ANY merge shape, the state is the k smallest distinct values — the
  // invariant that makes q88/q99's sketch partition- and retry-stable
  private val kmvInputs =
    Gen.listOf(Gen.chooseNum(0, 999).map(i => f"h$i%03x"))
  property("KMV reduce/merge == sorted distinct take k, any split") =
    forAll(kmvInputs, Gen.chooseNum(2, 16), Gen.chooseNum(0, 1000)) {
      (xs, k, cut) =>
        val agg = new graft.functions.KmvAgg(k)
        def fold(s: Seq[String]) = s.foldLeft(agg.zero)(agg.reduce)
        val expected = xs.distinct.sorted.take(k)
        val (a, b) = xs.splitAt(if (xs.isEmpty) 0 else cut % (xs.size + 1))
        fold(xs).toSeq == expected &&
          agg.merge(fold(a), fold(b)).toSeq == expected &&
          agg.merge(fold(b), fold(a)).toSeq == expected &&
          agg.merge(fold(xs), fold(xs)).toSeq == expected // self-merge
    }

  // q268's AUC identity: the score-group running fold's integer
  // numerator (u2 = Σ_groups p·(2·negs_below + m)) must equal the
  // pairwise Mann-Whitney count (2 per win, 1 per tie) for ANY label
  // assignment and ANY tie structure — coarse integer scores force
  // heavy ties, the case midrank handling exists for. The fold here
  // restates the algebra the q268 SQL aggregate encodes; the SQL
  // itself is pinned by the DuckDB gate on real data.
  private val scoredRows =
    Gen.listOf(Gen.zip(Gen.chooseNum(0, 12), Gen.oneOf(0, 1)))
  property("AUC group-fold u2 == pairwise midrank count under any ties") =
    forAll(scoredRows) { rows =>
      val groups = rows.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (_, g) =>
          (g.count(_._2 == 1).toLong, g.count(_._2 == 0).toLong)
        }
      var negs = 0L; var u2 = 0L
      groups.foreach { case (p, m) => u2 += p * (2 * negs + m); negs += m }
      val pos = rows.filter(_._2 == 1).map(_._1)
      val neg = rows.filter(_._2 == 0).map(_._1)
      val brute = (for (a <- pos; b <- neg)
        yield if (a > b) 2L else if (a == b) 1L else 0L).sum
      u2 == brute
    }

  // q267's rational sigmoid 1/2 + z/(2(1+|z|)): bounded strictly in
  // (0,1) (so q269's fixed-width bins 0..9 are total) and monotone
  // (so q270's uncertainty order and q275's threshold cuts are
  // well-defined) for any finite double
  private val zs = Gen.chooseNum(-1e6, 1e6)
  property("rational sigmoid is in (0,1), centered, and monotone") =
    forAll(zs, zs) { (a, b) =>
      def sig(z: Double) = 0.5 + z / (2.0 * (1.0 + math.abs(z)))
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      sig(a) > 0.0 && sig(a) < 1.0 && sig(0.0) == 0.5 &&
        sig(lo) <= sig(hi)
    }
}
