package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.operators.Sketch

/** ScalaCheck properties for the HDR quantile sketch's JVM arithmetic
  * — the invariants the batch column chain and the streaming twin both
  * rely on (the column-side bit-identity is pinned separately by the
  * q_quantile_sketch differential and StreamingSketchSpec's parity).
  */
object HdrSketchProps extends Properties("HdrSketch") {

  private val centGen: Gen[Long] = Gen.oneOf(
    Gen.chooseNum(1L, 64L),                 // the exact-unit region
    Gen.chooseNum(1L, 1L << 40),            // broad positive range
    Gen.oneOf(Seq(15L, 16L, 17L, 31L, 32L, 33L, (1L << 30) - 1,
      1L << 30, (1L << 30) + 1)))           // bin boundaries

  property("bin is monotone non-decreasing in the value") =
    Prop.forAll(centGen, centGen) { (a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      Sketch.hdrBin(lo) <= Sketch.hdrBin(hi)
    }

  property("values below 16 get exact unit bins") =
    Prop.forAll(Gen.chooseNum(1L, 15L)) { v => Sketch.hdrBin(v) == v }

  property("the bin's midpoint is within 1/32 relative error of any " +
    "member value") =
    Prop.forAll(centGen) { v =>
      val x2 = Sketch.hdrMidpointX2(Sketch.hdrBin(v))
      // midpoint in half-cents vs value in half-cents
      math.abs(x2 - 2 * v).toDouble / (2 * v) <= 1.0 / 32 + 1e-12
    }

  property("every value falls inside its bin's [lower, lower+width) " +
    "interval") =
    Prop.forAll(centGen) { v =>
      val b = Sketch.hdrBin(v)
      if (b < 16) v == b
      else {
        val shift = (b / 16).toInt - 1
        val lower = (b % 16 + 16) << shift
        val width = 1L << shift
        v >= lower && v < lower + width
      }
    }

  property("quantile read-out: rank semantics match a naive sorted scan") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.chooseNum(1L, 4096L))) { vs =>
      val bins = vs.groupBy(Sketch.hdrBin).view.mapValues(_.size.toLong)
        .toMap
      val got = Sketch.hdrQuantilesFromBins(bins, Seq("0.50", "0.99"))
      got.forall { case (p, n, rank, bin, _) =>
        val sortedBins = vs.map(Sketch.hdrBin).sorted
        n == vs.length &&
          rank == (BigDecimal(p) * n)
            .setScale(0, BigDecimal.RoundingMode.CEILING).toLong &&
          bin == sortedBins((rank - 1).toInt)
      }
    }
}
