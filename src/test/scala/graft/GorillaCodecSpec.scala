package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GorillaCodec._

/** Property-style tests with seeded generators (scalatestplus bridge is not
  * in the offline cache, so properties are hand-rolled deterministic loops).
  */
class GorillaCodecSpec extends AnyFunSuite {

  private def randTs(rnd: java.util.Random): Array[Long] = {
    val n = rnd.nextInt(300)
    var t = math.abs(rnd.nextLong() % 1800000000000L)
    Array.fill(n) {
      t += (if (rnd.nextBoolean()) rnd.nextInt(100).toLong
            else math.abs(rnd.nextLong() % 10000000L))
      t
    }
  }

  private def randVs(rnd: java.util.Random): Array[java.lang.Double] = {
    val n = rnd.nextInt(300)
    Array.fill[java.lang.Double](n) {
      rnd.nextInt(7) match {
        case 0 => null
        case 1 => java.lang.Double.valueOf(Double.NaN)
        case 2 => java.lang.Double.valueOf(Double.PositiveInfinity)
        case 3 => java.lang.Double.valueOf(if (rnd.nextBoolean()) 0.0 else -0.0)
        case 4 => java.lang.Double.valueOf(rnd.nextInt(500).toDouble)
        case _ => java.lang.Double.valueOf(rnd.nextDouble() * 2e12 - 1e12)
      }
    }
  }

  test("timestamp round-trip identity (200 seeded cases)") {
    val rnd = new java.util.Random(42)
    (1 to 200).foreach { _ =>
      val ts = randTs(rnd)
      assert(decodeTimestamps(encodeTimestamps(ts)).toSeq == ts.toSeq)
    }
  }

  test("value round-trip identity incl null/NaN/±inf/-0.0 (200 seeded cases)") {
    val rnd = new java.util.Random(7)
    (1 to 200).foreach { _ =>
      val vs = randVs(rnd)
      val back = decodeValues(encodeValues(vs))
      assert(back.length == vs.length)
      back.zip(vs).foreach { case (b, v) =>
        if (v == null) assert(b == null)
        else assert(java.lang.Double.doubleToRawLongBits(b.doubleValue()) ==
          java.lang.Double.doubleToRawLongBits(v.doubleValue()))
      }
    }
  }

  test("regular grid compresses hard (dod=0, small value alphabet)") {
    val n = 10000
    val ts = Array.tabulate(n)(i => 1700000000000L + i * 60000L)
    val vs = Array.tabulate(n)(i => java.lang.Double.valueOf((i % 7).toDouble))
    val tb = encodeTimestamps(ts)
    val vb = encodeValues(vs)
    assert(tb.length < n / 4, s"ts bytes ${tb.length}") // ~1 bit/point
    assert(vb.length < n * 4, s"value bytes ${vb.length}")
  }
}
