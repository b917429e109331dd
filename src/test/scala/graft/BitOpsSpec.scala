package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BitOps

class BitOpsSpec extends AnyFunSuite {

  test("interleave64 matches hand-computed Morton codes") {
    assert(BitOps.interleave64(0L, 0L) == 0L)
    assert(BitOps.interleave64(1L, 0L) == 1L)
    assert(BitOps.interleave64(0L, 1L) == 2L)
    assert(BitOps.interleave64(1L, 1L) == 3L)
    assert(BitOps.interleave64(2L, 0L) == 4L)
    assert(BitOps.interleave64(3L, 5L) == 39L) // 0b100111
  }

  test("interleave/deinterleave round-trips the full 32-bit range") {
    val r = new scala.util.Random(3)
    (0 until 10000).foreach { _ =>
      val a = r.nextLong() & 0xffffffffL
      val b = r.nextLong() & 0xffffffffL
      val z = BitOps.interleave64(a, b)
      assert(BitOps.deinterleaveA(z) == a)
      assert(BitOps.deinterleaveB(z) == b)
    }
  }

  test("z-order is monotone along each axis (locality prerequisite)") {
    val r = new scala.util.Random(9)
    (0 until 1000).foreach { _ =>
      val a = r.nextInt(1 << 30).toLong
      val b = r.nextInt(1 << 30).toLong
      assert(BitOps.interleave64(a, b) < BitOps.interleave64(a + 1, b))
      assert(BitOps.interleave64(a, b) < BitOps.interleave64(a, b + 1))
    }
  }
}
