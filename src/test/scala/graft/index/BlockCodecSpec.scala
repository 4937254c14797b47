package graft.index

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

class BlockCodecSpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g(Gen.Parameters.default, Seed(42L + i)))

  test("varint round-trip: decode(encode(x)) == x") {
    val gen = Gen.listOf(Gen.chooseNum(0L, Long.MaxValue / 2))
    sample(gen, 200).foreach { xs =>
      val arr = xs.toArray
      assert(BlockCodec.unpackVarints(BlockCodec.packVarints(arr), arr.length).toSeq == xs)
    }
  }

  test("delta round-trip on ascending sequences (with duplicates)") {
    val gen = Gen.listOf(Gen.chooseNum(0L, 1L << 40)).map(_.sorted)
    sample(gen, 200).foreach { xs =>
      val arr = xs.toArray
      assert(BlockCodec.unpackDeltas(BlockCodec.packDeltas(arr), arr.length).toSeq == xs)
    }
  }

  test("reference encode/decode golden: docIDs 1,100,250 gap-encode to 1,99,150") {
    // `/root/reference/storage_rdb_impl_test.go:384-431` pins this corpus
    val packed = BlockCodec.packDeltas(Array(1L, 100L, 250L))
    assert(BlockCodec.unpackVarints(packed, 3).toSeq == Seq(1L, 99L, 150L))
    assert(BlockCodec.unpackDeltas(packed, 3).toSeq == Seq(1L, 100L, 250L))
  }

  test("descending input is rejected") {
    intercept[IllegalArgumentException](BlockCodec.packDeltas(Array(5L, 3L)))
  }

  test("varint boundaries") {
    val edge = Array(0L, 127L, 128L, 16383L, 16384L, Int.MaxValue.toLong, Long.MaxValue / 2)
    assert(BlockCodec.unpackVarints(BlockCodec.packVarints(edge), edge.length).toSeq == edge.toSeq)
  }
}
