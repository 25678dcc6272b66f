package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Randomized (seeded) property checks of the native expressions'
  * arithmetic against independent reference implementations — pure JVM,
  * no Spark session, so they run in milliseconds.
  */
class ExpressionPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  test("sorted_intersect_count equals set intersection on random inputs") {
    (1 to 300).foreach { _ =>
      val a = Array.fill(rnd.nextInt(60))(rnd.nextInt(40).toLong).distinct.sorted
      val b = Array.fill(rnd.nextInt(60))(rnd.nextInt(40).toLong).distinct.sorted
      val got = SortedIntersectCount(
        Literal.create(a, ArrayType(LongType)),
        Literal.create(b, ArrayType(LongType))).eval(null)
      assert(got == a.toSet.intersect(b.toSet).size.toLong)
    }
  }

  test("vec_dot equals an independent fold, element order preserved") {
    (1 to 100).foreach { _ =>
      val n = 1 + rnd.nextInt(64)
      val a = Array.fill(n)(rnd.nextFloat() * 2 - 1)
      val b = Array.fill(n)(rnd.nextFloat() * 2 - 1)
      val got = ArrayDotD(
        Literal.create(a, ArrayType(FloatType)),
        Literal.create(b, ArrayType(FloatType))).eval(null)
      val ref = a.zip(b).foldLeft(0.0) { case (s, (x, y)) =>
        s + x.toDouble * y.toDouble
      }
      assert(got == ref)
    }
  }

  test("rolling_fp window minimum equals brute-force window hashes, any unicode") {
    // whole code points (indexing chars would split the surrogate pair
    // of 𝄞 and produce an invalid string no storage layer round-trips)
    val alphabet = Array("a", "b", "c", " ", "X", "0", ".", "é", "ø", "日", "𝄞")
    (1 to 200).foreach { _ =>
      val len = rnd.nextInt(40)
      val s = Array.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val out = Mix.rollingFp(UTF8String.fromString(s), 8)
      val cps = s.codePoints().toArray
      val M = 1000000007L
      def fold(xs: Array[Int]): Long =
        xs.foldLeft(0L)((h, c) => (h * 257L + c) % M)
      assert(out.getLong(0) == fold(cps))
      val expectedWin =
        if (cps.length < 8) fold(cps)
        else cps.sliding(8).map(w => fold(w)).min
      assert(out.getLong(1) == expectedWin)
    }
  }

  test("ngram_hash_set yields one hash per distinct trigram, sorted and collision-free") {
    (1 to 200).foreach { _ =>
      val n = rnd.nextInt(60)
      // tiny vocabulary so duplicate trigrams actually occur
      val toks = Array.fill(n)(s"w${rnd.nextInt(4)}")
      val arr = new GenericArrayData(
        toks.map(t => UTF8String.fromString(t).asInstanceOf[Any]))
      val out = Mix.ngramHashSet(arr, 3)
      val expected = if (n < 3) 0 else toks.sliding(3).map(_.mkString(" ")).toSet.size
      assert(out.numElements() == expected)
      val vs = out.toLongArray()
      assert(vs.sameElements(vs.sorted.distinct))
    }
  }

  test("simhash32 stays in 32 bits and is determined by the token multiset") {
    (1 to 100).foreach { _ =>
      val toks = Array.fill(1 + rnd.nextInt(40))(s"t${rnd.nextInt(50)}")
      def arr(ts: Array[String]): ArrayData =
        new GenericArrayData(ts.map(t => UTF8String.fromString(t).asInstanceOf[Any]))
      val h1 = Mix.simhash32(arr(toks))
      val h2 = Mix.simhash32(arr(toks.clone()))
      assert(h1 == h2)
      assert(h1 >= 0L && h1 < (1L << 32))
    }
  }

  test("minhash band buckets: identical sets collide in every band, disjoint sets in none") {
    (1 to 50).foreach { _ =>
      val a = Array.fill(30)(rnd.nextLong())
      val b = a.map(_ + 1000000)
      def buckets(xs: Array[Long]) = {
        val out = MinHashBandBuckets(
          Literal.create(xs, ArrayType(LongType)), 64).eval(null)
          .asInstanceOf[ArrayData].toLongArray()
        out
      }
      assert(buckets(a).sameElements(buckets(a.reverse)))
      // disjoint random sets share a band bucket only by chance (~0)
      val shared = buckets(a).toSet.intersect(buckets(b).toSet)
      assert(shared.isEmpty)
    }
  }

  test("simhash64: deterministic, near-dup multisets land within small hamming distance") {
    (1 to 50).foreach { _ =>
      val toks = Array.fill(30 + rnd.nextInt(30))(s"t${rnd.nextInt(60)}")
      def arr(ts: Array[String]): ArrayData =
        new GenericArrayData(ts.map(t => UTF8String.fromString(t).asInstanceOf[Any]))
      val h1 = Mix.simhash64(arr(toks))
      assert(h1 == Mix.simhash64(arr(toks.clone())))
      // drop one token: the fingerprint moves by at most a few bits
      // (simhash's defining property), while an unrelated token set is
      // ~32 bits away on average
      val h2 = Mix.simhash64(arr(toks.drop(1)))
      assert(java.lang.Long.bitCount(h1 ^ h2) <= 16)
      val other = Array.fill(40)(s"u${rnd.nextInt(60)}")
      val h3 = Mix.simhash64(arr(other))
      assert(java.lang.Long.bitCount(h1 ^ h3) >= 10)
    }
  }
}
