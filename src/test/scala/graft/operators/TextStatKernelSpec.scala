package graft.operators

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextHashes

/** Round-16 kernel parity: the one-pass histogram kernels that replaced
  * t25's per-character explode and t18's per-gram explode must compute
  * EXACTLY the statistics the old expressions produced — checked here
  * against straightforward in-memory replicas of those expressions,
  * including the edge shapes the operators rely on (empty text,
  * whitespace-only text, docs shorter than the gram width, non-ASCII
  * code points, duplicate-free docs).
  */
class TextStatKernelSpec extends AnyFunSuite {

  private def charRef(text: String): Seq[Long] =
    text.codePoints().toArray.toSeq
      .filterNot(cp => cp == ' '.toInt || cp == '\t'.toInt ||
        cp == '\n'.toInt || cp == '\r'.toInt)
      .groupBy(identity).toSeq.sortBy(_._1).map(_._2.length.toLong)

  private def charKernel(text: String): Seq[Long] = {
    val a = TextHashes.charCountValues(UTF8String.fromString(text))
    (0 until a.numElements()).map(a.getLong)
  }

  test("charCountValues matches the per-character groupBy on edge shapes") {
    val cases = Seq(
      "", " \t\n\r", "a", "aa bb a", "the quick brown fox",
      "x" * 1000, "a\tb\nc\rd e", "héllo wörld héllo", "汉字 汉字 字",
      "mixed 汉 ascii 字 mixed")
    cases.foreach { s =>
      assert(charKernel(s) == charRef(s), s"charCountValues('$s')")
    }
  }

  private def gramRef(ts: Seq[String], n: Int): (Long, Long) = {
    if (ts.length < n) return (0L, 0L)
    val grams = (0 to ts.length - n).map(i => ts.slice(i, i + n).mkString(" "))
    val counts = grams.groupBy(identity).values.map(_.length.toLong)
    (if (counts.isEmpty) 0L else counts.max,
      counts.filter(_ >= 2L).sum)
  }

  private def gramKernel(ts: Seq[String], n: Int): (Long, Long) = {
    val arr = new GenericArrayData(
      ts.map(t => if (t == null) null else UTF8String.fromString(t)).toArray[Any])
    val row = TextHashes.gramStats(arr, n)
    (row.getLong(0), row.getLong(1))
  }

  test("gramStats matches the explode + (doc, gram) groupBy replica") {
    val docs = Seq(
      Seq.empty[String], Seq("a"), Seq("a", "b"),
      Seq("a", "b", "a", "b", "a"),
      Seq("x", "x", "x", "x", "x", "x"),
      "the cat sat on the mat the cat sat on the mat".split(" ").toSeq,
      (1 to 200).map(i => s"w${i % 7}"),
      (1 to 50).map(i => s"u$i")) // duplicate-free
    for (ts <- docs; n <- Seq(2, 5)) {
      assert(gramKernel(ts, n) == gramRef(ts, n), s"gramStats($ts, $n)")
    }
  }

  test("gramStats groups all NULL-containing windows into one gram " +
      "(SQL || null-propagation)") {
    // windows: (a,null) (null,a) (a,null) (null,a) → null-gram count 4
    val ts = Seq("a", null, "a", null, "a")
    assert(gramKernel(ts, 2) == (4L, 4L))
    // max must still see the null group when it dominates
    val ts2 = Seq("a", "b", null, "x", null, "y", null, "z")
    val (maxc, _) = gramKernel(ts2, 2)
    assert(maxc >= 2L)
  }
}
