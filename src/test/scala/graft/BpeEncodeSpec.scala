package graft

import graft.functions.BpeEncode
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** BPE encode kernel: hand-worked merges, replace() scan semantics,
  * equivalence with the definitional repeat-lowest-rank algorithm on a
  * well-formed table, code-point safety, and lossless reassembly. */
class BpeEncodeSpec extends SparkSpec {

  private def enc(text: String, merges: Seq[(String, String)]): Seq[String] = {
    val table = merges.map(p => Array(p._1, p._2)).toArray
    BpeEncode.encodeText(UTF8String.fromString(text), table)
      .array.map(_.asInstanceOf[UTF8String].toString).toSeq
  }

  test("hand-worked merges, rank order, across words") {
    val m = Seq("t" -> "h", "th" -> "e")
    assert(enc("the theater", m) == Seq("the", "the", "a", "t", "e", "r"))
    // second merge depends on the first's product
    assert(enc("th", Seq("t" -> "h")) == Seq("th"))
    assert(enc("the", Seq("th" -> "e")) == Seq("t", "h", "e")) // no (t,h) merge first
  }

  test("left-to-right non-overlapping within one pass (replace semantics)") {
    val m = Seq("a" -> "a")
    assert(enc("aaaa", m) == Seq("aa", "aa"))
    assert(enc("aaa", m) == Seq("aa", "a")) // first pair wins, tail unpaired
  }

  test("matches repeat-lowest-rank on a well-formed table (random words)") {
    // definitional BPE: repeatedly merge the present pair with the
    // lowest rank until none applies
    def reference(word: String, merges: Seq[(String, String)]): Seq[String] = {
      val rank = merges.zipWithIndex.toMap
      var syms = word.map(_.toString).toVector
      var done = false
      while (!done && syms.length > 1) {
        val best = syms.indices.init
          .flatMap(i => rank.get(syms(i) -> syms(i + 1)).map(r => (r, i)))
          .sortBy(identity).headOption
        best match {
          case None => done = true
          case Some((_, i)) =>
            syms = syms.take(i) :+ (syms(i) + syms(i + 1)) :++ syms.drop(i + 2)
        }
      }
      syms
    }
    val rnd = new scala.util.Random(7)
    val alphabet = "theringoulandsmx"
    (1 to 300).foreach { _ =>
      val w = Seq.fill(1 + rnd.nextInt(12))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val got = enc(w, BpeEncode.DemoMerges)
      val want = reference(w, BpeEncode.DemoMerges)
      assert(got == want, s"word '$w': $got vs $want")
    }
  }

  test("code points: surrogate pairs are single symbols; reassembly is lossless") {
    val m = Seq("a" -> "b")
    assert(enc("a𝄞b", m) == Seq("a", "𝄞", "b"))
    val text = "the running theater and más 𝄞 music"
    val toks = enc(text, BpeEncode.DemoMerges)
    assert(toks.mkString == text.split("\\s+").mkString) // nothing lost
  }

  test("blank and empty inputs yield empty arrays; bad merges fail loudly") {
    assert(enc("", BpeEncode.DemoMerges).isEmpty)
    assert(enc("   \t\n ", BpeEncode.DemoMerges).isEmpty)
    intercept[IllegalArgumentException] {
      BpeEncode.bpeEncode(lit("x"), Seq("" -> "a"))
    }
  }

  test("runs inside whole-stage codegen over a real scan") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = Tables.documents(spark, "/root/testdata/sf0.001").limit(20)
        .select(BpeEncode.bpeEncode(lower(col("text")),
          BpeEncode.DemoMerges).as("t"))
        .select(sum(size(col("t"))).as("n")).head().getLong(0)
      assert(out > 0L)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }
}
