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

  test("left-to-right symbol-space pass: merged symbol re-pairs as a LEFT" +
      " partner only in later occurrences (not string replace)") {
    val m = Seq("a" -> "a")
    // a single string replace() on the framed word would give [aa,a,a]
    // (the shared delimiter blocks the second match) — the kernel scans
    // SYMBOLS, so both disjoint pairs merge in one pass
    assert(enc("aaaa", m) == Seq("aa", "aa"))
    assert(enc("aaa", m) == Seq("aa", "a")) // first pair wins, tail unpaired
    // the adjacent-occurrence case the round-8 oracle got wrong: with
    // (i,n) then (in,g), 'singing' must merge BOTH 'ing's even though
    // their framed occurrences share a chr(1)
    val ing = Seq("i" -> "n", "in" -> "g")
    assert(enc("singing", ing) == Seq("s", "ing", "ing"))
    assert(enc("inginging", ing) == Seq("ing", "ing", "ing"))
  }

  test("double-replace framed-string oracle matches the kernel (a != b)") {
    // the DuckDB oracle applies each rank's replace() TWICE on the
    // chr(1)-framed word; Java String.replace has the same left-to-right
    // resume-after-replacement semantics, so this simulation proves the
    // generated SQL equivalent to the kernel, not just green on a
    // fixture that happens to lack adjacent occurrences
    val D = "\u0001"
    def oracle(word: String, merges: Seq[(String, String)]): Seq[String] = {
      val framed = D + word.map(c => s"$c$D").mkString
      val done = merges.foldLeft(framed) { case (s, (a, b)) =>
        val pat = s"$D$a$D$b$D"
        val rep = s"$D$a$b$D"
        s.replace(pat, rep).replace(pat, rep)
      }
      done.split(D).filter(_.nonEmpty).toSeq
    }
    assert(oracle("singing", BpeEncode.DemoMerges.toSeq) ==
      enc("singing", BpeEncode.DemoMerges))
    val rnd = new scala.util.Random(11)
    val alphabet = "theringoulandsmx"
    (1 to 500).foreach { _ =>
      val w = Seq.fill(1 + rnd.nextInt(14))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val got = enc(w, BpeEncode.DemoMerges)
      val want = oracle(w, BpeEncode.DemoMerges)
      assert(got == want, s"word '$w': kernel $got vs oracle-sim $want")
    }
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
