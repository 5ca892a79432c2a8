package graft

import graft.functions.{TextExprs, UnicodeNorm}
import org.apache.spark.sql.functions._

/** NFC normalization + the canonical cleaning pipeline: composed and
  * decomposed forms converge, controls strip, whitespace collapses —
  * and the fast path hands back already-normalized strings untouched. */
class UnicodeNormSpec extends SparkSpec {
  import spark.implicits._

  test("decomposed e + combining acute composes to U+00E9") {
    val decomposed = "café" // "cafe" + combining acute
    val composed = "café"
    val out = Seq((1L, decomposed), (2L, composed)).toDF("id", "t")
      .select($"id", UnicodeNorm.nfc($"t").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == composed)
    assert(out(2L) == composed)
  }

  test("normalizeText strips controls, collapses whitespace, trims") {
    val out = Seq(
      (1L, "  a\t\tb\r\nc  "),
      (2L, "a\u0001b"),            // bare control vanishes, no space split
      (3L, "x \u0001 y"),          // control between spaces -> ONE space
      (4L, "already clean"))
      .toDF("id", "t")
      .select($"id", TextExprs.normalizeText($"t").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "a b c")
    assert(out(2L) == "ab")
    assert(out(3L) == "x y")
    assert(out(4L) == "already clean")
  }

  test("null text stays null") {
    val out = Seq((1L, null: String)).toDF("id", "t")
      .select(UnicodeNorm.nfc($"t")).collect()
    assert(out(0).isNullAt(0))
  }

  test("sanitizeText: zero-width/soft-hyphen strip, NBSP family to " +
    "space, CRLF to LF, C0/C1 strip with tab+LF surviving; idempotent; " +
    "composes with nfc") {
    import graft.functions.TextExprs
    def san(x: String): String = Seq((1L, x)).toDF("id", "t")
      .select(TextExprs.sanitizeText($"t").as("c"))
      .collect().head.getString(0)
    assert(san("a\u200Bb\u200Cc\u200Dd\u2060e\uFEFFf\u00ADg") == "abcdefg")
    assert(san("a\u00A0b\u202Fc\u2007d") == "a b c d")
    assert(san("l1\r\nl2\rl3\nl4") == "l1\nl2\nl3\nl4")
    assert(san("keep\ttab\nand lf\u0007\u009F!") == "keep\ttab\nand lf!")
    val hostile = "\u200B x\u00A0y\r\n\u0000z\u00AD"
    assert(san(san(hostile)) == san(hostile))
    // order-independent with NFC (both idempotent, disjoint domains)
    val mixed = "cafe\u0301\u200B\u00A0end"
    val a = Seq((1L, mixed)).toDF("id", "t")
      .select(graft.functions.UnicodeNorm.nfc(
        TextExprs.sanitizeText($"t")).as("c")).collect().head.getString(0)
    val b = Seq((1L, mixed)).toDF("id", "t")
      .select(TextExprs.sanitizeText(
        graft.functions.UnicodeNorm.nfc($"t")).as("c")).collect().head.getString(0)
    assert(a == b && a == "caf\u00E9 end")
    // null propagates
    assert(Seq((1L, null: String)).toDF("id", "t")
      .select(TextExprs.sanitizeText($"t")).collect()(0).isNullAt(0))
  }

  test("fleschScore: hand-computed value, fragment counts as one " +
    "sentence, wordless text is NULL") {
    import graft.functions.TextExprs
    def f(x: String): Option[Double] = {
      val r = Seq((1L, x)).toDF("id", "t")
        .select(TextExprs.fleschScore($"t").as("f")).collect().head
      if (r.isNullAt(0)) None else Some(r.getDouble(0))
    }
    // 6 words, 2 sentence runs, 6 vowel groups:
    // 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert(math.abs(f("The cat sat. It ran fast!").get - 119.19) < 1e-9)
    // no terminal punctuation: one sentence by contract
    // 2 words, 1 sentence, 2 vowel groups: 206.835 - 2.03 - 84.6
    assert(math.abs(f("word soup").get - (206.835 - 1.015 * 2 - 84.6)) < 1e-9)
    assert(f("").isEmpty && f("   ").isEmpty)
  }

  test("evalNfc fast paths: all-ASCII returns the SAME instance (zero " +
    "alloc); normalized non-ASCII returns the input; decomposed composes") {
    import org.apache.spark.unsafe.types.UTF8String
    val ascii = UTF8String.fromString("plain ascii text 123!")
    assert(UnicodeNorm.evalNfc(ascii) eq ascii)
    val empty = UTF8String.fromString("")
    assert(UnicodeNorm.evalNfc(empty) eq empty)
    val composed = UTF8String.fromString("café") // already NFC
    assert(UnicodeNorm.evalNfc(composed) eq composed)
    val decomposed = UTF8String.fromString("café")
    assert(UnicodeNorm.evalNfc(decomposed).toString == "café")
  }

  test("fixMojibake: latin1-shaped UTF-8 repairs, one layer per call") {
    import spark.implicits._
    def f(x: String): String =
      Seq(Tuple1(x)).toDF("t")
        .select(graft.functions.TextExprs.fixMojibake(col("t")))
        .collect()(0).getString(0)
    // "cafÃ© voilÃ " -> "café voilà" (C3 A9 / C3 A0 runs)
    assert(f("caf\u00C3\u00A9 voil\u00C3\u00A0") == "caf\u00E9 voil\u00E0")
    // cp1252 shape: "itâ€™sâ€¦" -> "it's…" (E2 80 99 / E2 80 A6 with
    // 0x99 surfacing as ™ and 0x80 as €)
    assert(f("it\u00E2\u20AC\u2122s\u00E2\u20AC\u00A6") ==
      "it\u2019s\u2026")
    // double-encoded needs two applications: "ÃƒÂ©" -> "Ã©" -> "é"
    val once = f("caf\u00C3\u0192\u00C2\u00A9")
    assert(once == "caf\u00C3\u00A9", once)
    assert(f(once) == "caf\u00E9")
  }

  test("fixMojibake: genuine text is structurally untouchable") {
    import spark.implicits._
    def f(x: String): String =
      Seq(Tuple1(x)).toDF("t")
        .select(graft.functions.TextExprs.fixMojibake(col("t")))
        .collect()(0).getString(0)
    assert(f("S\u00E3o Paulo") == "S\u00E3o Paulo")   // E3 6F invalid
    assert(f("price \u00C3 10") == "price \u00C3 10") // C3 20 invalid
    assert(f("a \u2192 b") == "a \u2192 b")           // >U+00FF fails gate
    assert(f("dots\u2026here") == "dots\u2026here")   // lone cp1252 char:
      // translated 0x85 is a bare continuation byte -> invalid -> original
    assert(f("plain ascii") == "plain ascii")
    val df = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(graft.functions.TextExprs.fixMojibake(col("t")))
    assert(df.collect()(0).isNullAt(0))
  }

  test("charEntropy: hand-computed micro protocol, code points not " +
    "UTF-16 units, degenerate and null inputs") {
    import graft.functions.CharEntropyExpr
    def e(s: String): Double =
      Seq(s).toDF("t").select(CharEntropyExpr.charEntropy(col("t")))
        .collect()(0).getDouble(0)
    assert(e("aaaa") == 0.0)                 // one symbol: no information
    assert(e("ab") == 1.0)                   // exact halves
    assert(e("abcd") == 2.0)
    assert(e("abab") == 1.0)                 // distribution, not length
    // hand-computed with per-term round-at-6:
    // a: round((2/3)*log2(3/2), 6) = 0.389975
    // b: round((1/3)*log2(3),   6) = 0.528321  -> 0.918296
    assert(e("aab") == 0.918296)
    // the treble clef is one CODE POINT (a surrogate pair in UTF-16):
    // same distribution as "aab", so identical entropy
    assert(e("𝄞𝄞a") == 0.918296)
    assert(e("") == 0.0)                     // empty is a distribution
    assert(e("   ") == 0.0)                  // whitespace counts as symbols
    val df = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(CharEntropyExpr.charEntropy(col("t")))
    assert(df.collect()(0).isNullAt(0))
    // prose vs base64-ish separation the banding relies on
    assert(e("the quick brown fox jumps over the lazy dog") > 3.0)
    assert(e("QWxhZGRpbjpvcGVuIHNlc2FtZQ8x7Kf0b3BlbiBzZXNhbWU5") > 4.9)
  }
}
