package graft

import graft.operators.ScriptProfile

/** Per-block counts, dominance, tie-breaks, the none case, and the
  * staged-plan shape. */
class ScriptProfileSpec extends SparkSpec {
  import spark.implicits._

  private def profile(rows: Seq[(Long, String)])
  : Map[Long, (Map[String, Long], Long, String, Double)] = {
    val names = ScriptProfile.Scripts.map(_._1)
    ScriptProfile.profile(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map { r =>
        val counts = names.zipWithIndex
          .map { case (n, i) => n -> r.getLong(i + 1) }.toMap
        r.getLong(0) -> (counts, r.getLong(names.size + 1),
          r.getString(names.size + 2), r.getDouble(names.size + 3))
      }.toMap
  }

  test("counts per block, dominance, and fraction are exact") {
    val p = profile(Seq(
      (1L, "hello мир"), // 5 latin, 3 cyrillic
      (2L, "汉字汉字汉 ab"), // 5 cjk, 2 latin
      (3L, "αβγ"), // greek only
      (4L, "12345 !!"), // nothing scripted
      (5L, "")))
    assert(p(1L)._1("latin") == 5L && p(1L)._1("cyrillic") == 3L)
    assert(p(1L)._2 == 8L && p(1L)._3 == "latin")
    assert(p(1L)._4 == 5.0 / 8.0)
    assert(p(2L)._3 == "cjk" && p(2L)._4 == 5.0 / 7.0)
    assert(p(3L)._3 == "greek" && p(3L)._4 == 1.0)
    assert(p(4L) == (p(4L)._1, 0L, "none", 0.0))
    assert(p(5L)._3 == "none" && p(5L)._4 == 0.0)
  }

  test("ties break toward the earlier script in the fixed list") {
    val p = profile(Seq(
      (1L, "ab жд"), // latin 2, cyrillic 2 -> latin (earlier)
      (2L, "ж 汉"), // cyrillic 1, cjk 1 -> cyrillic
      (3L, "한한 かか"))) // hangul 2, kana 2 -> hangul
    assert(p(1L)._3 == "latin")
    assert(p(2L)._3 == "cyrillic")
    assert(p(3L)._3 == "hangul")
  }

  test("extended-latin, hebrew, arabic, devanagari ranges counted; " +
    "unlisted blocks are not scripted") {
    val p = profile(Seq(
      (1L, "café naïve"), // é/ï in the 00C0-024F extension
      (2L, "שלום عالم"), // hebrew 4 + arabic 4
      (3L, "नमस्ते"), // devanagari (6 code points)
      (4L, "☃☃☃ ✓"))) // dingbats/symbols: not scripted
    assert(p(1L)._1("latin") == 9L)
    assert(p(2L)._1("hebrew") == 4L && p(2L)._1("arabic") == 4L)
    assert(p(2L)._3 == "arabic") // tie at 4 -> earlier in list
    assert(p(3L)._1("devanagari") == 6L && p(3L)._3 == "devanagari")
    assert(p(4L)._3 == "none" && p(4L)._2 == 0L)
  }

  test("mixedScriptTokens: homoglyph tokens flagged, honest " +
    "single-script and empty docs are not; ratio exact") {
    val rows = Seq(
      (1L, "paypal login page"), // honest: 0 mixed
      (2L, "pаypal login page"), // Cyrillic а inside latin -> 1 of 3
      (3L, "честный русский текст"), // honest cyrillic: 0 mixed
      (4L, "αlpha beta 漢kanji"), // two mixed of 3
      (5L, ""), // token-less
      (6L, "123 !!! ---")) // no scripted chars at all -> 0 mixed
    val out = graft.operators.ScriptProfile.mixedScriptTokens(
      rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(out(1L) == (3L, 0L, 0.0))
    assert(out(2L) == (3L, 1L, 1.0 / 3.0))
    assert(out(3L) == (3L, 0L, 0.0))
    assert(out(4L) == (3L, 2L, 2.0 / 3.0))
    assert(out(5L) == (0L, 0L, 0.0))
    assert(out(6L) == (3L, 0L, 0.0))
  }

  test("plan: one scan, zero exchanges — per-row kernels only, " +
    "counts staged (not re-evaluated per reference)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = ScriptProfile.profile(docs, "doc_id", "text")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
    // each script's regex appears exactly once in the plan: the count
    // is a staged attribute, every later reference reads the slot
    val perScript = ScriptProfile.Scripts.map { case (_, re) =>
      java.util.regex.Pattern.quote(re).r.findAllIn(plan).size
    }
    assert(perScript.forall(_ == 1), s"regex re-evaluated: $perScript")
  }
}
