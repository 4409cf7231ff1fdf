package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Select, TextAnalysis}

/** Round-4 fixes: code-point (not UTF-16) gram indexing in the winnowing
  * and substring-dedup kernels — non-BMP text (emoji, astral-plane chars)
  * must shingle identically to the relational length()/substr() columns and
  * the DuckDB oracle, both of which count code points.
  */
class Round4Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 26 distinct astral-plane code points (Deseret block, U+10400..) — each
  // is 2 UTF-16 units, so any kernel still indexing by String.length /
  // substring sees double the length and shifted gram boundaries.
  private def astral(seed: Char, n: Int): String = {
    val rnd = new scala.util.Random(seed.toInt)
    val sb = new java.lang.StringBuilder
    (0 until n).foreach(_ => sb.appendCodePoint(0x10400 + rnd.nextInt(26)))
    sb.toString
  }

  test("winnow: astral-plane text grams by code point (k+w-1 cps = exactly one window)") {
    // 11 code points = k + w - 1 exactly: one gram window, one fingerprint.
    // A UTF-16 kernel would see length 22 → 15 grams → up to 12 fps.
    val s11 = astral('a', 11)
    val out = TextAnalysis.winnow(Seq((1L, s11)).toDF("doc_id", "text"))
      .collect()
    assert(out.length == 1)
    assert(out(0).getInt(1) == 1, s"expected exactly 1 fingerprint, got ${out(0).getInt(1)}")
    // 10 code points: below threshold in BOTH the relational filter and the
    // kernel — no row (the filter and the kernel must agree on length).
    val none = TextAnalysis.winnow(Seq((2L, astral('b', 10))).toDF("doc_id", "text"))
      .count()
    assert(none == 0L)
  }

  test("winnow: mixed BMP+astral text is deterministic and window-count exact") {
    // 14 cps → n = 7 grams → 4 windows → n_fp in [1, 4]
    val s = "ab" + astral('c', 10) + "yz"
    val r = TextAnalysis.winnow(Seq((1L, s)).toDF("doc_id", "text")).collect()(0)
    assert(r.getInt(1) >= 1 && r.getInt(1) <= 4)
    // idempotent across runs (no UTF-16 truncation splitting surrogates)
    val r2 = TextAnalysis.winnow(Seq((1L, s)).toDF("doc_id", "text")).collect()(0)
    assert(r.getLong(2) == r2.getLong(2))
  }

  test("substringDups: astral twins — kernel gram count agrees with the relational n_grams column") {
    // 90 astral cps duplicated whole: n_grams = (90-20)/8+1 = 9 (code-point
    // math in the relational column); the kernel must sample the SAME 9
    // grams, so n_dup == n_grams and union = 8*8+20 = 84 code points.
    // A UTF-16 kernel would emit 21 grams (length 180) — n_dup > n_grams.
    val d = astral('m', 90)
    val twin = Seq((10L, d), (11L, d)).toDF("doc_id", "text")
    val t = Dedup.substringDups(twin, k = 20, stride = 8)
      .orderBy("doc_id").collect()
    assert(t.length == 2)
    t.foreach { r =>
      assert(r.getLong(1) == 9L, s"n_grams=${r.getLong(1)}")
      assert(r.getLong(2) == 9L, s"n_dup=${r.getLong(2)} != n_grams")
      assert(r.getLong(3) == 84L, s"dup_chars=${r.getLong(3)}")
    }
  }

  test("chatLint: conversation missing turn_idx 0 yields starts_user=false (bool_or semantics)") {
    val turns = Seq(
      (1L, 0, "user"), (1L, 1, "assistant"),
      (2L, 3, "assistant"), (2L, 4, "user") // gappy: no turn 0
    ).map { case (c, i, r) => (c.toString, i, r) }
      .toDF("conv_id", "turn_idx", "role")
    val out = Select.chatLint(turns).orderBy("conv_id").collect()
    assert(out(0).getBoolean(out(0).fieldIndex("starts_user")))
    assert(!out(1).isNullAt(out(1).fieldIndex("starts_user")),
      "gappy conversation must not yield NULL starts_user")
    assert(!out(1).getBoolean(out(1).fieldIndex("starts_user")))
  }

  test("stratifiedSampling: empty allocation returns empty result, not NPE") {
    val classes = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("label", "key")
    val alloc = Seq.empty[(String, Long)].toDF("label", "alloc")
    val out = graft.operators.Accuracy.stratifiedSampling(
      classes, alloc, "label", "key")
    assert(out.count() == 0L)
    assert(out.columns.toSeq == Seq("key", "label", "rn"))
  }
}
