package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis, TrainingPrep}

/** Curation-operator semantics the synthetic gate corpus can't pin: the
  * word-salad documents contain no PII, no URLs and little repetition, so
  * q69/q71–q74's oracle runs only prove engine parity of the arithmetic.
  * These fixtures plant the real phenomena each operator exists for.
  */
class TextOpsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]", 4)
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String, String)]): String = {
    val out = Files.createTempDirectory("graft-textops").toFile
    out.deleteOnExit()
    rows
      .map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"${out.getAbsolutePath}/documents.parquet")
    out.getAbsolutePath
  }

  test("q73 PII scrub: planted emails / IPv4s / phones are counted and redacted") {
    val dir = writeDocs(Seq(
      (1L, "contact alice.smith+spam@example.co.uk or bob@test.org today", "en", "s"),
      (2L, "server at 192.168.1.254 and 10.0.0.1 responded", "en", "s"),
      (3L, "call 555-867-5309 or +1 555.123.4567 now", "en", "s"),
      (4L, "no pii here at all just words", "en", "s"),
      (5L, "mix: eve@corp.io from 172.16.0.9 dialed 555-000-1111", "de", "s")
    ))
    val r = TextAnalysis.piiScrub(spark, dir).collect().map(x => x.getString(0) -> x).toMap
    val en = r("en")
    assert(en.getAs[Long]("n_docs") == 4)
    assert(en.getAs[Long]("docs_with_pii") == 3)
    assert(en.getAs[Long]("total_emails") == 2)
    assert(en.getAs[Long]("total_ips") == 2)
    assert(en.getAs[Long]("total_phones") == 2, "555-867-5309 and 555.123.4567 (the +1 prefix digits survive)")
    val de = r("de")
    assert(de.getAs[Long]("docs_with_pii") == 1)
    assert(
      de.getAs[Long]("total_emails") == 1 && de.getAs[Long]("total_ips") == 1 &&
        de.getAs[Long]("total_phones") == 1
    )
    // redaction removes exactly the matched characters
    val scrubbed = "mix: eve@corp.io from 172.16.0.9 dialed 555-000-1111"
      .replaceAll(TextAnalysis.EmailPat, "")
      .replaceAll(TextAnalysis.Ipv4Pat, "")
      .replaceAll(TextAnalysis.PhonePat, "")
    assert(de.getAs[Long]("chars_removed") == 52L - scrubbed.length)
  }

  test("q74 URL canonicalization: scheme/case/www/query/fragment/trailing-slash variants collapse") {
    val cases = Seq(
      "https://WWW.Example.com/Path/?utm_source=x#frag" -> "example.com/path",
      "http://example.com/Path"                         -> "example.com/path",
      "example.com/path/"                               -> "example.com/path",
      "https://example.com/path///"                     -> "example.com/path",
      "https://www.example.com/path?a=1&b=2"            -> "example.com/path",
      "https://sub.www.example.com/x"                   -> "sub.www.example.com/x", // only LEADING www. strips
      "http://example.com"                              -> "example.com"
    )
    val got = cases.map(_._1).toDF("u")
      .select(Dedup.canonicalizeUrl(col("u")).as("c")).collect().map(_.getString(0))
    cases.map(_._2).zip(got).foreach { case (want, g) => assert(g == want, s"want $want got $g") }
  }

  test("q71 span dedup: a shared 8-token span across distinct docs is counted once per occurrence") {
    val span  = "alpha bravo charlie delta echo foxtrot golf hotel" // exactly 8 tokens
    val tailA = "one two three four five six seven eight"
    val tailB = "nine ten eleven twelve thirteen fourteen fifteen sixteen"
    val dir = writeDocs(Seq(
      (1L, s"$span $tailA", "en", "s"), // spans: [span, tailA]
      (2L, s"$span $tailB", "en", "s"), // spans: [span, tailB]
      (3L, "short doc under eight tokens", "en", "s") // 0 complete spans
    ))
    val r = Dedup.spanDedup(spark, dir).collect()
    assert(r.length == 1)
    val en = r.head
    assert(en.getAs[Long]("n_docs") == 2, "the sub-span doc contributes no spans")
    assert(en.getAs[Long]("n_spans") == 4)
    assert(en.getAs[Long]("n_dup_spans") == 2, "the shared span counts at both of its occurrences")
    assert(en.getAs[Double]("dup_frac") == 0.5)
  }

  test("q72 gopher rules: repetitive doc fails, diverse doc passes") {
    val spammy  = (Seq.fill(30)("buy now") :+ "limited").mkString(" ") // top-token frac 30/61, dup bigrams
    val diverse = (1 to 60).map(i => s"w$i").mkString(" ")             // every token and bigram unique
    val dir     = writeDocs(Seq((1L, spammy, "en", "s"), (2L, diverse, "fr", "s")))
    val r = TextAnalysis.gopherRules(spark, dir).collect().map(x => x.getString(0) -> x).toMap
    assert(r("en").getAs[Long]("n_pass") == 0, "repetitive doc must fail both rules")
    assert(r("fr").getAs[Long]("n_pass") == 1, "diverse doc must pass")
    assert(r("en").getAs[Double]("sum_top_tok") > 0.4, "30/61 tokens are 'buy'")
    assert(r("fr").getAs[Double]("sum_dup_bg") == 0.0)
  }

  test("q69 source mixing: weight-1.0 sources keep everything; keep rate tracks weight") {
    val r = TrainingPrep.sourceMixing(spark, "/root/testdata/sf0.01").collect()
    r.foreach { row =>
      val (total, kept, w) =
        (row.getAs[Long]("n_total"), row.getAs[Long]("n_kept"), row.getAs[Double]("weight"))
      if (w == 1.0) assert(kept == total, s"${row.getString(0)}: weight 1.0 must keep all")
      else {
        val rate = kept.toDouble / total
        assert(math.abs(rate - w) < 0.25, s"${row.getString(0)}: keep rate $rate vs weight $w")
      }
    }
    assert(r.map(_.getAs[Double]("weight")).distinct.sorted.toSeq == Seq(0.25, 0.5, 0.75, 1.0))
  }
}
