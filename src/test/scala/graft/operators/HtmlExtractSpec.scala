package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def pageFor(text: String, docId: Long = 7L, lang: String = "en",
      source: String = "srcA"): String =
    Seq((docId, lang, source, text)).toDF("doc_id", "lang", "source", "text")
      .select(TextAnalysis.tokens($"text").as("toks"), $"doc_id", $"lang",
        $"source")
      .select(HtmlExtract.syntheticPage($"doc_id", $"lang", $"source",
        $"toks")).as[String].head()

  private def extract(html: String): (Long, Long, String) = {
    val r = Seq(html).toDF("html")
      .select(HtmlExtract.blocks($"html").as("blocks"))
      .select(HtmlExtract.blockFeatures($"blocks").as("fs"))
      .select(size($"fs").cast("long"),
        size(filter($"fs", f => f.getField("keep"))).cast("long"),
        HtmlExtract.cleanText($"fs"))
      .as[(Long, Long, String)].head()
    r
  }

  test("extraction recovers exactly the article text from a synthetic page") {
    val text = (1 to 45).map(i => s"word$i the a row").mkString(" ")
    val (nBlocks, nKept, clean) = extract(pageFor(text))
    // 180 tokens → 9 paragraphs; + head line, nav, ad, footer = 13 blocks
    assert(nBlocks == 13L)
    assert(nKept == 9L)
    // kept paragraphs reassemble the original token stream verbatim
    assert(clean == text.split("\\s+").mkString(" "))
  }

  test("boilerplate is rejected for the right reasons") {
    val html = pageFor("one two three four five six seven eight")
    val feats = Seq(html).toDF("html")
      .select(HtmlExtract.blocks($"html").as("blocks"))
      .select(explode(HtmlExtract.blockFeatures($"blocks")).as("f"))
      .select($"f.text", $"f.anchors", $"f.keep")
      .as[(String, Long, Boolean)].collect()
    val byText = feats.map(f => (f._1, f)).toMap
    // head line: title text survives tag strip but is too short
    assert(byText.keys.exists(_.startsWith("Doc 7")))
    assert(!byText.filter(_._1.startsWith("Doc 7")).values.head._3)
    // nav: pure links → anchor chars ≈ text chars, dropped
    val nav = feats.find(_._1.contains("archive")).get
    assert(nav._2 > 0 && !nav._3)
    // ad block: ≥5 words but link-dominated → dropped by density, not length
    val ad = feats.find(_._1.contains("top deals")).get
    assert(ad._2 == 15L && !ad._3)
    // footer: Terms+Privacy anchors dominate → dropped
    val foot = feats.find(_._1.contains("Copyright")).get
    assert(!foot._3)
    // the one content paragraph (8 words, no links) is kept
    val par = feats.find(_._1.startsWith("one two")).get
    assert(par._2 == 0L && par._3)
  }

  test("script and style contents never leak into any block") {
    val (_, _, clean) = extract(pageFor("alpha beta gamma delta epsilon"))
    assert(!clean.contains("tracker") && !clean.contains("margin"))
  }

  test("short trailing paragraph is dropped by the word-count rule") {
    // 23 tokens → one 20-token paragraph (kept) + one 3-token tail (dropped)
    val text = (1 to 23).map(i => s"t$i").mkString(" ")
    val (_, nKept, clean) = extract(pageFor(text))
    assert(nKept == 1L)
    assert(clean == (1 to 20).map(i => s"t$i").mkString(" "))
  }

  test("t26 plan is map-only: no shuffle, single documents scan") {
    val df = graft.queries.Queries.t26HtmlExtract(spark,
      "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      "extraction must stay a projection over the scan")
    assert(plan.linesIterator.count(_.contains("FileScan")) == 1)
    assert(df.count() > 0)
  }
}
