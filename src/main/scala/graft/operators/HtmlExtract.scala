package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → clean-text extraction — the markup-strip + boilerplate-removal
  * front door of a from-raw-web training-data pipeline (the step that runs
  * BEFORE language-ID / quality gates / dedup ever see a document; C4,
  * Gopher and RefinedWeb all start here). The heuristics are the public
  * jusText / trafilatura line-classification rules (Pomikálek 2011):
  * a block survives when it carries enough running text (word count) and
  * is not link-dominated (anchor-text chars / text chars).
  *
  * Everything is built-in column expressions (codegen'd, no UDF), all
  * integer arithmetic — reproducible in DuckDB SQL for the oracle twin —
  * and pure map-side: at 100 TB the whole extraction is a projection
  * fused into the scan, shuffling nothing.
  *
  * The reference corpus (`documents.text`) is API JSON, not web markup, so
  * queries feed a DETERMINISTIC page synthesis ([[syntheticPage]]): each
  * document is wrapped in a full page (head/script/style, link-only nav,
  * content paragraphs, an ad block, a footer) built with the same string
  * algebra on both engines — the extractor must recover exactly the
  * article text and reject exactly the boilerplate.
  */
object HtmlExtract {

  /** Tokens per synthesized <p> paragraph. */
  val ParagraphWords = 20

  /** Minimum words for a block to count as running text (jusText's
    * short-block rule). */
  val MinBlockWords = 5

  /** Link-density cut: drop a block when 10·anchor_chars ≥ 3·text_chars
    * (i.e. density ≥ 0.3), integer cross-multiplied so no float seam. */
  val LinkDensityNum = 3
  val LinkDensityDen = 10

  /** Deterministic HTML page around a document: head with title + style +
    * script (must be stripped wholesale), a nav of pure links, the text as
    * ParagraphWords-token <p> blocks, a link-heavy ad div, and a footer.
    * `toks` MUST be a materialized array column (the cdcEnds lesson: the
    * paragraph builder slices it per index). */
  def syntheticPage(docId: Column, lang: Column, source: Column,
      toks: Column): Column = {
    val nPars = ceil(size(toks) / lit(ParagraphWords.toDouble)).cast("int")
    // guard size >= 1: sequence(1, 0) would generate DESCENDING [1, 0]
    val paragraphs = when(size(toks) > 0, array_join(
      transform(sequence(lit(1), nPars),
        i => concat(lit("<p>"),
          array_join(slice(toks, (i - lit(1)) * ParagraphWords + 1,
            lit(ParagraphWords)), " "),
          lit("</p>"))),
      "\n")).otherwise(lit(""))
    concat(
      lit("<html><head><title>Doc "), docId.cast("string"),
      lit("</title><style>p { margin: 0; }</style>" +
        "<script>var tracker = \"x\"; load();</script></head><body>\n"),
      lit("<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> " +
        "<a href=\"/archive\">"), lang, lit(" archive</a></nav>\n"),
      paragraphs,
      lit("\n<div class=\"promo\"><a href=\"/buy\">Buy now</a> top deals " +
        "<a href=\"/go\">click here</a></div>\n"),
      lit("<footer>Copyright 2026 "), source,
      lit(" <a href=\"/terms\">Terms</a> <a href=\"/privacy\">Privacy</a>" +
        "</footer></body></html>"))
  }

  /** script/style blocks removed (tags AND contents — their text is code,
    * never content). No regex backreferences (portability: RE2 oracles). */
  def stripScriptStyle(html: Column): Column =
    regexp_replace(
      regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " "),
      "(?s)<style[^>]*>.*?</style>", " ")

  /** Tag-stripped, whitespace-normalized text of one block. */
  def blockText(block: Column): Column =
    trim(regexp_replace(regexp_replace(block, "<[^>]*>", " "), "\\s+", " "))

  /** Non-space chars inside <a>…</a> of one block (the jusText link-density
    * numerator). */
  def anchorChars(block: Column): Column =
    coalesce(aggregate(
      regexp_extract_all(block, lit("<a [^>]*>([^<]*)</a>"), lit(1)),
      lit(0L), (acc, a) => acc + length(regexp_replace(a, " ", ""))), lit(0L))

  /** Block survives: enough words AND below the link-density cut. */
  def keepBlock(text: Column, anchors: Column): Column = {
    val words = size(TextAnalysis.tokens(text))
    val chars = length(regexp_replace(text, " ", ""))
    words >= MinBlockWords &&
      anchors * LinkDensityDen < chars * LinkDensityNum
  }

  /** Per-document extraction over a MATERIALIZED html column: returns
    * (blocks, kept) — the '\n'-split block array and the struct array
    * (text, anchors, keep) of per-block features. Callers stage `blocks`
    * before computing features (per-index lambdas must not re-split). */
  def blocks(html: Column): Column = split(stripScriptStyle(html), "\n")

  /** Features per block — map over a STAGED block array. */
  def blockFeatures(blocksCol: Column): Column =
    transform(blocksCol, b => {
      val t = blockText(b)
      val a = anchorChars(b)
      struct(t.as("text"), a.as("anchors"), keepBlock(t, a).as("keep"))
    })

  /** The clean article text: kept blocks joined by one space. */
  def cleanText(features: Column): Column =
    array_join(transform(filter(features, f => f.getField("keep")),
      f => f.getField("text")), " ")
}
