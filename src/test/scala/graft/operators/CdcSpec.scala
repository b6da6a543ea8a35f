package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The property that justifies content-defined chunking over a fixed grid
  * (t20): boundaries anchor to CONTENT, so a local edit redraws only the
  * chunk(s) it touches while every other chunk's fingerprint survives.
  * A fixed-width chunker fails this test by construction — an insertion
  * shifts every downstream chunk. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def chunkFps(text: String): Seq[(String, Long)] = {
    Seq(Tuple1(text)).toDF("text")
      .select(transform(TextAnalysis.tokens(col("text")),
        t => lower(t)).as("toks"))
      .withColumn("ends", TextAnalysis.cdcEnds(col("toks"), 4))
      .select(explode(TextAnalysis.cdcChunks(col("toks"), col("ends")))
        .as("c"))
      .select(col("c.fp"), col("c.len"))
      .as[(String, Long)].collect().toSeq
  }

  test("chunk lengths tile the document exactly") {
    val words = (1 to 200).map(i => s"w${i % 37}x$i")
    val fps = chunkFps(words.mkString(" "))
    assert(fps.map(_._2).sum == 200L)
    assert(fps.forall(_._2 >= 1L))
  }

  test("an insertion redraws O(1) chunks, the rest keep their fingerprints") {
    val words = (1 to 400).map(i => s"tok${i * 7 % 101}v$i")
    val orig = chunkFps(words.mkString(" "))
    // insert two tokens mid-document
    val edited = chunkFps(
      (words.take(200) ++ Seq("INS1", "INS2") ++ words.drop(200))
        .mkString(" "))
    val kept = orig.map(_._1).toSet.intersect(edited.map(_._1).toSet)
    // every chunk except the edited neighborhood survives: the insertion
    // can invalidate at most the chunk it lands in plus a bounded
    // neighborhood where it perturbs a boundary gram
    assert(orig.size > 10, s"degenerate chunking: ${orig.size} chunks")
    assert(kept.size >= orig.size - 3,
      s"CDC locality violated: ${orig.size - kept.size} of ${orig.size} " +
        "chunks redrawn by a 2-token insertion")
    // and the same edit under FIXED-width chunking redraws the whole tail
    def fixed(ws: Seq[String]) = ws.grouped(4).map(_.mkString(" ")).toSeq
    val fixedKept = fixed(words).toSet
      .intersect(fixed(words.take(200) ++ Seq("INS1", "INS2") ++
        words.drop(200)).toSet)
    assert(fixedKept.size <= fixed(words).size / 2 + 1,
      "fixed-width chunking unexpectedly local — test premise broken")
  }

  test("empty and short docs chunk sanely") {
    assert(chunkFps("").isEmpty)
    assert(chunkFps("one two") == Seq((
      // md5 of "one two" — single tail chunk
      java.security.MessageDigest.getInstance("MD5")
        .digest("one two".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, 2L)))
  }
}
