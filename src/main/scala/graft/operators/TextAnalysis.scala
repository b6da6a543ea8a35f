package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: tokenization, token
  * counting, language-ID heuristic, quality scoring, fingerprinting.
  *
  * Everything is built-in column expressions (codegen'd, no UDF), and every
  * formula is chosen to be reproducible in ANSI-ish SQL (DuckDB oracle):
  * md5 is the portable hash, regexp token split is the portable tokenizer.
  * At scale these are pure map-side transforms — no shuffle at all.
  */
object TextAnalysis {

  /** Whitespace tokenizer; empty text → empty array. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  /** Token count (whitespace); cheap proxy for a BPE count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: words + digit runs + punctuation runs, counted by
    * a regex that approximates byte-pair segmentation granularity. */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "[^A-Za-z0-9]+"), t => t =!= "")) +
      length(regexp_replace(text, "[A-Za-z0-9\\s]", ""))

  /** Stopword-hit count among tokens. */
  def stopwordHits(text: Column, stopwords: Seq[String]): Column = {
    val sw = array(stopwords.map(lit): _*)
    size(filter(tokens(text), t => array_contains(sw, t)))
  }

  /** Language-ID heuristic: score each language by marker-token hits,
    * pick argmax; ties break by the languages' declared order. */
  def langId(text: Column, markers: Seq[(String, Seq[String])]): Column = {
    val toks = tokens(text)
    val scored = markers.map { case (lang, words) =>
      val w = array(words.map(lit): _*)
      struct(size(filter(toks, t => array_contains(w, t))).as("score"),
        lit(lang).as("lang"))
    }
    // argmax with first-wins tie-break: fold keeping the strictly-greater
    scored.reduceLeft { (best, cand) =>
      when(cand.getField("score") > best.getField("score"), cand).otherwise(best)
    }.getField("lang")
  }

  /** Quality score in [0,1]: length saturation + stopword ratio + mean word
    * length band. Deterministic, portable arithmetic. Rounding is
    * multiply-then-floor (NOT round(x, 4)): engines disagree on decimal
    * rounding of doubles at .00005 boundaries — Spark rounds the double's
    * exact binary value, DuckDB multiplies first — and a 5000-doc corpus
    * hits such a boundary; floor of identical doubles can't diverge. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val n = tokenCount(text).cast("double")
    val lenScore = least(n / 100.0, lit(1.0))
    val swRatio = when(n > 0, stopwordHits(text, stopwords) / n).otherwise(0.0)
    val meanWordLen = when(n > 0,
      aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t)) / n)
      .otherwise(0.0)
    val wordLenScore = when(meanWordLen.between(3.0, 8.0), 1.0).otherwise(0.5)
    floor((lenScore * 0.4 + swRatio * 0.3 + wordLenScore * 0.3) * 10000.0
      + 0.5) / 10000.0
  }

  /** Whole-document fingerprint: md5 of whitespace-normalized lowercase text
    * (a content-defined hash both engines share). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", transform(tokens(text), t => lower(t))))

  /** Distinct md5 hashes of every `k`-word shingle (lowercased); documents
    * shorter than `k` words yield no shingles. The comparison unit for
    * benchmark decontamination ([[Decontaminate]]).
    *
    * Construction: zip `k` shifted copies of the token array and concat —
    * NOT `slice(toks, i, k)` inside a per-index lambda. A lambda body that
    * references the tokenization SUBTREE re-evaluates it once per element
    * (shingle-count × regexp-split per document — measured ~50× slower at
    * sf0.1); the shifted zips touch each token O(k) times total. `concat`
    * (null-propagating, unlike concat_ws) poisons the short tail where the
    * shifted copies run out, and the final filter drops it — leaving exactly
    * the n-k+1 shingles. */
  def shingleHashes(text: Column, k: Int): Column =
    array_distinct(transform(shingleSeq(text, k), s => md5(s)))

  /** The raw (non-distinct, unhashed) lowercase `k`-word shingle SEQUENCE —
    * the occurrence-grain twin of [[shingleHashes]] for consumers that need
    * shingle frequencies, not set membership (t37's type census). Same
    * shifted-zip construction (see the scaladoc above). */
  def shingleSeq(text: Column, k: Int): Column = {
    val toks = transform(tokens(text), t => lower(t))
    val joined = (1 until k).foldLeft(toks) { (acc, j) =>
      zip_with(acc, slice(toks, lit(j + 1), size(toks)),
        (a, b) => concat(a, lit(" "), b))
    }
    filter(joined, s => s.isNotNull)
  }

  /** Min-shingle fingerprint: minimum md5 over all `k`-word shingles —
    * a 1-permutation MinHash, robust to local edits. Documents shorter than
    * `k` words fall back to the whole-document fingerprint. */
  def minShingleFingerprint(text: Column, k: Int): Column = {
    val toks = transform(tokens(text), t => lower(t))
    val n = size(toks)
    val shingles = transform(sequence(lit(1), n - (k - 1)),
      i => md5(concat_ws(" ", slice(toks, i, lit(k)))))
    when(n >= k, array_min(shingles)).otherwise(fingerprint(text))
  }

  /** Content-defined chunks (LBFS/rsync, Muthitacharoen 2001) over a
    * STAGED lowercase token-array column, as an array of
    * `struct(fp, len)`: a chunk boundary falls AFTER 1-based token j
    * (3 ≤ j < n) wherever the portable hash of the 3-gram ending at j is
    * ≡ 0 mod `modulus`; the tail chunk always closes at n. Boundaries
    * are CONTENT-anchored, so a local edit redraws only the chunk it
    * lands in (and at most the one whose boundary gram it overlaps) —
    * the locality property CdcSpec proves. Expected chunk length ≈
    * `modulus` tokens. Pure per-row array math; nothing shuffles until
    * the caller aggregates chunk rows.
    *
    * `toks` MUST be a materialized column (stage it with a prior
    * projection), never an inline `transform(tokens(text), lower)`
    * expression: the boundary scan reads elements inside per-index
    * lambdas, and an inline expression re-tokenizes the whole document
    * on every access — measured 80× slower at sf0.1 (the shingleHashes
    * lesson, again). */
  def cdcEnds(toks: Column, modulus: Int): Column = {
    val n = size(toks)
    def gramHash(j: Column) = conv(substring(md5(concat_ws(" ",
        element_at(toks, j - 2), element_at(toks, j - 1),
        element_at(toks, j))), 1, 15), 16, 10).cast("long")
    val interior = when(n >= 4,
      filter(sequence(lit(3), n - 1), j => gramHash(j) % modulus === 0))
      .otherwise(array().cast("array<int>"))
    when(n > 0, concat(interior, array(n)))
      .otherwise(array().cast("array<int>"))
  }

  /** Chunk structs from STAGED `toks` + STAGED `ends` (from [[cdcEnds]]).
    * `ends` must also be materialized: `starts` reads it per index, and
    * an inline ends expression re-runs the whole boundary scan per
    * chunk. */
  def cdcChunks(toks: Column, ends: Column): Column = {
    val starts = transform(ends, (_, i) =>
      when(i === 0, lit(1)).otherwise(element_at(ends, i) + 1))
    zip_with(starts, ends, (st, en) => struct(
      md5(concat_ws(" ", slice(toks, st, en - st + 1))).as("fp"),
      (en - st + 1).cast("long").as("len")))
  }
}
