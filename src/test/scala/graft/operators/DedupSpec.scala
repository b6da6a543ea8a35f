package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("prefixFilterDupPairs has EXACT recall vs brute force on seeded corpora") {
    val rnd = new scala.util.Random(20260815L)
    val k = 3
    for (trial <- 1 to 3) {
      // small alphabet + shared phrase injection → a spread of Jaccard
      // values straddling the threshold, including near-misses
      val phrases = Seq.fill(6)(Seq.fill(5)(s"p${rnd.nextInt(8)}").mkString(" "))
      val docs = (1L to 30L).map { id =>
        val base = Seq.fill(3 + rnd.nextInt(4))(phrases(rnd.nextInt(6)))
        val noise = Seq.fill(rnd.nextInt(4))(s"n${rnd.nextInt(20)}")
        id -> rnd.shuffle(base ++ noise).mkString(" ")
      }
      def shingles(text: String): Set[String] = {
        val t = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        t.sliding(k).filter(_.length == k).map(_.mkString(" ")).toSet
      }
      val tPpm = 400000L
      val expected = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        sa = shingles(ta); sb = shingles(tb) if sa.nonEmpty && sb.nonEmpty
        inter = (sa & sb).size.toDouble
        // HALF_UP like Spark's round() (rint would tie-to-even: 0.40625
        // must go to 0.4063, not 0.4062)
        jac = math.floor(inter / (sa.size + sb.size - inter) * 1e4 + 0.5) / 1e4
        if jac >= tPpm.toDouble / 1e6
      } yield (ia, ib, jac)).toSet
      val got = Dedup.prefixFilterDupPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", k, tPpm)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == expected, s"trial $trial")
      assert(expected.nonEmpty, s"trial $trial produced no pairs — weak test")
    }
  }

  test("prefixFilterDupPairs integer-ceil prefix survives the 0.6*5 float trap") {
    // sz=5 shingles, t=0.6: double ceil(0.6*5) = 4 → prefix 2 (wrong);
    // exact ceil = 3 → prefix 3. Two docs overlapping ONLY in their
    // 3rd-rarest shingle must still pair when J ≥ 0.6.
    // 7 tokens → 5 shingles each; 4 shared (J = 4/6 ≈ 0.667 ≥ 0.6).
    val docs = Seq(
      (1L, "a b c d e f x1"),
      (2L, "a b c d e f x2")).toDF("doc_id", "text")
    val got = Dedup.prefixFilterDupPairs(docs, "doc_id", "text", 3, 600000L)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 0.6667)))
  }

  test("containmentDupPairs has EXACT recall vs brute force on seeded corpora") {
    val rnd = new scala.util.Random(20260901L)
    val k = 3
    for (trial <- 1 to 3) {
      val phrases = Seq.fill(6)(Seq.fill(5)(s"p${rnd.nextInt(8)}").mkString(" "))
      val docs = (1L to 30L).map { id =>
        val base = Seq.fill(2 + rnd.nextInt(5))(phrases(rnd.nextInt(6)))
        val noise = Seq.fill(rnd.nextInt(4))(s"n${rnd.nextInt(20)}")
        id -> rnd.shuffle(base ++ noise).mkString(" ")
      }
      def shingles(text: String): Set[String] = {
        val t = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        t.sliding(k).filter(_.length == k).map(_.mkString(" ")).toSet
      }
      val tPpm = 600000L
      // DIRECTED pairs: denominator is side a alone
      val expected = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia != ib
        sa = shingles(ta); sb = shingles(tb) if sa.nonEmpty && sb.nonEmpty
        c = (sa & sb).size.toDouble / sa.size
        if c >= tPpm.toDouble / 1e6
      } yield (ia, ib, math.floor(c * 1e4 + 0.5) / 1e4)).toSet
      val got = Dedup.containmentDupPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", k, tPpm)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == expected, s"trial $trial")
      assert(expected.nonEmpty, s"trial $trial produced no pairs — weak test")
    }
  }

  test("containmentDupPairs sees the quote-inside-article pair resemblance misses") {
    val rnd = new scala.util.Random(20260902L)
    val quote = Seq.fill(12)(s"q${rnd.nextInt(30)}").mkString(" ")
    val article = Seq.fill(80)(s"a${rnd.nextInt(200)}").mkString(" ") +
      " " + quote + " " + Seq.fill(80)(s"z${rnd.nextInt(200)}").mkString(" ")
    val docs = Seq((1L, quote), (2L, article),
      (3L, Seq.fill(40)(s"s${rnd.nextInt(99)}").mkString(" "))).toDF("doc_id", "text")
    val cont = Dedup.containmentDupPairs(docs, "doc_id", "text", 3, 800000L)
      .as[(Long, Long, Double)].collect().toSet
    // the quote's 10 shingles all appear in the article → C(1→2) = 1.0;
    // the reverse direction and the stranger must be absent
    assert(cont.exists { case (a, b, c) => a == 1L && b == 2L && c >= 0.999 })
    assert(!cont.exists { case (a, b, _) => a == 2L && b == 1L })
    assert(!cont.exists { case (a, b, _) => a == 3L || b == 3L })
    // and the SYMMETRIC measure cannot see it at any useful threshold:
    // J ≤ |quote| / |article| ≪ 0.5
    val jac = Dedup.prefixFilterDupPairs(docs, "doc_id", "text", 3, 500000L)
      .as[(Long, Long, Double)].collect().toSet
    assert(!jac.exists { case (a, b, _) => Set(a, b) == Set(1L, 2L) })
  }

  test("containmentDupPairs maxDf drops hot-shingle probes from the container index only") {
    // boilerplate shingle shared by everything; cap at 3 removes it from
    // the FULL side so pure-boilerplate containment disappears, while the
    // genuinely-contained pair (rare shingles) survives
    val bp = "the usual footer text"
    val docs = Seq(
      (1L, s"u1 u2 u3 u4 u5 $bp"),
      (2L, s"u1 u2 u3 u4 u5 extra tail words $bp"),
      (3L, s"v1 v2 $bp"),
      (4L, s"w1 w2 $bp"),
      (5L, s"x1 x2 $bp")).toDF("doc_id", "text")
    val capped = Dedup.containmentDupPairs(docs, "doc_id", "text", 3,
      500000L, maxDf = 3L)
      .as[(Long, Long, Double)].collect().toSet
    assert(capped.exists { case (a, b, _) => a == 1L && b == 2L })
    assert(!capped.exists { case (a, b, _) => a == 3L && b == 4L })
  }

  test("chunkResemblancePairs: identical docs score 1.0, local edits stay near-dup, strangers absent") {
    val rnd = new scala.util.Random(20260817L)
    val body = Seq.fill(120)(s"tk${rnd.nextInt(50)}").mkString(" ")
    val edited = {
      val t = body.split(" "); t(60) = "EDITED"; t.mkString(" ")
    }
    val stranger = Seq.fill(120)(s"zz${rnd.nextInt(50)}").mkString(" ")
    val docs = Seq((1L, body), (2L, body), (3L, edited), (4L, stranger))
      .toDF("doc_id", "text")
    val got = Dedup.chunkResemblancePairs(docs, "doc_id", "text",
        modulus = 8, threshold = 0.3)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 2L)) == 1.0)
    // a one-token edit redraws only the chunk it lands in (CDC locality)
    assert(got.contains(1L -> 3L) && got((1L, 3L)) < 1.0 && got((1L, 3L)) > 0.3)
    assert(!got.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("chunkResemblancePairs maxDf drops boilerplate-only pairs, keeps real ones") {
    // every doc shares one boilerplate sentence; only docs 1/2 share real
    // content. Pinned open, boilerplate alone links strangers at low
    // resemblance; with maxDf=2 the shared-by-4 chunk leaves the index.
    // long enough (~8-token expected chunks) that several chunks fall
    // FULLY inside the boilerplate and are byte-shared by all four docs
    val boiler = (1 to 80).map(i => s"b$i").mkString(" ")
    val real = (1 to 60).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler $real"), (2L, s"$boiler $real"),
      (3L, s"$boiler " + (1 to 60).map(i => s"x$i").mkString(" ")),
      (4L, s"$boiler " + (1 to 60).map(i => s"y$i").mkString(" ")))
      .toDF("doc_id", "text")
    def pairs(cap: Long) = Dedup.chunkResemblancePairs(docs, "doc_id",
        "text", modulus = 8, threshold = 0.01, maxDf = cap)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    val open = pairs(Long.MaxValue)
    assert(open.contains(3L -> 4L), "boilerplate links strangers when open")
    val capped = pairs(2L)
    assert(capped.contains(1L -> 2L), "real duplication survives the cap")
    assert(!capped.contains(3L -> 4L), "boilerplate-only pair dropped")
  }

  test("sortedNeighborhoodPairs matches a flat-sort brute force (cross-bucket ranks included)") {
    val rnd = new scala.util.Random(20260816L)
    val w = 3
    val th = 0.3
    // text prefixes spread over many first-2-char buckets so window pairs
    // routinely straddle bucket boundaries — the contiguity hazard
    val docs = (1L to 60L).map { id =>
      val lead = s"${('a' + rnd.nextInt(6)).toChar}${('a' + rnd.nextInt(3)).toChar}x${rnd.nextInt(3)}"
      val body = Seq.fill(4 + rnd.nextInt(4))(s"w${rnd.nextInt(10)}").mkString(" ")
      (id, s"$lead $body", s"l${rnd.nextInt(2)}", s"s${rnd.nextInt(2)}")
    }
    def norm(t: String) = t.toLowerCase.replaceAll("\\s+", " ").take(12)
    def toks(t: String) = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    val ranked = docs.sortBy { case (id, t, l, s) => (l, s, norm(t), id) }
      .zipWithIndex.map { case ((id, t, _, _), i) => (i + 1, id, toks(t)) }
    val expected = (for {
      (ra, ia, ta) <- ranked; (rb, ib, tb) <- ranked
      if rb > ra && rb <= ra + (w - 1)
      inter = (ta & tb).size.toDouble
      uni = ta.size + tb.size - inter
      jac = math.floor((if (uni > 0) inter / uni else 1.0) * 1e4 + 0.5) / 1e4
      if jac >= th
    } yield (math.min(ia, ib), math.max(ia, ib), (rb - ra).toLong, jac)).toSet
    val got = Dedup.sortedNeighborhoodPairs(
        docs.toDF("doc_id", "text", "lang", "source"),
        "doc_id", "text", Seq("lang", "source"), 12, w, th)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == expected)
    assert(expected.nonEmpty, "seed produced no pairs — weak test")
  }

  test("substringDupSpans catches shifted duplicates and merges overlaps") {
    val docs = Seq(
      (1L, "a b c d e"),      // shares window "a b c" with doc 2 (offset 0)
      (2L, "x a b c y"),      // ... at offset 1 — disjoint chunking misses it
      (3L, "p q r p q r p q"), // self-repeat: every window duplicated
      (4L, "u v w z1 z2"),    // clean
      (5L, "s t"))            // shorter than k
      .toDF("doc_id", "text")
    val out = Dedup.substringDupSpans(docs, "doc_id", "text", k = 3)
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, d) => id -> ((n, d)) }.toMap
    assert(out(1L) == ((5L, 3L)))  // tokens 1-3 covered
    assert(out(2L) == ((5L, 3L)))  // tokens 2-4 covered
    assert(out(3L) == ((8L, 8L)))  // islands merge to the whole doc
    assert(out(4L) == ((5L, 0L)))
    assert(out(5L) == ((2L, 0L)))  // no windows, still reported
  }

  test("substringDupSpans matches a brute-force reference on seeded corpora") {
    val rnd = new scala.util.Random(20260813L)
    val k = 3
    for (trial <- 1 to 5) {
      // tiny alphabet → dense window collisions; lengths straddle k
      val docs = (1L to 40L).map { id =>
        val n = rnd.nextInt(12) // 0..11 tokens
        id -> Seq.fill(n)(s"w${rnd.nextInt(4)}").mkString(" ")
      }
      // brute force: global window-string counts, then per-doc union of
      // duplicated spans via a covered-position set
      val wins = docs.flatMap { case (id, text) =>
        val t = text.split("\\s+").filter(_.nonEmpty)
        (0 to t.length - k).map(i =>
          (id, i, t.slice(i, i + k).mkString(" ")))
      }
      val counts = wins.groupBy(_._3).map { case (fpv, g) => fpv -> g.size }
      val expected = docs.map { case (id, text) =>
        val t = text.split("\\s+").filter(_.nonEmpty)
        val covered = wins.filter(w => w._1 == id && counts(w._3) >= 2)
          .flatMap(w => w._2 until w._2 + k).toSet
        id -> ((t.length.toLong, covered.size.toLong))
      }.toMap
      val got = Dedup.substringDupSpans(
        docs.toDF("doc_id", "text"), "doc_id", "text", k)
        .as[(Long, Long, Long)].collect()
        .map { case (id, n, d) => id -> ((n, d)) }.toMap
      assert(got == expected, s"trial $trial diverged from brute force")
    }
  }

  private def docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "THE  Quick   brown fox"),      // exact dup of 1 after normalization
    (3L, "the quick brown wolf"),        // near dup (jaccard 3/5 = 0.6)
    (4L, "completely different text entirely"),
    (5L, "")).toDF("doc_id", "text")

  test("exactGroups groups normalized-identical docs") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect()
    val byRep = g.map(r => r._2 -> r._3).toMap
    assert(byRep(1L) == 2) // docs 1+2 collapse
    assert(byRep(3L) == 1)
    assert(byRep(4L) == 1)
    assert(g.map(_._3).sum == 5)
  }

  test("exactDedup keeps one representative per content") {
    val kept = Dedup.exactDedup(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L, 5L))
  }

  test("jaccard column matches hand computation") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(Dedup.jaccard($"x", $"y")).as[Double].head()
    assert(math.abs(j - 2.0 / 4.0) < 1e-12)
  }

  test("minhashDupPairs finds the near-dup cluster (small-vocab bitmask path)") {
    val pairs = Dedup.minhashDupPairs(docs, "doc_id", "text",
      k = 16, bands = 8, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // 1-2 identical (jaccard 1), 1-3 and 2-3 at 0.6; with 8 bands of 2 rows
    // identical sets always collide; 0.6 pairs collide with high probability
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash general path (string-array verify) agrees with bitmask path") {
    // force the general path by exceeding 62 distinct tokens
    val bigVocab = (0 until 80).map(i => (100L + i, s"tok$i filler$i"))
    val all = docs.union(bigVocab.toDF("doc_id", "text"))
    val pairs = Dedup.minhashDupPairs(all, "doc_id", "text",
      k = 16, bands = 8, threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("minhash band joins plan as ShuffledHashJoin on both paths (no merge-join degeneration)") {
    // fast (bitmask) path
    val fast = Dedup.minhashDupPairs(docs, "doc_id", "text", k = 16, bands = 8)
    assert(fast.queryExecution.executedPlan.toString.contains("ShuffledHashJoin"),
      "fast-path band join lost its shuffle_hash hint")
    // general (>62-vocab) path: the candidate self-join must hash too —
    // duplicate-heavy band keys degenerate a sort-merge join
    val bigVocab = (0 until 80).map(i => (100L + i, s"tok$i filler$i"))
    val gen = Dedup.minhashDupPairs(docs.union(bigVocab.toDF("doc_id", "text")),
      "doc_id", "text", k = 16, bands = 8)
    assert(gen.queryExecution.executedPlan.toString.contains("ShuffledHashJoin"),
      "general-path candidate join lost its shuffle_hash hint")
  }

  test("dedupAgainstIndex agrees with minhashDupPairs on cross-split pairs") {
    // >62 distinct tokens so minhashDupPairs takes the general path whose
    // band construction matches the index's (same signatures() semantics)
    val bigVocab = (0 until 80).map(i => (100L + i, s"tok$i filler$i"))
    val all = docs.union(bigVocab.toDF("doc_id", "text"))
    val corpus = all.where(col("doc_id") % 2 === 0)
    val delta = all.where(col("doc_id") % 2 === 1)
    val idx = java.nio.file.Files.createTempDirectory("idxspec").toString
    Dedup.buildMinhashIndex(corpus, "doc_id", "text", idx, 16, 8)
    val got = Dedup.dedupAgainstIndex(delta, "doc_id", "text", idx, 16, 8,
      threshold = 0.5)
      .select("delta_id", "corpus_id").as[(Long, Long)].collect().toSet
    // reference: full-corpus pair mining restricted to cross-split pairs,
    // reoriented to (delta, corpus)
    val ref = Dedup.minhashDupPairs(all, "doc_id", "text", k = 16,
      bands = 8, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .filter { case (a, b) => (a % 2) != (b % 2) }
      .map { case (a, b) => if (a % 2 == 1) (a, b) else (b, a) }.toSet
    assert(got == ref)
  }

  test("dedupAgainstIndex serve plan: index scans only, batch broadcasts") {
    val idx = java.nio.file.Files.createTempDirectory("idxplan").toString
    Dedup.buildMinhashIndex(docs.where(col("doc_id") =!= 1L), "doc_id",
      "text", idx, 16, 8)
    val plan = Dedup.dedupAgainstIndex(docs.where(col("doc_id") === 1L),
      "doc_id", "text", idx, 16, 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
    assert(!plan.contains("SortMergeJoin"), "index side shuffled")
    assert(!plan.contains("CartesianProduct"))
  }

  test("jaccardDupPairs bitmask and array paths agree (incl. empty docs)") {
    val blocked = Seq(
      (1L, "b1", "the quick brown fox"),
      (2L, "b1", "the quick brown fox jumps"),
      (3L, "b1", ""),
      (4L, "b1", ""),
      (5L, "b2", "the quick brown fox")).toDF("doc_id", "blk", "text")
    val small = Dedup.jaccardDupPairs(blocked, "doc_id", "text", Seq("blk"), 0.5)
      .as[(Long, Long, Double)].collect().toSet
    // force the array path with a >62-token vocab appended in another block
    val bigVocab = (0 until 70).map(i => (100L + i, "bx", s"tok$i")).toDF("doc_id", "blk", "text")
    val large = Dedup.jaccardDupPairs(blocked.union(bigVocab), "doc_id",
      "text", Seq("blk"), 0.5)
      .where($"id_a" < 100L).as[(Long, Long, Double)].collect().toSet
    assert(small == large)
    assert(small.contains((1L, 2L, 0.8)))  // 4/5
    assert(small.contains((3L, 4L, 1.0)))  // both empty → 1.0
    assert(!small.exists(p => p._1 == 1L && p._2 == 5L)) // cross-block never pairs
  }

  test("jaccardDupPairs reroutes oversized blocks to LSH instead of dropping") {
    // hot block H: 12 docs > maxBlock=10 → overflow path; docs 1-3 share an
    // identical token set (identical minhash signatures → guaranteed band
    // collision), so their true duplicate pairs MUST survive the reroute.
    // Block S stays under budget → exact path, untouched.
    val hot = (1 to 12).map(i =>
      (i.toLong, if (i <= 3) "alpha beta gamma delta"
                 else s"unique$i filler$i payload$i", "H"))
    val small = Seq((101L, "same words here", "S"),
      (102L, "same words here", "S"))
    val df = (hot ++ small).toDF("doc_id", "text", "blk")
    val pairs = Dedup.jaccardDupPairs(df, "doc_id", "text", Seq("blk"),
      0.8, maxBlock = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs((1L, 2L)) && pairs((1L, 3L)) && pairs((2L, 3L)),
      s"hot-block duplicates lost by the reroute: $pairs")
    assert(pairs((101L, 102L)), "exact path broken")
    // LSH candidates are content-based; the same-block constraint must hold
    assert(pairs.forall { case (a, b) => (a <= 12) == (b <= 12) })
  }

  test("passageDedup: global first occurrence wins at passage grain") {
    // k=3: doc 1 = [a b c][d e f]; doc 2 repeats [a b c]; doc 3 repeats
    // [d e f] at its FIRST position; doc 4 is a single short tail passage
    val df = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c x y z"),
      (3L, "d e f q r s"),
      (4L, "a b")).toDF("doc_id", "text")
    val out = Dedup.passageDedup(df, "doc_id", "text", 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((2L, 2L))) // both passages are first occurrences
    assert(out(2L) == ((2L, 1L))) // [a b c] owned by doc 1
    assert(out(3L) == ((2L, 1L))) // [d e f] owned by (doc 1, idx 1)
    assert(out(4L) == ((1L, 1L))) // short tail forms its own passage
  }

  test("simhash: identical sets identical hash; near sets near hamming") {
    val df = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "the quick brown wolf"), (4L, "zebra xylophone quartz jackdaw"))
      .toDF("doc_id", "text")
      .select($"doc_id", Dedup.simhash(Dedup.tokenSet($"text")).as("sh"))
    val m = df.as[(Long, Long)].collect().toMap
    assert(m(1L) == m(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1L), m(3L)) < ham(m(1L), m(4L)))
  }

  test("simhashDupPairs returns close pairs only") {
    val pairs = Dedup.simhashDupPairs(docs.where($"doc_id" =!= 5L),
      "doc_id", "text", bands = 6, maxHamming = 20)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 4L && p._1 != 4L))
  }
}
