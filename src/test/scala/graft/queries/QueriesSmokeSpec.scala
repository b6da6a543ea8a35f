package graft.queries

import graft.SparkSpec

/** Runs the whole declared surface at sf0.001: every query must plan and
  * execute (the driver's DuckDB gate checks values at sf0.01; this guards
  * against runtime regressions inside `sbt test`). */
class QueriesSmokeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("oracle map covers exactly the query map") {
    assert(graft.SparkEntry.oracleSql.keySet == graft.SparkEntry.queries.keySet)
  }

  graft.SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val n = fn(spark, sfDir).count()
      assert(n >= 0)
    }
  }

  // plan-quality locks: these assertions fail if a future refactor breaks
  // scan pushdown or de-broadcasts a dim join
  private def formattedPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q6 pushes every predicate into the parquet scan") {
    val plan = formattedPlan(Queries.q6ForecastRevenue(spark, sfDir))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), plan.take(800))
    assert(plan.contains("LessThan(l_quantity,24.0)"))
  }

  test("q6 scan reads only the four referenced columns") {
    val plan = formattedPlan(Queries.q6ForecastRevenue(spark, sfDir))
    assert(plan.contains(
      "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate:timestamp"))
  }

  test("sn1 wide-fact fixture is 70 columns wide") {
    val path = graft.sources.WideSnapshot.ensure(spark, sfDir)
    assert(spark.read.parquet(path).schema.length == 70)
  }

  test("sn1 prunes the 70-column scan to the 7 referenced columns") {
    val plan = formattedPlan(Queries.sn1SnapshotHourly(spark, sfDir))
    assert(plan.contains("ReadSchema: struct<ts:bigint,symbol:string," +
      "mark_price:double,funding_rate:double,volume:double," +
      "depth_bid_1bps:double,depth_ask_1bps:double>"),
      plan.takeRight(1500))
    assert(!plan.contains("bid_p100"), "unreferenced snapshot column read")
  }

  test("sn1 pushes the ts cut into the wide scan") {
    val plan = formattedPlan(Queries.sn1SnapshotHourly(spark, sfDir))
    assert(plan.contains("LessThan(ts,"), plan.takeRight(1500))
  }

  test("sn2 prunes the 70-column scan to the percentile/curvature columns") {
    val plan = formattedPlan(Queries.sn2BookShape(spark, sfDir))
    assert(plan.contains("ReadSchema: struct<ts:bigint,symbol:string," +
      "bid_p100:double,bid_p50:double,bid_p0:double,ask_p0:double," +
      "ask_p50:double,ask_p100:double,curvature_short_bid:double," +
      "curvature_long_ask:double>"),
      plan.takeRight(1500))
    assert(!plan.contains("mark_price"), "unreferenced snapshot column read")
    assert(plan.contains("LessThan(ts,"), plan.takeRight(1500))
  }

  test("s15 serving scan is partition-pruned to the probed cells (DPP)") {
    val plan = formattedPlan(Queries.s15IvfIndexPersist(spark, sfDir))
    assert(plan.contains("dynamicpruning"), plan.takeRight(2500))
  }

  test("t16 domain cap compiles to a bounded per-key TopK (WindowGroupLimit)") {
    val plan = formattedPlan(Queries.t16DomainCap(spark, sfDir))
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("t23 weighted sample is a map-side key + global TopK, no shuffle agg") {
    val plan = Queries.t23WeightedSample(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the A-ES key is inline column math (max of w hashes), so the only
    // distributed step is the per-partition heap + k-row driver merge
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
    assert(!plan.contains("Exchange"), "weighted sample shuffles:\n" +
      plan.take(1500))
  }

  test("a19 profile scans are single-column pruned, no Expand") {
    val plan = formattedPlan(Queries.a19Profile(spark, sfDir))
    // one pruned scan per profiled column; the multi-countDistinct
    // Expand plan (×6 row amplification) is the regression to catch
    assert(!plan.contains("Expand"), plan.take(1200))
    for (c <- Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_orderkey"))
      assert(plan.contains(s"ReadSchema: struct<$c:"),
        s"scan for $c not single-column pruned\n" + plan.takeRight(1500))
  }

  test("q3 dim joins broadcast (fact side never shuffles for the join)") {
    val plan = Queries.q3ShippingPriority(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("d10 pair verify is a cell EQUI-join over the cached assignment") {
    val plan = Queries.d10SemanticDedup(spark, sfDir)
      .queryExecution.executedPlan.toString
    // candidates come from hash/merge-joining on the cell key — never an
    // all-pairs nested loop over the corpus
    assert(!plan.contains("CartesianProduct"), "cartesian in d10")
    assert(plan.contains("InMemoryTableScan"),
      "assignment subtree not cached") // one argmax pass, three consumers
  }

  test("pipe1 stage counts don't re-scan the corpus once per stage") {
    // flags + two one-row aggregates: the plan reads documents for the
    // head counts and once for the funnel (whose dual consumers share the
    // fingerprint-window exchange) — NOT six scans for six stages
    // formatted mode prints each node twice (tree line + details block),
    // so N physical scans = 2N matches; the funnel has 3: head counts,
    // the s3 subtree feeding the passage explode, and the s3 subtree
    // feeding the doc-grain tail join (the latter two share their
    // fingerprint-window exchange at runtime via ReuseExchange)
    val plan = formattedPlan(Queries.pipe1Funnel(spark, sfDir))
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans <= 6, s"pipe1 re-scans per stage: ${scans / 2} scans\n" +
      plan.take(800))
  }

  test("pipe3 runs the semantic-dedup subtree once, not per stage branch") {
    val plan = formattedPlan(Queries.pipe3EmbedFunnel(spark, sfDir))
    val cellJoins = "InMemoryTableScan".r.findAllIn(plan).length
    // semanticDedup caches its cell-assignment subtree; the funnel must
    // not instantiate that subtree more than its three in-operator uses
    // (formatted mode prints each node twice → 3 uses = 6 matches)
    assert(cellJoins <= 6,
      s"semantic dedup duplicated: ${cellJoins / 2} cached scans")
  }

  test("q20 part prune reaches the fact pre-aggregate; dims broadcast") {
    val plan = Queries.q20PromotionSuppliers(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
    assert(!plan.contains("CartesianProduct"))
  }

  test("d11 bloom gate sits in the corpus scan filter, before the join") {
    val plan = Queries.d11BloomContamination(spark, sfDir)
      .queryExecution.executedPlan.toString
    // BloomFilterMightContain prints under its prettyName "might_contain"
    assert(plan.contains("might_contain"), plan.take(800))
    assert(!plan.contains("CartesianProduct"))
  }

  test("q19 pushes the size envelope and the quantity bounds into the scans") {
    val plan = formattedPlan(Queries.q19DisjunctiveRevenue(spark, sfDir))
    // Catalyst extracts the common conjuncts out of the OR-of-ANDs: every
    // arm bounds p_size and l_quantity, so both envelopes reach their scans
    // as pushed filters even though the brand pairing is post-join
    assert(plan.contains("LessThanOrEqual(p_size,15)"), plan.takeRight(1200))
    assert(plan.contains("GreaterThanOrEqual(l_quantity,1.0)") &&
      plan.contains("LessThanOrEqual(l_quantity,30.0)"), plan.takeRight(1200))
  }

  test("q2 min-cost lookup: dims broadcast, no cartesian") {
    val plan = Queries.q2MinCostSupplier(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("s13 IVF-PQ: candidates from the cell equi-join, never a crossJoin") {
    val plan = Queries.s13IvfPq(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
    assert(!plan.contains("BroadcastNestedLoopJoin"), "IVF-PQ went all-pairs")
    assert(!plan.contains("CartesianProduct"), "cartesian in s13")
  }

  test("t19 fertility: encoder joins broadcast, corpus side never sorts") {
    val plan = Queries.t19BpeFertility(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the vocab-grain encoder must broadcast into the exploded corpus —
    // a sort-merge there would shuffle the whole corpus on `word`
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
    assert(!plan.contains("SortMergeJoin"), "corpus shuffled on word")
    assert(!plan.contains("CartesianProduct"))
  }

  test("t27 URL dedup: canonicalization is map-side, one data shuffle") {
    // the canonical key must be computed inside the scan projection; the
    // only data shuffle is the window hash partition on canon_url (plus
    // the output orderBy's range partition) — a third Exchange means the
    // canonicalization stopped fusing
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = Queries.t27UrlDedup(spark, sfDir).queryExecution.executedPlan
      val exch = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      assert(exch.length == 2, s"${exch.length} shuffles:\n" +
        plan.toString.take(1200))
      assert(exch.exists(_.outputPartitioning.toString.contains("canon_url")))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevA)
  }

  test("pipe6 funnel: exactly the two window shuffles + the census agg") {
    // extraction, gates and URL algebra are all map-side; the plan's data
    // shuffles are the canon-URL window, the content-fp window, the lang
    // groupBy and the output orderBy — nothing corpus-wide beyond those
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan =
        Queries.pipe6WebCuration(spark, sfDir).queryExecution.executedPlan
      val exch = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      assert(exch.length == 4, s"${exch.length} shuffles:\n" +
        plan.toString.take(1200))
      val wins = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
      assert(wins.length == 2, plan.toString.take(800))
      assert(!plan.toString.contains("CartesianProduct"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevA)
  }

  test("w13 SCD2: one hash Exchange feeds both window passes") {
    // change-detect + interval-close share (user_id | ts, event_id), so
    // the plan must hold exactly two shuffles: the window hash partition
    // and the final orderBy range partition — a second window shuffle
    // means the shared sort order was broken by a refactor (AQE off so the
    // physical tree is walkable, as in the j10 lock)
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = Queries.w13Scd2(spark, sfDir).queryExecution.executedPlan
      val exch = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      assert(exch.length == 2, s"${exch.length} shuffles:\n" +
        plan.toString.take(1200))
      val wins = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
      assert(wins.length == 2, plan.toString.take(800))
      val sortsBetween = wins.head.collect {
        case s: org.apache.spark.sql.execution.SortExec => s }
      assert(sortsBetween.length == 1,
        "window passes re-sorted:\n" + wins.head.toString.take(1200))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevA)
  }

  test("t20 rewrite dedup: removal counts stay within chunk bounds") {
    val rows = Queries.t20LineDedup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, rm) = (r.getLong(1), r.getLong(2))
      assert(rm >= 0 && rm <= n, s"doc ${r.getLong(0)}: removed $rm of $n")
    }
  }

  test("a18 pagerank: rank mass conserved up to floor-division loss") {
    import graft.queries.QuerySpec.{PrScale, PrIters}
    val rows = Queries.a18Pagerank(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    // every division floors, so mass only leaks downward — and at most a
    // few ulps per node per round
    assert(total <= PrScale, s"mass grew: $total")
    assert(total >= PrScale - PrScale / 100 * PrIters,
      s"mass leaked beyond floor losses: $total of $PrScale")
    rows.foreach(r => assert(r.getLong(1) > 0))
  }

  test("t22 postings serve scan statically prunes to the terms' buckets") {
    val plan = formattedPlan(Queries.t22PostingsServe(spark, sfDir))
    // the probe must carry a bucket partition filter (directory-level
    // pruning) — a serve that scans all 16 buckets re-reads the corpus
    val scanBlock = plan.split("\n").filter(_.contains("PartitionFilters"))
    assert(scanBlock.exists(_.contains("bucket")),
      "no bucket partition filter on the postings scan:\n" +
        plan.takeRight(2000))
  }

  test("t21 BM25: df and corpus stats broadcast; no sort-merge join") {
    val plan = Queries.t21Bm25(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
    assert(plan.contains("TakeOrderedAndProject"),
      "top-k compiled to a full sort:\n" + plan.take(800))
  }

  test("a16 sequence match: no self-join, aggregate reuses the window shuffle") {
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = Queries.a16SeqConvert(spark, sfDir).queryExecution.executedPlan
      assert(!plan.toString.contains("Join"),
        "pattern match degenerated to a join:\n" + plan.toString.take(800))
      val exch = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      assert(exch.length <= 2, s"${exch.length} shuffles:\n" +
        plan.toString.take(1200))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevA)
  }

  test("a15 CMS: probes broadcast into the sketch, never a sort-merge") {
    // the sketch is ≤ depth×width rows and the probe side is top-N×depth —
    // a SortMergeJoin here would mean a corpus-sized shuffle crept in
    val plan = Queries.a15CmsHeavyHitters(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
  }

  test("j10 co-bucketed join: no Exchange below the sort-merge join") {
    // force the SMJ path (at test SF the optimizer would broadcast — also
    // shuffle-free, but the lock is about the bucketed layout)
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = Queries.j10Bucketed(spark, sfDir).queryExecution.executedPlan
      val smj = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
      assert(smj.nonEmpty, plan.toString.take(800))
      val exchBelow = smj.head.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      assert(exchBelow.isEmpty,
        "bucketed fact sides shuffled:\n" + smj.head.toString.take(1200))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  test("k6 JSONL: bad line quarantined as one ?corrupt row, side rows kept") {
    val rows = Queries.k6JsonlRoundtrip(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // PERMISSIVE + corrupt-record column: the malformed line is ONE
    // censused row, not a dead job and not a silent drop
    assert(rows.get("?corrupt").contains(1L), rows.toString)
    // the two side rows, under the collision-proof sentinel lang (a tilde
    // can never appear in a generator lang code)
    assert(rows.get("zz~side").contains(2L), rows.toString)
    // and the parquet-table langs all survived the round-trip
    val langs = graft.Tables.documents(spark, sfDir)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(rows.keySet), (langs -- rows.keySet).toString)
  }

  test("pipe7 WARC: splitter loses no records; requests censused not dropped") {
    val docs = graft.Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    val nReq = docs.where(org.apache.spark.sql.functions.col("doc_id") % 7 === 0)
      .count()
    val rows = Queries.pipe7WarcIngest(spark, sfDir).collect()
    // every response record re-emerges from the lineSep splitter with its
    // lang header intact (a mangled record boundary would shift a record
    // into the wrong group or the '' lang bucket)
    val resp = rows.filter(_.getString(0) == "response")
    assert(resp.map(_.getLong(2)).sum == nDocs, resp.mkString("\n"))
    assert(!resp.exists(_.getString(1).isEmpty), "lang header lost")
    // non-response records: counted as their own group, never silently cut
    val req = rows.filter(_.getString(0) == "request")
    assert(req.length == 1 && req.head.getLong(2) == nReq, rows.mkString("\n"))
  }

  test("a23 funnel: window passes share one sort; levels partition users") {
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = Queries.a23WindowFunnel(spark, sfDir)
      val plan = df.queryExecution.executedPlan
      // no self-join anywhere (the naive funnel is a per-user event cube)
      assert(!plan.toString.contains("Join"), plan.toString.take(600))
      val exch = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      assert(exch.length == 3, exch.length.toString)
      val sorts = plan.collect {
        case s: org.apache.spark.sql.execution.SortExec => s }
      // one (user | ts, event_id) sort feeds every window pass + the
      // output's range sort — a second window sort means the shared
      // ordering broke
      assert(sorts.length == 2, plan.toString.take(1200))
      val rows = df.collect()
      assert(rows.map(_.getLong(0)).forall(l => l >= 0 && l <= 3))
      val users = graft.Tables.events(spark, sfDir)
        .select("user_id").distinct().count()
      assert(rows.map(_.getLong(1)).sum == users)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevA)
  }

  test("a22 retention: one user-grain shuffle; cohort row dominates") {
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = Queries.a22RetentionCohorts(spark, sfDir)
      // user collect_set + matrix census + output sort = 3 exchanges, the
      // first hash-partitioned on user_id (map-side partial dedup before it)
      val exch = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      assert(exch.length == 3, exch.length.toString)
      assert(exch.exists(_.outputPartitioning.toString.contains("user_id")))
      val rows = df.collect()
      val cells = rows.map(r =>
        (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      // offset 0 is the cohort size; no later offset can exceed it
      cells.foreach { case ((c, o), n) =>
        assert(n <= cells((c, 0L)), s"cohort $c offset $o: $n")
      }
      // every user appears in exactly one cohort's offset-0 cell
      val users = graft.Tables.events(spark, sfDir)
        .select("user_id").distinct().count()
      assert(cells.collect { case ((_, 0L), n) => n }.sum == users)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevA)
  }

  test("m5 pair filter: equi-joins only; aligned pairs survive more") {
    val df = Queries.m5PairFilter(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    val rows = df.collect()
    val (shifted, aligned) = rows.partition(_.getBoolean(1))
    def keepRate(rs: Array[org.apache.spark.sql.Row]) =
      rs.count(_.getBoolean(2)).toDouble / rs.length
    assert(shifted.nonEmpty && aligned.nonEmpty)
    // the filter must actually discriminate: misaligned captions are
    // dropped at a strictly higher rate than aligned ones
    assert(keepRate(aligned) > keepRate(shifted),
      s"aligned=${keepRate(aligned)} shifted=${keepRate(shifted)}")
  }

  test("t29 repair: strip restores the original; classes partition docs") {
    import org.apache.spark.sql.functions._
    val rows = Queries.t29FixEncoding(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = graft.Tables.documents(spark, sfDir)
    val n = docs.count()
    val nCtl = docs.where(col("doc_id") % 4 === 0).count()
    val nMoji = docs
      .where(col("doc_id") % 6 === 0 && col("doc_id") % 4 =!= 0).count()
    assert(rows("control_stripped")._1 == nCtl, rows.toString)
    assert(rows("mojibake_fixed")._1 == nMoji, rows.toString)
    assert(rows("clean")._1 == n - nCtl - nMoji, rows.toString)
    // control strip removes exactly the 2 injected chars per doc and the
    // repaired text equals the original (checksum parity with the oracle
    // pins the content; here we pin the arithmetic)
    assert(rows("control_stripped")._2 == 2 * nCtl, rows.toString)
    // mojibake repair rewrites in place: 'Ã©' (2 chars) -> 'é' (1 char)
    assert(rows("mojibake_fixed")._2 == nMoji, rows.toString)
    assert(rows("clean")._2 == 0L, rows.toString)
  }

  test("pipe8 packing: one shard shuffle; window accounting closes") {
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = Queries.pipe8SeqPack(spark, sfDir)
      // per-shard packing: the only data shuffle is the shard hash
      // partition for the running-count window (+ the output's range sort)
      val exch = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      assert(exch.length == 2, exch.length.toString)
      assert(exch.exists(_.outputPartitioning.toString.contains("shard")))
      val rows = df.collect()
      assert(rows.length == QuerySpec.PackShards)
      val nDocs = graft.Tables.documents(spark, sfDir).count()
      assert(rows.map(_.getLong(1)).sum == nDocs)
      rows.foreach { r =>
        val (toks, wins, pad) = (r.getLong(2), r.getLong(3), r.getLong(5))
        assert(pad >= 0 && pad < QuerySpec.PackCtx, r.toString)
        assert(wins * QuerySpec.PackCtx == toks + pad, r.toString)
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevA)
  }

  test("a24 attribution: one RangeFrame window serves both touches") {
    import org.apache.spark.sql.functions.col
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = Queries.a24Attribution(spark, sfDir)
      val plan = df.queryExecution.executedPlan
      // first/last touch share one Window (conditional min+max over the
      // same value-range frame) — two WindowExecs would mean the shared
      // frame was broken by a refactor
      val wins = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
      assert(wins.length == 1, plan.toString.take(800))
      assert(wins.head.toString.contains("RangeFrame"),
        wins.head.toString.take(400))
      val exch = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      assert(exch.length == 3, s"${exch.length} shuffles")
      // attribution algebra: attributed <= conversions, multi-touch <=
      // attributed, and every crediting gap fits the lookback window
      val rows = df.collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val (n, attr, multi) = (r.getLong(1), r.getLong(2), r.getLong(3))
        val (lastGap, firstGap) = (r.getLong(4), r.getLong(5))
        assert(attr <= n && multi <= attr, r.toString)
        assert(lastGap <= attr * (QuerySpec.AttrLookbackMs / 60000L), r.toString)
        assert(firstGap >= lastGap, r.toString) // first touch is never later
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevA)
  }

  test("o9 plan: metadata-grain accounting closes; compaction compacts") {
    import org.apache.spark.sql.functions.col
    val rows = Queries.o9CompactionPlan(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // conservation: the planned bins account for every row in the store
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getLong(3)).sum == nDocs, rows.mkString("\n"))
    // the plan must actually compact: per lang, bins <= files, and no
    // bin is empty
    val byLang = rows.groupBy(_.getString(0))
    byLang.foreach { case (lang, rs) =>
      val files = rs.map(_.getLong(2)).sum
      assert(rs.length <= files, s"$lang: ${rs.length} bins > $files files")
      assert(rs.forall(_.getLong(3) > 0), lang)
    }
    // bins are dense from 0 per lang (running-sum binning can't skip)
    byLang.foreach { case (lang, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq ==
        (0L until rs.length).toSeq, lang)
    }
  }

  test("s18 MMR: greedy invariants hold; fold reads only the checkpoint") {
    import org.apache.spark.sql.functions.col
    val df = Queries.s18MmrDiversify(spark, sfDir)
    // the cluster's work ends at the checkpointed candidate frame: the
    // RETURNED plan must contain no file scan at all — the greedy fold
    // reads the ≤10-row checkpoint, never the corpus-grain rankers
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.isEmpty, "returned plan re-scans the corpus:\n" +
      df.queryExecution.executedPlan.toString.take(800))
    assert(df.queryExecution.executedPlan.toString.contains("ExistingRDD"),
      "checkpointed candidate scan missing from plan")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= QuerySpec.MmrK)
    // ranks contiguous from 1; score identity holds at every step; the
    // first selection carries no diversity penalty
    assert(rows.map(_.getLong(1)).toSeq == (1L to rows.length).toSeq)
    assert(rows.head.getLong(3) == 0L, rows.head.toString)
    rows.foreach { r =>
      val (rel, ms, score) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(score == QuerySpec.MmrLambda10 * rel -
        (10 - QuerySpec.MmrLambda10) * ms, r.toString)
    }
    // selections are distinct docs (no score-monotonicity assertion:
    // pair cosines can be NEGATIVE, so a later pick's λ·rel − (1−λ)·sim
    // can legitimately exceed the first pick's unpenalized λ·rel)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    // relevance is non-increasing in fused rank, and the first pick is
    // the highest-relevance vector-capable candidate
    assert(rows.head.getLong(2) == rows.map(_.getLong(2)).max)
  }

  test("pipe9 crawl→shards: one crawl scan, 3 window shuffles; closes with pipe6") {
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = Queries.pipe9CrawlShards(spark, sfDir)
      val plan = df.queryExecution.executedPlan
      // the whole spine is ONE plan over ONE pass of the crawl: record
      // parse + extraction + gates fuse map-side under the first window;
      // data shuffles are the canon-URL window, the content-fp window and
      // the shard packing window (whose partitioning the census agg
      // reuses) + the output's range sort — a second scan would mean a
      // materialization seam crept in between the stages
      val scans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
      assert(scans.length == 1, s"${scans.length} scans:\n" +
        plan.toString.take(1200))
      val exch = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      assert(exch.length == 4, s"${exch.length} shuffles:\n" +
        plan.toString.take(1200))
      val wins = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
      assert(wins.length == 3, plan.toString.take(800))
      assert(!plan.toString.contains("CartesianProduct"))
      // conservation against the funnel census: the packed survivor set
      // IS pipe6's n_final / final_words, recovered entirely from the
      // crawl bytes (identity parsed back out of each page's <title>)
      val rows = df.collect()
      val funnel = Queries.pipe6WebCuration(spark, sfDir).collect()
      assert(rows.map(_.getLong(1)).sum == funnel.map(_.getLong(4)).sum,
        "survivor count diverged from pipe6's n_final")
      assert(rows.map(_.getLong(2)).sum == funnel.map(_.getLong(5)).sum,
        "packed token total diverged from pipe6's final_words")
      rows.foreach { r =>
        val (toks, nw, pad) = (r.getLong(2), r.getLong(3), r.getLong(5))
        assert(pad >= 0 && pad < QuerySpec.PackCtx, r.toString)
        assert(nw * QuerySpec.PackCtx == toks + pad, r.toString)
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevA)
  }

  test("k7 diff: one equi-join (no nested loop), churn classes exact") {
    import org.apache.spark.sql.functions.col
    val df = Queries.k7SnapshotDiff(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    val byStatus = df.collect().groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"))
    val n = docs.count()
    val removed = docs.where(col("doc_id") % 10 === 0).count()
    val added = docs.where(col("doc_id") % 13 === 0).count()
    val changed = docs
      .where(col("doc_id") % 7 === 0 && col("doc_id") % 10 =!= 0).count()
    assert(byStatus("removed") == removed, byStatus.toString)
    assert(byStatus("added") == added, byStatus.toString)
    assert(byStatus("changed") == changed, byStatus.toString)
    assert(byStatus("unchanged") == n - removed - changed, byStatus.toString)
  }

  test("s17 rerank: candidates broadcast; permutation of the fused list") {
    val df = Queries.s17Rerank(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the 10-row candidate list must broadcast into the corpus scan — a
    // sort-merge THERE shuffles the corpus for 10 rows (t28's internal
    // fusion join of two <=10-row lists may legitimately sort-merge)
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
    val smjs = df.queryExecution.executedPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j }
    assert(!smjs.exists(_.toString.contains("documents")),
      "corpus shuffled for 10 candidates")
    val rows = df.collect()
    assert(rows.length == QuerySpec.RrfTopK)
    // rerank permutes, never drops: both rank columns are 1..K exactly
    val expect = (1L to QuerySpec.RrfTopK.toLong).toSet
    assert(rows.map(_.getLong(1)).toSet == expect)
    assert(rows.map(_.getLong(2)).toSet == expect)
  }

  test("t28 RRF: both-list docs dominate; scores are exact integer RRF") {
    val rows = Queries.t28HybridRrf(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // exact integer fusion: rrf_ppt must equal the closed form of the ranks
    val P = QuerySpec.PrScale; val K = QuerySpec.RrfK
    rows.foreach { r =>
      val (rs, rd, sc) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val want = (if (rs > 0) P / (K + rs) else 0L) +
        (if (rd > 0) P / (K + rd) else 0L)
      assert(sc == want, s"doc ${r.getLong(0)}: $sc != $want")
    }
    // with depth<=10, membership in BOTH lists dominates any single list:
    // min both-list score 2/(60+10) > max single-list score 1/(60+1)
    val both = rows.filter(r => r.getLong(1) > 0 && r.getLong(2) > 0)
    val single = rows.filter(r => r.getLong(1) == 0 || r.getLong(2) == 0)
    if (both.nonEmpty && single.nonEmpty)
      assert(both.map(_.getLong(3)).min > single.map(_.getLong(3)).max)
  }

  test("d16 samples whole blocks: pairs = sum C(n,2) over md5-kept blocks") {
    import org.apache.spark.sql.functions._
    // block-grain sampling keeps each kept block's pair space INTACT: the
    // sampled eval's total pair count must equal the closed form over the
    // md5-gated (lang, source) blocks — any doc-grain leak breaks this
    val blockPairs = graft.Tables.documents(spark, sfDir)
      .where(size(graft.operators.Dedup.tokenSet(col("text"))) > 0)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
      .select(col("n"),
        (conv(substring(md5(concat(col("lang"), lit(":"), col("source"))),
          1, 15), 16, 10).cast("long") % QuerySpec.CalibSampleMod === 0)
          .as("kept"))
      .collect()
    def pairs(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) * (r.getLong(0) - 1) / 2).sum
    val keptWant = pairs(blockPairs.filter(_.getBoolean(1)))
    val allWant = pairs(blockPairs)
    val d16 = Queries.d16MinhashEstSampled(spark, sfDir)
      .agg(sum("n_pairs")).collect()(0).getLong(0)
    val d14 = Queries.d14MinhashEstError(spark, sfDir)
      .agg(sum("n_pairs")).collect()(0).getLong(0)
    assert(d16 == keptWant, s"sampled pair space $d16 != closed form $keptWant")
    assert(d14 == allWant)
    // the gate actually drops blocks at this SF (a no-op sample proves nothing)
    assert(d16 < d14, "sample gate kept every block")
  }

  test("pipe10 two-phase selection == naive per-lang cumsum; edge-only sort") {
    import org.apache.spark.sql.functions._
    // naive reference: collect the (lang, toks, h, doc_id) frame and run
    // the single-window selection rule in Scala
    val rows = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        size(graft.operators.TextAnalysis.tokens(col("text")))
          .cast("long").as("toks"))
      .where(col("toks") > 0)
      .withColumn("h", conv(substring(md5(concat(lit("mix:"),
        col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long"))
      .collect()
    val total = rows.map(_.getLong(2)).sum
    val weights = QuerySpec.MixWeightsPpm.toMap
    val want = rows.groupBy(_.getString(1)).filter(w => weights.contains(w._1))
      .map { case (lang, docs) =>
        val tgt = total * QuerySpec.MixFracPpm / 1000000L *
          weights(lang) / 1000000L
        var cum = 0L
        val kept = docs.sortBy(r => (r.getLong(3), r.getLong(0)))
          .takeWhile { r => val ok = cum < tgt; cum += r.getLong(2); ok }
        lang -> ((tgt, kept.length.toLong, kept.map(_.getLong(2)).sum,
          kept.map(_.getLong(0)).sum))
      }
    val got = Queries.pipe10MixBudget(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want, s"two-phase != naive\n got=$got\nwant=$want")
    // the selection is a real cut at this SF (not everything kept)
    assert(got.values.map(_._3).sum < total)
    // plan locks: the returned plan's ONLY window is the edge-bucket
    // exact sort (the bucket cumsum ran once behind the localCheckpoint),
    // and the edge filter sits under it so past-budget buckets never sort
    val plan = Queries.pipe10MixBudget(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("Window \\[".r.findAllIn(plan).length == 1, plan.take(800))
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("= edge)"), "edge filter not in the plan")
  }

  test("s19 merged index == batch assignment; appends touch only delta cells") {
    import org.apache.spark.sql.functions._
    val got = Queries.s19IndexMerge(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // incremental add under a frozen quantizer must equal the one-shot
    // batch assignment of the full corpus (order-independence of the
    // merge) — computed here engine-vs-engine, not via the oracle
    val emb = graft.Tables.embeddings(spark, sfDir)
    val cents = graft.operators.Similarity.collectCentroids(
      emb.where(col("vec_id") < QuerySpec.NumCentroids),
      "vec_id", "embedding")
    val want = graft.operators.Similarity.assignCells(
        emb, cents, "vec_id", "embedding", "nid", "cv", 1)
      .withColumn("is_delta",
        col("nid") >= QuerySpec.NumCentroids &&
          col("nid") % QuerySpec.S19DeltaMod === 0)
      .groupBy(col("cell"))
      .agg(sum(when(!col("is_delta"), 1L).otherwise(0L)).as("o"),
        sum(when(col("is_delta"), 1L).otherwise(0L)).as("a"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == want, s"merge != batch assignment\n got=$got\nwant=$want")
    assert(got.values.map(t => t._1 + t._2).sum == emb.count())
    assert(got.values.map(_._2).sum > 0, "no delta rows merged")
    // physical append-only claim: every cell dir that gained delta rows
    // holds files from BOTH write epochs; delta-free cells hold epoch 1
    val root = java.nio.file.Files.list(
        java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")))
      .filter(p => p.getFileName.toString.startsWith("graft_s19_idx_"))
      .findFirst().get()
    got.foreach { case (cell, (_, nAdd)) =>
      val files = java.nio.file.Files.list(root.resolve(s"cell=$cell"))
        .filter(_.toString.endsWith(".parquet")).count()
      if (nAdd > 0) assert(files >= 2, s"cell=$cell: $files file(s)")
      else assert(files >= 1, s"cell=$cell empty")
    }
  }

  test("a25 histogram percentiles == naive per-cohort sort; p50 <= p90") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_ms"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byUser = ev.groupBy(_._1)
    val users = byUser.iterator.flatMap { case (_, rows) =>
      val as = rows.filter(_._3 == QuerySpec.SeqEventA).map(_._2)
      if (as.isEmpty) None else {
        val a = as.min
        val bs = rows.filter(r => r._3 == QuerySpec.SeqEventB && r._2 >= a)
          .map(_._2)
        Some((a / 86400000L,
          if (bs.isEmpty) None
          else Some((bs.min - a) / QuerySpec.LatBucketMs)))
      }
    }.toSeq
    val want = users.groupBy(_._1).map { case (cohort, rows) =>
      val lats = rows.flatMap(_._2).sorted
      def pct(p: Long): Long =
        if (lats.isEmpty) -1L
        else lats(((lats.size * p + 99) / 100 - 1).toInt)
      cohort -> ((rows.size.toLong, lats.size.toLong, pct(50), pct(90)))
    }
    val got = Queries.a25ConversionLatency(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want, s"histogram != naive\n got=$got\nwant=$want")
    got.values.filter(_._4 >= 0).foreach(t => assert(t._3 <= t._4))
    assert(got.values.exists(_._2 > 0), "no converts anywhere")
  }

  test("a26 interval-union WAU == naive trailing-7-day distinct; no Window") {
    import org.apache.spark.sql.functions._
    val ud = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts_ms div 86400000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = Queries.a26ActiveUsers(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val activeDays = ud.map(_._2).distinct
    assert(got.keySet == activeDays.toSet)
    activeDays.foreach { d =>
      val dau = ud.count(_._2 == d).toLong
      val wau = ud.filter(u => u._2 >= d - 6 && u._2 <= d)
        .map(_._1).distinct.length.toLong
      assert(got(d) == ((dau, wau)), s"day $d: ${got(d)} != ($dau, $wau)")
      assert(wau >= dau)
    }
    // the whole point: no sliding window, no day-grain distinct — the
    // plan is explodes + counts (any Window node means the trap form)
    val plan = Queries.a26ActiveUsers(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "sliding-window form crept in")
    assert(!plan.contains("CartesianProduct"))
  }

  test("t30 DSIR keeps the target domain and drops the rest") {
    val rows = Queries.t30DsirWeights(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getLong(3), r.getLong(4)))
    val (en, other) = rows.partition(_._1 == QuerySpec.DsirTargetLang)
    assert(en.nonEmpty && other.nonEmpty)
    // DSIR is a soft reweighting (the paper resamples by weight, not a
    // hard cut) and the synthetic langs share template vocab, so the
    // discrimination contract is distribution-level: the target lang
    // must pass the sign cut at a strictly higher rate than EVERY other
    // lang, and per-lang MEDIAN scores must separate by sign
    val enRate = en.count(_._3 == 1L).toDouble / en.size
    def median(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)
    assert(median(en.map(_._2)) > 0, "target median not positive")
    rows.groupBy(_._1).filterNot(_._1 == QuerySpec.DsirTargetLang)
      .foreach { case (l, rs) =>
        val rate = rs.count(_._3 == 1L).toDouble / rs.size
        assert(enRate > rate, s"$l keep rate $rate >= target $enRate")
        assert(median(rs.map(_._2).toSeq) < 0, s"$l median not negative")
      }
    // the scores are staged once per (sf dir) and shared with pipe11:
    // the returned plan reads the skinny staged table, never re-training
    // the LMs (the d13 build-vs-read memo)
    val plan = Queries.t30DsirWeights(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).length == 1, plan.take(600))
    assert(!plan.contains("CartesianProduct"))
  }

  test("s20 recall is monotone in nprobe and the sweep joins the corpus once") {
    import org.apache.spark.sql.functions._
    val rows = Queries.s20NprobeSweep(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val byQuery = rows.groupBy(_._2)
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (q, rs) =>
      val curve = rs.sortBy(_._1).map(_._3)
      assert(curve.zip(curve.tail).forall { case (a, b) => a <= b },
        s"query $q recall not monotone: ${curve.mkString(",")}")
    }
    // sf0.001 saturates at probe=1 (95% mean — 8 cells over ~100
    // vectors), so the distribution-level check is >=; the sf0.01
    // oracle run shows the real curve (90 -> 92.5 -> 95%)
    val mean = rows.groupBy(_._1).map { case (p, rs) =>
      p -> rs.map(_._3).sum / rs.size }
    assert(mean(QuerySpec.NprobeSweep.max.toLong) >=
      mean(QuerySpec.NprobeSweep.min.toLong), s"curve dips: $mean")
    // one corpus assignment for the whole sweep: the settings reuse the
    // checkpointed candidate frame, so the only parquet scan left in the
    // returned plan is the 8-row grid side (vec_id < NumQueries pushed
    // down) — NOT one corpus join per setting (s18's checkpoint lock)
    val plan = Queries.s20NprobeSweep(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).length == 1,
      "sweep re-scans the corpus per setting")
    assert(!plan.contains("CartesianProduct"))
  }

  test("pipe11 stage funnel conserves against t30 and the packing identity") {
    val rows = Queries.pipe11SelectPack(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // stage monotonicity + the pipe8 packing identity per lang
    rows.foreach { r =>
      val (nRaw, nDsir, nUniq, nMix) =
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(6))
      assert(nRaw >= nDsir && nDsir >= nUniq && nUniq >= nMix,
        s"funnel not monotone: $r")
      val (mixToks, nWin, pad) = (r.getLong(7), r.getLong(8), r.getLong(9))
      assert(nWin * QuerySpec.PackCtx == mixToks + pad, s"packing: $r")
    }
    // cross-operator conservation: the spine's DSIR stage must agree with
    // the registered t30 gate, lang by lang
    val t30kept = Queries.t30DsirWeights(spark, sfDir).collect()
      .filter(_.getLong(4) == 1L)
      .groupBy(_.getString(1)).map { case (l, rs) => l -> rs.length.toLong }
    rows.foreach { r =>
      assert(r.getLong(3) == t30kept.getOrElse(r.getString(0), 0L),
        s"dsir stage diverges from t30 for ${r.getString(0)}")
    }
    assert(rows.map(_.getLong(6)).sum > 0, "mix selected nothing")
  }

  test("k8 vacuum decisions partition the day domain; planning is read-only") {
    import org.apache.spark.sql.functions._
    val rows = Queries.k8VacuumPlan(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val nowDay = QuerySpec.RangeEndMs / 86400000L
    rows.foreach { case (day, dec, nFiles, _) =>
      val want =
        if (nowDay - day <= QuerySpec.RetentionKeepDays) "keep"
        else if (day % 7 == 0) "archive" else "delete"
      assert(dec == want, s"day $day: $dec != $want")
      assert(nFiles >= 1 && nFiles <= QuerySpec.CompactFrag)
    }
    assert(rows.map(_._2).distinct.sorted.sameElements(
      Array("archive", "delete", "keep")), "policy classes missing")
    // total rows across the plan == the events table (nothing dropped)
    assert(rows.map(_._4).sum == graft.Tables.events(spark, sfDir).count())
    // the PLANNER is read-only: every day dir survives, deleted or not
    val root = java.nio.file.Files.list(
        java.nio.file.Paths.get(System.getProperty("java.io.tmpdir")))
      .filter(p => p.getFileName.toString.startsWith("graft_k8_store_"))
      .findFirst().get()
    rows.foreach { case (day, _, _, _) =>
      assert(java.nio.file.Files.isDirectory(root.resolve(s"day=$day")),
        s"planner touched day=$day")
    }
  }

  test("m6 manifest digests match a local recompute; pairs conserve") {
    import org.apache.spark.sql.functions._
    val got = Queries.m6ShardManifest(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(5)))).toMap
    val hs = graft.Tables.documents(spark, sfDir)
      .select(conv(substring(md5(concat(lit("mshard:"),
        col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long").as("h"))
      .collect().map(_.getLong(0))
    val want = hs.groupBy(h => ((h % QuerySpec.PackShards) +
        QuerySpec.PackShards) % QuerySpec.PackShards)
      .map { case (sh, xs) =>
        sh -> ((xs.length.toLong, xs.map(_ % 1000000007L).sum)) }
    assert(got == want, s"digest mismatch\n got=$got\nwant=$want")
    assert(got.values.map(_._1).sum ==
      graft.Tables.documents(spark, sfDir).count())
  }

  test("d17 tuning table: cost and collision both rise with band count") {
    val rows = Queries.d17LshTuning(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    assert(rows.map(_._1).sameElements(
      QuerySpec.LshTuneCombos.map(_._1.toLong).sorted))
    rows.foreach { case (b, r, nb, _, _) =>
      assert(b * r == QuerySpec.MinhashK.toLong)
      assert(nb >= 1)
    }
    // the tuning tradeoff itself: more bands => measurably more candidate
    // pairs (looser buckets) AND higher S-curve collision at the
    // threshold — both must be nondecreasing in b for the table to mean
    // anything
    rows.zip(rows.tail).foreach { case ((_, _, _, c1, p1), (b2, _, _, c2, p2)) =>
      assert(c2 >= c1, s"candidates dip at bands=$b2")
      assert(p2 >= p1, s"S-curve dips at bands=$b2")
    }
    // endpoints of the closed form, recomputed here from first principles
    val j = QuerySpec.MinhashThreshold
    var j16 = j; for (_ <- 1 until 16) j16 *= j
    assert(rows.head._5 == math.floor(j16 * 1e6).toLong) // b=1: j^16
    var q16 = 1 - j; val q0 = 1 - j
    for (_ <- 1 until 16) q16 *= q0
    assert(rows.last._5 == math.floor((1 - q16) * 1e6).toLong)
  }

  test("x3 bucketed overlap join == naive theta join, exactly once, no NLJ") {
    import org.apache.spark.sql.functions._
    val sp = spark
    import sp.implicits._
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    val sess = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_ms"), col("event_id"))
      .withColumn("brk", when(col("ts_ms") - lag(col("ts_ms"), 1).over(ord) >
        QuerySpec.X3SessionGapMs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(ord.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts_ms")).as("s_lo"), max(col("ts_ms")).as("s_hi"))
    val camps = QuerySpec.X3Campaigns.toDF("campaign_id", "c_lo", "c_hi")
    // naive reference: broadcast theta join, count per campaign
    val want = sess.crossJoin(camps)
      .where(col("s_lo") <= col("c_hi") && col("c_lo") <= col("s_hi"))
      .groupBy(col("campaign_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Queries.x3OverlapJoin(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"bucketed != theta\n got=$got\nwant=$want")
    // the scalable shape: equi-join on the bucket, never a nested loop
    val plan = Queries.x3OverlapJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), "theta join crept in")
    assert(!plan.contains("CartesianProduct"))
  }

  test("t31 confusion matrix agrees with t1; margins behave") {
    val got = Queries.t31LabelNoise(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // cell counts must equal the registered t1 prediction rollup
    val want = Queries.t1LangId(spark, sfDir).collect()
      .groupBy(r => (r.getString(1), r.getString(2)))
      .map { case (k, rs) => k -> rs.length.toLong }
    assert(got.map { case (k, v) => k -> v._1 } == want)
    got.foreach { case ((l, p), (_, sm, mm)) =>
      assert(sm >= 0 && mm >= 0, s"negative margin at ($l,$p)")
      // on the diagonal the best IS the labeled lang: margin exactly 0
      if (l == p) assert(sm == 0 && mm == 0, s"diagonal margin at $l")
    }
    // the audit finds real label noise on this fixture
    assert(got.exists { case ((l, p), _) => l != p })
  }

  test("a27 session metrics == naive sessionization computed locally") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_ms"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // local gaps-and-islands sessionization
    val sessions = ev.groupBy(_._1).iterator.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      var (lo, hi, n) = (sorted.head._2, sorted.head._2, 1L)
      for (r <- sorted.tail) {
        if (r._2 - hi > QuerySpec.X3SessionGapMs) {
          out += ((lo, hi, n)); lo = r._2; hi = r._2; n = 1L
        } else { hi = r._2; n += 1 }
      }
      out += ((lo, hi, n)); out
    }.toSeq
    val want = sessions.groupBy(_._1 / 86400000L).map { case (day, ss) =>
      val durs = ss.map(s => (s._2 - s._1) / QuerySpec.LatBucketMs).sorted
      def pct(p: Long) = durs(((durs.size * p + 99) / 100 - 1).toInt)
      day -> ((ss.size.toLong,
        ss.count(_._3 == 1L).toLong * 1000000L / ss.size,
        pct(50), pct(90)))
    }
    val got = Queries.a27SessionMetrics(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want, s"session census != naive\n got=$got\nwant=$want")
    got.values.foreach { case (_, b, p50, p90) =>
      assert(b >= 0 && b <= 1000000L && p50 <= p90)
    }
  }

  test("d18 multiplicity histogram conserves docs and matches d9 clusters") {
    val rows = Queries.d18ClusterCensus(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (sz, nc, nd) => assert(nd == sz * nc) }
    val docs = graft.Tables.documents(spark, sfDir).count()
    assert(rows.map(_._3).sum == docs, "histogram loses docs")
    // agrees with the registered d9 clustering, size by size
    val want = Queries.d9DupClusters(spark, sfDir).collect()
      .groupBy(_.getLong(1)).values.map(_.length.toLong)
      .groupBy(identity).map { case (sz, xs) => sz -> xs.size.toLong }
    assert(rows.map(r => r._1 -> r._2).toMap == want)
    // real duplicate mass exists at this SF (a flat all-singleton
    // histogram would make the census meaningless)
    assert(rows.exists(_._1 >= 2))
  }

  test("k9 drift census conserves epochs and agrees with k7's totals") {
    val rows = Queries.k9DriftCensus(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(5), r.getLong(6), r.getLong(7)))
    // epoch A is the raw corpus, epoch B is k7's v2 — totals must agree
    // with the registered k7 diff (removed rows leave B, added rows join)
    val docs = graft.Tables.documents(spark, sfDir).count()
    assert(rows.map(_._2).sum == docs)
    val k7 = Queries.k7SnapshotDiff(spark, sfDir).collect()
      .groupBy(_.getString(0))
      .map { case (st, rs) => st -> rs.map(_.getLong(2)).sum }
    assert(rows.map(_._3).sum ==
      k7.getOrElse("added", 0L) + k7.getOrElse("changed", 0L) +
        k7.getOrElse("unchanged", 0L))
    rows.foreach { case (l, _, _, sa, sb, dr) =>
      assert(dr == math.abs(sa - sb), s"drift mismatch for $l")
      assert(sa <= 1000000L && sb <= 1000000L)
    }
    // shares are a near-partition of 1e6 (floor-div loses < |langs| ppm)
    assert(math.abs(rows.map(_._4).sum - 1000000L) < rows.length)
  }

  test("t32 novelty: every gram has one owner; ratios bounded; dups lower") {
    import org.apache.spark.sql.functions._
    val rows = Queries.t32NoveltyCensus(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, g, nv, ppm) =>
      assert(nv >= 1 && nv <= g, s"$src novel out of range")
      assert(ppm == nv * 1000000L / g)
    }
    // global conservation: total novel grams == distinct grams in corpus
    val distinctGrams = graft.Tables.documents(spark, sfDir)
      .select(explode(graft.operators.TextAnalysis
        .shingleHashes(col("text"), 3)).as("g"))
      .select(col("g")).distinct().count()
    assert(rows.map(_._3).sum == distinctGrams,
      "novel-gram total != corpus distinct grams")
    // duplicated content must depress novelty somewhere (the corpus has
    // d9-proven duplicate clusters)
    assert(rows.map(_._4).min < 1000000L)
  }

  test("a28 LTV curves: cum is a running total; cells agree with a22") {
    val rows = Queries.a28LtvCohorts(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // per cohort: cum_revenue is the exact running total of revenue
    rows.groupBy(_._1).foreach { case (c, rs) =>
      val srt = rs.sortBy(_._2)
      var run = BigDecimal(0)
      srt.foreach { r =>
        run += BigDecimal(r._4).setScale(2,
          scala.math.BigDecimal.RoundingMode.HALF_UP)
        assert(math.abs(run.toDouble - r._5) < 1e-6,
          s"cohort $c offset ${r._2}: cum ${r._5} != $run")
      }
    }
    // the (cohort, offset) user counts must equal a22's retention matrix
    val a22 = Queries.a22RetentionCohorts(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.map(r => (r._1, r._2) -> r._3).toMap == a22,
      "LTV user cells diverge from a22 retention")
  }

  test("s12 scans codes and broadcasts the query tables (ADC shape)") {
    val plan = Queries.s12PqAnn(spark, sfDir)
      .queryExecution.executedPlan.toString
    // brute ADC baseline: corpus codes never shuffle for the join; the
    // model-sized query side broadcasts (the documented crossJoin form)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    assert(!plan.contains("CartesianProduct"), "non-broadcast cartesian")
    assert(!plan.contains("SortMergeJoin"), "codes shuffled for the join")
  }

  test("d19 incremental census == full Spark recompute over v2") {
    import org.apache.spark.sql.functions._
    val inc = Queries.d19IncrementalDecontam(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // full recompute inside Spark (same engine, no oracle in the loop):
    // decontaminate corpus-v2 against the fixed v1 benchmark from scratch
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
    val v2 = docs.where(col("doc_id") % 10 =!= 0)
      .withColumn("text", when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" rev2"))).otherwise(col("text")))
      .unionByName(docs.where(col("doc_id") % 13 === 0)
        .select((col("doc_id") + lit(10000000L)).as("doc_id"), col("lang"),
          concat(lit("recrawl "), col("text")).as("text")))
    val full = graft.operators.Decontaminate.contaminatedDocs(
        v2.where(col("doc_id") % 29 =!= 0),
        docs.where(col("doc_id") % 29 === 0), "doc_id", "text", k = 3)
      .join(v2.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("s"),
        sum(col("n_shared")).as("sh"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(inc == full, s"incremental $inc != full $full")
    assert(inc.nonEmpty)
    // the delta actually contributes: some contaminated doc is added or
    // changed (ids > 10M are recrawls; without this the carry path alone
    // could pass trivially)
    val hasDelta = Queries.d19IncrementalDecontam(spark, sfDir)
      .agg(max(col("sum_doc_id"))).head().getLong(0) > 10000000L
    assert(hasDelta, "no recrawled doc in the contaminated set")
  }

  test("t33 held-out census: leakage-free split, confusion closes") {
    import org.apache.spark.sql.functions._
    val rows = Queries.t33ClassifierLoop(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    // every output source is HELD-OUT under the t24 split predicate, and
    // none of them is a training source (grouped split = no leakage)
    val splits = graft.Tables.documents(spark, sfDir)
      .select(col("source"),
        (conv(substring(md5(concat(lit("split:"), col("source"))), 1, 15),
          16, 10).cast("long") % 100 < 80).as("is_train"))
      .distinct().collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    rows.foreach { case (src, n, nPos, tp, fp, fn, prec, rec) =>
      assert(!splits(src), s"training source $src leaked into eval")
      assert(tp + fn == nPos, s"$src: tp+fn != n_pos")
      assert(tp >= 0 && fp >= 0 && fn >= 0 && nPos <= n)
      if (tp + fp > 0) assert(prec == tp * 1000000L / (tp + fp))
      else assert(prec == -1L)
      if (nPos > 0) assert(rec == tp * 1000000L / nPos) else assert(rec == -1L)
    }
    // all held-out docs are censused: per-source n sums to the held-out count
    val heldout = splits.count(!_._2)
    assert(rows.length == heldout, s"${rows.length} sources != $heldout")
  }

  test("pipe14 lifecycle: totals conserve, drifted cells fully reassigned, " +
      "recall pinned") {
    import org.apache.spark.sql.functions._
    val out = Queries.pipe14IndexLifecycle(spark, sfDir).collect()
    assert(out.length == 8)
    // the maintained index covers exactly the v2 corpus:
    // |v2| = |v1| - removals(%13) + additions(%11)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n1 = emb.count()
    val nRem = emb.where(col("vec_id") % 13 === 0).count()
    val nAdd = emb.where(col("vec_id") % 11 === 0).count()
    assert(out.map(_.getAs[Long]("n_total")).sum == n1 - nRem + nAdd)
    out.foreach { r =>
      assert(r.getAs[Long]("n_total") ==
        r.getAs[Long]("n_carried") + r.getAs[Long]("n_reassigned"))
      // a re-trained (drifted) cell's centroid changed, so NOTHING may be
      // carried into it on stored metadata
      if (r.getAs[Long]("drifted") == 1L)
        assert(r.getAs[Long]("n_carried") == 0L)
    }
    // the 115000-ppm threshold must exercise BOTH branches at sf0.001
    assert(out.count(_.getAs[Long]("drifted") == 1L) == 4)
    assert(out.count(r => r.getAs[Long]("drifted") == 0L &&
      r.getAs[Long]("n_carried") > 0L) == 4)
    // probe=2 recall vs the brute-force v2 truth — deterministic fixture
    assert(out.forall(_.getAs[Long]("recall_ppm") == 942857L))
  }

  test("w18 candle cascade: open/close elected by (ts, event_id) across " +
      "grain boundaries — hand-computed fixture") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("w18fix").toString
    val H = 3600000L
    // one series, one day; ticks deliberately OUT of event-id order and
    // straddling the minute/hour grains:
    //   hour 0, minute 0: (ts=1000, eid=7, v=10), (ts=1000, eid=3, v=20)
    //     -> same-ts tie: eid 3 opens the minute (v=20), eid 7 closes it
    //   hour 0, minute 5: (ts=300000, eid=1, v=30)
    //   hour 2, minute 0: (ts=2h+1, eid=9, v=5)
    // day open = v of (ts=1000, eid=3) = 20; day close = v of 2h tick = 5
    val rows = Seq(
      (7L, 1000L * 1000000L, 1L, "trade", 10.0),
      (3L, 1000L * 1000000L, 2L, "trade", 20.0),
      (1L, 300000L * 1000000L, 3L, "trade", 30.0),
      (9L, (2 * H + 1) * 1000000L, 4L, "trade", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", map(lit("k"), lit("v")))
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Queries.w18CandleCascade(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[String]("series") == "trade")
    assert(r.getAs[Long]("day_ms") == 0L)
    assert(r.getAs[Double]("open") == 20.0)  // eid tiebreak at equal ts
    assert(r.getAs[Double]("close") == 5.0)  // last hour's close wins
    assert(r.getAs[Double]("high") == 30.0)
    assert(r.getAs[Double]("low") == 5.0)
    assert(r.getAs[Long]("volume_micro") == 65000000L)
    assert(r.getAs[Long]("n_trades") == 4L)
  }
}
