package graft.queries

/** Shared constants between the Spark queries and their DuckDB oracle SQL.
  * Single source of truth — both sides derive from these values, so the two
  * engines compute the same thing by construction.
  */
object QuerySpec {
  // events table time domain: [2024-01-01, 2024-01-31) UTC
  val RangeStartMs = 1704067200000L
  val RangeEndMs = 1706659200000L
  val HourMs = 3600000L
  // W18 candle cascade grains (1m -> 1h -> 1d)
  val MinuteMs = 60000L
  val DayMs = 86400000L
  // W19 streaming candle maintenance: ordered micro-batches sliced by
  // event_id % batches, so every minute bucket merges across batches
  val W19Batches = 3
  val FiveMinMs = 300000L
  // last hour-grid point inside the range (inclusive end for calendars)
  val LastHourMs: Long = RangeEndMs - HourMs

  // gap engine params (hour grid over per-user event streams)
  val GapIvlMs: Long = HourMs
  val MergeWithinMs: Long = 6 * HourMs

  // integrity thresholds (A2): rows/hour below this → PARTIAL
  val PartialThreshold = 5L

  // TPC-H-ish date cuts (epoch ms, UTC)
  val Ms1996 = 820454400000L
  val Ms1997 = 852076800000L
  val Ms1998 = 883612800000L

  // dedup / text params
  val PassageK = 10
  val MinhashK = 16
  // D16 sampled calibration: keep 1-in-N candidate blocks (md5-gated)
  val CalibSampleMod = 4L
  val MinhashBands = 4
  // D17 LSH tuning: every (bands, rows) factorization of MinhashK,
  // swept in one pass — measured candidate cost per banding + the
  // closed-form S-curve collision probability at the threshold.
  val LshTuneCombos: Seq[(Int, Int)] =
    Seq((1, 16), (2, 8), (4, 4), (8, 2), (16, 1))
  val MinhashThreshold = 0.6
  // W16 streaming admission: shingle grain for the tagged index (unigram
  // token sets are degenerate on this closed-vocab corpus — see memory
  // note / d15's 218-matches-per-doc density), delta = odd doc_ids
  // streamed in W16Batches ordered micro-batches, base = even doc_ids
  val W16ShingleK = 3
  val W16Batches = 3
  val JaccardThreshold = 0.8
  val ShingleK = 5
  val SimhashBits = 60

  // similarity params
  val EmbeddingDim = 64
  val NumQueries = 8 // query set = vec_id < NumQueries
  val TopK = 5
  val LshBits = 8
  val LshTopK = 3

  // embedding near-dup (D5): sign-LSH candidate bits + cosine threshold
  val D5Bits = 12
  val D5Threshold = 0.4
  // IVF (S3): coarse cells = centroid rows vec_id < NumCentroids, probe=1
  val NumCentroids = 8
  // D10 SemDeDup: within-cell cosine cut for semantic duplicates
  val SemThreshold = 0.4
  // D24 density-adaptive SemDeDup: cells above this ABSOLUTE census split
  // into floor(sqrt(n_cell)) sub-buckets (the one-level optimum: per-cell
  // cost n·√n assignment + n^1.5 pair space, vs the frozen quantizer's
  // n²). 64 exercises the split path at sf0.01 (cells 48-70) while
  // leaving some cells unsplit there, covering both branches.
  val SemCellCap = 64L
  // PIPE15 epoch-spine decontamination shingle width: 8-gram overlap (the
  // Llama/GPT-style span-contamination grain), NOT d7's 3-gram census
  // grain — on this closed-vocabulary synthetic corpus 3-gram overlap
  // saturates with SF (measured: 366/482 corpus docs contaminated at
  // sf0.01, 4818/4827 at sf0.1 — the funnel's late stages would run
  // empty), while 8-grams mark ~1% at every tested SF, the realistic
  // production rate. d7/d11 keep k=3: they CENSUS overlap; pipe15 GATES
  // on it.
  val Pipe15DeconK = 8
  // W20 streaming ANN admission (w16's pattern on the vector plane): odd
  // vec_ids stream in W20Batches ordered micro-batches (batch =
  // (vec_id div 2) % W20Batches); the base index is the even vec_ids under
  // the frozen NumCentroids quantizer. A delta vector probes its W20Probe
  // nearest cells and is rejected when any index member or smaller-id
  // batch-mate whose STORED (rank-1) cell falls in a probed cell has
  // round(cosine, 6) >= SemThreshold.
  val W20Batches = 3
  val W20Probe = 2
  // W21 streaming QUANTIZER-REFRESH lifecycle (the r15 verdict's one
  // named 100 TB caveat closed): odd vec_ids stream in W21Epochs
  // checkpoint lifecycles of W21Batches micro-batches each (epoch =
  // (vec_id div 2) % W21Epochs, batch = (vec_id div 4) % W21Batches —
  // interleaved residues, so cross-batch admission interactions exist in
  // both epochs). Epoch 0 admits under the frozen base quantizer; at the
  // boundary the model takes ONE exact-decimal Lloyd step over the
  // index's STORED assignments (Similarity.refreshQuantizer) and the
  // index is rebuilt under the new cells; epoch 1 admits under the
  // refreshed model. Probe/threshold semantics are w20's.
  val W21Epochs = 2
  val W21Batches = 2
  val W21Probe = 2
  // S12 product quantization: m subspaces of EmbeddingDim/m dims each
  val PqM = 8
  val IvfTopK = 5
  // PIPE14 index lifecycle: a cell whose staleness census exceeds this
  // threshold takes the re-train path; 115000 ppm splits the 8 cells into
  // BOTH branches at sf0.001 (4/4), sf0.01 (5/3) and sf0.1 (4/4), so the
  // merge path, the re-train path and the carried/contested row classes
  // are all exercised at every tested SF
  val Pipe14StalePpm = 115000L
  // serving probe for pipe14's post-maintenance recall check
  val Pipe14Probe = 2
  // J13 adaptive salted join: hot iff count > (HotNum/HotDen)·mean — 3/2
  // marks exactly the sentinel key hot at sf0.001/0.01/0.1 (measured
  // factors 2/13/32: the salt genuinely adapts to SF); cap bounds the
  // build-side replication of a pathological key
  val J13HotNum = 3L
  val J13HotDen = 2L
  val J13SaltCap = 32
  // S23 rank-quality metrics: integer nDCG rank weights, computed ONCE
  // here and injected as literals into BOTH the Spark plan and the DuckDB
  // SQL — micro-scaled floor(1e6 / log2(rank+1) + 0.5), so the metric is
  // pure integer arithmetic on both engines (no cross-engine log/float
  // seam at query time)
  val NdcgWeightsMicro: Seq[Long] = (1 to IvfTopK).map(r =>
    math.floor(1e6 / (math.log(r + 1.0) / math.log(2.0)) + 0.5).toLong)
  // S8 matryoshka-style two-stage ANN: prefix dims + shortlist size
  val MrlPrefixDim = 16
  val MrlShortlist = 20
  // S11 full Lloyd training: iteration cap (early stop at the fixpoint; the
  // oracle replays exactly this many steps — identities past convergence)
  val KmeansIters = 12
  // S16 contrastive mining: positives / hard negatives per query, probed cells
  val PosK = 2
  val NegK = 3
  val S16Probe = 2

  // A18 TextRank/PageRank: damping 85/100, rank mass scaled to parts-per-
  // trillion so every iteration is integer-exact in both engines
  val PrIters = 8
  val PrScale = 1000000000000L

  // A23 window funnel (3 steps, ClickHouse windowFunnel semantics): the
  // step types in order; chain deadline reuses SeqWithinMs from the first
  // step's timestamp
  val FunnelA = "view"
  val FunnelB = "click"
  val FunnelC = "purchase"

  // A16 sequence match: A-event → B-event conversion window
  val SeqEventA = "signup"
  val SeqEventB = "purchase"
  val SeqWithinMs: Long = 24 * 3600000L

  // X3 overlap join: gap-based sessions (interval = [first, last] event
  // ts) overlap-joined with campaign windows via bucket expansion;
  // bucket width ~ the typical interval length.
  val X3SessionGapMs = 1800000L
  val X3BucketMs = 21600000L
  val X3Campaigns: Seq[(Long, Long, Long)] = Seq(
    (1L, RangeStartMs + 2L * 86400000, RangeStartMs + 5L * 86400000),
    (2L, RangeStartMs + 9L * 86400000 + 43200000,
      RangeStartMs + 11L * 86400000),
    (3L, RangeStartMs + 19L * 86400000, RangeStartMs + 20L * 86400000),
    (4L, RangeStartMs + 27L * 86400000, RangeStartMs + 30L * 86400000))

  // A25 conversion-latency percentiles: cohort = first-SeqEventA day;
  // latency = first SeqEventB at-or-after that first A, bucketed to
  // whole minutes (the bounded histogram grid that turns exact
  // percentiles into a grid-sized problem); percentile p = smallest
  // bucket whose running count reaches ceil(p*n/100); -1 = no converts.
  val LatBucketMs = 60000L

  // A24 attribution: lookback window for crediting a conversion
  // (FunnelC) to its first/last preceding touch (FunnelB).
  val AttrLookbackMs: Long = 7 * 24 * 3600000L

  // T21 BM25 retrieval: query terms (df-diverse: 'dup' is rare), Lucene
  // constants, result depth
  val Bm25Terms: Seq[String] = Seq("dup", "window", "customer")
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25TopK = 10
  // T22 inverted index: term-hash partition count for the postings table
  val PostingsBuckets = 16L

  // T28 hybrid retrieval: RRF constant (Cormack 2009's k=60), per-ranker
  // list depth, the query vector id, and the fused result depth. Fused
  // scores are integer parts-per-trillion (PrScale div (k + rank)) so the
  // fusion is bit-exact in both engines.
  val RrfK = 60
  val RrfDepth = 10
  val RrfQueryVec = 0
  val RrfTopK = 10

  // S18 MMR diversification (Carbonell & Goldstein 1998): select MmrK of
  // the fused candidates greedily maximizing λ·relevance − (1−λ)·max
  // similarity-to-selected, with λ = MmrLambda10/10. Relevance is the
  // RRF-style integer score RelScale div (RrfK + fused rank) and
  // candidate-pair cosines round to integer ppm, so every MMR score is
  // exact integer arithmetic on both engines.
  val MmrK = 5
  val MmrLambda10 = 7L
  val RelScale = 1000000L

  // PIPE8 sequence packing: fixed context length (tokens) and the shard
  // fan-out; docs are ordered inside a shard by a portable md5-derived key
  // (deterministic pseudo-random training order, retry-stable like t23)
  val PackCtx = 512L
  val PackShards = 8L

  // T30 DSIR importance weights: target domain = docs with this lang;
  // per-token log importance ratio between the add-1-smoothed target and
  // raw unigram LMs, floored to integer micro-nats PER TOKEN (so the
  // per-doc rollup is an integer sum — no float-order hazard); a doc is
  // kept when its summed score is positive (closer to the target).
  val DsirTargetLang = "en"

  // T36 bigram LM: absolute discount D = KnDiscountNum/4 (0.75, the
  // standard Kneser-Ney default); probabilities kept in RATIONAL form
  // so the only float op is two ln's of exact integers per bigram type
  val KnDiscountNum = 3L

  // T34 DoReMi mixture reweighting: MW iterations and learning rate in
  // ppm (query recurrence and generated oracle must agree)
  val DoremiIters = 8
  val DoremiEtaPpm = 200000L

  // T35 competence-based curriculum: number of stages, and the micro-nat
  // band width that buckets the difficulty rank (distributed-rank bucket
  // grain — any monotone function of the sort key works)
  val CurrStages = 4L
  val CurrBandMicro = 250000L

  // S20 recall-vs-nprobe sweep: evaluate IVF recall@TopK against the
  // brute-force truth at each of these probe settings, from ONE corpus
  // assignment pass (candidates carry the query-side probe rank).
  val NprobeSweep: Seq[Int] = Seq(1, 2, 4)

  // S19 incremental index maintenance: the delta batch is every vector
  // with id >= NumCentroids and id % S19DeltaMod == 0; the standing index
  // is built without them, and the merge appends them cell-partitioned
  // under the FROZEN quantizer (standard IVF incremental add).
  val S19DeltaMod = 8L

  // PIPE10 training-mix assembly: global token budget = MixFracPpm of the
  // corpus's total whitespace-token count, split across langs by
  // MixWeightsPpm (langs absent from the weights get no allocation).
  // Docs are selected per lang in portable md5 order until the running
  // pre-doc token total crosses the lang target (the crossing doc kept).
  // The engine range-buckets the 60-bit order key by its top bits
  // (bucket = key div 2^MixBucketShift → 2^(60-shift) buckets) so the
  // exact cumsum window touches one boundary bucket per lang.
  val MixFracPpm = 500000L
  val MixWeightsPpm: Seq[(String, Long)] = Seq(
    "en" -> 500000L, "de" -> 125000L, "es" -> 125000L,
    "fr" -> 125000L, "zh" -> 125000L)
  val MixBucketShift = 52
  // PIPE16 streaming epoch spine: odd doc_ids stream in this many ordered
  // micro-batches (batch = (doc_id div 2) % Pipe16Batches — the w16
  // slicing); the base corpus (even doc_ids, curated) is yesterday's
  // staged state, and the epoch's per-lang token budget derives from the
  // BASE corpus token total (budget = base × MixFracPpm, split by
  // MixWeightsPpm — causally sound: today's epoch is budgeted from
  // yesterday's supply, and both sides scale with SF so the budget binds
  // mid-stream at every tested scale instead of saturating or never
  // engaging)
  val Pipe16Batches = 3

  // M7 streaming multimodal admission (the m-family's streaming plane):
  // payloads = text bytes (the m1/m2 convention); base corpus = even
  // doc_ids, odd doc_ids stream in M7Batches ordered micro-batches
  // (batch = (doc_id div 2) % M7Batches — the w16 slicing). Per batch:
  // m2's sha256 exact-dup gate (vs the prefix-partitioned sha store +
  // smaller-id batch-mates), m3's 8-dim byte-lane features, then w20's
  // vector-admission discipline on the features (probe M7Probe cells of
  // the M7Centroids-doc quantizer, reject at round(cosine,6) >=
  // M7Threshold), and m6-style shard-manifest deltas. The threshold is
  // fixture-measured: byte-histogram features of same-distribution text
  // cluster tightly (cosine p50 ~0.99 on the corpus), so the near-dup
  // cut sits in the upper tail — the honest regime for low-dim content
  // fingerprints, where only near-identical byte streams exceed it.
  val M7Batches = 3
  val M7Centroids = 8
  val M7Probe = 2
  val M7Threshold = 0.9995
  val M7Shards = 8L
  // RE-DELIVERY synthesis: the fixture has no byte-identical odd docs
  // below sf0.1 (measured), so the exact gate's production trigger —
  // the same payload re-ingested under a fresh id (re-crawl, retried
  // upload) — is synthesized deterministically: every odd doc with
  // doc_id % M7RedeliverMod == 0 is delivered AGAIN in the next batch
  // as (doc_id + M7RedeliverOffset, same bytes). The sha store's
  // append-back rejects every one cross-batch; the oracle synthesizes
  // the same rows from the same rule.
  val M7RedeliverMod = 7
  val M7RedeliverOffset = 10000000L

  // K8 retention vacuum: day age measured from the fixed corpus end
  // (RangeEndMs — deterministic "now"); the last RetentionKeepDays days
  // stay, older days archive on the weekly grid (day % 7 == 0) and
  // delete otherwise.
  val RetentionKeepDays = 7L

  // O9 compaction planner: fragments per partition dir in the staged
  // fixture, and the target rows per planned output bin (the row-count
  // stand-in for a target file size; production divides target bytes by
  // the manifest's avg row width).
  val CompactFrag = 8
  val CompactTargetRows = 64L

  // M5 pair filtering: hashed-BoW embedding dims, caption length (tokens),
  // cosine keep threshold, and the misalignment synth rate (docs whose
  // caption is swapped with the next doc's). D=32 / th=0.6 measured on the
  // fixture: keeps ~96% of aligned pairs, drops ~51% of shifted ones —
  // an honestly imperfect filter, like the real thing.
  val ClipDim = 32
  val ClipCapTokens = 12
  val ClipThreshold = 0.6
  val ClipShiftMod = 5

  // O7 z-order layout: bits per dimension, bucket = z >> ZShift, and the
  // probe rectangle used for the pruning-effectiveness flags
  val ZBits = 8
  val ZShift = 10
  val ZProbeUx: (Int, Int) = (32, 47)
  val ZProbeVy: (Int, Int) = (100, 115)

  // T20 chunk-level dedup: non-overlapping chunk size (tokens) and the
  // min distinct-doc count that marks a chunk as corpus-duplicated
  val LineChunk = 10
  val LineDupDocs = 2

  // A15 count-min sketch: depth hash rows × width buckets, top-N eval
  val CmsDepth = 4
  val CmsWidth = 512
  val CmsTopN = 25

  // W4 fetch-window pagination: requests of FetchLimit × interval span
  val FetchLimit = 24

  // SN1 wide-fact time cut (first 15 days of the events range)
  val SnapshotTsCut: Long = RangeStartMs + 15L * 86400000L

  // P9 canonicalization input codes (synthesized from custkey)
  val P9Codes: Seq[String] =
    Seq("XXBT", "XETH", "ZUSD", "SOL", "ZEUR", "ADA", "XXRP", "DOGE")

  // P15 AES key (16 bytes → AES-128, ECB like the reference's decrypt_post)
  val AesKey = "0123456789abcdef"

  // P17 per-prefix thresholds over props.k, first match wins, default 50
  val P17Rules: Seq[(String, Int)] = Seq("c" -> 60, "v" -> 70, "p" -> 80)
  val P17Default = 50

  // P13 entity rules — order-sensitive, first match wins
  val EntityRules: Seq[(String, String)] = Seq(
    "spark" -> "engine",
    "join" -> "relational",
    "stream" -> "streaming",
    "vector" -> "ml",
    "window" -> "windowing")
  val EntityDefault = "other"

  // T1 language markers — order is the tie-break priority
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a"),
    "es" -> Seq("order", "part"),
    "de" -> Seq("window", "batch"),
    "fr" -> Seq("merge", "filter"),
    "zh" -> Seq("vector", "hash"))

  // T2 stopwords
  val Stopwords: Seq[String] = Seq("the", "a")

  // T16 per-domain document cap (RefinedWeb-style dominance limit)
  val DomainCap = 10

  // T14 pocket-perceptron epochs (query and generated oracle must agree)
  val T14Epochs = 12

  // T18 BPE merge rounds (query and generated oracle must agree)
  val BpeMerges = 8

  // D12 sliding-window substring-dedup window length (tokens)
  val SubstrK = 10

  // D22 CDC-chunk resemblance join: boundary modulus (t25's chunking) and
  // the chunk-set Jaccard threshold
  val CdcModulus = 8
  // T38 sliding-window chunking: C-token windows, O-token overlap
  // (stride C−O) — the fixed-grain RAG/context-window complement to
  // t25's content-defined chunks
  val ChunkTokens = 64
  val ChunkOverlap = 16
  val CdcResemblance = 0.5

  // D20 prefix-filtering exact similarity join: shingle width (words) and
  // the Jaccard threshold in exact ppm (integer ceil in the prefix-length
  // math — see Dedup.prefixFilterDupPairs)
  val PrefixJoinK = 3
  val PrefixJoinPpm = 500000L

  // D21 sorted-neighborhood blocking (Hernández & Stolfo 1995): sort-key
  // text-prefix length (chars, whitespace-normalized), window width
  // (pair each doc with the next w-1 in sort order), and the verify
  // threshold on token-set Jaccard
  val SnmPrefixChars = 24
  val SnmWindow = 3
  val SnmThreshold = 0.5

  // D23 asymmetric containment join (Broder 1997): threshold on
  // |S(a)∩S(b)| / |S(a)| in exact ppm (shares PrefixJoinK's shingle width;
  // integer ceil in the one-sided prefix-length math — see
  // Dedup.containmentDupPairs)
  val ContainPpm = 800000L

  // T37 corpus-growth census: Heaps checkpoints (doc_id-mod buckets), the
  // Zipf head size the rank-frequency regression runs over, and the
  // shingle width defining a vocabulary TYPE (the dedup-index grain)
  val VocabBuckets = 10
  val ZipfTopN = 100
  val VocabK = 3

  // O10 zone-map skip census: file count of the natural layout, and the
  // canonical predicate grid (name, ux range, vy range) both layouts are
  // scored against
  val SkipFiles = 32
  val SkipPredicates: Seq[(String, Long, Long, Long, Long)] = Seq(
    ("p1_user_slice", 32L, 47L, 0L, 255L),
    ("p2_value_band", 0L, 1L << 40, 100L, 115L),
    ("p3_both_narrow", 32L, 47L, 100L, 115L),
    ("p4_hot_corner", 0L, 7L, 0L, 7L))

  // A30 Markov attribution: the channel states (event types that are not
  // the conversion) and the fixed absorption-iteration count both engines
  // unroll exactly
  val MarkovChannels = Seq("click", "error", "signup", "view")
  val MarkovIters = 12

  // S21 filtered ANN: probe width for the label-filtered search (filters
  // thin cells, so the filtered path probes wider than s3's nprobe=1)
  val S21Probe = 2

  // A29 sketch overlap: number of leading purchase-day cohorts in the
  // pairwise overlap grid (d days → d(d-1)/2 pairs, model-sized)
  val OverlapDays = 10

  // P8 order-status enum
  val StatusMap: Map[String, Int] = Map("O" -> 0, "F" -> 1, "P" -> 2)
}
