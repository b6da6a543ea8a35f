package graft.queries

import QuerySpec._
import graft.operators.{HtmlExtract, Similarity}
import graft.sources.WideSnapshot

/** DuckDB oracle SQL for every query in [[Queries]]. Each statement is the
  * exact relational twin of the Spark plan: same constants (via QuerySpec),
  * same md5 hashing, same left-to-right double folds (emitted as explicit
  * `0.0 + t1 + t2 + ...` chains), same DECIMAL(18,2) money accumulation,
  * same total ORDER BY.
  */
object Oracles {

  // ---- shared SQL fragments ----------------------------------------------

  /** Resource pin prefixed to EVERY oracle statement (SET persists on the
    * connection, but prefixing each statement also covers checkers that run
    * subsets or re-order). Multi-statement strings are executed by DuckDB's
    * `execute()` and `sql()`, returning the last result, so the prefix is
    * transparent to the comparison — proven driver-compatible in round 7
    * (s6/s13 went red→green with a `SET threads=8;` prefix).
    *
    * Why each knob (the r07 record lost 20 rows to oracle-side
    * `OutOfMemoryException: failed to allocate block of <2KB-1MB>` — the
    * CHECKER process memory-exhausted at the tail of its sorted run, on
    * sf0.01 inputs measured in KB):
    *  - `threads=2`: every DuckDB worker thread grows its own glibc
    *    malloc arenas (64 MiB of VIRTUAL address space each, up to 8 per
    *    thread, never returned to the OS) — at 32 threads the wide-
    *    expression vector/BPE queries reserve gigabytes of VA and the
    *    process dies on pthread_create ("Resource temporarily
    *    unavailable", the r6 failure string) or tiny mallocs ("bad
    *    allocation", the r7 string). Two threads keep arena growth
    *    bounded; at KB-scale inputs parallelism buys nothing anyway.
    *  - `memory_limit='1GB'`: DuckDB sizes its buffer pool from HOST RAM
    *    (~80%), not the container cgroup cap, so over 151 statements the
    *    pool grows until malloc dies. A hard 1 GB bound (1000× headroom
    *    over the largest sf0.01 intermediate — measured with
    *    scripts/check_oracle_driverlike.py) keeps the process flat.
    *
    * `temp_directory` (spill instead of erroring at the bound) goes ONLY
    * on the alphabetically-FIRST statement ([[all]]): DuckDB refuses any
    * later `SET temp_directory` once the directory has been used, so a
    * per-statement SET would turn one spill into a failure cascade over
    * the whole remaining run. */
  private val OraclePin = "SET threads=2; SET memory_limit='1GB'; "
  private val OracleSpillDir =
    "SET temp_directory='/tmp/graft_oracle_spill'; "

  /** raw whitespace tokens (no lowercasing) of a text expression. */
  private def rawToks(t: String) =
    s"list_filter(regexp_split_to_array(trim($t), '\\s+'), x -> x <> '')"

  /** lowercased token sequence (order-preserving). */
  private def lowSeq(t: String) =
    s"list_transform(${rawToks(t)}, x -> lower(x))"

  /** distinct lowercased token set (Spark: array_distinct(split(lower))). */
  private def lowSet(t: String) =
    s"list_distinct(${rawToks(s"lower($t)")})"

  private def dsum(c: String) =
    s"CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"

  /** Value of the first 15 chars of a hex-string expression, matching
    * Spark's conv(substring(e,1,15),16,10). */
  private def hexVal15(e: String) = (1 to 15).map { i =>
    val w = math.pow(16, 15 - i).toLong
    s"(strpos('0123456789abcdef', substr($e, $i, 1)) - 1) * $w"
  }.mkString("(", " + ", ")")

  /** The repo's portable md5 hash — value of the first 15 hex chars of
    * md5(e), matching Spark's conv(substring(md5(e),1,15),16,10). */
  private def md5Hash15(e: String) = hexVal15(s"md5($e)")

  /** Shared d14/d16 estimator-calibration SQL: minhash K-component
    * agreement vs exact Jaccard over the blocked pair space, decile
    * rollup over integer sufficient statistics. `docGate` is an extra
    * predicate ANDed into the tokenized-document CTE — "" for the full
    * eval (d14), the md5 block-sample gate for d16. */
  private def minhashEstSql(docGate: String): String = {
    // post-min 15-hex-long conversion, mirroring the engine's shuffle
    // lightening (equality on converted mins ≡ equality on the strings
    // up to 15-hex-prefix ties)
    val sigs = (0 until MinhashK).map(i =>
      s"${hexVal15(s"list_min(list_transform(toks, x -> md5('$i:' || x)))")} AS m$i")
      .mkString(",\n  ")
    val mc = (0 until MinhashK).map(i =>
      s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH t AS (SELECT doc_id AS id, lang, source, ${lowSet("text")} AS toks
       |  FROM documents),
       |t2 AS (SELECT * FROM t WHERE len(toks) > 0$docGate),
       |sig AS (SELECT id,
       |  $sigs
       |FROM t2),
       |f AS (SELECT t2.*, sig.* EXCLUDE (id) FROM t2 JOIN sig USING (id)),
       |p AS (SELECT
       |    CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) AS inter,
       |    CAST(len(a.toks) + len(b.toks) AS DOUBLE) AS ss,
       |    ($mc) AS mc
       |  FROM f a JOIN f b
       |    ON a.lang = b.lang AND a.source = b.source AND a.id < b.id),
       |j AS (SELECT mc,
       |    CASE WHEN ss - inter > 0 THEN inter / (ss - inter) ELSE 1.0 END AS jac
       |  FROM p),
       |g AS (SELECT least(CAST(floor(jac * 10) AS INT), 9) AS bucket, mc,
       |    CAST(floor(abs(mc / $MinhashK.0 - jac) * 1000000 + 0.5) AS BIGINT)
       |      AS err_ppm
       |  FROM j)
       |SELECT CAST(bucket AS BIGINT) AS bucket,
       |  count(*) AS n_pairs,
       |  CAST(sum(mc) AS DOUBLE) / (count(*) * $MinhashK) AS mean_est,
       |  CAST(sum(err_ppm) AS DOUBLE) / (count(*) * 1000000) AS mean_abs_err
       |FROM g GROUP BY 1 ORDER BY bucket""".stripMargin
  }

  private val hourFloor = s"epoch_ms(ts)//$HourMs*$HourMs"

  /** Shared t30/pipe11 DSIR scoring CTEs, ending in
    * `dscore(doc_id, lang, n_toks, score_micro)` — one text, interpolated
    * into both entries so the gate cannot drift between them. */
  private val dsirCtes: String =
    s"""u AS (SELECT doc_id, lang,
       |    unnest(${rawToks("lower(text)")}) AS tok
       |  FROM documents),
       |dt AS (SELECT doc_id, lang, tok, count(*) AS occ
       |  FROM u GROUP BY 1, 2, 3),
       |rawlm AS (SELECT tok, sum(occ) AS cr FROM dt GROUP BY 1),
       |tgtlm AS (SELECT tok, sum(occ) AS ct FROM dt
       |  WHERE lang = '$DsirTargetLang' GROUP BY 1),
       |lmj AS (SELECT tok, cr, coalesce(ct, 0) AS ct
       |  FROM rawlm LEFT JOIN tgtlm USING (tok)),
       |lmk AS (SELECT sum(cr) AS nr, sum(ct) AS nt, count(*) AS v
       |  FROM lmj),
       |slm AS (SELECT tok,
       |    CAST(floor((ln(CAST(ct + 1 AS DOUBLE) / CAST(nt + v AS DOUBLE))
       |      - ln(CAST(cr + 1 AS DOUBLE) / CAST(nr + v AS DOUBLE)))
       |      * 1000000) AS BIGINT) AS lr_micro
       |  FROM lmj CROSS JOIN lmk),
       |dscore AS (SELECT doc_id, max(lang) AS lang,
       |    CAST(sum(occ) AS BIGINT) AS n_toks,
       |    CAST(sum(occ * lr_micro) AS BIGINT) AS score_micro
       |  FROM dt JOIN slm USING (tok) GROUP BY doc_id)""".stripMargin

  /** One BPE training round as CTEs (t18/t19 shared; see the t18 entry
    * for the parity-window equivalence argument). Reads v{r-1}, defines
    * m$r (the elected merge) and v$r (the merged vocab). */
  private def bpeRound(r: Int): String = {
    val prev = if (r == 1) "v0" else s"v${r - 1}"
    s"""pe$r AS MATERIALIZED (SELECT freq, syms, unnest(range(1, len(syms))) AS i
       |  FROM $prev WHERE len(syms) >= 2),
       |pc$r AS MATERIALIZED (SELECT syms[i] AS lft, syms[i + 1] AS rgt,
       |    CAST(sum(freq) AS BIGINT) AS c
       |  FROM pe$r GROUP BY 1, 2),
       |m$r AS MATERIALIZED (SELECT lft, rgt, c FROM pc$r
       |  ORDER BY c DESC, lft, rgt LIMIT 1),
       |me$r AS MATERIALIZED (SELECT word, freq, unnest(range(1, len(syms) + 1)) AS p,
       |    syms FROM $prev),
       |ms$r AS MATERIALIZED (SELECT word, freq, p, syms[p] AS sym,
       |    CASE WHEN p < len(syms) AND syms[p] = m.lft
       |          AND syms[p + 1] = m.rgt THEN 1 ELSE 0 END AS mt
       |  FROM me$r CROSS JOIN m$r m),
       |mg$r AS MATERIALIZED (SELECT *, p - sum(mt) OVER
       |    (PARTITION BY word ORDER BY p) AS grp
       |  FROM ms$r),
       |mk$r AS MATERIALIZED (SELECT *, CASE WHEN mt = 1 AND
       |      (p - min(p) OVER (PARTITION BY word, mt, grp)) % 2 = 0
       |    THEN 1 ELSE 0 END AS mrg
       |  FROM mg$r),
       |mo$r AS MATERIALIZED (SELECT word, freq, p,
       |    CASE WHEN mrg = 1 THEN sym ||
       |      lead(sym) OVER (PARTITION BY word ORDER BY p)
       |      ELSE sym END AS sym2,
       |    lag(mrg, 1, 0) OVER (PARTITION BY word ORDER BY p) AS drp
       |  FROM mk$r),
       |v$r AS MATERIALIZED (SELECT word, freq, list(sym2 ORDER BY p) AS syms
       |  FROM mo$r WHERE drp = 0 GROUP BY 1, 2)""".stripMargin
  }

  /** Full BPE WITH-prefix: corpus word freqs → v0 (char split) → rounds
    * 1..BpeMerges, ending at v$BpeMerges (the trained encoder state). */
  private val bpeWith: String = {
    val rounds = (1 to BpeMerges).map(bpeRound).mkString(",\n")
    s"""w AS MATERIALIZED (SELECT tok AS word, count(*) AS freq FROM
       |    (SELECT unnest(${rawToks("lower(text)")}) AS tok FROM documents)
       |  GROUP BY 1),
       |v0 AS MATERIALIZED (SELECT word, freq,
       |    [substr(word, i, 1) for i in range(1, len(word) + 1)] AS syms
       |  FROM w),
       |$rounds""".stripMargin
  }

  /** explicit left-fold dot-product chain: 0.0 + a[1]*b[1] + ... */
  private def dotChain(a: String, b: String): String =
    (1 to EmbeddingDim).map(i =>
      s"(CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE))")
      .mkString("0.0 + ", " + ", "")

  /** sign-LSH bucket chain over `vec`, mirroring Similarity.lshBucket. */
  private def bucketChain(vec: String, bits: Int = LshBits): String = {
    val signs = Similarity.signMatrix(bits, EmbeddingDim)
    signs.map { row =>
      val proj = row.zipWithIndex.map { case (sgn, d) =>
        s"(CAST($vec[${d + 1}] AS DOUBLE) * $sgn)"
      }.mkString("0.0 + ", " + ", "")
      s"(CASE WHEN $proj > 0 THEN '1' ELSE '0' END)"
    }.mkString(" || ")
  }

  /** cosine similarity fragment between two array expressions. */
  private def cosChain(a: String, b: String): String =
    s"(${dotChain(a, b)}) / (sqrt(${dotChain(a, a)}) * sqrt(${dotChain(b, b)}))"

  /** Shared t2 quality score as CTE fragments ending in
    * `q(doc_id, quality)` — reused by t2's descendants (d13, t16). The
    * expression text is identical to t2's inline version so the doubles are
    * bit-identical across all three queries. */
  private def qualityCtes(scratch: String = "qs"): String = {
    val sw = Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""$scratch AS (SELECT doc_id,
       |  CAST(len(${rawToks("text")}) AS DOUBLE) AS n,
       |  len(list_filter(${rawToks("text")}, x -> list_contains($sw, x))) AS hits,
       |  CAST(list_sum(list_transform(${rawToks("text")}, x -> length(x))) AS BIGINT) AS lsum
       |FROM documents),
       |q AS (SELECT doc_id,
       |  floor((least(n / 100.0, 1.0) * 0.4
       |    + (CASE WHEN n > 0 THEN hits / n ELSE 0.0 END) * 0.3
       |    + (CASE WHEN n > 0 AND lsum / n BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.5 END) * 0.3)
       |    * 10000.0 + 0.5) / 10000.0 AS quality
       |FROM $scratch)""".stripMargin
  }

  /** Shared raw-URL synthesis CTEs (UrlNormalize.syntheticUrl's string
    * algebra — bigints concat through `||` exactly as Spark's
    * cast-to-string): end in `r(doc_id, raw_url)` — reused by t27, pipe6. */
  private val urlSynthCtes: String =
    s"""u AS (SELECT doc_id, doc_id // 3 AS article,
       |    (doc_id // 3) % 7 AS hostn, doc_id % 6 AS v FROM documents),
       |r AS (SELECT doc_id, CASE v
       |  WHEN 0 THEN 'https://site' || hostn || '.example.com/posts/a' || article
       |  WHEN 1 THEN 'HTTPS://WWW.Site' || hostn || '.Example.COM:443/posts/a' || article || '/'
       |  WHEN 2 THEN 'https://site' || hostn || '.example.com/posts/a' || article || '?utm_source=feed&utm_campaign=c' || doc_id
       |  WHEN 3 THEN 'http://site' || hostn || '.example.com:80/posts/a' || article || '#frag-' || doc_id
       |  WHEN 4 THEN 'https://site' || hostn || '.example.com/posts/a' || article || '?b=2&a=1'
       |  ELSE 'https://www.site' || hostn || '.example.com/posts/a' || article || '?a=1&fbclid=x' || doc_id || '&b=2'
       |  END AS raw_url FROM u)""".stripMargin

  /** Shared URL canonicalization CTEs (the UrlNormalize.canonical rules,
    * replayed rule-for-rule): consume a CTE `r(doc_id, raw_url)`, end in
    * `cn(doc_id, raw_url, sch, hst, pth, qq)` — reused by t27 and pipe6.
    * `$$` renders a literal regex end-anchor through the s-interpolator. */
  private val urlCanonCtes: String =
    s"""cf AS (SELECT doc_id, raw_url,
       |    regexp_replace(raw_url, '#.*$$', '') AS nf FROM r),
       |pr AS (SELECT doc_id, raw_url,
       |    lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
       |    regexp_replace(lower(regexp_extract(nf, '^[^:]+://([^/?]+)', 1)),
       |      '^www\\.', '') AS h0,
       |    coalesce(regexp_extract(nf, '^[^:]+://[^/?]+(/[^?]*)', 1), '') AS pth0,
       |    coalesce(regexp_extract(nf, '\\?(.*)$$', 1), '') AS q FROM cf),
       |qs AS (SELECT doc_id, raw_url, sch, h0, pth0,
       |    coalesce(array_to_string(list_sort(list_filter(string_split(q, '&'),
       |      p -> p <> '' AND NOT starts_with(p, 'utm_')
       |        AND NOT list_contains(['fbclid','gclid','ref','mc_eid','igshid'],
       |          string_split(p, '=')[1]))), '&'), '') AS qsort FROM pr),
       |cn AS (SELECT doc_id, raw_url, sch,
       |    CASE WHEN sch = 'http' THEN regexp_replace(h0, ':80$$', '')
       |         WHEN sch = 'https' THEN regexp_replace(h0, ':443$$', '')
       |         ELSE h0 END AS hst,
       |    CASE WHEN pth0 = '/' THEN '' ELSE regexp_replace(pth0, '/$$', '')
       |      END AS pth,
       |    CASE WHEN qsort = '' THEN '' ELSE '?' || qsort END AS qq
       |  FROM qs)""".stripMargin

  /** Shared web-curation funnel CTEs — the t26 page-synth + extraction
    * chain (lang carried through), Gopher gate, t27 URL canonicalization
    * and the two cascading conditional-window keep elections — ending in
    * `s3(doc_id, lang, words, fp, clean_ok, canon, url_ok, final_ok)`.
    * Reused by pipe6 (the funnel census) and pipe9 (packing over the
    * survivor set); one text so the two can never drift. MATERIALIZED
    * pins the html chain to one evaluation (the bpeWith lesson: DuckDB
    * inlines CTEs per reference). */
  /** The STATELESS prefix of [[curationCtes]] — page synth → extraction →
    * Gopher gate, ending in `ok(doc_id, lang, words, fp, clean_ok)` with
    * the clean text visible in `cl`. Shared by the election-suffix form
    * below and by pipe16, whose streaming plane curates per micro-batch
    * with exactly this chain (the one-implementation rule, oracle side). */
  private val curationTextCtes: String =
    s"""t AS (SELECT doc_id, lang, source, ${rawToks("text")} AS toks
       |  FROM documents),
       |pg AS MATERIALIZED (SELECT doc_id, lang,
       |  '<html><head><title>Doc ' || doc_id || '</title><style>p { margin: 0; }</style><script>var tracker = "x"; load();</script></head><body>' || chr(10) ||
       |  '<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/archive">' || lang || ' archive</a></nav>' || chr(10) ||
       |  array_to_string(list_transform(
       |      range(1, CAST(ceil(len(toks)/20.0) AS BIGINT) + 1),
       |      i -> '<p>' || array_to_string(toks[((i-1)*20+1):(i*20)], ' ') ||
       |        '</p>'), chr(10)) || chr(10) ||
       |  '<div class="promo"><a href="/buy">Buy now</a> top deals <a href="/go">click here</a></div>' || chr(10) ||
       |  '<footer>Copyright 2026 ' || source || ' <a href="/terms">Terms</a> <a href="/privacy">Privacy</a></footer></body></html>' AS html
       |  FROM t),
       |bl AS (SELECT doc_id, lang,
       |  string_split(regexp_replace(regexp_replace(html,
       |    '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
       |    '(?s)<style[^>]*>.*?</style>', ' ', 'g'), chr(10)) AS blocks
       |  FROM pg),
       |f0 AS (SELECT doc_id, lang, list_transform(blocks, b -> struct_pack(
       |    txt := trim(regexp_replace(regexp_replace(b,
       |      '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g')),
       |    anchors := CAST(coalesce(list_sum(list_transform(
       |      regexp_extract_all(b, '<a [^>]*>([^<]*)</a>', 1),
       |      a -> length(replace(a, ' ', '')))), 0) AS BIGINT))) AS f0
       |  FROM bl),
       |cl AS MATERIALIZED (SELECT doc_id, lang,
       |  array_to_string(list_transform(list_filter(f0, f ->
       |    len(list_filter(string_split(f.txt, ' '), x -> x <> ''))
       |        >= ${HtmlExtract.MinBlockWords}
       |      AND f.anchors * ${HtmlExtract.LinkDensityDen}
       |        < CAST(length(replace(f.txt, ' ', '')) AS BIGINT)
       |          * ${HtmlExtract.LinkDensityNum}),
       |    f -> f.txt), ' ') AS clean
       |  FROM f0),
       |g AS (SELECT doc_id, lang, clean,
       |    CAST(len(${rawToks("clean")}) AS BIGINT) AS n,
       |    CAST(length(regexp_replace(clean, '\\s', '', 'g')) AS BIGINT) AS chars,
       |    CAST(length(clean) - length(replace(clean, '#', '')) AS BIGINT) AS hashes,
       |    CAST((length(clean) - length(replace(clean, '...', ''))) // 3 AS BIGINT) AS dots,
       |    CAST(len(list_filter(${rawToks("clean")}, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha,
       |    CAST(len(list_filter(${rawToks("clean")}, x -> x IN ('the', 'a'))) AS BIGINT) AS stops
       |  FROM cl),
       |ok AS (SELECT doc_id, lang, n AS words, md5(clean) AS fp,
       |    (n >= 50 AND n <= 100000
       |      AND 3 * n <= chars AND chars <= 10 * n
       |      AND 10 * (hashes + dots) < n
       |      AND 10 * alpha >= 8 * n
       |      AND stops >= 2) AS clean_ok
       |  FROM g)""".stripMargin

  private val curationCtes: String =
    s"""$curationTextCtes,
       |$urlSynthCtes,
       |$urlCanonCtes,
       |s1 AS (SELECT ok.*, sch || '://' || hst || pth || qq AS canon
       |  FROM ok JOIN cn USING (doc_id)),
       |s2 AS (SELECT *, clean_ok AND doc_id = min(CASE WHEN clean_ok
       |    THEN doc_id END) OVER (PARTITION BY canon) AS url_ok FROM s1),
       |s3 AS (SELECT *, url_ok AND doc_id = min(CASE WHEN url_ok
       |    THEN doc_id END) OVER (PARTITION BY fp) AS final_ok FROM s2)""".stripMargin

  /** Shared d2 core: blocked exact-Jaccard pair CTEs ending in
    * `j(id_a, id_b, jaccard)` — reused by d2 and d9 (cluster closure). */
  private val d2Ctes: String =
    s"""t AS (SELECT doc_id AS id, lang, source, ${lowSet("text")} AS toks FROM documents),
       |p AS (SELECT a.id AS id_a, b.id AS id_b,
       |    CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) AS inter,
       |    CAST(len(a.toks) + len(b.toks) AS DOUBLE) AS ss
       |  FROM t a JOIN t b ON a.lang = b.lang AND a.source = b.source AND a.id < b.id),
       |j AS (SELECT id_a, id_b,
       |  round(CASE WHEN ss - inter > 0 THEN inter / (ss - inter) ELSE 1.0 END, 4) AS jaccard
       |  FROM p)""".stripMargin

  /** Shared BM25 scoring CTEs (Lucene idf form), ending in
    * `sc(doc_id, n_hits, sc)` with `dt(doc_id, toks)` and `st(n_docs,
    * avgdl)` also visible — ONE text read by t21 (scan-time ranker), t22
    * (index-backed serve), t28 (fusion) and s17 (rerank). Parity across
    * those four depends on the double-fold SQL being bit-identical;
    * factoring it here makes divergence impossible instead of merely
    * unlikely. */
  private def bm25Ctes(termList: String): String =
    s"""dt AS (SELECT doc_id, ${lowSeq("text")} AS toks FROM documents),
       |d2 AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM dt),
       |st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM d2),
       |u AS (SELECT doc_id, dl, unnest(toks) AS tok FROM d2),
       |tf AS (SELECT doc_id, dl, tok, CAST(count(*) AS DOUBLE) AS tf
       |  FROM u WHERE tok IN ($termList) GROUP BY 1, 2, 3),
       |dfq AS (SELECT tok, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
       |  FROM tf GROUP BY 1),
       |sc AS (SELECT doc_id, count(*) AS n_hits,
       |    sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * tf * ($Bm25K1 + 1)
       |      / (tf + $Bm25K1 * (1 - $Bm25B + $Bm25B * dl / avgdl))) AS sc
       |  FROM tf JOIN dfq USING (tok) CROSS JOIN st GROUP BY doc_id)""".stripMargin

  /** Shared RRF fusion CTEs: [[bm25Ctes]] + the sparse/dense rankers and
    * the full-outer fusion, ending in `fu(doc_id, rrf_ppt, rank_s,
    * rank_d)` — reused by t28 and s17 (whose candidate list is t28's
    * fused output verbatim). */
  private def rrfCtes(termList: String): String =
    s"""${bm25Ctes(termList)},
       |top AS (SELECT doc_id,
       |    floor(sc * 1000000 + 0.5) / 1000000 AS score
       |  FROM sc ORDER BY sc DESC, doc_id LIMIT $Bm25TopK),
       |sp AS (SELECT doc_id, row_number()
       |    OVER (ORDER BY score DESC, doc_id) AS rank_s
       |  FROM top QUALIFY rank_s <= $RrfDepth),
       |q AS (SELECT embedding AS qv FROM embeddings
       |  WHERE vec_id = $RrfQueryVec),
       |c AS (SELECT vec_id AS doc_id, embedding AS cv FROM embeddings),
       |ds AS (SELECT doc_id, ${cosChain("qv", "cv")} AS sim
       |  FROM c CROSS JOIN q WHERE doc_id <> $RrfQueryVec),
       |dn AS (SELECT doc_id, row_number()
       |    OVER (ORDER BY sim DESC, doc_id) AS rank_d
       |  FROM ds QUALIFY rank_d <= $RrfDepth),
       |fu AS (SELECT coalesce(sp.doc_id, dn.doc_id) AS doc_id,
       |    coalesce(CAST($PrScale AS BIGINT) // ($RrfK + rank_s), 0)
       |      + coalesce(CAST($PrScale AS BIGINT) // ($RrfK + rank_d), 0)
       |      AS rrf_ppt,
       |    coalesce(rank_s, 0) AS rank_s, coalesce(rank_d, 0) AS rank_d
       |  FROM sp FULL OUTER JOIN dn ON sp.doc_id = dn.doc_id)""".stripMargin

  /** Shared W3 core (interior ∪ boundary gaps, islands-merged) ending in CTE
    * `m(user_id, gap_start, gap_end)` — reused by w3 and w4. */
  private val w3With: String =
    s"""WITH e AS (
       |  SELECT DISTINCT user_id, $hourFloor AS ts FROM events),
       |er AS (SELECT * FROM e WHERE ts BETWEEN $RangeStartMs AND $LastHourMs),
       |l AS (SELECT user_id, ts,
       |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts FROM er),
       |interior AS (
       |  SELECT user_id, prev_ts + $GapIvlMs AS gap_start, ts - $GapIvlMs AS gap_end
       |  FROM l WHERE prev_ts IS NOT NULL AND ts - prev_ts > $GapIvlMs),
       |ext AS (SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts FROM er GROUP BY 1),
       |k AS (SELECT DISTINCT user_id FROM events),
       |j AS (SELECT k.user_id, first_ts, last_ts FROM k LEFT JOIN ext ON k.user_id = ext.user_id),
       |bound AS (
       |  SELECT user_id, CAST($RangeStartMs AS BIGINT) AS gap_start,
       |    coalesce(first_ts - $GapIvlMs, $LastHourMs) AS gap_end
       |  FROM j WHERE first_ts IS NULL OR first_ts > $RangeStartMs
       |  UNION ALL
       |  SELECT user_id, last_ts + $GapIvlMs AS gap_start, CAST($LastHourMs AS BIGINT) AS gap_end
       |  FROM j WHERE last_ts IS NOT NULL AND last_ts < $LastHourMs),
       |gaps AS (
       |  SELECT * FROM interior UNION ALL
       |  SELECT * FROM bound WHERE gap_start <= gap_end),
       |f AS (SELECT user_id, gap_start, gap_end,
       |  max(gap_end) OVER (PARTITION BY user_id ORDER BY gap_start, gap_end
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end FROM gaps),
       |fl AS (SELECT *, CASE WHEN prev_end IS NULL OR gap_start - prev_end >= $MergeWithinMs
       |  THEN 1 ELSE 0 END AS ni FROM f),
       |i AS (SELECT *, sum(ni) OVER (PARTITION BY user_id ORDER BY gap_start, gap_end
       |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM fl),
       |m AS (SELECT user_id, min(gap_start) AS gap_start, max(gap_end) AS gap_end
       |  FROM i GROUP BY user_id, island)""".stripMargin

  // ---- the oracle map ----------------------------------------------------

  /** t14 pocket-perceptron twin, GENERATED from the same epoch count the
    * Spark query trains with ([[QuerySpec.T14Epochs]]) so the two can
    * never drift. Stage e_k computes, in ONE pass over the features, the
    * error count of its input weights w_{k-1} and the updated weights
    * w_k; the pocket pick is the min-error candidate among w_1..w_E
    * (earliest epoch breaks ties, mirroring the strictly-less comparison
    * in [[graft.operators.Perceptron.train]]). All-BIGINT arithmetic —
    * bit-identical to the Spark loop by construction. */
  private def t14Sql: String = {
    val E = T14Epochs
    val xs = (1 to 6).map(j => s"x$j")
    val markerIn = LangMarkers.map(_._2.map(w => s"'$w'").mkString(", "))
    val featCols = markerIn.zipWithIndex.map { case (in, j) =>
      s"CAST(len(list_filter(${rawToks("text")}, x -> x IN ($in))) AS BIGINT) AS x${j + 1}"
    } :+ "CAST(1 AS BIGINT) AS x6"
    // y = +1 iff en's marker count >= every other language's (argmax with
    // en-first priority — exactly langId(text) = 'en')
    val yExpr = "CASE WHEN x1 >= x2 AND x1 >= x3 AND x1 >= x4 AND x1 >= x5 " +
      "THEN 1 ELSE -1 END"
    def stage(k: Int): String = {
      val (prev, from) =
        if (k == 1) (xs.map(_ => "0"), "f")
        else (xs.map(c => s"any_value(w.i_$c) + any_value(w.u_$c)"),
          s"f CROSS JOIN e${k - 1} w")
      // i_* = this stage's input weights w_{k-1}; u_* = the batch update;
      // errs = margin-criterion errors of w_{k-1}
      val iCols = xs.zip(prev).map { case (c, p) => s"$p AS i_$c" }
      val d = if (k == 1) "0"
        else xs.map(c => s"(w.i_$c + w.u_$c) * $c").mkString(" + ")
      val mis = s"y * ($d) <= 0"
      val uCols = xs.map(c =>
        s"CAST(sum(CASE WHEN $mis THEN y * $c ELSE 0 END) AS BIGINT) AS u_$c")
      val errs = s"CAST(sum(CASE WHEN $mis THEN 1 ELSE 0 END) AS BIGINT) AS errs"
      s"e$k AS MATERIALIZED (SELECT\n  ${(iCols ++ (errs +: uCols)).mkString(",\n  ")}\n  FROM $from)"
    }
    // candidate w_k = e_k's input+update = e_{k+1}'s input (i_*); its error
    // count errs_k is computed by stage e_{k+1}
    val cands = (1 to E).map { k =>
      val ws = xs.map(c => s"i_$c AS w_$c").mkString(", ")
      s"SELECT $k AS ep, errs, $ws FROM e${k + 1}"
    }.mkString("\nUNION ALL ")
    val margin = xs.map(c => s"w.w_$c * $c").mkString(" + ")
    s"""WITH f0 AS MATERIALIZED (
       |  SELECT doc_id, ${featCols.mkString(",\n    ")}
       |  FROM documents),
       |f AS MATERIALIZED (SELECT doc_id, $yExpr AS y, ${xs.mkString(", ")} FROM f0),
       |${(1 to (E + 1)).map(stage).mkString(",\n")},
       |cand AS (${cands}),
       |pocket AS (SELECT * FROM cand ORDER BY errs, ep LIMIT 1)
       |SELECT doc_id, $margin AS margin,
       |  CASE WHEN $margin > 0 THEN 1 ELSE -1 END AS pred, y
       |FROM f CROSS JOIN pocket w ORDER BY doc_id""".stripMargin
  }

  /** t33 twin: the t14 generator pattern with (a) the Gopher bundle as
    * the label and integer quality signals as features, (b) training
    * stages scanning ONLY the train split (hash-of-source < 80 — t24's
    * grouped-split predicate, so the two engines cut identically), (c) a
    * held-out per-source confusion census with integer-ppm precision /
    * recall as the output. Same all-BIGINT arithmetic as t14 —
    * bit-identical training by construction. */
  /** t34's generated oracle: the per-domain unigram-LM loss in integer
    * micro-nats, then `DoremiIters` multiplicative-weights rounds as
    * unrolled CTEs. The ONLY float op is one ln per vocab token (floored
    * to micro-nats at the token level, t30's discipline); every round is
    * pure BIGINT floor-division on non-negative values. */
  private def t34Sql: String = {
    def mwRound(t: Int): String = {
      val prev = s"i${t - 1}"
      s"""s$t AS MATERIALIZED (SELECT CAST(sum(w) AS BIGINT) AS sw FROM $prev),
         |a$t AS MATERIALIZED (SELECT lang, loss_micro, w,
         |    (w * 1000000) // (SELECT sw FROM s$t) AS alpha FROM $prev),
         |m$t AS MATERIALIZED (SELECT CAST(sum(alpha * loss_micro) // 1000000 AS BIGINT)
         |    AS ml FROM a$t),
         |e$t AS MATERIALIZED (SELECT lang, loss_micro, w, alpha,
         |    greatest(CAST(0 AS BIGINT),
         |      loss_micro - (SELECT ml FROM m$t)) AS ex FROM a$t),
         |i$t AS MATERIALIZED (SELECT lang, loss_micro,
         |    (w * (1000000 + ($DoremiEtaPpm * ex) // 1000000)) // 1000000
         |      AS w FROM e$t)""".stripMargin
    }
    val outs = (1 to DoremiIters).map(t =>
      s"""SELECT $t AS iter, e.lang, e.loss_micro, e.alpha AS alpha_ppm,
         |  e.ex AS excess_micro, i.w AS w_ppm
         |FROM e$t e JOIN i$t i USING (lang)""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""WITH u AS (SELECT lang, unnest(${rawToks("lower(text)")}) AS tok
       |  FROM documents),
       |dt AS MATERIALIZED (SELECT lang, tok, CAST(count(*) AS BIGINT) AS occ
       |  FROM u GROUP BY 1, 2),
       |lm AS (SELECT tok, CAST(sum(occ) AS BIGINT) AS cnt FROM dt GROUP BY 1),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM lm),
       |nv AS (SELECT tok, CAST(floor(
       |    -ln(CAST(cnt AS DOUBLE) / (SELECT total FROM tot)) * 1000000)
       |    AS BIGINT) AS nll_micro FROM lm),
       |dl AS MATERIALIZED (SELECT lang, CAST(sum(occ * nll_micro) AS BIGINT)
       |    // CAST(sum(occ) AS BIGINT) AS loss_micro
       |  FROM dt JOIN nv USING (tok) GROUP BY 1),
       |i0 AS MATERIALIZED (SELECT lang, loss_micro, CAST(1000000 AS BIGINT) AS w FROM dl),
       |${(1 to DoremiIters).map(mwRound).mkString(",\n")}
       |SELECT CAST(iter AS BIGINT) AS iter, lang, loss_micro, alpha_ppm,
       |  excess_micro, w_ppm
       |FROM ($outs)
       |ORDER BY iter, lang""".stripMargin
  }

  private def t33Sql: String = {
    val E = T14Epochs
    val xs = (1 to 6).map(j => s"x$j")
    def stage(k: Int): String = {
      val (prev, from) =
        if (k == 1) (xs.map(_ => "0"), "ft")
        else (xs.map(c => s"any_value(w.i_$c) + any_value(w.u_$c)"),
          s"ft CROSS JOIN e${k - 1} w")
      val iCols = xs.zip(prev).map { case (c, p) => s"$p AS i_$c" }
      val d = if (k == 1) "0"
        else xs.map(c => s"(w.i_$c + w.u_$c) * $c").mkString(" + ")
      val mis = s"y * ($d) <= 0"
      val uCols = xs.map(c =>
        s"CAST(sum(CASE WHEN $mis THEN y * $c ELSE 0 END) AS BIGINT) AS u_$c")
      val errs =
        s"CAST(sum(CASE WHEN $mis THEN 1 ELSE 0 END) AS BIGINT) AS errs"
      s"e$k AS MATERIALIZED (SELECT\n  ${(iCols ++ (errs +: uCols)).mkString(",\n  ")}\n  FROM $from)"
    }
    val cands = (1 to E).map { k =>
      val ws = xs.map(c => s"i_$c AS w_$c").mkString(", ")
      s"SELECT $k AS ep, errs, $ws FROM e${k + 1}"
    }.mkString("\nUNION ALL ")
    val margin = xs.map(c => s"w.w_$c * $c").mkString(" + ")
    s"""WITH t AS MATERIALIZED (SELECT doc_id, source,
       |    ${md5Hash15("'split:' || source")} % 100 AS h,
       |    CAST(len(${rawToks("text")}) AS BIGINT) AS n,
       |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS chars,
       |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS hashes,
       |    CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS dots,
       |    CAST(len(list_filter(${rawToks("text")}, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha,
       |    CAST(len(list_filter(${rawToks("text")}, x -> x IN ('the', 'a'))) AS BIGINT) AS stops
       |  FROM documents),
       |f AS MATERIALIZED (SELECT doc_id, source, h,
       |    CASE WHEN n >= 50 AND n <= 100000 AND 3 * n <= chars
       |      AND chars <= 10 * n AND 10 * (hashes + dots) < n
       |      AND 10 * alpha >= 8 * n AND stops >= 2 THEN 1 ELSE -1 END AS y,
       |    n AS x1, chars AS x2, hashes + dots AS x3, alpha AS x4,
       |    stops AS x5, CAST(1 AS BIGINT) AS x6
       |  FROM t),
       |ft AS MATERIALIZED (SELECT * FROM f WHERE h < 80),
       |${(1 to (E + 1)).map(stage).mkString(",\n")},
       |cand AS ($cands),
       |pocket AS (SELECT * FROM cand ORDER BY errs, ep LIMIT 1),
       |ev AS (SELECT source, y,
       |    CASE WHEN $margin > 0 THEN 1 ELSE -1 END AS pred
       |  FROM f CROSS JOIN pocket w WHERE h >= 80),
       |agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |    CAST(sum(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(sum(CASE WHEN y = -1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(sum(CASE WHEN y = 1 AND pred = -1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
       |  FROM ev GROUP BY source)
       |SELECT source, n_docs, n_pos, tp, fp, fn,
       |  CASE WHEN tp + fp > 0 THEN tp * 1000000 // (tp + fp) ELSE -1 END AS precision_ppm,
       |  CASE WHEN tp + fn > 0 THEN tp * 1000000 // (tp + fn) ELSE -1 END AS recall_ppm
       |FROM agg ORDER BY source""".stripMargin
  }

  private val raw: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |  ${dsum("l_extendedprice")} AS sum_base_price,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
         |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
         |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
         |  count(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q6_forecast_revenue" ->
      s"""SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         |FROM lineitem
         |WHERE epoch_ms(l_shipdate) >= $Ms1996 AND epoch_ms(l_shipdate) < $Ms1997
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q14_promo_revenue" ->
      s"""SELECT round(100.0 *
         |  CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
         |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE) /
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6) AS promo_revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE epoch_ms(l_shipdate) >= $Ms1996 AND epoch_ms(l_shipdate) < $Ms1997""".stripMargin,

    "q3_shipping_priority" ->
      s"""SELECT o_orderkey, epoch_ms(o_orderdate) AS o_orderdate_ms,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND epoch_ms(o_orderdate) < $Ms1998
         |  AND epoch_ms(l_shipdate) > $Ms1996
         |GROUP BY o_orderkey, o_orderdate_ms
         |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q5_local_supplier" ->
      s"""SELECT n_name,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND epoch_ms(o_orderdate) >= $Ms1996
         |  AND epoch_ms(o_orderdate) < $Ms1997
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q18_large_orders" ->
      s"""WITH big AS (
         |  SELECT l_orderkey,
         |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         |  FROM lineitem GROUP BY 1
         |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 300)
         |SELECT c_custkey, c_name, o_orderkey,
         |  epoch_ms(o_orderdate) AS o_orderdate_ms, o_totalprice, sum_qty
         |FROM orders
         |JOIN big ON o_orderkey = l_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q4_order_priority" ->
      s"""SELECT o_orderpriority, count(*) AS order_count
         |FROM orders
         |WHERE epoch_ms(o_orderdate) >= $Ms1996 AND epoch_ms(o_orderdate) < $Ms1997
         |  AND EXISTS (SELECT 1 FROM lineitem
         |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q8_market_share" ->
      s"""SELECT year(o_orderdate) AS o_year,
         |  floor((coalesce(CAST(sum(CASE WHEN n2.n_name = 'NATION_2'
         |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE), 0.0)
         |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE))
         |    * 1000000.0 + 0.5) / 1000000.0 AS mkt_share
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |JOIN region ON n1.n_regionkey = r_regionkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |WHERE r_name = 'ASIA'
         |  AND epoch_ms(o_orderdate) >= $Ms1996 AND epoch_ms(o_orderdate) < $Ms1998
         |GROUP BY 1 ORDER BY o_year""".stripMargin,

    "q17_small_quantity" ->
      """WITH avgq AS (SELECT l_partkey AS ap_partkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN avgq ON l_partkey = ap_partkey
        |WHERE p_brand = 'Brand#13' AND l_quantity < 0.2 * avg_qty""".stripMargin,

    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey AS s_suppkey,
         |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_rev
         |  FROM lineitem
         |  WHERE epoch_ms(l_shipdate) >= $Ms1996 AND epoch_ms(l_shipdate) < $Ms1997
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, total_rev
         |FROM supplier JOIN rev USING (s_suppkey)
         |WHERE total_rev = (SELECT max(total_rev) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,

    "q13_custdist" ->
      """WITH c_orders AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist FROM c_orders
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "j4_funding_lookup" ->
      s"""WITH hist AS (
         |  SELECT 'S' || CAST(s_suppkey % 30 AS VARCHAR) AS symbol,
         |    $RangeStartMs + s_suppkey * $HourMs AS ts,
         |    CAST('0.00' || lpad(CAST(s_suppkey % 100 AS VARCHAR), 2, '0') AS DOUBLE)
         |      AS funding_rate
         |  FROM supplier),
         |info AS (
         |  SELECT 'S' || CAST(n_nationkey AS VARCHAR) AS symbol,
         |    (n_nationkey % 4 * 2 + 1) * 60 AS mins
         |  FROM nation)
         |SELECT ts,
         |  strftime(make_timestamp(ts * 1000), '%Y-%m-%d %H:%M:%S') AS dt,
         |  7 AS exchange_id, symbol, 1 AS inst_type, funding_rate,
         |  CASE WHEN mins <= 90 THEN 60 WHEN mins <= 150 THEN 120
         |       WHEN mins <= 210 THEN 180 WHEN mins <= 300 THEN 240
         |       WHEN mins <= 420 THEN 360 WHEN mins <= 600 THEN 480
         |       ELSE 720 END AS funding_interval,
         |  CAST('0.02' AS DOUBLE) AS adjusted_cap,
         |  CAST('-0.02' AS DOUBLE) AS adjusted_floor
         |FROM hist JOIN info USING (symbol)
         |ORDER BY symbol, ts""".stripMargin,

    "j7_scalar_lookup" ->
      """SELECT o_orderkey, o_custkey, epoch_ms(o_orderdate) AS o_orderdate_ms, o_totalprice
        |FROM orders
        |WHERE o_custkey = (SELECT c_custkey FROM customer
        |                   ORDER BY c_acctbal DESC, c_custkey LIMIT 1)
        |ORDER BY o_orderkey""".stripMargin,

    "p4_unit_normalize" ->
      """WITH s AS (SELECT event_id, (epoch_ms(ts)//1000)*1000 AS ts_norm_ms FROM events)
        |SELECT event_id, ts_norm_ms,
        |  strftime(make_timestamp(ts_norm_ms * 1000), '%Y-%m-%d %H:%M:%S') AS dt
        |FROM s ORDER BY event_id""".stripMargin,

    "p7_decimal_str" ->
      """WITH s AS (SELECT p_size % 9 AS p FROM part)
        |SELECT CASE WHEN p <= 0 THEN '1'
        |            ELSE '0.' || repeat('0', p - 1) || '1' END AS tick,
        |  count(*) AS n
        |FROM s GROUP BY 1 ORDER BY tick""".stripMargin,

    "p9_canonical_map" -> {
      val codes = P9Codes.map(c => s"'$c'").mkString("[", ", ", "]")
      val cases = graft.functions.Funcs.krakenAssetMap.toSeq.sorted
        .map { case (k, v) => s"WHEN '$k' THEN '$v'" }.mkString(" ")
      s"""WITH c AS (SELECT $codes[CAST(c_custkey % ${P9Codes.size} AS INT) + 1] AS code
         |  FROM customer)
         |SELECT CASE code $cases ELSE code END AS asset, count(*) AS n
         |FROM c GROUP BY 1 ORDER BY asset""".stripMargin
    },

    "p10_ratio_split" ->
      """SELECT event_id, value AS r,
        |  round(value / (value + 1), 6) AS long_ratio,
        |  round(1 - value / (value + 1), 6) AS short_ratio
        |FROM events WHERE value >= 0 ORDER BY event_id""".stripMargin,

    "p11_interval_snap" ->
      """WITH m AS (SELECT abs(CAST(trunc(value * 10) AS BIGINT)) % 800 AS minutes FROM events)
        |SELECT CASE WHEN minutes <= 90 THEN 60 WHEN minutes <= 150 THEN 120
        |            WHEN minutes <= 210 THEN 180 WHEN minutes <= 300 THEN 240
        |            WHEN minutes <= 420 THEN 360 WHEN minutes <= 600 THEN 480
        |            ELSE 720 END AS bucket,
        |  count(*) AS n
        |FROM m GROUP BY 1 ORDER BY bucket""".stripMargin,

    "p14_tag_fallback" ->
      """WITH e AS (SELECT CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k FROM events)
        |SELECT coalesce(CASE WHEN k % 2 = 0 THEN k END,
        |                CASE WHEN k % 3 = 0 THEN k + 100 END,
        |                -1) AS tag,
        |  count(*) AS n
        |FROM e GROUP BY 1 ORDER BY tag""".stripMargin,

    "p15_aes_roundtrip" ->
      // decrypt(encrypt(text)) must be the identity — the oracle IS the
      // original column (non-SQL crypto verified by round-trip)
      """SELECT doc_id, text AS decrypted FROM documents ORDER BY doc_id""",

    "p17_threshold_filter" -> {
      val cases = P17Rules.map { case (p, t) =>
        s"WHEN event_type LIKE '$p%' THEN $t"
      }.mkString(" ")
      s"""WITH e AS (SELECT event_type, CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k
         |  FROM events),
         |f AS (SELECT * FROM e WHERE k >= CASE $cases ELSE $P17Default END)
         |SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS k_sum
         |FROM f GROUP BY 1 ORDER BY event_type""".stripMargin
    },

    "q9_product_profit" ->
      s"""SELECT n_name AS nation, year(o_orderdate) AS o_year,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
         |    - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE contains(p_name, 'red')
         |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "s4_centroids" -> {
      val dims = (0 until EmbeddingDim).map(i =>
        s"round(CAST(sum(CAST(CAST(embedding[${i + 1}] AS DOUBLE) AS DECIMAL(27,9))) AS DOUBLE) / count(*), 6) AS c$i")
        .mkString(",\n  ")
      s"""SELECT label, count(*) AS n,
         |  $dims
         |FROM embeddings GROUP BY label ORDER BY label""".stripMargin
    },

    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND epoch_ms(o_orderdate) >= $Ms1996
         |  AND epoch_ms(o_orderdate) < $Ms1997
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q2_min_cost_supplier" ->
      """WITH offers AS (
        |  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS supp_cost
        |  FROM lineitem GROUP BY 1, 2),
        |best AS (SELECT l_partkey, min(supp_cost) AS min_cost
        |  FROM offers GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supp_cost
        |FROM offers
        |JOIN best USING (l_partkey)
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE supp_cost = min_cost AND p_size <= 15 AND p_type = 'LARGE'
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "q11_important_value" ->
      """WITH pv AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS part_value
        |  FROM lineitem GROUP BY 1)
        |SELECT l_partkey, part_value FROM pv
        |WHERE part_value >
        |  (SELECT CAST(sum(CAST(part_value AS DECIMAL(27,2))) AS DOUBLE) / count(*) * 1.6 FROM pv)
        |ORDER BY part_value DESC, l_partkey""".stripMargin,

    "q12_priority_split" ->
      s"""SELECT l_linestatus,
         |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE epoch_ms(l_shipdate) >= $Ms1996
         |  AND epoch_ms(l_shipdate) < $Ms1997
         |GROUP BY 1 ORDER BY l_linestatus""".stripMargin,

    "q16_supplier_count" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#13' AND p_size <= 25
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q19_disjunctive_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q20_promotion_suppliers" ->
      s"""WITH supply AS (
         |  SELECT l_partkey, l_suppkey,
         |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
         |    CAST(sum(CAST(CASE WHEN epoch_ms(l_shipdate) >= $Ms1996
         |        AND epoch_ms(l_shipdate) < $Ms1997
         |      THEN l_quantity ELSE 0 END AS DECIMAL(18,2))) AS DOUBLE) AS qty_1996
         |  FROM lineitem
         |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'large%')
         |  GROUP BY 1, 2)
         |SELECT s_name, s_acctbal
         |FROM supplier
         |WHERE s_nationkey IN
         |    (SELECT n_nationkey FROM nation WHERE n_name IN ('NATION_3', 'NATION_7'))
         |  AND s_suppkey IN
         |    (SELECT l_suppkey FROM supply WHERE total_qty > 2 * qty_1996)
         |ORDER BY s_name""".stripMargin,

    "q21_waiting_supplier" ->
      """WITH prof AS (
        |  SELECT l_orderkey AS o_orderkey,
        |    count(DISTINCT l_suppkey) AS n_supp,
        |    count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_ret_supp
        |  FROM lineitem GROUP BY 1),
        |ret AS (
        |  SELECT DISTINCT l_orderkey AS o_orderkey, l_suppkey
        |  FROM lineitem WHERE l_returnflag = 'R')
        |SELECT s_name, count(*) AS numwait
        |FROM ret
        |JOIN orders USING (o_orderkey)
        |JOIN prof USING (o_orderkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE o_orderstatus = 'F' AND n_supp > 1 AND n_ret_supp = 1
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,

    "q22_idle_customers" ->
      """SELECT substr(c_name, 17, 2) AS code, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (
        |    SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |    FROM customer WHERE c_acctbal > 0)
        |  AND c_custkey NOT IN
        |    (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY code""".stripMargin,

    "q7_trade_flows" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  year(l_shipdate) AS l_year,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE n1.n_name IN ('NATION_1', 'NATION_2')
         |  AND n2.n_name IN ('NATION_1', 'NATION_2')
         |  AND n1.n_name <> n2.n_name
         |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "x1_asof_join" ->
      s"""WITH ev AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events),
         |hourly AS (SELECT user_id, $hourFloor AS ts_ms,
         |    ${dsum("value")} AS hour_sum, count(*) AS hour_n
         |  FROM events GROUP BY 1, 2)
         |SELECT e.event_id, e.user_id, e.ts_ms, h.hour_sum, h.hour_n
         |FROM ev e ASOF LEFT JOIN hourly h
         |  ON e.user_id = h.user_id AND e.ts_ms >= h.ts_ms
         |ORDER BY event_id""".stripMargin,

    // x3: sessions from the same gaps-and-islands rule, the overlap as a
    // plain theta join (the oracle can afford it; exactly-once is the
    // engine's burden)
    "x3_overlap_join" -> {
      val vals = X3Campaigns
        .map { case (i, lo, hi) => s"($i, $lo, $hi)" }.mkString(", ")
      s"""WITH e AS (SELECT user_id, epoch_ms(ts) AS ts, event_id
         |  FROM events),
         |l AS (SELECT user_id, ts, event_id,
         |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) > $X3SessionGapMs
         |      THEN 1 ELSE 0 END AS brk
         |  FROM e),
         |si AS (SELECT user_id, ts,
         |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM l),
         |c AS (SELECT user_id, sid, min(ts) AS s_lo, max(ts) AS s_hi
         |  FROM si GROUP BY 1, 2),
         |camp(campaign_id, c_lo, c_hi) AS (VALUES $vals),
         |j AS (SELECT campaign_id, user_id, s_lo, s_hi, c_lo, c_hi
         |  FROM c JOIN camp ON s_lo <= c_hi AND c_lo <= s_hi)
         |SELECT CAST(campaign_id AS BIGINT) AS campaign_id,
         |  CAST(count(*) AS BIGINT) AS n_sessions,
         |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
         |  CAST(sum(least(s_hi, c_hi) - greatest(s_lo, c_lo)) AS BIGINT)
         |    AS overlap_ms
         |FROM j GROUP BY 1 ORDER BY campaign_id""".stripMargin
    },

    "x2_range_join" ->
      """WITH bands(band_id, lo, hi) AS (VALUES
        |  (0, 0, 25000), (1, 20000, 60000), (2, 50000, 90000), (3, 85000, 110000))
        |SELECT band_id, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
        |FROM lineitem JOIN bands ON l_extendedprice BETWEEN lo AND hi
        |GROUP BY 1 ORDER BY band_id""".stripMargin,

    "a1_watermark_max" ->
      """SELECT user_id, event_type, max(epoch_ms(ts)) AS max_ts_ms, count(*) AS n
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,

    "a2_integrity_hours" ->
      s"""WITH counts AS (
         |  SELECT event_type, $hourFloor AS hour_ms, count(*) AS n
         |  FROM events GROUP BY 1, 2),
         |hours AS (SELECT unnest(generate_series($RangeStartMs, $LastHourMs, $HourMs)) AS hour_ms),
         |types AS (SELECT DISTINCT event_type FROM events)
         |SELECT t.event_type, h.hour_ms, coalesce(c.n, 0) AS n,
         |  CASE WHEN coalesce(c.n, 0) = 0 THEN 'EMPTY'
         |       WHEN coalesce(c.n, 0) < $PartialThreshold THEN 'PARTIAL'
         |       ELSE 'OK' END AS status
         |FROM types t CROSS JOIN hours h
         |LEFT JOIN counts c ON c.event_type = t.event_type AND c.hour_ms = h.hour_ms
         |ORDER BY t.event_type, h.hour_ms""".stripMargin,

    "a3_latest_per_user" ->
      """WITH r AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_id, ts_ms, event_type, value FROM r WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    "a9_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_exact,
        |  abs(approx_count_distinct(user_id) - count(DISTINCT user_id)) * 1.0
        |    / count(DISTINCT user_id) < 0.1 AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "a14_retention" ->
      s"""WITH ev AS (SELECT DISTINCT user_id,
         |    (epoch_ms(ts) - $RangeStartMs) // ${24L * HourMs} AS day
         |  FROM events),
         |f AS (SELECT user_id,
         |    min((epoch_ms(ts) - $RangeStartMs) // ${24L * HourMs})
         |      AS cohort_day
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
         |SELECT cohort_day, day - cohort_day AS day_offset,
         |  count(DISTINCT user_id) AS n_users
         |FROM ev JOIN f USING (user_id)
         |WHERE day >= cohort_day
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // A18: generated-oracle pattern (t14/t18) — the PrIters PageRank
    // rounds unroll as CTEs from the same constants; all-integer floor
    // division, so round 8 matches Spark bit-for-bit.
    "a18_pagerank" -> {
      val rounds = (1 to PrIters).map { i =>
        s"""c$i AS MATERIALIZED (SELECT e.dst AS tok,
           |    CAST(sum((e.w * p.r) // ow.wout) AS BIGINT) AS sc
           |  FROM e JOIN ow USING (src) JOIN r${i - 1} p ON p.tok = e.src
           |  GROUP BY 1),
           |r$i AS MATERIALIZED (SELECT nodes.tok,
           |    (15 * ($PrScale // n)) // 100
           |      + (85 * coalesce(sc, 0)) // 100 AS r
           |  FROM nodes CROSS JOIN nn LEFT JOIN c$i USING (tok))"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH t AS (SELECT ${lowSeq("text")} AS toks FROM documents),
         |b0 AS (SELECT [{'src': toks[i], 'dst': toks[i+1]}
         |    for i in range(1, len(toks))] AS bs
         |  FROM t WHERE len(toks) >= 2),
         |bi AS (SELECT unnest(bs, recursive:=true) FROM b0),
         |e AS MATERIALIZED (SELECT src, dst, count(*) AS w FROM bi GROUP BY 1, 2),
         |ow AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS wout
         |  FROM e GROUP BY 1),
         |nodes AS MATERIALIZED (SELECT src AS tok FROM e UNION SELECT dst FROM e),
         |nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
         |r0 AS MATERIALIZED (SELECT tok, $PrScale // n AS r FROM nodes CROSS JOIN nn),
         |$rounds
         |SELECT tok, r AS rank_ppt FROM r$PrIters
         |ORDER BY rank_ppt DESC, tok""".stripMargin
    },

    // A16: identical (1 FOLLOWING, UNBOUNDED) conditional-min frame; the
    // sum() arithmetic is all-integer so no float drift is possible.
    "a16_seq_convert" ->
      s"""WITH e AS (SELECT user_id, event_id,
         |    epoch_ns(ts) // 1000000 AS ts_ms, event_type FROM events),
         |w AS (SELECT *, min(CASE WHEN event_type = '$SeqEventB'
         |      THEN ts_ms END) OVER (PARTITION BY user_id
         |      ORDER BY ts_ms, event_id
         |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_b
         |  FROM e),
         |a AS (SELECT user_id, ts_ms, next_b,
         |    next_b IS NOT NULL AND next_b - ts_ms <= $SeqWithinMs AS conv
         |  FROM w WHERE event_type = '$SeqEventA')
         |SELECT user_id, count(*) AS n_a,
         |  CAST(sum(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT) AS n_conv,
         |  coalesce(min(CASE WHEN conv THEN next_b - ts_ms END), -1)
         |    AS min_latency_ms,
         |  CAST(sum(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT)
         |    * 1000000 // count(*) AS conv_ppm
         |FROM a GROUP BY user_id ORDER BY user_id""".stripMargin,

    // A15: the portable md5 hash (value of first 15 hex chars, seeded per
    // sketch row) reproduces every CMS bucket exactly — sketch and
    // estimates are deterministic across engines.
    "a15_cms" -> {
      def hex15(e: String) = (1 to 15).map { i =>
        val w = math.pow(16, 15 - i).toLong
        s"(strpos('0123456789abcdef', substr(md5($e), $i, 1)) - 1) * $w"
      }.mkString(" + ")
      def bucket(r: Int) = s"((${hex15(s"'$r:' || tok")})) % $CmsWidth"
      val rowsCte = (0 until CmsDepth).map { r =>
        s"SELECT $r AS rw, ${bucket(r)} AS bucket FROM u" }
        .mkString("\nUNION ALL\n")
      val probeCte = (0 until CmsDepth).map { r =>
        s"SELECT tok, exact_n, $r AS rw, ${bucket(r)} AS bucket FROM top" }
        .mkString("\nUNION ALL\n")
      s"""WITH t AS (SELECT ${lowSeq("text")} AS toks FROM documents),
         |u AS (SELECT unnest(toks) AS tok FROM t),
         |sk AS (SELECT rw, bucket, count(*) AS cnt FROM (
         |$rowsCte
         |) GROUP BY 1, 2),
         |top AS (SELECT tok, count(*) AS exact_n FROM u
         |  GROUP BY 1 ORDER BY exact_n DESC, tok LIMIT $CmsTopN),
         |pr AS (
         |$probeCte
         |)
         |SELECT pr.tok, pr.exact_n, min(sk.cnt) AS cms_n,
         |  min(sk.cnt) - pr.exact_n AS over_n
         |FROM pr JOIN sk USING (rw, bucket)
         |GROUP BY 1, 2 ORDER BY exact_n DESC, tok""".stripMargin
    },

    "a13_approx_quantiles" ->
      """SELECT event_type,
        |  quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.95) AS p95,
        |  approx_quantile(value, 0.5)
        |    BETWEEN quantile_cont(value, 0.4) AND quantile_cont(value, 0.6)
        |    AS approx50_ok,
        |  approx_quantile(value, 0.95)
        |    BETWEEN quantile_cont(value, 0.9) AND max(value)
        |    AS approx95_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "w6_session_windows" ->
      s"""WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms, value FROM events),
         |l AS (SELECT *, lag(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms) AS prev
         |  FROM e),
         |f AS (SELECT *, CASE WHEN prev IS NULL OR ts_ms - prev >= 1800000
         |  THEN 1 ELSE 0 END AS ns FROM l),
         |i AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts_ms
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess FROM f)
         |SELECT user_id, min(ts_ms) AS session_start_ms, count(*) AS n,
         |  ${dsum("value")} AS value_sum
         |FROM i GROUP BY user_id, sess
         |ORDER BY user_id, session_start_ms""".stripMargin,

    "a8_rollup" ->
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
         |  coalesce(o_orderpriority, 'ALL') AS priority,
         |  count(*) AS n, ${dsum("o_totalprice")} AS total
         |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         |ORDER BY status, priority""".stripMargin,

    "a10_cube" ->
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
         |  coalesce(o_orderpriority, 'ALL') AS priority,
         |  count(*) AS n, ${dsum("o_totalprice")} AS total
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY status, priority""".stripMargin,

    "w7_ranks" ->
      """SELECT lang, doc_id, n_chars,
        |  CAST(rank() OVER wt AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER wt AS BIGINT) AS drnk,
        |  CAST(ntile(4) OVER wf AS BIGINT) AS quartile
        |FROM documents
        |WINDOW wt AS (PARTITION BY lang ORDER BY n_chars DESC),
        |       wf AS (PARTITION BY lang ORDER BY n_chars DESC, doc_id)
        |ORDER BY lang, doc_id""".stripMargin,

    "a11_dispersion" ->
      """WITH s AS (SELECT user_id, count(*) AS n,
        |  sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS sx,
        |  sum(CAST(round(value, 6) AS DECIMAL(18,6)) * CAST(round(value, 6) AS DECIMAL(18,6))) AS sxx
        |FROM events GROUP BY user_id)
        |SELECT user_id, n,
        |  round(CAST(sx AS DOUBLE) / n, 6) AS mean,
        |  round((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1), 6) AS variance,
        |  round(sqrt(greatest(round((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1), 6), 0.0)), 6) AS stddev
        |FROM s ORDER BY user_id""".stripMargin,

    "a12_correlation" ->
      """WITH s AS (SELECT user_id, count(*) AS n,
        |  sum(CAST(round(value, 6) AS DECIMAL(18,6))) AS sx,
        |  sum(CAST(event_id % 97 AS DECIMAL(18,0))) AS sy,
        |  sum(CAST(round(value, 6) AS DECIMAL(18,6)) * CAST(round(value, 6) AS DECIMAL(18,6))) AS sxx,
        |  sum(CAST(event_id % 97 AS DECIMAL(18,0)) * CAST(event_id % 97 AS DECIMAL(18,0))) AS syy,
        |  sum(CAST(round(value, 6) AS DECIMAL(18,6)) * CAST(event_id % 97 AS DECIMAL(18,0))) AS sxy
        |FROM events GROUP BY user_id)
        |SELECT user_id, n,
        |  round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (n * (n - 1)), 6) AS covariance,
        |  round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |     * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS correlation
        |FROM s ORDER BY user_id""".stripMargin,

    // w9: replay of the streaming watermark algebra. Batch assignment
    // mirrors the query's delivery plan; the watermark BEFORE batch b is
    // the max event time (ms floor of the µs clock — Spark tracks event
    // time stats in ms) over ALL rows of earlier batches minus the 2 h
    // delay (dropped late rows still advance it — the stats collect
    // upstream of the stateful aggregation); a late row is dropped when
    // its window END is at or under that watermark; append mode emits a
    // window once the FINAL watermark is at or past its end.
    // w14: closed-form replay of the flatMapGroupsWithState cursor —
    // per-(user, delivery) aggregates, then running totals over delivery
    // order; one snapshot row per active user per delivery.
    "w14_stateful_cursor" ->
      s"""WITH e AS (SELECT event_id, user_id,
         |    epoch_ns(ts) // 1000 AS us,
         |    epoch_ns(ts) // 1000000 - $RangeStartMs AS rel_ms
         |  FROM events),
         |b AS (SELECT *,
         |    least(CASE WHEN rel_ms < ${10 * 86400000L} THEN 0
         |               WHEN rel_ms < ${20 * 86400000L} THEN 1 ELSE 2 END
         |      + CASE WHEN event_id % 11 = 0 THEN 1 ELSE 0 END, 2) AS batch
         |  FROM e),
         |g AS (SELECT user_id, batch, count(*) AS n_batch, max(us) AS mx
         |  FROM b GROUP BY 1, 2),
         |r AS (SELECT user_id, n_batch,
         |    CAST(sum(n_batch) OVER w AS BIGINT) AS n_total,
         |    max(mx) OVER w AS max_ts_us
         |  FROM g WINDOW w AS (PARTITION BY user_id ORDER BY batch))
         |SELECT user_id, n_batch, n_total, max_ts_us FROM r
         |ORDER BY user_id, n_total""".stripMargin,

    "w9_stream_windows" ->
      s"""WITH e AS (SELECT event_id, ts, value,
         |    epoch_ns(ts) // 1000 AS us,
         |    epoch_ns(ts) // 1000000 - $RangeStartMs AS rel_ms
         |  FROM events),
         |b AS (SELECT *,
         |    least(CASE WHEN rel_ms < ${10 * 86400000L} THEN 0
         |               WHEN rel_ms < ${20 * 86400000L} THEN 1 ELSE 2 END
         |      + CASE WHEN event_id % 11 = 0 THEN 1 ELSE 0 END, 2) AS batch,
         |    (us // 86400000000) * 86400000 AS win_start
         |  FROM e),
         |w AS (SELECT *, (win_start + 86400000) * 1000 AS win_end_us FROM b),
         |wm AS (SELECT
         |    max(CASE WHEN batch = 0 THEN us END) // 1000 - 7200000 AS wm1,
         |    max(CASE WHEN batch <= 1 THEN us END) // 1000 - 7200000 AS wm2,
         |    max(us) // 1000 - 7200000 AS wmf
         |  FROM w),
         |kept AS (SELECT w.* FROM w CROSS JOIN wm
         |  WHERE batch = 0
         |     OR (batch = 1 AND win_end_us > wm1 * 1000)
         |     OR (batch = 2 AND win_end_us > wm2 * 1000))
         |SELECT win_start, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         |FROM kept
         |GROUP BY 1
         |HAVING (win_start + 86400000) * 1000 <= (SELECT wmf * 1000 FROM wm)
         |ORDER BY win_start""".stripMargin,

    // w11: streaming-dedup state-TTL replay. Deliveries = originals
    // (w9-displaced), same-batch copies (%5), next-batch verbatim copies
    // (%3, provably dropped whether on time — live state — or late), and
    // +25-day re-occurrences of decade-0 %13 keys (state expired → kept
    // again). Closed form: non-late deliveries grouped by (key, us) —
    // copies collapse into their originals, re-occurrences survive.
    "w11_stream_dedup" ->
      s"""WITH e AS (SELECT event_id, value,
         |    epoch_ns(ts) // 1000 AS us,
         |    epoch_ns(ts) // 1000000 - $RangeStartMs AS rel_ms
         |  FROM events),
         |b0 AS (SELECT *,
         |    CASE WHEN rel_ms < ${10 * 86400000L} THEN 0
         |         WHEN rel_ms < ${20 * 86400000L} THEN 1 ELSE 2 END AS base
         |  FROM e),
         |b AS (SELECT *,
         |    least(base + CASE WHEN event_id % 11 = 0 THEN 1 ELSE 0 END,
         |      2) AS batch
         |  FROM b0),
         |del AS (
         |  SELECT event_id, us, value, batch FROM b
         |  UNION ALL SELECT event_id, us, value, batch FROM b
         |    WHERE event_id % 5 = 0
         |  UNION ALL SELECT event_id, us, value, batch + 1 FROM b
         |    WHERE event_id % 3 = 0 AND event_id % 11 <> 0 AND batch < 2
         |  UNION ALL SELECT event_id, us + ${25L * 86400000L * 1000L}, value, 2
         |    FROM b
         |    WHERE base = 0 AND event_id % 13 = 0 AND event_id % 11 <> 0),
         |wm AS (SELECT
         |    max(CASE WHEN batch = 0 THEN us END) // 1000 - 7200000 AS wm1,
         |    max(CASE WHEN batch <= 1 THEN us END) // 1000 - 7200000 AS wm2
         |  FROM del)
         |SELECT event_id, us AS ts_us, value FROM del CROSS JOIN wm
         |WHERE batch = 0 OR (batch = 1 AND us > wm1 * 1000)
         |   OR (batch = 2 AND us > wm2 * 1000)
         |GROUP BY 1, 2, 3
         |ORDER BY event_id, ts_us""".stripMargin,

    // w12: stream-stream interval-join replay. Displaced rows (%11 rows
    // from days [0,13) redelivered one batch late, ≥ 2 days − 2 h under
    // wm1) are dropped pre-join on either side; for on-time rows delay
    // (2h) > interval (30min) proves buffered state is alive for every
    // feasible cross-batch match — so the replay is a plain interval
    // join over non-displaced rows.
    "w12_stream_join" ->
      s"""WITH e AS (SELECT event_id, user_id,
         |    epoch_ns(ts) // 1000 AS us,
         |    epoch_ns(ts) // 1000000 - $RangeStartMs AS rel_ms
         |  FROM events),
         |k AS (SELECT * FROM e
         |  WHERE NOT (rel_ms < ${13 * 86400000L} AND event_id % 11 = 0)),
         |a AS (SELECT event_id AS a_id, user_id, us AS us_a FROM k
         |  WHERE event_id % 2 = 0),
         |b AS (SELECT event_id AS b_id, user_id, us AS us_b FROM k
         |  WHERE event_id % 2 = 1)
         |SELECT user_id, a_id, b_id, us_a, us_b
         |FROM a JOIN b USING (user_id)
         |WHERE us_b BETWEEN us_a - ${30 * 60000000L} AND us_a + ${30 * 60000000L}
         |ORDER BY user_id, a_id, b_id""".stripMargin,

    // w17: open/close replayed through rank-1 rows over the same
    // (ts, event_id) total order the engine's struct min/max encodes;
    // volume in integer micro-units
    "w17_ohlcv_candles" ->
      s"""WITH e AS (SELECT event_type AS series, event_id,
         |    epoch_ns(ts) // 1000000 AS ts_ms, value FROM events),
         |h AS (SELECT series, event_id, ts_ms, value,
         |    ts_ms // $HourMs * $HourMs AS hour_ms FROM e),
         |r AS (SELECT *,
         |    row_number() OVER (PARTITION BY series, hour_ms
         |      ORDER BY ts_ms, event_id) AS rna,
         |    row_number() OVER (PARTITION BY series, hour_ms
         |      ORDER BY ts_ms DESC, event_id DESC) AS rnd
         |  FROM h)
         |SELECT series, CAST(hour_ms AS BIGINT) AS hour_ms,
         |  max(CASE WHEN rna = 1 THEN value END) AS open,
         |  max(CASE WHEN rnd = 1 THEN value END) AS close,
         |  max(value) AS high, min(value) AS low,
         |  CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
         |    AS volume_micro,
         |  CAST(count(*) AS BIGINT) AS n_trades
         |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // w18: the oracle computes day candles DIRECTLY from raw ticks; the
    // engine cascades 1m -> 1h -> 1d — hash equality proves the candle
    // merge associative (cascade == direct).
    "w18_candle_cascade" ->
      s"""WITH e AS (SELECT event_type AS series, event_id,
         |    epoch_ns(ts) // 1000000 AS ts_ms, value FROM events),
         |h AS (SELECT series, event_id, ts_ms, value,
         |    ts_ms // $DayMs * $DayMs AS day_ms FROM e),
         |r AS (SELECT *,
         |    row_number() OVER (PARTITION BY series, day_ms
         |      ORDER BY ts_ms, event_id) AS rna,
         |    row_number() OVER (PARTITION BY series, day_ms
         |      ORDER BY ts_ms DESC, event_id DESC) AS rnd
         |  FROM h)
         |SELECT series, CAST(day_ms AS BIGINT) AS day_ms,
         |  max(CASE WHEN rna = 1 THEN value END) AS open,
         |  max(CASE WHEN rnd = 1 THEN value END) AS close,
         |  max(value) AS high, min(value) AS low,
         |  CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
         |    AS volume_micro,
         |  CAST(count(*) AS BIGINT) AS n_trades
         |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // w19: streaming ingest ≡ batch rollup — the oracle is w17's 1h SQL
    // verbatim (hour candles straight from raw events); the engine's
    // store of per-batch partials must merge to the identical answer
    "w19_stream_candles" ->
      s"""WITH e AS (SELECT event_type AS series, event_id,
         |    epoch_ns(ts) // 1000000 AS ts_ms, value FROM events),
         |h AS (SELECT series, event_id, ts_ms, value,
         |    ts_ms // $HourMs * $HourMs AS hour_ms FROM e),
         |r AS (SELECT *,
         |    row_number() OVER (PARTITION BY series, hour_ms
         |      ORDER BY ts_ms, event_id) AS rna,
         |    row_number() OVER (PARTITION BY series, hour_ms
         |      ORDER BY ts_ms DESC, event_id DESC) AS rnd
         |  FROM h)
         |SELECT series, CAST(hour_ms AS BIGINT) AS hour_ms,
         |  max(CASE WHEN rna = 1 THEN value END) AS open,
         |  max(CASE WHEN rnd = 1 THEN value END) AS close,
         |  max(value) AS high, min(value) AS low,
         |  CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
         |    AS volume_micro,
         |  CAST(count(*) AS BIGINT) AS n_trades
         |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "w13_scd2" ->
      s"""WITH e AS (SELECT user_id, event_id,
         |    epoch_ns(ts) // 1000000 AS ts_ms, event_type FROM events),
         |ch AS (SELECT *, lag(event_type) OVER
         |    (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev
         |  FROM e),
         |f AS (SELECT user_id, event_id, ts_ms, event_type FROM ch
         |  WHERE prev IS NULL OR prev <> event_type),
         |v AS (SELECT user_id, event_type AS state, ts_ms,
         |    row_number() OVER w AS version, lead(ts_ms) OVER w AS nxt
         |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id))
         |SELECT user_id, version, state, ts_ms AS valid_from_ms,
         |  coalesce(nxt, $RangeEndMs) AS valid_to_ms,
         |  nxt IS NULL AS is_current
         |FROM v ORDER BY user_id, version""".stripMargin,

    // w10: session-window watermark replay. Only first-decade rows are
    // displaced (by two batches), so every late row's provisional session
    // end sits far under the pre-batch watermark (all dropped) and no
    // kept row can merge into an emitted-and-evicted session — the global
    // per-user session merge over kept rows IS the state machine's result
    // (see the w10 scaladoc for the delay+gap argument).
    "w10_stream_sessions" ->
      s"""WITH e AS (SELECT event_id, user_id, value,
         |    epoch_ns(ts) // 1000 AS us,
         |    epoch_ns(ts) // 1000000 - $RangeStartMs AS rel_ms
         |  FROM events),
         |b AS (SELECT *,
         |    CASE WHEN rel_ms < ${10 * 86400000L} AND event_id % 11 = 0 THEN 2
         |         WHEN rel_ms < ${10 * 86400000L} THEN 0
         |         WHEN rel_ms < ${20 * 86400000L} THEN 1 ELSE 2 END AS batch
         |  FROM e),
         |wm AS (SELECT
         |    max(CASE WHEN batch = 0 THEN us END) // 1000 - 7200000 AS wm1,
         |    max(CASE WHEN batch <= 1 THEN us END) // 1000 - 7200000 AS wm2,
         |    max(us) // 1000 - 7200000 AS wmf
         |  FROM b),
         |kept AS (SELECT b.* FROM b CROSS JOIN wm
         |  WHERE batch = 0
         |     OR (batch = 1 AND us + ${86400000000L} > wm1 * 1000)
         |     OR (batch = 2 AND us + ${86400000000L} > wm2 * 1000)),
         |s1 AS (SELECT *,
         |    CASE WHEN lag(us) OVER w IS NULL
         |           OR us - lag(us) OVER w >= ${86400000000L} THEN 1 ELSE 0
         |    END AS brk
         |  FROM kept
         |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
         |s2 AS (SELECT *,
         |    sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id) AS sid
         |  FROM s1)
         |SELECT user_id,
         |  min(us) // 1000 AS sess_start,
         |  (max(us) + ${86400000000L}) // 1000 AS sess_end,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         |FROM s2
         |GROUP BY user_id, sid
         |HAVING max(us) + ${86400000000L} <= (SELECT wmf * 1000 FROM wm)
         |ORDER BY user_id, sess_start""".stripMargin,

    "w8_frame_edges" ->
      """SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value,
        |  lead(value, 1) OVER wt AS next_value,
        |  first_value(value) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_value,
        |  last_value(value) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_value,
        |  round(percent_rank() OVER (PARTITION BY user_id ORDER BY value), 6) AS value_pct
        |FROM events
        |WINDOW wt AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
        |ORDER BY event_id""".stripMargin,

    "w5_rolling_stats" ->
      ("""SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
        |  round(avg(value) OVER (PARTITION BY user_id
        |    ORDER BY epoch_ms(ts), event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mavg3,
        |  count(*) OVER (PARTITION BY user_id
        |    ORDER BY epoch_ms(ts), event_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS nwin
        |FROM events ORDER BY event_id""".stripMargin),

    // w15: grid resample + interpolation. Means are integer floor-divs
    // over micro-unit sums (non-negative — the div/floor seam is closed
    // by domain); the interpolation expression is the same fixed IEEE
    // tree over exact integer inputs on both engines.
    "w15_interpolate" -> {
      val gridHours = (RangeEndMs - RangeStartMs) / HourMs
      s"""WITH obs AS (SELECT event_type,
         |    (epoch_ms(ts) - $RangeStartMs) // $HourMs AS h,
         |    CAST(count(*) AS BIGINT) AS n_obs,
         |    CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
         |      // count(*) AS BIGINT) AS m
         |  FROM events GROUP BY 1, 2),
         |grid AS (SELECT event_type, unnest(range(0, $gridHours)) AS h
         |  FROM (SELECT DISTINCT event_type FROM events)),
         |f AS (SELECT g.event_type, g.h, obs.n_obs, obs.m,
         |    last_value(obs.m IGNORE NULLS) OVER wp AS pm,
         |    last_value(CASE WHEN obs.m IS NOT NULL THEN g.h END
         |      IGNORE NULLS) OVER wp AS ph,
         |    first_value(obs.m IGNORE NULLS) OVER wn AS nm,
         |    first_value(CASE WHEN obs.m IS NOT NULL THEN g.h END
         |      IGNORE NULLS) OVER wn AS nh
         |  FROM grid g LEFT JOIN obs USING (event_type, h)
         |  WINDOW wp AS (PARTITION BY g.event_type ORDER BY g.h
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    wn AS (PARTITION BY g.event_type ORDER BY g.h
         |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT event_type, h, coalesce(n_obs, 0) AS n_obs,
         |  round((CASE WHEN m IS NOT NULL THEN CAST(m AS DOUBLE)
         |    WHEN pm IS NOT NULL AND nm IS NOT NULL THEN
         |      CAST(pm AS DOUBLE) + CAST(nm - pm AS DOUBLE)
         |        * CAST(h - ph AS DOUBLE) / CAST(nh - ph AS DOUBLE)
         |    WHEN pm IS NOT NULL THEN CAST(pm AS DOUBLE)
         |    ELSE CAST(nm AS DOUBLE) END) / 1000000.0, 6) AS value,
         |  CASE WHEN m IS NOT NULL THEN 'obs'
         |    WHEN pm IS NOT NULL AND nm IS NOT NULL THEN 'interp'
         |    WHEN pm IS NOT NULL THEN 'ffill' ELSE 'bfill' END AS src
         |FROM f ORDER BY event_type, h""".stripMargin
    },

    "a5_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "w1_gap_scan" ->
      s"""WITH e AS (SELECT DISTINCT user_id, $hourFloor AS ts FROM events),
         |l AS (SELECT user_id, ts,
         |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts FROM e)
         |SELECT user_id, prev_ts + $GapIvlMs AS gap_start, ts - $GapIvlMs AS gap_end
         |FROM l WHERE prev_ts IS NOT NULL AND ts - prev_ts > $GapIvlMs
         |ORDER BY user_id, gap_start""".stripMargin,

    "w2_boundary_gaps" ->
      s"""WITH e AS (SELECT DISTINCT user_id, $hourFloor AS ts FROM events),
         |ext AS (SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts FROM e GROUP BY 1),
         |k AS (SELECT DISTINCT user_id FROM events),
         |j AS (SELECT k.user_id, first_ts, last_ts FROM k LEFT JOIN ext ON k.user_id = ext.user_id),
         |g AS (
         |  SELECT user_id, $RangeStartMs AS gap_start,
         |    coalesce(first_ts - $GapIvlMs, $LastHourMs) AS gap_end
         |  FROM j WHERE first_ts IS NULL OR first_ts > $RangeStartMs
         |  UNION ALL
         |  SELECT user_id, last_ts + $GapIvlMs AS gap_start, $LastHourMs AS gap_end
         |  FROM j WHERE last_ts IS NOT NULL AND last_ts < $LastHourMs)
         |SELECT user_id, gap_start, gap_end FROM g WHERE gap_start <= gap_end
         |ORDER BY user_id, gap_start""".stripMargin,

    "w3_gap_islands" -> s"$w3With\nSELECT user_id, gap_start, gap_end FROM m ORDER BY user_id, gap_start",

    "w4_fetch_windows" -> {
      val step = FetchLimit * GapIvlMs
      s"""$w3With,
         |wnd AS (SELECT user_id, gap_end,
         |  unnest(generate_series(gap_start, gap_end, $step)) AS req_start FROM m)
         |SELECT user_id, req_start,
         |  least(req_start + ${step - GapIvlMs}, gap_end) AS req_end
         |FROM wnd ORDER BY user_id, req_start""".stripMargin
    },


    "j1_dim_join" ->
      s"""SELECT r_name, n_name, count(*) AS n_customers, ${dsum("c_acctbal")} AS total_acctbal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name IN ('ASIA', 'EUROPE')
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    // J10: the bucketed layout must not change JOIN SEMANTICS — the oracle
    // is the plain join; any bucketing bug (row lost to a mis-bucketed
    // file, double-read bucket) breaks the hash match.
    // k4's oracle aggregates the ORIGINAL documents — the query aggregates
    // the fragmented-then-compacted copy, so compaction must be exactly
    // content-preserving for the hash to match
    "k4_compaction" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
        |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin,

    // J11: point-in-time join — the w13 SCD2 CTEs re-inlined, probed by
    // purchase events at their own ts with half-open interval semantics.
    "j11_pit_join" ->
      s"""WITH e AS (SELECT user_id, event_id,
         |    epoch_ns(ts) // 1000000 AS ts_ms, event_type, value FROM events),
         |ch AS (SELECT *, lag(event_type) OVER
         |    (PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev
         |  FROM e),
         |f AS (SELECT user_id, event_id, ts_ms, event_type FROM ch
         |  WHERE prev IS NULL OR prev <> event_type),
         |v AS (SELECT user_id, event_type AS state, ts_ms AS valid_from_ms,
         |    row_number() OVER w AS version,
         |    coalesce(lead(ts_ms) OVER w, $RangeEndMs) AS valid_to_ms
         |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
         |p AS (SELECT user_id, ts_ms + 21600000 AS ts_ms, value FROM e
         |  WHERE event_type = 'purchase')
         |SELECT v.state, count(*) AS n_probes,
         |  ${dsum("p.value")} AS total_value,
         |  max(p.ts_ms - v.valid_from_ms) AS max_age_ms,
         |  count(DISTINCT p.user_id * 1000000 + v.version) AS n_versions
         |FROM p JOIN v ON p.user_id = v.user_id
         |  AND p.ts_ms >= v.valid_from_ms AND p.ts_ms < v.valid_to_ms
         |GROUP BY 1 ORDER BY v.state""".stripMargin,

    // a21: exact tiers recomputed; the sketch-side contract flags are
    // literal true — if the engine's merged estimate drifts past 5% or
    // loses union monotonicity it emits false and the hash breaks.
    // a23: the two conditional-min window passes repeated verbatim, same
    // (user | ts, event_id) ordering, ROWS 1 FOLLOWING strictly-after
    "a23_window_funnel" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts,
        |    event_type FROM events),
        |p1 AS (SELECT *, min(CASE WHEN event_type = '$FunnelC' THEN ts END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS np
        |  FROM e),
        |p2 AS (SELECT *,
        |    min(CASE WHEN event_type = '$FunnelB' THEN ts END) OVER w AS nc,
        |    min(CASE WHEN event_type = '$FunnelB' THEN np END) OVER w AS npc
        |  FROM p1 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
        |l AS (SELECT user_id, CASE WHEN event_type = '$FunnelA' THEN
        |      (CASE WHEN npc <= ts + $SeqWithinMs THEN 3
        |        WHEN nc <= ts + $SeqWithinMs THEN 2 ELSE 1 END)
        |    ELSE 0 END AS level FROM p2),
        |u AS (SELECT user_id, max(level) AS level FROM l GROUP BY 1)
        |SELECT CAST(level AS BIGINT) AS level,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM u GROUP BY 1 ORDER BY level""".stripMargin,

    // a24: one value-RANGE frame supplies both touches; peer semantics
    // (value-based bounds, −1 excludes same-ms) match Spark's RangeFrame
    // a28: decimal money through every sum including the running window
    // (associative — no float-order hazard), double only on output
    "a28_ltv_cohorts" ->
      s"""WITH b AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day,
         |    value FROM events),
         |f AS (SELECT user_id, min(day) AS cohort FROM b GROUP BY 1),
         |c AS (SELECT cohort, day - cohort AS offset_days,
         |    count(DISTINCT user_id) AS n_users,
         |    sum(CAST(value AS DECIMAL(18,2))) AS rev_d
         |  FROM b JOIN f USING (user_id) GROUP BY 1, 2),
         |w AS (SELECT *, sum(rev_d) OVER (PARTITION BY cohort
         |    ORDER BY offset_days
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_d
         |  FROM c)
         |SELECT cohort, offset_days, CAST(n_users AS BIGINT) AS n_users,
         |  CAST(rev_d AS DOUBLE) AS revenue,
         |  CAST(cum_d AS DOUBLE) AS cum_revenue
         |FROM w ORDER BY cohort, offset_days""".stripMargin,

    // a27: x3's session rule, a25's histogram-percentile algebra on the
    // minute-bucketed duration grid, bounce rate in integer ppm
    "a27_session_metrics" ->
      s"""WITH e AS (SELECT user_id, epoch_ms(ts) AS ts, event_id
         |  FROM events),
         |l AS (SELECT user_id, ts, event_id,
         |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) > $X3SessionGapMs
         |      THEN 1 ELSE 0 END AS brk
         |  FROM e),
         |si AS (SELECT user_id, ts,
         |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM l),
         |c AS (SELECT user_id, sid, count(*) AS n_events,
         |    min(ts) AS s_lo, max(ts) AS s_hi
         |  FROM si GROUP BY 1, 2),
         |ss AS (SELECT s_lo // 86400000 AS day, n_events,
         |    (s_hi - s_lo) // $LatBucketMs AS dur_b
         |  FROM c),
         |cen AS (SELECT day, CAST(count(*) AS BIGINT) AS n_sessions,
         |    CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS bounces
         |  FROM ss GROUP BY 1),
         |h AS (SELECT day, dur_b, count(*) AS cnt
         |  FROM ss GROUP BY 1, 2),
         |cm AS (SELECT day, dur_b,
         |    sum(cnt) OVER (PARTITION BY day ORDER BY dur_b
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM h),
         |p AS (SELECT cm.day,
         |    min(CASE WHEN cum >= (n_sessions * 50 + 99) // 100
         |      THEN dur_b END) AS p50,
         |    min(CASE WHEN cum >= (n_sessions * 90 + 99) // 100
         |      THEN dur_b END) AS p90
         |  FROM cm JOIN cen USING (day) GROUP BY 1)
         |SELECT cen.day, n_sessions,
         |  CAST(bounces * 1000000 // n_sessions AS BIGINT) AS bounce_ppm,
         |  CAST(p50 AS BIGINT) AS p50_dur_min,
         |  CAST(p90 AS BIGINT) AS p90_dur_min
         |FROM cen JOIN p USING (day) ORDER BY cen.day""".stripMargin,

    // a26: the interval-union identity — user counts toward day d's WAU
    // iff d lands in the union of [a, a+6] over their active days a;
    // DISTINCT (user, covered day) replicates the engine's per-user
    // array_distinct
    "a26_active_users" ->
      s"""WITH ud AS (SELECT DISTINCT user_id,
         |    epoch_ms(ts) // 86400000 AS day FROM events),
         |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
         |  FROM ud GROUP BY 1),
         |cov AS (SELECT DISTINCT user_id, day + o.x AS day
         |  FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS x) o),
         |wau AS (SELECT day, CAST(count(*) AS BIGINT) AS wau
         |  FROM cov GROUP BY 1)
         |SELECT dau.day, dau, wau,
         |  CAST(dau * 1000000 // wau AS BIGINT) AS stickiness_ppm
         |FROM dau JOIN wau USING (day) ORDER BY dau.day""".stripMargin,

    // a25: same first-A / first-B-at-or-after rule, minute-bucketed
    // latencies, percentile = smallest bucket whose running count reaches
    // ceil(p*n/100) — all integer arithmetic, -1 for convert-free cohorts
    "a25_conversion_latency" ->
      s"""WITH fa AS (SELECT user_id, min(epoch_ms(ts)) AS a_ts
         |  FROM events WHERE event_type = '$SeqEventA' GROUP BY 1),
         |fb AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS b_ts
         |  FROM events e JOIN fa USING (user_id)
         |  WHERE e.event_type = '$SeqEventB' AND epoch_ms(e.ts) >= a_ts
         |  GROUP BY 1),
         |c AS (SELECT a_ts // 86400000 AS cohort,
         |    CASE WHEN b_ts IS NOT NULL
         |      THEN (b_ts - a_ts) // $LatBucketMs END AS lat_b
         |  FROM fa LEFT JOIN fb USING (user_id)),
         |cen AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_users,
         |    CAST(count(lat_b) AS BIGINT) AS n_conv
         |  FROM c GROUP BY 1),
         |h AS (SELECT cohort, lat_b, count(*) AS cnt
         |  FROM c WHERE lat_b IS NOT NULL GROUP BY 1, 2),
         |cm AS (SELECT cohort, lat_b,
         |    sum(cnt) OVER (PARTITION BY cohort ORDER BY lat_b
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM h),
         |p AS (SELECT cm.cohort,
         |    min(CASE WHEN cum >= (n_conv * 50 + 99) // 100
         |      THEN lat_b END) AS p50,
         |    min(CASE WHEN cum >= (n_conv * 90 + 99) // 100
         |      THEN lat_b END) AS p90
         |  FROM cm JOIN cen USING (cohort) GROUP BY 1)
         |SELECT cen.cohort, n_users, n_conv,
         |  CAST(coalesce(p50, -1) AS BIGINT) AS p50_bucket,
         |  CAST(coalesce(p90, -1) AS BIGINT) AS p90_bucket
         |FROM cen LEFT JOIN p USING (cohort) ORDER BY cohort""".stripMargin,

    "a24_attribution" ->
      s"""WITH ev AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms
         |  FROM events),
         |w AS (SELECT user_id, event_type, ts_ms,
         |    min(CASE WHEN event_type = '$FunnelB' THEN ts_ms END) OVER f
         |      AS ft_ts,
         |    max(CASE WHEN event_type = '$FunnelB' THEN ts_ms END) OVER f
         |      AS lt_ts
         |  FROM ev WINDOW f AS (PARTITION BY user_id ORDER BY ts_ms
         |    RANGE BETWEEN $AttrLookbackMs PRECEDING AND 1 PRECEDING))
         |SELECT CAST(ts_ms // ${24 * HourMs} AS BIGINT) AS day,
         |  CAST(count(*) AS BIGINT) AS n_conversions,
         |  CAST(sum(CASE WHEN lt_ts IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_attributed,
         |  CAST(sum(CASE WHEN ft_ts < lt_ts THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_multi_touch,
         |  CAST(sum(CASE WHEN lt_ts IS NOT NULL
         |    THEN (ts_ms - lt_ts) // 60000 ELSE 0 END)
         |    AS BIGINT) AS sum_last_gap_min,
         |  CAST(sum(CASE WHEN ft_ts IS NOT NULL
         |    THEN (ts_ms - ft_ts) // 60000 ELSE 0 END)
         |    AS BIGINT) AS sum_first_gap_min
         |FROM w WHERE event_type = '$FunnelC'
         |GROUP BY day ORDER BY day""".stripMargin,

    // a22: distinct (user, day) grain, min-day cohort, matrix census
    "a22_retention_cohorts" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |    epoch_ms(ts) // 86400000 AS day FROM events),
        |f AS (SELECT user_id, min(day) AS cohort FROM ud GROUP BY 1)
        |SELECT cohort, day - cohort AS offset_days,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM ud JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort, offset_days""".stripMargin,

    "a21_sketch_union" ->
      s"""WITH ev AS (SELECT event_type, user_id,
         |    (epoch_ns(ts) // 1000000 - $RangeStartMs) // ${24L * HourMs}
         |      AS day FROM events),
         |daily AS (SELECT event_type, day,
         |    count(DISTINCT user_id) AS n_day_exact FROM ev GROUP BY 1, 2)
         |SELECT d.event_type, count(*) AS n_days,
         |  max(x.n_exact) AS n_exact,
         |  max(d.n_day_exact) AS max_day_exact,
         |  true AS merged_ok, true AS monotone_ok
         |FROM daily d JOIN (SELECT event_type,
         |    count(DISTINCT user_id) AS n_exact FROM ev GROUP BY 1) x
         |  USING (event_type)
         |GROUP BY 1 ORDER BY d.event_type""".stripMargin,

    // a30: Markov removal-effect attribution — the journey/transition
    // construction replayed with windows, then the SAME exact integer
    // absorption recurrence unrolled as generated CTEs (a18's pattern):
    // 5 chains (base + one per removed channel) × MarkovIters steps, CONV
    // pinned at 1e6 each step, removed channel absent from the p table
    // (coalesce 0) and never computed (src filter), out-degrees unchanged.
    "a30_markov_attribution" -> {
      def chain(tag: String, skip: Option[String]): String = {
        val skipSrc = skip.map(c => s" AND e.src <> '$c'").getOrElse("")
        val skipP = skip.map(c => s" AND p.state <> '$c'").getOrElse("")
        val p0 = s"p_${tag}_0 AS (SELECT 'CONV' AS state, " +
          "CAST(1000000 AS BIGINT) AS p)"
        val steps = (1 to MarkovIters).map { k =>
          s"""p_${tag}_$k AS (
             |  SELECT e.src AS state,
             |    CAST(sum(e.cnt * coalesce(p.p, 0)) // min(o.o) AS BIGINT)
             |      AS p
             |  FROM edges e JOIN outc o ON o.src = e.src
             |  LEFT JOIN p_${tag}_${k - 1} p ON p.state = e.dst$skipP
             |  WHERE e.src NOT IN ('CONV', 'NULL')$skipSrc
             |  GROUP BY e.src
             |  UNION ALL SELECT 'CONV', CAST(1000000 AS BIGINT))"""
            .stripMargin
        }
        (p0 +: steps).mkString(",\n")
      }
      val chains = (("base", Option.empty[String]) +:
        MarkovChannels.map(c => (c, Some(c))))
        .map { case (t, sk) => chain(t, sk) }.mkString(",\n")
      val remUnion = MarkovChannels.map { c =>
        s"SELECT '$c' AS channel, p FROM p_${c}_$MarkovIters " +
          "WHERE state = 'START'"
      }.mkString("\n  UNION ALL ")
      val chList = MarkovChannels.map(c => s"'$c'").mkString(", ")
      s"""WITH ev AS (SELECT user_id, event_type,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY epoch_ms(ts), event_id) AS rn
         |  FROM events),
         |fp AS (SELECT user_id, min(rn) AS prn FROM ev
         |  WHERE event_type = 'purchase' GROUP BY 1),
         |st AS (SELECT ev.user_id, ev.rn, fp.prn,
         |    CASE WHEN ev.event_type = 'purchase' THEN 'CONV'
         |      ELSE ev.event_type END AS state
         |  FROM ev LEFT JOIN fp USING (user_id)
         |  WHERE fp.prn IS NULL OR ev.rn <= fp.prn),
         |tr AS (SELECT coalesce(lag(state) OVER (PARTITION BY user_id
         |      ORDER BY rn), 'START') AS src, state AS dst FROM st),
         |tl AS (SELECT state AS src, 'NULL' AS dst FROM st s1
         |  WHERE prn IS NULL AND rn = (SELECT max(rn) FROM st s2
         |    WHERE s2.user_id = s1.user_id)),
         |edges AS MATERIALIZED (SELECT src, dst,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT * FROM tr UNION ALL SELECT * FROM tl)
         |  GROUP BY 1, 2),
         |outc AS MATERIALIZED (SELECT src, CAST(sum(cnt) AS BIGINT) AS o
         |  FROM edges GROUP BY 1),
         |$chains,
         |bse AS (SELECT p FROM p_base_$MarkovIters WHERE state = 'START'),
         |rem AS ($remUnion),
         |tch AS (SELECT dst AS channel, CAST(sum(cnt) AS BIGINT)
         |    AS n_touches
         |  FROM edges WHERE dst IN ($chList) GROUP BY 1),
         |eff AS (SELECT rem.channel,
         |    COALESCE(tch.n_touches, 0) AS n_touches,
         |    (SELECT p FROM bse) AS base_cv_ppm,
         |    rem.p AS removed_cv_ppm,
         |    CASE WHEN (SELECT p FROM bse) > 0
         |      THEN CAST((((SELECT p FROM bse) - rem.p) * 1000000)
         |        // (SELECT p FROM bse) AS BIGINT)
         |      ELSE 0 END AS removal_effect_ppm
         |  FROM rem LEFT JOIN tch USING (channel))
         |SELECT channel, n_touches, base_cv_ppm, removed_cv_ppm,
         |  removal_effect_ppm,
         |  CASE WHEN (SELECT sum(removal_effect_ppm) FROM eff) > 0
         |    THEN CAST((removal_effect_ppm * 1000000)
         |      // (SELECT sum(removal_effect_ppm) FROM eff) AS BIGINT)
         |    ELSE 0 END AS attribution_ppm
         |FROM eff ORDER BY channel""".stripMargin
    },

    // a29: sketch overlap — exact pair counts hash-compared, the
    // inclusion–exclusion estimate gated by the union-scaled tolerance
    // (each of the three HLL estimates is ±~1.6% of a cardinality ≤ the
    // union; 8% of the union is 1.7× the worst-case sum)
    "a29_sketch_overlap" ->
      s"""WITH ev AS (SELECT DISTINCT
         |    (epoch_ms(ts) - $RangeStartMs) // ${24L * HourMs} AS seg,
         |    user_id
         |  FROM events WHERE event_type = 'purchase'
         |    AND (epoch_ms(ts) - $RangeStartMs) // ${24L * HourMs}
         |      < $OverlapDays),
         |per AS (SELECT seg, CAST(count(*) AS BIGINT) AS n_exact
         |  FROM ev GROUP BY 1),
         |p AS (SELECT a.seg AS seg_a, b.seg AS seg_b,
         |    CAST(count(*) AS BIGINT) AS n_inter_exact
         |  FROM ev a JOIN ev b ON a.user_id = b.user_id
         |    AND a.seg < b.seg
         |  GROUP BY 1, 2)
         |SELECT seg_a, seg_b, pa.n_exact AS n_a_exact,
         |  pb.n_exact AS n_b_exact, n_inter_exact,
         |  pa.n_exact + pb.n_exact - n_inter_exact AS n_union_exact,
         |  true AS overlap_ok
         |FROM p JOIN per pa ON pa.seg = p.seg_a
         |  JOIN per pb ON pb.seg = p.seg_b
         |ORDER BY seg_a, seg_b""".stripMargin,

    // pipe4: gate → dedup → pack → shard, recomputed declaratively; the
    // engine's export/readback must reproduce these stats exactly.
    // pipe5: the backfill-closure spine is deterministic, so the oracle is
    // its closed form — seeded = the events table's distinct (type, hour)
    // grid cells MINUS the withheld hour-index % 5 == 0 residue (kept out
    // of the seed so the backfill has in-range work at every sf — the r14
    // sanity fix); fetched = the 720-hour grid complement; closure means
    // the full grid is present, the watermark sits on the last grid hour,
    // and the re-scan finds zero gaps. The SPARK side earns these numbers
    // by actually driving seed → gap scan → fetch plan → fixture fetch →
    // adapter → upsert → re-scan; any spine break moves a number.
    "pipe5_backfill_closure" -> {
      val gridHours = (RangeEndMs - RangeStartMs) / HourMs
      s"""WITH h AS (SELECT event_type AS symbol,
         |    count(DISTINCT CASE WHEN (epoch_ms(ts) // $HourMs) % 5 <> 0
         |      THEN epoch_ms(ts) // $HourMs END) AS n_seeded
         |  FROM events GROUP BY 1)
         |SELECT symbol, n_seeded,
         |  $gridHours - n_seeded AS n_fetched,
         |  CAST($gridHours AS BIGINT) AS n_rows,
         |  CAST($LastHourMs AS BIGINT) AS max_ts,
         |  CAST(0 AS BIGINT) AS n_gaps_after
         |FROM h ORDER BY symbol""".stripMargin
    },

    "pipe4_pack_export" ->
      s"""WITH t AS (SELECT doc_id, lang, n_chars, text,
         |    CAST(len(${rawToks("text")}) AS BIGINT) AS n,
         |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS chars,
         |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS hashes,
         |    CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS dots,
         |    CAST(len(list_filter(${rawToks("text")}, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha,
         |    CAST(len(list_filter(${rawToks("text")}, x -> x IN ('the', 'a'))) AS BIGINT) AS stops
         |  FROM documents),
         |g AS (SELECT doc_id, lang, n_chars, text FROM t
         |  WHERE n >= 50 AND n <= 100000
         |    AND 3 * n <= chars AND chars <= 10 * n
         |    AND 10 * (hashes + dots) < n
         |    AND 10 * alpha >= 8 * n AND stops >= 2),
         |dd AS (SELECT doc_id, lang, n_chars, row_number() OVER
         |    (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM g),
         |d2 AS (SELECT doc_id, lang, n_chars FROM dd WHERE rn = 1),
         |p AS (SELECT doc_id, lang, n_chars,
         |    CAST(floor(CAST(COALESCE(sum(n_chars) OVER
         |      (PARTITION BY lang ORDER BY doc_id
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) / 4096.0) AS BIGINT) AS seq_id
         |  FROM d2),
         |sh AS (SELECT *,
         |    ${md5Hash15("'shard:' || lang || ':' || CAST(seq_id AS VARCHAR)")} % 4
         |      AS shard
         |  FROM p)
         |SELECT lang, CAST(shard AS BIGINT) AS shard, count(*) AS n_docs,
         |  count(DISTINCT seq_id) AS n_seqs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  min(doc_id) AS min_doc_id
         |FROM sh GROUP BY 1, 2 ORDER BY lang, shard""".stripMargin,

    // t25: CDC chunk census — cut after token j where the 3-gram ending
    // at j hashes ≡ 0 mod 8 (same portable 15-hex md5 value as the
    // engine); tail chunk always closes at n.
    // t38: fixed-window chunk table — integer ceil chunk count, 1-based
    // inclusive list slice, md5 over the space-joined window
    "t38_window_chunks" -> {
      val c = ChunkTokens
      val st = ChunkTokens - ChunkOverlap
      s"""WITH t AS (SELECT doc_id, ${lowSeq("text")} AS toks FROM documents),
         |t2 AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
         |  FROM t WHERE len(toks) > 0),
         |cnum AS (SELECT doc_id, toks, n,
         |    CASE WHEN n <= $c THEN 1
         |         ELSE (n - $c + $st - 1) // $st + 1 END AS nch
         |  FROM t2),
         |e AS (SELECT doc_id, toks, n,
         |    CAST(unnest(range(0, nch)) AS BIGINT) AS chunk_idx
         |  FROM cnum)
         |SELECT doc_id, chunk_idx,
         |  CAST(chunk_idx * $st AS BIGINT) AS start_tok,
         |  CAST(least($c, n - chunk_idx * $st) AS BIGINT) AS n_tokens,
         |  md5(array_to_string(
         |    toks[chunk_idx * $st + 1 :
         |         chunk_idx * $st + least($c, n - chunk_idx * $st)], ' '))
         |    AS chunk_fp
         |FROM e ORDER BY doc_id, chunk_idx""".stripMargin
    },

    "t25_cdc_chunks" -> {
      val gh = hexVal15("md5(array_to_string(toks[j-2:j], ' '))")
      s"""WITH t AS (SELECT doc_id, lang, ${lowSeq("text")} AS toks
         |  FROM documents),
         |t2 AS (SELECT doc_id, lang, toks, len(toks) AS n FROM t
         |  WHERE len(toks) > 0),
         |e AS (SELECT lang, toks,
         |    list_append(CASE WHEN n >= 4
         |      THEN [j FOR j IN range(3, n) IF $gh % 8 = 0]
         |      ELSE [] END, n) AS ends
         |  FROM t2),
         |s AS (SELECT lang, toks, ends,
         |    list_prepend(1, list_transform(ends[:len(ends)-1],
         |      x -> x + 1)) AS starts
         |  FROM e),
         |c AS (SELECT lang,
         |    md5(array_to_string(toks[z[1]:z[2]], ' ')) AS fp,
         |    z[2] - z[1] + 1 AS len
         |  FROM (SELECT lang, toks, unnest(list_zip(starts, ends)) AS z
         |        FROM s))
         |SELECT lang, count(*) AS n_chunks,
         |  count(DISTINCT fp) AS n_distinct,
         |  CAST(sum(len) AS BIGINT) AS total_len,
         |  CAST(max(len) AS BIGINT) AS max_len
         |FROM c GROUP BY 1 ORDER BY lang""".stripMargin
    },

    "j12_fuzzy_join" ->
      s"""WITH t0 AS (SELECT doc_id, lang,
         |    array_to_string((${lowSeq("text")})[1:4], ' ') AS p_name
         |  FROM documents),
         |t AS (SELECT * FROM t0 WHERE length(p_name) >= 4),
         |h AS (SELECT doc_id, lang, p_name,
         |    ${md5Hash15("'typo:' || CAST(doc_id AS VARCHAR)")} AS hv
         |  FROM t),
         |pr AS (SELECT doc_id AS probe_id,
         |    substr(p_name, 1, CAST(hv % length(p_name) AS INT))
         |      || substr(p_name, CAST(hv % length(p_name) AS INT) + 2)
         |      AS q_name
         |  FROM h WHERE hv % 5 = 0),
         |pk AS (SELECT doc_id, p_name, lang, unnest([
         |      length(p_name) || '|1|' || substr(p_name, 1, length(p_name) // 2),
         |      length(p_name) || '|2|' || substr(p_name, length(p_name) // 2 + 1)
         |    ]) AS bk FROM t),
         |qk AS (SELECT probe_id, q_name, unnest([
         |      (length(q_name) - 1) || '|1|' || substr(q_name, 1, (length(q_name) - 1) // 2),
         |      (length(q_name) - 1) || '|2|' || substr(q_name, length(q_name) - ((length(q_name) - 1) - (length(q_name) - 1) // 2) + 1),
         |      length(q_name) || '|1|' || substr(q_name, 1, length(q_name) // 2),
         |      length(q_name) || '|2|' || substr(q_name, length(q_name) - (length(q_name) - length(q_name) // 2) + 1),
         |      (length(q_name) + 1) || '|1|' || substr(q_name, 1, (length(q_name) + 1) // 2),
         |      (length(q_name) + 1) || '|2|' || substr(q_name, length(q_name) - ((length(q_name) + 1) - (length(q_name) + 1) // 2) + 1)
         |    ]) AS bk FROM pr),
         |m AS (SELECT DISTINCT probe_id, doc_id, lang
         |  FROM qk JOIN pk USING (bk)
         |  WHERE levenshtein(q_name, p_name) <= 1)
         |SELECT lang, count(*) AS n_pairs,
         |  count(DISTINCT probe_id) AS n_probes_matched,
         |  CAST(sum(CASE WHEN probe_id = doc_id THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_self_matches
         |FROM m GROUP BY 1 ORDER BY lang""".stripMargin,

    "o8_range_shards" ->
      """WITH b AS (SELECT [quantile_cont(l_extendedprice, 1.0/8),
        |  quantile_cont(l_extendedprice, 2.0/8),
        |  quantile_cont(l_extendedprice, 3.0/8),
        |  quantile_cont(l_extendedprice, 4.0/8),
        |  quantile_cont(l_extendedprice, 5.0/8),
        |  quantile_cont(l_extendedprice, 6.0/8),
        |  quantile_cont(l_extendedprice, 7.0/8)] AS bnds FROM lineitem),
        |s AS (SELECT l_extendedprice AS x,
        |    len(list_filter(bnds, e -> x >= e)) AS shard
        |  FROM lineitem, b)
        |SELECT CAST(shard AS BIGINT) AS shard, count(*) AS n_rows,
        |  min(x) AS min_x, max(x) AS max_x
        |FROM s GROUP BY 1 ORDER BY shard""".stripMargin,

    // o9: the staged store's file mechanics (one file per (lang, frag),
    // _metadata listing) are the engine's burden; each physical file is
    // identified by its min doc_id, so the oracle replays the fragment
    // rule and the same FFD running-sum binning directly from documents
    "o9_compaction_plan" ->
      s"""WITH f AS (SELECT lang, doc_id % $CompactFrag AS frag,
         |    CAST(min(doc_id) AS BIGINT) AS file_key,
         |    CAST(count(*) AS BIGINT) AS n_rows
         |  FROM documents GROUP BY lang, doc_id % $CompactFrag),
         |c AS (SELECT lang, file_key, n_rows,
         |    coalesce(sum(n_rows) OVER (PARTITION BY lang
         |      ORDER BY n_rows DESC, file_key
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS cum_before
         |  FROM f)
         |SELECT lang, CAST(cum_before // $CompactTargetRows AS BIGINT) AS bin,
         |  CAST(count(*) AS BIGINT) AS n_files,
         |  CAST(sum(n_rows) AS BIGINT) AS bin_rows,
         |  CAST(min(file_key) AS BIGINT) AS first_key
         |FROM c GROUP BY lang, bin ORDER BY lang, bin""".stripMargin,

    "a20_mad_outliers" ->
      """WITH med AS (SELECT event_type,
        |    quantile_cont(value, 0.5) AS med FROM events GROUP BY 1),
        |dev AS (SELECT e.event_type, e.value, med.med,
        |    abs(e.value - med.med) AS adev
        |  FROM events e JOIN med USING (event_type)),
        |mad AS (SELECT event_type,
        |    quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1)
        |SELECT dev.event_type, count(*) AS n,
        |  max(dev.med) AS med, max(mad.mad) AS mad,
        |  CAST(sum(CASE WHEN dev.adev > 3.0 * mad.mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM dev JOIN mad USING (event_type)
        |GROUP BY 1 ORDER BY dev.event_type""".stripMargin,

    "t23_weighted_sample" ->
      s"""WITH d AS (SELECT doc_id, lang,
         |  least(8, 1 + n_chars // 400) AS w FROM documents),
         |u AS (SELECT doc_id, lang, w,
         |  unnest(generate_series(1, w)) AS i FROM d),
         |k AS (SELECT doc_id, lang, w,
         |  max(${md5Hash15("CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)")}) AS skey
         |  FROM u GROUP BY 1, 2, 3)
         |SELECT doc_id, lang, CAST(w AS INT) AS w, skey FROM k
         |ORDER BY skey DESC, doc_id LIMIT 100""".stripMargin,

    "t24_grouped_split" ->
      s"""WITH d AS (SELECT doc_id, lang, source, n_chars,
         |  ${md5Hash15("'split:' || source")} % 100 AS h FROM documents)
         |SELECT CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
         |    ELSE 'test' END AS split,
         |  lang, count(*) AS n_docs,
         |  count(DISTINCT source) AS n_sources,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars
         |FROM d GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,

    "a19_profile" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_orderkey")
      cols.map { c =>
        s"""SELECT '$c' AS col_name, count($c) AS n_rows,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS DOUBLE) AS min_v,
           |  CAST(max($c) AS DOUBLE) AS max_v,
           |  CAST(sum(CAST($c AS DECIMAL(28,2))) AS DOUBLE) AS sum_v
           |FROM lineitem""".stripMargin
      }.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
        "\n) ORDER BY col_name")
    },

    "k5_schema_merge" ->
      """SELECT lang, count(*) AS n_docs,
        |  count(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS n_evolved,
        |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT)
        |    AS total_new_chars,
        |  count(DISTINCT CASE WHEN doc_id % 2 = 1 THEN source END)
        |    AS n_sources
        |FROM documents GROUP BY 1 ORDER BY lang""".stripMargin,

    // k6: the engine's JSONL round-trip must reproduce the parquet table
    // exactly (60-bit md5 content checksum mod 1e9+7), plus the two
    // well-formed side rows and the one malformed line as a `?corrupt`
    // census group — all constants derivable from the side file's literals
    "k6_jsonl_roundtrip" ->
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
         |  CAST(sum(${md5Hash15("text")} % 1000000007) AS BIGINT) AS text_hash
         |FROM documents GROUP BY lang
         |UNION ALL SELECT 'zz~side', CAST(2 AS BIGINT), CAST(21 AS BIGINT),
         |  CAST(18000003 AS BIGINT),
         |  CAST(${md5Hash15("'extra alpha'")} % 1000000007
         |    + ${md5Hash15("'extra beta'")} % 1000000007 AS BIGINT)
         |UNION ALL SELECT '?corrupt', CAST(1 AS BIGINT), CAST(0 AS BIGINT),
         |  CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         |ORDER BY lang""".stripMargin,

    // k7: the deterministic v2 synth repeated verbatim (%10 removed, %7
    // revised, %13 re-crawled at +10M), then one full-outer diff join and
    // the per-(status, lang) churn census with k6's content checksum
    // k8: file identities recomputed from the fragment rule — a day's
    // file count is its distinct non-empty fragments, its first key the
    // day-min event id; decisions from the same fixed "now"
    "k8_vacuum_plan" -> {
      val nowDay = RangeEndMs / 86400000L
      s"""WITH e AS (SELECT epoch_ms(ts) // 86400000 AS day, event_id
         |  FROM events),
         |c AS (SELECT day,
         |    CAST(count(DISTINCT event_id % $CompactFrag) AS BIGINT)
         |      AS n_files,
         |    CAST(count(*) AS BIGINT) AS n_rows,
         |    min(event_id) AS first_key
         |  FROM e GROUP BY 1)
         |SELECT day,
         |  CASE WHEN $nowDay - day <= $RetentionKeepDays THEN 'keep'
         |    WHEN day % 7 = 0 THEN 'archive'
         |    ELSE 'delete' END AS decision,
         |  n_files, n_rows, first_key
         |FROM c ORDER BY day""".stripMargin
    },

    "k7_snapshot_diff" ->
      s"""WITH v1 AS (SELECT doc_id, lang, text FROM documents),
         |v2 AS (SELECT doc_id, lang,
         |    CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END
         |      AS text
         |  FROM v1 WHERE doc_id % 10 <> 0
         |  UNION ALL SELECT doc_id + 10000000, lang, 'recrawl ' || text
         |  FROM v1 WHERE doc_id % 13 = 0),
         |j AS (SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
         |    coalesce(v2.lang, v1.lang) AS lang,
         |    CASE WHEN v1.text IS NULL THEN 'added'
         |      WHEN v2.text IS NULL THEN 'removed'
         |      WHEN v1.text <> v2.text THEN 'changed'
         |      ELSE 'unchanged' END AS status,
         |    coalesce(v2.text, v1.text) AS text
         |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
         |SELECT status, lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
         |  CAST(sum(${md5Hash15("text")} % 1000000007) AS BIGINT) AS text_hash
         |FROM j GROUP BY 1, 2 ORDER BY status, lang""".stripMargin,

    // k9: same epoch rules as k7, lang-grain censuses with integer-ppm
    // shares and the L1 drift term
    "k9_drift_census" ->
      s"""WITH v1 AS (SELECT doc_id, lang, text FROM documents),
         |v2 AS (SELECT doc_id, lang,
         |    CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END
         |      AS text
         |  FROM v1 WHERE doc_id % 10 <> 0
         |  UNION ALL SELECT doc_id + 10000000, lang, 'recrawl ' || text
         |  FROM v1 WHERE doc_id % 13 = 0),
         |c1 AS (SELECT lang, count(*) AS n_a, sum(length(text)) AS chars_a
         |  FROM v1 GROUP BY 1),
         |c2 AS (SELECT lang, count(*) AS n_b, sum(length(text)) AS chars_b
         |  FROM v2 GROUP BY 1),
         |t AS (SELECT (SELECT count(*) FROM v1) AS t1,
         |  (SELECT count(*) FROM v2) AS t2)
         |SELECT lang,
         |  CAST(coalesce(n_a, 0) AS BIGINT) AS n_a,
         |  CAST(coalesce(n_b, 0) AS BIGINT) AS n_b,
         |  CAST(coalesce(chars_a, 0) AS BIGINT) AS chars_a,
         |  CAST(coalesce(chars_b, 0) AS BIGINT) AS chars_b,
         |  CAST(coalesce(n_a, 0) * 1000000 // t1 AS BIGINT) AS share_a_ppm,
         |  CAST(coalesce(n_b, 0) * 1000000 // t2 AS BIGINT) AS share_b_ppm,
         |  CAST(abs(coalesce(n_a, 0) * 1000000 // t1
         |    - coalesce(n_b, 0) * 1000000 // t2) AS BIGINT) AS drift_ppm
         |FROM c1 FULL OUTER JOIN c2 USING (lang) CROSS JOIN t
         |ORDER BY lang""".stripMargin,

    "j10_bucketed" ->
      s"""SELECT c_nationkey, count(*) AS n_orders,
         |  ${dsum("o_totalprice")} AS total_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    // j13: the oracle runs the PLAIN unsalted join + the census algebra —
    // hash equality proves the adaptive salting semantically invisible
    "j13_adaptive_salt" ->
      s"""WITH e AS (SELECT CASE WHEN user_id % 10 = 0 THEN 0
         |    ELSE user_id END AS account_id, value FROM events),
         |c AS (SELECT account_id, CAST(count(*) AS BIGINT) AS cnt
         |  FROM e GROUP BY 1),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(cnt) AS BIGINT) AS tot, max(cnt) AS mx FROM c),
         |hot AS (SELECT account_id,
         |    least(greatest((cnt * n) // tot, 2), $J13SaltCap) AS f
         |  FROM c, st WHERE cnt * $J13HotDen * n > $J13HotNum * tot),
         |cen AS (SELECT
         |    (SELECT mx * 1000000 // greatest(tot // n, 1) FROM st)
         |      AS skew_ppm,
         |    (SELECT CAST(count(*) AS BIGINT) FROM hot) AS n_hot_keys,
         |    (SELECT COALESCE(CAST(max(f) AS BIGINT), 1) FROM hot)
         |      AS max_factor)
         |SELECT cu.c_mktsegment, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
         |    AS value_micro,
         |  cen.skew_ppm, cen.n_hot_keys, cen.max_factor
         |FROM e JOIN customer cu ON cu.c_custkey = e.account_id
         |CROSS JOIN cen
         |GROUP BY 1, 4, 5, 6 ORDER BY 1""".stripMargin,

    "j9_salted_join" ->
      s"""SELECT n_name, count(*) AS n_customers, ${dsum("c_acctbal")} AS total_acctbal
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "j3_fullouter_merge" ->
      s"""WITH c AS (SELECT $hourFloor AS bucket_ms, ${dsum("value")} AS click_sum
         |  FROM events WHERE event_type = 'click' GROUP BY 1),
         |v AS (SELECT $hourFloor AS bucket_ms, ${dsum("value")} AS view_sum
         |  FROM events WHERE event_type = 'view' GROUP BY 1),
         |p AS (SELECT $hourFloor AS bucket_ms, ${dsum("value")} AS purchase_sum
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
         |cv AS (SELECT coalesce(c.bucket_ms, v.bucket_ms) AS bucket_ms, click_sum, view_sum
         |  FROM c FULL JOIN v ON c.bucket_ms = v.bucket_ms)
         |SELECT coalesce(cv.bucket_ms, p.bucket_ms) AS bucket_ms, click_sum, view_sum, purchase_sum
         |FROM cv FULL JOIN p ON cv.bucket_ms = p.bucket_ms
         |ORDER BY bucket_ms""".stripMargin,

    "j5_double_lookup" ->
      """SELECT coalesce(s_nationkey, -1) AS nation, count(*) AS n,
        |  count(s_nationkey) AS n_supp_tagged, count(p_brand) AS n_part_tagged
        |FROM lineitem
        |LEFT JOIN (SELECT s_suppkey, s_nationkey FROM supplier WHERE s_acctbal > 5000) s
        |  ON l_suppkey = s_suppkey
        |LEFT JOIN (SELECT p_partkey, p_brand FROM part WHERE p_size > 25) p
        |  ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY nation""".stripMargin,

    "m2_payload_sha256" ->
      """SELECT doc_id, sha256(text) AS sha256,
        |  octet_length(encode(text)) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,

    "j6_anti_join" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "j8_semi_join" ->
      """SELECT p_brand, count(*) AS n_parts FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "p2_align_floor" ->
      s"""WITH b AS (SELECT epoch_ms(ts)//$FiveMinMs*$FiveMinMs AS bucket_ms FROM events)
         |SELECT bucket_ms, count(*) AS n,
         |  strftime(make_timestamp(bucket_ms * 1000), '%Y-%m-%d %H:%M:%S') AS dt
         |FROM b GROUP BY bucket_ms ORDER BY bucket_ms""".stripMargin,

    "p6_precision" ->
      """WITH s AS (SELECT printf('%.2f', l_discount) AS v FROM lineitem)
        |SELECT CAST(length(regexp_replace(split_part(v, '.', 2), '0+$', '')) AS BIGINT) AS prec,
        |  count(*) AS n
        |FROM s GROUP BY 1 ORDER BY prec""".stripMargin,

    "p8_enum_map" ->
      """SELECT CASE WHEN o_orderstatus = 'O' THEN 0
        |            WHEN o_orderstatus = 'F' THEN 1
        |            WHEN o_orderstatus = 'P' THEN 2 END AS status_code,
        |  count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY status_code""".stripMargin,

    "p12_prob_norm" ->
      """WITH a AS (SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_sum,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view_sum
        |FROM events GROUP BY user_id)
        |SELECT user_id, purchase_sum, view_sum,
        |  round(CASE WHEN purchase_sum IS NULL OR view_sum IS NULL
        |    OR purchase_sum + view_sum = 0 THEN NULL
        |    ELSE purchase_sum / (purchase_sum + view_sum) END, 6) AS purchase_ratio
        |FROM a ORDER BY user_id""".stripMargin,

    "p13_entity_classify" -> {
      val cases = EntityRules.map { case (kw, label) =>
        s"WHEN contains(lower(text), '$kw') THEN '$label'"
      }.mkString(" ")
      s"""WITH e AS (SELECT CASE $cases ELSE '$EntityDefault' END AS entity FROM documents)
         |SELECT entity, count(*) AS n FROM e GROUP BY entity ORDER BY entity""".stripMargin
    },

    "p16_filter_scan" ->
      s"""SELECT p_brand, count(*) AS n, ${dsum("p_retailprice")} AS retail_sum
         |FROM part WHERE p_type = 'PROMO' AND p_size IN (1, 5, 9, 13)
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "o1_topn" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "o5_union_distinct" ->
      """SELECT DISTINCT user_id FROM events
        |WHERE event_type IN ('error', 'signup') ORDER BY user_id""".stripMargin,

    // O7: the Morton interleave unrolled as the same shift/mask terms the
    // Spark expression emits — the z-value is bit-exact across engines.
    "o7_zorder" -> {
      val z = (0 until ZBits).map { b =>
        s"((((ux >> $b) & 1) << ${2 * b}) + (((vy >> $b) & 1) << ${2 * b + 1}))"
      }.mkString(" + ")
      s"""WITH e AS (SELECT user_id AS ux,
         |    least(CAST(floor(value / 2) AS BIGINT), 255) AS vy FROM events),
         |z AS (SELECT ux, vy, ($z) >> $ZShift AS bucket FROM e),
         |b AS (SELECT bucket, count(*) AS n,
         |    min(ux) AS ux_min, max(ux) AS ux_max,
         |    min(vy) AS vy_min, max(vy) AS vy_max
         |  FROM z GROUP BY 1)
         |SELECT bucket, n, ux_min, ux_max, vy_min, vy_max,
         |  ux_min <= ${ZProbeUx._2} AND ux_max >= ${ZProbeUx._1} AS probe_ux,
         |  vy_min <= ${ZProbeVy._2} AND vy_max >= ${ZProbeVy._1} AS probe_vy
         |FROM b ORDER BY bucket""".stripMargin
    },

    // o10: zone-map skip census — bucket assignment, zone maps, and the
    // disjointness algebra replayed; the predicate grid as literal VALUES
    "o10_skip_census" -> {
      val z = (0 until ZBits).map { b =>
        s"((((ux >> $b) & 1) << ${2 * b}) + (((vy >> $b) & 1) << ${2 * b + 1}))"
      }.mkString(" + ")
      val predVals = SkipPredicates.map { case (nm, ul, uh, vl, vh) =>
        s"('$nm', CAST($ul AS BIGINT), CAST($uh AS BIGINT), " +
          s"CAST($vl AS BIGINT), CAST($vh AS BIGINT))"
      }.mkString(",\n    ")
      s"""WITH e AS (SELECT event_id AS eid, user_id AS ux,
         |    least(CAST(floor(value / 2) AS BIGINT), 255) AS vy
         |  FROM events),
         |sp AS (SELECT max(eid) + 1 AS span FROM e),
         |nat AS (SELECT 'natural' AS layout,
         |    (eid * $SkipFiles) // span AS bucket, ux, vy FROM e, sp),
         |zo AS (SELECT 'zorder' AS layout, ($z) >> $ZShift AS bucket,
         |    ux, vy FROM e),
         |zones AS (SELECT layout, bucket, CAST(count(*) AS BIGINT) AS n,
         |    min(ux) AS uxmin, max(ux) AS uxmax,
         |    min(vy) AS vymin, max(vy) AS vymax
         |  FROM (SELECT * FROM nat UNION ALL SELECT * FROM zo)
         |  GROUP BY 1, 2),
         |preds(predicate, ux_lo, ux_hi, vy_lo, vy_hi) AS (VALUES
         |    $predVals),
         |j AS (SELECT layout, predicate, n,
         |    CASE WHEN uxmax < ux_lo OR uxmin > ux_hi
         |      OR vymax < vy_lo OR vymin > vy_hi THEN 1 ELSE 0 END AS skip
         |  FROM zones CROSS JOIN preds)
         |SELECT layout, predicate, CAST(count(*) AS BIGINT) AS n_files,
         |  CAST(sum(skip) AS BIGINT) AS n_skipped,
         |  CAST(sum(CASE WHEN skip = 1 THEN n ELSE 0 END) AS BIGINT)
         |    AS rows_skipped,
         |  CAST(sum(n) AS BIGINT) AS rows_total,
         |  CAST((sum(CASE WHEN skip = 1 THEN n ELSE 0 END) * 1000000)
         |    // sum(n) AS BIGINT) AS skip_ppm
         |FROM j GROUP BY 1, 2 ORDER BY layout, predicate""".stripMargin
    },

    "d1_exact_dedup" ->
      s"""SELECT md5(array_to_string(${lowSeq("text")}, ' ')) AS fp,
         |  min(doc_id) AS rep_id, count(*) AS dup_count
         |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,

    "d2_jaccard_pairs" ->
      s"""WITH $d2Ctes
         |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= $JaccardThreshold
         |ORDER BY id_a, id_b""".stripMargin,

    // d21: sorted-neighborhood pairs. The oracle's rank is ONE flat
    // row_number over the full sort tuple — the engine's bucket-offset
    // scheme must reproduce it exactly (contiguity across bucket
    // boundaries included). p2 (first 2 pfx chars) extends the tuple
    // order consistently by the string-prefix property, so the two
    // rankings agree by construction.
    "d21_sorted_neighborhood" ->
      s"""WITH tn AS (SELECT doc_id, lang, source,
         |    substr(regexp_replace(lower(text), '\\s+', ' ', 'g'),
         |      1, $SnmPrefixChars) AS pfx,
         |    ${lowSet("text")} AS toks FROM documents),
         |r AS (SELECT doc_id, lang, source, pfx, toks,
         |    row_number() OVER (ORDER BY lang, source, pfx, doc_id) AS rk
         |  FROM tn),
         |p AS (SELECT a.doc_id AS ia, b.doc_id AS ib, b.rk - a.rk AS gap,
         |    CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) AS inter,
         |    CAST(len(a.toks) + len(b.toks) AS DOUBLE) AS ss
         |  FROM r a JOIN r b
         |    ON b.rk > a.rk AND b.rk <= a.rk + ${SnmWindow - 1}),
         |j AS (SELECT least(ia, ib) AS id_a, greatest(ia, ib) AS id_b,
         |    CAST(gap AS BIGINT) AS gap,
         |    round(CASE WHEN ss - inter > 0 THEN inter / (ss - inter)
         |      ELSE 1.0 END, 4) AS jaccard FROM p)
         |SELECT id_a, id_b, gap, jaccard FROM j
         |WHERE jaccard >= $SnmThreshold
         |ORDER BY id_a, id_b""".stripMargin,

    // d22: Broder resemblance over t25's CDC chunking (the SAME boundary
    // rules, keyed by doc instead of lang), then the chunk-overlap join
    "d22_chunk_resemblance" -> {
      val gh = hexVal15("md5(array_to_string(toks[j-2:j], ' '))")
      s"""WITH t AS (SELECT doc_id, ${lowSeq("text")} AS toks
         |  FROM documents),
         |t2 AS (SELECT doc_id, toks, len(toks) AS n FROM t
         |  WHERE len(toks) > 0),
         |e AS (SELECT doc_id, toks,
         |    list_append(CASE WHEN n >= 4
         |      THEN [j FOR j IN range(3, n) IF $gh % $CdcModulus = 0]
         |      ELSE [] END, n) AS ends
         |  FROM t2),
         |s AS (SELECT doc_id, toks, ends,
         |    list_prepend(1, list_transform(ends[:len(ends)-1],
         |      x -> x + 1)) AS starts
         |  FROM e),
         |c AS (SELECT doc_id,
         |    md5(array_to_string(toks[z[1]:z[2]], ' ')) AS fp
         |  FROM (SELECT doc_id, toks, unnest(list_zip(starts, ends)) AS z
         |        FROM s)),
         |cd AS (SELECT DISTINCT doc_id, fp FROM c),
         |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM cd
         |  GROUP BY 1),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(count(*) AS DOUBLE) AS inter
         |  FROM cd a JOIN cd b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |j AS (SELECT id_a, id_b,
         |    round(inter / (sa.sz + sb.sz - inter), 4) AS resemblance
         |  FROM p JOIN sz sa ON sa.doc_id = p.id_a
         |    JOIN sz sb ON sb.doc_id = p.id_b)
         |SELECT id_a, id_b, resemblance FROM j
         |WHERE resemblance >= $CdcResemblance
         |ORDER BY id_a, id_b""".stripMargin
    },

    // d20: the prefix-filter join's exact contract — GLOBAL shingle-set
    // Jaccard pairs above threshold. The oracle finds pairs through the
    // shingle-overlap join (any pair sharing ≥1 shingle, grouped to
    // overlap counts), which is a SUPERSET of the engine's prefix-indexed
    // candidates — so one missed candidate on the Spark side hash-fails.
    "d20_prefix_filter_pairs" -> {
      val concat3 = (0 until PrefixJoinK)
        .map(j => if (j == 0) "tk[i]" else s"tk[i+$j]")
        .mkString(" || ' ' || ")
      s"""WITH tkc AS (SELECT doc_id, ${lowSeq("text")} AS tk FROM documents),
         |shg AS (SELECT doc_id, list_distinct(
         |    [md5($concat3) for i in range(1, len(tk) - ${PrefixJoinK - 2})])
         |    AS shs
         |  FROM tkc WHERE len(tk) >= $PrefixJoinK),
         |e AS (SELECT doc_id, len(shs) AS sz, unnest(shs) AS s FROM shg),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    a.sz AS sza, b.sz AS szb, CAST(count(*) AS DOUBLE) AS inter
         |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2, 3, 4),
         |j AS (SELECT id_a, id_b,
         |    round(inter / (sza + szb - inter), 4) AS jaccard FROM p)
         |SELECT id_a, id_b, jaccard FROM j
         |WHERE jaccard >= ${PrefixJoinPpm.toDouble / 1e6}
         |ORDER BY id_a, id_b""".stripMargin
    },

    // d23: the containment join's exact contract — DIRECTED pairs with
    // |S(a)∩S(b)| / |S(a)| ≥ t. Candidates come through the full
    // shingle-overlap join (a SUPERSET of the engine's one-sided-prefix
    // candidates), threshold compared on the unrounded ratio (integer /
    // integer — bit-identical IEEE division on both engines), rounding
    // applied only to the emitted column.
    "d23_containment_pairs" -> {
      val concat3 = (0 until PrefixJoinK)
        .map(j => if (j == 0) "tk[i]" else s"tk[i+$j]")
        .mkString(" || ' ' || ")
      s"""WITH tkc AS (SELECT doc_id, ${lowSeq("text")} AS tk FROM documents),
         |shg AS (SELECT doc_id, list_distinct(
         |    [md5($concat3) for i in range(1, len(tk) - ${PrefixJoinK - 2})])
         |    AS shs
         |  FROM tkc WHERE len(tk) >= $PrefixJoinK),
         |e AS (SELECT doc_id, len(shs) AS sz, unnest(shs) AS s FROM shg),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    a.sz AS sza, CAST(count(*) AS DOUBLE) AS inter
         |  FROM e a JOIN e b ON a.s = b.s AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2, 3)
         |SELECT id_a, id_b, round(inter / sza, 4) AS containment FROM p
         |WHERE inter / sza >= ${ContainPpm.toDouble / 1e6}
         |ORDER BY id_a, id_b""".stripMargin
    },

    // D9: transitive closure of the d2 pair graph — min reachable id per
    // node (= the Spark side's min-label-propagation fixpoint).
    "d9_dup_clusters" ->
      s"""WITH RECURSIVE $d2Ctes,
         |pairs AS (SELECT id_a, id_b FROM j WHERE jaccard >= $JaccardThreshold),
         |edges AS (SELECT id_a AS es, id_b AS et FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT doc_id AS id, doc_id AS r FROM documents
         |  UNION
         |  SELECT rr.id AS id, e.et AS r FROM reach rr JOIN edges e ON rr.r = e.es)
         |SELECT id AS doc_id, min(r) AS cluster_id FROM reach
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // d18: d9's closure, rolled to the cluster-size histogram
    "d18_cluster_census" ->
      s"""WITH RECURSIVE $d2Ctes,
         |pairs AS (SELECT id_a, id_b FROM j WHERE jaccard >= $JaccardThreshold),
         |edges AS (SELECT id_a AS es, id_b AS et FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT doc_id AS id, doc_id AS r FROM documents
         |  UNION
         |  SELECT rr.id AS id, e.et AS r FROM reach rr JOIN edges e ON rr.r = e.es),
         |cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach
         |  GROUP BY 1),
         |cs AS (SELECT cluster_id, count(*) AS sz FROM cl GROUP BY 1)
         |SELECT CAST(sz AS BIGINT) AS cluster_size,
         |  CAST(count(*) AS BIGINT) AS n_clusters,
         |  CAST(sz * count(*) AS BIGINT) AS n_docs
         |FROM cs GROUP BY sz ORDER BY cluster_size""".stripMargin,

    // D13: d9's cluster closure × t2's quality — keep the best-quality doc
    // per duplicate cluster (ties to the smallest id).
    "d13_cluster_keep_best" ->
      s"""WITH RECURSIVE $d2Ctes,
         |pairs AS (SELECT id_a, id_b FROM j WHERE jaccard >= $JaccardThreshold),
         |edges AS (SELECT id_a AS es, id_b AS et FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT doc_id AS id, doc_id AS r FROM documents
         |  UNION
         |  SELECT rr.id AS id, e.et AS r FROM reach rr JOIN edges e ON rr.r = e.es),
         |cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY 1),
         |${qualityCtes()},
         |rk AS (SELECT cl.cluster_id, cl.doc_id, q.quality,
         |    row_number() OVER (PARTITION BY cl.cluster_id
         |      ORDER BY q.quality DESC, cl.doc_id) AS rk,
         |    count(*) OVER (PARTITION BY cl.cluster_id) AS n_docs
         |  FROM cl JOIN q ON cl.doc_id = q.doc_id)
         |SELECT cluster_id, doc_id AS keep_id, quality AS keep_quality, n_docs
         |FROM rk WHERE rk = 1 ORDER BY cluster_id""".stripMargin,

    "d3_minhash_lsh" -> {
      val rows = MinhashK / MinhashBands
      val sigs = (0 until MinhashK).map(i =>
        s"list_min(list_transform(toks, x -> md5('$i:' || x))) AS m$i").mkString(",\n  ")
      val bandKeys = (0 until MinhashBands).map { b =>
        val parts = (b * rows until (b + 1) * rows).map(i => s"m$i").mkString(" || ',' || ")
        s"'$b|' || md5($parts)"
      }.mkString(", ")
      s"""WITH t AS (SELECT doc_id AS id, ${lowSet("text")} AS toks FROM documents),
         |t2 AS (SELECT id, toks FROM t WHERE len(toks) > 0),
         |sig AS (SELECT id,
         |  $sigs
         |FROM t2),
         |bands AS (SELECT id, unnest([$bandKeys]) AS band FROM sig),
         |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.id < b.id),
         |p AS (SELECT id_a, id_b,
         |    CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE) AS inter,
         |    CAST(len(ta.toks) + len(tb.toks) AS DOUBLE) AS ss
         |  FROM cand JOIN t2 ta ON ta.id = id_a JOIN t2 tb ON tb.id = id_b),
         |j AS (SELECT id_a, id_b,
         |  CASE WHEN ss - inter > 0 THEN inter / (ss - inter) ELSE 1.0 END AS jac FROM p)
         |SELECT id_a, id_b, round(jac, 6) AS jaccard FROM j WHERE jac >= $MinhashThreshold
         |ORDER BY id_a, id_b""".stripMargin
    },

    // D15: incremental dedup replay — same signature/band SQL as d3 over
    // the corpus/delta split; directed (delta, corpus) pairs, no a<b cut.
    // w16: the streaming-admission chain replayed from scratch — three
    // unrolled rounds of (band-collision candidates → shingle-set
    // jaccard verify) against an index that GROWS by each round's
    // admitted set, plus the in-batch smaller-id rule. A missed
    // cross-batch rejection (one that only exists because round b's
    // admit was appended back) breaks round b+1 here.
    "w16_stream_admission" -> {
      val sigs = (0 until MinhashK).map(i =>
        s"list_min(list_transform(shs, x -> md5('$i:' || x))) AS m$i")
        .mkString(",\n  ")
      val rows = MinhashK / MinhashBands
      val bandKeys = (0 until MinhashBands).map { b =>
        val parts = (b * rows until (b + 1) * rows).map(i => s"m$i")
          .mkString(" || ',' || ")
        s"'$b|' || md5($parts)"
      }.mkString(", ")
      val concat3 = (0 until W16ShingleK)
        .map(j => if (j == 0) "tk[i]" else s"tk[i+$j]")
        .mkString(" || ' ' || ")
      def jac(a: String, b: String) = {
        val inter = s"CAST(len(list_intersect($a.shs, $b.shs)) AS DOUBLE)"
        s"""CASE WHEN CAST(len($a.shs) + len($b.shs) AS DOUBLE) - $inter > 0
           |    THEN $inter / (CAST(len($a.shs) + len($b.shs) AS DOUBLE) - $inter)
           |    ELSE 1.0 END""".stripMargin
      }
      val rounds = (0 until W16Batches).map { b =>
        s"""cb$b AS (SELECT n.doc_id, n.band FROM bnd n
           |  JOIN dd ON dd.doc_id = n.doc_id AND dd.b = $b),
           |inbc$b AS (SELECT DISTINCT a.doc_id AS ia, c.doc_id AS ib
           |  FROM cb$b a JOIN cb$b c ON a.band = c.band
           |    AND a.doc_id < c.doc_id),
           |inb$b AS (SELECT DISTINCT ib AS doc_id FROM inbc$b
           |  JOIN shg sa ON sa.doc_id = ia JOIN shg sb ON sb.doc_id = ib
           |  WHERE ${jac("sa", "sb")} >= $MinhashThreshold),
           |imc$b AS (SELECT DISTINCT d.doc_id AS ia, i.doc_id AS ib
           |  FROM cb$b d JOIN bnd i ON d.band = i.band
           |  JOIN idx$b x ON x.doc_id = i.doc_id),
           |im$b AS (SELECT DISTINCT ia AS doc_id FROM imc$b
           |  JOIN shg sa ON sa.doc_id = ia JOIN shg sb ON sb.doc_id = ib
           |  WHERE ${jac("sa", "sb")} >= $MinhashThreshold),
           |adm$b AS (SELECT doc_id FROM dd WHERE b = $b
           |  AND doc_id NOT IN (SELECT doc_id FROM inb$b)
           |  AND doc_id NOT IN (SELECT doc_id FROM im$b)),
           |idx${b + 1} AS (SELECT doc_id FROM idx$b
           |  UNION ALL SELECT doc_id FROM adm$b)""".stripMargin
      }.mkString(",\n")
      val admAll = (0 until W16Batches)
        .map(b => s"SELECT doc_id FROM adm$b").mkString(" UNION ALL ")
      s"""WITH tkc AS (SELECT doc_id, ${lowSeq("text")} AS tk FROM documents),
         |shg AS (SELECT doc_id, list_distinct(
         |    [md5($concat3) for i in range(1, len(tk) - ${W16ShingleK - 2})])
         |    AS shs
         |  FROM tkc WHERE len(tk) >= $W16ShingleK),
         |sig AS (SELECT doc_id,
         |  $sigs
         |FROM shg),
         |bnd AS (SELECT doc_id, unnest([$bandKeys]) AS band FROM sig),
         |dd AS (SELECT doc_id, (doc_id // 2) % $W16Batches AS b
         |  FROM documents WHERE doc_id % 2 = 1),
         |idx0 AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 0),
         |$rounds
         |SELECT dd.doc_id, CAST(dd.b AS BIGINT) AS batch
         |FROM dd JOIN ($admAll) a ON a.doc_id = dd.doc_id
         |ORDER BY dd.doc_id""".stripMargin
    },

    // w20: all three vector-admission rounds unrolled from scratch — the
    // probe assignment (arn <= W20Probe over the same cosine/tie order as
    // d10), stored rank-1 cells, in-batch smaller-id rejection, index
    // probe chained through the admitted sets (append-back), all verified
    // at the round-6 cosine cut
    "w20_vector_admission" -> {
      val rounds = (0 until W20Batches).map { b =>
        s"""inb$b AS (SELECT DISTINCT p.nid FROM pb p
           |  JOIN dd db ON db.nid = p.nid AND db.b = $b
           |  JOIN st a ON a.cell = p.cell
           |  JOIN dd da ON da.nid = a.nid AND da.b = $b
           |  WHERE a.nid < p.nid
           |    AND round(${cosChain("a.cv", "p.cv")}, 6) >= $SemThreshold),
           |im$b AS (SELECT DISTINCT p.nid FROM pb p
           |  JOIN dd db ON db.nid = p.nid AND db.b = $b
           |  JOIN idx$b i ON i.cell = p.cell
           |  WHERE round(${cosChain("i.cv", "p.cv")}, 6) >= $SemThreshold),
           |adm$b AS (SELECT nid FROM dd WHERE b = $b
           |  AND nid NOT IN (SELECT nid FROM inb$b)
           |  AND nid NOT IN (SELECT nid FROM im$b)),
           |idx${b + 1} AS (SELECT nid, cell, cv FROM idx$b
           |  UNION ALL SELECT s.nid, s.cell, s.cv FROM st s
           |  JOIN adm$b a ON a.nid = s.nid)""".stripMargin
      }.mkString(",\n")
      val admAll = (0 until W20Batches)
        .map(b => s"SELECT nid, $b AS b FROM adm$b").mkString(" UNION ALL ")
      s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS cvec
         |  FROM embeddings WHERE vec_id < $NumCentroids),
         |corp AS (SELECT vec_id AS nid, embedding AS cv FROM embeddings),
         |pr AS (SELECT nid, cv, cent_id,
         |  row_number() OVER (PARTITION BY nid
         |    ORDER BY ${cosChain("cv", "cvec")} DESC, cent_id) AS arn
         |  FROM corp CROSS JOIN cent),
         |pb AS (SELECT nid, cv, cent_id AS cell FROM pr
         |  WHERE arn <= $W20Probe),
         |st AS (SELECT nid, cv, cent_id AS cell FROM pr WHERE arn = 1),
         |dd AS (SELECT vec_id AS nid, (vec_id // 2) % $W20Batches AS b
         |  FROM embeddings WHERE vec_id % 2 = 1),
         |idx0 AS (SELECT nid, cell, cv FROM st WHERE nid % 2 = 0),
         |$rounds
         |SELECT a.nid AS vec_id, CAST(a.b AS BIGINT) AS batch
         |FROM ($admAll) a ORDER BY vec_id""".stripMargin
    },

    // w21: BOTH admission lifecycles of the quantizer-refresh seam
    // unrolled from scratch — epoch-0 rounds under the frozen base model
    // (w20's proof shape), then the refresh itself re-derived numerically
    // (per-stored-cell DECIMAL(27,9) sums → double mean → round 6, the s9
    // rule, with empty cells carrying the old centroid), the rebuild's
    // re-assignment of the whole index under the refreshed model, and
    // epoch-1 rounds probing the refreshed model against the rebuilt
    // index. A single wrongly-refreshed centroid component moves rank-1
    // cells and hash-fails on the result's `cell` column. Chain-state
    // CTEs are MATERIALIZED (the r7 inline-explosion rule: every epoch-1
    // CTE references the full epoch-0 unroll through cent1).
    "w21_stream_requant" -> {
      def rounds(ep: Int, pb: String, st: String, start: String): String =
        (0 until W21Batches).map { b =>
          val p = s"e${ep}b$b"
          val prev = if (b == 0) start else s"idxe${ep}_$b"
          s"""inb$p AS MATERIALIZED (SELECT DISTINCT p.nid FROM $pb p
             |  JOIN dd db ON db.nid = p.nid AND db.e = $ep AND db.b = $b
             |  JOIN $st a ON a.cell = p.cell
             |  JOIN dd da ON da.nid = a.nid AND da.e = $ep AND da.b = $b
             |  WHERE a.nid < p.nid
             |    AND round(${cosChain("a.cv", "p.cv")}, 6) >= $SemThreshold),
             |im$p AS MATERIALIZED (SELECT DISTINCT p.nid FROM $pb p
             |  JOIN dd db ON db.nid = p.nid AND db.e = $ep AND db.b = $b
             |  JOIN $prev i ON i.cell = p.cell
             |  WHERE round(${cosChain("i.cv", "p.cv")}, 6) >= $SemThreshold),
             |adm$p AS MATERIALIZED (SELECT nid FROM dd
             |  WHERE e = $ep AND b = $b
             |  AND nid NOT IN (SELECT nid FROM inb$p)
             |  AND nid NOT IN (SELECT nid FROM im$p)),
             |idxe${ep}_${b + 1} AS MATERIALIZED (
             |  SELECT nid, cell, cv FROM $prev
             |  UNION ALL SELECT s.nid, s.cell, s.cv FROM $st s
             |  JOIN adm$p a ON a.nid = s.nid)""".stripMargin
        }.mkString(",\n")
      val meanDims = (0 until EmbeddingDim).map(i =>
        s"round(CAST(sum(CAST(CAST(cv[${i + 1}] AS DOUBLE) AS DECIMAL(27,9))) AS DOUBLE) / count(*), 6)")
        .mkString("[", ",\n    ", "]")
      val admAll = (for (e <- 0 until W21Epochs; b <- 0 until W21Batches)
        yield s"SELECT nid, $e AS e, $b AS b FROM adme${e}b$b")
        .mkString(" UNION ALL ")
      s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS cvec
         |  FROM embeddings WHERE vec_id < $NumCentroids),
         |corp AS (SELECT vec_id AS nid, embedding AS cv FROM embeddings),
         |pr0 AS MATERIALIZED (SELECT nid, cv, cent_id,
         |  row_number() OVER (PARTITION BY nid
         |    ORDER BY ${cosChain("cv", "cvec")} DESC, cent_id) AS arn
         |  FROM corp CROSS JOIN cent),
         |pb0 AS MATERIALIZED (SELECT nid, cv, cent_id AS cell FROM pr0
         |  WHERE arn <= $W21Probe),
         |st0 AS MATERIALIZED (SELECT nid, cv, cent_id AS cell FROM pr0
         |  WHERE arn = 1),
         |dd AS MATERIALIZED (SELECT vec_id AS nid,
         |  (vec_id // 2) % $W21Epochs AS e,
         |  (vec_id // 4) % $W21Batches AS b
         |  FROM embeddings WHERE vec_id % 2 = 1),
         |idxe0_0 AS MATERIALIZED (SELECT nid, cell, cv FROM st0
         |  WHERE nid % 2 = 0),
         |${rounds(0, "pb0", "st0", "idxe0_0")},
         |c1c AS MATERIALIZED (SELECT cell AS cent_id,
         |  $meanDims AS cvec
         |  FROM idxe0_$W21Batches GROUP BY cell),
         |cent1 AS MATERIALIZED (SELECT cent_id, cvec FROM c1c
         |  UNION ALL SELECT cent_id,
         |    list_transform(cvec, x -> CAST(x AS DOUBLE)) AS cvec
         |  FROM cent WHERE cent_id NOT IN (SELECT cent_id FROM c1c)),
         |pr1 AS MATERIALIZED (SELECT nid, cv, cent_id,
         |  row_number() OVER (PARTITION BY nid
         |    ORDER BY ${cosChain("cv", "cvec")} DESC, cent_id) AS arn
         |  FROM corp CROSS JOIN cent1),
         |pb1 AS MATERIALIZED (SELECT nid, cv, cent_id AS cell FROM pr1
         |  WHERE arn <= $W21Probe),
         |st1 AS MATERIALIZED (SELECT nid, cv, cent_id AS cell FROM pr1
         |  WHERE arn = 1),
         |idxe1_0 AS MATERIALIZED (SELECT i.nid, s.cell, i.cv
         |  FROM idxe0_$W21Batches i JOIN st1 s ON s.nid = i.nid),
         |${rounds(1, "pb1", "st1", "idxe1_0")}
         |SELECT a.nid AS vec_id, CAST(a.e AS BIGINT) AS epoch,
         |  CAST(a.b AS BIGINT) AS batch, f.cell
         |FROM ($admAll) a
         |JOIN idxe1_$W21Batches f ON f.nid = a.nid
         |ORDER BY vec_id""".stripMargin
    },

    // m7: all three multimodal-admission rounds unrolled from scratch —
    // the m3 staged-feature arithmetic (uppercase-hex byte lanes, stride-4,
    // 6dp-rounded L2 normalization), the m2 sha256 chain (in-batch min-id
    // winner, store append-back of every exact-fresh payload), the w20
    // probe/verify discipline on the features (arn <= M7Probe, rank-1
    // stored cells, round-6 cosine cut, index append-back through the
    // admitted sets), and every census grain (per-batch funnel counts
    // incl. empty-stage zero rows, per-doc admit rows, the cross-batch
    // shard-manifest rollup with its order-independent digest sum)
    "m7_stream_media" -> {
      val byteVal = "(16.0 * (strpos('0123456789ABCDEF', substr(hx, 2*i - 1, 1)) - 1)" +
        " + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1)"
      val dims = (0 until 8).map(d =>
        s"""coalesce(list_sum(list_transform(range(${d + 1}, n + 1, 32), i ->
           |      $byteVal / 255.0)), 0.0) AS s$d""".stripMargin)
        .mkString(",\n")
      val normChain = (0 until 8).map(d => s"(s$d * s$d)")
        .mkString("sqrt(0.0 + ", " + ", ")")
      val fvList = (0 until 8).map(d =>
        s"round(CASE WHEN nrm > 0 THEN s$d / nrm ELSE 0.0 END, 6)")
        .mkString("[", ", ", "]")
      def dot8(a: String, b: String) = (1 to 8).map(i =>
        s"(CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE))")
        .mkString("0.0 + ", " + ", "")
      def cos8(a: String, b: String) =
        s"((${dot8(a, b)}) / (sqrt(${dot8(a, a)}) * sqrt(${dot8(b, b)})))"
      val rounds = (0 until M7Batches).map { b =>
        s"""win$b AS (SELECT nid, sha FROM (
           |    SELECT d.nid, s.sha,
           |      row_number() OVER (PARTITION BY s.sha ORDER BY d.nid)
           |        AS rn
           |    FROM dd d JOIN shn s ON s.nid = d.nid WHERE d.b = $b) w
           |  WHERE rn = 1),
           |ef$b AS MATERIALIZED (SELECT nid, sha FROM win$b
           |  WHERE sha NOT IN (SELECT sha FROM sha$b)),
           |sha${b + 1} AS (SELECT sha FROM sha$b
           |  UNION ALL SELECT sha FROM ef$b),
           |inb$b AS (SELECT DISTINCT p.nid FROM pb p
           |  JOIN ef$b ep ON ep.nid = p.nid
           |  JOIN st a ON a.cell = p.cell
           |  JOIN ef$b ea ON ea.nid = a.nid
           |  WHERE a.nid < p.nid
           |    AND round(${cos8("a.cv", "p.cv")}, 6) >= $M7Threshold),
           |im$b AS (SELECT DISTINCT p.nid FROM pb p
           |  JOIN ef$b ep ON ep.nid = p.nid
           |  JOIN idx$b i ON i.cell = p.cell
           |  WHERE round(${cos8("i.cv", "p.cv")}, 6) >= $M7Threshold),
           |adm$b AS MATERIALIZED (SELECT nid FROM ef$b
           |  WHERE nid NOT IN (SELECT nid FROM inb$b)
           |  AND nid NOT IN (SELECT nid FROM im$b)),
           |idx${b + 1} AS (SELECT nid, cell, cv FROM idx$b
           |  UNION ALL SELECT s.nid, s.cell, s.cv FROM st s
           |  JOIN adm$b a ON a.nid = s.nid)""".stripMargin
      }.mkString(",\n")
      val funnel = (0 until M7Batches).flatMap { b =>
        Seq(
          s"""SELECT '$b|0_arrived' AS k, count(*) AS cnt,
             |  coalesce(sum(nbn.n_bytes), 0) AS toks
             |FROM dd JOIN nbn ON nbn.nid = dd.nid WHERE dd.b = $b""",
          s"""SELECT '$b|1_exact', count(*), coalesce(sum(nbn.n_bytes), 0)
             |FROM ef$b JOIN nbn ON nbn.nid = ef$b.nid""",
          s"""SELECT '$b|2_admit', count(*), coalesce(sum(nbn.n_bytes), 0)
             |FROM adm$b JOIN nbn ON nbn.nid = adm$b.nid""")
          .map(_.stripMargin)
      }.mkString("\nUNION ALL ")
      val admRows = (0 until M7Batches).map { b =>
        s"""SELECT CAST(adm$b.nid AS VARCHAR) AS k, 1 AS cnt,
           |  nbn.n_bytes AS toks, $b AS aux
           |FROM adm$b JOIN nbn ON nbn.nid = adm$b.nid""".stripMargin
      }.mkString("\nUNION ALL ")
      val admAll = (0 until M7Batches)
        .map(b => s"SELECT nid FROM adm$b").mkString(" UNION ALL ")
      s"""WITH bx AS MATERIALIZED (SELECT doc_id, hex(encode(text)) AS hx,
         |    octet_length(encode(text)) AS n FROM documents),
         |sm AS (SELECT doc_id,
         |$dims
         |  FROM bx),
         |wn AS (SELECT doc_id, s0, s1, s2, s3, s4, s5, s6, s7,
         |  $normChain AS nrm FROM sm),
         |fv AS MATERIALIZED (SELECT doc_id, $fvList AS cv FROM wn),
         |sh AS MATERIALIZED (SELECT doc_id, sha256(text) AS sha
         |  FROM documents),
         |nb AS (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT)
         |    AS n_bytes FROM documents),
         |cent AS (SELECT doc_id AS cent_id, cv AS cvec FROM fv
         |  WHERE doc_id < $M7Centroids),
         |dd AS (SELECT doc_id AS nid, doc_id AS src,
         |    (doc_id // 2) % $M7Batches AS b
         |  FROM documents WHERE doc_id % 2 = 1
         |  UNION ALL
         |  SELECT doc_id + $M7RedeliverOffset, doc_id,
         |    (doc_id // 2) % $M7Batches + 1
         |  FROM documents WHERE doc_id % 2 = 1
         |    AND doc_id % $M7RedeliverMod = 0
         |    AND (doc_id // 2) % $M7Batches < ${M7Batches - 1}),
         |au AS (SELECT doc_id AS nid, doc_id AS src FROM documents
         |  WHERE doc_id % 2 = 0
         |  UNION ALL SELECT nid, src FROM dd),
         |fvn AS (SELECT au.nid, fv.cv FROM au
         |  JOIN fv ON fv.doc_id = au.src),
         |shn AS MATERIALIZED (SELECT au.nid, sh.sha FROM au
         |  JOIN sh ON sh.doc_id = au.src),
         |nbn AS (SELECT au.nid, nb.n_bytes FROM au
         |  JOIN nb ON nb.doc_id = au.src),
         |pr AS MATERIALIZED (SELECT nid, cv, cent_id,
         |  row_number() OVER (PARTITION BY nid
         |    ORDER BY ${cos8("cv", "cvec")} DESC, cent_id) AS arn
         |  FROM fvn CROSS JOIN cent),
         |pb AS (SELECT nid, cv, cent_id AS cell FROM pr
         |  WHERE arn <= $M7Probe),
         |st AS MATERIALIZED (SELECT nid, cv, cent_id AS cell FROM pr
         |  WHERE arn = 1),
         |sha0 AS (SELECT DISTINCT sha FROM sh WHERE doc_id % 2 = 0),
         |idx0 AS (SELECT nid, cell, cv FROM st WHERE nid % 2 = 0),
         |$rounds,
         |fun AS ($funnel),
         |ar AS ($admRows),
         |shard AS (SELECT ${md5Hash15("'m7shard:' || CAST(a.nid AS VARCHAR)")}
         |    AS h, nbn.n_bytes
         |  FROM ($admAll) a JOIN nbn ON nbn.nid = a.nid),
         |sr AS (SELECT h % $M7Shards AS shd,
         |    CAST(count(*) AS BIGINT) AS cnt,
         |    CAST(sum(n_bytes) AS BIGINT) AS toks,
         |    CAST(sum(h % 1000000007) AS BIGINT) AS aux
         |  FROM shard GROUP BY 1)
         |SELECT section, k, CAST(cnt AS BIGINT) AS cnt,
         |  CAST(toks AS BIGINT) AS toks, CAST(aux AS BIGINT) AS aux
         |FROM (
         |  SELECT 'funnel' AS section, k, cnt, toks, 0 AS aux FROM fun
         |  UNION ALL
         |  SELECT 'admit', k, cnt, toks, aux FROM ar
         |  UNION ALL
         |  SELECT 'shard', CAST(shd AS VARCHAR), cnt, toks, aux FROM sr)
         |ORDER BY section, k""".stripMargin
    },

    "d15_incremental_dedup" -> {
      val rows = MinhashK / MinhashBands
      val sigs = (0 until MinhashK).map(i =>
        s"list_min(list_transform(toks, x -> md5('$i:' || x))) AS m$i")
        .mkString(",\n  ")
      val bandKeys = (0 until MinhashBands).map { b =>
        val parts = (b * rows until (b + 1) * rows).map(i => s"m$i")
          .mkString(" || ',' || ")
        s"'$b|' || md5($parts)"
      }.mkString(", ")
      s"""WITH t AS (SELECT doc_id AS id, ${lowSet("text")} AS toks FROM documents),
         |t2 AS (SELECT id, toks FROM t WHERE len(toks) > 0),
         |sig AS (SELECT id,
         |  $sigs
         |FROM t2),
         |bands AS (SELECT id, unnest([$bandKeys]) AS band FROM sig),
         |cand AS (SELECT DISTINCT d.id AS delta_id, c.id AS corpus_id
         |  FROM bands d JOIN bands c ON d.band = c.band
         |  WHERE d.id % 10 = 7 AND c.id % 10 <> 7),
         |p AS (SELECT delta_id, corpus_id,
         |    CAST(len(list_intersect(td.toks, tc.toks)) AS DOUBLE) AS inter,
         |    CAST(len(td.toks) + len(tc.toks) AS DOUBLE) AS ss
         |  FROM cand JOIN t2 td ON td.id = delta_id
         |    JOIN t2 tc ON tc.id = corpus_id),
         |j AS (SELECT delta_id, corpus_id,
         |  CASE WHEN ss - inter > 0 THEN inter / (ss - inter) ELSE 1.0 END AS jac
         |  FROM p)
         |SELECT delta_id, corpus_id, round(jac, 6) AS jaccard FROM j
         |WHERE jac >= $MinhashThreshold
         |ORDER BY delta_id, corpus_id""".stripMargin
    },

    // d17: the same vocab-grain signature build as d14, a 31-struct
    // unnest for the banded digests (matching the engine's per-combo
    // '<b>|<i>|' prefix + comma-joined component text), bucket-count
    // candidate algebra, and the S-curve as literal multiplication
    // chains folded left-to-right (identical IEEE order on both engines)
    "d17_lsh_tuning" -> {
      val sigs = (0 until MinhashK).map(i =>
        s"${hexVal15(s"list_min(list_transform(toks, x -> md5('$i:' || x)))")} AS m$i")
        .mkString(",\n  ")
      val structs = LshTuneCombos.flatMap { case (b, r) =>
        (0 until b).map { i =>
          val parts = (i * r until (i + 1) * r)
            .map(j => s"CAST(m$j AS VARCHAR)").mkString(" || ',' || ")
          s"{'b': CAST($b AS BIGINT), 'dg': md5('$b|$i|' || $parts)}"
        }
      }.mkString(",\n    ")
      val curve = LshTuneCombos.map { case (b, r) =>
        val jr = Seq.fill(r)(s"CAST($MinhashThreshold AS DOUBLE)")
          .mkString("*")
        val q = s"(1 - $jr)"
        val qb = Seq.fill(b)(q).mkString("*")
        s"(CAST($b AS BIGINT), CAST(${MinhashK / b} AS BIGINT), " +
          s"CAST(floor((1 - $qb) * 1000000) AS BIGINT))"
      }.mkString(",\n    ")
      s"""WITH t AS (SELECT doc_id AS id, ${lowSet("text")} AS toks
         |  FROM documents),
         |t2 AS (SELECT * FROM t WHERE len(toks) > 0),
         |sig AS (SELECT id,
         |  $sigs
         |FROM t2),
         |bd AS (SELECT unnest([
         |    $structs
         |  ], recursive := true) FROM sig),
         |g AS (SELECT b, dg, count(*) AS n FROM bd GROUP BY 1, 2),
         |c AS (SELECT b, CAST(count(*) AS BIGINT) AS n_buckets,
         |    CAST(sum(n * (n - 1) // 2) AS BIGINT) AS cand_pairs
         |  FROM g GROUP BY 1),
         |curve(b, rows_per_band, collision_ppm) AS (VALUES
         |    $curve)
         |SELECT c.b AS bands, rows_per_band, n_buckets, cand_pairs,
         |  collision_ppm
         |FROM c JOIN curve USING (b) ORDER BY bands""".stripMargin
    },

    // D14: minhash estimate (K-component agreement rate) vs exact Jaccard
    // on the blocked pair space, decile rollup. Generated from the same
    // MinhashK as the query; every double is one division over integer
    // sufficient statistics.
    "d14_minhash_est_error" -> minhashEstSql(docGate = ""),

    // D16: the identical estimator eval on a deterministic 1-in-N sample
    // of candidate BLOCKS (lang, source) — md5-gated, mirroring the
    // engine's portable block key.
    "d16_minhash_est_sampled" -> minhashEstSql(docGate =
      s" AND ${hexVal15("md5(lang || ':' || source)")} % $CalibSampleMod = 0"),

    "d4_simhash" -> {
      // portable hex→int: value of first 15 md5 hex chars, char i weight 16^(15-i)
      val hexVal = (1 to 15).map { i =>
        val w = math.pow(16, 15 - i).toLong
        s"(strpos('0123456789abcdef', substr(md5(tok), $i, 1)) - 1) * ${w}"
      }.mkString(" + ")
      val votes = (0 until SimhashBits).map { b =>
        s"sum(CASE WHEN (hv // ${1L << b}) % 2 = 1 THEN 1 ELSE -1 END) AS b$b"
      }.mkString(",\n  ")
      val assemble = (0 until SimhashBits).map { b =>
        s"(CASE WHEN b$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH t AS (SELECT doc_id AS id, ${lowSet("text")} AS toks FROM documents),
         |t2 AS (SELECT id, toks FROM t WHERE len(toks) > 0),
         |u AS (SELECT id, unnest(toks) AS tok FROM t2),
         |h AS (SELECT id, $hexVal AS hv FROM u),
         |v AS (SELECT id,
         |  $votes
         |FROM h GROUP BY id)
         |SELECT id AS doc_id, $assemble AS simhash FROM v ORDER BY doc_id""".stripMargin
    },

    "d8_passage_dedup" ->
      s"""WITH t AS (SELECT doc_id AS id, ${lowSeq("text")} AS toks FROM documents),
         |t2 AS (SELECT id, toks FROM t WHERE len(toks) > 0),
         |c AS (SELECT id, unnest(
         |    [{'idx': (i-1)//$PassageK,
         |      'fp': md5(array_to_string(toks[i:i+${PassageK - 1}], ' '))}
         |     for i in range(1, len(toks)+1, $PassageK)], recursive := true)
         |  FROM t2),
         |w AS (SELECT id, idx, fp,
         |  row_number() OVER (PARTITION BY fp ORDER BY id, idx) AS rn FROM c)
         |SELECT id AS doc_id, count(*) AS n_passages,
         |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM w GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // PIPE1: the full preprocessing funnel, assembled from the same proven
    // fragments as t2 (quality), d1 (fingerprint), d8 (passages), t6
    // (md5-threshold sample); the passage cut is integer (2·kept ≥ total).
    "pipe1_funnel" -> {
      val sw = Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH sc AS (SELECT doc_id, lang, text,
         |    CAST(len(${rawToks("text")}) AS DOUBLE) AS qn,
         |    len(list_filter(${rawToks("text")}, x -> list_contains($sw, x))) AS qhits,
         |    CAST(list_sum(list_transform(${rawToks("text")}, x -> length(x))) AS BIGINT) AS qlsum
         |  FROM documents),
         |s1 AS (SELECT doc_id, lang, text FROM sc
         |  WHERE floor((least(qn / 100.0, 1.0) * 0.4
         |    + (CASE WHEN qn > 0 THEN qhits / qn ELSE 0.0 END) * 0.3
         |    + (CASE WHEN qn > 0 AND qlsum / qn BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.5 END) * 0.3)
         |    * 10000.0 + 0.5) / 10000.0 >= 0.5),
         |s2 AS (SELECT * FROM s1 WHERE lang IN ('en', 'es', 'de')),
         |fpd AS (SELECT doc_id, lang, text,
         |    md5(array_to_string(${lowSeq("text")}, ' ')) AS f FROM s2),
         |s3 AS (SELECT doc_id, lang, text FROM (
         |    SELECT *, min(doc_id) OVER (PARTITION BY f) AS rep FROM fpd)
         |  WHERE doc_id = rep),
         |pt AS (SELECT doc_id, ${lowSeq("text")} AS toks FROM s3),
         |pt2 AS (SELECT doc_id, toks FROM pt WHERE len(toks) > 0),
         |pc AS (SELECT doc_id, unnest(
         |    [{'idx': (i-1)//$PassageK,
         |      'pfp': md5(array_to_string(toks[i:i+${PassageK - 1}], ' '))}
         |     for i in range(1, len(toks)+1, $PassageK)], recursive := true)
         |  FROM pt2),
         |pw AS (SELECT doc_id, idx, pfp,
         |  row_number() OVER (PARTITION BY pfp ORDER BY doc_id, idx) AS rn FROM pc),
         |pd AS (SELECT doc_id, count(*) AS n_passages,
         |  sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS n_kept
         |  FROM pw GROUP BY 1),
         |s4 AS (SELECT s3.doc_id, s3.lang FROM s3 JOIN pd USING (doc_id)
         |  WHERE 2 * n_kept >= n_passages),
         |s5 AS (SELECT * FROM s4
         |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
         |    CASE WHEN lang = 'en' THEN '40' ELSE '80' END)
         |SELECT 's0_all' AS stage, count(*) AS n_docs FROM documents
         |UNION ALL SELECT 's1_quality', count(*) FROM s1
         |UNION ALL SELECT 's2_lang', count(*) FROM s2
         |UNION ALL SELECT 's3_exact_dedup', count(*) FROM s3
         |UNION ALL SELECT 's4_passage', count(*) FROM s4
         |UNION ALL SELECT 's5_sample', count(*) FROM s5
         |ORDER BY stage""".stripMargin
    },

    // PIPE2: the streamed funnel's survivors. Same CTE chain as pipe1 but
    // lang is RECOMPUTED from the text (t1's marker vote) because the
    // stream annotates rather than trusting the table column, and the
    // output is the survivor set itself (doc_id, lang) — what the stream's
    // doc sink holds after the AvailableNow run.
    "pipe2_stream_funnel" -> {
      val sw = Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
      val scores = LangMarkers.map { case (lang, words) =>
        val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
        s"len(list_filter(${rawToks("text")}, x -> list_contains($arr, x))) AS s_$lang"
      }.mkString(",\n  ")
      val langs = LangMarkers.map(_._1)
      val g = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
      val pick = langs.init.map(l => s"WHEN s_$l = g THEN '$l'").mkString(" ")
      s"""WITH ls AS (SELECT doc_id, text, $scores FROM documents),
         |lid AS (SELECT doc_id, text, CASE $pick ELSE '${langs.last}' END AS lang
         |  FROM (SELECT *, $g AS g FROM ls)),
         |sc AS (SELECT doc_id, lang, text,
         |    CAST(len(${rawToks("text")}) AS DOUBLE) AS qn,
         |    len(list_filter(${rawToks("text")}, x -> list_contains($sw, x))) AS qhits,
         |    CAST(list_sum(list_transform(${rawToks("text")}, x -> length(x))) AS BIGINT) AS qlsum
         |  FROM lid),
         |s2 AS (SELECT doc_id, lang, text FROM sc
         |  WHERE floor((least(qn / 100.0, 1.0) * 0.4
         |    + (CASE WHEN qn > 0 THEN qhits / qn ELSE 0.0 END) * 0.3
         |    + (CASE WHEN qn > 0 AND qlsum / qn BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.5 END) * 0.3)
         |    * 10000.0 + 0.5) / 10000.0 >= 0.5
         |  AND lang IN ('en', 'es', 'de')),
         |fpd AS (SELECT doc_id, lang, text,
         |    md5(array_to_string(${lowSeq("text")}, ' ')) AS f FROM s2),
         |s3 AS (SELECT doc_id, lang, text FROM (
         |    SELECT *, min(doc_id) OVER (PARTITION BY f) AS rep FROM fpd)
         |  WHERE doc_id = rep),
         |pt AS (SELECT doc_id, ${lowSeq("text")} AS toks FROM s3),
         |pt2 AS (SELECT doc_id, toks FROM pt WHERE len(toks) > 0),
         |pc AS (SELECT doc_id, unnest(
         |    [{'idx': (i-1)//$PassageK,
         |      'pfp': md5(array_to_string(toks[i:i+${PassageK - 1}], ' '))}
         |     for i in range(1, len(toks)+1, $PassageK)], recursive := true)
         |  FROM pt2),
         |pw AS (SELECT doc_id, idx, pfp,
         |  row_number() OVER (PARTITION BY pfp ORDER BY doc_id, idx) AS rn FROM pc),
         |pd AS (SELECT doc_id, count(*) AS n_passages,
         |  sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS n_kept
         |  FROM pw GROUP BY 1),
         |s4 AS (SELECT s3.doc_id, s3.lang FROM s3 JOIN pd USING (doc_id)
         |  WHERE 2 * n_kept >= n_passages),
         |s5 AS (SELECT * FROM s4
         |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
         |    CASE WHEN lang = 'en' THEN '40' ELSE '80' END)
         |SELECT doc_id, lang FROM s5 ORDER BY doc_id""".stripMargin
    },

    "pipe3_embed_funnel" -> {
      val sw = Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS cvec
         |  FROM embeddings WHERE vec_id < $NumCentroids),
         |j AS (SELECT d.doc_id, d.lang, d.text, e.embedding AS cv
         |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
         |sc AS (SELECT doc_id, lang, text, cv,
         |    CAST(len(${rawToks("text")}) AS DOUBLE) AS qn,
         |    len(list_filter(${rawToks("text")}, x -> list_contains($sw, x))) AS qhits,
         |    CAST(list_sum(list_transform(${rawToks("text")}, x -> length(x))) AS BIGINT) AS qlsum
         |  FROM j),
         |s1 AS (SELECT doc_id, lang, text, cv FROM sc
         |  WHERE floor((least(qn / 100.0, 1.0) * 0.4
         |    + (CASE WHEN qn > 0 THEN qhits / qn ELSE 0.0 END) * 0.3
         |    + (CASE WHEN qn > 0 AND qlsum / qn BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.5 END) * 0.3)
         |    * 10000.0 + 0.5) / 10000.0 >= 0.5),
         |fpd AS (SELECT doc_id, lang, cv,
         |    md5(array_to_string(${lowSeq("text")}, ' ')) AS f FROM s1),
         |s2 AS (SELECT doc_id, lang, cv FROM (
         |    SELECT *, min(doc_id) OVER (PARTITION BY f) AS rep FROM fpd)
         |  WHERE doc_id = rep),
         |ca AS (SELECT doc_id, lang, cv, cent_id,
         |  row_number() OVER (PARTITION BY doc_id
         |    ORDER BY ${cosChain("cv", "cvec")} DESC, cent_id) AS arn
         |  FROM s2 CROSS JOIN cent),
         |cass AS (SELECT doc_id, lang, cv, cent_id AS cell FROM ca WHERE arn = 1),
         |aa AS (SELECT cell, doc_id AS ida, cv AS av FROM cass),
         |bb AS (SELECT cell, doc_id AS idb, cv AS bv FROM cass),
         |dr AS (SELECT DISTINCT idb FROM aa JOIN bb USING (cell)
         |  WHERE ida < idb AND round(${cosChain("av", "bv")}, 6) >= $SemThreshold),
         |s3 AS (SELECT doc_id, lang FROM cass
         |  WHERE doc_id NOT IN (SELECT idb FROM dr)),
         |s4 AS (SELECT * FROM s3
         |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
         |    CASE WHEN lang = 'en' THEN '40' ELSE '80' END)
         |SELECT 's0_all' AS stage, count(*) AS n_docs FROM j
         |UNION ALL SELECT 's1_quality', count(*) FROM s1
         |UNION ALL SELECT 's2_exact', count(*) FROM s2
         |UNION ALL SELECT 's3_semantic', count(*) FROM s3
         |UNION ALL SELECT 's4_sample', count(*) FROM s4
         |ORDER BY stage""".stripMargin
    },

    "t1_lang_id" -> {
      val scores = LangMarkers.map { case (lang, words) =>
        val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
        s"len(list_filter(${rawToks("text")}, x -> list_contains($arr, x))) AS s_$lang"
      }.mkString(",\n  ")
      val langs = LangMarkers.map(_._1)
      val g = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
      val pick = langs.init.map(l => s"WHEN s_$l = g THEN '$l'").mkString(" ")
      s"""WITH s AS (SELECT doc_id, lang,
         |  $scores
         |FROM documents),
         |gg AS (SELECT *, $g AS g FROM s)
         |SELECT doc_id, lang, CASE $pick ELSE '${langs.last}' END AS predicted
         |FROM gg ORDER BY doc_id""".stripMargin
    },

    // t31: t1's scoring + first-wins tie-break, labeled-lang score via a
    // CASE, integer margins, confusion-matrix rollup
    "t31_label_noise" -> {
      val scores = LangMarkers.map { case (lang, words) =>
        val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
        s"len(list_filter(${rawToks("text")}, x -> list_contains($arr, x))) AS s_$lang"
      }.mkString(",\n  ")
      val langs = LangMarkers.map(_._1)
      val g = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
      val pick = langs.init.map(l => s"WHEN s_$l = g THEN '$l'")
        .mkString(" ")
      val ls = langs.map(l => s"WHEN lang = '$l' THEN s_$l").mkString(" ")
      s"""WITH s AS (SELECT doc_id, lang,
         |  $scores
         |FROM documents),
         |gg AS (SELECT *, $g AS g,
         |    coalesce(CASE $ls END, 0) AS ls FROM s),
         |p AS (SELECT lang, CASE $pick ELSE '${langs.last}' END
         |    AS predicted, CAST(g - ls AS BIGINT) AS margin
         |  FROM gg)
         |SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(margin) AS BIGINT) AS sum_margin,
         |  CAST(max(margin) AS BIGINT) AS max_margin
         |FROM p GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin
    },

    "t2_quality_score" -> {
      val sw = Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH s AS (SELECT doc_id,
         |  CAST(len(${rawToks("text")}) AS DOUBLE) AS n,
         |  len(list_filter(${rawToks("text")}, x -> list_contains($sw, x))) AS hits,
         |  CAST(list_sum(list_transform(${rawToks("text")}, x -> length(x))) AS BIGINT) AS lsum
         |FROM documents)
         |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
         |  floor((least(n / 100.0, 1.0) * 0.4
         |    + (CASE WHEN n > 0 THEN hits / n ELSE 0.0 END) * 0.3
         |    + (CASE WHEN n > 0 AND lsum / n BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.5 END) * 0.3)
         |    * 10000.0 + 0.5) / 10000.0 AS quality
         |FROM s ORDER BY doc_id""".stripMargin
    },

    // T16: per-source quality rank, capped at DomainCap per source.
    "t16_domain_cap" ->
      s"""WITH ${qualityCtes()},
         |rk AS (SELECT d.doc_id, d.source, q.quality,
         |    row_number() OVER (PARTITION BY d.source
         |      ORDER BY q.quality DESC, d.doc_id) AS rk
         |  FROM documents d JOIN q ON d.doc_id = q.doc_id)
         |SELECT doc_id, source, quality, rk FROM rk
         |WHERE rk <= $DomainCap ORDER BY source, rk""".stripMargin,

    // T17: unigram-LM mean negative log-likelihood per doc, bucketed
    // against the corpus mean. Same (doc, token, occ)-grain weighted-sum
    // formulation as the Spark plan so float-order divergence stays within
    // the floor-to-6-decimals collapse.
    // t30: add-1-smoothed unigram LMs over the shared raw vocab; the only
    // float op is one ln per vocab token per side, floored to micro-nats
    // BEFORE the doc rollup, so per-doc sums are integer (shared CTE
    // text with pipe11 — the two cannot drift)
    "t30_dsir_weights" ->
      s"""WITH $dsirCtes
         |SELECT doc_id, lang, n_toks, score_micro,
         |  CAST(CASE WHEN score_micro > 0 THEN 1 ELSE 0 END AS BIGINT)
         |    AS kept
         |FROM dscore ORDER BY doc_id""".stripMargin,

    // pipe11: the selection spine — shared DSIR CTEs (gate), fingerprint
    // election among survivors, pipe10's naive mix selection restricted
    // to the survivor set, pipe8's packing algebra on per-lang sums
    // pipe12: host extraction reuses the t27/pipe6 canonicalization CTEs
    // (cn.hst — the SAME interpolated rules), quality the t2 CTEs; the
    // gate is integer e4 floor-division on non-negative sums
    "pipe12_domain_gate" ->
      s"""WITH $urlSynthCtes,
         |$urlCanonCtes,
         |${qualityCtes("qql")},
         |dq AS (SELECT cn.doc_id, cn.hst AS host,
         |    CAST(round(quality * 10000) AS BIGINT) AS q_e4
         |  FROM cn JOIN q ON cn.doc_id = q.doc_id),
         |h AS (SELECT host, CAST(count(*) AS BIGINT) AS host_n,
         |    CAST(sum(q_e4) AS BIGINT) // CAST(count(*) AS BIGINT)
         |      AS host_avg_e4
         |  FROM dq GROUP BY 1),
         |g AS (SELECT CAST(sum(q_e4) AS BIGINT)
         |    // CAST(count(*) AS BIGINT) AS g_avg FROM dq)
         |SELECT dq.doc_id, dq.host, dq.q_e4, h.host_n, h.host_avg_e4,
         |  CAST(CASE WHEN h.host_avg_e4 >= (SELECT g_avg FROM g)
         |    THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM dq JOIN h USING (host) ORDER BY doc_id""".stripMargin,

    "pipe11_select_pack" -> {
      val vals = MixWeightsPpm
        .map { case (l, wp) => s"('$l', $wp)" }.mkString(", ")
      s"""WITH $dsirCtes,
         |fpt AS (SELECT doc_id, md5(text) AS fp FROM documents),
         |f AS (SELECT dscore.*, fpt.fp, (score_micro > 0) AS pass
         |  FROM dscore JOIN fpt USING (doc_id)),
         |el AS (SELECT f.*, row_number() OVER (PARTITION BY fp, pass
         |    ORDER BY doc_id) AS rn FROM f),
         |mw(lang, w_ppm) AS (VALUES $vals),
         |t2m AS (SELECT doc_id, lang, n_toks AS toks,
         |    ${md5Hash15("'mix:' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM el WHERE pass AND rn = 1 AND n_toks > 0),
         |tot AS (SELECT sum(toks) AS total FROM t2m),
         |tgt2 AS (SELECT lang,
         |    (((CAST((SELECT total FROM tot) AS BIGINT) * $MixFracPpm)
         |      // 1000000) * w_ppm) // 1000000 AS target
         |  FROM mw),
         |cm AS (SELECT t2m.*, tgt2.target,
         |    coalesce(sum(toks) OVER (PARTITION BY t2m.lang
         |      ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS cumb
         |  FROM t2m JOIN tgt2 USING (lang)),
         |kept AS (SELECT * FROM cm WHERE cumb < target),
         |c0 AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_raw,
         |    CAST(sum(n_toks) AS BIGINT) AS raw_toks,
         |    CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_dsir,
         |    CAST(sum(CASE WHEN pass AND rn = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_unique
         |  FROM el GROUP BY 1),
         |c3 AS (SELECT lang, max(target) AS target_toks,
         |    CAST(count(*) AS BIGINT) AS n_mix,
         |    CAST(sum(toks) AS BIGINT) AS mix_toks
         |  FROM kept GROUP BY 1)
         |SELECT c0.lang, n_raw, raw_toks, n_dsir, n_unique,
         |  CAST(coalesce(target_toks, 0) AS BIGINT) AS target_toks,
         |  CAST(coalesce(n_mix, 0) AS BIGINT) AS n_mix,
         |  CAST(coalesce(mix_toks, 0) AS BIGINT) AS mix_toks,
         |  CAST((coalesce(mix_toks, 0) + ${PackCtx - 1}) // $PackCtx
         |    AS BIGINT) AS n_windows,
         |  CAST((coalesce(mix_toks, 0) + ${PackCtx - 1}) // $PackCtx
         |    * $PackCtx - coalesce(mix_toks, 0) AS BIGINT) AS padding
         |FROM c0 JOIN mw USING (lang) LEFT JOIN c3 USING (lang)
         |ORDER BY c0.lang""".stripMargin
    },

    "t17_lm_perplexity" ->
      s"""WITH u AS (SELECT doc_id, unnest(${rawToks("lower(text)")}) AS tok
         |  FROM documents),
         |dt AS (SELECT doc_id, tok, count(*) AS occ FROM u GROUP BY 1, 2),
         |lm AS (SELECT tok, sum(occ) AS cnt FROM dt GROUP BY 1),
         |tot AS (SELECT sum(cnt) AS total FROM lm),
         |sc AS (SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_toks,
         |    sum(occ * -ln(CAST(cnt AS DOUBLE) / total)) / sum(occ) AS nll
         |  FROM dt JOIN lm USING (tok) CROSS JOIN tot GROUP BY doc_id),
         |m AS (SELECT avg(nll) AS mean_nll FROM sc)
         |SELECT doc_id, n_toks, floor(nll * 1000000 + 0.5) / 1000000 AS nll,
         |  CASE WHEN sc.nll <= m.mean_nll THEN 'head' ELSE 'tail' END AS bucket
         |FROM sc CROSS JOIN m ORDER BY doc_id""".stripMargin,

    // T18: BPE merge training, unrolled to BpeMerges rounds (t14's
    // generated-oracle pattern). Per round: pair count over the weighted
    // vocab, 1-row argmax (ties to smallest pair), then the greedy
    // left-to-right merge replayed as a gaps-and-islands parity window:
    // consecutive matching sites (only possible in same-symbol runs) keep
    // even offsets from the chain start — exactly the engine's fold.
    // (the OraclePin prefix matters most here: the 8 unrolled rounds are
    // the many-CTE profile that OOMed unpinned 32-thread DuckDB in r6/r7)
    "t18_bpe_merges" -> {
      val out = (1 to BpeMerges).map(r =>
        s"SELECT CAST($r AS BIGINT) AS step, lft, rgt, c AS pair_count FROM m$r")
        .mkString("\nUNION ALL ")
      (s"""WITH $bpeWith
         |$out
         |ORDER BY step""".stripMargin)
    },

    // T19: tokenizer fertility — the t18 encoder state (v$BpeMerges)
    // applied to the corpus; all-integer (ppm) output, `//` to match
    // Spark's `div` truncation (all values positive).
    "t19_bpe_fertility" ->
      (s"""WITH $bpeWith,
         |toks AS (SELECT source, unnest(${rawToks("lower(text)")}) AS word
         |  FROM documents),
         |enc AS (SELECT word, CAST(len(syms) AS BIGINT) AS n_sub
         |  FROM v$BpeMerges)
         |SELECT source,
         |  CAST(sum(n_sub) AS BIGINT) AS bpe_tokens,
         |  count(*) AS n_words,
         |  CAST(sum(len(word)) AS BIGINT) AS n_chars,
         |  CAST(sum(n_sub) AS BIGINT) * 1000000 // count(*) AS fert_ppm,
         |  CAST(sum(len(word)) AS BIGINT) * 1000000
         |    // CAST(sum(n_sub) AS BIGINT) AS cpt_ppm
         |FROM toks JOIN enc USING (word)
         |GROUP BY source
         |ORDER BY source""".stripMargin),

    // T21: BM25, Lucene idf form; floor(x*1e6+0.5)/1e6 = Spark round(,6)
    // for the strictly-positive scores; ranking on the UNROUNDED score with
    // doc_id tie-break, as in Spark.
    "t21_bm25" -> {
      val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
      s"""WITH ${bm25Ctes(termList)}
         |SELECT doc_id, n_hits,
         |  floor(sc * 1000000 + 0.5) / 1000000 AS score
         |FROM sc ORDER BY sc DESC, doc_id LIMIT $Bm25TopK""".stripMargin
    },

    // T22: the index-backed serve must reproduce t21's scan-time BM25
    // exactly — one oracle text, two engine paths held to it.
    "t22_postings" -> {
      val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
      s"""WITH ${bm25Ctes(termList)}
         |SELECT doc_id, n_hits,
         |  floor(sc * 1000000 + 0.5) / 1000000 AS score
         |FROM sc ORDER BY sc DESC, doc_id LIMIT $Bm25TopK""".stripMargin
    },

    // T20: chunk-level rewrite dedup. Chunk i (0-based) = tokens
    // [i*K+1, i*K+K] (1-based inclusive DuckDB slice); docs reassemble by
    // string_agg over surviving chunks in idx order, and an all-removed or
    // empty doc hashes the empty string — both matching Spark exactly.
    "t20_line_dedup" ->
      s"""WITH t AS (SELECT doc_id, ${lowSeq("text")} AS toks FROM documents),
         |c0 AS (SELECT doc_id,
         |    [{'idx': i, 'chunk':
         |        array_to_string(toks[i*$LineChunk+1 : i*$LineChunk+$LineChunk], ' ')}
         |     for i in range(0, (len(toks)+${LineChunk - 1})//$LineChunk)] AS cs
         |  FROM t),
         |c AS (SELECT doc_id, unnest(cs, recursive:=true) FROM c0),
         |common AS (SELECT chunk FROM c GROUP BY chunk
         |  HAVING count(DISTINCT doc_id) >= $LineDupDocs),
         |surv AS (SELECT doc_id, idx, chunk FROM c
         |  WHERE chunk NOT IN (SELECT chunk FROM common)),
         |agg AS (SELECT doc_id, count(*) AS n_surv,
         |    string_agg(chunk, ' ' ORDER BY idx) AS new_text
         |  FROM surv GROUP BY doc_id)
         |SELECT t.doc_id,
         |  (len(toks)+${LineChunk - 1})//$LineChunk AS n_chunks,
         |  (len(toks)+${LineChunk - 1})//$LineChunk
         |    - coalesce(n_surv, 0) AS n_removed,
         |  md5(coalesce(new_text, '')) AS new_md5
         |FROM t LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,

    "t3_token_stats" ->
      s"""WITH s AS (SELECT source, CAST(len(${rawToks("text")}) AS BIGINT) AS tc, n_chars
         |FROM documents)
         |SELECT source, count(*) AS n_docs, CAST(sum(tc) AS BIGINT) AS total_tokens,
         |  round(CAST(sum(tc) AS DOUBLE) / count(*), 6) AS avg_tokens,
         |  max(n_chars) AS max_chars
         |FROM s GROUP BY source ORDER BY source""".stripMargin,

    "t5_subword_count" ->
      s"""SELECT doc_id,
         |  CAST(len(${rawToks("text")}) AS BIGINT) AS n_words,
         |  CAST(len(list_filter(regexp_split_to_array(text, '[^A-Za-z0-9]+'), x -> x <> ''))
         |    + length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS BIGINT) AS n_subwords
         |FROM documents ORDER BY doc_id""".stripMargin,

    "t13_mix_rebalance" ->
      """WITH cin AS (SELECT lang, count(*) AS n_in FROM documents GROUP BY 1),
        |c AS (SELECT lang, count(*) AS n FROM documents
        |  WHERE lang IN ('de', 'en', 'es', 'fr', 'zh') GROUP BY 1),
        |mx AS (SELECT max(0.2 / n) AS maxr FROM c),
        |r AS (SELECT lang,
        |    CAST(round(((0.2 / n) / maxr) * 256) AS INT) AS nq
        |  FROM c CROSS JOIN mx),
        |thr AS (SELECT lang, CASE WHEN nq >= 256 THEN 'g0'
        |    WHEN nq <= 0 THEN '00'
        |    ELSE lpad(lower(to_hex(nq)), 2, '0') END AS t FROM r),
        |kept AS (SELECT d.lang, count(*) AS n_kept
        |  FROM documents d JOIN thr USING (lang)
        |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < t
        |  GROUP BY 1)
        |SELECT cin.lang, n_in, coalesce(n_kept, CAST(0 AS BIGINT)) AS n_kept
        |FROM cin LEFT JOIN kept USING (lang) ORDER BY lang""".stripMargin,

    "t14_perceptron" -> t14Sql,

    "t33_classifier_loop" -> t33Sql,

    // t37: corpus-growth census — Heaps checkpoints via the
    // first-occurrence election, Zipf over the deterministic top-N head,
    // both OLS slopes in t30's integer micro-nat convention (per-row ln
    // quantized to BIGINT, exact integer sums, one rounded double at the
    // end). Window sums cast back to BIGINT (DuckDB sums BIGINT→HUGEINT).
    "t37_vocab_growth" -> {
      val ols = "round((count(*) * sum(x*y) - sum(x) * sum(y)) * 1.0 / " +
        "(count(*) * sum(x*x) - sum(x) * sum(x)), 4)"
      def lnM(e: String) =
        s"CAST(floor(ln(CAST($e AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"
      val concatK = (0 until VocabK)
        .map(j => if (j == 0) "t[i]" else s"t[i+$j]")
        .mkString(" || ' ' || ")
      s"""WITH tc AS (SELECT doc_id, ${lowSeq("text")} AS t FROM documents),
         |tk AS (SELECT doc_id % $VocabBuckets AS bucket, $concatK AS tok
         |  FROM (SELECT doc_id, t, unnest(range(1,
         |      len(t) - ${VocabK - 2})) AS i
         |    FROM tc WHERE len(t) >= $VocabK)),
         |ts AS (SELECT tok, min(bucket) AS first_b,
         |    CAST(count(*) AS BIGINT) AS freq FROM tk GROUP BY 1),
         |pb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_toks
         |  FROM tk GROUP BY 1),
         |fb AS (SELECT first_b AS bucket, CAST(count(*) AS BIGINT) AS n_new
         |  FROM ts GROUP BY 1),
         |cum AS (SELECT pb.bucket, pb.n_toks,
         |    coalesce(fb.n_new, 0) AS n_new,
         |    CAST(sum(pb.n_toks) OVER (ORDER BY pb.bucket) AS BIGINT)
         |      AS cum_toks,
         |    CAST(sum(coalesce(fb.n_new, 0)) OVER (ORDER BY pb.bucket)
         |      AS BIGINT) AS cum_vocab
         |  FROM pb LEFT JOIN fb USING (bucket)),
         |head AS (SELECT ${lnM("row_number() OVER (ORDER BY freq DESC, tok)")}
         |      AS x, ${lnM("freq")} AS y
         |  FROM ts ORDER BY freq DESC, tok LIMIT $ZipfTopN),
         |z AS (SELECT $ols AS zipf_slope FROM head),
         |hc AS (SELECT ${lnM("cum_toks")} AS x, ${lnM("cum_vocab")} AS y
         |  FROM cum),
         |h AS (SELECT $ols AS heaps_beta FROM hc)
         |SELECT bucket AS checkpoint, n_toks, n_new, cum_toks, cum_vocab,
         |  zipf_slope, heaps_beta
         |FROM cum, z, h ORDER BY checkpoint""".stripMargin
    },

    // t36: Kneser-Ney-style bigram LM — the probability stays a ratio of
    // integers ((4c-3)B + 3*N1a*N1b over 4*c1*B), so the two ln's per
    // bigram type see identical doubles in both engines
    "t36_bigram_lm" ->
      s"""WITH t AS (SELECT doc_id, ${lowSeq("text")} AS toks
         |  FROM documents),
         |bg0 AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
         |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
         |        FROM t WHERE len(toks) >= 2)),
         |dt AS MATERIALIZED (SELECT doc_id, w1, w2,
         |    CAST(count(*) AS BIGINT) AS occ FROM bg0 GROUP BY 1, 2, 3),
         |bg AS MATERIALIZED (SELECT w1, w2, CAST(sum(occ) AS BIGINT) AS c
         |  FROM dt GROUP BY 1, 2),
         |ctx AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c1,
         |    CAST(count(*) AS BIGINT) AS n1a FROM bg GROUP BY 1),
         |cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1b FROM bg
         |  GROUP BY 1),
         |bt AS (SELECT CAST(count(*) AS BIGINT) AS b FROM bg),
         |sc AS MATERIALIZED (SELECT w1, w2, CAST(floor(
         |    (ln(CAST(4 * c1 * (SELECT b FROM bt) AS DOUBLE))
         |     - ln(CAST((4 * c - $KnDiscountNum) * (SELECT b FROM bt)
         |         + $KnDiscountNum * n1a * n1b AS DOUBLE))) * 1000000)
         |    AS BIGINT) AS nll_micro
         |  FROM bg JOIN ctx USING (w1) JOIN cont USING (w2))
         |SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_bigrams,
         |  CAST(sum(occ * nll_micro) AS BIGINT) AS score_micro,
         |  CAST(sum(occ * nll_micro) AS BIGINT)
         |    // CAST(sum(occ) AS BIGINT) AS avg_micro
         |FROM dt JOIN sc USING (w1, w2) GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // t35: competence-based curriculum — the engine's bucket-offset rank
    // vs ONE flat row_number; integer unlock algebra identical
    "t35_curriculum_schedule" ->
      s"""WITH u AS (SELECT doc_id, unnest(${rawToks("lower(text)")}) AS tok
         |  FROM documents),
         |dt AS MATERIALIZED (SELECT doc_id, tok,
         |    CAST(count(*) AS BIGINT) AS occ FROM u GROUP BY 1, 2),
         |lm AS (SELECT tok, CAST(sum(occ) AS BIGINT) AS cnt FROM dt
         |  GROUP BY 1),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM lm),
         |nv AS (SELECT tok, CAST(floor(
         |    -ln(CAST(cnt AS DOUBLE) / (SELECT total FROM tot)) * 1000000)
         |    AS BIGINT) AS nll_micro FROM lm),
         |diff AS MATERIALIZED (SELECT doc_id,
         |    CAST(sum(occ * nll_micro) AS BIGINT)
         |      // CAST(sum(occ) AS BIGINT) AS nll_micro
         |  FROM dt JOIN nv USING (tok) GROUP BY 1),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM diff),
         |r AS (SELECT doc_id, nll_micro,
         |    CAST(row_number() OVER (ORDER BY nll_micro, doc_id) AS BIGINT)
         |      AS rank FROM diff)
         |SELECT doc_id, nll_micro, rank,
         |  ($CurrStages * rank * rank
         |    + (SELECT n * n FROM nn) - 1) // (SELECT n * n FROM nn)
         |    AS stage
         |FROM r ORDER BY doc_id""".stripMargin,

    // t34: DoReMi MW trajectory — every round replayed as generated
    // unrolled CTEs (the t14/t18/a18 pattern); all integer ppm/micro-nat
    // arithmetic on non-negative values, so `//` ≡ Spark's `div`/Scala `/`
    "t34_doremi_mix" -> t34Sql,

    // d19 oracles the FULL recompute over snapshot v2 (k7's epoch rules,
    // d7's shingle algebra at the %29 split): the Spark side answers
    // incrementally from yesterday's staged table + the snapshot delta,
    // so the hash match IS the incremental ≡ full proof.
    // pipe13: the nightly-refresh spine, recomputed FULL-SCAN from v2 —
    // delta classification, Gopher gate (t15's integer rules), benchmark
    // decontamination, and minhash-band near-dup admission (delta vs
    // corpus-v1, self-id excluded) all from first principles; hash
    // equality against the engine's carry-forward plan is the
    // incremental ≡ full proof for the COMPOSED pipeline.
    // pipe14: the oracle builds the FINAL index as a FULL REBUILD (every
    // v2 row argmax'd over the updated quantizer Q'), while the engine
    // maintains it incrementally (carried rows keep their indexed cell by
    // delta scoring) — so the per-cell census hash equality PROVES
    // incremental ≡ full rebuild. The carried census replays the engine's
    // keep rule (s1 vs max-over-retrained) with the identical IEEE chains.
    "pipe14_index_lifecycle" -> {
      val pert = s"[CAST(cv[i] AS DOUBLE) + 0.5 * CAST(cv[(i % $EmbeddingDim) + 1] AS DOUBLE) " +
        s"for i in range(1, ${EmbeddingDim + 1})]"
      val meanList = (0 until EmbeddingDim).map(i =>
        s"CAST(sum(CAST(cv[${i + 1}] AS DECIMAL(27,9))) AS DOUBLE) / count(*)")
        .mkString("[", ", ", "]")
      s"""WITH cent AS (SELECT CAST(vec_id AS BIGINT) AS cent_id,
         |    embedding AS cvec
         |  FROM embeddings WHERE vec_id < $NumCentroids),
         |corp AS (SELECT vec_id, embedding AS cv FROM embeddings),
         |ca1 AS (SELECT vec_id, cent_id,
         |  row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${cosChain("cv", "cvec")} DESC, cent_id) AS arn
         |  FROM corp CROSS JOIN cent),
         |idx AS (SELECT vec_id AS id, cent_id AS cell FROM ca1 WHERE arn = 1),
         |v2 AS (
         |  SELECT vec_id, CASE WHEN vec_id % 9 = 0 THEN $pert
         |    ELSE list_transform(cv, x -> CAST(x AS DOUBLE)) END AS cv
         |  FROM corp WHERE vec_id % 13 <> 0
         |  UNION ALL
         |  SELECT vec_id + 10000000,
         |    list_transform(cv, x -> CAST(x AS DOUBLE))
         |  FROM corp WHERE vec_id % 11 = 0),
         |ca2 AS (SELECT vec_id, cv, cent_id,
         |  row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${cosChain("cv", "cvec")} DESC, cent_id) AS arn
         |  FROM v2 CROSS JOIN cent),
         |cur AS (SELECT vec_id AS id, cv, cent_id AS cell_cur
         |  FROM ca2 WHERE arn = 1),
         |dr AS (SELECT cell, stale_ppm,
         |    CASE WHEN stale_ppm > $Pipe14StalePpm THEN 1 ELSE 0 END
         |      AS drifted
         |  FROM (SELECT i.cell,
         |      (CAST(sum(CASE WHEN c.id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |       + CAST(sum(CASE WHEN c.id IS NOT NULL AND c.cell_cur <> i.cell
         |           THEN 1 ELSE 0 END) AS BIGINT))
         |      * 1000000 // greatest(CAST(count(*) AS BIGINT), 1)
         |        AS stale_ppm
         |    FROM idx i LEFT JOIN cur c ON c.id = i.id GROUP BY i.cell)),
         |ret AS (SELECT cell_cur AS cell, $meanList AS cvec
         |  FROM cur JOIN dr ON dr.cell = cur.cell_cur
         |  WHERE dr.drifted = 1 GROUP BY cell_cur),
         |qp AS (SELECT c.cent_id AS cell,
         |    COALESCE(r.cvec, list_transform(c.cvec, x -> CAST(x AS DOUBLE)))
         |      AS cvec
         |  FROM cent c LEFT JOIN ret r ON r.cell = c.cent_id),
         |u AS (SELECT vec_id AS id, cv FROM v2
         |  WHERE vec_id % 9 <> 0 AND vec_id < 10000000),
         |s1t AS (SELECT u.id, i.cell, ${cosChain("u.cv", "ct.cvec")} AS s1
         |  FROM u JOIN idx i ON i.id = u.id
         |  JOIN cent ct ON ct.cent_id = i.cell),
         |mn AS (SELECT u.id, max(${cosChain("u.cv", "ret.cvec")}) AS max_new
         |  FROM u CROSS JOIN ret GROUP BY u.id),
         |kept AS (SELECT s1t.id, s1t.cell
         |  FROM s1t JOIN dr ON dr.cell = s1t.cell
         |  LEFT JOIN mn ON mn.id = s1t.id
         |  WHERE dr.drifted = 0
         |    AND COALESCE(mn.max_new, CAST('-infinity' AS DOUBLE)) < s1t.s1),
         |caf AS (SELECT v2.vec_id AS id, qp.cell,
         |    row_number() OVER (PARTITION BY v2.vec_id
         |      ORDER BY ${cosChain("v2.cv", "qp.cvec")} DESC, qp.cell) AS arn
         |  FROM v2 CROSS JOIN qp),
         |fin AS (SELECT id, cell FROM caf WHERE arn = 1),
         |censf AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_total,
         |    CAST(sum(id) AS BIGINT) AS id_sum,
         |    CAST(min(id) AS BIGINT) AS id_min,
         |    CAST(max(id) AS BIGINT) AS id_max
         |  FROM fin GROUP BY cell),
         |censc AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_carried
         |  FROM kept GROUP BY cell),
         |q2 AS (SELECT vec_id AS query_id, cv AS qv FROM v2
         |  WHERE vec_id < $NumQueries),
         |qa AS (SELECT q2.query_id, q2.qv, qp.cell,
         |    row_number() OVER (PARTITION BY q2.query_id
         |      ORDER BY ${cosChain("q2.qv", "qp.cvec")} DESC, qp.cell) AS arn
         |  FROM q2 CROSS JOIN qp),
         |qprob AS (SELECT query_id, qv, cell FROM qa
         |  WHERE arn <= $Pipe14Probe),
         |fv AS (SELECT fin.id, fin.cell, v2.cv FROM fin
         |  JOIN v2 ON v2.vec_id = fin.id),
         |candt AS (SELECT qprob.query_id, fv.id AS neighbor_id,
         |    ${cosChain("qprob.qv", "fv.cv")} AS sim
         |  FROM fv JOIN qprob USING (cell) WHERE fv.id <> qprob.query_id),
         |test AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY sim DESC, neighbor_id) AS rank FROM candt)
         |  WHERE rank <= $IvfTopK),
         |ts AS (SELECT q2.query_id, v2.vec_id AS neighbor_id,
         |    ${cosChain("q2.qv", "v2.cv")} AS sim
         |  FROM v2 CROSS JOIN q2 WHERE v2.vec_id <> q2.query_id),
         |truth AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY sim DESC, neighbor_id) AS rank FROM ts)
         |  WHERE rank <= $IvfTopK),
         |rec AS (SELECT CAST(
         |    sum(CASE WHEN te.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |      * 1000000 // CAST(count(*) AS BIGINT) AS BIGINT) AS recall_ppm
         |  FROM truth t LEFT JOIN test te
         |    ON te.query_id = t.query_id AND te.neighbor_id = t.neighbor_id)
         |SELECT cell, dr.stale_ppm, CAST(dr.drifted AS BIGINT) AS drifted,
         |  COALESCE(censf.n_total, 0) AS n_total,
         |  COALESCE(censc.n_carried, 0) AS n_carried,
         |  COALESCE(censf.n_total, 0) - COALESCE(censc.n_carried, 0)
         |    AS n_reassigned,
         |  COALESCE(censf.id_sum, 0) AS id_sum,
         |  COALESCE(censf.id_min, -1) AS id_min,
         |  COALESCE(censf.id_max, -1) AS id_max,
         |  rec.recall_ppm
         |FROM dr FULL JOIN censf USING (cell)
         |LEFT JOIN censc USING (cell) CROSS JOIN rec
         |ORDER BY cell""".stripMargin
    },

    "pipe13_nightly_refresh" -> {
      val rows = MinhashK / MinhashBands
      val sigs = (0 until MinhashK).map(i =>
        s"list_min(list_transform(toks, x -> md5('$i:' || x))) AS m$i")
        .mkString(",\n  ")
      val bandKeys = (0 until MinhashBands).map { b =>
        val parts = (b * rows until (b + 1) * rows).map(i => s"m$i")
          .mkString(" || ',' || ")
        s"'$b|' || md5($parts)"
      }.mkString(", ")
      s"""WITH v1 AS (SELECT doc_id, lang, text FROM documents),
         |v2 AS (SELECT doc_id, lang,
         |    CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END
         |      AS text
         |  FROM v1 WHERE doc_id % 10 <> 0
         |  UNION ALL SELECT doc_id + 10000000, lang, 'recrawl ' || text
         |  FROM v1 WHERE doc_id % 13 = 0),
         |ct AS MATERIALIZED (SELECT doc_id, lang, text FROM v2
         |  WHERE doc_id % 29 <> 0),
         |c1 AS MATERIALIZED (SELECT doc_id, text FROM v1
         |  WHERE doc_id % 29 <> 0),
         |dd AS MATERIALIZED (SELECT ct.doc_id, ct.text FROM ct
         |  LEFT JOIN c1 USING (doc_id)
         |  WHERE c1.doc_id IS NULL OR c1.text <> ct.text),
         |bt AS (SELECT ${lowSeq("text")} AS toks FROM v1
         |  WHERE doc_id % 29 = 0),
         |bsh AS (SELECT DISTINCT unnest(list_distinct(
         |    [md5(array_to_string(toks[i:i+${Pipe15DeconK - 1}], ' '))
         |     for i in range(1, len(toks) - ${Pipe15DeconK - 2})])) AS sh
         |  FROM bt WHERE len(toks) >= $Pipe15DeconK),
         |csh AS (SELECT doc_id, unnest(list_distinct(
         |    [md5(array_to_string(toks[i:i+${Pipe15DeconK - 1}], ' '))
         |     for i in range(1, len(toks) - ${Pipe15DeconK - 2})])) AS sh
         |  FROM (SELECT doc_id, ${lowSeq("text")} AS toks FROM ct)
         |  WHERE len(toks) >= $Pipe15DeconK),
         |cont AS (SELECT DISTINCT doc_id FROM csh JOIN bsh USING (sh)),
         |gp AS (SELECT doc_id,
         |    CAST(len(${rawToks("text")}) AS BIGINT) AS n,
         |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS chars,
         |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS hashes,
         |    CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS dots,
         |    CAST(len(list_filter(${rawToks("text")}, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha,
         |    CAST(len(list_filter(${rawToks("text")}, x -> x IN ('the', 'a'))) AS BIGINT) AS stops
         |  FROM ct),
         |g AS (SELECT doc_id,
         |    CASE WHEN n >= 50 AND n <= 100000 THEN 1 ELSE 0 END
         |    * CASE WHEN 3 * n <= chars AND chars <= 10 * n THEN 1 ELSE 0 END
         |    * CASE WHEN 10 * (hashes + dots) < n THEN 1 ELSE 0 END
         |    * CASE WHEN 10 * alpha >= 8 * n THEN 1 ELSE 0 END
         |    * CASE WHEN stops >= 2 THEN 1 ELSE 0 END AS passes
         |  FROM gp),
         |c1t AS (SELECT doc_id, toks FROM
         |  (SELECT doc_id, ${lowSet("text")} AS toks FROM c1)
         |  WHERE len(toks) > 0),
         |dtt AS (SELECT doc_id, toks FROM
         |  (SELECT doc_id, ${lowSet("text")} AS toks FROM dd)
         |  WHERE len(toks) > 0),
         |allr AS (SELECT 'c' AS role, doc_id, toks FROM c1t
         |  UNION ALL SELECT 'd', doc_id, toks FROM dtt),
         |sig AS (SELECT role, doc_id,
         |  $sigs
         |FROM allr),
         |bands AS (SELECT role, doc_id, unnest([$bandKeys]) AS band
         |  FROM sig),
         |cand AS (SELECT DISTINCT bd.doc_id AS did, bc.doc_id AS cid
         |  FROM bands bd JOIN bands bc ON bd.band = bc.band
         |  WHERE bd.role = 'd' AND bc.role = 'c' AND bd.doc_id <> bc.doc_id),
         |dup AS (SELECT DISTINCT did AS doc_id FROM cand
         |  JOIN dtt td ON td.doc_id = did
         |  JOIN c1t tc ON tc.doc_id = cid
         |  WHERE CASE WHEN len(td.toks) + len(tc.toks)
         |        - len(list_intersect(td.toks, tc.toks)) > 0
         |      THEN CAST(len(list_intersect(td.toks, tc.toks)) AS DOUBLE)
         |        / (len(td.toks) + len(tc.toks)
         |           - len(list_intersect(td.toks, tc.toks)))
         |      ELSE 1.0 END >= $MinhashThreshold),
         |fl AS (SELECT ct.doc_id, ct.lang,
         |    CASE WHEN dd.doc_id IS NULL THEN 1 ELSE 0 END AS carried,
         |    g.passes,
         |    CASE WHEN cont.doc_id IS NOT NULL THEN 1 ELSE 0 END AS contam,
         |    CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END AS dup
         |  FROM ct
         |  LEFT JOIN (SELECT doc_id FROM dd) dd USING (doc_id)
         |  JOIN g USING (doc_id)
         |  LEFT JOIN cont USING (doc_id)
         |  LEFT JOIN dup USING (doc_id))
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(carried) AS BIGINT) AS n_carried,
         |  CAST(sum(1 - carried) AS BIGINT) AS n_delta,
         |  CAST(sum(1 - passes) AS BIGINT) AS n_gate_fail,
         |  CAST(sum(contam) AS BIGINT) AS n_contaminated,
         |  CAST(sum(dup) AS BIGINT) AS n_dup,
         |  CAST(sum(CASE WHEN passes = 1 AND contam = 0 AND dup = 0
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
         |  CAST(sum(CASE WHEN passes = 1 AND contam = 0 AND dup = 0
         |    THEN doc_id ELSE 0 END) AS BIGINT) AS sum_admitted_id
         |FROM fl GROUP BY lang ORDER BY lang""".stripMargin
    },

    "d19_incremental_decontam" ->
      s"""WITH v1 AS (SELECT doc_id, lang, text FROM documents),
         |v2 AS (SELECT doc_id, lang,
         |    CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END
         |      AS text
         |  FROM v1 WHERE doc_id % 10 <> 0
         |  UNION ALL SELECT doc_id + 10000000, lang, 'recrawl ' || text
         |  FROM v1 WHERE doc_id % 13 = 0),
         |bt AS (SELECT ${lowSeq("text")} AS toks FROM v1
         |  WHERE doc_id % 29 = 0),
         |bsh AS (SELECT DISTINCT unnest(list_distinct(
         |    [md5(array_to_string(toks[i:i+2], ' ')) for i in range(1, len(toks) - 1)])) AS sh
         |  FROM bt WHERE len(toks) >= 3),
         |ct AS MATERIALIZED (SELECT doc_id, lang, ${lowSeq("text")} AS toks
         |  FROM v2 WHERE doc_id % 29 <> 0),
         |csh AS (SELECT doc_id, unnest(list_distinct(
         |    [md5(array_to_string(toks[i:i+2], ' ')) for i in range(1, len(toks) - 1)])) AS sh
         |  FROM ct WHERE len(toks) >= 3),
         |cont AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |  FROM csh JOIN bsh USING (sh) GROUP BY 1)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_contaminated,
         |  CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
         |  CAST(sum(n_shared) AS BIGINT) AS sum_shared
         |FROM cont JOIN ct USING (doc_id)
         |GROUP BY lang ORDER BY lang""".stripMargin,

    // o11: exact percentiles over integer per-key counts via the
    // histogram walk (both engines compare 100·cum >= p·n on exact
    // integers); HUGEINT window sums cast back to BIGINT
    "o11_hotkey_census" ->
      s"""WITH cnts AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1),
         |hist AS (SELECT c, CAST(count(*) AS BIGINT) AS nk
         |  FROM cnts GROUP BY 1),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(c) AS BIGINT) AS tot, CAST(max(c) AS BIGINT) AS mx
         |  FROM cnts),
         |wk AS (SELECT c, CAST(sum(nk) OVER (ORDER BY c) AS BIGINT) AS cum
         |  FROM hist),
         |st AS (SELECT
         |  (SELECT min(c) FROM wk CROSS JOIN agg
         |     WHERE cum * 100 >= 50 * n) AS p50,
         |  (SELECT min(c) FROM wk CROSS JOIN agg
         |     WHERE cum * 100 >= 90 * n) AS p90,
         |  (SELECT min(c) FROM wk CROSS JOIN agg
         |     WHERE cum * 100 >= 99 * n) AS p99,
         |  (SELECT mx FROM agg) AS mxv,
         |  (SELECT n FROM agg) AS nv,
         |  (SELECT tot * 1000000 // n FROM agg) AS meanv,
         |  (SELECT mx * 1000000 // greatest(tot // n, 1) FROM agg) AS skewv)
         |SELECT stat, value FROM (
         |  SELECT 'p50_count' AS stat, p50 AS value FROM st
         |  UNION ALL SELECT 'p90_count', p90 FROM st
         |  UNION ALL SELECT 'p99_count', p99 FROM st
         |  UNION ALL SELECT 'max_count', mxv FROM st
         |  UNION ALL SELECT 'n_keys', nv FROM st
         |  UNION ALL SELECT 'mean_count_micro', meanv FROM st
         |  UNION ALL SELECT 'skew_ppm', skewv FROM st)
         |ORDER BY stat""".stripMargin,

    // k10: both contamination censuses recomputed FULL-SCAN (v1 and v2),
    // so hash equality proves the engine's staged-v1 + incremental-v2
    // composition ≡ the from-scratch drift
    "k10_contamination_drift" ->
      s"""WITH v1 AS (SELECT doc_id, lang, text FROM documents),
         |v2 AS (SELECT doc_id, lang,
         |    CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END
         |      AS text
         |  FROM v1 WHERE doc_id % 10 <> 0
         |  UNION ALL SELECT doc_id + 10000000, lang, 'recrawl ' || text
         |  FROM v1 WHERE doc_id % 13 = 0),
         |bt AS (SELECT ${lowSeq("text")} AS toks FROM v1
         |  WHERE doc_id % 29 = 0),
         |bsh AS (SELECT DISTINCT unnest(list_distinct(
         |    [md5(array_to_string(toks[i:i+2], ' ')) for i in range(1, len(toks) - 1)])) AS sh
         |  FROM bt WHERE len(toks) >= 3),
         |ct1 AS MATERIALIZED (SELECT doc_id, lang, ${lowSeq("text")} AS toks
         |  FROM v1 WHERE doc_id % 29 <> 0),
         |ct2 AS MATERIALIZED (SELECT doc_id, lang, ${lowSeq("text")} AS toks
         |  FROM v2 WHERE doc_id % 29 <> 0),
         |csh1 AS (SELECT doc_id, unnest(list_distinct(
         |    [md5(array_to_string(toks[i:i+2], ' ')) for i in range(1, len(toks) - 1)])) AS sh
         |  FROM ct1 WHERE len(toks) >= 3),
         |csh2 AS (SELECT doc_id, unnest(list_distinct(
         |    [md5(array_to_string(toks[i:i+2], ' ')) for i in range(1, len(toks) - 1)])) AS sh
         |  FROM ct2 WHERE len(toks) >= 3),
         |cont1 AS (SELECT DISTINCT csh1.doc_id FROM csh1 JOIN bsh USING (sh)),
         |cont2 AS (SELECT DISTINCT csh2.doc_id FROM csh2 JOIN bsh USING (sh)),
         |cen1 AS (SELECT lang, CAST(count(*) AS BIGINT) AS n1
         |  FROM cont1 JOIN ct1 USING (doc_id) GROUP BY 1),
         |cen2 AS (SELECT lang, CAST(count(*) AS BIGINT) AS n2
         |  FROM cont2 JOIN ct2 USING (doc_id) GROUP BY 1),
         |tot1 AS (SELECT lang, CAST(count(*) AS BIGINT) AS t1
         |  FROM ct1 GROUP BY 1),
         |tot2 AS (SELECT lang, CAST(count(*) AS BIGINT) AS t2
         |  FROM ct2 GROUP BY 1),
         |f AS (SELECT lang,
         |    COALESCE(n1, 0) AS n_contam_v1, COALESCE(n2, 0) AS n_contam_v2,
         |    COALESCE(n1, 0) * 1000000 // COALESCE(t1, 1) AS share_v1_ppm,
         |    COALESCE(n2, 0) * 1000000 // COALESCE(t2, 1) AS share_v2_ppm
         |  FROM tot1 FULL JOIN tot2 USING (lang)
         |    LEFT JOIN cen1 USING (lang) LEFT JOIN cen2 USING (lang))
         |SELECT lang, n_contam_v1, n_contam_v2, share_v1_ppm, share_v2_ppm,
         |  abs(share_v1_ppm - share_v2_ppm) AS drift_ppm
         |FROM f ORDER BY lang""".stripMargin,

    // t15: each Gopher rule as an integer comparison (no division, so no
    // rounding seam between engines); symbols = '#' chars + '...' runs
    "t15_gopher_rules" ->
      s"""WITH t AS (SELECT doc_id,
         |    CAST(len(${rawToks("text")}) AS BIGINT) AS n,
         |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS chars,
         |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS hashes,
         |    CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS dots,
         |    CAST(len(list_filter(${rawToks("text")}, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha,
         |    CAST(len(list_filter(${rawToks("text")}, x -> x IN ('the', 'a'))) AS BIGINT) AS stops
         |  FROM documents),
         |r AS (SELECT doc_id, n,
         |    CASE WHEN n >= 50 AND n <= 100000 THEN 1 ELSE 0 END AS r_words,
         |    CASE WHEN 3 * n <= chars AND chars <= 10 * n THEN 1 ELSE 0 END AS r_mean_len,
         |    CASE WHEN 10 * (hashes + dots) < n THEN 1 ELSE 0 END AS r_symbol,
         |    CASE WHEN 10 * alpha >= 8 * n THEN 1 ELSE 0 END AS r_alpha,
         |    CASE WHEN stops >= 2 THEN 1 ELSE 0 END AS r_stop
         |  FROM t)
         |SELECT doc_id, n AS n_tokens, r_words, r_mean_len, r_symbol,
         |  r_alpha, r_stop,
         |  r_words * r_mean_len * r_symbol * r_alpha * r_stop AS passes
         |FROM r ORDER BY doc_id""".stripMargin,

    // t26: the synthetic page is built with the same string algebra as
    // HtmlExtract.syntheticPage (|| is null-safe here: no null inputs),
    // then the extraction replayed: script/style strip ('g' flag — DuckDB
    // replaces only the first match by default), '\n' block split,
    // per-block anchor-char/word-count/link-density features, kept-block
    // reassembly, Gopher gate on the extract (t15's integer twin).
    "t26_html_extract" ->
      s"""WITH t AS (SELECT doc_id, lang, source, ${rawToks("text")} AS toks
         |  FROM documents),
         |pg AS (SELECT doc_id,
         |  '<html><head><title>Doc ' || doc_id || '</title><style>p { margin: 0; }</style><script>var tracker = "x"; load();</script></head><body>' || chr(10) ||
         |  '<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/archive">' || lang || ' archive</a></nav>' || chr(10) ||
         |  array_to_string(list_transform(
         |      range(1, CAST(ceil(len(toks)/20.0) AS BIGINT) + 1),
         |      i -> '<p>' || array_to_string(toks[((i-1)*20+1):(i*20)], ' ')
         |        || '</p>'), chr(10)) || chr(10) ||
         |  '<div class="promo"><a href="/buy">Buy now</a> top deals <a href="/go">click here</a></div>' || chr(10) ||
         |  '<footer>Copyright 2026 ' || source || ' <a href="/terms">Terms</a> <a href="/privacy">Privacy</a></footer></body></html>' AS html
         |  FROM t),
         |bl AS (SELECT doc_id,
         |  string_split(regexp_replace(regexp_replace(html,
         |    '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
         |    '(?s)<style[^>]*>.*?</style>', ' ', 'g'), chr(10)) AS blocks
         |  FROM pg),
         |f0 AS (SELECT doc_id, list_transform(blocks, b -> struct_pack(
         |    txt := trim(regexp_replace(regexp_replace(b,
         |      '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g')),
         |    anchors := CAST(coalesce(list_sum(list_transform(
         |      regexp_extract_all(b, '<a [^>]*>([^<]*)</a>', 1),
         |      a -> length(replace(a, ' ', '')))), 0) AS BIGINT))) AS f0
         |  FROM bl),
         |ks AS (SELECT doc_id, list_transform(f0, f -> struct_pack(
         |    txt := f.txt, anchors := f.anchors,
         |    keep := len(list_filter(string_split(f.txt, ' '),
         |        x -> x <> '')) >= ${HtmlExtract.MinBlockWords}
         |      AND f.anchors * ${HtmlExtract.LinkDensityDen}
         |        < CAST(length(replace(f.txt, ' ', '')) AS BIGINT)
         |          * ${HtmlExtract.LinkDensityNum})) AS fs
         |  FROM f0),
         |cl AS (SELECT doc_id, fs,
         |  array_to_string(list_transform(list_filter(fs, f -> f.keep),
         |    f -> f.txt), ' ') AS clean
         |  FROM ks),
         |g AS (SELECT doc_id, fs, clean,
         |    CAST(len(${rawToks("clean")}) AS BIGINT) AS n,
         |    CAST(length(regexp_replace(clean, '\\s', '', 'g')) AS BIGINT) AS chars,
         |    CAST(length(clean) - length(replace(clean, '#', '')) AS BIGINT) AS hashes,
         |    CAST((length(clean) - length(replace(clean, '...', ''))) // 3 AS BIGINT) AS dots,
         |    CAST(len(list_filter(${rawToks("clean")}, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha,
         |    CAST(len(list_filter(${rawToks("clean")}, x -> x IN ('the', 'a'))) AS BIGINT) AS stops
         |  FROM cl)
         |SELECT doc_id,
         |  CAST(len(fs) AS BIGINT) AS n_blocks,
         |  CAST(len(list_filter(fs, f -> f.keep)) AS BIGINT) AS n_kept,
         |  CAST(coalesce(list_sum(list_transform(fs, f -> f.anchors)), 0)
         |    AS BIGINT) AS link_chars,
         |  n AS clean_words,
         |  CAST(length(replace(clean, ' ', '')) AS BIGINT) AS clean_chars,
         |  md5(clean) AS fp,
         |  CASE WHEN n >= 50 AND n <= 100000
         |    AND 3 * n <= chars AND chars <= 10 * n
         |    AND 10 * (hashes + dots) < n
         |    AND 10 * alpha >= 8 * n
         |    AND stops >= 2 THEN 1 ELSE 0 END AS passes
         |FROM g ORDER BY doc_id""".stripMargin,

    // t27: raw URLs synthesized with the same string algebra as
    // UrlNormalize.syntheticUrl (bigints concat through || as in Spark's
    // cast-to-string), then the RFC 3986 §6 canonicalization replayed
    // rule-for-rule; clustering is two plain windows over the canonical key
    "t27_url_dedup" ->
      s"""WITH $urlSynthCtes,
         |$urlCanonCtes,
         |x AS (SELECT doc_id, raw_url,
         |    sch || '://' || hst || pth || qq AS canon_url FROM cn)
         |SELECT doc_id, raw_url, canon_url,
         |  count(*) OVER (PARTITION BY canon_url) AS cluster_size,
         |  CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY canon_url)
         |    THEN 1 ELSE 0 END AS keep
         |FROM x ORDER BY doc_id""".stripMargin,

    // t28: RRF fusion of t21's BM25 list (same CTE text → same doubles)
    // and s1's cosine ranker pinned to query vec 0; fused score in integer
    // parts-per-trillion via BIGINT floor division (`//`), so rank → score
    // is bit-exact. Depth caps make every post-ranker relation ≤10 rows.
    "t28_hybrid_rrf" -> {
      val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
      s"""WITH ${rrfCtes(termList)}
         |SELECT doc_id, CAST(rank_s AS BIGINT) AS rank_sparse,
         |  CAST(rank_d AS BIGINT) AS rank_dense, rrf_ppt
         |FROM fu ORDER BY rrf_ppt DESC, doc_id LIMIT $RrfTopK""".stripMargin
    },

    // s17: t28's fused-list CTEs (the SAME interpolated text — rrfCtes),
    // then the integer coverage scorer and a 10-row rerank window
    "s17_rerank" -> {
      val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
      val termArr = Bm25Terms.map(t => s"'$t'").mkString("[", ", ", "]")
      s"""WITH ${rrfCtes(termList)},
         |cand AS (SELECT doc_id, row_number()
         |    OVER (ORDER BY rrf_ppt DESC, doc_id) AS rank_before
         |  FROM fu QUALIFY rank_before <= $RrfTopK),
         |sc2 AS (SELECT cand.doc_id, rank_before,
         |    CAST(len(list_intersect(list_distinct(t.toks), $termArr))
         |      AS BIGINT) AS terms_hit,
         |    CAST(len(list_filter(t.toks, x -> x IN ($termList)))
         |      AS BIGINT) AS tf_sum
         |  FROM cand JOIN dt t ON t.doc_id = cand.doc_id)
         |SELECT doc_id, CAST(rank_before AS BIGINT) AS rank_before,
         |  CAST(row_number() OVER (ORDER BY terms_hit DESC, tf_sum DESC,
         |    doc_id) AS BIGINT) AS rank_after,
         |  terms_hit, tf_sum
         |FROM sc2 ORDER BY rank_after""".stripMargin
    },

    // s18: t28's fused list (rrfCtes — the shared text), vector-capable
    // candidates only, then the greedy MMR selection unrolled as MmrK
    // chained argmax CTEs (greedy selection is sequential by definition;
    // the relations are all candidate-bounded). MATERIALIZED everywhere a
    // CTE is referenced more than once — DuckDB inlines per reference and
    // ce/ps/sel_i close over the corpus-grain rankers.
    "s18_mmr_diversify" -> {
      val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
      val steps = (2 to MmrK).map { i =>
        s"""sel$i AS MATERIALIZED (SELECT * FROM sel${i - 1} UNION ALL
           |  (SELECT c.doc_id, CAST($i AS BIGINT) AS mmr_rank, c.rel_ppm,
           |      m.max_sim_ppm,
           |      $MmrLambda10 * c.rel_ppm
           |        - ${10 - MmrLambda10} * m.max_sim_ppm AS mmr_score
           |    FROM ce c JOIN (SELECT a AS doc_id, max(sim_ppm) AS max_sim_ppm
           |        FROM ps WHERE b IN (SELECT doc_id FROM sel${i - 1})
           |        GROUP BY a) m USING (doc_id)
           |    WHERE c.doc_id NOT IN (SELECT doc_id FROM sel${i - 1})
           |    ORDER BY mmr_score DESC, c.doc_id LIMIT 1))""".stripMargin
      }.mkString(",\n")
      s"""WITH ${rrfCtes(termList)},
         |cand AS (SELECT doc_id, row_number()
         |    OVER (ORDER BY rrf_ppt DESC, doc_id) AS rank_fused
         |  FROM fu QUALIFY rank_fused <= $RrfTopK),
         |ce AS MATERIALIZED (SELECT cand.doc_id,
         |    CAST($RelScale AS BIGINT) // ($RrfK + rank_fused) AS rel_ppm,
         |    e.embedding AS emb
         |  FROM cand JOIN embeddings e ON e.vec_id = cand.doc_id),
         |ps AS MATERIALIZED (SELECT x.doc_id AS a, y.doc_id AS b,
         |    CAST(floor(${cosChain("x.emb", "y.emb")} * 1000000 + 0.5)
         |      AS BIGINT) AS sim_ppm
         |  FROM ce x JOIN ce y ON x.doc_id <> y.doc_id),
         |sel1 AS MATERIALIZED (SELECT doc_id, CAST(1 AS BIGINT) AS mmr_rank,
         |    rel_ppm, CAST(0 AS BIGINT) AS max_sim_ppm,
         |    $MmrLambda10 * rel_ppm AS mmr_score
         |  FROM ce ORDER BY rel_ppm DESC, doc_id LIMIT 1),
         |$steps
         |SELECT doc_id, mmr_rank, rel_ppm, max_sim_ppm, mmr_score
         |FROM sel$MmrK ORDER BY mmr_rank""".stripMargin
    },

    // pipe6: t26's page-synth + extraction chain (lang carried through),
    // Gopher gate on the extract, then the t27 URL canonicalization and two
    // cascading conditional-window keep elections (URL key, content key) —
    // the funnel census per lang. MATERIALIZED pins the html chain to one
    // evaluation (the bpeWith lesson: DuckDB inlines CTEs per reference).
    "pipe6_web_curation" ->
      s"""WITH $curationCtes
         |SELECT lang, count(*) AS n_raw,
         |  CAST(sum(CASE WHEN clean_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
         |  CAST(sum(CASE WHEN url_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_url_unique,
         |  CAST(sum(CASE WHEN final_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
         |  CAST(sum(CASE WHEN final_ok THEN words ELSE 0 END) AS BIGINT) AS final_words
         |FROM s3 GROUP BY lang ORDER BY lang""".stripMargin,

    // pipe7: the WARC mechanics (record synth, text-source split on the
    // record magic, header parse, payload strip) are the ENGINE's burden —
    // the oracle computes the expected census directly from documents via
    // the same t26 extraction chain (lang carried through), plus the
    // request-record count as a constant-shape group
    "pipe7_warc_ingest" ->
      s"""WITH t AS (SELECT doc_id, lang, source, ${rawToks("text")} AS toks
         |  FROM documents),
         |pg AS MATERIALIZED (SELECT doc_id, lang,
         |  '<html><head><title>Doc ' || doc_id || '</title><style>p { margin: 0; }</style><script>var tracker = "x"; load();</script></head><body>' || chr(10) ||
         |  '<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/archive">' || lang || ' archive</a></nav>' || chr(10) ||
         |  array_to_string(list_transform(
         |      range(1, CAST(ceil(len(toks)/20.0) AS BIGINT) + 1),
         |      i -> '<p>' || array_to_string(toks[((i-1)*20+1):(i*20)], ' ')
         |        || '</p>'), chr(10)) || chr(10) ||
         |  '<div class="promo"><a href="/buy">Buy now</a> top deals <a href="/go">click here</a></div>' || chr(10) ||
         |  '<footer>Copyright 2026 ' || source || ' <a href="/terms">Terms</a> <a href="/privacy">Privacy</a></footer></body></html>' AS html
         |  FROM t),
         |bl AS (SELECT doc_id, lang,
         |  string_split(regexp_replace(regexp_replace(html,
         |    '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
         |    '(?s)<style[^>]*>.*?</style>', ' ', 'g'), chr(10)) AS blocks
         |  FROM pg),
         |f0 AS (SELECT doc_id, lang, list_transform(blocks, b -> struct_pack(
         |    txt := trim(regexp_replace(regexp_replace(b,
         |      '<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g')),
         |    anchors := CAST(coalesce(list_sum(list_transform(
         |      regexp_extract_all(b, '<a [^>]*>([^<]*)</a>', 1),
         |      a -> length(replace(a, ' ', '')))), 0) AS BIGINT))) AS f0
         |  FROM bl),
         |cl AS MATERIALIZED (SELECT doc_id, lang,
         |  array_to_string(list_transform(list_filter(f0, f ->
         |    len(list_filter(string_split(f.txt, ' '), x -> x <> ''))
         |        >= ${HtmlExtract.MinBlockWords}
         |      AND f.anchors * ${HtmlExtract.LinkDensityDen}
         |        < CAST(length(replace(f.txt, ' ', '')) AS BIGINT)
         |          * ${HtmlExtract.LinkDensityNum}),
         |    f -> f.txt), ' ') AS clean
         |  FROM f0)
         |SELECT 'response' AS wtype, lang,
         |  CAST(count(*) AS BIGINT) AS n_records,
         |  CAST(sum(len(${rawToks("clean")})) AS BIGINT) AS clean_words,
         |  CAST(sum(${md5Hash15("clean")} % 1000000007) AS BIGINT) AS text_hash
         |FROM cl GROUP BY lang
         |UNION ALL SELECT 'request', '-', CAST(count(*) AS BIGINT),
         |  CAST(0 AS BIGINT), CAST(0 AS BIGINT)
         |FROM documents WHERE doc_id % 7 = 0
         |ORDER BY wtype, lang""".stripMargin,

    // t29: corruption synth repeated verbatim (chr(7)/chr(11) wrappers,
    // mojibake suffix; same CASE precedence), repair = global-flag regexp
    // strip + replace, census carries chars_removed + the k6 checksum
    "t29_fix_encoding" ->
      s"""WITH r AS (SELECT doc_id,
         |    CASE WHEN doc_id % 4 = 0 THEN chr(7) || text || chr(11)
         |      WHEN doc_id % 6 = 0 THEN text || ' CafÃ©'
         |      ELSE text END AS raw,
         |    CASE WHEN doc_id % 4 = 0 THEN 'control_stripped'
         |      WHEN doc_id % 6 = 0 THEN 'mojibake_fixed'
         |      ELSE 'clean' END AS status
         |  FROM documents),
         |f AS (SELECT doc_id, status, raw,
         |    replace(regexp_replace(raw,
         |      '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g'),
         |      'Ã©', 'é') AS fixed
         |  FROM r)
         |SELECT status, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(length(raw) - length(fixed)) AS BIGINT)
         |    AS chars_removed,
         |  CAST(sum(${md5Hash15("fixed")} % 1000000007) AS BIGINT)
         |    AS text_hash
         |FROM f GROUP BY status ORDER BY status""".stripMargin,

    // pipe8: the same portable md5 order key, per-shard exclusive running
    // token count, and integer window arithmetic (`//` = Spark's `div`)
    "pipe8_seq_pack" ->
      s"""WITH t AS (SELECT doc_id,
         |    CAST(len(${rawToks("text")}) AS BIGINT) AS toks,
         |    ${md5Hash15("CAST(doc_id AS VARCHAR)")} AS ord
         |  FROM documents),
         |s AS (SELECT doc_id, toks, ord, ord % $PackShards AS shard FROM t),
         |c AS (SELECT shard, toks,
         |    coalesce(sum(toks) OVER (PARTITION BY shard
         |      ORDER BY ord, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS cum_before
         |  FROM s)
         |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(toks) AS BIGINT) AS total_toks,
         |  CAST((sum(toks) + ${PackCtx - 1}) // $PackCtx AS BIGINT)
         |    AS n_windows,
         |  CAST(sum(CASE WHEN (cum_before + toks - 1) // $PackCtx
         |      > cum_before // $PackCtx THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_spanning,
         |  CAST((sum(toks) + ${PackCtx - 1}) // $PackCtx * $PackCtx
         |    - sum(toks) AS BIGINT) AS padding
         |FROM c GROUP BY shard ORDER BY shard""".stripMargin,

    // pipe10: the naive single-window form of the engine's two-phase
    // selection — per-lang md5-ordered exclusive running token count,
    // kept while it is under the integer lang target. Identical result
    // by construction: the engine's bucket split is a range partition of
    // the same order key.
    "pipe10_mix_budget" -> {
      val vals = MixWeightsPpm
        .map { case (l, w) => s"('$l', $w)" }.mkString(", ")
      s"""WITH w(lang, w_ppm) AS (VALUES $vals),
         |t AS (SELECT doc_id, lang,
         |    CAST(len(${rawToks("text")}) AS BIGINT) AS toks,
         |    ${md5Hash15("'mix:' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents),
         |t2 AS (SELECT * FROM t WHERE toks > 0),
         |tot AS (SELECT sum(toks) AS total FROM t2),
         |tgt AS (SELECT lang,
         |    (((CAST((SELECT total FROM tot) AS BIGINT) * $MixFracPpm)
         |      // 1000000) * w_ppm) // 1000000 AS target
         |  FROM w),
         |c AS (SELECT t2.*, tgt.target,
         |    coalesce(sum(toks) OVER (PARTITION BY t2.lang
         |      ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS cumb
         |  FROM t2 JOIN tgt USING (lang))
         |SELECT lang, max(target) AS target_toks,
         |  CAST(count(*) AS BIGINT) AS kept_docs,
         |  CAST(sum(toks) AS BIGINT) AS kept_toks,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM c WHERE cumb < target
         |GROUP BY lang ORDER BY lang""".stripMargin
    },

    // pipe15: the whole epoch spine recomputed from scratch — the shared
    // curationCtes funnel, d7's shingle decontamination (8-gram gating
    // grain, Pipe15DeconK) over the
    // survivors' CLEAN text (mod-29 split), pipe10's naive single-window
    // mix selection (provably equal to the engine's two-phase bucket
    // split), pipe8's integer packing algebra per lang, and the m6
    // manifest algebra per shard — one mis-gated / mis-deduped /
    // wrongly-decontaminated / mis-selected / mis-sharded doc hash-fails
    "pipe15_epoch_spine" -> {
      val vals = MixWeightsPpm
        .map { case (l, w) => s"('$l', $w)" }.mkString(", ")
      s"""WITH $curationCtes,
         |ct AS (SELECT doc_id, ${lowSeq("clean")} AS ctoks FROM cl),
         |shd AS (SELECT doc_id, unnest(list_distinct(
         |    [md5(array_to_string(ctoks[i:i+${Pipe15DeconK - 1}], ' '))
         |     for i in range(1, len(ctoks) - ${Pipe15DeconK - 2})])) AS sh
         |  FROM ct WHERE len(ctoks) >= $Pipe15DeconK),
         |bench AS (SELECT DISTINCT sh FROM shd WHERE doc_id % 29 = 0),
         |corpids AS (SELECT doc_id FROM s3
         |  WHERE final_ok AND doc_id % 29 <> 0),
         |contam AS (SELECT DISTINCT d.doc_id FROM shd d
         |  JOIN corpids c ON c.doc_id = d.doc_id
         |  JOIN bench b ON b.sh = d.sh),
         |fl AS (SELECT s3.*, final_ok AND doc_id % 29 <> 0
         |    AND doc_id NOT IN (SELECT doc_id FROM contam) AS decon_ok
         |  FROM s3),
         |wts(lang, w_ppm) AS (VALUES $vals),
         |mt AS (SELECT doc_id, lang, words AS toks,
         |    ${md5Hash15("'mix:' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM fl WHERE decon_ok AND words > 0),
         |tot AS (SELECT sum(toks) AS total FROM mt),
         |tgt AS (SELECT lang,
         |    (((CAST((SELECT total FROM tot) AS BIGINT) * $MixFracPpm)
         |      // 1000000) * w_ppm) // 1000000 AS target
         |  FROM wts),
         |mc AS (SELECT mt.*, tgt.target,
         |    coalesce(sum(toks) OVER (PARTITION BY mt.lang
         |      ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS cumb
         |  FROM mt JOIN tgt USING (lang)),
         |kp AS (SELECT doc_id, lang, toks,
         |    ${md5Hash15("'mshard:' || CAST(doc_id AS VARCHAR)")} AS sh2,
         |    target
         |  FROM mc WHERE cumb < target),
         |rows_out AS (
         |SELECT 'funnel' AS section, lang || '|0_raw' AS k,
         |  CAST(count(*) AS BIGINT) AS cnt, CAST(sum(words) AS BIGINT)
         |    AS toks, CAST(0 AS BIGINT) AS aux FROM fl GROUP BY lang
         |UNION ALL SELECT 'funnel', lang || '|1_clean',
         |  CAST(count(*) AS BIGINT), CAST(sum(words) AS BIGINT),
         |  CAST(0 AS BIGINT) FROM fl WHERE clean_ok GROUP BY lang
         |UNION ALL SELECT 'funnel', lang || '|2_url',
         |  CAST(count(*) AS BIGINT), CAST(sum(words) AS BIGINT),
         |  CAST(0 AS BIGINT) FROM fl WHERE url_ok GROUP BY lang
         |UNION ALL SELECT 'funnel', lang || '|3_uniq',
         |  CAST(count(*) AS BIGINT), CAST(sum(words) AS BIGINT),
         |  CAST(0 AS BIGINT) FROM fl WHERE final_ok GROUP BY lang
         |UNION ALL SELECT 'funnel', lang || '|4_decon',
         |  CAST(count(*) AS BIGINT), CAST(sum(words) AS BIGINT),
         |  CAST(0 AS BIGINT) FROM fl WHERE decon_ok GROUP BY lang
         |UNION ALL SELECT 'funnel', lang || '|5_mix',
         |  CAST(count(*) AS BIGINT), CAST(sum(toks) AS BIGINT),
         |  CAST(max(target) AS BIGINT) FROM kp GROUP BY lang
         |UNION ALL SELECT 'pack', lang,
         |  CAST((sum(toks) + ${PackCtx - 1}) // $PackCtx AS BIGINT),
         |  CAST((sum(toks) + ${PackCtx - 1}) // $PackCtx * $PackCtx
         |    - sum(toks) AS BIGINT),
         |  CAST(0 AS BIGINT) FROM kp GROUP BY lang
         |UNION ALL SELECT 'shard', CAST(sh2 % $PackShards AS VARCHAR),
         |  CAST(count(*) AS BIGINT), CAST(sum(toks) AS BIGINT),
         |  CAST(sum(sh2 % 1000000007) AS BIGINT) FROM kp
         |  GROUP BY sh2 % $PackShards)
         |SELECT * FROM rows_out ORDER BY section, k""".stripMargin
    },

    // pipe16: the STREAMING epoch spine unrolled from scratch — the
    // w16/w20 proof shape chained through TWO state planes at once: the
    // admission index (append-back across batches) AND the mix ledger
    // (running per-lang token usage vs the base-derived target). Curation
    // is the shared curationTextCtes text; decon is pipe15's 8-gram SQL
    // against the base's mod-29 class; admission is w16's sig/band/verify
    // SQL over CLEAN text; the mix window repeats the engine's
    // doc_id-order crossing rule per batch with the used-state folded
    // forward. One doc wrong anywhere in any round hash-fails.
    "pipe16_stream_epoch" -> {
      val sigs = (0 until MinhashK).map(i =>
        s"list_min(list_transform(shs, x -> md5('$i:' || x))) AS m$i")
        .mkString(",\n  ")
      val rows = MinhashK / MinhashBands
      val bandKeys = (0 until MinhashBands).map { b =>
        val parts = (b * rows until (b + 1) * rows).map(i => s"m$i")
          .mkString(" || ',' || ")
        s"'$b|' || md5($parts)"
      }.mkString(", ")
      val concat3 = (0 until W16ShingleK)
        .map(j => if (j == 0) "tk[i]" else s"tk[i+$j]")
        .mkString(" || ' ' || ")
      def jac(a: String, b: String) = {
        val inter = s"CAST(len(list_intersect($a.shs, $b.shs)) AS DOUBLE)"
        s"""CASE WHEN CAST(len($a.shs) + len($b.shs) AS DOUBLE) - $inter > 0
           |    THEN $inter / (CAST(len($a.shs) + len($b.shs) AS DOUBLE) - $inter)
           |    ELSE 1.0 END""".stripMargin
      }
      val vals = MixWeightsPpm
        .map { case (l, w) => s"('$l', $w)" }.mkString(", ")
      val rounds = (0 until Pipe16Batches).map { b =>
        s"""cb$b AS (SELECT n.doc_id, n.band FROM bnd n
           |  JOIN dec ON dec.doc_id = n.doc_id AND dec.b = $b),
           |inbc$b AS (SELECT DISTINCT a.doc_id AS ia, c.doc_id AS ib
           |  FROM cb$b a JOIN cb$b c ON a.band = c.band
           |    AND a.doc_id < c.doc_id),
           |inb$b AS (SELECT DISTINCT ib AS doc_id FROM inbc$b
           |  JOIN shg sa ON sa.doc_id = ia JOIN shg sb ON sb.doc_id = ib
           |  WHERE ${jac("sa", "sb")} >= $MinhashThreshold),
           |imc$b AS (SELECT DISTINCT d.doc_id AS ia, i.doc_id AS ib
           |  FROM cb$b d JOIN bnd i ON d.band = i.band
           |  JOIN idx$b x ON x.doc_id = i.doc_id),
           |im$b AS (SELECT DISTINCT ia AS doc_id FROM imc$b
           |  JOIN shg sa ON sa.doc_id = ia JOIN shg sb ON sb.doc_id = ib
           |  WHERE ${jac("sa", "sb")} >= $MinhashThreshold),
           |adm$b AS MATERIALIZED (SELECT doc_id FROM dec WHERE b = $b
           |  AND doc_id NOT IN (SELECT doc_id FROM inb$b)
           |  AND doc_id NOT IN (SELECT doc_id FROM im$b)),
           |idx${b + 1} AS MATERIALIZED (SELECT doc_id FROM idx$b
           |  UNION ALL SELECT doc_id FROM adm$b),
           |mx$b AS (SELECT d.doc_id, d.lang, d.words,
           |    coalesce(sum(d.words) OVER (PARTITION BY d.lang
           |      ORDER BY d.doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS cumb
           |  FROM adm$b a JOIN dec d ON d.doc_id = a.doc_id),
           |mix$b AS MATERIALIZED (SELECT m.doc_id, m.lang, m.words
           |  FROM mx$b m
           |  JOIN tgt ON tgt.lang = m.lang
           |  JOIN used$b u ON u.lang = m.lang
           |  WHERE u.used + m.cumb < tgt.target),
           |used${b + 1} AS MATERIALIZED (SELECT u.lang,
           |    u.used + COALESCE(g.tk, 0) AS used
           |  FROM used$b u LEFT JOIN (SELECT lang,
           |      CAST(sum(words) AS BIGINT) AS tk
           |    FROM mix$b GROUP BY lang) g USING (lang))""".stripMargin
      }.mkString(",\n")
      val admAll = (0 until Pipe16Batches)
        .map(b => s"SELECT doc_id FROM adm$b").mkString(" UNION ALL ")
      val mixAll = (0 until Pipe16Batches)
        .map(b => s"SELECT doc_id, lang, words FROM mix$b")
        .mkString(" UNION ALL ")
      def funnelArm(stage: String, cond: String) =
        s"""UNION ALL SELECT 'funnel',
           |  'b' || CAST(b AS VARCHAR) || '|' || lang || '|$stage',
           |  CAST(count(*) AS BIGINT), CAST(sum(words) AS BIGINT),
           |  CAST(0 AS BIGINT) FROM fl WHERE $cond GROUP BY b, lang""".stripMargin
      s"""WITH $curationTextCtes,
         |cw AS MATERIALIZED (SELECT ok.doc_id, ok.lang, ok.words,
         |    ok.clean_ok, cl.clean
         |  FROM ok JOIN cl ON cl.doc_id = ok.doc_id),
         |dd AS (SELECT doc_id, (doc_id // 2) % $Pipe16Batches AS b
         |  FROM documents WHERE doc_id % 2 = 1),
         |bmeta AS (SELECT CAST(sum(words) AS BIGINT) AS bt FROM cw
         |  WHERE doc_id % 2 = 0 AND clean_ok),
         |wts(lang, w_ppm) AS (VALUES $vals),
         |tgt AS (SELECT lang,
         |    ((((SELECT bt FROM bmeta) * $MixFracPpm) // 1000000) * w_ppm)
         |      // 1000000 AS target
         |  FROM wts),
         |used0 AS (SELECT lang, CAST(0 AS BIGINT) AS used FROM wts),
         |bsh AS (SELECT DISTINCT unnest(list_distinct(
         |    [md5(array_to_string(ctoks[i:i+${Pipe15DeconK - 1}], ' '))
         |     for i in range(1, len(ctoks) - ${Pipe15DeconK - 2})])) AS sh
         |  FROM (SELECT ${lowSeq("clean")} AS ctoks FROM cw
         |    WHERE doc_id % 2 = 0 AND doc_id % 29 = 0)
         |  WHERE len(ctoks) >= $Pipe15DeconK),
         |csh AS (SELECT doc_id, unnest(list_distinct(
         |    [md5(array_to_string(ctoks[i:i+${Pipe15DeconK - 1}], ' '))
         |     for i in range(1, len(ctoks) - ${Pipe15DeconK - 2})])) AS sh
         |  FROM (SELECT cw.doc_id, ${lowSeq("clean")} AS ctoks FROM cw
         |    JOIN dd ON dd.doc_id = cw.doc_id WHERE cw.clean_ok)
         |  WHERE len(ctoks) >= $Pipe15DeconK),
         |cont AS (SELECT DISTINCT doc_id FROM csh JOIN bsh USING (sh)),
         |dec AS MATERIALIZED (SELECT cw.doc_id, cw.lang, cw.words, dd.b
         |  FROM cw JOIN dd ON dd.doc_id = cw.doc_id
         |  WHERE cw.clean_ok
         |    AND cw.doc_id NOT IN (SELECT doc_id FROM cont)),
         |shg AS MATERIALIZED (SELECT doc_id, list_distinct(
         |    [md5($concat3) for i in range(1, len(tk) - ${W16ShingleK - 2})])
         |    AS shs
         |  FROM (SELECT doc_id, ${lowSeq("clean")} AS tk FROM cw)
         |  WHERE len(tk) >= $W16ShingleK),
         |sig AS (SELECT doc_id,
         |  $sigs
         |FROM shg),
         |bnd AS MATERIALIZED (SELECT doc_id, unnest([$bandKeys]) AS band
         |  FROM sig),
         |idx0 AS (SELECT doc_id FROM cw
         |  WHERE doc_id % 2 = 0 AND clean_ok),
         |$rounds,
         |admall AS MATERIALIZED (SELECT DISTINCT doc_id FROM ($admAll)),
         |mixall AS MATERIALIZED (SELECT doc_id, lang, words
         |  FROM ($mixAll)),
         |fl AS MATERIALIZED (SELECT dd.b, cw.lang, cw.words,
         |    CASE WHEN cw.clean_ok THEN 1 ELSE 0 END AS s1,
         |    CASE WHEN dc.doc_id IS NOT NULL THEN 1 ELSE 0 END AS s2,
         |    CASE WHEN am.doc_id IS NOT NULL THEN 1 ELSE 0 END AS s3,
         |    CASE WHEN mx.doc_id IS NOT NULL THEN 1 ELSE 0 END AS s4
         |  FROM dd JOIN cw ON cw.doc_id = dd.doc_id
         |  LEFT JOIN (SELECT doc_id FROM dec) dc ON dc.doc_id = dd.doc_id
         |  LEFT JOIN admall am ON am.doc_id = dd.doc_id
         |  LEFT JOIN (SELECT doc_id FROM mixall) mx
         |    ON mx.doc_id = dd.doc_id),
         |rows_out AS (
         |SELECT 'funnel' AS section,
         |  'b' || CAST(b AS VARCHAR) || '|' || lang || '|0_arrived' AS k,
         |  CAST(count(*) AS BIGINT) AS cnt,
         |  CAST(sum(words) AS BIGINT) AS toks, CAST(0 AS BIGINT) AS aux
         |FROM fl GROUP BY b, lang
         |${funnelArm("1_clean", "s1 = 1")}
         |${funnelArm("2_decon", "s2 = 1")}
         |${funnelArm("3_admit", "s3 = 1")}
         |${funnelArm("4_mix", "s4 = 1")}
         |UNION ALL SELECT 'ledger', tgt.lang,
         |  CAST(COALESCE(g.cnt, 0) AS BIGINT),
         |  CAST(COALESCE(g.toks, 0) AS BIGINT),
         |  CAST(tgt.target AS BIGINT)
         |FROM tgt LEFT JOIN (SELECT lang, count(*) AS cnt,
         |    sum(words) AS toks FROM mixall GROUP BY lang) g
         |  USING (lang)
         |UNION ALL SELECT 'shard', CAST(h % $PackShards AS VARCHAR),
         |  CAST(count(*) AS BIGINT), CAST(sum(words) AS BIGINT),
         |  CAST(sum(h % 1000000007) AS BIGINT)
         |FROM (SELECT words,
         |    ${md5Hash15("'p16shard:' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM mixall)
         |  GROUP BY h % $PackShards)
         |SELECT * FROM rows_out ORDER BY section, k""".stripMargin
    },

    // pipe9: the WARC mechanics are the ENGINE's burden (pipe7's
    // convention); the oracle replays the shared curation funnel
    // (curationCtes — the same text as pipe6) and packs the SURVIVORS'
    // clean-token counts with pipe8's integer packing algebra
    "pipe9_crawl_shards" ->
      s"""WITH $curationCtes,
         |pk AS (SELECT doc_id, words AS toks,
         |    ${md5Hash15("CAST(doc_id AS VARCHAR)")} AS ord
         |  FROM s3 WHERE final_ok),
         |sh AS (SELECT doc_id, toks, ord, ord % $PackShards AS shard
         |  FROM pk),
         |c AS (SELECT shard, toks,
         |    coalesce(sum(toks) OVER (PARTITION BY shard
         |      ORDER BY ord, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS cum_before
         |  FROM sh)
         |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(toks) AS BIGINT) AS total_toks,
         |  CAST((sum(toks) + ${PackCtx - 1}) // $PackCtx AS BIGINT)
         |    AS n_windows,
         |  CAST(sum(CASE WHEN (cum_before + toks - 1) // $PackCtx
         |      > cum_before // $PackCtx THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_spanning,
         |  CAST((sum(toks) + ${PackCtx - 1}) // $PackCtx * $PackCtx
         |    - sum(toks) AS BIGINT) AS padding
         |FROM c GROUP BY shard ORDER BY shard""".stripMargin,

    // d12: stride-1 window fingerprints with POSITION (lateral range), dup
    // election by global count >= 2, then a per-doc islands merge of the
    // k-long spans; docs shorter than k keep n_dup_tokens = 0
    "d12_substring_dedup" ->
      s"""WITH t AS (SELECT doc_id, ${lowSeq("text")} AS toks FROM documents),
         |n AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t),
         |w AS (SELECT doc_id, i AS idx,
         |    md5(array_to_string(toks[i:i+${SubstrK - 1}], ' ')) AS fp
         |  FROM t, unnest(range(1, len(toks) - $SubstrK + 2)) r(i)
         |  WHERE len(toks) >= $SubstrK),
         |dup AS (SELECT fp FROM w GROUP BY fp HAVING count(*) >= 2),
         |dw AS (SELECT doc_id, idx FROM w SEMI JOIN dup USING (fp)),
         |isl AS (SELECT doc_id, idx,
         |    CASE WHEN lag(idx) OVER (PARTITION BY doc_id ORDER BY idx) IS NULL
         |           OR idx > lag(idx) OVER (PARTITION BY doc_id ORDER BY idx) + $SubstrK
         |         THEN 1 ELSE 0 END AS brk
         |  FROM dw),
         |isl2 AS (SELECT doc_id, idx,
         |    sum(brk) OVER (PARTITION BY doc_id ORDER BY idx) AS island
         |  FROM isl),
         |spans AS (SELECT doc_id,
         |    CAST(max(idx) - min(idx) + $SubstrK AS BIGINT) AS span
         |  FROM isl2 GROUP BY doc_id, island)
         |SELECT n.doc_id, n_tokens,
         |  coalesce(CAST(sum(span) AS BIGINT), CAST(0 AS BIGINT)) AS n_dup_tokens
         |FROM n LEFT JOIN spans USING (doc_id)
         |GROUP BY 1, 2 ORDER BY doc_id""".stripMargin,

    "t6_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
        |  CASE lang WHEN 'en' THEN '40' WHEN 'zh' THEN 'c0' ELSE '80' END
        |ORDER BY doc_id""".stripMargin,

    // t32: per-doc distinct 3-gram shingles (t7's comprehension), global
    // first-occurrence election by min doc_id, per-source rollup
    "t32_novelty_census" ->
      s"""WITH t AS (SELECT doc_id, source, ${lowSeq("text")} AS toks
         |  FROM documents),
         |gr AS (SELECT doc_id, source,
         |    unnest(list_distinct([md5(array_to_string(toks[i:i+2], ' '))
         |                          for i in range(1, len(toks) - 1)])) AS g
         |  FROM t WHERE len(toks) >= 3),
         |f AS (SELECT g, min(doc_id) AS first_doc FROM gr GROUP BY 1),
         |j AS (SELECT source, doc_id, first_doc FROM gr JOIN f USING (g))
         |SELECT source, CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_novel,
         |  CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)
         |    * 1000000 // count(*) AS BIGINT) AS novelty_ppm
         |FROM j GROUP BY 1 ORDER BY source""".stripMargin,

    "t7_repetition" ->
      s"""WITH t AS (SELECT doc_id, ${lowSeq("text")} AS toks FROM documents),
         |c AS (SELECT doc_id,
         |  greatest(len(toks) - 2, 0) AS total,
         |  CASE WHEN len(toks) >= 3
         |    THEN len(list_distinct([md5(array_to_string(toks[i:i+2], ' '))
         |                            for i in range(1, len(toks) - 1)]))
         |    ELSE 0 END AS dis
         |FROM t)
         |SELECT doc_id, CAST(total AS BIGINT) AS total_3grams,
         |  CAST(dis AS BIGINT) AS distinct_3grams,
         |  round(CASE WHEN total > 0 THEN 1 - CAST(dis AS DOUBLE) / total
         |        ELSE 0.0 END, 6) AS rep_ratio
         |FROM c ORDER BY doc_id""".stripMargin,

    "t8_length_quantiles" ->
      """SELECT lang,
        |  quantile_cont(n_chars, 0.5) AS p50,
        |  quantile_cont(n_chars, 0.9) AS p90,
        |  quantile_cont(n_chars, 0.99) AS p99,
        |  count(*) AS n_docs
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "t9_sequence_packing" ->
      """WITH p AS (SELECT lang, doc_id, n_chars,
        |  CAST(COALESCE(sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prefix_chars
        |FROM documents)
        |SELECT lang, doc_id, n_chars, prefix_chars,
        |  CAST(floor(prefix_chars / 4096.0) AS BIGINT) AS seq_id
        |FROM p ORDER BY lang, doc_id""".stripMargin,

    "t10_redaction" ->
      """SELECT event_id, regexp_replace(props, '[0-9]+', '#', 'g') AS redacted,
        |  CAST(length(props) - length(regexp_replace(props, '[0-9]', '', 'g')) AS BIGINT) AS n_digit_chars
        |FROM events ORDER BY event_id""".stripMargin,

    "t11_top_ngrams" ->
      s"""WITH t AS (SELECT lang, ${lowSeq("text")} AS toks FROM documents),
         |b AS (SELECT lang, unnest([toks[i] || ' ' || toks[i+1]
         |    for i in range(1, len(toks))]) AS bigram
         |  FROM t WHERE len(toks) >= 2),
         |c AS (SELECT lang, bigram, count(*) AS n FROM b GROUP BY 1, 2),
         |r AS (SELECT lang, bigram, n,
         |  row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rnk
         |  FROM c)
         |SELECT lang, bigram, n, CAST(rnk AS BIGINT) AS rnk FROM r
         |WHERE rnk <= 5 ORDER BY lang, rnk""".stripMargin,

    "t12_doc_freq" ->
      s"""WITH u AS (SELECT doc_id, unnest(${lowSet("text")}) AS token FROM documents),
         |c AS (SELECT token, count(*) AS df FROM u GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents)
         |SELECT token, df, CAST(n_docs + 1 AS DOUBLE) / (df + 1) AS idf_ratio
         |FROM c CROSS JOIN n ORDER BY token""".stripMargin,

    "t4_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, ${lowSeq("text")} AS toks FROM documents)
         |SELECT doc_id, md5(array_to_string(toks, ' ')) AS fp,
         |  CASE WHEN len(toks) >= $ShingleK
         |    THEN list_min([md5(array_to_string(toks[i:i+${ShingleK - 1}], ' '))
         |                   for i in range(1, len(toks) - ${ShingleK - 2})])
         |    ELSE md5(array_to_string(toks, ' ')) END AS shingle_fp
         |FROM t ORDER BY doc_id""".stripMargin,

    "d5_embedding_dups" ->
      s"""WITH c AS (SELECT vec_id AS id, embedding AS v,
         |  ${bucketChain("embedding", D5Bits)} AS bucket FROM embeddings),
         |p AS (SELECT a.id AS id_a, b.id AS id_b,
         |    round(${cosChain("a.v", "b.v")}, 6) AS cos_sim
         |  FROM c a JOIN c b ON a.bucket = b.bucket AND a.id < b.id)
         |SELECT id_a, id_b, cos_sim FROM p WHERE cos_sim >= $D5Threshold
         |ORDER BY id_a, id_b""".stripMargin,

    "d6_simhash_pairs" -> {
      val bits = SimhashBits
      val bands = 6
      val bandBits = bits / bands
      // reuse d4's simhash construction, then band + hamming verify
      val hexVal = (1 to 15).map { i =>
        val w = math.pow(16, 15 - i).toLong
        s"(strpos('0123456789abcdef', substr(md5(tok), $i, 1)) - 1) * ${w}"
      }.mkString(" + ")
      val votes = (0 until bits).map { b =>
        s"sum(CASE WHEN (hv // ${1L << b}) % 2 = 1 THEN 1 ELSE -1 END) AS b$b"
      }.mkString(",\n  ")
      val assemble = (0 until bits).map { b =>
        s"(CASE WHEN b$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)"
      }.mkString(" + ")
      val bandKeys = (0 until bands).map { i =>
        s"'$i|' || CAST((sh // ${1L << (i * bandBits)}) % ${1L << bandBits} AS VARCHAR)"
      }.mkString(", ")
      val hamming = (0 until bits).map { b =>
        s"(CASE WHEN (xor(sh_a, sh_b) // ${1L << b}) % 2 = 1 THEN 1 ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH t AS (SELECT doc_id AS id, ${lowSet("text")} AS toks FROM documents),
         |t2 AS (SELECT id, toks FROM t WHERE len(toks) > 0),
         |u AS (SELECT id, unnest(toks) AS tok FROM t2),
         |h AS (SELECT id, $hexVal AS hv FROM u),
         |v AS (SELECT id,
         |  $votes
         |FROM h GROUP BY id),
         |sh AS (SELECT id, $assemble AS sh FROM v),
         |bands AS (SELECT id, sh, unnest([$bandKeys]) AS band FROM sh),
         |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sh AS sh_a, b.sh AS sh_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.id < b.id),
         |hm AS (SELECT id_a, id_b, $hamming AS hamming FROM cand)
         |SELECT id_a, id_b, hamming FROM hm WHERE hamming <= 18
         |ORDER BY id_a, id_b""".stripMargin
    },

    "d7_contamination" ->
      s"""WITH t AS (SELECT doc_id, ${lowSeq("text")} AS toks FROM documents),
         |sh AS (SELECT doc_id, unnest(list_distinct(
         |    [md5(array_to_string(toks[i:i+2], ' ')) for i in range(1, len(toks) - 1)])) AS sh
         |  FROM t WHERE len(toks) >= 3),
         |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 29 = 0),
         |corp AS (SELECT doc_id, sh FROM sh WHERE doc_id % 29 <> 0)
         |SELECT corp.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |FROM corp JOIN bench USING (sh)
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // d11 oracles the EXACT overlap — the Bloom gate is a pure
    // optimization, so the twin is d7's SQL at the mod-31 split; any false
    // positive surviving the verify join breaks the hash match
    "d11_bloom_contamination" ->
      s"""WITH t AS (SELECT doc_id, ${lowSeq("text")} AS toks FROM documents),
         |sh AS (SELECT doc_id, unnest(list_distinct(
         |    [md5(array_to_string(toks[i:i+2], ' ')) for i in range(1, len(toks) - 1)])) AS sh
         |  FROM t WHERE len(toks) >= 3),
         |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 31 = 0),
         |corp AS (SELECT doc_id, sh FROM sh WHERE doc_id % 31 <> 0)
         |SELECT corp.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |FROM corp JOIN bench USING (sh)
         |GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // SN1: the oracle recomputes the 70-column snapshot's referenced cells
    // directly from events with WideSnapshot's cell formulas (the parquet
    // fixture is a deterministic function of events, and doubles round-trip
    // parquet exactly). Micro-unit sums are integral doubles cast to BIGINT
    // before summing (DuckDB sum(DOUBLE) would be inexact; BIGINT sums are).
    "sn1_snapshot_hourly" ->
      s"""WITH s AS (SELECT 'SYM' || CAST(user_id % 40 AS VARCHAR) AS symbol,
         |    epoch_ms(ts) AS ts_ms,
         |    ${WideSnapshot.formulaSql("mark_price")} AS mark_price,
         |    ${WideSnapshot.formulaSql("funding_rate")} AS funding_rate,
         |    ${WideSnapshot.formulaSql("volume")} AS volume,
         |    ${WideSnapshot.formulaSql("depth_bid_1bps")} AS depth_bid_1bps,
         |    ${WideSnapshot.formulaSql("depth_ask_1bps")} AS depth_ask_1bps
         |  FROM events),
         |f AS (SELECT * FROM s WHERE ts_ms < $SnapshotTsCut)
         |SELECT symbol, ts_ms//$HourMs*$HourMs AS hour_ms, count(*) AS n,
         |  CAST(sum(CAST(floor(mark_price * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS mark_sum_micro,
         |  max(funding_rate) AS funding_max,
         |  CAST(sum(CAST(floor(volume * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS vol_sum_micro,
         |  CAST(sum(CAST(floor(depth_bid_1bps * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS bid1bps_sum_micro,
         |  CAST(sum(CAST(floor(depth_ask_1bps * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS ask1bps_sum_micro
         |FROM f GROUP BY 1, 2 ORDER BY symbol, hour_ms""".stripMargin,

    // SN2: same fixture-recompute technique as sn1, over the percentile
    // ladder + curvature column neighborhood; the column arithmetic
    // (a-b, (a+b)*0.5) is replicated operation-for-operation so the doubles
    // are IEEE-identical before the fixed-point floor.
    "sn2_book_shape" -> {
      def f(n: String) = WideSnapshot.formulaSql(n)
      def micro(expr: String) =
        s"CAST(sum(CAST(floor(($expr) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)"
      s"""WITH s AS (SELECT 'SYM' || CAST(user_id % 40 AS VARCHAR) AS symbol,
         |    epoch_ms(ts) AS ts_ms,
         |    ${f("bid_p0")} AS bid_p0, ${f("bid_p50")} AS bid_p50,
         |    ${f("bid_p100")} AS bid_p100,
         |    ${f("ask_p0")} AS ask_p0, ${f("ask_p50")} AS ask_p50,
         |    ${f("ask_p100")} AS ask_p100,
         |    ${f("curvature_short_bid")} AS curvature_short_bid,
         |    ${f("curvature_long_ask")} AS curvature_long_ask
         |  FROM events),
         |fl AS (SELECT * FROM s WHERE ts_ms < $SnapshotTsCut)
         |SELECT symbol, count(*) AS n,
         |  ${micro("ask_p0 - bid_p100")} AS spread_sum_micro,
         |  ${micro("(bid_p50 + ask_p50) * 0.5")} AS mid_sum_micro,
         |  ${micro("bid_p100 - bid_p0")} AS bid_range_sum_micro,
         |  ${micro("ask_p100 - ask_p0")} AS ask_range_sum_micro,
         |  max(curvature_long_ask) AS curv_ask_max,
         |  min(curvature_short_bid) AS curv_bid_min
         |FROM fl GROUP BY 1 ORDER BY symbol""".stripMargin
    },

    // NOTE: DuckDB cannot slice BLOBs, so these twins slice the VARCHAR —
    // byte-equivalent ONLY because the corpus is pure ASCII (verified);
    // a multi-byte char before an offset would desynchronize char vs byte
    // indexing between the engines.
    "m1_multimodal_meta" ->
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  md5(text) AS digest,
        |  lower(hex(encode(substr(text, 1, 8)))) AS header_hex,
        |  concat_ws('-',
        |    lower(hex(encode(substr(text, 1, 4)))),
        |    lower(hex(encode(substr(text, 17, 4)))),
        |    lower(hex(encode(substr(text, 33, 4)))),
        |    lower(hex(encode(substr(text, 49, 4))))) AS frame_sample
        |FROM documents ORDER BY doc_id""".stripMargin,

    "m3_payload_features" -> {
      // byte i (1-based) of the payload as exact integer arithmetic on the
      // hex string — mirrors Spark's conv(substr(hex, 2i-1, 2), 16, 10)
      val byteVal = "(16.0 * (strpos('0123456789ABCDEF', substr(hx, 2*i - 1, 1)) - 1)" +
        " + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1)"
      // stride-4 lanes: dim d samples bytes d+1, d+33, d+65, … (step
      // dim·stride = 32) — mirrors Multimodal.byteSums(dim=8, stride=4)
      val dims = (0 until 8).map(d =>
        s"""coalesce(list_sum(list_transform(range(${d + 1}, n + 1, 32), i ->
           |    $byteVal / 255.0)), 0.0) AS s$d""".stripMargin).mkString(",\n")
      val normChain = (0 until 8).map(d => s"(s$d * s$d)")
        .mkString("sqrt(0.0 + ", " + ", ")")
      val outs = (0 until 8).map(d =>
        s"round(CASE WHEN nrm > 0 THEN s$d / nrm ELSE 0.0 END, 6) AS f$d")
        .mkString(", ")
      s"""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
         |    octet_length(encode(text)) AS n FROM documents),
         |s AS (SELECT doc_id,
         |$dims
         |  FROM b),
         |w AS (SELECT doc_id, s0, s1, s2, s3, s4, s5, s6, s7,
         |  $normChain AS nrm FROM s)
         |SELECT doc_id, $outs FROM w ORDER BY doc_id""".stripMargin
    },

    // m4: the batched-JVM byte-lane sums recomputed declaratively —
    // integer-exact, so the mapPartitions batch path has a bit-for-bit
    // relational twin (stride-4 lanes: dim d samples bytes d+1, d+33, …).
    "m4_batch_infer" -> {
      val byteVal = "(16 * (strpos('0123456789ABCDEF', substr(hx, 2*i - 1, 1)) - 1)" +
        " + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1)"
      val dims = (0 until 8).map(d =>
        s"""CAST(coalesce(list_sum(list_transform(range(${d + 1}, n + 1, 32),
           |    i -> $byteVal)), 0) AS BIGINT) AS s$d""".stripMargin)
        .mkString(",\n")
      s"""WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
         |    octet_length(encode(text)) AS n FROM documents)
         |SELECT doc_id,
         |$dims,
         |  CAST(n AS BIGINT) AS n_bytes
         |FROM b ORDER BY doc_id""".stripMargin
    },

    // m5: the pair-filter chain repeated relationally — per-token dim via
    // the portable md5 key, hashed-BoW vectors as dim-count comprehensions,
    // ascending-fold cosine (s1's chain shape at ClipDim), threshold gate
    // m6: same portable shard key; digest = order-independent sum of the
    // per-record key mod 1e9+7 (BIGINT-safe on both engines)
    "m6_shard_manifest" ->
      s"""WITH t AS (SELECT doc_id, n_chars,
         |    least(len(${rawToks("text")}), $ClipCapTokens) AS cap_toks,
         |    ${md5Hash15("'mshard:' || CAST(doc_id AS VARCHAR)")} AS h
         |  FROM documents),
         |s AS (SELECT h % $PackShards AS shard,
         |    CAST(count(*) AS BIGINT) AS n_pairs,
         |    CAST(sum(n_chars) AS BIGINT) AS payload_bytes,
         |    CAST(sum(cap_toks) AS BIGINT) AS caption_toks,
         |    CAST(sum(h % 1000000007) AS BIGINT) AS digest
         |  FROM t GROUP BY 1),
         |tb AS (SELECT sum(n_chars) AS tb FROM t)
         |SELECT shard, n_pairs, payload_bytes, caption_toks,
         |  CAST(payload_bytes * 1000000
         |    // (CAST((SELECT tb FROM tb) AS BIGINT) // $PackShards)
         |    AS BIGINT) AS balance_ppm,
         |  digest
         |FROM s ORDER BY shard""".stripMargin,

    "m5_pair_filter" -> {
      val tokDim = s"${hexVal15("md5(x)")} % $ClipDim"
      def bowOf(src: String) =
        s"[CAST(len(list_filter($src, h -> h = d)) AS DOUBLE) " +
          s"for d in range(0, $ClipDim)]"
      def dotOf(a: String, b: String) = (1 to ClipDim).map(i =>
        s"(CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE))")
        .mkString("0.0 + ", " + ", "")
      s"""WITH t AS (SELECT doc_id, ${rawToks("text")} AS toks
         |  FROM documents),
         |cap AS (SELECT doc_id, toks[1:$ClipCapTokens] AS cap FROM t),
         |pr AS (SELECT t.doc_id,
         |    (t.doc_id % $ClipShiftMod = 0 AND nc.cap IS NOT NULL)
         |      AS shifted,
         |    t.toks,
         |    CASE WHEN t.doc_id % $ClipShiftMod = 0 AND nc.cap IS NOT NULL
         |      THEN nc.cap ELSE c.cap END AS capt
         |  FROM t JOIN cap c ON c.doc_id = t.doc_id
         |  LEFT JOIN cap nc ON nc.doc_id = t.doc_id + 1),
         |dm AS (SELECT doc_id, shifted,
         |    list_transform(toks, x -> $tokDim) AS cd,
         |    list_transform(capt, x -> $tokDim) AS qd FROM pr),
         |hv AS (SELECT doc_id, shifted,
         |    ${bowOf("cd")} AS cv,
         |    ${bowOf("qd")} AS qv FROM dm),
         |sc AS (SELECT doc_id, shifted,
         |    (${dotOf("cv", "qv")}) /
         |    (sqrt(${dotOf("cv", "cv")}) * sqrt(${dotOf("qv", "qv")}))
         |      AS sim
         |  FROM hv)
         |SELECT doc_id, shifted, round(sim, 6) >= $ClipThreshold AS kept,
         |  round(sim, 6) AS sim
         |FROM sc ORDER BY doc_id""".stripMargin
    },

    "s12_pq_ann" -> {
      val dsub = EmbeddingDim / PqM
      // subspace-j L2² between a[.] and b[.], ascending-index left fold —
      // the same Σ(x−c)² chain the Spark aggregate computes
      def l2Chain(a: String, b: String, j: Int): String =
        (j * dsub + 1 to (j + 1) * dsub).map(i =>
          s"(($a[$i]::DOUBLE - $b[$i]::DOUBLE) * ($a[$i]::DOUBLE - $b[$i]::DOUBLE))")
          .mkString("(0 + ", " + ", ")")
      val encCtes = (0 until PqM).map(j =>
        s"""e$j AS (SELECT nid, cent_id, row_number() OVER (PARTITION BY nid
           |  ORDER BY ${l2Chain("cv", "cvec", j)}, cent_id) AS arn
           |  FROM corp CROSS JOIN cent)""".stripMargin).mkString(",\n")
      val codeTables = (0 until PqM).map(j =>
        s"(SELECT nid, cent_id AS c$j FROM e$j WHERE arn = 1) x$j")
      val codeJoin = codeTables.head +
        codeTables.tail.map(t => s" JOIN $t USING (nid)").mkString
      val centJoins = (0 until PqM).map(j =>
        s"JOIN cent b$j ON b$j.cent_id = codes.c$j").mkString(" ")
      val adist = (0 until PqM).map(j =>
        l2Chain("qs.qv", s"b$j.cvec", j)).mkString("(", " + ", ")")
      s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS cvec
         |  FROM embeddings WHERE vec_id < $NumCentroids),
         |corp AS (SELECT vec_id AS nid, embedding AS cv FROM embeddings),
         |qs AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
         |  WHERE vec_id < $NumQueries),
         |$encCtes,
         |codes AS (SELECT * FROM $codeJoin),
         |sc AS (SELECT query_id, nid AS neighbor_id, $adist AS adist
         |  FROM codes CROSS JOIN qs $centJoins
         |  WHERE nid <> query_id),
         |r AS (SELECT query_id, neighbor_id, adist,
         |  row_number() OVER (PARTITION BY query_id
         |    ORDER BY adist, neighbor_id) AS rank FROM sc)
         |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
         |  round(adist, 6) AS adist
         |FROM r WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin
    },

    "s13_ivf_pq" -> {
      val dsub = EmbeddingDim / PqM
      def l2Chain(a: String, b: String, j: Int): String =
        (j * dsub + 1 to (j + 1) * dsub).map(i =>
          s"(($a[$i]::DOUBLE - $b[$i]::DOUBLE) * ($a[$i]::DOUBLE - $b[$i]::DOUBLE))")
          .mkString("(0 + ", " + ", ")")
      val encCtes = (0 until PqM).map(j =>
        s"""e$j AS (SELECT nid, cent_id, row_number() OVER (PARTITION BY nid
           |  ORDER BY ${l2Chain("cv", "cvec", j)}, cent_id) AS arn
           |  FROM corp CROSS JOIN cent)""".stripMargin).mkString(",\n")
      val codeTables = (0 until PqM).map(j =>
        s"(SELECT nid, cent_id AS c$j FROM e$j WHERE arn = 1) x$j")
      val codeJoin = codeTables.head +
        codeTables.tail.map(t => s" JOIN $t USING (nid)").mkString
      val centJoins = (0 until PqM).map(j =>
        s"JOIN cent b$j ON b$j.cent_id = codes.c$j").mkString(" ")
      val adist = (0 until PqM).map(j =>
        l2Chain("qv", s"b$j.cvec", j)).mkString("(", " + ", ")")
      (s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS cvec
         |  FROM embeddings WHERE vec_id < $NumCentroids),
         |corp AS (SELECT vec_id AS nid, embedding AS cv FROM embeddings),
         |ca AS (SELECT nid, cv, cent_id,
         |  row_number() OVER (PARTITION BY nid
         |    ORDER BY ${cosChain("cv", "cvec")} DESC, cent_id) AS arn
         |  FROM corp CROSS JOIN cent),
         |cass AS (SELECT nid, cent_id AS cell FROM ca WHERE arn = 1),
         |qass AS (SELECT nid AS query_id, cv AS qv, cent_id AS cell
         |  FROM ca WHERE nid < $NumQueries AND arn <= 2),
         |$encCtes,
         |codes AS (SELECT * FROM $codeJoin),
         |sc AS (SELECT query_id, cass.nid AS neighbor_id, $adist AS adist
         |  FROM cass JOIN qass USING (cell)
         |  JOIN codes ON codes.nid = cass.nid $centJoins
         |  WHERE cass.nid <> query_id),
         |r AS (SELECT query_id, neighbor_id, adist,
         |  row_number() OVER (PARTITION BY query_id
         |    ORDER BY adist, neighbor_id) AS rank FROM sc)
         |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
         |  round(adist, 6) AS adist
         |FROM r WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin)
    },

    "d10_semantic_dedup" ->
      s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS cvec
         |  FROM embeddings WHERE vec_id < $NumCentroids),
         |corp AS (SELECT vec_id AS nid, embedding AS cv FROM embeddings),
         |ca AS (SELECT nid, cv, cent_id,
         |  row_number() OVER (PARTITION BY nid
         |    ORDER BY ${cosChain("cv", "cvec")} DESC, cent_id) AS arn
         |  FROM corp CROSS JOIN cent),
         |cass AS (SELECT nid, cv, cent_id AS cell FROM ca WHERE arn = 1),
         |aa AS (SELECT cell, nid AS ida, cv AS av FROM cass),
         |bb AS (SELECT cell, nid AS idb, cv AS bv FROM cass),
         |dr AS (SELECT DISTINCT idb FROM aa JOIN bb USING (cell)
         |  WHERE ida < idb AND round(${cosChain("av", "bv")}, 6) >= $SemThreshold)
         |SELECT nid AS vec_id, cell FROM cass
         |WHERE nid NOT IN (SELECT idb FROM dr) ORDER BY vec_id""".stripMargin,

    // d24: full from-scratch replay of the adaptive quantizer — census →
    // integer cap → ceil-div sub-seed count → smallest-id seed election →
    // raw-double argmax re-assignment (identical IEEE cosine tree,
    // seed-id tie-break) → in-bucket dedup with the d10 round-6 cut
    "d24_adaptive_semdedup" ->
      s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS cvec
         |  FROM embeddings WHERE vec_id < $NumCentroids),
         |corp AS (SELECT vec_id AS nid, embedding AS cv FROM embeddings),
         |ca AS (SELECT nid, cv, cent_id,
         |  row_number() OVER (PARTITION BY nid
         |    ORDER BY ${cosChain("cv", "cvec")} DESC, cent_id) AS arn
         |  FROM corp CROSS JOIN cent),
         |cass AS (SELECT nid, cv, cent_id AS cell FROM ca WHERE arn = 1),
         |caps AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_cell
         |  FROM cass GROUP BY 1),
         |hot AS (SELECT cell,
         |    CAST(floor(sqrt(CAST(n_cell AS DOUBLE))) AS BIGINT) AS subk
         |  FROM caps WHERE n_cell > $SemCellCap),
         |sd AS (SELECT cell, nid AS seed_id, cv AS sv,
         |    row_number() OVER (PARTITION BY cell ORDER BY nid) AS srk
         |  FROM cass WHERE cell IN (SELECT cell FROM hot)),
         |seeds AS (SELECT sd.cell, sd.seed_id, sd.sv FROM sd
         |  JOIN hot ON sd.cell = hot.cell WHERE sd.srk <= hot.subk),
         |sa AS (SELECT c.nid, c.cv, c.cell, s.seed_id,
         |    row_number() OVER (PARTITION BY c.nid
         |      ORDER BY ${cosChain("c.cv", "s.sv")} DESC, s.seed_id) AS srn
         |  FROM cass c JOIN seeds s ON c.cell = s.cell),
         |allv AS (
         |  SELECT nid, cv, cell, CAST(-1 AS BIGINT) AS subcell FROM cass
         |  WHERE cell NOT IN (SELECT cell FROM hot)
         |  UNION ALL
         |  SELECT nid, cv, cell, seed_id AS subcell FROM sa WHERE srn = 1),
         |dr AS (SELECT DISTINCT b.nid AS idb
         |  FROM allv a JOIN allv b
         |    ON a.cell = b.cell AND a.subcell = b.subcell
         |  WHERE a.nid < b.nid
         |    AND round(${cosChain("a.cv", "b.cv")}, 6) >= $SemThreshold)
         |SELECT nid AS vec_id, cell, subcell FROM allv
         |WHERE nid NOT IN (SELECT idb FROM dr) ORDER BY vec_id""".stripMargin,

    // s22: both assignments recomputed from scratch — v1 argmax against
    // the centroid rows, the v2 snapshot rebuilt through the exact
    // perturbation algebra (element + 0.5·cyclic-right-neighbor, the
    // same cast-to-double tree as Spark's zip_with), then the
    // full-outer diff and the two cell censuses
    "s22_index_staleness" -> {
      val pert = s"[CAST(cv[i] AS DOUBLE) + 0.5 * CAST(cv[(i % $EmbeddingDim) + 1] AS DOUBLE) " +
        s"for i in range(1, ${EmbeddingDim + 1})]"
      s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS cvec
         |  FROM embeddings WHERE vec_id < $NumCentroids),
         |corp AS (SELECT vec_id, embedding AS cv FROM embeddings),
         |ca1 AS (SELECT vec_id, cent_id,
         |  row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${cosChain("cv", "cvec")} DESC, cent_id) AS arn
         |  FROM corp CROSS JOIN cent),
         |idx AS (SELECT vec_id AS id, cent_id AS cell_idx
         |  FROM ca1 WHERE arn = 1),
         |v2 AS (
         |  SELECT vec_id, CASE WHEN vec_id % 9 = 0 THEN $pert
         |    ELSE list_transform(cv, x -> CAST(x AS DOUBLE)) END AS cv
         |  FROM corp WHERE vec_id % 13 <> 0
         |  UNION ALL
         |  SELECT vec_id + 10000000,
         |    list_transform(cv, x -> CAST(x AS DOUBLE))
         |  FROM corp WHERE vec_id % 11 = 0),
         |ca2 AS (SELECT vec_id, cent_id,
         |  row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${cosChain("cv", "cvec")} DESC, cent_id) AS arn
         |  FROM v2 CROSS JOIN cent),
         |cur AS (SELECT vec_id AS id, cent_id AS cell_cur
         |  FROM ca2 WHERE arn = 1),
         |f AS (SELECT COALESCE(idx.id, cur.id) AS id, cell_idx, cell_cur,
         |    cell_cur IS NULL AS removed, cell_idx IS NULL AS added,
         |    cell_idx IS NOT NULL AND cell_cur IS NOT NULL
         |      AND cell_idx <> cell_cur AS moved
         |  FROM idx FULL JOIN cur ON idx.id = cur.id),
         |fs AS (SELECT cell_idx AS cell,
         |    CAST(count(*) AS BIGINT) AS n_indexed,
         |    CAST(sum(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_removed,
         |    CAST(sum(CASE WHEN moved THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_moved_out
         |  FROM f WHERE cell_idx IS NOT NULL GROUP BY 1),
         |ts AS (SELECT cell_cur AS cell,
         |    CAST(count(*) AS BIGINT) AS n_current,
         |    CAST(sum(CASE WHEN added THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_added,
         |    CAST(sum(CASE WHEN moved THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_moved_in
         |  FROM f WHERE cell_cur IS NOT NULL GROUP BY 1),
         |g AS (SELECT cell,
         |    COALESCE(n_indexed, 0) AS n_indexed,
         |    COALESCE(n_current, 0) AS n_current,
         |    COALESCE(n_removed, 0) AS n_removed,
         |    COALESCE(n_added, 0) AS n_added,
         |    COALESCE(n_moved_out, 0) AS n_moved_out,
         |    COALESCE(n_moved_in, 0) AS n_moved_in
         |  FROM fs FULL JOIN ts USING (cell))
         |SELECT cell, n_indexed, n_current, n_removed, n_added,
         |  n_moved_out, n_moved_in,
         |  (n_removed + n_moved_out) * 1000000 // greatest(n_indexed, 1)
         |    AS stale_ppm
         |FROM g ORDER BY cell""".stripMargin
    },

    "s3_ivf_ann" ->
      s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS cvec
         |  FROM embeddings WHERE vec_id < $NumCentroids),
         |corp AS (SELECT vec_id AS nid, embedding AS cv FROM embeddings),
         |ca AS (SELECT nid, cv, cent_id,
         |  row_number() OVER (PARTITION BY nid
         |    ORDER BY ${cosChain("cv", "cvec")} DESC, cent_id) AS arn
         |  FROM corp CROSS JOIN cent),
         |cass AS (SELECT nid, cv, cent_id AS cell FROM ca WHERE arn = 1),
         |qass AS (SELECT nid AS query_id, cv AS qv, cell FROM cass WHERE nid < $NumQueries),
         |s AS (SELECT query_id, nid AS neighbor_id, ${cosChain("qv", "cv")} AS sim
         |  FROM cass JOIN qass USING (cell) WHERE nid <> query_id),
         |r AS (SELECT query_id, neighbor_id, sim,
         |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM s)
         |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, round(sim, 6) AS sim
         |FROM r WHERE rank <= $IvfTopK ORDER BY query_id, rank""".stripMargin,

    // s21: filtered ANN — one ranked assignment CTE serves corpus (arn=1)
    // and queries (arn <= probe); the pre-filtered ranking and the
    // post-filter hit count are both replayed from the same candidate set
    "s21_filtered_ann" ->
      s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS cvec
         |  FROM embeddings WHERE vec_id < $NumCentroids),
         |corp AS (SELECT vec_id AS nid, embedding AS cv, label
         |  FROM embeddings),
         |ca AS (SELECT nid, cv, label, cent_id,
         |  row_number() OVER (PARTITION BY nid
         |    ORDER BY ${cosChain("cv", "cvec")} DESC, cent_id) AS arn
         |  FROM corp CROSS JOIN cent),
         |cass AS (SELECT nid, cv, label, cent_id AS cell FROM ca
         |  WHERE arn = 1),
         |qass AS (SELECT nid AS query_id, cv AS qv, label AS q_label,
         |    cent_id AS cell
         |  FROM ca WHERE arn <= $S21Probe AND nid < $NumQueries),
         |cand AS (SELECT query_id, nid AS neighbor_id, label, q_label,
         |    ${cosChain("qv", "cv")} AS sim
         |  FROM cass JOIN qass USING (cell) WHERE nid <> query_id),
         |pre AS (SELECT query_id, neighbor_id, sim,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM cand WHERE label = q_label),
         |postr AS (SELECT query_id, label, q_label,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM cand),
         |ph AS (SELECT query_id, CAST(count(*) AS BIGINT) AS post_hits
         |  FROM postr WHERE rank <= $IvfTopK AND label = q_label
         |  GROUP BY 1)
         |SELECT pre.query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
         |  round(sim, 6) AS sim, coalesce(post_hits, 0) AS post_hits
         |FROM pre LEFT JOIN ph ON ph.query_id = pre.query_id
         |WHERE rank <= $IvfTopK ORDER BY pre.query_id, rank""".stripMargin,

    // s23: MRR/nDCG of the probed IVF serve vs brute truth; the nDCG rank
    // weights are the SAME Scala-computed integer literals the engine
    // uses (QuerySpec.NdcgWeightsMicro) — the metric is pure integer
    // arithmetic on both engines
    "s23_rank_metrics" -> {
      val wCase = NdcgWeightsMicro.zipWithIndex
        .map { case (w, i) => s"WHEN ${i + 1} THEN ${w}" }
        .mkString("CASE rank ", " ", " ELSE 0 END")
      val idcg = NdcgWeightsMicro.sum
      s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS cvec
         |  FROM embeddings WHERE vec_id < $NumCentroids),
         |corp AS (SELECT vec_id AS nid, embedding AS cv FROM embeddings),
         |ca AS (SELECT nid, cv, cent_id,
         |  row_number() OVER (PARTITION BY nid
         |    ORDER BY ${cosChain("cv", "cvec")} DESC, cent_id) AS arn
         |  FROM corp CROSS JOIN cent),
         |cass AS (SELECT nid, cv, cent_id AS cell FROM ca WHERE arn = 1),
         |qass AS (SELECT nid AS query_id, cv AS qv, cent_id AS cell
         |  FROM ca WHERE arn <= $S16Probe AND nid < $NumQueries),
         |cand AS (SELECT query_id, nid AS neighbor_id,
         |    ${cosChain("qv", "cv")} AS sim
         |  FROM cass JOIN qass USING (cell) WHERE nid <> query_id),
         |test AS (SELECT query_id, neighbor_id, rank FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY sim DESC, neighbor_id) AS rank FROM cand)
         |  WHERE rank <= $IvfTopK),
         |ts AS (SELECT q.query_id, c.nid AS neighbor_id,
         |    ${cosChain("qv", "cv")} AS sim
         |  FROM corp c CROSS JOIN
         |    (SELECT nid AS query_id, cv AS qv FROM corp
         |     WHERE nid < $NumQueries) q
         |  WHERE c.nid <> q.query_id),
         |truth AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY sim DESC, neighbor_id) AS rank FROM ts)
         |  WHERE rank <= $IvfTopK),
         |j AS (SELECT te.query_id, te.rank,
         |    tr.neighbor_id IS NOT NULL AS rel
         |  FROM test te LEFT JOIN truth tr
         |    ON tr.query_id = te.query_id
         |    AND tr.neighbor_id = te.neighbor_id)
         |SELECT query_id,
         |  CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS hits,
         |  CAST(COALESCE(max(CASE WHEN rel THEN 1000000 // rank END), 0)
         |    AS BIGINT) AS mrr_micro,
         |  CAST(sum(CASE WHEN rel THEN $wCase ELSE 0 END)
         |    * 1000000 // $idcg AS BIGINT) AS ndcg_ppm
         |FROM j GROUP BY query_id ORDER BY query_id""".stripMargin
    },

    // S16: cell assignment replayed once for the corpus (arn = 1) and the
    // query side reuses the SAME ranked cross join with arn <= probe; the
    // pos/neg election mirrors the engine's per-(query, pair_type) window
    "s16_hard_negatives" ->
      s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS cvec
         |  FROM embeddings WHERE vec_id < $NumCentroids),
         |corp AS (SELECT vec_id AS nid, embedding AS cv, label AS n_label
         |  FROM embeddings),
         |ca AS (SELECT nid, cv, n_label, cent_id,
         |  row_number() OVER (PARTITION BY nid
         |    ORDER BY ${cosChain("cv", "cvec")} DESC, cent_id) AS arn
         |  FROM corp CROSS JOIN cent),
         |cass AS (SELECT nid, cv, n_label, cent_id AS cell FROM ca WHERE arn = 1),
         |qass AS (SELECT nid AS query_id, cv AS qv, n_label AS q_label,
         |    cent_id AS cell
         |  FROM ca WHERE nid < $NumQueries AND arn <= $S16Probe),
         |s AS (SELECT query_id, nid AS neighbor_id,
         |    CASE WHEN n_label = q_label THEN 'pos' ELSE 'neg' END AS pair_type,
         |    ${cosChain("qv", "cv")} AS sim
         |  FROM cass JOIN qass USING (cell) WHERE nid <> query_id),
         |r AS (SELECT query_id, pair_type, neighbor_id, sim,
         |  row_number() OVER (PARTITION BY query_id, pair_type
         |    ORDER BY sim DESC, neighbor_id) AS rank FROM s)
         |SELECT query_id, pair_type, neighbor_id,
         |  CAST(rank AS BIGINT) AS rank, round(sim, 6) AS sim
         |FROM r WHERE (pair_type = 'pos' AND rank <= $PosK)
         |  OR (pair_type = 'neg' AND rank <= $NegK)
         |ORDER BY query_id, pair_type, rank""".stripMargin,

    // S15: same relational twin as s3 (the persisted index changes the
    // PHYSICAL layout — build-once parquet partitioned by cell, DPP-pruned
    // serving scan — not the answer).
    "s15_ivf_index" ->
      s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS cvec
         |  FROM embeddings WHERE vec_id < $NumCentroids),
         |corp AS (SELECT vec_id AS nid, embedding AS cv FROM embeddings),
         |ca AS (SELECT nid, cv, cent_id,
         |  row_number() OVER (PARTITION BY nid
         |    ORDER BY ${cosChain("cv", "cvec")} DESC, cent_id) AS arn
         |  FROM corp CROSS JOIN cent),
         |cass AS (SELECT nid, cv, cent_id AS cell FROM ca WHERE arn = 1),
         |qass AS (SELECT nid AS query_id, cv AS qv, cell FROM cass WHERE nid < $NumQueries),
         |s AS (SELECT query_id, nid AS neighbor_id, ${cosChain("qv", "cv")} AS sim
         |  FROM cass JOIN qass USING (cell) WHERE nid <> query_id),
         |r AS (SELECT query_id, neighbor_id, sim,
         |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM s)
         |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, round(sim, 6) AS sim
         |FROM r WHERE rank <= $IvfTopK ORDER BY query_id, rank""".stripMargin,

    // s19: the merged index CONTENT equals the batch assignment of the
    // full corpus under the same quantizer (incremental add with a frozen
    // quantizer is order-independent); the staged write/append round-trip
    // is the engine's burden, pinned by the census reading the merged
    // store. Means are integer-ppm sums with one final division.
    "s19_index_merge" ->
      s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS cvec
         |  FROM embeddings WHERE vec_id < $NumCentroids),
         |corp AS (SELECT vec_id AS nid, embedding AS cv FROM embeddings),
         |ca AS (SELECT nid, cv, cent_id,
         |  row_number() OVER (PARTITION BY nid
         |    ORDER BY ${cosChain("cv", "cvec")} DESC, cent_id) AS arn
         |  FROM corp CROSS JOIN cent),
         |cass AS (SELECT nid, cv, cent_id AS cell FROM ca WHERE arn = 1),
         |t AS (SELECT cell,
         |    (nid >= $NumCentroids AND nid % $S19DeltaMod = 0) AS is_delta,
         |    CAST(floor(${cosChain("cv", "cvec")} * 1000000 + 0.5)
         |      AS BIGINT) AS sim_ppm
         |  FROM cass JOIN cent ON cell = cent_id)
         |SELECT cell,
         |  CAST(sum(CASE WHEN is_delta THEN 0 ELSE 1 END) AS BIGINT)
         |    AS n_old,
         |  CAST(sum(CASE WHEN is_delta THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_add,
         |  CAST(count(*) AS BIGINT) AS n_total,
         |  CASE WHEN sum(CASE WHEN is_delta THEN 0 ELSE 1 END) > 0 THEN
         |    CAST(sum(CASE WHEN is_delta THEN 0 ELSE sim_ppm END) AS DOUBLE)
         |      / CAST(sum(CASE WHEN is_delta THEN 0 ELSE 1 END) * 1000000
         |        AS DOUBLE)
         |    ELSE 0.0 END AS mean_old_sim,
         |  CASE WHEN sum(CASE WHEN is_delta THEN 1 ELSE 0 END) > 0 THEN
         |    CAST(sum(CASE WHEN is_delta THEN sim_ppm ELSE 0 END) AS DOUBLE)
         |      / CAST(sum(CASE WHEN is_delta THEN 1 ELSE 0 END) * 1000000
         |        AS DOUBLE)
         |    ELSE 0.0 END AS mean_add_sim
         |FROM t GROUP BY cell ORDER BY cell""".stripMargin,

    // s20: one candidate CTE carrying the query-side probe rank (arn),
    // per-setting top-k + truth hits generated from the same NprobeSweep
    // the engine uses; recall in integer ppm
    "s20_nprobe_sweep" -> {
      val maxP = NprobeSweep.max
      val perP = NprobeSweep.map { p =>
        s"""t$p AS (SELECT query_id, CAST(sum(tr) AS BIGINT) AS hits
           |  FROM (SELECT query_id, nid, tr,
           |      row_number() OVER (PARTITION BY query_id
           |        ORDER BY sim DESC, nid) AS rank
           |    FROM (SELECT c.query_id, c.nid, c.sim,
           |        CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END
           |          AS tr
           |      FROM cands c LEFT JOIN truth t
           |        ON t.query_id = c.query_id AND t.neighbor_id = c.nid
           |      WHERE c.arn <= $p))
           |  WHERE rank <= $TopK GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      val unions = NprobeSweep.map(p =>
        s"SELECT $p AS np, query_id, hits FROM t$p")
        .mkString("\n UNION ALL ")
      val grid = NprobeSweep.map(p => s"($p)").mkString(", ")
      s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS cvec
         |  FROM embeddings WHERE vec_id < $NumCentroids),
         |corp AS (SELECT vec_id AS nid, embedding AS cv FROM embeddings),
         |ca AS (SELECT nid, cv, cent_id,
         |  row_number() OVER (PARTITION BY nid
         |    ORDER BY ${cosChain("cv", "cvec")} DESC, cent_id) AS arn
         |  FROM corp CROSS JOIN cent),
         |cass AS (SELECT nid, cv, cent_id AS cell FROM ca WHERE arn = 1),
         |qa AS (SELECT nid AS query_id, cv AS qv, cent_id AS cell, arn
         |  FROM ca WHERE nid < $NumQueries AND arn <= $maxP),
         |cands AS (SELECT qa.query_id, cass.nid, qa.arn,
         |    ${cosChain("qv", "cv")} AS sim
         |  FROM cass JOIN qa USING (cell) WHERE cass.nid <> qa.query_id),
         |tb AS (SELECT q.nid AS query_id, c.nid AS neighbor_id,
         |    row_number() OVER (PARTITION BY q.nid
         |      ORDER BY ${cosChain("q.cv", "c.cv")} DESC, c.nid) AS rk
         |  FROM corp c CROSS JOIN corp q
         |  WHERE q.nid < $NumQueries AND c.nid <> q.nid),
         |truth AS (SELECT query_id, neighbor_id FROM tb WHERE rk <= $TopK),
         |$perP,
         |h AS ($unions),
         |grid AS (SELECT np, nid AS query_id FROM corp
         |  CROSS JOIN (VALUES $grid) p(np) WHERE nid < $NumQueries)
         |SELECT CAST(grid.np AS BIGINT) AS nprobe, grid.query_id,
         |  CAST(coalesce(hits, 0) AS BIGINT) AS hits,
         |  CAST(coalesce(hits, 0) * 1000000 // $TopK AS BIGINT)
         |    AS recall_ppm
         |FROM grid LEFT JOIN h ON h.np = grid.np
         |  AND h.query_id = grid.query_id
         |ORDER BY nprobe, grid.query_id""".stripMargin
    },

    "s6_ivf_probe2" ->
      (s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS cvec
         |  FROM embeddings WHERE vec_id < $NumCentroids),
         |corp AS (SELECT vec_id AS nid, embedding AS cv FROM embeddings),
         |ca AS (SELECT nid, cv, cent_id,
         |  row_number() OVER (PARTITION BY nid
         |    ORDER BY ${cosChain("cv", "cvec")} DESC, cent_id) AS arn
         |  FROM corp CROSS JOIN cent),
         |cass AS (SELECT nid, cv, cent_id AS cell FROM ca WHERE arn = 1),
         |qass AS (SELECT nid AS query_id, cv AS qv, cent_id AS cell
         |  FROM ca WHERE nid < $NumQueries AND arn <= 2),
         |s AS (SELECT query_id, nid AS neighbor_id, ${cosChain("qv", "cv")} AS sim
         |  FROM cass JOIN qass USING (cell) WHERE nid <> query_id),
         |r AS (SELECT query_id, neighbor_id, sim,
         |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM s)
         |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, round(sim, 6) AS sim
         |FROM r WHERE rank <= $IvfTopK ORDER BY query_id, rank""".stripMargin),

    "s7_int8_ann" -> {
      // exact integer dot of the code arrays; order-free but kept left-fold
      val qdotChain = (1 to EmbeddingDim).map(i =>
        s"(CAST(qc[$i] AS BIGINT) * cc[$i])").mkString("0 + ", " + ", "")
      s"""WITH base AS (SELECT vec_id, embedding,
         |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
         |FROM embeddings),
         |coded AS (SELECT vec_id,
         |  CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END AS scale,
         |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) *
         |    (CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END)) AS INT)) AS codes
         |FROM base),
         |q AS (SELECT vec_id AS query_id, scale AS qscale, codes AS qc
         |  FROM coded WHERE vec_id < $NumQueries),
         |c AS (SELECT vec_id AS neighbor_id, scale AS cscale, codes AS cc FROM coded),
         |s AS (SELECT query_id, neighbor_id, qscale, cscale,
         |    CAST($qdotChain AS BIGINT) AS qdot
         |  FROM c CROSS JOIN q WHERE neighbor_id <> query_id),
         |s2 AS (SELECT query_id, neighbor_id, qdot,
         |    CASE WHEN qscale * cscale > 0
         |      THEN CAST(qdot AS DOUBLE) / (qscale * cscale) ELSE 0.0 END AS qsim
         |  FROM s),
         |r AS (SELECT query_id, neighbor_id, qdot, qsim,
         |  row_number() OVER (PARTITION BY query_id ORDER BY qsim DESC, neighbor_id) AS rank
         |  FROM s2)
         |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, qdot,
         |  round(qsim, 6) AS qsim
         |FROM r WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin
    },

    // S2: expected symbol catalog computed directly from the same part-table
    // derivations the Spark side renders into per-exchange JSON. Status lists
    // are each exchange's vocabulary mapped to the repo status codes
    // (PENDING=0, ACTIVE=1, HALTED=2, CLOSED=3); gate perp trades integer
    // lots (step '1', quantity precision 0).
    "s5_symbol_catalog" ->
      """WITH f AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS pk,
        |         CAST(p_partkey % 21 AS INT) AS pidx,
        |         CAST(p_size % 7 AS INT) AS p,
        |         CAST((p_size + 3) % 6 AS INT) AS q
        |  FROM part),
        |g AS (
        |  SELECT pk, pidx, p, q,
        |    'C' || CAST(pk AS VARCHAR) AS base,
        |    (['USDT','USDC','USD','BTC'])[CAST(pk % 4 AS INT) + 1] AS quote
        |  FROM f)
        |SELECT
        |  pidx + 1 AS exchange_id,
        |  CASE WHEN pidx = 17 THEN 'PERP_' WHEN pidx = 18 THEN 'SPOT_'
        |       ELSE '' END || base || '_' || quote AS symbol,
        |  ([1,0,1,0,0,1,0,1,0,1,0,1,0,0,1,0,1,1,0,1,0])[pidx + 1] AS inst_type,
        |  base AS base_asset,
        |  quote AS quote_asset,
        |  CASE pidx
        |    WHEN 0 THEN ([1,0,2,2,2,2,2,3])[CAST(pk % 8 AS INT) + 1]
        |    WHEN 1 THEN ([1,3,2,2])[CAST(pk % 4 AS INT) + 1]
        |    WHEN 2 THEN ([1,2,0,0])[CAST(pk % 4 AS INT) + 1]
        |    WHEN 3 THEN ([1,2,0,0])[CAST(pk % 4 AS INT) + 1]
        |    WHEN 4 THEN ([1,2,2,2,2])[CAST(pk % 5 AS INT) + 1]
        |    WHEN 5 THEN 1
        |    WHEN 6 THEN 1
        |    WHEN 7 THEN ([1,0,2,2,2,3])[CAST(pk % 6 AS INT) + 1]
        |    WHEN 8 THEN ([1,2,0,3])[CAST(pk % 4 AS INT) + 1]
        |    WHEN 9 THEN ([1,2,3,3,2])[CAST(pk % 5 AS INT) + 1]
        |    WHEN 10 THEN ([1,2,3])[CAST(pk % 3 AS INT) + 1]
        |    WHEN 11 THEN ([0,1,2,3,2])[CAST(pk % 5 AS INT) + 1]
        |    WHEN 12 THEN ([3,1,1,1])[CAST(pk % 4 AS INT) + 1]
        |    WHEN 13 THEN ([1,3,2,3])[CAST(pk % 4 AS INT) + 1]
        |    WHEN 14 THEN ([1,0])[CAST(pk % 2 AS INT) + 1]
        |    WHEN 15 THEN ([1,0])[CAST(pk % 2 AS INT) + 1]
        |    WHEN 16 THEN ([1,2])[CAST(pk % 2 AS INT) + 1]
        |    WHEN 17 THEN ([1,2])[CAST(pk % 2 AS INT) + 1]
        |    WHEN 18 THEN ([1,2])[CAST(pk % 2 AS INT) + 1]
        |    WHEN 19 THEN ([1,0,2,2,2,2,2,3])[CAST(pk % 8 AS INT) + 1]
        |    WHEN 20 THEN ([1,0,2,2,2,2,2,3])[CAST(pk % 8 AS INT) + 1]
        |  END AS status,
        |  CASE WHEN p = 0 THEN '1'
        |       ELSE '0.' || repeat('0', p - 1) || '1' END AS tick_size,
        |  CASE WHEN pidx = 11 THEN '1'
        |       WHEN q = 0 THEN '1'
        |       ELSE '0.' || repeat('0', q - 1) || '1' END AS step_size,
        |  p AS price_precision,
        |  CASE WHEN pidx = 11 THEN 0 ELSE q END AS quantity_precision
        |FROM g ORDER BY exchange_id, symbol""".stripMargin,

    "s9_kmeans_step" -> {
      val dims = (0 until EmbeddingDim).map(i =>
        s"round(CAST(sum(CAST(CAST(cv[${i + 1}] AS DOUBLE) AS DECIMAL(27,9))) AS DOUBLE) / count(*), 6) AS c$i")
        .mkString(",\n  ")
      s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS cvec
         |  FROM embeddings WHERE vec_id < $NumCentroids),
         |corp AS (SELECT vec_id AS nid, embedding AS cv FROM embeddings),
         |ca AS (SELECT nid, cv, cent_id,
         |  row_number() OVER (PARTITION BY nid
         |    ORDER BY ${cosChain("cv", "cvec")} DESC, cent_id) AS arn
         |  FROM corp CROSS JOIN cent),
         |cass AS (SELECT nid, cv, cent_id AS cell FROM ca WHERE arn = 1)
         |SELECT cell, count(*) AS n,
         |  $dims
         |FROM cass GROUP BY cell ORDER BY cell""".stripMargin
    },

    "s8_mrl_ann" -> {
      val preDot = (a: String, b: String) => (1 to MrlPrefixDim).map(i =>
        s"(CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE))")
        .mkString("0.0 + ", " + ", "")
      val preCos =
        s"(${preDot("qv", "cv")}) / (sqrt(${preDot("qv", "qv")}) * sqrt(${preDot("cv", "cv")}))"
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $NumQueries),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
         |s1 AS (SELECT query_id, neighbor_id, qv, cv, $preCos AS pre_sim
         |  FROM c CROSS JOIN q WHERE neighbor_id <> query_id),
         |sl AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY pre_sim DESC, neighbor_id) AS prn FROM s1),
         |s2 AS (SELECT query_id, neighbor_id, ${cosChain("qv", "cv")} AS sim
         |  FROM sl WHERE prn <= $MrlShortlist),
         |r AS (SELECT query_id, neighbor_id, sim,
         |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM s2)
         |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, round(sim, 6) AS sim
         |FROM r WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin
    },

    // S10: IVF-over-prefix coarse stage (assignment + nprobe=2 probing rank
    // by PREFIX cosine), within-cell prefix shortlist, full-dim re-rank —
    // mirrors Similarity.mrlIvfTopK including the left-fold double chains.
    "s10_mrl_ivf" -> {
      val preDot = (a: String, b: String) => (1 to MrlPrefixDim).map(i =>
        s"(CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE))")
        .mkString("0.0 + ", " + ", "")
      val preCos = (a: String, b: String) =>
        s"(${preDot(a, b)}) / (sqrt(${preDot(a, a)}) * sqrt(${preDot(b, b)}))"
      s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS cvec
         |  FROM embeddings WHERE vec_id < $NumCentroids),
         |corp AS (SELECT vec_id AS nid, embedding AS cv FROM embeddings),
         |ca AS (SELECT nid, cv, cent_id,
         |  row_number() OVER (PARTITION BY nid
         |    ORDER BY ${preCos("cv", "cvec")} DESC, cent_id) AS arn
         |  FROM corp CROSS JOIN cent),
         |cass AS (SELECT nid, cv, cent_id AS cell FROM ca WHERE arn = 1),
         |qass AS (SELECT nid AS query_id, cv AS qv, cent_id AS cell
         |  FROM ca WHERE nid < $NumQueries AND arn <= 2),
         |s1 AS (SELECT query_id, qv, nid AS neighbor_id, cv,
         |    ${preCos("qv", "cv")} AS pre_sim
         |  FROM cass JOIN qass USING (cell) WHERE nid <> query_id),
         |sl AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY pre_sim DESC, neighbor_id) AS prn FROM s1),
         |s2 AS (SELECT query_id, neighbor_id, ${cosChain("qv", "cv")} AS sim
         |  FROM sl WHERE prn <= $MrlShortlist),
         |r AS (SELECT query_id, neighbor_id, sim,
         |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM s2)
         |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, round(sim, 6) AS sim
         |FROM r WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin
    },

    // S11: full Lloyd loop as a bounded recursive CTE — each recursive step
    // assigns the corpus to the PREVIOUS step's centroids (same argmax
    // window as s3/s9) and emits the exact-decimal means; KmeansIters
    // unconditional steps equal Spark's early-stopped run because the
    // fixpoint is idempotent. Output in floor fixed-point (round() diverges
    // cross-engine at .5 ulp boundaries).
    "s11_kmeans_train" -> {
      val meanList = (0 until EmbeddingDim).map(i =>
        s"CAST(sum(CAST(CAST(v[${i + 1}] AS DOUBLE) AS DECIMAL(27,9))) AS DOUBLE) / count(*)")
        .mkString("[", ", ", "]")
      val outDims = (0 until EmbeddingDim).map(i =>
        s"floor(cvec[${i + 1}] * 1000000.0 + 0.5) / 1000000.0 AS c$i")
        .mkString(",\n  ")
      s"""WITH RECURSIVE km AS (
         |  SELECT 0 AS it, CAST(vec_id AS BIGINT) AS cent_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
         |  FROM embeddings WHERE vec_id < $NumCentroids
         |  UNION ALL
         |  SELECT it + 1, cell AS cent_id, $meanList AS cvec
         |  FROM (
         |    SELECT it, vec_id, v, cent_id AS cell,
         |      row_number() OVER (PARTITION BY it, vec_id
         |        ORDER BY ${cosChain("v", "cvec")} DESC, cent_id) AS arn
         |    FROM (SELECT k.it, e.vec_id, e.embedding AS v, k.cent_id, k.cvec
         |          FROM embeddings e CROSS JOIN km k WHERE k.it < $KmeansIters)
         |  ) WHERE arn = 1
         |  GROUP BY it, cell
         |)
         |SELECT cent_id, $outDims
         |FROM km WHERE it = (SELECT max(it) FROM km) ORDER BY cent_id""".stripMargin
    },

    "s1_cosine_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $NumQueries),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
         |s AS (SELECT query_id, neighbor_id,
         |  (${dotChain("qv", "cv")}) /
         |  (sqrt(${dotChain("qv", "qv")}) * sqrt(${dotChain("cv", "cv")})) AS sim
         |  FROM c CROSS JOIN q WHERE neighbor_id <> query_id),
         |r AS (SELECT query_id, neighbor_id, sim,
         |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM s)
         |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, round(sim, 6) AS sim
         |FROM r WHERE rank <= $TopK ORDER BY query_id, rank""".stripMargin,

    "s14_ann_recall" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
         |  FROM embeddings WHERE vec_id < $NumQueries),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
         |ts AS (SELECT query_id, neighbor_id,
         |  ${cosChain("qv", "cv")} AS sim
         |  FROM c CROSS JOIN q WHERE neighbor_id <> query_id),
         |truth AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, neighbor_id) AS rank FROM ts)
         |  WHERE rank <= $TopK),
         |lc AS (SELECT vec_id AS neighbor_id, embedding AS cv,
         |  ${bucketChain("embedding")} AS bucket FROM embeddings),
         |lq AS (SELECT vec_id AS query_id, embedding AS qv,
         |  ${bucketChain("embedding")} AS bucket FROM embeddings
         |  WHERE vec_id < $NumQueries),
         |ls AS (SELECT query_id, neighbor_id,
         |  ${cosChain("qv", "cv")} AS sim
         |  FROM lc JOIN lq USING (bucket) WHERE neighbor_id <> query_id),
         |approx AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, neighbor_id) AS rank FROM ls)
         |  WHERE rank <= $TopK)
         |SELECT t.query_id,
         |  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS DOUBLE) / count(*) AS recall
         |FROM truth t LEFT JOIN approx a
         |  ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "s2_lsh_ann" ->
      s"""WITH c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
         |  ${bucketChain("embedding")} AS bucket FROM embeddings),
         |q AS (SELECT vec_id AS query_id, embedding AS qv,
         |  ${bucketChain("embedding")} AS bucket FROM embeddings WHERE vec_id < $NumQueries),
         |s AS (SELECT query_id, neighbor_id,
         |  (${dotChain("qv", "cv")}) /
         |  (sqrt(${dotChain("qv", "qv")}) * sqrt(${dotChain("cv", "cv")})) AS sim
         |  FROM c JOIN q USING (bucket) WHERE neighbor_id <> query_id),
         |r AS (SELECT query_id, neighbor_id, sim,
         |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM s)
         |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, round(sim, 6) AS sim
         |FROM r WHERE rank <= $LshTopK ORDER BY query_id, rank""".stripMargin
  )

  /** Every oracle with the resource pin prefixed (see [[OraclePin]]); the
    * spill directory rides only on the first statement of a sorted run. */
  val all: Map[String, String] = {
    val first = raw.keys.min
    raw.map { case (k, v) =>
      k -> (OraclePin + (if (k == first) OracleSpillDir else "") + v)
    }
  }
}
