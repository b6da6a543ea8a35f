package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar transform library (SURVEY.md §2.3) — every one a built-in column
  * expression so it stays inside whole-stage codegen; no UDF in the hot path.
  */
object Funcs {

  /** P6 `precision(x)`: number of decimal places of a numeric string after
    * stripping trailing zeros (reference `src/utils/__init__.py:5-8`).
    * "0.01000000" → 2; "1" → 0; "1.0" → 0.
    */
  def precisionOf(numStr: Column): Column = {
    val frac = when(numStr.contains("."), element_at(split(numStr, "\\."), 2))
      .otherwise(lit(""))
    length(regexp_replace(frac, "0+$", ""))
  }

  /** P7 `to_decimal_str(p)`: `10^-p` as fixed-point string
    * (reference `src/utils/__init__.py:12-17`). p=3 → "0.001"; p=0 → "1". */
  def toDecimalStr(p: Column): Column =
    when(p <= 0, lit("1"))
      .otherwise(concat(lit("0."), repeat(lit("0"), (p - 1).cast("int")), lit("1")))

  /** P10 OKX long/short ratio split: r → (r/(1+r), 1 - r/(1+r)) in exact
    * decimal arithmetic (reference `okx/perp.py:116-121`). */
  def ratioSplit(r: Column): (Column, Column) = {
    val dec = r.cast("decimal(38,18)")
    val long = (dec / (dec + lit(1))).cast("decimal(38,18)")
    (long, (lit(1) - long).cast("decimal(38,18)"))
  }

  /** P12 Kalshi probability normalization `yes/(yes+no)` with zero/null
    * guards (reference `kalshi.py:77-98`): null when the denominator is 0 or
    * either side is null. */
  def probNorm(yes: Column, no: Column): Column =
    when(yes.isNull || no.isNull || (yes + no) === 0, lit(null))
      .otherwise(yes / (yes + no))

  /** P13 entity classification: first-match-wins, case-insensitive substring
    * (reference `oklink/fetcher.py:14-43`). Rule order is semantic. */
  def classifyByKeywords(text: Column, rules: Seq[(String, String)],
      default: String = "other"): Column =
    rules.foldRight(lit(default): Column) { case ((kw, label), acc) =>
      when(lower(text).contains(kw.toLowerCase), label).otherwise(acc)
    }

  /** P14 address-tag fallback chain (reference `oklink/fetcher.py:111-140`):
    * entityTag → hoverEntityTag → tokenTag → entityTags[0]. */
  def tagFallback(entityTag: Column, hoverEntityTag: Column, tokenTag: Column,
      entityTags: Column): Column =
    coalesce(entityTag, hoverEntityTag, tokenTag,
      when(size(entityTags) > 0, element_at(entityTags, 1)))

  /** P8 status-enum mapping from a literal table; unmapped → null
    * (reference `binance/perp.py:30-39` et al.). */
  def enumMap(c: Column, mapping: Map[String, Int]): Column = {
    val m = map(mapping.toSeq.flatMap { case (k, v) =>
      Seq(lit(k), lit(v)) }: _*)
    element_at(m, c)
  }

  /** P8 variant for integer-coded raw statuses (reference `mexc/perp.py:14-21`
    * keys its status_map on the raw `state` int). */
  def enumMapInt(c: Column, mapping: Map[Int, Int]): Column = {
    val m = map(mapping.toSeq.flatMap { case (k, v) =>
      Seq(lit(k), lit(v)) }: _*)
    element_at(m, c.cast("int"))
  }

  /** Canonical plain-decimal rendering: strip trailing FRACTIONAL zeros and a
    * bare trailing dot. "0.001000" → "0.001", "1.000" → "1", "10.0" → "10"
    * (a naive `0+$` strip would eat integer zeros: "10.0" → "1"). Apply only
    * to strings that are plain decimal renderings (no exponent). */
  def trimZeros(c: Column): Column =
    regexp_replace(regexp_replace(c, "(\\.\\d*?)0+$", "$1"), "\\.$", "")

  /** P9 Kraken asset canonicalization (reference `kraken/spot.py:8-26`). */
  val krakenAssetMap: Map[String, String] = Map(
    "XXBT" -> "BTC", "XBT" -> "BTC", "XETH" -> "ETH", "XXRP" -> "XRP",
    "XXLM" -> "XLM", "XXMR" -> "XMR", "XLTC" -> "LTC", "XETC" -> "ETC",
    "XZEC" -> "ZEC", "ZUSD" -> "USD", "ZEUR" -> "EUR", "ZGBP" -> "GBP",
    "ZJPY" -> "JPY", "ZCAD" -> "CAD", "ZAUD" -> "AUD")

  def canonicalizeKrakenAsset(c: Column): Column = {
    val m = map(krakenAssetMap.toSeq.flatMap { case (k, v) =>
      Seq(lit(k), lit(v)) }: _*)
    coalesce(element_at(m, c), c)
  }

  /** S6 auth: OKLink API-key obfuscation (reference
    * `system_utils/generate_apikey.py:9-31`): rotate the key's first 8 chars
    * to the end, add 1111111111111 to the epoch-ms timestamp and append
    * three digits (random in the reference — injected here so replays and
    * the spec are deterministic), then base64 of "rotatedKey|encodedTs".
    * Pure column math, no UDF. */
  val OklinkTsOffset = 1111111111111L

  def oklinkApiKey(apiKey: Column, tsMs: Column, extraDigits: Column): Column = {
    val rotated = concat(substring(apiKey, 9, Int.MaxValue),
      substring(apiKey, 1, 8))
    val encTs = concat((tsMs.cast("long") + OklinkTsOffset).cast("string"),
      extraDigits)
    base64(concat(rotated, lit("|"), encTs).cast("binary"))
  }
}
