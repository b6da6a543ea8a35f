package graft.flows

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.functions.{Funcs, TagCrypto}
import graft.sinks.UpsertSink
import graft.time.Align

/** OKLink on-chain large-transfer sync (reference
  * `macro_markets/oklink/fetcher.py:142-198`):
  *
  *  1. parse the tx feed (S6);
  *  2. parse the address-tag response — nested `data.chain.addr.info` with
  *     AES-encrypted tag fields — decrypt (P15, [[TagCrypto]]) and resolve
  *     each address's tag by the fallback chain entityTag → hoverEntityTag →
  *     tokenTag → entityTags[0] (P14, `fetcher.py:111-140`);
  *  3. J5 double lookup: tags probed for from_address AND to_address
  *     (left-outer ×2, misses stay NULL);
  *  4. entity classification of tags by ordered keyword rules (P13,
  *     `fetcher.py:14-43`);
  *  5. append to `onchain_large_transfer`.
  */
object SyncOnchain {

  /** `fetcher.py:14-43` ENTITY_RULES — order-sensitive, first match wins. */
  val EntityRules: Seq[(String, String)] = Seq(
    "binance" -> "cex", "okx" -> "cex", "coinbase" -> "cex",
    "kraken" -> "cex", "bybit" -> "cex", "uniswap" -> "dex",
    "curve" -> "dex", "bridge" -> "bridge", "fund" -> "fund",
    "whale" -> "whale")

  private val txSchema = DataType.fromDDL(
    "struct<data struct<hits array<struct<chain string, txHash string, " +
      "fromAddress string, toAddress string, tokenSymbol string, " +
      "tokenContractAddress string, value double, price double, " +
      "valueUsd double, timestamp long>>>>")

  private val tagSchema = DataType.fromDDL(
    "struct<data map<string, map<string, struct<entityTag string, " +
      "hoverEntityTag string, tokenTag string, propertyTag string, " +
      "entityTags array<string>, propertyTags array<string>>>>>")

  /** tx feed body → one row per transfer. */
  def parseTxs(raw: DataFrame): DataFrame =
    raw.select(explode(from_json(col("body"), txSchema)
      .getField("data").getField("hits")).as("t"))
      .select(col("t.chain").as("chain"), col("t.timestamp").as("ts"),
        col("t.txHash").as("tx_hash"),
        col("t.fromAddress").as("from_address"),
        col("t.toAddress").as("to_address"),
        col("t.tokenSymbol").as("token"),
        col("t.tokenContractAddress").as("token_contract"),
        col("t.value").as("value"), col("t.price").as("price"),
        col("t.valueUsd").as("value_usd"))

  /** tag response body (+ response ts for key derivation) →
    * (chain, address, tag) with decryption and the P14 fallback chain.
    *
    * Decryption happens ONCE at the body grain with the recursive JSON walk
    * ([[TagCrypto.decryptJson]], reference `decrypt_post.py:93-122`): every
    * tag field and tag-list element at ANY depth — per-chain maps,
    * per-address info structs, entityTags/propertyTags arrays — is
    * plaintext before the schema'd parse, so the fallback chain is plain
    * codegen'd coalesce with no per-field UDF calls. */
  def parseTags(raw: DataFrame): DataFrame = {
    val dec = raw.select(col("ts"),
      TagCrypto.decryptJsonUdf(col("body"), col("ts").cast("string"))
        .as("body"))
    val byChain = dec.select(
      explode(from_json(col("body"), tagSchema).getField("data")))
      .toDF("chain", "addrMap")
    val byAddr = byChain.select(col("chain"),
      explode(col("addrMap"))).toDF("chain", "address", "info")
    byAddr.select(col("chain"), col("address"),
      coalesce(
        col("info.entityTag"), col("info.hoverEntityTag"),
        col("info.tokenTag"),
        when(size(col("info.entityTags")) > 0,
          element_at(col("info.entityTags"), 1))).as("tag"))
      .where(col("tag").isNotNull)
  }

  /** J5: probe the tag table for both endpoints of every transfer; P13
    * classify the resolved tags. */
  def enrich(txs: DataFrame, tags: DataFrame): DataFrame = {
    val fromTags = tags.select(col("chain"),
      col("address").as("from_address"), col("tag").as("from_tag"))
    val toTags = tags.select(col("chain"),
      col("address").as("to_address"), col("tag").as("to_tag"))
    txs
      .join(broadcast(fromTags), Seq("chain", "from_address"), "left_outer")
      .join(broadcast(toTags), Seq("chain", "to_address"), "left_outer")
      .select(col("chain"), col("ts"), Align.dtString(col("ts")).as("dt"),
        col("tx_hash"), col("from_address"), col("from_tag"),
        col("to_address"), col("to_tag"),
        Funcs.classifyByKeywords(coalesce(col("to_tag"), col("from_tag"),
          lit("")), EntityRules, "unknown").as("entity_class"),
        col("token"), col("token_contract"),
        col("value"), col("price"), col("value_usd"))
  }

  def run(spark: SparkSession, sinkPath: String, txBodies: DataFrame,
      tagBodies: DataFrame): Unit =
    UpsertSink.append(spark, sinkPath,
      enrich(parseTxs(txBodies), parseTags(tagBodies)))
}
