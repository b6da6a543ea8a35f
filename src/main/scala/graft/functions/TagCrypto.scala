package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64
import javax.crypto.Cipher
import javax.crypto.spec.SecretKeySpec

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** P15 — OKLink tag decryption (reference
  * `src/macro_markets/oklink/decrypt_post.py:40-122`): tags arrive as
  * base64(AES-128-ECB(ciphertext)) segments joined by '.', keyed by a
  * CryptoJS-compatible derivation from the response timestamp:
  *
  *   key = SHA1( hex(SHA1(ts)) )[:16 bytes]
  *
  * Decrypt: base64-decode, zero-pad to a 16-byte block, AES-ECB decrypt,
  * strip the trailing PKCS7 pad byte, UTF-8 decode; non-base64 or keyless
  * segments pass through unchanged; multi-segment tags join with ": ".
  *
  * Runs as a scalar UDF over tag columns — crypto cannot be expressed in
  * built-in expressions (SURVEY §2.10); everything around it stays codegen'd.
  */
object TagCrypto {

  /** key = first 16 bytes of SHA1(hexdigest(SHA1(ts))). */
  def deriveKey(ts: String): Array[Byte] = {
    val sha1 = MessageDigest.getInstance("SHA-1")
    val inner = sha1.digest(ts.getBytes(UTF_8))
    val innerHex = inner.map("%02x".format(_)).mkString
    val outer = MessageDigest.getInstance("SHA-1")
      .digest(innerHex.getBytes(UTF_8))
    // hex[:32] == first 16 raw bytes
    outer.take(16)
  }

  private def decryptSegment(b64: String, key: Array[Byte]): String = {
    val raw = try Base64.getDecoder.decode(b64)
              catch { case _: IllegalArgumentException => return b64 }
    val block = raw.padTo(16, 0.toByte)
    // non-block-aligned base64 (a plain tag that happens to decode) must
    // pass through, not kill the job — the reference would crash here, a
    // divergence we take deliberately for distributed robustness
    if (block.length % 16 != 0) return b64
    val cipher = Cipher.getInstance("AES/ECB/NoPadding")
    cipher.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"))
    val dec = cipher.doFinal(block)
    val pad = dec.last & 0xff
    val unpadded = if (pad >= 1 && pad <= 16) dec.dropRight(pad) else dec
    new String(unpadded, UTF_8)
  }

  /** Decrypt a (possibly multi-segment) tag string; pass-through for
    * non-encrypted values (no '=') — the reference's own heuristic
    * (`decrypt_post.py:80-82`), kept bug-compatible: a ciphertext whose
    * byte length is a multiple of 3 base64-encodes without '=' padding and
    * is skipped by BOTH implementations. */
  def decryptTag(tag: String, ts: String): String =
    decryptTagKeyed(tag, deriveKey(ts))

  private def decryptTagKeyed(tag: String, key: Array[Byte]): String = {
    if (tag == null || !tag.contains("=")) return tag
    tag.split("\\.").map(_.trim).map(decryptSegment(_, key)).mkString(": ")
  }

  /** Fields whose STRING value is a (possibly multi-segment) ciphertext. */
  val TagFields: Set[String] =
    Set("entityTag", "hoverEntityTag", "tokenTag", "propertyTag")

  /** Fields whose value is a LIST of ciphertexts (decrypted element-wise). */
  val ListFields: Set[String] = Set("entityTags", "propertyTags")

  /** Recursive JSON decryption (reference `decrypt_post.py:93-122`): walk an
    * arbitrarily nested response, decrypting every [[TagFields]] string and
    * every element of every [[ListFields]] array, at ANY depth — per-chain
    * maps, per-address info structs, future nesting — and return the
    * re-serialized JSON. Non-JSON input passes through unchanged. Mirrors
    * the reference exactly, including its non-recursion quirks: a tag
    * field holding a non-string is copied as-is (its `decrypt_tag` returns
    * non-str unchanged), and a list field holding a non-list falls through
    * to the ordinary recursive case. */
  def decryptJson(json: String, ts: String): String = {
    import com.fasterxml.jackson.databind.JsonNode
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
    if (json == null) return null
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = try mapper.readTree(json)
               catch { case _: Exception => return json }
    if (root == null) return json
    val key = deriveKey(ts)
    def walk(node: JsonNode): JsonNode = node match {
      case o: ObjectNode =>
        val out = mapper.createObjectNode()
        val it = o.fields()
        while (it.hasNext) {
          val e = it.next()
          val (k, v) = (e.getKey, e.getValue)
          if (TagFields(k) && v.isTextual)
            out.put(k, decryptTagKeyed(v.asText, key))
          else if (ListFields(k) && v.isArray) {
            val arr = out.putArray(k)
            v.forEach { x =>
              if (x.isTextual) arr.add(decryptTagKeyed(x.asText, key))
              else { arr.add(x); () }
            }
          } else out.set(k, walk(v))
        }
        out
      case a: ArrayNode =>
        val out = mapper.createArrayNode()
        a.forEach(x => { out.add(walk(x)); () })
        out
      case other => other
    }
    mapper.writeValueAsString(walk(root))
  }

  /** Encrypt helper (tests + fixture generation): inverse of decryptTag for
    * a single segment. */
  def encryptTag(plain: String, ts: String): String = {
    val key = deriveKey(ts)
    val cipher = Cipher.getInstance("AES/ECB/PKCS5Padding")
    cipher.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"))
    Base64.getEncoder.encodeToString(cipher.doFinal(plain.getBytes(UTF_8)))
  }

  val decryptTagUdf: UserDefinedFunction =
    udf((tag: String, ts: String) => decryptTag(tag, ts))

  /** Whole-response recursive decryption at the body grain: ONE UDF call
    * per response row (vs one per tag field per address), after which the
    * schema'd `from_json` parse reads plaintext everywhere. */
  val decryptJsonUdf: UserDefinedFunction =
    udf((json: String, ts: String) => decryptJson(json, ts))
}
