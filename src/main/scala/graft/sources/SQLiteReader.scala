package graft.sources

import java.io.RandomAccessFile
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Minimal read-only SQLite table reader, from the published file format
  * (sqlite.org/fileformat2.html), for the archive-restore chain (reference
  * `system_utils/restore_market_snapshot_from_s3.py:144-191` opens the
  * restored `.db` with sqlite3 and range-scans `market_snapshot`).
  *
  * Scope — exactly what a restore needs, nothing more: walk one table's
  * b-tree and decode every row. Supports interior/leaf table pages, varints,
  * all serial types, payload overflow chains, and `INTEGER PRIMARY KEY`
  * rowid aliasing. Assumes a clean committed database file (no hot journal /
  * WAL frames — an archived snapshot, not a live db) and UTF-8 text
  * encoding; both are asserted, not silently misread.
  *
  * Values decode to: null | java.lang.Long | java.lang.Double | String |
  * Array[Byte]. Each call opens the file independently, so row iteration is
  * safe inside a Spark task (one task per .db file is the unit of
  * parallelism in [[graft.flows.ArchiveRestore]]).
  */
object SQLiteReader {

  final case class TableInfo(rootPage: Int, columns: Seq[String],
      rowidAlias: Option[Int])

  private final class Db(val raf: RandomAccessFile) {
    val header = new Array[Byte](100)
    raf.seek(0); raf.readFully(header)
    require(new String(header, 0, 16, StandardCharsets.ISO_8859_1)
      .startsWith("SQLite format 3"), "not a SQLite database")
    private def u16(off: Int): Int =
      ((header(off) & 0xff) << 8) | (header(off + 1) & 0xff)
    val pageSize: Int = { val v = u16(16); if (v == 1) 65536 else v }
    val usable: Int = pageSize - (header(20) & 0xff)
    // offset 56: text encoding, big-endian u32; 1 = UTF-8
    require(ByteBuffer.wrap(header, 56, 4).getInt == 1,
      "only UTF-8 databases supported")
    // offsets 18/19: file format write/read version; 2 = WAL journal mode,
    // whose latest frames live outside the main file — refuse rather than
    // silently read stale pages
    require((header(18) & 0xff) <= 1 && (header(19) & 0xff) <= 1,
      "WAL-mode database: archive must be checkpointed/VACUUMed first")

    def page(n: Int): Array[Byte] = {
      val buf = new Array[Byte](pageSize)
      raf.seek((n - 1).toLong * pageSize)
      raf.readFully(buf)
      buf
    }
  }

  private def varint(b: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L; var i = 0
    while (i < 8) {
      val x = b(off + i)
      v = (v << 7) | (x & 0x7f)
      i += 1
      if ((x & 0x80) == 0) return (v, i)
    }
    ((v << 8) | (b(off + 8) & 0xff), 9)
  }

  private def u16be(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def u32be(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** Serial-type width in bytes. */
  private def typeLen(t: Long): Int = t match {
    case 0 | 8 | 9 => 0
    case 1 => 1; case 2 => 2; case 3 => 3; case 4 => 4; case 5 => 6
    case 6 | 7 => 8
    case n if n >= 12 => ((n - 12) / 2).toInt
    case n => throw new IllegalStateException(s"reserved serial type $n")
  }

  private def decode(t: Long, b: Array[Byte], off: Int): Any = t match {
    case 0 => null
    case 8 => java.lang.Long.valueOf(0L)
    case 9 => java.lang.Long.valueOf(1L)
    case 7 => java.lang.Double.valueOf(
      java.lang.Double.longBitsToDouble(ByteBuffer.wrap(b, off, 8).getLong))
    case n if n >= 1 && n <= 6 =>
      val len = typeLen(n)
      var v = b(off).toLong // sign-extends the leading byte
      var i = 1
      while (i < len) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
      java.lang.Long.valueOf(v)
    case n if n >= 13 && n % 2 == 1 =>
      new String(b, off, typeLen(n), StandardCharsets.UTF_8)
    case n if n >= 12 =>
      java.util.Arrays.copyOfRange(b, off, off + typeLen(n))
  }

  /** Decode one record payload into column values. */
  private def record(payload: Array[Byte]): Array[Any] = {
    val (hdrLen, n0) = varint(payload, 0)
    val types = scala.collection.mutable.ArrayBuffer.empty[Long]
    var p = n0
    while (p < hdrLen) {
      val (t, n) = varint(payload, p); types += t; p += n
    }
    var off = hdrLen.toInt
    val out = new Array[Any](types.length)
    var i = 0
    while (i < types.length) {
      out(i) = decode(types(i), payload, off)
      off += typeLen(types(i))
      i += 1
    }
    out
  }

  /** Reassemble a cell payload that may spill to an overflow chain
    * (format §"cell payload overflow pages": first 4 bytes of each overflow
    * page = next page number, rest is data). */
  private def cellPayload(db: Db, page: Array[Byte], cellOff: Int)
      : (Array[Byte], Long) = {
    val (payloadLen, n1) = varint(page, cellOff)
    val (rowid, n2) = varint(page, cellOff + n1)
    val start = cellOff + n1 + n2
    val u = db.usable
    val maxLocal = u - 35
    if (payloadLen <= maxLocal) {
      (java.util.Arrays.copyOfRange(page, start, start + payloadLen.toInt),
        rowid)
    } else {
      val minLocal = (u - 12) * 32 / 255 - 23
      val k = minLocal + ((payloadLen - minLocal) % (u - 4)).toInt
      val local = if (k <= maxLocal) k else minLocal
      val out = new Array[Byte](payloadLen.toInt)
      System.arraycopy(page, start, out, 0, local)
      var got = local
      var next = u32be(page, start + local)
      while (next != 0 && got < payloadLen) {
        val op = db.page(next.toInt)
        val take = math.min(u - 4, payloadLen.toInt - got)
        System.arraycopy(op, 4, out, got, take)
        got += take
        next = u32be(op, 0)
      }
      require(got == payloadLen, s"truncated overflow chain: $got/$payloadLen")
      (out, rowid)
    }
  }

  /** Depth-first walk of a table b-tree, emitting (rowid, record values). */
  private def walk(db: Db, pageNo: Int)(
      emit: (Long, Array[Any]) => Unit): Unit = {
    val page = db.page(pageNo)
    val hdrOff = if (pageNo == 1) 100 else 0
    val pageType = page(hdrOff) & 0xff
    val nCells = u16be(page, hdrOff + 3)
    val ptrBase = hdrOff + (if (pageType == 5 || pageType == 2) 12 else 8)
    pageType match {
      case 13 => // table leaf
        var i = 0
        while (i < nCells) {
          val cellOff = u16be(page, ptrBase + 2 * i)
          val (payload, rowid) = cellPayload(db, page, cellOff)
          emit(rowid, record(payload))
          i += 1
        }
      case 5 => // table interior: left children + right-most pointer
        var i = 0
        while (i < nCells) {
          val cellOff = u16be(page, ptrBase + 2 * i)
          walk(db, u32be(page, cellOff).toInt)(emit)
          i += 1
        }
        walk(db, u32be(page, hdrOff + 8).toInt)(emit)
      case t => throw new IllegalStateException(
        s"page $pageNo: not a table b-tree page (type $t)")
    }
  }

  /** Column names from a CREATE TABLE statement: split the outer paren body
    * on depth-0 commas, first token of each definition, skipping table-level
    * constraints. Flags the `INTEGER PRIMARY KEY` rowid alias. */
  private[sources] def parseCreate(sql: String): (Seq[String], Option[Int]) = {
    val body = sql.substring(sql.indexOf('(') + 1, sql.lastIndexOf(')'))
    val defs = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; val cur = new StringBuilder
    body.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => defs += cur.toString; cur.clear()
      case c => cur += c
    }
    defs += cur.toString
    val constraint = Set("primary", "unique", "check", "foreign", "constraint")
    val cols = defs.map(_.trim).filter(_.nonEmpty)
      .filterNot(d => constraint(d.split("\\s+")(0).toLowerCase))
    val names = cols.map(_.split("\\s+")(0)
      .stripPrefix("\"").stripSuffix("\"")
      .stripPrefix("`").stripSuffix("`")
      .stripPrefix("[").stripSuffix("]"))
    val alias = cols.indexWhere(
      _.toLowerCase.matches("""\S+\s+integer\s+primary\s+key\b.*"""))
    (names.toSeq, if (alias >= 0) Some(alias) else None)
  }

  /** Read `sqlite_schema` (root = page 1): rows are
    * (type, name, tbl_name, rootpage, sql). */
  def tableInfo(file: java.io.File, table: String): TableInfo = {
    val raf = new RandomAccessFile(file, "r")
    try {
      val db = new Db(raf)
      var found: Option[TableInfo] = None
      walk(db, 1) { (_, vals) =>
        if (vals(0) == "table" && vals(1) == table) {
          val (cols, alias) = parseCreate(vals(4).asInstanceOf[String])
          found = Some(TableInfo(vals(3).asInstanceOf[java.lang.Long].toInt,
            cols, alias))
        }
      }
      found.getOrElse(throw new NoSuchElementException(
        s"table $table not found in ${file.getName}"))
    } finally raf.close()
  }

  /** All rows of `table`, materialized (archives are bounded per-day files;
    * the Spark layer parallelizes across FILES, not within one). A record
    * may have fewer values than the schema has columns (rows written before
    * an ALTER TABLE ADD COLUMN) — missing trailing values read as null. */
  def readTable(file: java.io.File, table: String)
      : (Seq[String], Vector[Array[Any]]) = {
    val info = tableInfo(file, table)
    val raf = new RandomAccessFile(file, "r")
    try {
      val db = new Db(raf)
      val rows = Vector.newBuilder[Array[Any]]
      walk(db, info.rootPage) { (rowid, vals) =>
        val out = new Array[Any](info.columns.length)
        System.arraycopy(vals, 0, out, 0, math.min(vals.length, out.length))
        info.rowidAlias.foreach(i => out(i) = java.lang.Long.valueOf(rowid))
        rows += out
      }
      (info.columns, rows.result())
    } finally raf.close()
  }
}
