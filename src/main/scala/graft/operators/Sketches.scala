package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sketch primitives for frequency estimation over corpora too large to
  * count exactly — the count-min sketch (Cormode & Muthukrishnan 2005).
  *
  * Why this matters at 100 TB: exact token frequencies need a
  * vocabulary-grain shuffle (billions of keys); the CMS compresses the
  * whole corpus into a fixed depth×width counter grid, so the "build"
  * aggregation has at most depth×width distinct keys — map-side partial
  * aggregation collapses each task's contribution to ≤2 k rows regardless
  * of input size, and the merge is a trivial sum. Estimates then read
  * `depth` counters per probe key: point lookups against a
  * broadcast-sized table.
  *
  * The hash is the repo's portable md5 scheme (value of the first 15 hex
  * chars, seeded per sketch row) so the DuckDB oracle reproduces every
  * bucket exactly — the sketch, not just the estimates, is
  * deterministic across engines.
  */
object Sketches {

  /** Bucket of `tok` in sketch row `row`: md5("row:tok") folded to a long
    * (first 15 hex chars — fits a long) mod `width`. Pure map-side. */
  def cmsBucket(tok: Column, row: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"$row:"), tok)), 1, 15), 16, 10)
      .cast("long") % width

  /** All `depth` (row, bucket) probes of `tok` as an exploded column pair;
    * select with `.as(Seq("rw", "bucket"))`. */
  def cmsProbes(tok: Column, depth: Int, width: Int): Column =
    posexplode(array((0 until depth).map(r => cmsBucket(tok, r, width)): _*))
}
