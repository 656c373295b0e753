package graft.lakehouse

import java.io.{DataInputStream, DataOutputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** Deletion-vector sidecars: row-level DELETE without rewriting data files
  * (Delta's deletion-vector feature; the reference's storage layer rewrites
  * whole files on every row delete — `common.py:505` routes DELETE through
  * a full Delta rewrite). A sidecar records the SORTED parquet row indexes
  * of one data file's deleted rows; scans subtract them at read time via
  * `_metadata.row_index`. At 100 TB, deleting 0.01% of rows writes a few
  * MB of sidecars instead of rewriting TBs of parquet — the difference
  * between an operable and an inoperable DELETE path at scale.
  *
  * Format (gzip over big-endian): magic `GDV1`, row count N, then N
  * DELTA-encoded longs (first index absolute, rest gaps) — sorted runs of
  * adjacent deletes compress to ~1 byte/row before gzip. Sidecars are
  * immutable: merging deletes writes a NEW sidecar (old one ages out of the
  * retention window like any unreferenced file), so concurrent readers of
  * the previous version never observe a vector growing under them.
  */
object DeletionVectors {

  private val Magic = 0x47445631 // "GDV1"

  /** File-name prefix: sidecars live beside data files at the table root
    * (vacuumed by the same referenced-set rule — see [[Versioned]] sweep). */
  val Prefix = "dv-"

  /** Write a sidecar holding `sorted` (strictly increasing) row indexes
    * into `tableDir`; returns the table-relative sidecar name. */
  def write(tableDir: String, sorted: Array[Long]): String = {
    require(sorted.nonEmpty, "empty deletion vector — omit the stat instead")
    var i = 1
    while (i < sorted.length) {
      require(sorted(i) > sorted(i - 1), "row indexes must be sorted+distinct")
      i += 1
    }
    val name = s"$Prefix${java.util.UUID.randomUUID()}.bin"
    val p = Paths.get(tableDir).resolve(name)
    val out = new DataOutputStream(
      new GZIPOutputStream(Files.newOutputStream(p)))
    try {
      out.writeInt(Magic)
      out.writeInt(sorted.length)
      out.writeLong(sorted(0))
      var j = 1
      while (j < sorted.length) {
        out.writeLong(sorted(j) - sorted(j - 1)); j += 1
      }
    } finally out.close()
    name
  }

  /** Read a sidecar back into its sorted row-index array. */
  def read(p: Path): Array[Long] = {
    val in = new DataInputStream(
      new GZIPInputStream(Files.newInputStream(p)))
    try {
      require(in.readInt() == Magic, s"$p is not a deletion-vector sidecar")
      val n = in.readInt()
      val out = new Array[Long](n)
      if (n > 0) {
        out(0) = in.readLong()
        var i = 1
        while (i < n) { out(i) = out(i - 1) + in.readLong(); i += 1 }
      }
      out
    } finally in.close()
  }

  /** Union of two sorted row-index arrays (merging a new delete into a
    * file's existing vector). */
  def merged(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](a.length + b.length)
    var i = 0; var j = 0; var k = 0
    while (i < a.length && j < b.length) {
      val c = java.lang.Long.compare(a(i), b(j))
      if (c < 0) { out(k) = a(i); i += 1 }
      else if (c > 0) { out(k) = b(j); j += 1 }
      else { out(k) = a(i); i += 1; j += 1 }
      k += 1
    }
    while (i < a.length) { out(k) = a(i); i += 1; k += 1 }
    while (j < b.length) { out(k) = b(j); j += 1; k += 1 }
    if (k == out.length) out else java.util.Arrays.copyOf(out, k)
  }

  /** Load the vectors a scan needs, keyed by the data file's ABSOLUTE
    * filesystem path (the decoded form of `_metadata.file_path`) — driver
    * memory is O(total deleted rows in the scanned files), the same bound
    * Delta accepts when it broadcasts DV descriptors to its scans. `dv`
    * values resolve against `base` unless absolute (shallow-clone refs). */
  def load(base: String, dv: Map[String, String]): Map[String, Array[Long]] = {
    val baseP = Paths.get(base)
    dv.map { case (file, sidecar) =>
      val filePath = baseP.resolve(file).toString
      val sidecarPath =
        if (Paths.get(sidecar).isAbsolute) Paths.get(sidecar)
        else baseP.resolve(sidecar)
      filePath -> read(sidecarPath)
    }
  }
}
