package graft.lakehouse

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator
import scala.jdk.CollectionConverters._

/** Minimal versioned-directory commit protocol — the transactional core of
  * the reference's Delta overwrite (ecu/sbl/aace/datalake/common.py:531
  * `mode("overwrite").option("overwriteSchema","true")`) rebuilt on plain
  * Parquet, since no Delta/Iceberg jars ship in this environment.
  *
  * Layout under a table directory `T/`:
  * {{{
  *   T/_v1/  T/_v2/  ...        immutable parquet snapshots, one per commit
  *   T/_commit_1  T/_commit_2    commit markers — a version exists iff its
  *                               marker does; latest = max marker
  *   T/_LATEST                   legacy/debug pointer cache (markers win)
  * }}}
  *
  * Guarantees:
  *  - readers resolve the latest committed version once and then scan an
  *    immutable `_vN` directory — a concurrent overwrite never shows them a
  *    half-deleted or half-written table (the failure mode of naive
  *    `SaveMode.Overwrite`);
  *  - a writer claims its version by atomically creating the `_vN`
  *    directory (`Files.createDirectory`) before any data is written, so
  *    two writers can never interleave files into one snapshot;
  *  - the commit point is an atomic `Files.createFile` of the version's
  *    marker. Commits are monotonic by construction — latest is the MAX
  *    committed marker, so a slow writer finishing after a faster one
  *    simply lands as an earlier (already superseded) version; it can
  *    never move the table backwards. Version numbers allocate past every
  *    existing directory (committed or orphaned), so a crashed writer's
  *    partial `_vN` never wedges the table — it is skipped, never
  *    committed (no marker), and retention sweeps it later.
  *
  * Retention keeps the last [[Retain]] versions so in-flight readers of the
  * previous snapshot finish before their files disappear. On a real object
  * store the same protocol holds as long as marker creation is atomic
  * (e.g. conditional PUT); directory listing is only used for resolution
  * and cleanup.
  *
  * Pre-protocol directories (parquet files directly under `T/`, no markers
  * or pointer) stay readable: resolution falls back to `T/` itself.
  */
object Versioned {

  val PointerName = "_LATEST"
  val MarkerPrefix = "_commit_"
  val Retain = 2

  private def pointer(tableDir: Path): Path = tableDir.resolve(PointerName)
  private def versionDir(tableDir: Path, v: Long): Path =
    tableDir.resolve(s"_v$v")
  private def marker(tableDir: Path, v: Long): Path =
    tableDir.resolve(s"$MarkerPrefix$v")

  private def listNames(dir: Path): Seq[String] = {
    if (!Files.isDirectory(dir)) return Seq.empty
    val s = Files.list(dir)
    try s.iterator().asScala.map(_.getFileName.toString).toSeq
    finally s.close()
  }

  private def numericSuffix(name: String, prefix: String): Option[Long] =
    if (name.startsWith(prefix) && name.length > prefix.length &&
        name.drop(prefix.length).forall(_.isDigit))
      Some(name.drop(prefix.length).toLong)
    else None

  /** Current committed version: the max commit marker; legacy pointer-file
    * tables (pre-marker layout) fall back to the pointer value. */
  def latestVersion(tableDir: String): Option[Long] = {
    val dir = Paths.get(tableDir)
    val markers = listNames(dir).flatMap(numericSuffix(_, MarkerPrefix))
    if (markers.nonEmpty) Some(markers.max)
    else {
      val p = pointer(dir)
      if (!Files.isRegularFile(p)) None
      else scala.util.Try(
        new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong
      ).toOption
    }
  }

  /** True iff `version` was actually committed (its marker exists, or a
    * legacy pointer names it) — an orphaned/in-flight `_vN` directory is
    * NOT a committed snapshot. */
  def isCommitted(tableDir: String, version: Long): Boolean = {
    val dir = Paths.get(tableDir)
    Files.exists(marker(dir, version)) ||
      (listNames(dir).forall(!_.startsWith(MarkerPrefix)) &&
        latestVersion(tableDir).contains(version))
  }

  /** The path a reader should scan: the latest committed snapshot, or the
    * directory itself for pre-protocol/legacy layouts. */
  def readPath(tableDir: String): String = latestVersion(tableDir) match {
    case Some(v) => versionDir(Paths.get(tableDir), v).toString
    case None => tableDir
  }

  /** Run `write` against the next version directory, then atomically commit
    * it and sweep versions older than the retention window. Returns the
    * committed data path. */
  def commit(tableDir: String)(write: String => Unit): String = {
    val dir = Paths.get(tableDir)
    Files.createDirectories(dir)
    // allocate past EVERY existing _vN — committed or orphaned from a
    // crashed writer — so an orphan never blocks the table...
    val next = (latestVersion(tableDir).getOrElse(0L) +:
      listNames(dir).flatMap(numericSuffix(_, "_v"))).max + 1L
    val target = versionDir(dir, next)
    // ...and claim it atomically: createDirectory either makes the claim or
    // throws FileAlreadyExistsException — two writers can never interleave
    // files into one snapshot
    Files.createDirectory(target)
    write(target.toString)

    // commit point: atomic marker creation; monotonic by construction
    Files.createFile(marker(dir, next))
    // legacy/debug pointer cache — markers are authoritative, so a racing
    // stale value here is harmless
    try {
      val tmp = dir.resolve(s".${PointerName}.tmp-${java.util.UUID.randomUUID()}")
      Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, pointer(dir), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    } catch { case _: Exception => () }

    // retention sweep (best effort — a failure here never affects the
    // commit). Also sweeps pre-protocol loose data files once the table has
    // been on the protocol for a full version cycle (readers of the legacy
    // layout get the same one-version grace as snapshot readers) — without
    // this, the legacy copy of the table would sit on disk forever.
    try {
      listNames(dir).foreach { n =>
        val oldVersion = numericSuffix(n, "_v").exists(_ <= next - Retain)
        val oldMarker = numericSuffix(n, MarkerPrefix).exists(_ <= next - Retain)
        val legacyData = next >= 2 &&
          (n.endsWith(".parquet") || n.endsWith(".crc") || n == "_SUCCESS")
        if (oldVersion || oldMarker ||
            (legacyData && Files.isRegularFile(dir.resolve(n))))
          deleteRecursively(dir.resolve(n))
      }
    } catch { case _: Exception => () }
    target.toString
  }

  private[lakehouse] def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
}
