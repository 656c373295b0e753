package graft.lakehouse

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

/** Minimal versioned-directory commit protocol — the transactional core of
  * the reference's Delta overwrite (ecu/sbl/aace/datalake/common.py:531
  * `mode("overwrite").option("overwriteSchema","true")`) rebuilt on plain
  * Parquet, since no Delta/Iceberg jars ship in this environment.
  *
  * Layout under a table directory `T/`:
  * {{{
  *   T/_v1/  T/_v2/  ...   immutable parquet snapshots, one per commit
  *   T/_LATEST              pointer file holding the current version number
  * }}}
  *
  * Guarantees:
  *  - readers resolve `_LATEST` once and then scan an immutable `_vN`
  *    directory — a concurrent overwrite never shows them a half-deleted or
  *    half-written table (the failure mode of naive `SaveMode.Overwrite`);
  *  - the commit point is a single atomic rename of the pointer file
  *    (write-temp + ATOMIC_MOVE), so a crashed writer leaves at worst an
  *    orphaned `_vN` directory that the next commit's retention sweep
  *    removes — never a corrupt table;
  *  - two writers racing the same version fail loudly (the second data
  *    write hits an existing `_vN` directory) instead of interleaving
  *    output — single-writer-per-table is the contract, violation is an
  *    error, not corruption.
  *
  * Retention keeps the last [[Retain]] versions so in-flight readers of the
  * previous snapshot finish before their files disappear. On a real object
  * store the same protocol holds as long as the pointer swap is atomic
  * (e.g. conditional PUT); directory listing is only used for cleanup.
  *
  * Pre-protocol directories (parquet files directly under `T/`, no
  * `_LATEST`) stay readable: resolution falls back to `T/` itself.
  */
object Versioned {

  val PointerName = "_LATEST"
  val Retain = 2

  private def pointer(tableDir: Path): Path = tableDir.resolve(PointerName)
  private def versionDir(tableDir: Path, v: Long): Path =
    tableDir.resolve(s"_v$v")

  /** Current committed version, if the directory uses the protocol. */
  def latestVersion(tableDir: String): Option[Long] = {
    val p = pointer(Paths.get(tableDir))
    if (!Files.isRegularFile(p)) None
    else scala.util.Try(
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong
    ).toOption
  }

  /** The path a reader should scan: the latest committed snapshot, or the
    * directory itself for pre-protocol/legacy layouts. */
  def readPath(tableDir: String): String = latestVersion(tableDir) match {
    case Some(v) => versionDir(Paths.get(tableDir), v).toString
    case None => tableDir
  }

  /** Run `write` against the next version directory, then atomically commit
    * it as latest and sweep versions older than the retention window.
    * Returns the committed data path. */
  def commit(tableDir: String)(write: String => Unit): String = {
    val dir = Paths.get(tableDir)
    Files.createDirectories(dir)
    val next = latestVersion(tableDir).getOrElse(0L) + 1L
    val target = versionDir(dir, next)
    write(target.toString)

    // commit point: temp file + atomic rename
    val tmp = dir.resolve(s".${PointerName}.tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)

    // retention sweep (best effort — a failure here never affects the commit)
    try {
      val s = Files.list(dir)
      try s.iterator().forEachRemaining { p =>
        val n = p.getFileName.toString
        if (n.startsWith("_v") && n.drop(2).forall(_.isDigit) &&
            n.drop(2).nonEmpty && n.drop(2).toLong <= next - Retain)
          deleteRecursively(p)
      } finally s.close()
    } catch { case _: Exception => () }
    target.toString
  }

  private[lakehouse] def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
}
