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
  *    orphaned `_vN` directory — never a corrupt table. Version numbers
  *    are allocated PAST any existing directory (committed or orphaned),
  *    so a crash never wedges the table: the orphan is skipped and later
  *    swept by retention;
  *  - a writer claims its version by atomically creating the `_vN`
  *    directory (`Files.createDirectory` — an atomic filesystem primitive,
  *    unlike check-then-write) before any data is written; two racing
  *    writers can never interleave files into one snapshot — the loser
  *    fails loudly on the claim. Single-writer-per-table remains the
  *    contract; violation is an error, not corruption.
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

  private def existingVersions(dir: Path): Seq[Long] = {
    if (!Files.isDirectory(dir)) return Seq.empty
    val s = Files.list(dir)
    try s.iterator().asScalaSeq.flatMap { p =>
      val n = p.getFileName.toString
      if (n.startsWith("_v") && n.length > 2 && n.drop(2).forall(_.isDigit))
        Some(n.drop(2).toLong)
      else None
    } finally s.close()
  }

  // tiny shim: java stream iterator -> strict Seq (avoids a scala-collection
  // converters import for one call site)
  private implicit class It[A](it: java.util.Iterator[A]) {
    def asScalaSeq: Seq[A] = {
      val b = Seq.newBuilder[A]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }

  /** Run `write` against the next version directory, then atomically commit
    * it as latest and sweep versions older than the retention window.
    * Returns the committed data path. */
  def commit(tableDir: String)(write: String => Unit): String = {
    val dir = Paths.get(tableDir)
    Files.createDirectories(dir)
    // allocate past EVERY existing _vN — committed or orphaned from a
    // crashed writer — so an orphan never blocks the table...
    val next = (latestVersion(tableDir).getOrElse(0L) +:
      existingVersions(dir)).max + 1L
    val target = versionDir(dir, next)
    // ...and claim it atomically: createDirectory either makes the claim or
    // throws FileAlreadyExistsException for the racing loser — two writers
    // can never interleave files into one snapshot
    Files.createDirectory(target)
    write(target.toString)

    // commit point: temp file + atomic rename
    val tmp = dir.resolve(s".${PointerName}.tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer(dir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)

    // retention sweep (best effort — a failure here never affects the
    // commit). Also sweeps pre-protocol loose data files once the table has
    // been on the protocol for a full version cycle (readers of the legacy
    // layout get the same one-version grace as snapshot readers) — without
    // this, the legacy copy of the table would sit on disk forever.
    try {
      val s = Files.list(dir)
      try s.iterator().forEachRemaining { p =>
        val n = p.getFileName.toString
        val isOldVersion = n.startsWith("_v") && n.length > 2 &&
          n.drop(2).forall(_.isDigit) && n.drop(2).toLong <= next - Retain
        val isLegacyData = next >= 2 && Files.isRegularFile(p) &&
          (n.endsWith(".parquet") || n.endsWith(".crc") || n == "_SUCCESS")
        if (isOldVersion || isLegacyData) deleteRecursively(p)
      } finally s.close()
    } catch { case _: Exception => () }
    target.toString
  }

  private[lakehouse] def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
}
