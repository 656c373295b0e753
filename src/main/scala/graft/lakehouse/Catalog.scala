package graft.lakehouse

import java.nio.file.{Files, Path, Paths}
import java.util.UUID
import scala.collection.mutable
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.DataFrame

/** Local-filesystem stand-in for the reference's Microsoft-Fabric lakehouse
  * catalog (workspaces → lakehouses → Tables/Files/Views directories).
  *
  * Reference: ecu/sbl/aace/datalake/common.py:213-351 (getWorkspace,
  * getLakehouseId, mountItUp, lakehouse_properties), common.py:386-392
  * (tablePath/viewPath), common.py:497-503 (getTables), common.py:93 +
  * 536-537 (ALL_TABLES registry). The Fabric REST/sempy/notebookutils
  * surface is not portable; only the property-dict data shape
  * (common.py:313-327) is preserved.
  */
final case class LakehouseProps(
    workspaceId: String,
    lakehouseId: String,
    lakehouseName: String,
    description: String,
    root: String) {
  def tablesPath: Path = Paths.get(root, "Tables")
  def filesPath: Path = Paths.get(root, "Files")
  def viewsPath: Path = Paths.get(root, "Views")
}

final case class TableInfo(
    lakehouseName: String,
    rowCount: Long,
    colCount: Int,
    columns: Seq[String],
    path: String,
    partitionBy: Seq[String] = Seq.empty)

final case class Workspace(id: String, name: String, lakehouses: Seq[LakehouseProps])

object Catalog {

  /** common.py:124-127 — strip all non-[a-zA-Z0-9_]. */
  def cleanString(s: String): String = s.replaceAll("[^a-zA-Z0-9_]", "")

  /** common.py:142-143 */
  def firstCharIsNumeric(s: String): Boolean =
    s != null && s.nonEmpty && s.charAt(0).isDigit

  /** common.py:129-138 — backtick-quote identifiers containing space or '-';
    * recurse over dot-qualified parts; idempotent on already-quoted names. */
  def escapeName(name: String): String =
    if (name.contains('.')) name.split("\\.", -1).map(escapeName).mkString(".")
    else if (name.contains('`')) name
    else if (name.contains(' ') || name.contains('-')) s"`$name`"
    else name

  /** common.py:146-164 — unique temp-view name `<prefix>_<uuid-hex>`,
    * cleaned, '_'-prefixed when starting numeric. `newUuid` is injectable
    * for deterministic tests (reference hardcodes uuid4). */
  def getTempTableName(
      prefix: String = null,
      newUuid: () => String = () => UUID.randomUUID().toString.replace("-", "")): String = {
    val p =
      if (prefix == null || prefix.replaceAll("_+$", "").isEmpty) "tmp"
      else prefix.replaceAll("_+$", "")
    val tabName = cleanString(s"${p}_${newUuid()}")
    if (firstCharIsNumeric(tabName)) s"_$tabName" else tabName
  }

  // ---- workspace / lakehouse registry (single "local" workspace) ----

  private val workspaces = mutable.LinkedHashMap.empty[String, Workspace]

  /** Register a local directory as a one-lakehouse workspace. Creates the
    * Tables/Files/Views dirs. Analogue of Fabric workspace provisioning. */
  def registerLocalWorkspace(rootDir: String, workspaceName: String = "local",
      lakehouseName: String = "lakehouse"): Workspace = synchronized {
    val root = Paths.get(rootDir, lakehouseName)
    Seq("Tables", "Files", "Views").foreach(d => Files.createDirectories(root.resolve(d)))
    val lh = LakehouseProps(
      workspaceId = workspaceName,
      lakehouseId = root.toString,
      lakehouseName = lakehouseName,
      description = s"local lakehouse at $root",
      root = root.toString)
    val ws = Workspace(workspaceName, workspaceName, Seq(lh))
    workspaces(workspaceName) = ws
    ws
  }

  /** common.py:213-224 — list/filter workspaces; error when none match. */
  def getWorkspace(workspaceId: Option[String] = None): Seq[Workspace] = synchronized {
    val ws = workspaceId match {
      case Some(id) => workspaces.get(id).toSeq
      case None => workspaces.values.toSeq
    }
    if (ws.isEmpty) throw new IllegalArgumentException(s"Workspace not found $workspaceId")
    ws
  }

  /** common.py:232-238 — lakehouse name → id within a workspace. */
  def getLakehouseId(lakehouseName: String, workspaceId: Option[String] = None): String =
    lakehouseProperties(Some(lakehouseName), workspace = workspaceId).head.lakehouseId

  /** common.py:273-351 — resolve one/all lakehouses to property records. */
  def lakehouseProperties(
      lakehouseName: Option[String] = None,
      lakehouseId: Option[String] = None,
      workspace: Option[String] = None): Seq[LakehouseProps] = synchronized {
    val all = getWorkspace(workspace).flatMap(_.lakehouses)
    val hit = (lakehouseName, lakehouseId) match {
      case (Some(n), _) => all.filter(_.lakehouseName == n)
      case (_, Some(id)) => all.filter(_.lakehouseId == id)
      case _ => all
    }
    if (hit.isEmpty)
      throw new java.io.FileNotFoundException(
        s"workspace.lakehouse '$workspace'.'${lakehouseName.orElse(lakehouseId)}'")
    hit
  }

  /** common.py:248-263 — local FS needs no mounting; identity. */
  def mountItUp(lh: LakehouseProps, mountName: String): LakehouseProps = lh

  /** common.py:386-392 — `<root>/Tables/<name>` resp. `/Views/<name>`. */
  def tablePath(lh: LakehouseProps, tableName: String): String =
    lh.tablesPath.resolve(tableName).toString
  def viewPath(lh: LakehouseProps, viewName: String): String =
    lh.viewsPath.resolve(viewName).toString

  /** common.py:497-503 — tables = subdirectory names of Tables/. */
  def getTables(lh: LakehouseProps): Seq[String] = {
    val dir = lh.tablesPath
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala
        .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSeq.sorted
      finally s.close()
    }
  }

  // ---- ALL_TABLES analogue: every written table, in creation order ----
  // common.py:93 (OrderedDict), common.py:536-537 (insert on writeTable).

  private val allTablesMap = mutable.LinkedHashMap.empty[String, (DataFrame, TableInfo)]

  def allTables: Map[String, (DataFrame, TableInfo)] = synchronized {
    // LinkedHashMap preserves insertion order; expose an ordered immutable view
    scala.collection.immutable.ListMap(allTablesMap.toSeq: _*)
  }
  def recordTable(name: String, df: DataFrame, info: TableInfo): Unit =
    synchronized { allTablesMap(name) = (df, info) }
  def forgetTable(name: String): Unit = synchronized { allTablesMap.remove(name) }
  def clearRegistry(): Unit = synchronized { allTablesMap.clear() }
}
