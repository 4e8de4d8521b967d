package graft.sources.v2

import java.nio.file.{Files, Paths}
import java.util.Collections

import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.SnapshotStore

/**
 * Path-based V2 [[TableCatalog]] (the Iceberg `HadoopCatalog`-style shape):
 *
 * {{{
 *   spark.conf.set("spark.sql.catalog.graftcat", "graft.sources.v2.GraftCatalog")
 *   spark.sql("SELECT * FROM graftcat.`/data/store`")
 *   spark.sql("UPDATE graftcat.`/data/store` SET lang = 'und' WHERE ...")
 *   spark.sql("MERGE INTO graftcat.`/data/store` t USING src s ON ...")
 *   spark.sql("CREATE TABLE graftcat.`/data/new` AS SELECT ...")   // CTAS
 * }}}
 *
 * The identifier IS the store root path (one backquoted name part). A catalog
 * entry point matters beyond convenience: Spark's row-level DML rewrites
 * (`RewriteUpdateTable` / `RewriteMergeIntoTable` / `RewriteDeleteFromTable`)
 * fire only when the target resolves DIRECTLY to a `DataSourceV2Relation` —
 * a `CREATE TEMPORARY VIEW ... USING graft` target is wrapped in a `View`
 * node that those analyzer rules (deliberately) refuse, so UPDATE / MERGE are
 * only reachable through a catalog-resolved table.
 *
 * Tables are self-describing directories; namespaces don't exist and tables
 * are not enumerable (`listTables` of the filesystem would be unbounded), so
 * namespace operations return empty/unsupported, mirroring path-based tables
 * in other engines.
 */
final class GraftCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private def pathOf(ident: Identifier): String = {
    if (ident.namespace().nonEmpty)
      throw new NoSuchTableException(ident)
    ident.name()
  }

  /** A directory IS a graft table iff it carries the store's SNAPSHOT pointer
    * (written by the first commit, or by [[createTable]]'s empty-snapshot
    * init). The distinction is load-bearing for safety: `dropTable` deletes
    * recursively, and treating ANY directory as a table would let a typo'd
    * `DROP TABLE` — or the automatic rollback of a failed CTAS that "adopted"
    * an existing directory — wipe unrelated data. */
  private def isStore(root: String): Boolean =
    Files.isDirectory(Paths.get(root)) && Files.exists(SnapshotStore.snapshotPointer(root))

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // path-based: the filesystem is not an enumerable namespace

  override def loadTable(ident: Identifier): Table = {
    val root = pathOf(ident)
    if (!isStore(root)) // fail as "no such table" here, not "no snapshot" at scan time
      throw new NoSuchTableException(ident)
    new GraftTable(root)
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().isEmpty && isStore(ident.name())

  /** `CREATE TABLE graftcat.`/path` (cols...)` (and the create half of CTAS):
    * initializes an empty store — an empty snapshot is committed so the table
    * is readable (zero rows) before its first append — and persists the
    * SCHEMA sidecar, making the store self-describing. Any schema the codec
    * family covers is accepted (string/binary/timestamp/int family;
    * [[GraftDataSource.validateSchema]]); an empty column list means the
    * webtext default. The physical layout key is the schema's first string
    * column ([[GraftDataSource.sortKeyOf]]) — range-partitioned, sorted,
    * prefix/range-prunable, exactly like url on the webtext schema. Refuses to
    * adopt an existing non-empty directory that is not a store: CTAS rollback
    * would otherwise recursively delete pre-existing foreign data. */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table = {
    val root = pathOf(ident)
    val effective = if (schema.isEmpty) GraftDataSource.PageSchema else schema
    GraftDataSource.validateSchema(effective)
    require(partitions.isEmpty,
      "graft tables manage their own layout (sort-key range parts); PARTITIONED BY is not supported")
    if (isStore(root))
      throw new TableAlreadyExistsException(ident)
    val dir = Paths.get(root)
    if (Files.isDirectory(dir)) {
      import scala.jdk.CollectionConverters._
      val s = Files.list(dir)
      val nonEmpty = try s.iterator().asScala.hasNext finally s.close()
      require(!nonEmpty,
        s"directory $root exists, is not empty, and is not a graft store — refusing to " +
        "create a table over it (a failed CTAS rollback would delete its contents)")
    }
    Files.createDirectories(dir)
    GraftDataSource.writeSchemaSidecar(root, effective)
    SnapshotStore.commit(root, Seq.empty) // snapshot 1, zero parts: empty but readable
    new GraftTable(root)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft table schemas are fixed at creation; ALTER TABLE is not supported")

  /** DROP TABLE deletes the store directory (manifests + data). Only a
    * directory [[isStore]] recognizes is ever deleted — see the safety note
    * there. */
  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    val root = Paths.get(pathOf(ident))
    import scala.jdk.CollectionConverters._
    val walk = Files.walk(root)
    val all = try walk.iterator().asScala.toSeq.reverse finally walk.close()
    all.foreach(p => Files.deleteIfExists(p))
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft store paths are physical locations; RENAME is a filesystem move, not a catalog op")

  // ---- stored procedures: CALL graftcat.system.compact('/path') etc.
  // (maintenance + inspection from pure SQL — see GraftProcedures) ----

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"graft procedures live in the `system` namespace " +
      s"(CALL $catalogName.system.<proc>(...)), got `${ident.toString}`")
    GraftProcedures.load(ident.name())
  }

  /** Listing is namespace-faithful: only `system` (or the catalog root, for
    * discovery) holds procedures — a foreign namespace lists empty rather
    * than erroring, the usual SHOW semantics. */
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      GraftProcedures.Names.map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty

  override def defaultNamespace(): Array[String] = Array.empty

  override def capabilities(): java.util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    Collections.emptySet()
}
