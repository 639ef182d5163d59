package graft.table.iceberg

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Spark-side multi-table transaction over a REST catalog — the
  * client half of the protocol's commit_transaction endpoint
  * (reference: iceberg-rest-catalog/src/apis/catalog_api_api.rs:492
  * commit_transaction; models/commit_transaction_request.rs). All
  * staged changes land atomically or none do: the server validates
  * every table's requirements against its current state, CAS-commits
  * each table, and rolls already-committed tables back on any
  * conflict.
  *
  * Usage (Scala; `CALL cat.system.commit_transaction(...)` fronts the
  * append shape for SQL users):
  *
  *   val tx = new IcebergTransaction(spark, base)
  *   tx.append("db", "facts", factsDf)          // append the log
  *   tx.overwrite("db", "summary", summaryDf)   // rebuild the rollup
  *   tx.setProperties("db", "facts", Map("etl.run" -> runId))
  *   tx.commit()     // all-or-nothing
  *
  * Division of labor matches single-table commits: appends stage
  * their data files DIRECTLY to shared storage (distributed write,
  * unreferenced until the commit); only the metadata diff rides the
  * protocol. Requirements are built against the base each table was
  * OBSERVED at when its first change was staged — a foreign commit
  * that lands in between fails the transaction's asserts server-side
  * (409, nothing published). `commit()` then rebases onto fresh
  * server state and retries, up to `maxAttempts`; the staged data
  * files never rewrite, only the cheap manifest assembly re-runs
  * (same rebase shape as the single-table commitRetry). On
  * exhaustion the staged files are deleted and the commit throws. */
object IcebergTransaction {
  /** Build against a registered REST catalog's server (the
    * `spark.sql.catalog.<name>.uri` the catalog was configured
    * with) — so callers address the same server their SQL does. */
  def forCatalog(spark: SparkSession, catalogName: String)
      : IcebergTransaction = {
    val key = s"spark.sql.catalog.$catalogName.uri"
    val uri = spark.conf.getOption(key).getOrElse(
      throw new IllegalArgumentException(
        s"catalog '$catalogName' has no $key — multi-table " +
          "transactions ride the REST protocol"))
    new IcebergTransaction(spark, uri.stripSuffix("/"))
  }
}

class IcebergTransaction(spark: SparkSession, base: String) {
  import IcebergRestClient.TableChange

  private val mapper = new ObjectMapper()

  private case class Op(ns: String, name: String,
      mutate: IcebergMetadata.IceMetadata => IcebergMetadata.IceMetadata,
      cleanup: () => Unit, rebaseSafe: Boolean = true)

  private val ops = scala.collection.mutable.ArrayBuffer[Op]()
  // the server state each table was first observed at: requirements
  // pin THIS base on the first attempt, so any foreign commit since
  // staging is detected rather than silently absorbed
  private val observed = scala.collection.mutable.LinkedHashMap[
    (String, String), IcebergMetadata.IceMetadata]()
  private var done = false

  private def served(ns: String, name: String): IcebergMetadata.IceMetadata = {
    val uri =
      s"$base/v1/namespaces/${IcebergRestClient.encNs(ns)}/tables/$name"
    IcebergMetadata.fromJson(
      mapper.writeValueAsString(IcebergRestClient.getJson(uri).get("metadata")))
  }

  private def observe(ns: String, name: String): IcebergMetadata.IceMetadata =
    observed.getOrElseUpdate((ns, name), served(ns, name))

  /** Stage an append: data files land under the table's data dir now
    * (distributed write, unreferenced); the snapshot publishes only
    * with the transaction. */
  def append(ns: String, name: String, df: DataFrame): this.type = {
    require(!done, "transaction already committed or aborted")
    val m = observe(ns, name)
    val staged = IcebergWrite.stageAppend(spark, m, df)
    ops += Op(ns, name, staged.applyTo, staged.cleanup _)
    this
  }

  /** Stage a whole-content overwrite: the table's live set is
    * replaced by `df` when the transaction commits. NOT rebase-safe:
    * if the table moves between staging and commit, the transaction
    * refuses (the replacement may have been computed FROM the table,
    * so replaying it over the interloper would drop that commit) —
    * recompute and re-run. Appends and property changes on OTHER
    * tables in the same transaction still rebase freely. */
  def overwrite(ns: String, name: String, df: DataFrame): this.type = {
    require(!done, "transaction already committed or aborted")
    val m = observe(ns, name)
    val staged = IcebergWrite.stageOverwrite(spark, m, df)
    ops += Op(ns, name, staged.applyTo, staged.cleanup _, rebaseSafe = false)
    this
  }

  /** Stage table property changes. */
  def setProperties(ns: String, name: String, set: Map[String, String],
      remove: Seq[String] = Seq.empty): this.type = {
    require(!done, "transaction already committed or aborted")
    observe(ns, name)
    ops += Op(ns, name,
      m => m.copy(properties = m.properties ++ set -- remove), () => ())
    this
  }

  /** Commit everything atomically. Retries rebase onto fresh server
    * state (staged data files are reused; manifests reassemble). */
  def commit(maxAttempts: Int = 5): Unit = {
    require(!done, "transaction already committed or aborted")
    require(ops.nonEmpty, "empty transaction")
    var attempts = 0
    var lastErr = ""
    while (attempts < maxAttempts) {
      val bases =
        if (attempts == 0) observed.toMap
        else observed.keys.map { case (ns, n) => (ns, n) -> served(ns, n) }.toMap
      // rebase guard: an overwrite's content was computed against the
      // OBSERVED base — replaying it over a base that moved would
      // silently drop the interleaved commit, so refuse instead
      ops.filter(!_.rebaseSafe).foreach { op =>
        val fresh = bases((op.ns, op.name))
        if (fresh.currentSnapshotId !=
            observed((op.ns, op.name)).currentSnapshotId) {
          abort()
          throw new java.util.ConcurrentModificationException(
            s"multi-table transaction aborted: ${op.ns}.${op.name} moved " +
              "while an overwrite for it was staged; recompute the " +
              "replacement content and re-run (nothing was published)")
        }
      }
      // one TableChange per table, its ops folded in staging order
      val changes = ops.groupBy(o => (o.ns, o.name)).toSeq
        .sortBy { case (k, _) => observed.keys.toSeq.indexOf(k) }
        .map { case ((ns, n), tableOps) =>
          val b = bases((ns, n))
          val next = tableOps.foldLeft(b)((m, op) => op.mutate(m))
          TableChange(ns, n,
            nodes(IcebergRestCommit.requirements(b, next)),
            nodes(IcebergRestCommit.updates(b, next)))
        }
      val status = IcebergRestClient.commitTransaction(base, changes)
      if (status == 204) { done = true; return }
      if (status != 409) {
        abort()
        throw new IllegalStateException(
          s"commit_transaction failed: HTTP $status")
      }
      lastErr = s"lost commit race (409) on attempt ${attempts + 1}"
      attempts += 1
    }
    abort()
    throw new java.util.ConcurrentModificationException(
      s"multi-table transaction aborted after $maxAttempts attempts: " +
        s"$lastErr; staged files cleaned up, nothing published")
  }

  /** Drop every staged file; publishes nothing. */
  def abort(): Unit = {
    ops.foreach(_.cleanup())
    done = true
  }

  private def nodes(arr: com.fasterxml.jackson.databind.node.ArrayNode)
      : Seq[com.fasterxml.jackson.databind.node.ObjectNode] = {
    import scala.jdk.CollectionConverters._
    arr.elements().asScala.map(
      _.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]).toSeq
  }
}
