package graft.table

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Namespace properties as a dot-file inside the namespace directory
  * (dot-names are excluded from every listing) — the one on-disk
  * convention shared by the warehouse-mode catalog and the REST
  * server, so both front-ends over the same warehouse agree
  * (reference: iceberg-rest-catalog namespace update_properties with
  * the updated/removed/missing response shape).
  *
  * Read-modify-write cycles serialize on a JVM-wide lock (the REST
  * server runs a thread pool; the catalog may race a co-located
  * server in tests), and writes land via temp+rename so a crash
  * never leaves a truncated file. */
object NsProps {
  val FileName = ".nsprops.json"
  private val mapper = new ObjectMapper()
  private[graft] val lock = new Object

  private def propsPath(nsDir: String) =
    new org.apache.hadoop.fs.Path(nsDir, FileName)

  def read(nsDir: String): Map[String, String] = {
    val p = propsPath(nsDir)
    if (!TableIO.exists(p)) Map.empty
    else mapper.readTree(TableIO.readString(p))
      .properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
  }

  def write(nsDir: String, props: Map[String, String]): Unit = {
    val n = mapper.createObjectNode()
    props.toSeq.sortBy(_._1).foreach { case (k, v) => n.put(k, v) }
    val tmp = new org.apache.hadoop.fs.Path(nsDir,
      s".nsprops-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    TableIO.writeString(tmp, mapper.writeValueAsString(n))
    TableIO.renameOverwrite(tmp, propsPath(nsDir))
  }

  /** Atomic set/remove; returns (removed, missing) like the REST
    * update_properties response. */
  def update(nsDir: String, set: Map[String, String],
      remove: Seq[String]): (Seq[String], Seq[String]) = lock.synchronized {
    val cur = read(nsDir)
    write(nsDir, cur -- remove ++ set)
    (remove.filter(cur.contains), remove.filterNot(cur.contains))
  }
}
