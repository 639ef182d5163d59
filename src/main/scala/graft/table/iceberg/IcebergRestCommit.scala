package graft.table.iceberg

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** REST transport for table metadata commits — the wiring that lets
  * Spark SQL front the REST catalog the way the reference's SQL layer
  * fronts RestCatalog (iceberg-rest-catalog/src/catalog.rs:61 `impl
  * Catalog for RestCatalog`, exposed to SQL via
  * datafusion_iceberg/src/catalog/catalog.rs:34).
  *
  * Division of labor matches every Iceberg REST deployment: the ENGINE
  * writes data files, delete files, manifests and manifest lists
  * directly to shared storage; the CATALOG SERVER owns the metadata
  * pointer — every metadata.json change rides the update-table
  * protocol (requirements + updates, CAS on the server, 409 on a lost
  * race). The engine never writes vN.metadata.json itself for a
  * REST-managed table.
  *
  * Tables a REST-mode catalog loads are REGISTERED here by location;
  * `IcebergMetadata.commitRetry` consults the registry and routes the
  * commit through the protocol instead of the local CAS. Because
  * commitRetry is the single commit choke point of every write path
  * (append, overwrite, row-level DML, schema/spec/sort evolution,
  * maintenance), ALL of Spark SQL's DDL/DML rides REST with no
  * per-path wiring.
  *
  * The protocol body is a generic METADATA DIFF: the mutation runs
  * against the server-served base, and base→next is expressed as the
  * spec's update actions (add-snapshot, set-snapshot-ref, add-schema,
  * set-current-schema, add-spec, set-properties, remove-snapshots, …)
  * guarded by the matching assert-* requirements — the same
  * requirement generation a strict reference client performs
  * (iceberg-rust catalog commit.rs TableRequirement/TableUpdate). */
object IcebergRestCommit {
  private val mapper = new ObjectMapper()

  /** Where a REST-managed table's commits go. */
  case class Route(base: String, ns: String, table: String)

  private val routes =
    new java.util.concurrent.ConcurrentHashMap[String, Route]()

  /** Registry key: scheme://authority/path, with a missing scheme
    * reading as the local default ("file") on BOTH register and
    * lookup — so file:/wh/t and /wh/t still match, while two
    * warehouses with identical paths on different filesystems
    * (file:/// vs hdfs://nn/) can never collide in the registry. */
  private def norm(location: String): String = {
    val u = new org.apache.hadoop.fs.Path(location).toUri
    val scheme = Option(u.getScheme).getOrElse("file")
    val auth = Option(u.getAuthority).getOrElse("")
    val path = (if (u.getPath == null || u.getPath.isEmpty) location
      else u.getPath).stripSuffix("/")
    s"$scheme://$auth$path"
  }

  /** Mark `location` as catalog-managed: subsequent metadata commits
    * under it ride the REST protocol. Idempotent. */
  def register(location: String, route: Route): Unit =
    routes.put(norm(location), route)

  def deregister(location: String): Unit = routes.remove(norm(location))

  /** Drop every route pointing at a server base — the teardown hook
    * for short-lived test/bench servers, so a later direct commit to
    * a reused location is never re-routed to a dead server. */
  def deregisterBase(base: String): Unit = {
    val b = base.stripSuffix("/")
    routes.entrySet().removeIf(e => e.getValue.base == b)
    ()
  }

  def lookup(location: String): Option[Route] =
    Option(routes.get(norm(location)))

  /** Load-mutate-POST with bounded retries — the REST twin of the
    * local load-mutate-CAS. The base is the SERVER's view (GET), the
    * commit is requirements + a diff of updates; a 409 (either a
    * failed requirement or a lost server-side CAS) re-runs the
    * mutation against a fresh base. */
  def commitRetry(route: Route)(
      mutate: IcebergMetadata.IceMetadata => IcebergMetadata.IceMetadata)
      : IcebergMetadata.IceMetadata = {
    var attempts = 0
    while (true) {
      val uri =
        s"${route.base}/v1/namespaces/" +
          s"${IcebergRestClient.encNs(route.ns)}/tables/${route.table}"
      val served = IcebergRestClient.getJson(uri)
      val base = IcebergMetadata.fromJson(
        mapper.writeValueAsString(served.get("metadata")))
      val next = mutate(base)
      // identity result = nothing to do; don't POST an empty commit
      if (next eq base) return base
      val body = mapper.createObjectNode()
      body.set("requirements", requirements(base, next))
      body.set("updates", updates(base, next))
      val resp = IcebergRestClient.postJson(uri,
        mapper.writeValueAsString(body))
      if (resp.statusCode() == 200)
        return IcebergMetadata.fromJson(mapper.writeValueAsString(
          mapper.readTree(resp.body()).get("metadata")))
      require(resp.statusCode() == 409,
        s"REST commit to ${route.ns}.${route.table} failed: " +
          s"${resp.statusCode()} ${resp.body()}")
      attempts += 1
      require(attempts < 50,
        s"lost $attempts REST commit races on ${route.ns}.${route.table}")
    }
    throw new IllegalStateException("unreachable")
  }

  /** The optimistic-concurrency asserts guarding this diff: pin the
    * table identity, every ref the commit moves (plus main — the
    * scan base of whatever derived this commit), and the evolution
    * counters for the metadata sections the diff touches. */
  private[iceberg] def requirements(base: IcebergMetadata.IceMetadata,
      next: IcebergMetadata.IceMetadata): ArrayNode = {
    val arr = mapper.createArrayNode()
    if (next.tableUuid == base.tableUuid) {
      val u = arr.addObject()
      u.put("type", "assert-table-uuid"); u.put("uuid", base.tableUuid)
    }
    val movedRefs = (next.refs.keySet ++ base.refs.keySet)
      .filter(r => next.refs.get(r) != base.refs.get(r))
    (movedRefs + "main").toSeq.sorted.foreach { r =>
      val n = arr.addObject()
      n.put("type", "assert-ref-snapshot-id"); n.put("ref", r)
      base.refs.get(r) match {
        case Some(id) => n.put("snapshot-id", id)
        case None => n.putNull("snapshot-id")
      }
    }
    if (next.schemas != base.schemas ||
        next.currentSchemaId != base.currentSchemaId) {
      val s = arr.addObject()
      s.put("type", "assert-current-schema-id")
      s.put("current-schema-id", base.currentSchemaId)
      val f = arr.addObject()
      f.put("type", "assert-last-assigned-field-id")
      f.put("last-assigned-field-id", base.lastColumnId)
    }
    if (next.specs != base.specs ||
        next.defaultSpecId != base.defaultSpecId) {
      val d = arr.addObject()
      d.put("type", "assert-default-spec-id")
      d.put("default-spec-id", base.defaultSpecId)
      val p = arr.addObject()
      p.put("type", "assert-last-assigned-partition-id")
      p.put("last-assigned-partition-id", base.lastPartitionId)
    }
    if (next.defaultSortOrderId != base.defaultSortOrderId) {
      val o = arr.addObject()
      o.put("type", "assert-default-sort-order-id")
      o.put("default-sort-order-id", base.defaultSortOrderId)
    }
    arr
  }

  /** base→next as protocol update actions. Ordering matters only at
    * the edges: snapshots are added before refs move onto them, and
    * remove-snapshots goes LAST so a commit that both moves main and
    * expires its old target never trips the server's
    * "cannot remove the current snapshot" guard mid-application. */
  private[iceberg] def updates(base: IcebergMetadata.IceMetadata,
      next: IcebergMetadata.IceMetadata): ArrayNode = {
    val arr = mapper.createArrayNode()
    def obj(action: String): ObjectNode = {
      val n = arr.addObject(); n.put("action", action); n
    }
    if (next.tableUuid != base.tableUuid)
      obj("assign-uuid").put("uuid", next.tableUuid)
    if (next.formatVersion != base.formatVersion)
      obj("upgrade-format-version")
        .put("format-version", next.formatVersion)
    if (next.location != base.location)
      obj("set-location").put("location", next.location)
    // schema eras only ever APPEND (ids are never reused); an in-place
    // change of an existing era is not protocol-expressible — fail
    // loudly rather than commit a lie
    base.schemas.foreach { bs =>
      next.schemas.find(_.schemaId == bs.schemaId).foreach(ns =>
        require(ns == bs,
          s"schema era ${bs.schemaId} changed in place; not " +
            "expressible as REST updates"))
    }
    next.schemas
      .filterNot(s => base.schemas.exists(_.schemaId == s.schemaId))
      .foreach(s =>
        obj("add-schema").set[ObjectNode]("schema",
          IcebergMetadata.schemaToNode(s)))
    if (next.currentSchemaId != base.currentSchemaId)
      obj("set-current-schema").put("schema-id", next.currentSchemaId)
    base.specs.foreach { bs =>
      next.specs.find(_.specId == bs.specId).foreach(ns =>
        require(ns == bs,
          s"partition spec ${bs.specId} changed in place; not " +
            "expressible as REST updates"))
    }
    next.specs
      .filterNot(s => base.specs.exists(_.specId == s.specId))
      .foreach(s => obj("add-spec").set[ObjectNode]("spec", specToNode(s)))
    if (next.defaultSpecId != base.defaultSpecId)
      obj("set-default-spec").put("spec-id", next.defaultSpecId)
    next.sortOrders
      .filterNot(o => base.sortOrders.exists(_.orderId == o.orderId))
      .foreach(o =>
        obj("add-sort-order").set[ObjectNode]("sort-order", sortOrderToNode(o)))
    if (next.defaultSortOrderId != base.defaultSortOrderId)
      obj("set-default-sort-order")
        .put("sort-order-id", next.defaultSortOrderId)
    val setProps = next.properties.filter { case (k, v) =>
      !base.properties.get(k).contains(v) }
    if (setProps.nonEmpty) {
      val u = obj("set-properties").putObject("updates")
      setProps.toSeq.sortBy(_._1).foreach { case (k, v) => u.put(k, v) }
    }
    val remProps = (base.properties.keySet -- next.properties.keySet).toSeq
    if (remProps.nonEmpty) {
      val r = obj("remove-properties").putArray("removals")
      remProps.sorted.foreach(r.add)
    }
    next.snapshots
      .filterNot(s => base.snapshots.exists(_.snapshotId == s.snapshotId))
      .sortBy(_.sequenceNumber)
      .foreach(s =>
        obj("add-snapshot").set[ObjectNode]("snapshot",
          IcebergMetadata.snapshotToNode(s)))
    def refType(r: String): String = next.refTypes.getOrElse(r, "branch")
    def emitRef(r: String): Unit =
      setRef(obj("set-snapshot-ref"), r, next.refs(r), refType(r),
        next.refRetention.get(r))
    (next.refs.keySet -- base.refs.keySet).toSeq.sorted.foreach(emitRef)
    next.refs.keySet.intersect(base.refs.keySet).toSeq.sorted
      .filter(r => next.refs(r) != base.refs(r) ||
        next.refTypes.get(r) != base.refTypes.get(r) ||
        next.refRetention.get(r) != base.refRetention.get(r))
      .foreach(emitRef)
    (base.refs.keySet -- next.refs.keySet).toSeq.sorted
      .foreach(r => obj("remove-snapshot-ref").put("ref-name", r))
    // a main move expressed only through currentSnapshotId (local
    // commits may not materialize a 'main' refs entry)
    if (next.currentSnapshotId != base.currentSnapshotId &&
        next.refs.get("main") == base.refs.get("main")) {
      next.currentSnapshotId match {
        case Some(id) => setRef(obj("set-snapshot-ref"), "main", id)
        case None => obj("remove-snapshot-ref").put("ref-name", "main")
      }
    }
    val removedSnaps = base.snapshots
      .filterNot(s => next.snapshots.exists(_.snapshotId == s.snapshotId))
    if (removedSnaps.nonEmpty) {
      val ids = obj("remove-snapshots").putArray("snapshot-ids")
      removedSnaps.map(_.snapshotId).sorted.foreach(ids.add)
    }
    arr
  }

  private def setRef(n: ObjectNode, ref: String, id: Long,
      refType: String = "branch",
      retention: Option[IcebergMetadata.IceRefRetention] = None): Unit = {
    n.put("ref-name", ref); n.put("type", refType); n.put("snapshot-id", id)
    // SnapshotRetention is #[serde(flatten)]ed into the update
    // (commit.rs SetSnapshotRef); the server clears absent fields
    retention.foreach { ret =>
      ret.minSnapshotsToKeep.foreach(n.put("min-snapshots-to-keep", _))
      ret.maxSnapshotAgeMs.foreach(n.put("max-snapshot-age-ms", _))
      ret.maxRefAgeMs.foreach(n.put("max-ref-age-ms", _))
    }
    ()
  }

  private def specToNode(s: IcebergMetadata.IceSpec): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("spec-id", s.specId)
    val fs = n.putArray("fields")
    s.fields.foreach { f =>
      val fn = fs.addObject()
      fn.put("name", f.name); fn.put("transform", f.transform)
      fn.put("source-id", f.sourceId); fn.put("field-id", f.fieldId)
    }
    n
  }

  private def sortOrderToNode(o: IcebergMetadata.IceSortOrder): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("order-id", o.orderId)
    val fs = n.putArray("fields")
    o.fields.foreach { f =>
      val fn = fs.addObject()
      fn.put("source-id", f.sourceId); fn.put("transform", f.transform)
      fn.put("direction", f.direction); fn.put("null-order", f.nullOrder)
    }
    n
  }
}
