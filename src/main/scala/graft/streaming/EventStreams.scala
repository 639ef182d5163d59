package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming twins of the batch event operators (SURVEY.md
  * §2.E). Transformations take a DataFrame so the same code runs over
  * `spark.read` (batch backfill) and `spark.readStream` (live) —
  * the Kappa-style single-codepath the reference's incremental
  * materialized-view design aims at (datafusion_iceberg/src/
  * materialized_view.rs full refresh; this is the streaming path).
  */
object EventStreams {

  /** Watermarked tumbling-window aggregation: 1-hour windows, 2-hour
    * lateness bound. On a stream this emits finalized windows
    * (append mode); on a batch frame it degenerates to a groupBy. */
  def windowedAgg(events: DataFrame): DataFrame = {
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("total_value"))
  }

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class SessionState(start: Long, last: Long, n: Int, value: Double)

  case class SessionOut(user_id: Long, session_start: Timestamp,
      n_events: Int, session_value: Double, duration_s: Long)

  /** Snapshot-summary key recording the last streaming micro-batch
    * committed to a table (same device as Iceberg's own Spark sink:
    * the batch id rides in the snapshot summary, so replay detection
    * needs no side-channel state). */
  val BatchIdKey = "streaming-batch-id"

  /** Commit one micro-batch to a GraftTable, skipping batches already
    * committed (a restart replays the last uncommitted micro-batch —
    * without the check it would double-append). */
  def appendBatchToTable(table: graft.table.GraftTable,
      batch: DataFrame, batchId: Long): Boolean = {
    val last = table.meta.snapshots
      .flatMap(_.summary.get(BatchIdKey)).flatMap(_.toLongOption)
      .maxOption
    if (last.exists(_ >= batchId)) false
    else { table.append(batch, summary = Map(BatchIdKey -> batchId.toString)); true }
  }

  /** Commit one micro-batch to a REAL Iceberg table, idempotent on
    * batchId via the snapshot summary. */
  def appendBatchToIceberg(location: String,
      batch: DataFrame, batchId: Long): Boolean = {
    if (!graft.table.iceberg.IcebergTable.exists(location)) {
      // stamp the id on the create's snapshot too
      graft.table.iceberg.IcebergWrite.create(batch.sparkSession, location,
        batch)
      graft.table.iceberg.IcebergMetadata.commitRetry(location) { m =>
        m.copy(snapshots = m.snapshots.map(s =>
          if (m.currentSnapshotId.contains(s.snapshotId))
            s.copy(summary = s.summary + (BatchIdKey -> batchId.toString))
          else s))
      }
      true
    } else {
      val m = graft.table.iceberg.IcebergMetadata.load(location)
      val last = m.snapshots
        .flatMap(_.summary.get(BatchIdKey)).flatMap(_.toLongOption)
        .maxOption
      if (last.exists(_ >= batchId)) false
      else {
        graft.table.iceberg.IcebergWrite.append(batch.sparkSession, location,
          batch, summary = Map(BatchIdKey -> batchId.toString))
        true
      }
    }
  }

  /** Stream → GraftTable sink: each micro-batch appends as a snapshot.
    * Exactly-once per batch under checkpointing: the batch id is
    * stamped into the snapshot summary and a replayed batch id is
    * skipped, so restart replays cannot double-append. Returns the
    * query — caller manages lifecycle. */
  def writeToTable(stream: DataFrame, table: graft.table.GraftTable,
      trigger: org.apache.spark.sql.streaming.Trigger): org.apache.spark.sql.streaming.StreamingQuery = {
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatchToTable(table, batch, batchId)
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** Stream → REAL Iceberg table sink: each micro-batch appends as an
    * Iceberg snapshot through the binary-interop writer (avro
    * manifests + metadata.json) — any Iceberg engine can query the
    * stream's output while it runs. The table is created from the
    * first batch's schema; replayed batch ids are skipped (idempotent
    * restarts, like Iceberg's own Spark streaming sink). */
  def writeToIceberg(stream: DataFrame, location: String,
      trigger: org.apache.spark.sql.streaming.Trigger): org.apache.spark.sql.streaming.StreamingQuery = {
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatchToIceberg(location, batch, batchId)
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** Stateful sessionization with a 30-minute inactivity gap via
    * flatMapGroupsWithState: state is one open session per user,
    * closed sessions are emitted on gap or event-time timeout.
    *
    * Scale: state size is O(active users), not O(events); the shuffle
    * key is user_id, same as the batch twin.
    */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = 30L * 60 * 1000
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          // within a micro-batch events may arrive unsorted
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
          var st = state.getOption.orNull
          sorted.foreach { e =>
            val t = e.ts.getTime
            st match {
              case null =>
                st = SessionState(t, t, 1, e.value)
              case s if t - s.last > gapMs =>
                out += SessionOut(userId, new Timestamp(s.start), s.n,
                  math.rint(s.value * 100) / 100, (s.last - s.start) / 1000)
                st = SessionState(t, t, 1, e.value)
              case s =>
                st = SessionState(s.start, t, s.n + 1, s.value + e.value)
            }
          }
          if (st != null) state.update(st) else state.remove()
          out.iterator
      }
  }
}
