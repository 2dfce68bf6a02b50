package graft.streaming

import java.sql.{Connection, DriverManager, SQLException, Types}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** S7/S8 — the "to-db" half (SURVEY.md §2.1, §2.11): a `foreachBatch`
  * JDBC sink that MERGEs each micro-batch into an embedded Derby table
  * keyed on `event_id`.
  *
  * Delivery contract = the reference's: the replayable file source plus
  * the streaming checkpoint give at-least-once; the idempotent per-key
  * MERGE upgrades it to effectively-exactly-once — a replayed batch
  * (e.g. after the S8 kill/restart) overwrites rows with identical
  * values instead of duplicating them.
  *
  * Derby (10.16, the one JDBC engine shipped with the Spark jars) is
  * single-JVM embedded — fine under local[*]; on a real cluster the same
  * `foreachBatch` body points at a networked RDBMS and partitions write
  * in parallel, which is why the write path is per-partition batched
  * JDBC, not a driver-side collect.
  */
object DerbySink {

  val TABLE = "events_sink"

  /** Columns landed in the DB (envelope flattened to the µs convention —
    * the reference's event→row ETL mapping).
    */
  private val COLS = Seq("event_id", "ts_us", "user_id", "event_type", "value")

  def connect(url: String): Connection = DriverManager.getConnection(url)

  /** One writer at a time per EMBEDDED database. Concurrent MERGE
    * connections into one embedded Derby can hang, not just error: the
    * index-statistics daemon's mid-recompile failure (the XJ001/NPE
    * family the chunked retry below absorbs) can unwind a writer while
    * it holds a page LATCH, and a leaked latch never times out — every
    * later writer parks in `BasePage.setExclusive` forever, which no
    * statement-level retry can recover (observed under a 4-task
    * foreachPartition MERGE of 30k rows). Embedded Derby is single-JVM
    * by definition, so a JVM-wide lock per database URL is sufficient
    * and costs a cluster nothing: a real deployment points at a
    * server-mode RDBMS (`jdbc:derby://host/…` or any other driver) whose
    * own lock manager handles concurrent writers — those URLs skip the
    * lock entirely and partitions write in parallel as designed.
    */
  private val embeddedWriteLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def withWriteLock[T](url: String)(body: => T): T =
    if (url.startsWith("jdbc:derby://")) body
    else embeddedWriteLocks.computeIfAbsent(url, _ => new Object).synchronized(body)

  /** CREATE TABLE if absent (Derby has no IF NOT EXISTS; X0Y32 = exists). */
  def ensureTable(url: String): Unit = {
    val c = connect(url)
    try {
      val st = c.createStatement()
      try st.executeUpdate(
        s"""CREATE TABLE $TABLE (
           |  event_id BIGINT PRIMARY KEY,
           |  ts_us BIGINT,
           |  user_id BIGINT,
           |  event_type VARCHAR(64),
           |  value DOUBLE)""".stripMargin)
      catch { case e: SQLException if e.getSQLState == "X0Y32" => () }
      finally st.close()
    } finally c.close()
  }

  /** Upserts one micro-batch of the fixed envelope schema — the special
    * case of [[upsertBatchAs]] (which derives the identical keyed MERGE
    * from this projection's schema, and carries the chunked retry).
    */
  def upsertBatch(batch: DataFrame, url: String): Unit =
    upsertBatchAs(batch
      .select(col("event_id"), expr("ts div 1000").as("ts_us"),
        col("user_id"), col("event_type"), col("value")),
      url, TABLE, "event_id")

  /** Wires a staged event stream into the sink with a checkpoint — the
    * whole events-to-db pipeline (S1 source → S7 sink, resumable per S8).
    */
  def attach(events: DataFrame, url: String, checkpointDir: String): DataStreamWriter[Row] = {
    ensureTable(url)
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) => upsertBatch(batch, url) }
  }

  // ------------- schema-derived sink (arbitrary SELECT projections) ------

  /** The reference lands EXTRACTED payload fields as DB columns, not just
    * the envelope — so the sink must accept an arbitrary projection. The
    * generic path derives the DDL and the keyed MERGE from the
    * DataFrame's own schema.
    */
  private def sqlType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case StringType => "VARCHAR(1024)"
    case TimestampType => "TIMESTAMP"
    case other =>
      throw new IllegalArgumentException(s"unsupported sink column type $other")
  }

  private def jdbcType(dt: DataType): Int = dt match {
    case LongType => Types.BIGINT
    case IntegerType => Types.INTEGER
    case DoubleType => Types.DOUBLE
    case FloatType => Types.REAL
    case BooleanType => Types.BOOLEAN
    case StringType => Types.VARCHAR
    case TimestampType => Types.TIMESTAMP
    case other =>
      throw new IllegalArgumentException(s"unsupported sink column type $other")
  }

  /** CREATE TABLE matching `schema`, PRIMARY KEY on `key` (X0Y32 = exists). */
  def ensureTableFor(url: String, table: String, schema: StructType, key: String): Unit = {
    require(schema.fieldNames.contains(key), s"sink schema must carry key '$key'")
    val cols = schema.fields.map { f =>
      val pk = if (f.name == key) " PRIMARY KEY" else ""
      s"${f.name} ${sqlType(f.dataType)}$pk"
    }.mkString(", ")
    val c = connect(url)
    try {
      val st = c.createStatement()
      try st.executeUpdate(s"CREATE TABLE $table ($cols)")
      catch { case e: SQLException if e.getSQLState == "X0Y32" => () }
      finally st.close()
    } finally c.close()
  }

  /** Schema-derived idempotent MERGE of one micro-batch into `table`,
    * keyed on `key`. Same shape as [[upsertBatch]] — per-partition
    * batched JDBC, in-batch dedup by key first.
    */
  def upsertBatchAs(batch: DataFrame, url: String, table: String, key: String): Unit = {
    val schema = batch.schema
    val names = schema.fieldNames.toSeq
    val kIdx = names.indexOf(key)
    require(kIdx >= 0, s"sink batch must carry key '$key'")
    val others = names.filterNot(_ == key)
    val updates =
      if (others.isEmpty) "" // key-only table: nothing to update on match
      else "WHEN MATCHED THEN UPDATE SET " + others.map(n => s"$n = ?").mkString(", ") + "\n"
    val mergeSql =
      s"""MERGE INTO $table t USING SYSIBM.SYSDUMMY1
         |ON t.$key = ?
         |$updates
         |WHEN NOT MATCHED THEN INSERT (${names.mkString(", ")})
         |  VALUES (${names.map(_ => "?").mkString(", ")})""".stripMargin
    val types = schema.fields.map(f => jdbcType(f.dataType))
    val otherIdx = others.map(names.indexOf).toArray // once, not per row
    val rows = batch.dropDuplicates(key)
    rows.foreachPartition { it: Iterator[Row] =>
      if (it.hasNext) withWriteLock(url) {
        var c = connect(url)
        try {
          // inside the try: a session-severity error between connect and
          // setAutoCommit would otherwise leak the connection
          c.setAutoCommit(false)
          // Rows are buffered in 500-row chunks and each chunk's MERGE is
          // committed and RETRIED on transient failure: embedded Derby
          // invalidates prepared MERGE plans when its background index-
          // statistics daemon fires as the table grows, and a batch
          // executing concurrently on another connection can then hit an
          // internal XJ001/NPE mid-recompile — a SESSION-severity error
          // that also kills the connection, hence the reconnect below.
          // The keyed MERGE is idempotent, so replaying the chunk on a
          // fresh statement is always safe (the same argument that makes
          // whole-task and whole-batch replays safe).
          val chunk = new scala.collection.mutable.ArrayBuffer[Row](500)
          def flush(): Unit = if (chunk.nonEmpty) {
            var attempt = 0
            var done = false
            while (!done) {
              try {
                val ps = c.prepareStatement(mergeSql)
                try {
                  def set(pos: Int, r: Row, i: Int): Unit =
                    if (r.isNullAt(i)) ps.setNull(pos, types(i))
                    else ps.setObject(pos, r.get(i), types(i))
                  chunk.foreach { r =>
                    var pos = 1
                    set(pos, r, kIdx); pos += 1
                    otherIdx.foreach { i => set(pos, r, i); pos += 1 }
                    names.indices.foreach { i => set(pos, r, i); pos += 1 }
                    ps.addBatch()
                  }
                  ps.executeBatch()
                  c.commit()
                  done = true
                } finally {
                  try ps.close() catch { case _: SQLException => () }
                }
              } catch {
                case _: SQLException if attempt < 3 =>
                  attempt += 1
                  try { if (!c.isClosed) c.rollback() }
                  catch { case _: SQLException => () }
                  if (c.isClosed) { c = connect(url); c.setAutoCommit(false) }
              }
            }
            chunk.clear()
          }
          it.foreach { r => chunk += r; if (chunk.size >= 500) flush() }
          flush()
        } finally {
          try c.close() catch { case _: SQLException => () }
        }
      }
    }
  }

  /** Attaches an arbitrary projected stream to a schema-derived table. */
  def attachAs(out: DataFrame, url: String, table: String, key: String,
               checkpointDir: String): DataStreamWriter[Row] = {
    ensureTableFor(url, table, out.schema, key)
    out.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) => upsertBatchAs(batch, url, table, key) }
  }
}
