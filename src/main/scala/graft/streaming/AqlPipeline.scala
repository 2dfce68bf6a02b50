package graft.streaming

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.aql.Aql
import graft.operators.Filters

/** The reference's entire job in one call (SURVEY §0.1): run an **AQL
  * subscription** against the event stream and land each selected event
  * as a row in a SQL database, checkpointed so a restart resumes where
  * it left off.
  *
  * Composition of already-proven parts, no new machinery: the S1
  * micro-batch source, the derived tag-SET view ([[Filters.withTags]]),
  * the AQL front-end's FROM/FILTER lowering ([[Aql.predicate]] — a plain
  * Catalyst boolean, so it runs identically on the stream), and the
  * S7/S8 idempotent Derby MERGE sink. The landed row is the flattened
  * envelope (the events-to-db event→row mapping); at-least-once delivery
  * from the checkpointed source is upgraded to effectively-exactly-once
  * by the keyed MERGE.
  */
object AqlPipeline {

  /** Attaches `aql`'s FROM/FILTER selection of the staged stream to the
    * Derby sink. Start the returned writer, then `processAllAvailable()`.
    * Without SELECT the envelope lands in the standard `events_sink`
    * table; with SELECT the landed table (`table`) is derived from the
    * projection's own schema — payload fields become typed DB columns,
    * the reference's event→row mapping.
    */
  def attach(spark: SparkSession, stagingDir: String, aql: String,
             url: String, checkpointDir: String,
             table: String = "aql_sink"): DataStreamWriter[Row] = {
    val src = Filters.withTags(EventStream.read(spark, stagingDir))
    if (Aql.parse(aql).select.isEmpty) {
      val selected = src.filter(Aql.predicate(aql)).drop("tags")
      DerbySink.attach(selected, url, checkpointDir)
    } else {
      DerbySink.attachAs(Aql.sinkProjection(src, aql), url, table,
        "event_id", checkpointDir)
    }
  }
}
