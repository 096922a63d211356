package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.codec.ConfluentAvro
import graft.pipeline.{Catalog, PipelineDef}
import graft.streaming.StreamingOps

/** The `node src/listen.js` analog (reference src/listen.js:36-87): load
  * one pipeline definition, wire Kafka source → decode → compiled chain →
  * routed Kafka sink, and run until terminated.
  *
  * Usage:
  *   PipelineRunner <brokers> <pipelineJsonPath> <checkpointDir> [schemaJson]
  *
  * The pipeline definition is the JSON shape Catalog.fromJson parses (a
  * config-service export of the reference's `pipelines` row; use
  * Catalog.fromJdbc instead when Postgres + a JDBC driver are present).
  * Requires the spark-sql-kafka connector on the classpath at deploy
  * time — the engine code is connector-agnostic.
  */
object PipelineRunner {

  def main(args: Array[String]): Unit = {
    val Array(brokers, specPath, checkpointDir) = args.take(3)
    val schemaJson = args.lift(3).getOrElse(ConfluentAvro.eventSchemaJson)

    val spark = SparkSession.builder()
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()

    val spec = Catalog.fromJson(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(specPath)),
        java.nio.charset.StandardCharsets.UTF_8))
    val query = start(spark, spec, brokers, checkpointDir, schemaJson)
    query.awaitTermination()
  }

  /** Build and start the streaming query for one pipeline definition. */
  def start(spark: SparkSession, spec: PipelineDef, brokers: String,
      checkpointDir: String, schemaJson: String,
      schemaId: Int = 1): org.apache.spark.sql.streaming.StreamingQuery = {
    val source = StreamingOps.kafkaSource(spark, brokers, spec.sourceTopic)
    // decode with the incoming schema... encode with the outgoing — kept
    // distinct per the catalog design even though the reference collapses
    // them (SURVEY §1.3 quirk)
    val decoded = source.select(
      ConfluentAvro.fromConfluentAvro(col("value"), schemaJson).as("m"))
      .select("m.key", "m.value", "m.num")
    val routed = StreamingOps.routeForKafka(spec.toPipeline, decoded,
      df => ConfluentAvro.toConfluentAvro(
        struct(df("key"), df("value"), df("num")), schemaJson, schemaId))
    StreamingOps.kafkaSink(routed, brokers, checkpointDir).start()
  }
}
