package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Control-plane catalog — the Spark analog of the reference's Postgres
  * tables `pipelines/topics/schemas/processors` and its per-pod loader
  * (reference src/listen.js:46-87, FIXTURES.md §2).
  *
  * A pipeline definition resolves to a [[Pipeline]] on the DRIVER at
  * start time, exactly as the reference resolves ids → names once at
  * startup (listen.js:61-82); nothing catalog-related happens per row.
  */
final case class PipelineDef(
    id: Int,
    name: String,
    sourceTopic: String,
    targetTopic: String,
    incomingSchema: String,
    outgoingSchema: String,
    processors: Seq[String],
    dlq: Seq[Option[String]],
    isActive: Boolean = true) {
  def toPipeline: Pipeline = Pipeline.fromNames(processors, dlq, targetTopic)
}

object Catalog {

  /** Parse the reference's `steps` JSONB shape
    * `{"processors": [...], "dlq": [idOrNull, ...]}`
    * (scripts/pipelines/insertTestPipelines.js:23,32,41). Entries may be
    * names or numeric ids (stringified); `dlq` may be absent → no DLQs.
    */
  def parseSteps(json: String): (Seq[String], Seq[Option[String]]) = {
    def asName(v: JValue): String = v match {
      case JString(s) => s
      case JInt(i) => i.toString
      case other => throw new IllegalArgumentException(s"bad step entry: $other")
    }
    val j = JsonMethods.parse(json)
    val procs = j \ "processors" match {
      case JArray(xs) => xs.map(asName)
      case _ => throw new IllegalArgumentException("steps.processors missing")
    }
    val dlq = j \ "dlq" match {
      case JArray(xs) => xs.map {
        case JNull => None
        case v => Some(asName(v))
      }
      case _ => Seq.fill(procs.length)(None)
    }
    require(dlq.length == procs.length,
      "steps.processors and steps.dlq must be parallel arrays")
    (procs, dlq)
  }

  /** Full pipeline row from JSON (the shape a config service or the
    * reference's `SELECT * FROM pipelines WHERE id=$1` returns).
    */
  def fromJson(json: String): PipelineDef = {
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(json)
    val (procs, dlq) = parseSteps(JsonMethods.compact(j \ "steps"))
    PipelineDef(
      id = (j \ "id").extract[Int],
      name = (j \ "name").extract[String],
      sourceTopic = (j \ "source_topic").extract[String],
      targetTopic = (j \ "target_topic").extract[String],
      incomingSchema = (j \ "incoming_schema").extractOrElse[String](""),
      outgoingSchema = (j \ "outgoing_schema").extractOrElse[String](""),
      processors = procs,
      dlq = dlq,
      isActive = (j \ "is_active").extractOrElse[Boolean](true))
  }

  /** JDBC loader — the literal analog of listen.js:46-56 against the
    * reference's Postgres schema (FIXTURES.md §2). Driver-side, one row;
    * requires a JDBC driver jar on the classpath at deploy time.
    */
  def fromJdbc(spark: SparkSession, url: String, pipelineId: Int,
      props: java.util.Properties = new java.util.Properties()): PipelineDef = {
    // normalize identifier case: Postgres folds unquoted names to lower,
    // Derby/Oracle to UPPER — Row.getAs is case-sensitive, so read
    // through a lowercased projection and stay dialect-agnostic
    def read(table: String) = {
      val df = spark.read.jdbc(url, table, props)
      df.toDF(df.columns.map(_.toLowerCase): _*)
    }
    def lookupOpt(table: String, idCol: String, nameCol: String, id: Int): Option[String] =
      read(table).where(s"$idCol = $id").select(nameCol)
        .collect().headOption.map(_.getString(0))
    def lookup(table: String, idCol: String, nameCol: String, id: Int): String =
      lookupOpt(table, idCol, nameCol, id).getOrElse(throw new NoSuchElementException(
        s"catalog: no row in '$table' with $idCol = $id (dangling reference " +
          s"from pipeline $pipelineId)"))
    val row = read("pipelines")
      .where(s"id = $pipelineId AND is_active = true")
      .collect().headOption.getOrElse(throw new NoSuchElementException(
        s"catalog: no active pipeline with id = $pipelineId"))
    val (procs, dlqIds) = parseSteps(row.getAs[String]("steps"))
    // the reference's seed rows reference processors BY ID in steps
    // (insertTestPipelines.js); names pass through, numeric ids resolve
    // against the processors table. An all-digit token whose id has no
    // row is treated as a NAME only when a processor with that literal
    // name exists (so a processor legitimately named "42" stays
    // referenceable) — otherwise it is a dangling id and fails fast
    // with the descriptive error rather than surfacing later.
    val procNames = procs.map { p =>
      if (p.nonEmpty && p.forall(_.isDigit))
        lookupOpt("processors", "id", "processor_name", p.toInt).getOrElse {
          val existsAsName = !read("processors")
            .where(s"processor_name = '$p'").isEmpty
          if (existsAsName) p
          else throw new NoSuchElementException(
            s"catalog: no row in 'processors' with id = $p (dangling " +
              s"reference from pipeline $pipelineId)")
        }
      else p
    }
    PipelineDef(
      id = row.getAs[Int]("id"),
      name = row.getAs[String]("name"),
      sourceTopic = lookup("topics", "id", "topic_name", row.getAs[Int]("source_topic_id")),
      targetTopic = lookup("topics", "id", "topic_name", row.getAs[Int]("target_topic_id")),
      incomingSchema = lookup("schemas", "id", "schema_name", row.getAs[Int]("incoming_schema_id")),
      outgoingSchema = lookup("schemas", "id", "schema_name", row.getAs[Int]("outgoing_schema_id")),
      processors = procNames,
      dlq = dlqIds.map(_.map(id => lookup("topics", "id", "topic_name", id.toInt))),
      isActive = true)
  }
}
