package graft.tables

import java.nio.file.Files

import org.apache.spark.sql.types._
import graft.SparkSpec

class TablesSpec extends SparkSpec {

  test("loadFormat reads csv and json with explicit schemas (no inference scan)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sources").toString
    val src = Seq(("k1", "v1", 1), ("k2", "v2", 2)).toDF("key", "value", "num")
    src.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    src.write.mode("overwrite").json(s"$dir/json")

    val schema = StructType(Seq(
      StructField("key", StringType), StructField("value", StringType),
      StructField("num", IntegerType)))

    val csv = Tables.loadFormat(spark, s"$dir/csv", "csv", Some(schema),
      Map("header" -> "true"))
    csv.orderBy("num").collect().map(_.toSeq) shouldBe
      Array(Seq("k1", "v1", 1), Seq("k2", "v2", 2))

    val json = Tables.loadFormat(spark, s"$dir/json", "json", Some(schema))
    json.orderBy("num").collect().map(_.toSeq) shouldBe
      Array(Seq("k1", "v1", 1), Seq("k2", "v2", 2))
  }

  test("events loader normalizes the nanosecond timestamp column") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    ev.schema("ts").dataType shouldBe TimestampType
    ev.count() shouldBe 1000
  }
}
