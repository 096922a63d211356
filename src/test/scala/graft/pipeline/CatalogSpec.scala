package graft.pipeline

import graft.SparkSpec

class CatalogSpec extends SparkSpec {

  test("parseSteps handles names, numeric ids, and null DLQ slots") {
    val (p, d) = Catalog.parseSteps(
      """{"processors": ["capitalize", 2, "isEven"], "dlq": [null, 17, "dlq_x"]}""")
    p shouldBe Seq("capitalize", "2", "isEven")
    d shouldBe Seq(None, Some("17"), Some("dlq_x"))
  }

  test("parseSteps defaults absent dlq to no DLQs") {
    val (p, d) = Catalog.parseSteps("""{"processors": ["add10"]}""")
    p shouldBe Seq("add10")
    d shouldBe Seq(None)
  }

  test("parseSteps rejects mismatched parallel arrays") {
    an[IllegalArgumentException] should be thrownBy
      Catalog.parseSteps("""{"processors": ["a", "b"], "dlq": [null]}""")
  }

  test("fromJson builds a runnable pipeline spec") {
    val spec = Catalog.fromJson(
      """{"id": 3, "name": "pipeline_a",
          "source_topic": "source_a", "target_topic": "target_a",
          "incoming_schema": "schema_a", "outgoing_schema": "schema_a",
          "steps": {"processors": ["capitalize", "isEven"], "dlq": [null, "dlq_17"]},
          "is_active": true}""")
    spec.name shouldBe "pipeline_a"
    spec.processors shouldBe Seq("capitalize", "isEven")
    spec.dlq shouldBe Seq(None, Some("dlq_17"))
    val pipe = spec.toPipeline
    pipe.target shouldBe "target_a"
    pipe.steps.map(_.processor.name) shouldBe Seq("capitalize", "isEven")
  }
}
