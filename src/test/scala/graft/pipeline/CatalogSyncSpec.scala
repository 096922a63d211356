package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Write-side catalog sync semantics (reference pull_processors.js:14-52,
  * getTopicsAndSchemas.js:31-79): upsert-on-drift, delete-obsolete,
  * insert-if-absent, idempotence.
  */
class CatalogSyncSpec extends AnyFunSuite with Matchers {
  import CatalogSync._

  test("fresh catalog gets every registered processor") {
    val store = new InMemoryStore()
    val plan = syncProcessors(store)
    plan.upserts.map(_.name).toSet shouldBe Processors.all.keySet
    plan.deletes shouldBe empty
    store.processors()("isEven") shouldBe true    // filter
    store.processors()("add10") shouldBe false    // transformation
  }

  test("sync is idempotent — second run is a no-op") {
    val store = new InMemoryStore()
    syncProcessors(store)
    val again = syncProcessors(store)
    again.upserts shouldBe empty
    again.deletes shouldBe empty
  }

  test("drifted is_filter is corrected, obsolete rows deleted") {
    val store = new InMemoryStore(initialProcessors = Map(
      "add10" -> true,          // drifted: add10 is a transformation
      "legacy_proc" -> false))  // not in the registry anymore
    val plan = syncProcessors(store)
    plan.upserts.map(_.name) should contain("add10")
    plan.deletes shouldBe Seq("legacy_proc")
    store.processors()("add10") shouldBe false
    store.processors() should not contain key("legacy_proc")
  }

  test("topics and schemas are insert-if-absent") {
    val store = new InMemoryStore(initialTopics = Set("target"),
      initialSchemas = Set("events-value"))
    val (newT, newS) = syncTopicsAndSchemas(store,
      topics = Seq("target", "dlq_parse", "dlq_parse"),
      subjects = Seq("events-value", "out-value"))
    newT shouldBe Seq("dlq_parse")
    newS shouldBe Seq("out-value")
    store.topics() shouldBe Set("target", "dlq_parse")
    store.schemas() shouldBe Set("events-value", "out-value")
  }
}
