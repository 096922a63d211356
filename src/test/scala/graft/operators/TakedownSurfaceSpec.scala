package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The takedown-surface map as a MACHINE-CHECKED invariant: every
  * store-writing face in the persisted-store sources must have a
  * [[Takedown.kinds]] registry row naming its delete face, or a
  * documented rebuild-only contract in [[Takedown.rebuildOnly]] —
  * adding a new persisted store without a takedown story fails THIS
  * test, not a review. (No SparkSession needed: the check is over the
  * sources and the registry object.)
  */
class TakedownSurfaceSpec extends AnyFunSuite with Matchers {

  // the directories holding persisted-store operators; pipeline/ and
  // functions/ hold stateless transforms and expressions (their names
  // like `appendString` are message transforms, not store writers)
  private val storeSourceDirs =
    Seq("operators", "streaming", "tables").map(d =>
      new java.io.File(s"src/main/scala/graft/$d"))

  // top-level member defs only (two-space indent): nested `writeBatch`
  // helpers inside foreachBatch lambdas are implementation details of
  // already-registered stream stores
  private val defPat = """^  (?:private\[graft\] )?def (\w+)""".r

  private def writeFacesInSource: Set[String] = {
    val names = for {
      dir <- storeSourceDirs
      f <- Option(dir.listFiles).map(_.toSeq).getOrElse(Seq.empty)
      if f.getName.endsWith(".scala")
      src = {
        val s = scala.io.Source.fromFile(f, "UTF-8")
        try s.getLines().toList finally s.close()
      }
      line <- src
      m <- defPat.findFirstMatchIn(line)
      n = m.group(1)
      if n.contains("Write") || n.contains("Append") || n.startsWith("write")
    } yield n
    names.toSet
  }

  test("every store-writing face has a takedown registry row") {
    val inSource = writeFacesInSource
    inSource should not be empty // the grep itself must be finding faces
    val covered = Takedown.kinds.values.flatMap(_.writeFaces).toSet ++
      Takedown.rebuildOnly.keySet
    val missing = inSource -- covered
    assert(missing.isEmpty,
      s"store-writing faces with NO takedown registry row: " +
      s"${missing.toSeq.sorted.mkString(", ")} — add the face to a " +
      "Takedown.kinds writeFaces list (naming its delete face) or to " +
      "Takedown.rebuildOnly (documenting the regenerate-from-survivors " +
      "contract). A persisted store without a takedown story is a " +
      "silently incomplete forget().")
  }

  test("the registry does not go stale against the sources") {
    val inSource = writeFacesInSource
    val registered = Takedown.kinds.values.flatMap(_.writeFaces).toSet ++
      Takedown.rebuildOnly.keySet
    val stale = registered -- inSource
    assert(stale.isEmpty,
      s"registry rows naming write faces that no longer exist: " +
      s"${stale.toSeq.sorted.mkString(", ")} — remove or rename the row")
  }

  test("every kind names a delete face and a victim shape") {
    Takedown.kinds.values.foreach { k =>
      k.deleteFace should not be empty
      Set("ids", "id_text") should contain(k.victimShape)
    }
    // the stream-maintained kinds are the only ones allowed an empty
    // writeFaces list (their writers are the continuous* stream loops)
    val emptyWrite = Takedown.kinds.values.filter(_.writeFaces.isEmpty)
      .map(_.name).toSet
    emptyWrite shouldBe Set("cluster_state", "cdc_state")
  }
}
