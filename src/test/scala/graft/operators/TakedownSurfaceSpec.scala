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
  *
  * REQUIRED NAMING CONVENTION (the guard's contract, not a style nit):
  * the grep below recognizes a store-writing face by name — a
  * top-level, two-space-indented `def` containing `Write`/`Append` or
  * starting with `write`/`save`/`persist`. A face that persists state
  * under ANY OTHER name (or nested inside a lambda) silently evades
  * this spec — so persisted-store writers MUST follow the convention.
  * The one legitimate exception is a nested `writeBatch`-style helper
  * inside a foreachBatch lambda of an already-registered stream store.
  * Model artifacts the USER persists (train faces returning a frame
  * whose scaladoc invites `model.write.parquet`) are held separately
  * against [[Takedown.userPersisted]] below.
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

  private def sourceFiles: Seq[java.io.File] = for {
    dir <- storeSourceDirs
    f <- Option(dir.listFiles).map(_.toSeq).getOrElse(Seq.empty)
    if f.getName.endsWith(".scala")
  } yield f

  private def lines(f: java.io.File): List[String] = {
    val s = scala.io.Source.fromFile(f, "UTF-8")
    try s.getLines().toList finally s.close()
  }

  private def writeFacesInSource: Set[String] = {
    val names = for {
      f <- sourceFiles
      line <- lines(f)
      m <- defPat.findFirstMatchIn(line)
      n = m.group(1)
      if n.contains("Write") || n.contains("Append") ||
        n.startsWith("write") || n.startsWith("save") ||
        n.startsWith("persist")
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

  test("user-persisted model faces carry the retrain-over-survivors " +
      "contract in their scaladoc") {
    // every face whose scaladoc invites the user to persist the model
    // frame must be registered in userPersisted — a persisted model
    // trained on victims is influence the orchestrator cannot see, so
    // the contract (retrain over survivors, replace) must be IN the
    // inviting scaladoc, not tribal knowledge
    Takedown.userPersisted should not be empty
    val allSrc = sourceFiles.map(f => f -> lines(f))
    Takedown.userPersisted.keys.foreach { face =>
      val hits = for {
        (f, src) <- allSrc
        (line, i) <- src.zipWithIndex
        if defPat.findFirstMatchIn(line).exists(_.group(1) == face)
      } yield (f, src, i)
      withClue(s"userPersisted names '$face', which no longer exists " +
          "as a top-level def in the store sources — remove or rename: ") {
        hits should not be empty
      }
      // the ~45 scaladoc lines above SOME def site must point at the
      // contract (EVERY site would over-constrain future overloads; an
      // arbitrary hits.head could pick a same-named def in the wrong
      // file and check the wrong window)
      val documented = hits.exists { case (_, src, i) =>
        src.slice(math.max(0, i - 45), i).mkString("\n")
          .contains("userPersisted")
      }
      withClue(s"'$face' (defined in ${hits.map(_._1.getName).distinct
          .mkString(", ")}) invites persisting its model but no " +
          "definition site's scaladoc names Takedown.userPersisted — a " +
          "user reading the train face must see the takedown story: ") {
        assert(documented)
      }
    }
    // anti-evasion twin: every face in the sources that INVITES
    // model.write.parquet persistence must have a userPersisted row.
    // Only DOC lines count as invites (a mention inside a def body
    // would mis-charge the NEXT unrelated def), and an invite with no
    // following def is a loud failure, not a silent skip — a trailing
    // train face evading attribution is exactly what this guards.
    val docLine = """^\s*(\*|//)""".r
    val invites = for {
      (f, src) <- allSrc
      // the registry's own scaladoc QUOTES the invite phrase — only
      // operator sources can invite persistence of their model frames
      if f.getName != "Takedown.scala"
      (line, i) <- src.zipWithIndex
      if line.contains("model.write.parquet") &&
        docLine.findFirstIn(line).isDefined
    } yield (f, src, i)
    val (attributed, orphaned) = invites.partition { case (_, src, i) =>
      src.drop(i).exists(l => defPat.findFirstMatchIn(l).isDefined)
    }
    assert(orphaned.isEmpty,
      s"model.write.parquet invites with no following def to attribute " +
      s"to: ${orphaned.map { case (f, _, i) => s"${f.getName}:${i + 1}" }
        .mkString(", ")} — move the invite into the face's scaladoc")
    val inviting = attributed.flatMap { case (_, src, i) =>
      src.drop(i).collectFirst {
        case l if defPat.findFirstMatchIn(l).isDefined =>
          defPat.findFirstMatchIn(l).get.group(1)
      }
    }
    val uncovered = inviting.toSet -- Takedown.userPersisted.keySet
    assert(uncovered.isEmpty,
      s"faces inviting model.write.parquet with NO userPersisted " +
      s"contract row: ${uncovered.toSeq.sorted.mkString(", ")}")
  }
}
