package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.util.Try

/** Every fully-qualified `[[graft.…]]` scaladoc link in the main sources
  * must resolve to a real class/object/member — shipped docs promising
  * nonexistent API are a trust bug (round 9 shipped a dangling link to a
  * then-unwritten `continuousIvfAppend`). Relative links can't be checked
  * without a full scaladoc run; fully-qualified ones are the cross-file
  * promises, and those are exactly the ones that go stale.
  */
class ScaladocLinksSpec extends AnyFunSuite with Matchers {

  private def classFor(name: String): Option[Class[_]] =
    Try(Class.forName(name)).toOption
      .orElse(Try(Class.forName(name + "$")).toOption)

  /** `graft.a.b.C.member` resolves if some split yields a loadable class
    * (packages dotted, nesting `$`-joined, companion `$` suffix allowed)
    * whose remaining single segment — if any — names a method, field, or
    * member class of it.
    */
  private def resolves(link: String): Boolean = {
    val segs = link.split("\\.")
    (segs.length to 1 by -1).exists { i =>
      val prefix = segs.take(i)
      val candidates = (i to 1 by -1).map { j =>
        (prefix.take(j).mkString(".") +: prefix.drop(j)).mkString("$")
      }
      candidates.flatMap(classFor).exists { cls =>
        val rest = segs.drop(i)
        rest.isEmpty || (rest.length == 1 && {
          val n = rest.head
          cls.getMethods.exists(_.getName == n) ||
            cls.getDeclaredMethods.exists(_.getName == n) ||
            cls.getDeclaredFields.exists(_.getName == n) ||
            classFor(cls.getName.stripSuffix("$") + "$" + n).isDefined
        })
      }
    }
  }

  test("all fully-qualified scaladoc links in main sources resolve") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    val linkRe = """\[\[(graft\.[A-Za-z0-9_.]+)\]\]""".r
    val links = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap { p =>
        val txt = java.nio.file.Files.readString(p)
        linkRe.findAllMatchIn(txt).map(m => (p.toString, m.group(1)))
      }.toSeq
    links should not be empty // the scan itself must be finding sources
    val dangling = links.filterNot { case (_, l) => resolves(l) }
    withClue(s"dangling scaladoc links: $dangling") {
      dangling shouldBe empty
    }
  }
}
