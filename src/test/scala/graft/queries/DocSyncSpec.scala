package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Doc-count drift gate: r10 shipped three different registry counts
  * (README "169", commit message "174", driver-observed 172). The
  * README's headline counts are now asserted against the registry so
  * `sbt test` fails if they drift again.
  */
class DocSyncSpec extends AnyFunSuite {

  private lazy val readme = new String(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
    java.nio.charset.StandardCharsets.UTF_8)

  test("README declared-query count matches Registry.all.size") {
    val m = "(\\d+) declared queries".r.findFirstMatchIn(readme)
    assert(m.isDefined, "README no longer states a declared-query count")
    assert(m.get.group(1).toInt == Registry.all.size,
      s"README says '${m.get.group(1)} declared queries' but the registry " +
        s"has ${Registry.all.size} — update README.md")
  }

  test("README oracle-matched count matches the registry's oracle split") {
    val withOracle = Registry.all.count(_.oracle.isDefined)
    val m = "(\\d+) oracle-matched queries".r.findFirstMatchIn(readme)
    assert(m.isDefined, "README no longer states an oracle-matched count")
    assert(m.get.group(1).toInt == withOracle,
      s"README says '${m.get.group(1)} oracle-matched' but " +
        s"$withOracle registry entries declare oracle SQL — update README.md")
  }

  test("registry names are unique and short ids collide-free") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    val short = names.map(_.takeWhile(_ != '_'))
    assert(short.distinct.size == short.size,
      s"short-id collision: ${short.diff(short.distinct).distinct}")
  }
}
