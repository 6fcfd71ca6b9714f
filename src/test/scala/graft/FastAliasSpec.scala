package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the `fast` command alias in build.sbt (ADVICE r10): the
  * excluded-suite list is inlined in the alias string, so a renamed suite
  * would silently fall out of the exclusion (and run inside `fast`) with
  * nothing failing. This spec — itself cheap, so it runs inside `fast` —
  * re-parses the alias and asserts every excluded name still resolves to a
  * real test class. It cannot catch the other direction (a NEW heavy suite
  * not yet added to the list) — that stays a judgment call at authoring
  * time — but it pins the list against silent rot.
  */
class FastAliasSpec extends AnyFunSuite {

  test("every suite excluded from `fast` still exists") {
    val buildSbt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("build.sbt")), "UTF-8")
    val names = "\\\\\"(graft\\.[A-Za-z0-9]+Spec)\\\\\"".r
      .findAllMatchIn(buildSbt).map(_.group(1)).toSeq
    assert(names.nonEmpty, "fast alias exclusion list not found in build.sbt")
    val missing = names.filterNot { n =>
      try { Class.forName(n); true }
      catch { case _: ClassNotFoundException => false }
    }
    assert(missing.isEmpty,
      s"fast alias excludes suites that no longer exist: ${missing.mkString(", ")}")
  }
}
