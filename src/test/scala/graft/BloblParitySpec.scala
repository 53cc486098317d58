package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.blobl.Mapping

/** LIVE Bloblang-registry parity against the reference source tree:
  * function and method names re-derive from the
  * `RegisterFunction`/`registerMethod` spec declarations in
  * `internal/bloblang/query/` on every run, and each must compile here
  * without the unknown-function/unknown-method error (an arity or
  * argument-type error still counts as mapped — the dispatch branch was
  * reached). The same live-parity posture as RegistryParitySpec, which
  * caught 13 constructor kinds the by-hand count had missed. Skips
  * when the reference tree is not mounted.
  */
class BloblParitySpec extends AnyFunSuite {
  private val qdir =
    new java.io.File("/root/reference/internal/bloblang/query")

  private def goFiles: Seq[java.io.File] =
    Option(qdir.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq
      .filter(f => f.getName.endsWith(".go") && !f.getName.endsWith("_test.go"))

  private def read(f: java.io.File) =
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")

  private def functions: Set[String] = {
    val cat = """FunctionCategory\w+,\s*"([a-z0-9_]+)"""".r
    val dep = """NewDeprecatedFunctionSpec\(\s*"([a-z0-9_]+)"""".r
    goFiles.flatMap { f =>
      val s = read(f)
      cat.findAllMatchIn(s).map(_.group(1)) ++
        dep.findAllMatchIn(s).map(_.group(1))
    }.toSet
  }

  private def methods: Set[String] = {
    val re = """New(?:Hidden|Deprecated)?MethodSpec\(\s*"([a-z0-9_]+)"""".r
    goFiles.filter(_.getName.startsWith("methods"))
      .flatMap(f => re.findAllMatchIn(read(f)).map(_.group(1))).toSet
  }

  private def compileErr(mapping: String): Option[String] =
    try { Mapping.compile(mapping); None }
    catch {
      case e: Throwable =>
        Some(Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(x => Option(x.getMessage).getOrElse("")).mkString(" | "))
    }

  test("every reference bloblang FUNCTION name is known to the compiler") {
    assume(qdir.isDirectory, "reference tree not mounted")
    val fs = functions
    assert(fs.size >= 20, s"parser regression: only ${fs.size} functions found")
    val unknown = fs.filter { f =>
      compileErr(s"root.x = $f()").exists(_.contains("unknown function"))
    }
    assert(unknown.isEmpty, s"reference functions the compiler rejects: $unknown")
  }

  test("every reference bloblang METHOD name is known to the compiler") {
    assume(qdir.isDirectory, "reference tree not mounted")
    val ms = methods
    assert(ms.size >= 90, s"parser regression: only ${ms.size} methods found")
    val unknown = ms.filter { m =>
      // try both arities: most methods are 0-arg, the rest reject the
      // missing argument AFTER their dispatch branch is reached
      compileErr(s"""root.x = this.a.$m()""")
        .exists(_.contains("unknown method")) &&
        compileErr(s"""root.x = this.a.$m("v")""")
          .exists(_.contains("unknown method"))
    }
    assert(unknown.isEmpty, s"reference methods the compiler rejects: $unknown")
  }
}
