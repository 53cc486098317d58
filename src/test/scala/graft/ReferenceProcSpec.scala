package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Envelope
import graft.ops.TextProc

/** Processor-level vectors ported from the reference's own test tables
  * (`lib/processor/text_test.go`) — every (operator, arg, value, input →
  * output) row runs through the YAML-dialect `TextProc` on a content
  * envelope, asserting byte-identical output. */
class ReferenceProcSpec extends AnyFunSuite {
  lazy val spark = Sessions.builder("4").getOrCreate()

  private def run(op: String, arg: String, value: String,
      input: String): String = {
    import spark.implicits._
    val base = scala.Seq((0L, input)).toDF("id", "s")
    val env = Envelope.wrap(base, scala.Seq(col("id")))
      .withColumn(Envelope.Content, col("doc.s").cast("binary"))
    TextProc(op, arg, value)(env)
      .select(col(Envelope.Content).cast("string")).head().getString(0)
  }

  /** (name, arg, value, input, expected) rows, one table per operator. */
  private def table(op: String,
      rows: scala.Seq[(String, String, String, String, String)]): Unit =
    rows.foreach { case (name, arg, value, input, expected) =>
      assert(run(op, arg, value, input) === expected, s"$op / $name")
    }

  test("text set (text_test.go TestTextSet)") {
    table("set", scala.Seq(
      ("set 1", "", "baz", "foo", "baz"),
      ("set 2", "", "baz", "", "baz"),
      ("set 3", "", "", "foo", "")))
  }

  test("text append/prepend (TestTextAppend, TestTextPrepend)") {
    table("append", scala.Seq(
      ("append 1", "", "baz", "foo bar ", "foo bar baz"),
      ("append 2", "", "", "foo bar ", "foo bar "),
      ("append 3", "", "baz", "", "baz")))
    table("prepend", scala.Seq(
      ("prepend 1", "", "baz ", "foo bar", "baz foo bar"),
      ("prepend 2", "", "", "foo bar", "foo bar"),
      ("prepend 3", "", "baz", "", "baz")))
  }

  test("text quote/unquote (TestTextQuote, TestTextUnquote)") {
    table("quote", scala.Seq(
      ("quote 1", "", "", "hello world", "\"hello world\""),
      ("quote 2", "", "", "\"hello\", said the world",
        "\"\\\"hello\\\", said the world\""),
      ("quote 3", "", "", "\"hello world\"", "\"\\\"hello world\\\"\"")))
    table("unquote", scala.Seq(
      ("unquote 1", "", "", "\"hello world\"", "hello world"),
      ("unquote 2", "", "", "\"\\\"hello\\\", said the world\"",
        "\"hello\", said the world"),
      ("unquote 3", "", "", "\"\\\"hello world\\\"\"", "\"hello world\"")))
  }

  test("text trim_space / trim (TestTextTrimSpace, TestTextTrim)") {
    table("trim_space", scala.Seq(
      ("trim space 1", "", "", "foo bar", "foo bar"),
      ("trim space 2", "", "", "  foo   bar   ", "foo   bar"),
      ("trim space 3", "", "", "\n  foo   bar  \n\t", "foo   bar")))
    table("trim", scala.Seq(
      ("trim 1", "0", "", "foo bar", "foo bar"),
      ("trim 2", "0", "", "0foo0bar0", "foo0bar"),
      ("trim 3", "012", "", "021foo012bar210", "foo012bar")))
  }

  test("text to_upper / to_lower (TestTextToUpper, TestTextToLower)") {
    table("to_upper", scala.Seq(
      ("to upper 1", "", "", "123 hello WORLD @#$", "123 HELLO WORLD @#$"),
      ("to upper 2", "", "", "123 HELLO WORLD @#$", "123 HELLO WORLD @#$"),
      ("to upper 3", "", "", "123 @#$", "123 @#$")))
    table("to_lower", scala.Seq(
      ("to lower 1", "", "", "123 hello WORLD @#$", "123 hello world @#$"),
      ("to lower 2", "", "", "123 hello world @#$", "123 hello world @#$"),
      ("to lower 3", "", "", "123 @#$", "123 @#$")))
  }

  test("text url query escaping (TestTextEscapeURLQuery + inverse)") {
    table("escape_url_query", scala.Seq(
      ("escape url query 1", "", "", "foo bar", "foo+bar"),
      ("escape url query 2", "", "", "http://foo.bar/wat?this=that",
        "http%3A%2F%2Ffoo.bar%2Fwat%3Fthis%3Dthat"),
      ("escape url query 3", "", "", "foobar", "foobar")))
    table("unescape_url_query", scala.Seq(
      ("unescape url query 1", "", "", "foo+bar", "foo bar"),
      ("unescape url query 2", "", "",
        "http%3A%2F%2Ffoo.bar%2Fwat%3Fthis%3Dthat",
        "http://foo.bar/wat?this=that"),
      ("unescape url query 3", "", "", "foobar", "foobar")))
  }

  test("text replace (TestTextReplace)") {
    table("replace", scala.Seq(
      ("replace 1", "foo", "bar", "foo bar", "bar bar"),
      ("replace 2", "foo", "bar", "baz foo bar foo", "baz bar bar bar"),
      ("replace 3", "foo", "bar", "baz baz baz baz", "baz baz baz baz")))
  }

  test("text replace_regexp incl. Go missing-group semantics (TestTextReplaceRegexp)") {
    table("replace_regexp", scala.Seq(
      ("replace regexp 1", "foo?", "bar", "foo bar", "bar bar"),
      ("replace regexp 2", "foo?", "bar", "fo bar", "bar bar"),
      ("replace regexp 3", "foo?", "bar", "fooo bar", "baro bar"),
      ("replace regexp 4", "foo?", "bar", "baz bar", "baz bar"),
      ("replace regexp submatch 1", "(foo?) (bar?) (baz?)",
        "hello $2 world", "foo bar baz", "hello bar world"),
      // $4 is out of range -> Go expands to EMPTY, never errors
      ("replace regexp submatch 2", "(foo?) (bar?) (baz?)",
        "hello $4 world", "foo bar baz", "hello  world")))
  }

  test("text regexp_expand (TestTextRegexpExpand)") {
    table("regexp_expand", scala.Seq(
      ("regexp expand 1", "(foo) bar", "$1", "foo bar", "foo"),
      ("regexp expand 2", "(?P<key>\\w+) \\w+", "$key baz", "foo bar",
        "foo baz"),
      ("regexp expand 3", "(?m)(?P<key>\\w+):\\s+(?P<value>\\w+)$",
        "$key=$value\n",
        "# comment line\nfoo1: bar1\nbar2: baz2\n\n# another comment line\nbaz3: qux3",
        "foo1=bar1\nbar2=baz2\nbaz3=qux3\n")))
  }

  test("text find_regexp / strip_html (TestTextFindRegexp, TestTextStripHTML)") {
    table("find_regexp", scala.Seq(
      ("find regexp 1", "foo?", "", "foo bar", "foo"),
      ("find regexp 2", "foo?", "", "fo bar", "fo"),
      ("find regexp 3", "foo?", "", "fooo bar", "foo"),
      ("find regexp 4", "foo?", "", "baz bar", "")))
    table("strip_html", scala.Seq(
      ("strip html 1", "", "", "foo <a>bar</a>", "foo bar"),
      ("strip html 2", "", "", "<div>foo <a>bar</a></div>", "foo bar"),
      ("strip html 3", "", "", "<div field=\"bar\">foo <a>bar</a></div>",
        "foo bar"),
      ("strip html 4", "", "", "<div field=\"bar\">foo<broken <a>bar</a>",
        "foobar")))
  }
}
