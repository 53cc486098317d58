package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.blobl.Mapping

/** Golden tests ported VERBATIM from the reference's executable doc
  * examples (`NewExampleSpec` triples in
  * `internal/bloblang/query/methods*.go`) — the same corpus the reference
  * runs as its own tests, so passing here means matching the reference's
  * results on its own test inputs. Each case cites the source method. */
class ReferenceExamplesSpec extends AnyFunSuite {
  lazy val spark = Sessions.builder("4").getOrCreate()

  def check(mapping: String, cases: (String, String)*): Unit = {
    import spark.implicits._
    cases.foreach { case (in, want) =>
      val df = spark.read.json(spark.createDataset(scala.Seq(in)))
      val out = Mapping.compile(mapping).applyPlain(df)
      // RFC3339 seconds precision like Go's time marshaling (the
      // reference drops zero fractions; fractional cases format
      // explicitly via format_timestamp*)
      val got = out.select(to_json(struct(out.columns.map(col).toIndexedSeq: _*),
          java.util.Map.of("timestampFormat", "yyyy-MM-dd'T'HH:mm:ssXXX")))
        .head().getString(0)
      assert(got == want, s"\nmapping: $mapping\nin: $in\ngot: $got")
    }
  }

  /** Like [[check]] but key-order-insensitive: both sides are re-parsed
    * (Spark schema inference sorts keys) and re-serialized before compare
    * — for examples where the reference's Go map serialization order is
    * an artifact, not semantics. */
  def checkCanon(mapping: String, cases: (String, String)*): Unit = {
    import spark.implicits._
    def canon(j: String): String = {
      val df = spark.read.json(spark.createDataset(scala.Seq(j)))
      df.select(to_json(struct(df.columns.sorted.map(col).toIndexedSeq: _*)))
        .head().getString(0)
    }
    cases.foreach { case (in, want) =>
      val df = spark.read.json(spark.createDataset(scala.Seq(in)))
      val out = Mapping.compile(mapping).applyPlain(df)
      val got = out.select(to_json(struct(out.columns.map(col).toIndexedSeq: _*)))
        .head().getString(0)
      assert(canon(got) == canon(want), s"\nmapping: $mapping\nin: $in\ngot: $got")
    }
  }

  test("all (methods_structured.go)") {
    check("root.all_over_21 = this.patrons.all(patron -> patron.age >= 21)",
      """{"patrons":[{"id":"1","age":18},{"id":"2","age":23}]}""" -> """{"all_over_21":false}""",
      """{"patrons":[{"id":"1","age":45},{"id":"2","age":23}]}""" -> """{"all_over_21":true}""")
  }

  test("any (methods_structured.go)") {
    check("root.any_over_21 = this.patrons.any(patron -> patron.age >= 21)",
      """{"patrons":[{"id":"1","age":18},{"id":"2","age":23}]}""" -> """{"any_over_21":true}""",
      """{"patrons":[{"id":"1","age":10},{"id":"2","age":12}]}""" -> """{"any_over_21":false}""")
  }

  test("append (methods_structured.go)") {
    check("""root.foo = this.foo.append("and", "this")""",
      """{"foo":["bar","baz"]}""" -> """{"foo":["bar","baz","and","this"]}""")
  }

  test("contains on arrays and strings (methods_structured.go)") {
    check("""root.has_foo = this.thing.contains("foo")""",
      """{"thing":["this","foo","that"]}""" -> """{"has_foo":true}""",
      """{"thing":"this foo that"}""" -> """{"has_foo":true}""",
      """{"thing":"this bar that"}""" -> """{"has_foo":false}""")
  }

  test("capitalize = Go strings.Title (methods_strings.go)") {
    check("root.title = this.title.capitalize()",
      """{"title":"the foo bar"}""" -> """{"title":"The Foo Bar"}""")
  }

  test("encode/decode hex (methods_strings.go)") {
    check("""root.encoded = this.value.encode("hex")""",
      """{"value":"hello world"}""" -> """{"encoded":"68656c6c6f20776f726c64"}""")
    check("""root.decoded = this.value.decode("hex").string()""",
      """{"value":"68656c6c6f20776f726c64"}""" -> """{"decoded":"hello world"}""")
  }

  test("escape_html / unescape_html (methods_strings.go)") {
    check("root.escaped = this.value.escape_html()",
      """{"value":"foo & bar"}""" -> """{"escaped":"foo &amp; bar"}""")
    check("root.unescaped = this.value.unescape_html()",
      """{"value":"foo &amp; bar"}""" -> """{"unescaped":"foo & bar"}""")
  }

  test("index_of (methods_strings.go)") {
    check("""root.index = this.thing.index_of("bar")""",
      """{"thing":"foobar"}""" -> """{"index":3}""")
  }

  test("escape_url_query / unescape (methods_strings.go)") {
    check("root.escaped = this.value.escape_url_query()",
      """{"value":"foo & bar"}""" -> """{"escaped":"foo+%26+bar"}""")
    check("root.unescaped = this.value.unescape_url_query()",
      """{"value":"foo+%26+bar"}""" -> """{"unescaped":"foo & bar"}""")
  }

  test("format with Go verbs (methods_strings.go)") {
    check("""root.foo = "%s(%v): %v".format(this.name, this.age, this.fingers)""",
      """{"name":"lance","age":37,"fingers":13}""" -> """{"foo":"lance(37): 13"}""")
  }

  test("has_prefix / has_suffix (methods_strings.go)") {
    check("""root.t1 = this.v1.has_prefix("foo")
            |root.t2 = this.v2.has_prefix("foo")""".stripMargin,
      """{"v1":"foobar","v2":"barfoo"}""" -> """{"t1":true,"t2":false}""")
    check("""root.t1 = this.v1.has_suffix("foo")
            |root.t2 = this.v2.has_suffix("foo")""".stripMargin,
      """{"v1":"foobar","v2":"barfoo"}""" -> """{"t1":false,"t2":true}""")
  }

  test("hash + encode hex idiom (methods_strings.go)") {
    check("""root.h1 = this.value.hash("sha1").encode("hex")""",
      """{"value":"hello world"}""" -> """{"h1":"2aae6c35c94fcfb415dbe95f408b9ce91ee846ed"}""")
  }

  test("join (methods_strings.go)") {
    check("""root.joined_words = this.words.join()
            |root.joined_numbers = this.numbers.join(",")""".stripMargin,
      """{"words":["hello","world"],"numbers":[3,8,11]}""" ->
        """{"joined_words":"helloworld","joined_numbers":"3,8,11"}""")
  }

  test("bytes index → first byte value (methods_strings.go)") {
    check("root.first_byte = this.name.bytes().index(0)",
      """{"name":"foobar bazson"}""" -> """{"first_byte":102}""")
  }

  test("filepath_split (methods_strings.go)") {
    check("root.path_sep = this.path.filepath_split()",
      """{"path":"baz.txt"}""" -> """{"path_sep":["","baz.txt"]}""")
  }

  test("uppercase (methods_strings.go)") {
    check("root.foo = this.foo.uppercase()",
      """{"foo":"hello world"}""" -> """{"foo":"HELLO WORLD"}""")
  }

  test("map definitions via apply (methods.go)") {
    check(
      """map thing {
        |  root.inner = this.first
        |}
        |root.foo = this.doc.apply("thing")""".stripMargin,
      """{"doc":{"first":"hello world"}}""" -> """{"foo":{"inner":"hello world"}}""")
  }

  test("get with dynamic-ish targets (methods.go)") {
    check("""root.result = this.foo.get("bar")""",
      """{"foo":{"bar":"from bar","baz":"from baz"}}""" -> """{"result":"from bar"}""")
  }

  test("type inspection (methods.go)") {
    check(
      """root.bar_type = this.bar.type()
        |root.foo_type = this.foo.type()""".stripMargin,
      """{"bar":10,"foo":"is a string"}""" -> """{"bar_type":"number","foo_type":"string"}""")
  }

  test("numbers: abs ceil floor log round (methods_numbers.go)") {
    check("root.new_value = this.value.abs()",
      """{"value":5.3}""" -> """{"new_value":5.3}""",
      """{"value":-5.9}""" -> """{"new_value":5.9}""")
    check("root.new_value = this.value.ceil()",
      """{"value":5.3}""" -> """{"new_value":6}""",
      """{"value":-5.9}""" -> """{"new_value":-5}""")
    check("root.new_value = this.value.floor()",
      """{"value":5.7}""" -> """{"new_value":5}""")
    check("root.new_value = this.value.log().round()",
      """{"value":1}""" -> """{"new_value":0}""",
      """{"value":2.7183}""" -> """{"new_value":1}""")
  }

  test("catch falls back on null (methods.go flavor)") {
    check("""root.doc.id = this.thing.id.catch("unknown")""",
      """{"thing":{"id":"1234"}}""" -> """{"doc":{"id":"1234"}}""",
      """{"thing":{}}""" -> """{"doc":{"id":"unknown"}}""")
  }

  test("sort_by (methods_structured.go)") {
    check("root.sorted = this.foo.sort_by(ele -> ele.id)",
      """{"foo":[{"id":"bbb","message":"bar"},{"id":"aaa","message":"foo"},{"id":"ccc","message":"baz"}]}""" ->
        """{"sorted":[{"id":"aaa","message":"foo"},{"id":"bbb","message":"bar"},{"id":"ccc","message":"baz"}]}""")
  }

  test("without (methods_structured.go)") {
    check("""root = this.without("inner.a","inner.c","d")""",
      """{"inner":{"a":"first","b":"second","c":"third"},"d":"fourth","e":"fifth"}""" ->
        """{"e":"fifth","inner":{"b":"second"}}""")
  }

  test("unique (methods_structured.go)") {
    check("root.uniques = this.foo.unique()",
      """{"foo":["a","b","a","c"]}""" -> """{"uniques":["a","b","c"]}""")
  }

  test("trim with and without cutset (methods_strings.go)") {
    check("""root.title = this.title.trim("!?")
            |root.description = this.description.trim()""".stripMargin,
      """{"description":"  something happened and its amazing! ","title":"!!!watch out!?"}""" ->
        """{"title":"watch out","description":"something happened and its amazing!"}""")
  }

  test("split (methods_strings.go)") {
    check("""root.new_value = this.value.split(",")""",
      """{"value":"foo,bar,baz"}""" -> """{"new_value":["foo","bar","baz"]}""")
  }

  test("unquote (methods_strings.go:1492)") {
    check("root.unquoted = this.thing.unquote()",
      """{"thing":"\"foo\\nbar\""}""" -> """{"unquoted":"foo\nbar"}""")
  }

  test("values sorted (methods_structured.go:1459)") {
    check("root.foo_vals = this.foo.values().sort()",
      """{"foo":{"bar":1,"baz":2}}""" -> """{"foo_vals":[1,2]}""")
  }

  test("not_empty with catch fallback (methods_structured.go:955)") {
    // reference: empty string/array → error; in the engine's error model
    // that's null, so `.catch()` supplies the fallback the same way.
    check("""root.a = this.a.not_empty().catch("fallback")""",
      """{"a":"foo"}""" -> """{"a":"foo"}""",
      """{"a":""}""" -> """{"a":"fallback"}""")
    // (fallback is coerced to the input's inferred array<string> type —
    // schema-first unification, so the fallback here is a string array)
    check("""root.n = this.a.not_empty().catch(["none"])""",
      """{"a":["foo","bar"]}""" -> """{"n":["foo","bar"]}""",
      """{"a":[]}""" -> """{"n":["none"]}""")
  }

  test("re_find_all_submatch (methods_strings.go:1659)") {
    check("""root.matches = this.value.re_find_all_submatch("a(x*)b")""",
      """{"value":"-axxb-ab-"}""" -> """{"matches":[["axxb","xx"],["ab",""]]}""")
  }

  test("re_find_all_object (methods_strings.go:1768)") {
    check("""root.matches = this.value.re_find_all_object("a(?P<foo>x*)b")""",
      """{"value":"-axxb-ab-"}""" ->
        """{"matches":[{"0":"axxb","foo":"xx"},{"0":"ab","foo":""}]}""")
    check("root.matches = this.value.re_find_all_object(" +
        "\"(?m)(?P<key>\\\\w+):\\\\s+(?P<value>\\\\w+)$\")",
      """{"value":"option1: value1\noption2: value2\noption3: value3"}""" ->
        ("""{"matches":[{"0":"option1: value1","key":"option1","value":"value1"},""" +
          """{"0":"option2: value2","key":"option2","value":"value2"},""" +
          """{"0":"option3: value3","key":"option3","value":"value3"}]}"""))
  }

  test("json_schema method validates, invalid pairs with catch (methods_structured.go:587)") {
    val schema = """{\"type\":\"object\",\"required\":[\"name\"],""" +
      """\"properties\":{\"name\":{\"type\":\"string\"}}}"""
    check(s"""root.who = this.json_schema("$schema").name.catch("invalid")""",
      """{"name":"ann"}""" -> """{"who":"ann"}""",
      """{"name":5}""" -> """{"who":"invalid"}""")
  }

  test("timestamp / timestamp_utc deprecated aliases (functions.go:630,651)") {
    check("""root.y = timestamp("2006").number() >= 2024""",
      """{"x":1}""" -> """{"y":true}""")
    check("""root.t = timestamp_utc("15:04:05").length() == 8""",
      """{"x":1}""" -> """{"t":true}""")
  }

  test("fold accumulates numbers and strings (methods_structured.go:475-483)") {
    check("""root.sum = this.foo.fold(0, item -> item.tally + item.value)""",
      """{"foo":[3,8,11]}""" -> """{"sum":22}""")
    check("""root.result = this.foo.fold("", item -> "%v%v".format(item.tally, item.value))""",
      """{"foo":["hello ", "world"]}""" -> """{"result":"hello world"}""")
  }

  test("sum (methods_structured.go:1308)") {
    check("root.sum = this.foo.sum()",
      """{"foo":[3,8,4]}""" -> """{"sum":15}""")
  }

  test("key_values sorted by key (methods_structured.go:683)") {
    check("root.foo_key_values = this.foo.key_values().sort_by(pair -> pair.key)",
      """{"foo":{"bar":1,"baz":2}}""" ->
        """{"foo_key_values":[{"key":"bar","value":1},{"key":"baz","value":2}]}""")
  }

  test("map_each with deleted() drops elements (methods_structured.go:762-768)") {
    check("""root.new_nums = this.nums.map_each(num -> if num < 10 {
             |  deleted()
             |} else {
             |  num - 10
             |})""".stripMargin,
      """{"nums":[3,11,4,17]}""" -> """{"new_nums":[1,7]}""")
  }

  test("enumerated (methods_structured.go:253)") {
    check("root.foo = this.foo.enumerated()",
      """{"foo":["bar","baz"]}""" ->
        """{"foo":[{"index":0,"value":"bar"},{"index":1,"value":"baz"}]}""")
  }

  test("merge with scalar collision → array concat (methods_structured.go:901)") {
    check("root = this.foo.merge(this.bar)",
      """{"foo":{"first_name":"fooer","likes":"bars"},"bar":{"second_name":"barer","likes":"foos"}}""" ->
        """{"first_name":"fooer","likes":["bars","foos"],"second_name":"barer"}""")
  }

  test("lowercase (methods_strings.go)") {
    check("root.foo = this.foo.lowercase()",
      """{"foo":"HELLO WORLD"}""" -> """{"foo":"hello world"}""")
  }

  test("replace (methods_strings.go)") {
    check("""root.new_value = this.value.replace("foo","dog")""",
      """{"value":"The foo ate my homework"}""" ->
        """{"new_value":"The dog ate my homework"}""")
  }

  test("replace_many (methods_strings.go)") {
    check("""root.new_value = this.value.replace_many([
             |  "<b>", "&lt;b&gt;",
             |  "</b>", "&lt;/b&gt;",
             |  "<i>", "&lt;i&gt;",
             |  "</i>", "&lt;/i&gt;",
             |])""".stripMargin,
      """{"value":"<i>Hello</i> <b>World</b>"}""" ->
        """{"new_value":"&lt;i&gt;Hello&lt;/i&gt; &lt;b&gt;World&lt;/b&gt;"}""")
  }

  test("re_match (methods_strings.go)") {
    check("""root.matches = this.value.re_match("[0-9]")""",
      """{"value":"there are 10 puppies"}""" -> """{"matches":true}""",
      """{"value":"there are ten puppies"}""" -> """{"matches":false}""")
  }

  test("re_replace (methods_strings.go)") {
    check("""root.new_value = this.value.re_replace("ADD ([0-9]+)","+($1)")""",
      """{"value":"foo ADD 70"}""" -> """{"new_value":"foo +(70)"}""")
  }

  test("reverse string (methods_strings.go)") {
    check("root.reversed = this.thing.reverse()",
      """{"thing":"backwards"}""" -> """{"reversed":"sdrawkcab"}""")
  }

  test("strip_html (methods_strings.go)") {
    check("root.stripped = this.value.strip_html()",
      """{"value":"<p>the plain <strong>old text</strong></p>"}""" ->
        """{"stripped":"the plain old text"}""")
    check("""root.stripped = this.value.strip_html(["article"])""",
      """{"value":"<article><p>the plain <strong>old text</strong></p></article>"}""" ->
        """{"stripped":"<article>the plain old text</article>"}""")
  }

  test("parse_json (methods_strings.go)") {
    check("root.doc = this.doc.parse_json()",
      """{"doc":"{\"foo\":\"bar\"}"}""" -> """{"doc":{"foo":"bar"}}""")
  }

  test("parse_csv (methods_strings.go)") {
    // Go serializes map keys alphabetically; we keep CSV header order.
    // Same value — compare canonically (both sides key-sorted).
    checkCanon("root.orders = this.orders.parse_csv()",
      """{"orders":"foo,bar\nfoo 1,bar 1\nfoo 2,bar 2"}""" ->
        """{"orders":[{"bar":"bar 1","foo":"foo 1"},{"bar":"bar 2","foo":"foo 2"}]}""")
  }

  test("parse_duration (methods_strings.go)") {
    check("root.delay_for_ns = this.delay_for.parse_duration()",
      """{"delay_for":"50us"}""" -> """{"delay_for_ns":50000}""")
  }

  test("filepath_join (methods_strings.go)") {
    check("root.path = this.path_elements.filepath_join()",
      """{"path_elements":["/foo/","bar.txt"]}""" -> """{"path":"/foo/bar.txt"}""")
  }

  test("format_timestamp_unix (methods_strings.go)") {
    check("root.created_at_unix = this.created_at.format_timestamp_unix()",
      """{"created_at":"2009-11-10T23:00:00Z"}""" ->
        """{"created_at_unix":1257894000}""")
  }

  test("exists (methods_structured.go)") {
    check("""root.result = this.foo.exists("bar.baz")""",
      """{"foo":{"bar":{"baz":"yep, I exist"}}}""" -> """{"result":true}""",
      """{"foo":{"bar":{}}}""" -> """{"result":false}""")
  }

  test("filter on arrays (methods_structured.go)") {
    check("root.new_nums = this.nums.filter(num -> num > 10)",
      """{"nums":[3,11,4,17]}""" -> """{"new_nums":[11,17]}""")
  }

  test("keys (methods_structured.go)") {
    check("root.foo_keys = this.foo.keys()",
      """{"foo":{"bar":1,"baz":2}}""" -> """{"foo_keys":["bar","baz"]}""")
  }

  test("map_each_key uppercase (methods_structured.go)") {
    check("root.new_dict = this.dict.map_each_key(key -> key.uppercase())",
      """{"dict":{"keya":"hello","keyb":"world"}}""" ->
        """{"new_dict":{"KEYA":"hello","KEYB":"world"}}""")
  }

  test("slice with negative indices (methods_structured.go)") {
    check("""root.beginning = this.value.slice(0, 2)
             |root.end = this.value.slice(4)""".stripMargin,
      """{"value":"foo bar"}""" -> """{"beginning":"fo","end":"bar"}""")
    check("""root.last_chunk = this.value.slice(-4)
             |root.the_rest = this.value.slice(0, -4)""".stripMargin,
      """{"value":"foo bar"}""" -> """{"last_chunk":" bar","the_rest":"foo"}""")
  }

  test("encrypt_aes ctr with explicit IV (methods_strings.go:263)") {
    check("""let key = "2b7e151628aed2a6abf7158809cf4f3c".decode("hex")
             |let vector = "f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff".decode("hex")
             |root.encrypted = this.value.encrypt_aes("ctr", $key, $vector).encode("hex")""".stripMargin,
      """{"value":"hello world!"}""" -> """{"encrypted":"84e9b31ff7400bdf80be7254"}""")
    // and the inverse round-trips
    check("""let key = "2b7e151628aed2a6abf7158809cf4f3c".decode("hex")
             |let vector = "f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff".decode("hex")
             |root.decrypted = "84e9b31ff7400bdf80be7254".decode("hex").decrypt_aes("ctr", $key, $vector).string()""".stripMargin,
      """{"value":""}""" -> """{"decrypted":"hello world!"}""")
  }

  test("parse_xml (methods_strings.go)") {
    checkCanon("root.doc = this.doc.parse_xml()",
      """{"doc":"<root><title>This is a title</title><content>This is some content</content></root>"}""" ->
        """{"doc":{"root":{"content":"This is some content","title":"This is a title"}}}""")
  }

  test("parse_yaml / format_yaml (methods_strings.go)") {
    checkCanon("root.doc = this.doc.parse_yaml()",
      """{"doc":"foo: bar"}""" -> """{"doc":{"foo":"bar"}}""")
    check("""root.doc = this.doc.format_yaml().string()""",
      """{"doc":{"foo":"bar"}}""" -> """{"doc":"foo: bar\n"}""")
  }

  test("parse_timestamp with Go layout (methods_strings.go)") {
    check("""root.doc.timestamp = this.doc.timestamp.parse_timestamp("2006-Jan-02")""",
      """{"doc":{"timestamp":"2020-Aug-14"}}""" ->
        """{"doc":{"timestamp":"2020-08-14T00:00:00Z"}}""")
  }

  test("format_timestamp_strftime with timezone (methods_strings.go)") {
    check("""root.something_at = this.created_at.format_timestamp_strftime("%Y-%b-%d %H:%M:%S", "UTC")""",
      """{"created_at":1597405526}""" -> """{"something_at":"2020-Aug-14 11:45:26"}""")
  }

  test("re_find_object named groups (methods_strings.go)") {
    checkCanon("""root.matches = this.value.re_find_object("a(?P<foo>x*)b")""",
      """{"value":"-axxb-ab-"}""" -> """{"matches":{"0":"axxb","foo":"xx"}}""")
    checkCanon("""root.matches = this.value.re_find_object("(?P<key>\\w+):\\s+(?P<value>\\w+)")""",
      """{"value":"option1: value1"}""" ->
        """{"matches":{"0":"option1: value1","key":"option1","value":"value1"}}""")
  }

  test("explode on objects and arrays (methods_structured.go:338)") {
    check("""root = this.explode("value")""",
      """{"id":1,"value":{"foo":2,"bar":[3,4],"baz":{"bev":5}}}""" ->
        """{"bar":{"id":1,"value":[3,4]},"baz":{"id":1,"value":{"bev":5}},"foo":{"id":1,"value":2}}""")
    // array flavor (root-level array wrapped in a field for the harness)
    check("""root.rows = this.explode("value")""",
      """{"id":1,"value":["foo","bar","baz"]}""" ->
        """{"rows":[{"id":1,"value":"foo"},{"id":1,"value":"bar"},{"id":1,"value":"baz"}]}""")
  }

  test("max / min over int arrays (methods_numbers.go)") {
    check("root.new_value = [0,this.value].max()",
      """{"value":-1}""" -> """{"new_value":0}""",
      """{"value":7}""" -> """{"new_value":7}""")
    check("root.new_value = [10,this.value].min()",
      """{"value":2}""" -> """{"new_value":2}""",
      """{"value":23}""" -> """{"new_value":10}""")
  }

  /** Numeric-tolerant compare: both sides parsed as JSON trees, numbers
    * compared by value — Go marshals float64(2) as `2` where Spark's
    * to_json writes `2.0`; a formatting artifact, not semantics. */
  def checkNum(mapping: String, cases: (String, String)*): Unit = {
    import spark.implicits._
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    val om = new ObjectMapper()
    def sameTree(a: JsonNode, b: JsonNode): Boolean =
      if (a.isNumber && b.isNumber)
        a.decimalValue().compareTo(b.decimalValue()) == 0
      else if (a.isObject && b.isObject) {
        import scala.jdk.CollectionConverters._
        val ka = a.fieldNames().asScala.toSet
        ka == b.fieldNames().asScala.toSet && ka.forall(k => sameTree(a.get(k), b.get(k)))
      } else if (a.isArray && b.isArray)
        a.size == b.size && (0 until a.size).forall(i => sameTree(a.get(i), b.get(i)))
      else a == b
    cases.foreach { case (in, want) =>
      val df = spark.read.json(spark.createDataset(scala.Seq(in)))
      val out = Mapping.compile(mapping).applyPlain(df)
      val got = out.select(to_json(struct(out.columns.map(col).toIndexedSeq: _*)))
        .head().getString(0)
      assert(sameTree(om.readTree(got), om.readTree(want)),
        s"\nmapping: $mapping\nin: $in\ngot: $got\nwant: $want")
    }
  }

  test("abs (methods_numbers.go)") {
    check("root.new_value = this.value.abs()",
      """{"value":5.3}""" -> """{"new_value":5.3}""",
      """{"value":-5.9}""" -> """{"new_value":5.9}""")
  }

  test("ceil / floor (methods_numbers.go)") {
    check("root.new_value = this.value.ceil()",
      """{"value":5.3}""" -> """{"new_value":6}""",
      """{"value":-5.9}""" -> """{"new_value":-5}""")
    check("root.new_value = this.value.floor()",
      """{"value":5.7}""" -> """{"new_value":5}""")
  }

  test("log / log10 (methods_numbers.go)") {
    check("root.new_value = this.value.log().round()",
      """{"value":1}""" -> """{"new_value":0}""",
      """{"value":2.7183}""" -> """{"new_value":1}""")
    checkNum("root.new_value = this.value.log10()",
      """{"value":100}""" -> """{"new_value":2}""",
      """{"value":1000}""" -> """{"new_value":3}""")
  }

  test("min over mixed numeric array (methods_numbers.go)") {
    checkNum("root.smallest = this.values.min()",
      """{"values":[0,3,-2.5,7,5]}""" -> """{"smallest":-2.5}""")
  }

  test("round (methods_numbers.go)") {
    check("root.new_value = this.value.round()",
      """{"value":5.3}""" -> """{"new_value":5}""",
      """{"value":5.9}""" -> """{"new_value":6}""")
  }

  test("apply (methods.go)") {
    check(
      """map thing {
        |  root.inner = this.first
        |}
        |
        |root.foo = this.doc.apply("thing")""".stripMargin,
      """{"doc":{"first":"hello world"}}""" -> """{"foo":{"inner":"hello world"}}""")
    checkCanon(
      """map create_foo {
        |  root.name = "a foo"
        |  root.purpose = "to be a foo"
        |}
        |
        |root = this
        |root.foo = null.apply("create_foo")""".stripMargin,
      """{"id":"1234"}""" ->
        """{"foo":{"name":"a foo","purpose":"to be a foo"},"id":"1234"}""")
  }

  test("not_null (methods.go)") {
    check("root.a = this.a.not_null()",
      """{"a":"foobar","b":"barbaz"}""" -> """{"a":"foobar"}""")
  }

  test("collapse (methods_structured.go)") {
    checkCanon("root.result = this.collapse()",
      """{"foo":[{"bar":"1"},{"bar":"2"}]}""" ->
        """{"result":{"foo.0.bar":"1","foo.1.bar":"2"}}""")
  }

  test("index (methods_structured.go)") {
    check("root.last_name = this.names.index(-1)",
      """{"names":["rachel","stevens"]}""" -> """{"last_name":"stevens"}""")
    checkNum("root.last_byte = this.name.bytes().index(-1)",
      """{"name":"foobar bazson"}""" -> """{"last_byte":110}""")
  }

  test("length (methods_structured.go)") {
    check("root.foo_len = this.foo.length()",
      """{"foo":"hello world"}""" -> """{"foo_len":11}""")
    check("root.foo_len = this.foo.length()",
      """{"foo":["first","second"]}""" -> """{"foo_len":2}""")
    check("root.foo_len = this.foo.length()",
      """{"foo":{"first":"bar","second":"baz"}}""" -> """{"foo_len":2}""")
  }

  test("sort (methods_structured.go)") {
    check("root.sorted = this.foo.sort()",
      """{"foo":["bbb","ccc","aaa"]}""" -> """{"sorted":["aaa","bbb","ccc"]}""")
    check("root.sorted = this.foo.sort(item -> item.left.v < item.right.v)",
      """{"foo":[{"id":"foo","v":"bbb"},{"id":"bar","v":"ccc"},{"id":"baz","v":"aaa"}]}""" ->
        """{"sorted":[{"id":"baz","v":"aaa"},{"id":"foo","v":"bbb"},{"id":"bar","v":"ccc"}]}""")
  }

  test("encode / decode hex (methods_strings.go)") {
    check("""root.encoded = this.value.encode("hex")""",
      """{"value":"hello world"}""" -> """{"encoded":"68656c6c6f20776f726c64"}""")
    check("""root.decoded = this.value.decode("hex").string()""",
      """{"value":"68656c6c6f20776f726c64"}""" -> """{"decoded":"hello world"}""")
  }

  test("decrypt_aes ctr (methods_strings.go)") {
    check(
      """let key = "2b7e151628aed2a6abf7158809cf4f3c".decode("hex")
        |let vector = "f0f1f2f3f4f5f6f7f8f9fafbfcfdfeff".decode("hex")
        |root.decrypted = this.value.decode("hex").decrypt_aes("ctr", $key, $vector).string()""".stripMargin,
      """{"value":"84e9b31ff7400bdf80be7254"}""" -> """{"decrypted":"hello world!"}""")
  }

  test("unescape_html / unescape_url_query (methods_strings.go)") {
    check("root.unescaped = this.value.unescape_html()",
      """{"value":"foo &amp; bar"}""" -> """{"unescaped":"foo & bar"}""")
    check("root.unescaped = this.value.unescape_url_query()",
      """{"value":"foo+%26+bar"}""" -> """{"unescaped":"foo & bar"}""")
  }

  test("has_suffix (methods_strings.go)") {
    check(
      """root.t1 = this.v1.has_suffix("foo")
        |root.t2 = this.v2.has_suffix("foo")""".stripMargin,
      """{"v1":"foobar","v2":"barfoo"}""" -> """{"t1":false,"t2":true}""")
  }

  test("format_yaml string coercion (methods_strings.go)") {
    check("root.doc = this.doc.format_yaml().string()",
      """{"doc":{"foo":"bar"}}""" -> """{"doc":"foo: bar\n"}""")
  }

  test("parse_timestamp_unix (methods_strings.go)") {
    check("root.doc.timestamp = this.doc.timestamp.parse_timestamp_unix()",
      """{"doc":{"timestamp":"2020-08-14T11:45:26.371Z"}}""" ->
        """{"doc":{"timestamp":1597405526}}""")
    check("""root.doc.timestamp = this.doc.timestamp.parse_timestamp_unix("2006-Jan-02")""",
      """{"doc":{"timestamp":"2020-Aug-14"}}""" ->
        """{"doc":{"timestamp":1597363200}}""")
  }

  test("parse_timestamp_strptime (methods_strings.go)") {
    check("""root.doc.timestamp = this.doc.timestamp.parse_timestamp_strptime("%Y-%b-%d")""",
      """{"doc":{"timestamp":"2020-Aug-14"}}""" ->
        """{"doc":{"timestamp":"2020-08-14T00:00:00Z"}}""")
  }

  test("format_timestamp with timezone (methods_strings.go)") {
    check("""root.something_at = this.created_at.format_timestamp("2006-Jan-02 15:04:05", "UTC")""",
      """{"created_at":1597405526}""" -> """{"something_at":"2020-Aug-14 11:45:26"}""",
      """{"created_at":"2020-08-14T11:50:26.371Z"}""" -> """{"something_at":"2020-Aug-14 11:50:26"}""")
  }

  test("format_timestamp_unix_nano (methods_strings.go)") {
    check("root.created_at_unix = this.created_at.format_timestamp_unix_nano()",
      """{"created_at":"2009-11-10T23:00:00Z"}""" ->
        """{"created_at_unix":1257894000000000000}""")
  }

  test("quote (methods_strings.go)") {
    check("root.quoted = this.thing.quote()",
      """{"thing":"foo\nbar"}""" -> """{"quoted":"\"foo\\nbar\""}""")
  }

  test("re_find_all (methods_strings.go)") {
    check("""root.matches = this.value.re_find_all("a.")""",
      """{"value":"paranormal"}""" -> """{"matches":["ar","an","al"]}""")
  }

  test("string (methods_strings.go)") {
    check("root.nested_json = this.string()",
      """{"foo":"bar"}""" -> """{"nested_json":"{\"foo\":\"bar\"}"}""")
    check("root.id = this.id.string()",
      """{"id":228930314431312345}""" -> """{"id":"228930314431312345"}""")
  }
}
