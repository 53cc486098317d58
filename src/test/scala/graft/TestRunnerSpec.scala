package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.runtime.TestRunner

/** The declarative YAML test format, validated against the reference's own
  * shipped test cases (config/test/bloblang/cities_test.yaml et al). */
class TestRunnerSpec extends AnyFunSuite {
  lazy val spark = Sessions.builder("4").getOrCreate()

  test("reference cities_test.yaml passes verbatim (mapping inlined)") {
    // mapping from config/test/bloblang/cities.blobl, test from
    // cities_test.yaml — same inputs, same expected output
    val results = TestRunner.run(spark,
      """tests:
        |  - name: test cities mapping
        |    target_mapping: |
        |      root.Cities = this.locations.
        |                      filter(loc -> loc.state == "WA").
        |                      map_each(loc -> loc.name).
        |                      sort().join(", ")
        |    environment: {}
        |    input_batch:
        |      - content: |
        |          {
        |            "locations": [
        |              {"name": "Seattle", "state": "WA"},
        |              {"name": "New York", "state": "NY"},
        |              {"name": "Bellevue", "state": "WA"},
        |              {"name": "Olympia", "state": "WA"}
        |            ]
        |          }
        |    output_batches:
        |      -
        |        - json_equals: {"Cities": "Bellevue, Olympia, Seattle"}
        |""".stripMargin)
    assert(results.forall(_.ok), results.flatMap(_.failures).mkString("; "))
  }

  test("reference csv_formatter_test.yaml consistent-objects case (verbatim)") {
    // mapping from config/test/bloblang/csv_formatter.blobl, test from
    // csv_formatter_test.yaml (the error-message case is reference-
    // specific wording and is skipped)
    val results = TestRunner.run(spark,
      """tests:
        |  - name: Consistent objects
        |    target_mapping: |
        |      let header_row = this.0.keys().sort().join(",")
        |      root = $header_row + "\n" + this.map_each(element -> element.key_values().
        |        sort_by(item -> item.key).
        |        map_each(item -> item.value.string()).
        |        join(",")
        |      ).join("\n")
        |    input_batch:
        |      - content: |
        |            [
        |                {
        |                    "foo": "hello world",
        |                    "baz": 110,
        |                    "bar": "bar value",
        |                    "buz": false
        |                },
        |                {
        |                    "foo": "hello world 2",
        |                    "bar": "bar value 2",
        |                    "baz": 220,
        |                    "buz": true
        |                },
        |                {
        |                    "foo": "hello world 3",
        |                    "bar": "bar value 3",
        |                    "baz": 330,
        |                    "buz": true
        |                }
        |            ]
        |    output_batches:
        |      -
        |        - content_equals: |-
        |            bar,baz,buz,foo
        |            bar value,110,false,hello world
        |            bar value 2,220,true,hello world 2
        |            bar value 3,330,true,hello world 3
        |""".stripMargin)
    assert(results.forall(_.ok), results.flatMap(_.failures).mkString("; "))
  }

  test("reference github_releases_test.yaml passes verbatim (mapping inlined)") {
    // mapping from config/test/bloblang/github_releases.blobl
    val results = TestRunner.run(spark,
      """tests:
        |  - name: Github releases mapping
        |    target_mapping: |
        |      root = this.map_each(release -> release.assets.map_each(asset -> {
        |        "source":         "github",
        |        "dist":           asset.name.re_replace("^benthos-?((lambda_)|_)[0-9\\.]+(-rc[0-9]+)?_([^\\.]+).*", "$2$4"),
        |        "download_count": asset.download_count,
        |        "version":        release.tag_name.trim("v"),
        |      }).filter(asset -> asset.dist != "checksums")).flatten()
        |    input_batch:
        |      - content: |
        |          [
        |            {
        |              "tag_name": "1.23.4",
        |              "assets": [
        |                {"name": "benthos-lambda_1.23.4_linux_amd64.zip", "download_count": 123},
        |                {"name": "benthos_1.23.4_checksums.txt", "download_count": 456},
        |                {"name": "benthos_1.23.4_darwin_amd64.tar.gz", "download_count": 789},
        |                {"name": "benthos_1.23.4_linux_amd64.tar.gz", "download_count": 101112},
        |                {"name": "benthos_1.23.4_linux_arm64.tar.gz", "download_count": 131415}
        |              ]
        |            }
        |          ]
        |    output_batches:
        |      - - json_equals:
        |            [
        |                {"dist": "lambda_linux_amd64", "download_count": 123, "source": "github", "version": "1.23.4"},
        |                {"version": "1.23.4", "dist": "darwin_amd64", "download_count": 789, "source": "github"},
        |                {"dist": "linux_amd64", "download_count": 101112, "source": "github", "version": "1.23.4"},
        |                {"dist": "linux_arm64", "download_count": 131415, "source": "github", "version": "1.23.4"}
        |            ]
        |""".stripMargin)
    assert(results.forall(_.ok), results.flatMap(_.failures).mkString("; "))
  }

  test("reference filtering cookbook test passes verbatim (config inlined)") {
    // processors from config/test/cookbooks/filtering.yaml, test from
    // filtering_benthos_test.yaml
    val results = TestRunner.run(spark,
      """tests:
        |  - name: Basic filter
        |    environment: {}
        |    target_processors:
        |      - bloblang: |
        |          root = match {
        |            meta("topic").or("") == "foo" ||
        |            doc.type.or("") == "bar" ||
        |            doc.urls.contains("https://www.benthos.dev/").catch(false) => deleted()
        |          }
        |    input_batch:
        |      - content: '{"doc":{"should":"remain"},"id":"1"}'
        |      - content: '{"doc":{"should":"not remain"},"id":"2"}'
        |        metadata:
        |          topic: foo
        |      - content: '{"doc":{"should":"not remain","type":"bar"},"id":"3"}'
        |      - content: '{"doc":{"should":"not remain","urls":["https://www.benthos.dev/"]},"id":"4"}'
        |    output_batches:
        |      - - content_equals: '{"doc":{"should":"remain"},"id":"1"}'
        |""".stripMargin)
    assert(results.forall(_.ok), results.flatMap(_.failures).mkString("; "))
  }

  test("content + metadata assertions (unit_test_example shape)") {
    val results = TestRunner.run(spark,
      """tests:
        |  - name: example test
        |    target_mapping: |
        |      root = content().string().uppercase() + "end"
        |      meta example_key = meta("example_key")
        |    input_batch:
        |      - content: 'example content'
        |        metadata:
        |          example_key: example metadata value
        |    output_batches:
        |      -
        |        - content_equals: EXAMPLE CONTENTend
        |          metadata_equals:
        |            example_key: example metadata value
        |""".stripMargin)
    assert(results.forall(_.ok), results.flatMap(_.failures).mkString("; "))
  }

  test("reference unit_test_example_benthos_test.yaml passes verbatim") {
    // config/test/unit_test_example.yaml processors + its _benthos_test
    val results = TestRunner.run(spark,
      """tests:
        |  - name: example test
        |    target_processors:
        |      - bloblang: 'root = "%vend".format(content().uppercase().string())'
        |    environment: {}
        |    input_batch:
        |      - content: 'example content'
        |        metadata:
        |          example_key: example metadata value
        |    output_batches:
        |      -
        |        - content_equals: EXAMPLE CONTENTend
        |          metadata_equals:
        |            example_key: example metadata value
        |""".stripMargin)
    assert(results.forall(_.ok), results.flatMap(_.failures).mkString("; "))
  }

  test("reference text_benthos_test.yaml passes verbatim (all four cases)") {
    // config/test/text.yaml + text_benthos_test.yaml: interpolated
    // arithmetic and equality over json() numbers
    val proc =
      """      - text:
        |          operator: set
        |          value: 'total: ${! json("a").number() + json("b").number()}, matches: ${!json("a").number() == json("b").number() }'""".stripMargin
    val results = TestRunner.run(spark,
      s"""tests:
         |  - name: Add two ints
         |    target_processors:
         |$proc
         |    input_batch:
         |      - content: '{"a":2,"b":3}'
         |    output_batches:
         |      - - content_equals: 'total: 5, matches: false'
         |  - name: Add int to string int
         |    target_processors:
         |$proc
         |    input_batch:
         |      - content: '{"a":7,"b":"3"}'
         |    output_batches:
         |      - - content_equals: 'total: 10, matches: false'
         |  - name: Add matching int
         |    target_processors:
         |$proc
         |    input_batch:
         |      - content: '{"a":3,"b":3}'
         |    output_batches:
         |      - - content_equals: 'total: 6, matches: true'
         |  - name: Add matching int and string int
         |    target_processors:
         |$proc
         |    input_batch:
         |      - content: '{"a":3,"b":"3"}'
         |    output_batches:
         |      - - content_equals: 'total: 6, matches: true'
         |""".stripMargin)
    assert(results.forall(_.ok), results.flatMap(_.failures).mkString("; "))
  }

  test("inline target_processors with multiple parts") {
    val results = TestRunner.run(spark,
      """tests:
        |  - name: filter and map
        |    target_processors:
        |      - bloblang: |
        |          root.v = this.v * 10
        |          root = if this.v < 0 { deleted() }
        |    input_batch:
        |      - content: '{"v":1}'
        |      - content: '{"v":-2}'
        |      - content: '{"v":3}'
        |    output_batches:
        |      -
        |        - json_equals: {"v": 10}
        |        - json_equals: {"v": 30}
        |""".stripMargin)
    assert(results.forall(_.ok), results.flatMap(_.failures).mkString("; "))
  }

  test("content_matches / json_contains / bloblang conditions (condition.go)") {
    val results = TestRunner.run(spark,
      """tests:
        |  - name: all three condition kinds
        |    target_mapping: |
        |      root = this
        |      root.doubled = this.v * 2
        |    input_batch:
        |      - content: '{"v":5,"tag":"keep this"}'
        |    output_batches:
        |      -
        |        - content_matches: "keep th[a-z]s"
        |          json_contains: {"doubled": 10}
        |          bloblang: 'this.doubled == 10 && this.tag.contains("keep")'
        |""".stripMargin)
    assert(results.forall(_.ok), results.flatMap(_.failures).mkString("; "))
    val bad = TestRunner.run(spark,
      """tests:
        |  - name: regex miss reported
        |    target_mapping: "root.x = \"abc\""
        |    input_batch:
        |      - content: '{"y":0}'
        |    output_batches:
        |      -
        |        - content_matches: "zzz"
        |""".stripMargin)
    assert(bad.exists(!_.ok))
  }

  test("environment overrides env() per case (case.go environment)") {
    val results = TestRunner.run(spark,
      """tests:
        |  - name: env override
        |    environment:
        |      GRAFT_TEST_STAGE: staging
        |    target_mapping: 'root.stage = env("GRAFT_TEST_STAGE")'
        |    input_batch:
        |      - content: '{"a":1}'
        |    output_batches:
        |      -
        |        - json_equals: {"stage": "staging"}
        |""".stripMargin)
    assert(results.forall(_.ok), results.flatMap(_.failures).mkString("; "))
  }

  test("mocks substitute labeled processors (processors_provider.go ProvideMocked)") {
    val results = TestRunner.run(spark,
      """tests:
        |  - name: mocked http enrichment
        |    target_processors:
        |      - label: get_thing
        |        http:
        |          url: http://example.invalid/get
        |          verb: GET
        |      - mapping: 'root.after = this.mocked'
        |    mocks:
        |      get_thing:
        |        mapping: 'root.mocked = "from mock"'
        |    input_batch:
        |      - content: '{"a":1}'
        |    output_batches:
        |      -
        |        - json_equals: {"after": "from mock"}
        |""".stripMargin)
    assert(results.forall(_.ok), results.flatMap(_.failures).mkString("; "))
  }

  test("failures are reported, not thrown") {
    val results = TestRunner.run(spark,
      """tests:
        |  - name: wrong expectation
        |    target_mapping: "root.x = 1"
        |    input_batch:
        |      - content: '{"y":0}'
        |    output_batches:
        |      -
        |        - json_equals: {"x": 2}
        |""".stripMargin)
    assert(results.exists(!_.ok))
  }
}
