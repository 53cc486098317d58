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
