package graft.runtime

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.yaml.snakeyaml.Yaml
import graft.model.Envelope
import graft.ops.{BloblangProc, Pipeline, Processor}

/** The reference's declarative YAML unit-test framework (`benthos test`,
  * `lib/service/test/case.go:51-78`) as a runner: cases declare
  * `target_mapping` (inline text or file path) or `target_processors`
  * (inline processor list), an `input_batch` of content+metadata parts,
  * and per-part assertions `json_equals` / `content_equals` /
  * `metadata_equals` (`lib/service/test/condition.go:43-61`).
  */
object TestRunner {

  final case class CaseResult(name: String, failures: List[String]) {
    def ok: Boolean = failures.isEmpty
  }

  private lazy val json = new com.fasterxml.jackson.databind.ObjectMapper()

  def run(spark: SparkSession, yamlText: String, baseDir: String = "."): List[CaseResult] = {
    val root = graft.runtime.Config.safeYaml.load[Any](yamlText).asInstanceOf[java.util.Map[String, Any]].asScala
    val tests = root("tests").asInstanceOf[java.util.List[Any]].asScala.toList
    tests.map(t => runCase(spark, t.asInstanceOf[java.util.Map[String, Any]].asScala.toMap, baseDir))
  }

  private def runCase(spark: SparkSession, c: Map[String, Any], baseDir: String): CaseResult = {
    val name = c.getOrElse("name", "unnamed").toString
    // per-case env() overrides (case.go `environment`)
    val caseEnv: Map[String, String] = c.get("environment")
      .map(_.asInstanceOf[java.util.Map[String, Any]].asScala
        .map { case (k, v) => (k.toString, v.toString) }.toMap)
      .getOrElse(Map.empty)
    val procs: scala.Seq[Processor] = c.get("target_mapping") match {
      case Some(m) =>
        val text = m.toString
        val mapping =
          if (text.trim.startsWith("./") || text.trim.startsWith("/"))
            new String(java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(baseDir).resolve(text.trim.stripPrefix("./"))), "UTF-8")
          else text
        scala.Seq(BloblangProc(mapping, caseEnv))
      case None => c.get("target_processors") match {
        case Some(l: java.util.List[_]) =>
          // `mocks` substitute processors by label before compilation
          // (processors_provider.go ProvideMocked)
          val mocks: Map[String, Map[String, Any]] = c.get("mocks")
            .map(_.asInstanceOf[java.util.Map[String, Any]].asScala.map {
              case (k, v) =>
                (k.toString,
                  v.asInstanceOf[java.util.Map[String, Any]].asScala.toMap)
            }.toMap)
            .getOrElse(Map.empty)
          l.asScala.toSeq.map { p =>
            val pm = p.asInstanceOf[java.util.Map[String, Any]].asScala.toMap
            val effective = pm.get("label").map(_.toString)
              .flatMap(mocks.get).getOrElse(pm)
            Config.compileProcessor(effective)
          }
        case _ => return CaseResult(name, List("no target_mapping or inline target_processors"))
      }
    }

    val parts = c("input_batch").asInstanceOf[java.util.List[Any]].asScala.toList
      .map(_.asInstanceOf[java.util.Map[String, Any]].asScala.toMap)
    val contents = parts.map(_.getOrElse("content", "").toString)
    val metas = parts.map(_.get("metadata").map(
      _.asInstanceOf[java.util.Map[String, Any]].asScala.map { case (k, v) => (k.toString, v.toString) }.toMap)
      .getOrElse(Map.empty[String, String]))

    val env = buildEnvelope(spark, contents, metas)
    val out = Pipeline(procs)(env)

    val docType = out.schema(Envelope.Doc).dataType
    val collected = out.orderBy(col(Envelope.Seq)).select(
      (docType match {
        case _: StructType | _: ArrayType | _: MapType | _: VariantType => to_json(col(Envelope.Doc))
        case _ => col(Envelope.Doc).cast(StringType)
      }).as("docjson"),
      Envelope.contentOrDoc(out).cast(StringType).as("content"),
      col(Envelope.Meta)).collect().toList

    val expectedBatches = c.getOrElse("output_batches", new java.util.ArrayList[Any]())
      .asInstanceOf[java.util.List[Any]].asScala.toList
    val expectedParts = expectedBatches.flatMap(
      _.asInstanceOf[java.util.List[Any]].asScala.toList)
      .map(_.asInstanceOf[java.util.Map[String, Any]].asScala.toMap)

    val failures = scala.collection.mutable.ListBuffer[String]()
    if (collected.size != expectedParts.size)
      failures += s"expected ${expectedParts.size} output parts, got ${collected.size}"
    else collected.zip(expectedParts).zipWithIndex.foreach { case ((row, want), i) =>
      want.get("json_equals").foreach { exp =>
        val wantTree = json.valueToTree[com.fasterxml.jackson.databind.JsonNode](exp)
        val gotTree = try json.readTree(row.getString(0)) catch { case _: Exception => null }
        if (gotTree != wantTree)
          failures += s"part $i json_equals: got ${row.getString(0)}, want $wantTree"
      }
      want.get("content_equals").foreach { exp =>
        if (row.getString(1) != exp.toString)
          failures += s"part $i content_equals: got '${row.getString(1)}', want '$exp'"
      }
      want.get("metadata_equals").foreach { exp =>
        val gotMeta = row.getMap[String, String](2)
        exp.asInstanceOf[java.util.Map[String, Any]].asScala.foreach { case (k, v) =>
          if (!gotMeta.get(k).contains(v.toString))
            failures += s"part $i metadata_equals[$k]: got ${gotMeta.get(k)}, want '$v'"
        }
      }
      // remaining reference condition kinds (condition.go:43-73)
      want.get("content_matches").foreach { exp =>
        if (!java.util.regex.Pattern.compile(exp.toString)
            .matcher(row.getString(1)).find())
          failures += s"part $i content_matches: '${row.getString(1)}' !~ /$exp/"
      }
      want.get("json_contains").foreach { exp =>
        val wantTree = json.valueToTree[com.fasterxml.jackson.databind.JsonNode](exp)
        val gotTree = try json.readTree(row.getString(0)) catch { case _: Exception => null }
        def contains(g: com.fasterxml.jackson.databind.JsonNode,
            w: com.fasterxml.jackson.databind.JsonNode): Boolean =
          if (w == null || g == null) false
          else if (w.isObject) {
            val it = w.fields()
            var ok = g.isObject
            while (ok && it.hasNext) {
              val e = it.next()
              ok = g.has(e.getKey) && contains(g.get(e.getKey), e.getValue)
            }
            ok
          } else if (w.isArray)
            g.isArray && w.size == g.size &&
              (0 until w.size).forall(j => contains(g.get(j), w.get(j)))
          else g == w
        if (!contains(gotTree, wantTree))
          failures += s"part $i json_contains: got ${row.getString(0)}, want subset $wantTree"
      }
      want.get("bloblang").foreach { exp =>
        // predicate mapping evaluated against the output part; must be true
        val ok = try {
          val dfOne = out.orderBy(col(Envelope.Seq)).limit(i + 1)
            .orderBy(col(Envelope.Seq).desc).limit(1)
          val pred = graft.blobl.Mapping.envelopeExpr(dfOne, exp.toString)
          dfOne.select(pred.cast(org.apache.spark.sql.types.BooleanType))
            .head().getBoolean(0)
        } catch { case _: Exception => false }
        if (!ok) failures += s"part $i bloblang: predicate '$exp' not true"
      }
    }
    CaseResult(name, failures.toList)
  }

  /** Envelope from literal content strings: JSON contents parse into a doc
    * struct (shared inferred schema), non-JSON stays raw. */
  private def buildEnvelope(spark: SparkSession, contents: List[String],
      metas: List[Map[String, String]]): DataFrame = {
    import spark.implicits._
    val allJson = contents.forall { s =>
      try { json.readTree(s); true } catch { case _: Exception => false }
    }
    val rows = contents.zip(metas).zipWithIndex.map { case ((s, m), i) => (s, m, i.toLong) }
    val base = rows.toDF("content", "meta", "seq")
    val withDoc = if (allJson) {
      val inferred = spark.read.json(spark.createDataset(contents)).schema
      // spark.read.json flattens a top-level JSON array into records, so
      // re-wrap: array documents have ArrayType(inferred element) schema
      val schema =
        if (contents.forall(_.trim.startsWith("[")))
          org.apache.spark.sql.types.ArrayType(inferred)
        else inferred
      base.withColumn("doc", from_json(col("content"), schema))
    } else base.withColumn("doc", col("content"))
    withDoc.select(
      col("content").cast(BinaryType).as(Envelope.Content),
      col("doc").as(Envelope.Doc),
      col("meta").cast(MapType(StringType, StringType)).as(Envelope.Meta),
      lit(null).cast(StringType).as(Envelope.Error),
      lit(0L).as(Envelope.BatchId),
      col("seq").as(Envelope.Seq))
  }
}
