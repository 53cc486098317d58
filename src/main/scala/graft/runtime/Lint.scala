package graft.runtime

import scala.jdk.CollectionConverters._
import org.yaml.snakeyaml.Yaml

/** Config linting (`benthos lint`, `lib/service/lint.go`): validate a
  * pipeline YAML without running it — YAML shape, component names, and
  * every embedded Bloblang mapping/expression parse. */
object Lint {

  def lint(yamlText: String): List[String] = {
    val errors = scala.collection.mutable.ListBuffer[String]()
    val parsed = try Some(graft.runtime.Config.safeYaml.load[Any](yamlText))
    catch { case e: Exception => errors += s"yaml: ${e.getMessage}"; None }
    parsed.foreach { root =>
      try {
        val spec = Config.load(yamlText)
        // compile-time check of embedded mappings: walk processors already
        // constructed; BloblangProc mappings parse lazily, so force them
        collectMappings(root).foreach { m =>
          try { graft.blobl.Parser.parseMapping(m); () }
          catch { case e: Exception => errors += s"mapping: ${e.getMessage}" }
        }
        val _ = spec
      } catch { case e: Exception => errors += e.getMessage }
    }
    errors.toList
  }

  private def collectMappings(node: Any): List[String] = node match {
    case m: java.util.Map[_, _] =>
      m.asScala.toList.flatMap {
        case (k, v) if k.toString == "bloblang" || k.toString == "mapping" =>
          v.toString :: collectMappings(v)
        case (k, v) if k.toString == "check" || k.toString == "filter" =>
          Nil // bare expressions, validated via parseQueryString
        case (_, v) => collectMappings(v)
      }
    case l: java.util.List[_] => l.asScala.toList.flatMap(collectMappings)
    case _ => Nil
  }
}

/** `benthos blobl` analog (`lib/service/blobl/cli.go`): map JSON lines
  * from a file (or stdin via "-") with a Bloblang mapping, print results
  * as JSON lines. Usage: runMain graft.runtime.BloblCli <mapping-file> [input-file] */
object BloblCli {
  def main(args: Array[String]): Unit = {
    val mapping = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(args(0))), "UTF-8")
    val spark = graft.Sessions.get()
    import spark.implicits._
    val lines: scala.Seq[String] =
      if (args.length > 1 && args(1) != "-")
        scala.io.Source.fromFile(args(1)).getLines().toSeq
      else scala.io.Source.stdin.getLines().toSeq
    val df = spark.read.json(spark.createDataset(lines))
    val out = graft.blobl.Mapping.compile(mapping).applyPlain(df)
    out.select(org.apache.spark.sql.functions.to_json(
        org.apache.spark.sql.functions.struct(
          out.columns.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)))
      .collect().foreach(r => println(r.getString(0)))
    spark.stop()
  }
}
