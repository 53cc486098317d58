package graft.ops

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Envelope

/** `mongodb` processor (`internal/impl/mongodb/processor.go`):
  * insert-one / delete-one / delete-many / replace-one / update-one /
  * find-one against a collection, with `document_map` / `filter_map`
  * Bloblang maps building the operation's document and filter from each
  * message (processor.go:312-341).
  *
  * Transport is abstracted behind [[MongoClientFactory]] (no egress in
  * the image): one collection client per partition. [[FakeMongoFactory]]
  * is the in-process stand-in — a JVM-global document store per URL with
  * top-level-equality filter matching and `$set`/`$inc` update operators
  * (the subset the reference examples exercise).
  */
trait MongoCollectionClient extends AutoCloseable {
  def insertOne(docJson: String): Unit
  /** Returns the number of documents removed (0 or 1). */
  def deleteOne(filterJson: String): Long
  def deleteMany(filterJson: String): Long
  /** Returns matched count (0 or 1). */
  def replaceOne(filterJson: String, docJson: String): Long
  def updateOne(filterJson: String, updateJson: String): Long
  def findOne(filterJson: String): Option[String]
  override def close(): Unit = ()
}

trait MongoClientFactory extends Serializable {
  def open(database: String, collection: String): MongoCollectionClient
}

object FakeMongoServer {
  type Coll = java.util.concurrent.ConcurrentLinkedQueue[String]
  private val servers =
    scala.collection.concurrent.TrieMap[String, Coll]()
  def coll(url: String, db: String, c: String): Coll =
    servers.getOrElseUpdate(s"$url/$db/$c", new Coll)
  def reset(url: String, db: String, c: String): Unit =
    servers.remove(s"$url/$db/$c")
}

final case class FakeMongoFactory(url: String) extends MongoClientFactory {
  def open(database: String, collection: String): MongoCollectionClient =
    new MongoCollectionClient {
      private val docs = FakeMongoServer.coll(url, database, collection)
      private val mapper = new ObjectMapper()

      private def matches(docJson: String, filter: JsonNode): Boolean = {
        val d = mapper.readTree(docJson)
        val it = filter.fields()
        var ok = true
        while (ok && it.hasNext) {
          val e = it.next()
          ok = d.has(e.getKey) && d.get(e.getKey) == e.getValue
        }
        ok
      }

      def insertOne(docJson: String): Unit =
        docs.add(mapper.readTree(docJson).toString) // normalize via parse

      private def removeMatching(filterJson: String, max: Int): Long = {
        val f = mapper.readTree(filterJson)
        var removed = 0L
        val it = docs.iterator()
        while (it.hasNext && removed < max) {
          if (matches(it.next(), f)) { it.remove(); removed += 1 }
        }
        removed
      }
      def deleteOne(filterJson: String): Long = removeMatching(filterJson, 1)
      def deleteMany(filterJson: String): Long =
        removeMatching(filterJson, Int.MaxValue)

      def replaceOne(filterJson: String, docJson: String): Long =
        docs.synchronized {
          if (removeMatching(filterJson, 1) == 1) { insertOne(docJson); 1L }
          else 0L
        }

      def updateOne(filterJson: String, updateJson: String): Long =
        docs.synchronized {
          val f = mapper.readTree(filterJson)
          val u = mapper.readTree(updateJson)
          val it = docs.iterator()
          while (it.hasNext) {
            val cur = it.next()
            if (matches(cur, f)) {
              val doc = mapper.readTree(cur).asInstanceOf[ObjectNode]
              Option(u.get("$set")).foreach { s =>
                s.fields().forEachRemaining(e => doc.set[JsonNode](e.getKey, e.getValue))
              }
              Option(u.get("$inc")).foreach { s =>
                s.fields().forEachRemaining { e =>
                  val prev = Option(doc.get(e.getKey)).map(_.asLong(0L)).getOrElse(0L)
                  doc.put(e.getKey, prev + e.getValue.asLong(0L))
                }
              }
              it.remove()
              docs.add(doc.toString)
              return 1L
            }
          }
          0L
        }

      def findOne(filterJson: String): Option[String] = {
        val f = mapper.readTree(filterJson)
        val it = docs.iterator()
        while (it.hasNext) {
          val cur = it.next()
          if (matches(cur, f)) return Some(cur)
        }
        None
      }
    }
}

/** The `mongodb` processor. `documentMap`/`filterMap` are Bloblang
  * MAPPINGS (root assignments) evaluated against the envelope —
  * compiled once to Catalyst columns, serialized to JSON per row, and
  * executed one client per partition. find-one replaces content with
  * the found document (missing → error flag); write operations pass the
  * message through (zero-match replace/update/delete-one → error flag,
  * mirroring the reference's part-level failure marking). */
final case class MongoProc(factory: MongoClientFactory, database: String,
    collection: String, operation: String,
    documentMap: String = "", filterMap: String = "") extends Processor {

  private val needsDoc =
    scala.Seq("insert-one", "replace-one", "update-one").contains(operation)
  private val needsFilter = operation != "insert-one"
  require(scala.Seq("insert-one", "delete-one", "delete-many", "replace-one",
    "update-one", "find-one").contains(operation),
    s"mongodb: unknown operation $operation")
  require(!needsDoc || documentMap.nonEmpty,
    s"mongodb: document_map required for $operation")
  require(!needsFilter || filterMap.nonEmpty,
    s"mongodb: filter_map required for $operation")

  private def mapJson(df: DataFrame, src: String): org.apache.spark.sql.Column = {
    val prog = graft.blobl.Parser.parseMapping(src)
    val tc = graft.blobl.Mapping.compileMapValue(
      prog.stmts, graft.blobl.Mapping.envelopeCtx(df))
    to_json(tc.col)
  }

  def apply(df: DataFrame): DataFrame = {
    var staged = df
    staged = staged.withColumn("_m_doc",
      if (needsDoc) mapJson(df, documentMap) else lit(null).cast(StringType))
    staged = staged.withColumn("_m_filter",
      if (needsFilter) mapJson(df, filterMap) else lit(null).cast(StringType))
    val schema = staged.schema
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val dIdx = schema.fieldIndex("_m_doc")
    val fIdx = schema.fieldIndex("_m_filter")
    val cIdx = schema.fieldIndex(Envelope.Content)
    val eIdx = schema.fieldIndex(Envelope.Error)
    val (fac, dbName, collName, op) = (factory, database, collection, operation)
    staged.mapPartitions { rows =>
      val client = fac.open(dbName, collName)
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => client.close()))
      rows.map { r =>
        val vals = r.toSeq.toArray
        val doc = if (r.isNullAt(dIdx)) null else r.getString(dIdx)
        val filter = if (r.isNullAt(fIdx)) null else r.getString(fIdx)
        try op match {
          case "insert-one" => client.insertOne(doc)
          case "delete-one" =>
            if (client.deleteOne(filter) == 0)
              vals(eIdx) = "mongodb delete-one: no document matched"
          case "delete-many" => client.deleteMany(filter)
          case "replace-one" =>
            if (client.replaceOne(filter, doc) == 0)
              vals(eIdx) = "mongodb replace-one: no document matched"
          case "update-one" =>
            if (client.updateOne(filter, doc) == 0)
              vals(eIdx) = "mongodb update-one: no document matched"
          case "find-one" => client.findOne(filter) match {
            case Some(found) => vals(cIdx) = found.getBytes("UTF-8")
            case None => vals(eIdx) = "mongodb find-one: no document matched"
          }
        } catch {
          case e: Exception => vals(eIdx) = s"mongodb $op: ${e.getMessage}"
        }
        org.apache.spark.sql.Row.fromSeq(vals.toIndexedSeq)
      }
    }(enc).drop("_m_doc", "_m_filter")
  }
}
