package graft.ingest

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

/** S5 — streaming scan of iAHx `<add><doc><field name=…>` XML exports
  * (reference tmgl_metrics/dag_01_full_update.py:96-178, which uses lxml
  * iterparse). Spark shape: `binaryFiles` gives one stream per file split
  * across the cluster; each is parsed with StAX (no DOM, constant memory
  * per doc), repeated field names fold to arrays, and the optional
  * `instance` gate + first-seen-id dedup mirror the reference
  * (`:133-134`, `:110,148-158`).
  *
  * Scale note: parallelism is per-file (XML is not splittable); a 100 TB
  * corpus arrives as many files, which is exactly this layout. The parse
  * is a true pull iterator — one doc in memory at a time, so a multi-GB
  * export streams through an executor instead of materializing in it.
  */
object XmlSource {

  /** One parsed `<doc>`: boost attribute + field-name → values. */
  case class XmlDoc(id: String, boost: String, fields: Map[String, Seq[String]])

  /** Pull-parse: the StAX cursor advances only when the iterator is
    * consumed; `in` (and the reader) close at exhaustion. */
  private[graft] def parseStream(in: java.io.InputStream): Iterator[XmlDoc] =
    new Iterator[XmlDoc] {
      private val f = XMLInputFactory.newInstance()
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
      f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
      private val r = f.createXMLStreamReader(in, "UTF-8")
      private var nextDoc: XmlDoc = null
      private var closed = false

      private def advance(): Unit = try {
        advance0()
      } catch {
        // malformed XML mid-stream: release the reader and the file
        // handle before surfacing the parse error (without this the
        // stream leaks for the task's lifetime)
        case e: Throwable =>
          if (!closed) { closed = true; r.close(); in.close() }
          throw e
      }

      private def advance0(): Unit = {
        var fields: scala.collection.mutable.LinkedHashMap[String, Vector[String]] = null
        var boost = ""
        while (nextDoc == null && r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "doc" =>
                  fields = scala.collection.mutable.LinkedHashMap()
                  boost = Option(r.getAttributeValue(null, "boost")).getOrElse("")
                case "field" if fields != null =>
                  val name = Option(r.getAttributeValue(null, "name")).getOrElse("")
                  val value = r.getElementText
                  fields(name) = fields.getOrElse(name, Vector()) :+ value
                case _ =>
              }
            case XMLStreamConstants.END_ELEMENT if r.getLocalName == "doc" =>
              val id = fields.get("id").flatMap(_.headOption).getOrElse("")
              nextDoc = XmlDoc(id, boost, fields.toMap)
              fields = null
            case _ =>
          }
        }
        if (nextDoc == null && !closed) { closed = true; r.close(); in.close() }
      }

      override def hasNext: Boolean = {
        if (nextDoc == null && !closed) advance()
        nextDoc != null
      }
      override def next(): XmlDoc = {
        if (!hasNext) throw new NoSuchElementException("end of XML stream")
        val d = nextDoc; nextDoc = null; d
      }
    }

  /** Read all XML files under `path` into a Dataset of parsed docs.
    * `instanceFilter` keeps only docs whose `instance` field contains the
    * value (the reference's `instance == "tmgl"` gate); first-seen-id
    * dedup via dropDuplicates. */
  def read(spark: SparkSession, path: String,
      instanceFilter: Option[String] = None): Dataset[XmlDoc] = {
    implicit val enc = Encoders.product[XmlDoc]
    val rdd = spark.sparkContext.binaryFiles(path)
      .flatMap { case (_, pds) =>
        val in = pds.open()
        // close on task end too, in case a limit stops consumption early
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try in.close() catch { case _: java.io.IOException => () }))
        parseStream(in)
      }
    val ds = spark.createDataset(rdd)
    val filtered = instanceFilter match {
      case Some(v) => ds.filter(d => d.fields.get("instance").exists(_.contains(v)))
      case None => ds
    }
    filtered.dropDuplicates("id")
  }
}
