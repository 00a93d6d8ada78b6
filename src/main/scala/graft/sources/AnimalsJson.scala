package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.util.Try

/** Tolerant JSON codec for the animals API payloads — the reference degrades
  * non-JSON bodies to empty records rather than failing
  * (`/root/reference/src/animals_etl/api.py:25-46`, S4 in SURVEY.md §2.1).
  */
object AnimalsJson {
  private val mapper = new ObjectMapper()

  final case class ListedAnimal(id: Long, name: String, bornAt: Option[Long])
  final case class AnimalPage(page: Int, totalPages: Int, items: Seq[ListedAnimal])
  final case class AnimalDetailRec(id: Long, name: String, friends: Option[String], bornAt: Option[Long])

  /** Reference parity for `int(item["id"])` (pipeline.py:15): Python's
    * `int()` accepts numbers and numeric strings but RAISES on anything
    * else, whereas Jackson's `asLong()` silently defaults non-numeric
    * nodes to 0 — two docs with bad ids would then collide on id 0. */
  private def strictLong(v: JsonNode, what: => String): Long =
    if (v.isNumber && v.canConvertToLong) v.asLong()
    else if (v.isTextual)
      try v.asText().trim.toLong
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(s"$what is not an integer: ${v.asText()}")
      }
    else throw new IllegalArgumentException(s"$what is not an integer: $v")

  private def optLong(n: JsonNode, field: String): Option[Long] = {
    val v = n.get(field)
    if (v == null || v.isNull) None else Some(v.asLong())
  }

  private def optText(n: JsonNode, field: String): Option[String] = {
    val v = n.get(field)
    if (v == null || v.isNull) None else Some(v.asText())
  }

  /** Page envelope; unparseable body → empty single page (api.py:27-31).
    *
    * The tolerance is scoped to the JSON PARSE, exactly like the
    * reference's `resp.json()` — a page that parses but carries an
    * id-less item fails LOUDLY (reference parity: `int(item["id"])`
    * raises KeyError, pipeline.py:15). A whole-body Try here would
    * let one malformed item silently discard every valid sibling AND
    * reset the envelope to page=1/total_pages=1, which the paginated
    * scan uses to PLAN partitions — a 40-page corpus would quietly
    * plan as one page. */
  def parsePage(body: String): AnimalPage = {
    val parsed = Try(mapper.readTree(body)).toOption.filter(r => r != null && !r.isNull)
    parsed match {
      case None => AnimalPage(1, 1, Seq.empty)
      case Some(root) =>
        val items = Option(root.get("items")).filter(_.isArray).map { arr =>
          (0 until arr.size()).map { i =>
            val it = arr.get(i)
            val id = Option(it.get("id")).filterNot(_.isNull).getOrElse {
              throw new IllegalArgumentException(
                s"animals page item $i has no 'id' (page=${optText(root, "page").orNull})")
            }
            ListedAnimal(
              strictLong(id, s"animals page item $i 'id'"),
              optText(it, "name").getOrElse(""),
              optLong(it, "born_at"))
          }.toSeq
        }.getOrElse(Seq.empty)
        AnimalPage(
          Option(root.get("page")).map(_.asInt()).getOrElse(1),
          Option(root.get("total_pages")).map(_.asInt()).getOrElse(1),
          items
        )
    }
  }

  /** Detail record; unparseable body → None (api.py:36-39 yields {}). */
  def parseDetail(body: String): Option[AnimalDetailRec] =
    Try {
      val root = mapper.readTree(body)
      AnimalDetailRec(
        strictLong(root.get("id"), "animal detail 'id'"),
        optText(root, "name").getOrElse(""),
        optText(root, "friends"),
        optLong(root, "born_at")
      )
    }.toOption

  /** 422 `detail` extraction (http_client.py:109-117). */
  def errorDetail(body: String): String =
    Try(Option(mapper.readTree(body).get("detail")).map(_.toString).getOrElse(body)).getOrElse(body)

  def toJsonBatch(records: Seq[String]): String = records.mkString("[", ",", "]")
}
