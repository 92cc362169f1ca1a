package graft.jobs

import org.json4s._
import org.json4s.jackson.JsonMethods

/** A stats request within a job (`datapump.py:378-396`):
  * Kind ∈ {descriptive, mode, <pandas offset alias>}. */
case class StatSpec(
    kind: String,
    groupBy: Seq[String] = Nil,
    dropColumns: Seq[String] = Nil)

/** The reference's job document (`datapump.py:22-53` inline JSON Schema).
  * `Truncate` and `Stats` default when absent — the reference KeyErrors on
  * legal jobs there (SURVEY §2.10 bug 2); we fix that deliberately. */
case class Job(
    inputFile: String,
    targetOrg: String,
    targetPackage: String,
    targetResource: String,
    primaryKey: Seq[String],
    dedupe: String, // "first" | "last"
    truncate: Boolean = false,
    stats: Seq[StatSpec] = Nil)

object Job {

  /** Parse + validate a job JSON document, mirroring the reference's
    * jsonschema checks (`datapump.py:402-417`): required fields, Dedupe
    * enum, Stats item shape. */
  def parse(json: String): Either[String, Job] = {
    val jv =
      try JsonMethods.parse(json)
      catch { case e: Exception => return Left(s"invalid JSON: ${e.getMessage}") }

    def str(field: String): Either[String, String] = jv \ field match {
      case JString(s) if s.nonEmpty => Right(s)
      case JNothing => Left(s"missing required field: $field")
      case other => Left(s"field $field must be a non-empty string, got $other")
    }

    for {
      input <- str("InputFile")
      org <- str("TargetOrg")
      pkg <- str("TargetPackage")
      res <- str("TargetResource")
      pkRaw <- str("PrimaryKey")
      dedupe <- str("Dedupe").flatMap {
        case d @ ("first" | "last") => Right(d)
        case d => Left(s"Dedupe must be 'first' or 'last', got '$d'")
      }
      truncate <- jv \ "Truncate" match {
        case JBool(b) => Right(b)
        case JNothing => Right(false)
        case other => Left(s"Truncate must be boolean, got $other")
      }
      stats <- jv \ "Stats" match {
        case JNothing => Right(Nil)
        case JArray(items) => parseStats(items)
        case other => Left(s"Stats must be an array, got $other")
      }
    } yield Job(input, org, pkg, res,
      pkRaw.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      dedupe, truncate, stats)
  }

  private def parseStats(items: List[JValue]): Either[String, Seq[StatSpec]] = {
    val parsed = items.map { item =>
      item \ "Kind" match {
        case JString(k) if k.nonEmpty =>
          val gb = item \ "GroupBy" match {
            case JString(s) => s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
            case _ => Nil
          }
          val dc = item \ "DropColumns" match {
            case JString(s) => s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
            case _ => Nil
          }
          Right(StatSpec(k, gb, dc))
        case _ => Left("Stats item missing Kind")
      }
    }
    parsed.collectFirst { case Left(e) => Left(e) }
      .getOrElse(Right(parsed.collect { case Right(s) => s }))
  }
}
