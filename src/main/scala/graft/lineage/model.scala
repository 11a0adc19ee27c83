package graft.lineage

import org.apache.spark.sql.SparkSession

/** Column-lineage edge, mirroring the reference's ColLine
  * (/root/reference/README.md:802-803, fields visible at :1215):
  * `toTable`/`toName` come from positional destination-schema lookup
  * (:794-805, unasserted by the goldens), `toNameParse` is the parsed
  * output name (alias), `fromName` the comma-joined qualified source
  * columns, `conditionSet` the tagged `WHERE:`/`JOIN:`/`COLFUN:`
  * strings (:257,276,294).
  */
final case class ColLine(
    toTable: String,
    toName: Option[String],
    toNameParse: String,
    fromName: String,
    conditionSet: Set[String])

/** Pluggable schema lookup, mirroring `MetaDataDao.getColumnByDBAndTable`
  * (README.md:102,239,814): used for `SELECT *` expansion and
  * positional output-column naming. Backed by the session catalog in
  * production, by a stub map in tests (the goldens reference tables
  * that exist in no catalog — README.md:875-876).
  */
trait MetaStore {
  /** Columns of db.table in ordinal order; empty if unknown. */
  def columns(db: String, table: String): Seq[String]
}

object EmptyMetaStore extends MetaStore {
  def columns(db: String, table: String): Seq[String] = Nil
}

/** Test/offline stub: map of "db.table" -> ordered columns. */
final case class MapMetaStore(m: Map[String, Seq[String]]) extends MetaStore {
  def columns(db: String, table: String): Seq[String] =
    m.getOrElse(s"$db.$table", Nil)
}

/** Live catalog lookup through a SparkSession. */
final class CatalogMetaStore(spark: SparkSession) extends MetaStore {
  def columns(db: String, table: String): Seq[String] =
    try spark.table(s"$db.$table").schema.fieldNames.toSeq
    catch { case _: Exception => Nil }
}

/** Raised when `validate = true` finds a lineage column that the
  * metadata store says does not exist (≈ the reference's
  * `LineValidater`/`VolidateException`, README.md:760-763, 77). */
final class LineageValidationException(msg: String)
  extends RuntimeException(msg)
