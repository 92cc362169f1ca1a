package graft

import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, MapType, StructType}

/** Output-schema discipline over the WHOLE driver registry: no
  * `SparkEntry.queries` entry may surface a DecimalType final column.
  *
  * Why: the driver's correctness compare stringify-hashes values after
  * a column-name sort, and DECIMAL is the one dtype class the two
  * engines render differently even when values are byte-identical
  * (DuckDB HUGEINT/DECIMAL → pandas object/float vs Spark's int64/
  * decimal — the r9 pagerank/dataset_card and r12
  * sample_balanced_classes hash-FAILs, values proven equal both
  * times). Decimals are fine as INTERNAL carriers (exact fixed-point
  * sufficient statistics); they must be cast to BIGINT/DOUBLE before
  * the final projection. This spec makes the discipline structural:
  * schema derivation only (plan analysis, no job), so drift fails in
  * one `sbt test` instead of as a red driver row a round later.
  */
class FinalsDisciplineSpec extends SparkSpec {

  private val root = sys.env.get("SPARK_GRAFT_TESTDATA")
    .orElse(sys.props.get("graft.testdata"))
    .getOrElse("/root/testdata")
  private val dir = Seq(s"$root/sf0.001", s"$root/sf0.01")
    .find(d => new java.io.File(s"$d/region.parquet").exists())

  private def hasDecimal(dt: DataType): Boolean = dt match {
    case _: DecimalType => true
    case a: ArrayType => hasDecimal(a.elementType)
    case m: MapType => hasDecimal(m.keyType) || hasDecimal(m.valueType)
    case s: StructType => s.fields.exists(f => hasDecimal(f.dataType))
    case _ => false
  }

  test("no registry entry surfaces a DecimalType final column") {
    assume(dir.isDefined, "no driver testdata dir on this machine")
    val d = dir.get
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val schema =
          try q(spark, d).schema
          catch { case e: Exception =>
            fail(s"$name: schema derivation failed: ${e.getMessage}")
          }
        schema.fields.filter(f => hasDecimal(f.dataType))
          .map(f => s"$name.${f.name}: ${f.dataType.sql}")
    }
    assert(offenders.isEmpty,
      "DecimalType final column(s) — cast to BIGINT/DOUBLE before the " +
        "final projection (driver format-hash hazard):\n  " +
        offenders.mkString("\n  "))
  }
}
