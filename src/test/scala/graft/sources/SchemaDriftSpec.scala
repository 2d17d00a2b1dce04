package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Canary for driver-side testdata regeneration: if a table's on-disk
  * schema drifts from the declared one (column renames, type changes —
  * e.g. the round-10 events `ts` nanos→micros flip), THIS spec names the
  * table and column instead of the drift surfacing as a pile of oracle
  * value mismatches. Declared-schema reads don't catch every drift:
  * parquet happily serves an int64 TIMESTAMP under a requested LongType.
  */
class SchemaDriftSpec extends SparkSpec {

  /** Types that parquet will silently coerce between under a declared
    * read schema, making results wrong instead of failing analysis.
    */
  private def compatible(declared: DataType, onDisk: DataType): Boolean =
    (declared, onDisk) match {
      case (a, b) if a == b => true
      // events ts: either encoding is fine — Tables.load probes and
      // normalizes (TablesTsUnitSpec pins the equivalence)
      case (LongType, TimestampType | TimestampNTZType) => true
      case (TimestampType, TimestampNTZType) => true
      case _ => false
    }

  test("every canonical table's footer schema matches the declared one") {
    val problems = Tables.all.toSeq.sortBy(_._1).flatMap { case (name, declared) =>
      val onDisk = spark.read.parquet(s"$sfDir/$name.parquet").schema
      val missing = declared.fields.map(_.name).toSet -- onDisk.fields.map(_.name)
      val extra = onDisk.fields.map(_.name).toSet -- declared.fields.map(_.name)
      val typeDrift = declared.fields.flatMap { f =>
        onDisk.fields.find(_.name == f.name).collect {
          case g if !compatible(f.dataType, g.dataType) =>
            s"$name.${f.name}: declared ${f.dataType.simpleString} vs on-disk ${g.dataType.simpleString}"
        }
      }
      missing.map(c => s"$name.$c: missing on disk") ++
        extra.map(c => s"$name.$c: new on-disk column (not declared)") ++
        typeDrift
    }
    assert(problems.isEmpty,
      s"testdata schema drift detected:\n  ${problems.mkString("\n  ")}")
  }
}
