package graft.sources

import org.apache.spark.sql.types._

/** Versioned schema registry with BACKWARD-compatibility validation —
  * the engine's equivalent of the reference's Confluent Schema Registry
  * usage (`users-debezium-connector.json:18-25`; BACKWARD compat
  * `.kiro/specs/data-ingestion-pipeline/design.md:358`; evolution
  * round-trip `task9-validate-cdc.sh:295-420`).
  *
  * BACKWARD compatibility: a reader using the NEW schema must be able to
  * read data written with the OLD schema. Concretely:
  *  - adding a field requires it to be nullable (the old data has no
  *    value for it);
  *  - removing a field is allowed (the new reader ignores it);
  *  - changing a field's type is allowed only for safe widenings
  *    (int→long, float→double) — Parquet/Spark read the old physical
  *    type into the wider logical type.
  */
object SchemaRegistry {

  final case class Incompatibility(field: String, reason: String)

  private val safeWidenings: Set[(DataType, DataType)] = Set(
    (IntegerType, LongType), (FloatType, DoubleType), (IntegerType, DoubleType))

  /** Check that `next` can read data written as `old` (BACKWARD). */
  def backwardIncompatibilities(old: StructType, next: StructType): Seq[Incompatibility] = {
    val oldFields = old.fields.map(f => f.name -> f).toMap
    next.fields.toSeq.flatMap { nf =>
      oldFields.get(nf.name) match {
        case None if !nf.nullable =>
          Some(Incompatibility(nf.name,
            "added field must be nullable to read old data"))
        case Some(of) if of.dataType != nf.dataType &&
            !safeWidenings((of.dataType, nf.dataType)) =>
          Some(Incompatibility(nf.name,
            s"type change ${of.dataType.simpleString} -> ${nf.dataType.simpleString} is not a safe widening"))
        case Some(of) if of.nullable && !nf.nullable =>
          Some(Incompatibility(nf.name,
            "nullable -> required tightening cannot read old null values"))
        case _ => None
      }
    }
  }

  def isBackwardCompatible(old: StructType, next: StructType): Boolean =
    backwardIncompatibilities(old, next).isEmpty

  /** In-memory registry: register versions, enforcing compatibility with
    * the latest prior version (the registry's BACKWARD mode).
    */
  // Serializable: decode tasks capture the registry (or a snapshot of
  // it) in their schema-resolution closure, exactly like a registry
  // client's local schema cache shipping with the consumer.
  final class Registry extends Serializable {
    private var versions = Map.empty[String, Vector[StructType]]
    // Confluent-style GLOBAL schema ids (the 4-byte id in the wire
    // framing, see [[AvroBinary.frame]]): one incrementing sequence
    // across subjects.
    private var ids = Vector.empty[(String, StructType)]

    def latest(subject: String): Option[(Int, StructType)] =
      versions.get(subject).map(v => (v.length, v.last))

    def register(subject: String, schema: StructType): Either[Seq[Incompatibility], Int] =
      versions.get(subject).map(_.last) match {
        case Some(prev) =>
          val bad = backwardIncompatibilities(prev, schema)
          if (bad.nonEmpty) Left(bad)
          else {
            versions = versions.updated(subject, versions(subject) :+ schema)
            ids = ids :+ (subject -> schema)
            Right(versions(subject).length)
          }
        case None =>
          versions = versions.updated(subject, Vector(schema))
          ids = ids :+ (subject -> schema)
          Right(1)
      }

    def schemaAt(subject: String, version: Int): Option[StructType] =
      versions.get(subject).flatMap(_.lift(version - 1))

    /** Global id of a (subject, version) — what a producer embeds in the
      * wire framing.
      */
    def globalId(subject: String, version: Int): Option[Int] =
      schemaAt(subject, version).flatMap { s =>
        ids.zipWithIndex.collectFirst {
          case ((sub, sc), i) if sub == subject && (sc eq s) => i + 1
        }
      }

    /** Writer-schema lookup by global id — what a consumer calls from
      * [[AvroBinary.decode]].
      */
    def schemaById(id: Int): Option[StructType] =
      ids.lift(id - 1).map(_._2)
  }
}
