package graft.sources

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaRegistrySpec extends AnyFunSuite {
  import SchemaRegistry._

  private val v1 = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("email", StringType),
    StructField("score", IntegerType)))

  test("adding a nullable field is backward compatible") {
    val v2 = v1.add(StructField("phone", StringType, nullable = true))
    assert(isBackwardCompatible(v1, v2))
  }

  test("adding a required field is rejected") {
    val bad = v1.add(StructField("must", StringType, nullable = false))
    val inc = backwardIncompatibilities(v1, bad)
    assert(inc.map(_.field) === Seq("must"))
  }

  test("safe type widening allowed, narrowing rejected") {
    val widened = StructType(v1.fields.map {
      case f if f.name == "score" => f.copy(dataType = LongType)
      case f => f
    })
    assert(isBackwardCompatible(v1, widened))
    val narrowed = StructType(v1.fields.map {
      case f if f.name == "id" => f.copy(dataType = IntegerType)
      case f => f
    })
    assert(!isBackwardCompatible(v1, narrowed))
  }

  test("nullable -> required tightening of an existing field is rejected") {
    val tightened = StructType(v1.fields.map {
      case f if f.name == "email" => f.copy(nullable = false)
      case f => f
    })
    val inc = backwardIncompatibilities(v1, tightened)
    assert(inc.map(_.field) === Seq("email"))
  }

  test("removing a field is allowed (new reader ignores old column)") {
    val v2 = StructType(v1.fields.filterNot(_.name == "email"))
    assert(isBackwardCompatible(v1, v2))
  }

  test("registry enforces compatibility and versions linearly") {
    val r = new Registry
    assert(r.register("users", v1) === Right(1))
    val v2 = v1.add(StructField("phone", StringType))
    assert(r.register("users", v2) === Right(2))
    val bad = v2.add(StructField("strict", StringType, nullable = false))
    assert(r.register("users", bad).isLeft)
    assert(r.latest("users").map(_._1) === Some(2))
    assert(r.schemaAt("users", 1) === Some(v1))
  }

  test("the canonical table schemas register cleanly") {
    val r = new Registry
    Tables.all.foreach { case (name, schema) =>
      assert(r.register(name, schema).isRight, s"$name failed to register")
    }
  }
}
