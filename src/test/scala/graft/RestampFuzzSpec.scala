package org.apache.spark.sql.execution.datasources.parquet

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** Property fuzz for GraftParquetFileFormat.restamp — the kernel that
  * re-attaches `parquet.field.id` to the schema SchemaPruning
  * rebuilds. Random id-stamped nested schemas are pruned randomly
  * (drop fields, recurse into structs — exactly pruning's shape:
  * narrower, names preserved, metadata dropped); restamp must give
  * every surviving field its original id, preserve types and order,
  * and leave unknown (synthetic) fields untouched. */
class RestampFuzzSpec extends AnyFunSuite {
  private val FieldId = "parquet.field.id"

  private def randType(rnd: scala.util.Random, depth: Int,
      nextId: () => Int): DataType =
    if (depth >= 2 || rnd.nextInt(3) > 0)
      Seq(LongType, IntegerType, StringType, DoubleType, BooleanType)(
        rnd.nextInt(5))
    else rnd.nextInt(3) match {
      case 0 => randStruct(rnd, depth + 1, nextId, 1 + rnd.nextInt(3))
      case 1 => ArrayType(randType(rnd, depth + 1, nextId))
      case _ => MapType(StringType, randType(rnd, depth + 1, nextId))
    }

  private def randStruct(rnd: scala.util.Random, depth: Int,
      nextId: () => Int, n: Int): StructType =
    StructType((0 until n).map { i =>
      val id = nextId()
      StructField(s"c${depth}_$i", randType(rnd, depth, nextId),
        nullable = true,
        new MetadataBuilder().putLong(FieldId, id.toLong).build())
    })

  /** Pruning's shape: keep a nonempty subset of fields (order kept),
    * recurse into kept structs, STRIP all metadata. */
  private def prune(rnd: scala.util.Random, s: StructType): StructType = {
    val kept = s.fields.filter(_ => rnd.nextInt(4) > 0) match {
      case Array() => Array(s.fields(rnd.nextInt(s.fields.length)))
      case ks => ks
    }
    StructType(kept.map { f =>
      StructField(f.name, pruneType(rnd, f.dataType), f.nullable,
        Metadata.empty)
    })
  }

  private def pruneType(rnd: scala.util.Random, t: DataType): DataType =
    t match {
      case st: StructType => prune(rnd, st)
      case at: ArrayType => at.copy(elementType = pruneType(rnd, at.elementType))
      case mt: MapType => mt.copy(valueType = pruneType(rnd, mt.valueType))
      case other => other
    }

  private def assertStamped(stamped: StructType, pruned: StructType,
      original: StructType, seed: Long): Unit = {
    assert(stamped.fields.map(_.name).toSeq
      === pruned.fields.map(_.name).toSeq,
      s"seed=$seed: restamp must not add/drop/reorder fields")
    stamped.fields.foreach { f =>
      val orig = original.fields.find(_.name == f.name)
      orig match {
        case Some(o) =>
          assert(f.metadata.contains(FieldId) &&
            f.metadata.getLong(FieldId) == o.metadata.getLong(FieldId),
            s"seed=$seed: field ${f.name} lost/changed its id")
          (f.dataType, o.dataType) match {
            case (sp: StructType, so: StructType) =>
              val pr = pruned.fields.find(_.name == f.name).get
                .dataType.asInstanceOf[StructType]
              assertStamped(sp, pr, so, seed)
            case (ap: ArrayType, ao: ArrayType) =>
              (ap.elementType, ao.elementType) match {
                case (sp: StructType, so: StructType) =>
                  val pr = pruned.fields.find(_.name == f.name).get
                    .dataType.asInstanceOf[ArrayType]
                    .elementType.asInstanceOf[StructType]
                  assertStamped(sp, pr, so, seed)
                case _ =>
              }
            case (mp: MapType, mo: MapType) =>
              (mp.valueType, mo.valueType) match {
                case (sp: StructType, so: StructType) =>
                  val pr = pruned.fields.find(_.name == f.name).get
                    .dataType.asInstanceOf[MapType]
                    .valueType.asInstanceOf[StructType]
                  assertStamped(sp, pr, so, seed)
                case _ =>
              }
            case _ =>
              assert(f.dataType === o.dataType,
                s"seed=$seed: scalar type changed for ${f.name}")
          }
        case None =>
          fail(s"seed=$seed: restamp invented field ${f.name}")
      }
    }
  }

  test("restamp recovers every pruned field's id across random nested schemas") {
    for (seed <- 1L to 200L) {
      val rnd = new scala.util.Random(seed)
      var id = 0
      val nextId = () => { id += 1; id }
      val original = randStruct(rnd, 0, nextId, 2 + rnd.nextInt(4))
      val pruned = prune(rnd, original)
      val stamped = GraftParquetFileFormat.restamp(pruned, original)
      assertStamped(stamped, pruned, original, seed)
    }
  }

  test("synthetic fields the original does not know pass through untouched") {
    val original = StructType(Seq(StructField("k", LongType, nullable = true,
      new MetadataBuilder().putLong(FieldId, 1L).build())))
    val pruned = StructType(Seq(
      StructField("k", LongType),
      StructField("_metadata_row_index", LongType)))
    val stamped = GraftParquetFileFormat.restamp(pruned, original)
    assert(stamped("k").metadata.getLong(FieldId) === 1L)
    assert(!stamped("_metadata_row_index").metadata.contains(FieldId))
  }

  test("a pruned field that already carries an id keeps its own") {
    val original = StructType(Seq(StructField("k", LongType, nullable = true,
      new MetadataBuilder().putLong(FieldId, 1L).build())))
    val pruned = StructType(Seq(StructField("k", LongType, nullable = true,
      new MetadataBuilder().putLong(FieldId, 9L).build())))
    val stamped = GraftParquetFileFormat.restamp(pruned, original)
    assert(stamped("k").metadata.getLong(FieldId) === 9L,
      "an id the rebuilt schema still carries must win (never overwrite)")
  }
}
