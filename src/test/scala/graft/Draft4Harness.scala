package graft

import graft.json._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Shared machinery for table-driven draft-4 fixture sweeps
  * ([[Draft4CorpusSpec]] golden corpus, [[Draft4OfficialSpec]] official
  * suite reconstruction): JSON instance → Spark type inference, value
  * conversion, and fixture loading.
  *
  * Two documented representation limits (SURVEY.md §7.4.1):
  *  - closed StructType objects conflate a missing property with a NULL
  *    one, so suite cases that distinguish `{}` from `{"a": null}` are
  *    encoded with the ENGINE's contract (and marked with a `note`);
  *  - Spark arrays are homogeneous, so heterogeneous-array instances
  *    (`[1, "foo"]`) are unrepresentable — [[inferType]] throws
  *    [[Draft4Harness.Unrepresentable]] and runners count the skip;
  *  - whole numbers beyond Long range (the suite's optional bignum
  *    file) are likewise unrepresentable in a LongType column.
  */
trait Draft4Harness { self: SparkSpec =>

  /** Spark type inference for a JSON instance (nulls are typed by their
    * surroundings; a bare null gets StringType, which every type predicate
    * treats correctly since NULL fails all non-null type tests). */
  def inferType(v: JValue): DataType = v match {
    case JNull    => StringType
    case JBool(_) => BooleanType
    case JNum(n)  =>
      if (n.isWhole) {
        if (n.abs > BigDecimal(Long.MaxValue))
          throw Draft4Harness.Unrepresentable(s"bignum $n exceeds Long")
        LongType
      } else DoubleType
    case JStr(_)  => StringType
    case JArr(items) =>
      val ts = items.filterNot(_ == JNull).map(inferType)
      val et = ts.distinct match {
        case Seq()  => StringType
        case Seq(t) => t
        case many if many.toSet == Set(LongType, DoubleType) => DoubleType
        case many if many.forall(_.isInstanceOf[StructType]) =>
          many.map(_.asInstanceOf[StructType]).reduce(mergeStructs)
        case other =>
          throw Draft4Harness.Unrepresentable(s"heterogeneous array: $other")
      }
      ArrayType(et, containsNull = items.contains(JNull))
    case o: JObj =>
      StructType(o.fields.map { case (k, fv) =>
        StructField(k, inferType(fv), nullable = true)
      })
  }

  def mergeStructs(a: StructType, b: StructType): StructType = {
    val bOnly = b.fields.filterNot(f => a.fieldNames.contains(f.name))
    StructType(a.fields.map { f =>
      b.fields.find(_.name == f.name) match {
        case Some(bf) if bf.dataType != f.dataType =>
          (f.dataType, bf.dataType) match {
            case (LongType, DoubleType) | (DoubleType, LongType) =>
              f.copy(dataType = DoubleType)
            case (x: StructType, y: StructType) =>
              f.copy(dataType = mergeStructs(x, y))
            case _ =>
              throw Draft4Harness.Unrepresentable(s"field ${f.name} type conflict")
          }
        case _ => f
      }
    } ++ bOnly)
  }

  def toValue(v: JValue, dt: DataType): Any = (v, dt) match {
    case (JNull, _)                    => null
    case (JBool(b), _)                 => b
    case (JNum(n), LongType)           => n.toLong
    case (JNum(n), DoubleType)         => n.toDouble
    case (JStr(s), _)                  => s
    case (JArr(items), ArrayType(et, _)) => items.map(toValue(_, et))
    case (o: JObj, st: StructType) =>
      Row(st.fields.toSeq.map(f => o.get(f.name).map(toValue(_, f.dataType)).orNull): _*)
    case other => throw new IllegalArgumentException(s"unrepresentable: $other")
  }

  def loadFixture(dir: String, name: String): Vector[JObj] = {
    val url = getClass.getResource(s"/$dir/$name.json")
    assert(url != null, s"missing fixture resource $dir/$name.json")
    Json.parse(scala.io.Source.fromURL(url, "UTF-8").mkString) match {
      case JArr(groups) => groups.collect { case o: JObj => o }
      case _ => fail(s"fixture $dir/$name must be a JSON array of groups")
    }
  }
}

object Draft4Harness {
  /** A JSON instance the engine's typed data model cannot carry. */
  final case class Unrepresentable(reason: String)
    extends IllegalArgumentException(reason)
}
