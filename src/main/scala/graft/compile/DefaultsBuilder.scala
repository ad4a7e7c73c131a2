package graft.compile

import graft.json._
import graft.schema.SchemaResolver
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The `validate.build(initial)` analog (/root/reference/lib/jsen.js:737-812,
  * README.md:433-560): merge schema `default` values over a document. On a
  * table this is a pure projection — `coalesce(col, default)` per declared
  * property, recursing into struct properties, with `allOf` branches merged
  * in order; `additionalProperties: false` build mode drops undeclared
  * columns (jsen.js:764-782).
  */
object DefaultsBuilder {

  /** Apply spec defaults to a DataFrame's columns. */
  def build(df: DataFrame, specJson: String,
            keepAdditional: Boolean = true): DataFrame = {
    val spec = Json.parse(specJson)
    val resolver = new SchemaResolver(spec)
    val schema = resolver.resolve(spec) match {
      case o: JObj => o
      case _ => return df
    }
    val declared = collectProperties(schema, resolver)
    val outCols: Seq[Column] = df.schema.fields.toSeq.flatMap { f =>
      declared.get(f.name) match {
        case Some(sub) =>
          Some(buildValue(col(f.name), f.dataType, sub, resolver).as(f.name))
        case None =>
          if (keepAdditional) Some(col(f.name)) else None
      }
    }
    df.select(outCols: _*)
  }

  /** properties maps of the node and its allOf branches, merged in order —
    * later branches do not override earlier keys (PropertyMarker dedup,
    * jsen.js:690-735). */
  private def collectProperties(schema: JObj, resolver: SchemaResolver): Map[String, JObj] = {
    val own: Vector[(String, JObj)] =
      schema.obj("properties").map(_.fields.collect {
        case (k, o: JObj) => k -> (resolver.resolve(o) match {
          case r: JObj => r
          case _ => o
        })
      }).getOrElse(Vector.empty)
    val fromAllOf = schema.arr("allOf").getOrElse(Vector.empty).flatMap {
      case o: JObj => collectProperties(resolver.resolve(o) match {
        case r: JObj => r
        case _ => o
      }, resolver).toVector
      case _ => Vector.empty
    }
    (fromAllOf ++ own).toMap // own wins over allOf, first-seen per source
  }

  private def buildValue(c: Column, dt: DataType, schema: JObj,
                         resolver: SchemaResolver): Column = {
    val withDefault = schema.get("default") match {
      case Some(d) => jsonLiteral(d, dt).map(l => coalesce(c, l)).getOrElse(c)
      case None => c
    }
    dt match {
      case st: StructType =>
        val props = collectProperties(schema, resolver)
        if (props.isEmpty) withDefault
        else {
          val rebuilt = struct(st.fields.toSeq.map { f =>
            props.get(f.name) match {
              case Some(sub) => buildValue(withDefault.getField(f.name), f.dataType, sub, resolver).as(f.name)
              case None => withDefault.getField(f.name).as(f.name)
            }
          }: _*)
        when(withDefault.isNull, withDefault).otherwise(rebuilt)
        }
      case ArrayType(et, _) =>
        schema.get("items") match {
          case Some(sub: JObj) =>
            transform(withDefault, x => buildValue(x, et, sub, resolver))
          case _ => withDefault
        }
      case _ => withDefault
    }
  }

  /** Spec literal → Column literal of the target type, when representable. */
  def jsonLiteral(v: JValue, dt: DataType): Option[Column] = (v, dt) match {
    case (JNull, _) => Some(lit(null).cast(dt))
    case (JBool(b), BooleanType) => Some(lit(b))
    case (JNum(n), t: NumericType) => Some(lit(n.toDouble).cast(t))
    case (JStr(s), StringType) => Some(lit(s))
    case (JArr(items), ArrayType(et, _)) =>
      val lits = items.map(jsonLiteral(_, et))
      if (lits.forall(_.isDefined)) Some(array(lits.flatten: _*)) else None
    case (o: JObj, st: StructType) =>
      val fields = st.fields.toSeq.map { f =>
        o.get(f.name).flatMap(jsonLiteral(_, f.dataType))
          .getOrElse(lit(null).cast(f.dataType)).as(f.name)
      }
      Some(struct(fields: _*))
    case _ => None
  }
}
