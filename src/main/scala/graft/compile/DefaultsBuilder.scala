package graft.compile

import graft.json._
import graft.schema.SchemaResolver
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The `validate.build(initial)` analog (/root/reference/lib/jsen.js:737-812,
  * README.md:433-560): merge schema `default` values over a document. On a
  * table this is a pure projection — `coalesce(col, default)` per declared
  * property, recursing into struct properties.
  *
  * Reference-exact structure (jsen.js:752-812 is an else-if chain):
  *  - a node with its own `properties` processes ONLY them — a sibling
  *    `allOf` is ignored;
  *  - a node without `properties` but with `allOf` applies branches in
  *    order (first default wins via chained coalesce) and drops an
  *    undeclared key only when MORE THAN ONE branch treats it as
  *    additional (PropertyMarker, jsen.js:690-735 — the bug-#47 rule that
  *    a key declared in one branch survives another branch's
  *    `additionalProperties: false`);
  *  - outside allOf, an undeclared key is dropped when the node says
  *    `additionalProperties: false`, or when the caller passed
  *    `Additional.Drop` and the node is silent (jsen.js:764-782);
  *  - `Additional.Always` keeps undeclared keys unconditionally, even when
  *    a node says `additionalProperties: false` — the reference's
  *    `options.additionalProperties === 'always'` mode (jsen.js:764-767,
  *    test/build.js:588-735).
  *
  * The reference's `copy` option (clone vs mutate the initial document,
  * jsen.js:1080-1086) has no analog here: DataFrames are immutable, so
  * build() always behaves like `copy: true`.
  */
object DefaultsBuilder {

  /** The reference's tri-state `options.additionalProperties`
    * (undefined / false / 'always', jsen.js:764-782). */
  sealed trait Additional
  object Additional {
    /** Option unset: follow the schema; a silent node keeps extras. */
    case object Keep extends Additional
    /** Option false: a silent node drops extras too. */
    case object Drop extends Additional
    /** Option 'always': extras survive even `additionalProperties:false`. */
    case object Always extends Additional
  }

  /** Apply spec defaults to a DataFrame's columns. */
  def build(df: DataFrame, specJson: String,
            keepAdditional: Boolean = true): DataFrame =
    build(df, specJson,
      if (keepAdditional) Additional.Keep else Additional.Drop)

  def build(df: DataFrame, specJson: String, additional: Additional): DataFrame = {
    val spec = Json.parse(specJson)
    val resolver = new SchemaResolver(spec)
    val schema = resolver.resolve(spec) match {
      case o: JObj => o
      case _ => return df
    }
    val (surviving, defaults) =
      plan(schema, resolver, additional, df.schema.fieldNames.toVector)
    val declared: Map[String, Seq[JObj]] =
      defaults.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val outCols: Seq[Column] = df.schema.fields.toSeq.flatMap { f =>
      if (!surviving.contains(f.name)) None
      else declared.get(f.name) match {
        case Some(subs) =>
          Some(subs.foldLeft(col(f.name)) { (c, sub) =>
            buildValue(c, f.dataType, sub, resolver)
          }.as(f.name))
        case None => Some(col(f.name))
      }
    }
    df.select(outCols: _*)
  }

  private def resolved(v: JValue, resolver: SchemaResolver): Option[JObj] =
    v match {
      case o: JObj => resolver.resolve(o) match {
        case r: JObj => Some(r)
        case _ => Some(o)
      }
      case _ => None
    }

  /** Own `properties` of a node, in declaration order. */
  private def ownProps(schema: JObj, resolver: SchemaResolver): Option[Vector[(String, JObj)]] =
    schema.obj("properties").map(_.fields.flatMap {
      case (k, v) => resolved(v, resolver).map(k -> _)
    })

  /** Does this node drop additional keys? (jsen.js:764-782) */
  private def dropsAdditional(schema: JObj, additional: Additional): Boolean =
    additional match {
      case Additional.Always => false
      case _ => schema.get("additionalProperties") match {
        case Some(JBool(false)) => true
        case Some(_) => false
        case None => additional == Additional.Drop
      }
    }

  /** Replicates build()'s recursion level-by-level over the column set:
    * returns (surviving columns, (column, default-schema) pairs in
    * traversal order). A node with own `properties` drops undeclared
    * columns immediately (when the drop rule holds); an allOf node gets
    * its OWN PropertyMarker — branches with properties only MARK
    * undeclared columns, a column marked by more than one branch is
    * dropped after the loop, and a nested allOf branch recurses with its
    * own marker whose deletions apply immediately (jsen.js:690-812). */
  private def plan(node: JObj, resolver: SchemaResolver, additional: Additional,
                   cols: Vector[String])
      : (Vector[String], Vector[(String, JObj)]) = {
    ownProps(node, resolver) match {
      case Some(props) =>
        val declared = props.map(_._1).toSet
        val surviving =
          if (dropsAdditional(node, additional)) cols.filter(declared)
          else cols
        (surviving, props)
      case None =>
        val branches = node.arr("allOf").getOrElse(Vector.empty)
          .flatMap(resolved(_, resolver))
        if (branches.isEmpty) (cols, Vector.empty)
        else {
          var surviving = cols
          val marks = scala.collection.mutable.Map.empty[String, Int]
          val defaults = Vector.newBuilder[(String, JObj)]
          branches.foreach { b =>
            ownProps(b, resolver) match {
              case Some(props) =>
                defaults ++= props
                if (dropsAdditional(b, additional)) {
                  val declared = props.map(_._1).toSet
                  surviving.foreach { c =>
                    if (!declared(c))
                      marks(c) = marks.getOrElse(c, 0) + 1
                  }
                }
              case None =>
                // nested allOf: its own marker, deletions apply now
                val (s2, d2) = plan(b, resolver, additional, surviving)
                surviving = s2
                defaults ++= d2
            }
          }
          (surviving.filterNot(c => marks.getOrElse(c, 0) > 1),
            defaults.result())
        }
    }
  }

  private def buildValue(c: Column, dt: DataType, schema: JObj,
                         resolver: SchemaResolver): Column = {
    val withDefault = schema.get("default") match {
      case Some(d) => jsonLiteral(d, dt).map(l => coalesce(c, l)).getOrElse(c)
      case None => c
    }
    dt match {
      case st: StructType =>
        // nested recursion applies defaults only (a struct column's shape
        // is fixed — "dropping" a nested field would mean nulling it, which
        // build never does to populated values)
        val props: Map[String, Seq[JObj]] =
          plan(schema, resolver, Additional.Keep,
            st.fieldNames.toVector)._2
            .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
        if (props.isEmpty) withDefault
        else {
          val rebuilt = struct(st.fields.toSeq.map { f =>
            props.get(f.name) match {
              case Some(subs) =>
                subs.foldLeft(withDefault.getField(f.name)) { (c, sub) =>
                  buildValue(c, f.dataType, sub, resolver)
                }.as(f.name)
              case None => withDefault.getField(f.name).as(f.name)
            }
          }: _*)
          when(withDefault.isNull, withDefault).otherwise(rebuilt)
        }
      case ArrayType(et, _) =>
        schema.get("items") match {
          case Some(sub: JObj) =>
            transform(withDefault, x => buildValue(x, et, sub, resolver))
          case Some(JArr(tuple)) =>
            // tuple form: each position gets its own sub-schema's defaults
            // (jsen.js:784-799); positions beyond the tuple are untouched
            transform(withDefault, (x, i) =>
              tuple.zipWithIndex.foldLeft(x) { case (acc, (subV, idx)) =>
                resolved(subV, resolver) match {
                  case Some(o) =>
                    when(i === lit(idx), buildValue(x, et, o, resolver))
                      .otherwise(acc)
                  case None => acc
                }
              })
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
