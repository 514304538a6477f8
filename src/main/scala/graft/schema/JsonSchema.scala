package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON Schema subset: structural mapping to Spark types plus a
  * constraint validator compiled to a Catalyst predicate Column.
  *
  * Reference behavior: `nisshi-schema/src/json.rs:59-128` validates each
  * record against the registry schema and rejects the batch with
  * INVALID_RECORD; `nisshi-schema/src/json/arrow.rs:87-121` infers Arrow
  * types from instance values. Here the schema itself drives the Spark
  * type (declarative > instance-driven where the schema declares types),
  * and the constraint subset (type / required / pattern / minimum /
  * maximum / exclusiveMinimum / exclusiveMaximum / multipleOf /
  * minLength / maxLength / minItems / maxItems / enum / const) compiles
  * to a single boolean expression evaluated inside codegen — no per-row
  * UDF interpreter at 100 TB.
  */
object JsonSchema {

  final case class Compiled(schema: StructType, isValid: Column => Column)

  /** Instance-driven schema inference for schemaless topics: the unified
    * type of a JSON column is derived from the VALUES, cross-record
    * (reference `nisshi-schema/src/json/arrow.rs:87-148`,
    * `common_data_type` unification). Spark-native: the JSON datasource's
    * inference IS this unification, run distributed — per-partition
    * inference then a type merge (long ⊔ double → double, missing ⊔ T →
    * nullable T, object fields unioned) — so it scales to any corpus and
    * costs one extra pass.
    */
  def inferSchema(df: DataFrame, jsonCol: String): StructType = {
    val spark = df.sparkSession
    import spark.implicits._
    spark.read.json(df.select(col(jsonCol).cast("string")).as[String]).schema
  }

  /** Infer the unified schema, then parse the column typed — what a
    * schemaless topic needs before it can be materialized to the lake.
    */
  def parseInferred(df: DataFrame, jsonCol: String,
                    outCol: String): DataFrame =
    df.withColumn(outCol, from_json(col(jsonCol).cast("string"),
      inferSchema(df, jsonCol)))

  /** Parse a JSON Schema document (subset) into Spark StructType +
    * validator over a JSON-string column.
    */
  def compile(schemaJson: String): Compiled = {
    val ast = JsonMethods.parse(schemaJson)
    Compiled(toStruct(ast), c => validate(ast, c, "$"))
  }

  private def str(v: JValue): Option[String] = v match {
    case JString(s) => Some(s)
    case _ => None
  }

  /** Structural mapping (SURVEY §1.3 JSON table). */
  def toDataType(ast: JValue): DataType = {
    val tpe = str(ast \ "type").getOrElse("object")
    tpe match {
      case "null" => NullType
      case "boolean" => BooleanType
      case "integer" => LongType
      case "number" => DoubleType
      case "string" => StringType
      case "array" => ArrayType(toDataType(ast \ "items"))
      case "object" => toStruct(ast)
      case _ => StringType
    }
  }

  def toStruct(ast: JValue): StructType = {
    val required: Set[String] = (ast \ "required") match {
      case JArray(vs) => vs.flatMap(str).toSet
      case _ => Set.empty
    }
    val fields = (ast \ "properties") match {
      case JObject(props) =>
        props.map { case (name, sub) =>
          StructField(name, toDataType(sub), nullable = !required.contains(name))
        }
      case _ => Nil
    }
    StructType(fields)
  }

  /** Compile constraints to one predicate over a JSON string column.
    * `path` is the JsonPath of the current node.
    *
    * KNOWN DIVERGENCES from a full JSON Schema validator: (a) the
    * checks run over `get_json_object` output, which strips string
    * quoting — a JSON string "42" therefore passes an `integer` type
    * check (the full validator would reject it); (b) a subschema with
    * no `type` keyword defaults to `object`, whose check demands a
    * non-null value, so a required key explicitly set to JSON null
    * passes `required` (key membership via json_object_keys) but is
    * then rejected by the defaulted type check — a full validator
    * accepts it when the subschema is empty. Catching these per-path
    * would need per-row re-parsing; the codegen'd predicate trades the
    * corners for zero interpreter cost at corpus scale.
    */
  private def validate(ast: JValue, json: Column, path: String): Column = {
    val tpe = str(ast \ "type").getOrElse("object")
    val raw = get_json_object(json, path)
    val typeOk: Column = tpe match {
      case "integer" =>
        raw.isNotNull && raw.rlike("^-?[0-9]+$")
      case "number" =>
        raw.isNotNull && raw.cast("double").isNotNull
      case "string" => raw.isNotNull
      case "boolean" => raw.isin("true", "false")
      case "array" => raw.isNotNull && json_array_length(raw).isNotNull
      case "object" => raw.isNotNull
      case _ => lit(true)
    }
    def num(v: JValue): Option[Double] = v match {
      case JInt(m) => Some(m.toDouble)
      case JDouble(m) => Some(m)
      case JDecimal(m) => Some(m.toDouble)
      case _ => None
    }
    val constraints = Seq(
      (ast \ "pattern") match {
        case JString(p) => Some(raw.rlike(p))
        case _ => None
      },
      num(ast \ "minimum").map(m => raw.cast("double") >= m),
      num(ast \ "maximum").map(m => raw.cast("double") <= m),
      num(ast \ "exclusiveMinimum").map(m => raw.cast("double") > m),
      num(ast \ "exclusiveMaximum").map(m => raw.cast("double") < m),
      // draft-2020 multipleOf; exact for the integer divisors real
      // schemas use (money cents, page sizes)
      num(ast \ "multipleOf").map(m => pmod(raw.cast("double"), lit(m)) === 0.0),
      num(ast \ "minLength").map(m => length(raw) >= m.toInt),
      num(ast \ "maxLength").map(m => length(raw) <= m.toInt),
      num(ast \ "minItems").map(m => json_array_length(raw) >= m.toInt),
      num(ast \ "maxItems").map(m => json_array_length(raw) <= m.toInt),
      (ast \ "const") match {
        case JString(s) => Some(raw === s)
        case JInt(m) => Some(raw.cast("double") === m.toDouble)
        case JDouble(m) => Some(raw.cast("double") === m)
        case JBool(b) => Some(raw === b.toString)
        case _ => None
      },
      (ast \ "enum") match {
        case JArray(vs) =>
          // compare against get_json_object's raw rendering, so numeric
          // and boolean enum members are enforced too
          val opts = vs.collect {
            case JString(v) => v
            case JInt(v) => v.toString
            case JDouble(v) => v.toString
            case JDecimal(v) => v.toString
            case JBool(v) => v.toString
          }
          if (opts.nonEmpty) Some(raw.isin(opts.map(_.asInstanceOf[Any]): _*)) else None
        case _ => None
      }
    ).flatten
    val required: Set[String] = (ast \ "required") match {
      case JArray(vs) => vs.flatMap(str).toSet
      case _ => Set.empty
    }
    val declaredProps: Set[String] = (ast \ "properties") match {
      case JObject(props) => props.map(_._1).toSet
      case _ => Set.empty
    }
    // presence = KEY membership, not value non-nullness: JSON Schema
    // `required` only demands the key exist, so {"x": null} satisfies
    // `required: ["x"]` — and the null value must still REACH the child
    // validator (where a type constraint rejects it) instead of being
    // misread as absent and skipped. json_object_keys returns null for
    // an absent/non-object parent → coalesce to "no key".
    val parentKeys = json_object_keys(get_json_object(json, path))
    def hasKey(name: String): Column =
      coalesce(array_contains(parentKeys, name), lit(false))
    val childChecks: Seq[Column] = (ast \ "properties") match {
      case JObject(props) =>
        props.map { case (name, sub) =>
          val present = hasKey(name)
          val requiredOk = if (required.contains(name)) present else lit(true)
          requiredOk && (!present || validate(sub, json, s"$path.$name"))
        }
      case _ => Nil
    }
    // `required` names with no matching `properties` entry still demand
    // presence (a conformant validator rejects their absence; silently
    // skipping them admitted documents the reference rejects)
    val requiredOnly: Seq[Column] = (required -- declaredProps).toSeq.sorted
      .map(hasKey)
    (Seq(typeOk) ++ constraints ++ childChecks ++ requiredOnly).reduce(_ && _)
  }
}
