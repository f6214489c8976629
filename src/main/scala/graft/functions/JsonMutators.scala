package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, NullNode, ObjectNode}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BigQuery JSON mutator functions over this engine's canonical-string
  * JSON representation: JSON_SET, JSON_REMOVE, JSON_STRIP_NULLS,
  * JSON_ARRAY_INSERT, JSON_ARRAY_APPEND
  * (reference surface: the BigQuery JSON function family the e59/e65
  * constructors already cover read-side). String-in/string-out; the
  * dialect wraps the outermost call in the engine's PARSE_JSON
  * round-trip so output canonicalization (sorted keys, minified)
  * matches every other JSON producer.
  *
  * Value typing: the engine models BigQuery's JSON type as canonical
  * strings, so a STRING value that parses as a JSON OBJECT or ARRAY is
  * spliced as that subtree; any other string is a JSON string scalar.
  * (BigQuery keeps the two types distinct; this is the documented
  * best-possible rule for a string-typed JSON model.)
  */
object JsonMutators {
  private val mapper = new ObjectMapper()
  private val nf = JsonNodeFactory.instance

  // ---- JSONPath (the mutators' subset: $.a."b c".d[0]) ----------------
  sealed trait Step
  final case class Field(name: String) extends Step
  final case class Index(i: Int) extends Step

  /** Parse `$.a.b[2]."x.y"` → steps. Malformed paths throw (BigQuery
    * errors on malformed paths for the mutator family).
    */
  def parsePath(p: String): Seq[Step] = {
    val s = p.trim
    if (s.isEmpty || s.charAt(0) != '$')
      throw new IllegalArgumentException(s"JSONPath must start with '$$': $p")
    val steps = Seq.newBuilder[Step]
    var i = 1
    while (i < s.length) {
      s.charAt(i) match {
        case '.' =>
          i += 1
          if (i < s.length && s.charAt(i) == '"') {
            val close = s.indexOf('"', i + 1)
            if (close < 0) throw new IllegalArgumentException(s"unterminated quoted field in $p")
            steps += Field(s.substring(i + 1, close))
            i = close + 1
          } else {
            val start = i
            while (i < s.length && s.charAt(i) != '.' && s.charAt(i) != '[') i += 1
            if (i == start) throw new IllegalArgumentException(s"empty field name in $p")
            steps += Field(s.substring(start, i))
          }
        case '[' =>
          val close = s.indexOf(']', i)
          if (close < 0) throw new IllegalArgumentException(s"unterminated index in $p")
          val idx = s.substring(i + 1, close).trim
          steps += Index(idx.toInt)
          i = close + 1
        case c => throw new IllegalArgumentException(s"unexpected '$c' in JSONPath $p")
      }
    }
    steps.result()
  }

  // ---- mutators ---------------------------------------------------------

  /** JSON_SET pair application: replaces the value at `path`, creating
    * missing containers on the way (objects for field steps, arrays for
    * index steps; short arrays pad with nulls). A step that CONFLICTS
    * with existing data (field into an array, index into an object or
    * scalar) makes the pair a silent no-op, as in BigQuery.
    */
  def set(json: String, path: String, value: JsonNode): String = {
    val root = mapper.readTree(json)
    val steps = parsePath(path)
    if (steps.isEmpty) return mapper.writeValueAsString(value) // $ = replace all
    place(root, steps, value) match {
      case Some(newRoot) => mapper.writeValueAsString(newRoot)
      case scala.None => mapper.writeValueAsString(root)
    }
  }

  /** Returns Some(updatedRoot) or None for a conflict no-op. */
  private def place(root: JsonNode, steps: Seq[Step], value: JsonNode): Option[JsonNode] = {
    // the root itself may need replacing by a container when a scalar
    // sits at $ and the path descends — BigQuery no-ops that case
    def rec(node: JsonNode, rest: Seq[Step]): Option[JsonNode] = rest match {
      case Seq() => Some(value)
      case Field(f) +: tail =>
        node match {
          case o: ObjectNode =>
            val childOld =
              if (o.has(f)) o.get(f) else emptyFor(tail)
            rec(childOld, tail).map { c => o.set[JsonNode](f, c); o }
          case _ => scala.None // field step into array/scalar: no-op
        }
      case Index(i) +: tail =>
        node match {
          case a: ArrayNode =>
            if (i < 0) scala.None
            else {
              while (a.size <= i) a.add(NullNode.instance)
              val childOld = if (a.get(i).isNull) emptyFor(tail) else a.get(i)
              rec(childOld, tail).map { c => a.set(i, c); a }
            }
          case _ => scala.None // index step into object/scalar: no-op
        }
    }
    rec(root, steps)
  }

  private def emptyFor(rest: Seq[Step]): JsonNode = rest.headOption match {
    case Some(Index(_)) => nf.arrayNode()
    case _ => nf.objectNode()
  }

  /** JSON_REMOVE single-path application: removes the value if the full
    * path exists (array removal shifts left); otherwise no-op. Removing
    * `$` itself is an error, as in BigQuery.
    */
  def remove(json: String, path: String): String = {
    val steps = parsePath(path)
    if (steps.isEmpty)
      throw new IllegalArgumentException("JSON_REMOVE path cannot be '$'")
    val root = mapper.readTree(json)
    var node = root
    var ok = true
    steps.dropRight(1).foreach { st =>
      if (ok) (st, node) match {
        case (Field(f), o: ObjectNode) if o.has(f) => node = o.get(f)
        case (Index(i), a: ArrayNode) if i >= 0 && i < a.size => node = a.get(i)
        case _ => ok = false
      }
    }
    if (ok) (steps.last, node) match {
      case (Field(f), o: ObjectNode) => o.remove(f)
      case (Index(i), a: ArrayNode) if i >= 0 && i < a.size => a.remove(i)
      case _ =>
    }
    mapper.writeValueAsString(root)
  }

  /** JSON_STRIP_NULLS scoped to `path` ('$' = whole document): removes
    * JSON nulls from objects (always) and from arrays (when
    * includeArrays); removeEmpty then prunes containers that became
    * empty, recursively. A subtree that strips away entirely becomes
    * JSON null, as in BigQuery. A nonexistent path no-ops.
    */
  def stripNullsAt(json: String, path: String, includeArrays: Boolean,
      removeEmpty: Boolean): String = {
    val steps = parsePath(path)
    if (steps.isEmpty) return stripNulls(json, includeArrays, removeEmpty)
    val root = mapper.readTree(json)
    navigate(root, steps.dropRight(1)).foreach { parent =>
      (steps.last, parent) match {
        case (Field(f), o: ObjectNode) if o.has(f) =>
          o.set[JsonNode](f, mapper.readTree(
            stripNulls(mapper.writeValueAsString(o.get(f)), includeArrays, removeEmpty)))
        case (Index(i), a: ArrayNode) if i >= 0 && i < a.size =>
          a.set(i, mapper.readTree(
            stripNulls(mapper.writeValueAsString(a.get(i)), includeArrays, removeEmpty)))
        case _ =>
      }
    }
    mapper.writeValueAsString(root)
  }

  private def stripNulls(json: String, includeArrays: Boolean, removeEmpty: Boolean): String = {
    val root = mapper.readTree(json)
    def strip(n: JsonNode): JsonNode = n match {
      case o: ObjectNode =>
        val out = nf.objectNode()
        o.fields().forEachRemaining { e =>
          val v = strip(e.getValue)
          val drop = v.isNull ||
            (removeEmpty && ((v.isObject || v.isArray) && v.isEmpty))
          if (!drop) out.set[JsonNode](e.getKey, v)
        }
        out
      case a: ArrayNode =>
        val out = nf.arrayNode()
        a.forEach { e =>
          val v = strip(e)
          val drop = (includeArrays && v.isNull) ||
            (removeEmpty && ((v.isObject || v.isArray) && v.isEmpty))
          if (!drop) out.add(v)
        }
        out
      case other => other
    }
    val stripped = strip(root)
    val out =
      if ((stripped.isObject || stripped.isArray) && stripped.isEmpty && removeEmpty)
        NullNode.instance
      else stripped
    mapper.writeValueAsString(out)
  }

  /** JSON_ARRAY_INSERT pair: the path's LAST step must be an index into
    * an existing array (short arrays pad with nulls up to the slot);
    * an array value spreads element-by-element (BigQuery's
    * insert_each_element default). Conflicts no-op.
    */
  def arrayInsert(json: String, path: String, value: JsonNode,
      eachElement: Boolean): String = {
    val steps = parsePath(path)
    steps.lastOption match {
      case Some(Index(at)) if at >= 0 =>
        val root = mapper.readTree(json)
        navigate(root, steps.dropRight(1)) match {
          case Some(a: ArrayNode) =>
            while (a.size < at) a.add(NullNode.instance)
            val items = if (eachElement) spread(value) else Seq(value)
            var k = 0
            items.foreach { v => a.insert(at + k, v); k += 1 }
            mapper.writeValueAsString(root)
          case _ => mapper.writeValueAsString(root)
        }
      case _ => throw new IllegalArgumentException(
        s"JSON_ARRAY_INSERT path must end in an array index: $path")
    }
  }

  /** JSON_ARRAY_APPEND pair: the path must point at an existing array;
    * array values spread (append_each_element default). Conflicts no-op.
    */
  def arrayAppend(json: String, path: String, value: JsonNode,
      eachElement: Boolean): String = {
    val root = mapper.readTree(json)
    navigate(root, parsePath(path)) match {
      case Some(a: ArrayNode) =>
        (if (eachElement) spread(value) else Seq(value)).foreach(a.add)
        mapper.writeValueAsString(root)
      case _ => mapper.writeValueAsString(root)
    }
  }

  /** JSON_KEYS: unique object keys as dotted paths, sorted, bounded by
    * maxDepth. Modes (BigQuery): "strict" never descends arrays; "lax"
    * descends one array level to reach objects; "lax recursive"
    * descends arrays of arrays too. A non-object root yields NULL (as
    * in BigQuery), surfaced here as null for the expression layer.
    */
  def keys(json: String, maxDepth: Int, mode: String): Seq[String] = {
    val root = mapper.readTree(json)
    if (!root.isObject) return null
    val m = mode.trim.toLowerCase
    if (m != "strict" && m != "lax" && m != "lax recursive")
      throw new IllegalArgumentException(
        s"JSON_KEYS mode must be 'strict', 'lax', or 'lax recursive', got '$mode'")
    if (maxDepth < 1)
      throw new IllegalArgumentException(s"JSON_KEYS max_depth must be >= 1")
    val out = scala.collection.mutable.SortedSet[String]()
    // unwrap arrays per mode: lax descends ONE level, lax recursive all
    def unwrap(n: JsonNode, recursive: Boolean): Seq[JsonNode] = n match {
      case a: ArrayNode if m != "strict" =>
        val items = Seq.newBuilder[JsonNode]
        a.forEach { e =>
          if (recursive && e.isArray) items ++= unwrap(e, recursive)
          else items += e
        }
        items.result()
      case other => Seq(other)
    }
    def walk(node: JsonNode, prefix: String, depth: Int): Unit =
      node match {
        case o: ObjectNode if depth <= maxDepth =>
          o.fields().forEachRemaining { e =>
            val path = if (prefix.isEmpty) e.getKey else s"$prefix.${e.getKey}"
            out += path
            unwrap(e.getValue, m == "lax recursive")
              .foreach(walk(_, path, depth + 1))
          }
        case _ =>
      }
    walk(root, "", 1)
    out.toSeq
  }

  private def spread(v: JsonNode): Seq[JsonNode] = v match {
    case a: ArrayNode =>
      val out = Seq.newBuilder[JsonNode]
      a.forEach(e => out += e)
      out.result()
    case other => Seq(other)
  }

  private def navigate(root: JsonNode, steps: Seq[Step]): Option[JsonNode] = {
    var node = root
    steps.foreach { st =>
      (st, node) match {
        case (Field(f), o: ObjectNode) if o.has(f) => node = o.get(f)
        case (Index(i), a: ArrayNode) if i >= 0 && i < a.size => node = a.get(i)
        case _ => return scala.None
      }
    }
    Some(node)
  }

  // ---- SQL value → JsonNode --------------------------------------------

  /** Convert a Catalyst value to the JsonNode the mutator splices in.
    * Strings sniff for an object/array subtree (see class doc); arrays
    * recurse; structs/maps fail loud (no BigQuery mutator takes them —
    * TO_JSON first).
    */
  def toNode(v: Any, dt: DataType): JsonNode = v match {
    case null => NullNode.instance
    case s: UTF8String =>
      val str = s.toString
      val t = str.trim
      if (t.nonEmpty && (t.charAt(0) == '{' || t.charAt(0) == '[')) {
        try mapper.readTree(t)
        catch { case _: Exception => nf.textNode(str) }
      } else nf.textNode(str)
    case b: Boolean => nf.booleanNode(b)
    case i: Int => nf.numberNode(i)
    case l: Long => nf.numberNode(l)
    case sh: Short => nf.numberNode(sh)
    case by: Byte => nf.numberNode(by)
    case f: Float => nf.numberNode(f)
    case d: Double => nf.numberNode(d)
    case dec: org.apache.spark.sql.types.Decimal => nf.numberNode(dec.toJavaBigDecimal)
    case a: org.apache.spark.sql.catalyst.util.ArrayData =>
      val et = dt.asInstanceOf[ArrayType].elementType
      val arr = nf.arrayNode()
      a.foreach(et, (_, e) => arr.add(toNode(e, et)))
      arr
    case other => throw new IllegalArgumentException(
      s"unsupported JSON mutator value type $dt ($other); TO_JSON_STRING it first")
  }

  def register(spark: SparkSession): Unit = {
    if (spark.sessionState.functionRegistry.functionExists(
        FunctionIdentifier("graft_json_set"))) return
    def reg(name: String, make: Seq[Expression] => Expression): Unit =
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, make, "scala_udf")
    reg("graft_json_set", exprs => GraftJsonMutate("set", exprs))
    reg("graft_json_remove", exprs => GraftJsonMutate("remove", exprs))
    reg("graft_json_strip_nulls", exprs => GraftJsonMutate("strip", exprs))
    reg("graft_json_array_insert", exprs => GraftJsonMutate("array_insert", exprs))
    reg("graft_json_array_append", exprs => GraftJsonMutate("array_append", exprs))
    reg("graft_json_keys", exprs => GraftJsonMutate("keys", exprs))
  }
}

/** One expression covers the five mutators (string ops on the driver of
  * a Project — CodegenFallback keeps them out of handwritten codegen;
  * the pipeline surface never puts these in a hot loop).
  * Child layouts: set (json, path, value); array_insert/array_append
  * (json, path, value[, eachElement]); remove (json, path);
  * strip (json, path, includeArrays, removeEmpty).
  */
case class GraftJsonMutate(fn: String, children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def dataType: DataType =
    if (fn == "keys") ArrayType(StringType) else StringType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val json = children(0).eval(input)
    if (json == null) return null
    val j = json.asInstanceOf[UTF8String].toString
    val out = fn match {
      case "set" | "array_insert" | "array_append" =>
        val p = children(1).eval(input)
        if (p == null) return null
        val path = p.asInstanceOf[UTF8String].toString
        val v = JsonMutators.toNode(children(2).eval(input), children(2).dataType)
        def each = children.length < 4 || {
          val e = children(3).eval(input)
          e == null || e.asInstanceOf[Boolean]
        }
        fn match {
          case "set" => JsonMutators.set(j, path, v)
          case "array_insert" => JsonMutators.arrayInsert(j, path, v, each)
          case _ => JsonMutators.arrayAppend(j, path, v, each)
        }
      case "remove" =>
        val p = children(1).eval(input)
        if (p == null) return null
        JsonMutators.remove(j, p.asInstanceOf[UTF8String].toString)
      case "keys" =>
        val depth = children(1).eval(input)
        val mode = children(2).eval(input)
        if (depth == null || mode == null) return null
        val ks = JsonMutators.keys(j, depth.asInstanceOf[Int],
          mode.asInstanceOf[UTF8String].toString)
        return if (ks == null) null
        else org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          ks.map(UTF8String.fromString).toArray)
      case "strip" =>
        val p = children(1).eval(input)
        if (p == null) return null
        val ia = children(2).eval(input)
        val re = children(3).eval(input)
        JsonMutators.stripNullsAt(j, p.asInstanceOf[UTF8String].toString,
          ia != null && ia.asInstanceOf[Boolean],
          re != null && re.asInstanceOf[Boolean])
      case other => throw new IllegalStateException(s"unknown mutator $other")
    }
    UTF8String.fromString(out)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GraftJsonMutate = copy(children = newChildren)
}
