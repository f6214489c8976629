package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, GetStructField, RuntimeReplaceable}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.StructType

/** GEOGRAPHY accessor kernels. Points are STRUCT<lon, lat>, linestrings
  * ARRAY<point> (see Dialect's ST_* lowerings). ST_X/ST_Y must be LOUD
  * on a non-point argument like BigQuery — a plain text-level `.lon`
  * silently MAPS over an array of structs (Spark's GetArrayStructFields
  * returns the array of field values), which surfaced when
  * ST_GEOGFROMTEXT gained its LINESTRING overload (r11). The typed
  * dispatch happens at analysis time via RuntimeReplaceable.
  */
case class PointFieldExpr(child: Expression, fn: String, field: String)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case s: StructType if s.fieldNames.contains(field) =>
      GetStructField(child, s.fieldIndex(field), Some(field))
    case other => throw new IllegalArgumentException(
      s"$fn: requires a GEOGRAPHY point, got ${other.simpleString}")
  }
  override protected def withNewChildInternal(newChild: Expression): PointFieldExpr =
    copy(child = newChild)
}

/** Spherical polygon kernels (r11). A polygon is ARRAY<ARRAY<point>>
  * — ring 0 the shell, later rings holes — deliberately a DIFFERENT
  * shape from linestrings (ARRAY<point>) so ST_LENGTH on a polygon and
  * ST_AREA on a linestring both fail analysis loud instead of silently
  * measuring the wrong thing.
  *
  * ST_AREA computes the EXACT spherical excess on BigQuery's
  * R = 6371010 m sphere via the van Oosterom–Strackee signed-triangle
  * formula over a fan from the ring's first vertex:
  * E = 2·atan2(v0·(vi×vi+1), 1 + v0·vi + vi·vi+1 + vi+1·v0), summed
  * left-to-right — numerically stable, orientation-independent through
  * the final abs, holes subtract. The fixed association order lets the
  * DuckDB oracle restate the identical IEEE chain; last-ulp libm
  * differences (Java Math vs C libm trig) are absorbed by the gates'
  * INT64 casts. ST_PERIMETER sums great-circle edge lengths per ring
  * (auto-closing), with the same explicit-d2r haversine as ST_DISTANCE.
  */
object SphericalGeo {
  private val R = 6371010.0
  private val D2R = 0.017453292519943295

  private def unit(lon: Double, lat: Double): (Double, Double, Double) = {
    val latR = lat * D2R
    val lonR = lon * D2R
    (math.cos(latR) * math.cos(lonR), math.cos(latR) * math.sin(lonR),
      math.sin(latR))
  }

  /** Signed spherical excess of one ring (closing duplicate tolerated). */
  def ringExcess(pts: Array[(Double, Double)]): Double = {
    var ps = pts
    if (ps.length >= 2 && ps.head == ps.last) ps = ps.dropRight(1)
    if (ps.length < 3) throw new IllegalArgumentException(
      "ST_AREA: a polygon ring needs at least 3 distinct points")
    val v = ps.map { case (lon, lat) => unit(lon, lat) }
    val (x0, y0, z0) = v(0)
    var e = 0.0
    var i = 1
    while (i < v.length - 1) {
      val (x1, y1, z1) = v(i)
      val (x2, y2, z2) = v(i + 1)
      // v0 · (v1 × v2), expanded in the fixed order the oracle restates
      val det = x0 * (y1 * z2 - z1 * y2) + y0 * (z1 * x2 - x1 * z2) +
        z0 * (x1 * y2 - y1 * x2)
      val denom = 1.0 + (x0 * x1 + y0 * y1 + z0 * z1) +
        (x1 * x2 + y1 * y2 + z1 * z2) + (x2 * x0 + y2 * y0 + z2 * z0)
      e += 2.0 * math.atan2(det, denom)
      i += 1
    }
    e
  }

  /** Shell minus holes, in m². */
  def area(rings: Array[Array[(Double, Double)]]): Double = {
    if (rings.isEmpty) throw new IllegalArgumentException(
      "ST_AREA: empty polygon")
    val shell = math.abs(ringExcess(rings.head)) * R * R
    rings.tail.foldLeft(shell)((acc, h) => acc - math.abs(ringExcess(h)) * R * R)
  }

  private def haversine(lon1: Double, lat1: Double, lon2: Double,
      lat2: Double): Double = {
    val sdlat = math.sin((lat2 * D2R - lat1 * D2R) / 2.0)
    val sdlon = math.sin((lon2 * D2R - lon1 * D2R) / 2.0)
    2.0 * R * math.asin(math.min(1.0, math.sqrt(sdlat * sdlat +
      math.cos(lat1 * D2R) * math.cos(lat2 * D2R) * sdlon * sdlon)))
  }

  /** Point-in-ring via the tangent-frame winding number: project each
    * vertex onto the test point's local east/north frame, accumulate
    * wrapped azimuth deltas around the closed ring — |winding| ≈ 2π
    * inside, ≈ 0 outside. Exact for simple rings whose edges subtend
    * < π of azimuth at the point (always true for the sub-hemisphere
    * polygons this engine supports); points ON the boundary or at the
    * poles are documented-undefined (BigQuery's S2 snap differs at
    * boundary resolution anyway).
    */
  private def windingInside(ring0: Array[(Double, Double)], lonP: Double,
      latP: Double): Boolean = {
    var ring = ring0
    if (ring.length >= 2 && ring.head == ring.last) ring = ring.dropRight(1)
    if (ring.length < 3) throw new IllegalArgumentException(
      "ST_CONTAINS: a polygon ring needs at least 3 distinct points")
    val (px, py, pz) = unit(lonP, latP)
    // east = normalize(k × p), north = p × east (undefined at poles)
    val exr = -py; val eyr = px
    val en = math.sqrt(exr * exr + eyr * eyr)
    if (en < 1e-12) throw new IllegalArgumentException(
      "ST_CONTAINS: test point at a pole is not supported")
    val (ex, ey) = (exr / en, eyr / en)
    val (nx, ny, nz) = (py * 0.0 - pz * ey, pz * ex - px * 0.0,
      px * ey - py * ex)
    def az(v: (Double, Double, Double)): Double = {
      val (x, y, z) = v
      math.atan2(x * ex + y * ey, x * nx + y * ny + z * nz)
    }
    val angles = ring.map { case (lon, lat) => az(unit(lon, lat)) }
    var wind = 0.0
    var i = 0
    while (i < angles.length) {
      var d = angles((i + 1) % angles.length) - angles(i)
      if (d > math.Pi) d -= 2 * math.Pi
      if (d <= -math.Pi) d += 2 * math.Pi
      wind += d
      i += 1
    }
    math.abs(wind) > math.Pi
  }

  /** Inside the shell and outside every hole. */
  def containsPoint(rings: Array[Array[(Double, Double)]], lon: Double,
      lat: Double): Boolean = {
    if (rings.isEmpty) throw new IllegalArgumentException(
      "ST_CONTAINS: empty polygon")
    windingInside(rings.head, lon, lat) &&
      !rings.tail.exists(windingInside(_, lon, lat))
  }

  // ---- segment-crossing kernels (r12: shape-dispatching ST_INTERSECTS) ----

  private def cross(a: (Double, Double, Double), b: (Double, Double, Double)):
      (Double, Double, Double) =
    (a._2 * b._3 - a._3 * b._2, a._3 * b._1 - a._1 * b._3,
      a._1 * b._2 - a._2 * b._1)

  private def dot(a: (Double, Double, Double), b: (Double, Double, Double)): Double =
    a._1 * b._1 + a._2 * b._2 + a._3 * b._3

  /** p (already on the great circle with normal n = a×b) lies on the
    * minor arc a→b iff it is on b's side of a AND a's side of b:
    * (n×a)·p ≥ 0 and (b×n)·p ≥ 0 (tangents at the endpoints pointing
    * along the arc). Valid for arcs subtending < π — always true for
    * the degree-scale segments this engine constructs.
    */
  private def withinArc(a: (Double, Double, Double), b: (Double, Double, Double),
      n: (Double, Double, Double), p: (Double, Double, Double)): Boolean =
    dot(cross(n, a), p) >= 0.0 && dot(cross(b, n), p) >= 0.0

  /** PROPER crossing of two great-circle segments (each < π): strict
    * opposite-side tests against both planes, then one of the two
    * great-circle intersection candidates ±(nAB × nCD) must lie on
    * both arcs. Touching/collinear overlap is documented-undefined
    * (BigQuery's S2 snap resolves boundaries differently anyway);
    * oracle gates construct probes away from every vertex.
    */
  def segmentsCross(a: (Double, Double), b: (Double, Double),
      c: (Double, Double), d: (Double, Double)): Boolean = {
    val (va, vb, vc, vd) = (unit(a._1, a._2), unit(b._1, b._2),
      unit(c._1, c._2), unit(d._1, d._2))
    val nab = cross(va, vb)
    val ncd = cross(vc, vd)
    val sc = dot(nab, vc); val sd = dot(nab, vd)
    val sa = dot(ncd, va); val sb = dot(ncd, vb)
    if (sc * sd >= 0.0 || sa * sb >= 0.0) return false
    val i0 = cross(nab, ncd)
    val len = math.sqrt(dot(i0, i0))
    if (len < 1e-15) return false // same great circle: overlap undefined
    val i = (i0._1 / len, i0._2 / len, i0._3 / len)
    val ni = (-i._1, -i._2, -i._3)
    (withinArc(va, vb, nab, i) && withinArc(vc, vd, ncd, i)) ||
      (withinArc(va, vb, nab, ni) && withinArc(vc, vd, ncd, ni))
  }

  private def ringEdges(ring0: Array[(Double, Double)]):
      Iterator[((Double, Double), (Double, Double))] = {
    var ring = ring0
    if (ring.length >= 2 && ring.head == ring.last) ring = ring.dropRight(1)
    val r = ring
    (0 until r.length).iterator.map(i => (r(i), r((i + 1) % r.length)))
  }

  private def lineEdges(line: Array[(Double, Double)]):
      Iterator[((Double, Double), (Double, Double))] =
    (0 until line.length - 1).iterator.map(i => (line(i), line(i + 1)))

  def lineIntersectsLine(p: Array[(Double, Double)],
      q: Array[(Double, Double)]): Boolean =
    lineEdges(p).exists { case (a, b) =>
      lineEdges(q).exists { case (c, d) => segmentsCross(a, b, c, d) } }

  /** Any segment crosses any ring edge, or any vertex is interior
    * (covers a line lying fully inside the shell).
    */
  def lineIntersectsPolygon(rings: Array[Array[(Double, Double)]],
      line: Array[(Double, Double)]): Boolean =
    lineEdges(line).exists { case (a, b) =>
      rings.iterator.flatMap(ringEdges).exists { case (c, d) =>
        segmentsCross(a, b, c, d) } } ||
      line.exists { case (lon, lat) => containsPoint(rings, lon, lat) }

  /** Edge crossing, or either shell has a vertex interior to the other
    * (covers full containment either way).
    */
  def polygonIntersectsPolygon(a: Array[Array[(Double, Double)]],
      b: Array[Array[(Double, Double)]]): Boolean =
    a.iterator.flatMap(ringEdges).exists { case (p1, p2) =>
      b.iterator.flatMap(ringEdges).exists { case (q1, q2) =>
        segmentsCross(p1, p2, q1, q2) } } ||
      b.head.exists { case (lon, lat) => containsPoint(a, lon, lat) } ||
      a.head.exists { case (lon, lat) => containsPoint(b, lon, lat) }

  /** Polygon contains a linestring: every vertex interior (shell minus
    * holes) and no segment PROPERLY crosses a ring edge. With no
    * crossings, each segment stays in the region its endpoints share,
    * so the vertex test decides the whole line. Boundary touching is
    * documented-undefined (gates probe ≥ 0.25° from every vertex).
    */
  def containsLine(rings: Array[Array[(Double, Double)]],
      line: Array[(Double, Double)]): Boolean =
    line.forall { case (lon, lat) => containsPoint(rings, lon, lat) } &&
      !lineEdges(line).exists { case (a, b) =>
        rings.iterator.flatMap(ringEdges).exists { case (c, d) =>
          segmentsCross(a, b, c, d) } }

  /** Polygon a contains polygon b: b's shell vertices are interior to
    * a, no ring edge of b properly crosses a ring edge of a, and no
    * hole of a pokes into b's region (a hole of a strictly inside b
    * means part of b is excluded from a — crossing-free, so one hole
    * vertex inside b detects it). b's own holes need no check: they
    * only shrink b. A hole of a nested inside a hole of b passes
    * correctly — its vertices are NOT interior to b's region.
    */
  def containsPolygon(a: Array[Array[(Double, Double)]],
      b: Array[Array[(Double, Double)]]): Boolean =
    b.head.forall { case (lon, lat) => containsPoint(a, lon, lat) } &&
      !a.iterator.flatMap(ringEdges).exists { case (p1, p2) =>
        b.iterator.flatMap(ringEdges).exists { case (q1, q2) =>
          segmentsCross(p1, p2, q1, q2) } } &&
      !a.tail.exists(_.exists { case (lon, lat) => containsPoint(b, lon, lat) })

  /** Sum of ring circumferences (auto-closing), in m. */
  def perimeter(rings: Array[Array[(Double, Double)]]): Double =
    rings.foldLeft(0.0) { (acc, ring0) =>
      var ring = ring0
      if (ring.length >= 2 && ring.head == ring.last) ring = ring.dropRight(1)
      if (ring.length < 3) throw new IllegalArgumentException(
        "ST_PERIMETER: a polygon ring needs at least 3 distinct points")
      var s = acc
      var i = 0
      while (i < ring.length) {
        val (lon1, lat1) = ring(i)
        val (lon2, lat2) = ring((i + 1) % ring.length)
        s += haversine(lon1, lat1, lon2, lat2)
        i += 1
      }
      s
    }
}

/** Shape detection over the engine's GEOGRAPHY encodings (point =
  * STRUCT<lon DOUBLE, lat DOUBLE>, linestring = ARRAY<point>, polygon
  * = ARRAY<ARRAY<point>>) plus the shared InternalRow/ArrayData
  * parsers the eval kernels use. Centralizing the type tests is what
  * lets every geo expression fail ANALYSIS-loud on a shape it does
  * not support instead of reinterpreting unsafe memory (r11 ADVICE).
  */
object GeoShapes {
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.ArrayData

  def isPoint(dt: DataType): Boolean = dt match {
    case s: StructType => s.fields.length == 2 &&
      s.fieldNames.sameElements(Array("lon", "lat")) &&
      s.fields.forall(_.dataType == DoubleType)
    case _ => false
  }
  def isLine(dt: DataType): Boolean = dt match {
    case ArrayType(e, _) => isPoint(e)
    case _ => false
  }
  def isPolygon(dt: DataType): Boolean = dt match {
    case ArrayType(e, _) => isLine(e)
    case _ => false
  }
  def shapeName(dt: DataType): String =
    if (isPoint(dt)) "POINT" else if (isLine(dt)) "LINESTRING"
    else if (isPolygon(dt)) "POLYGON" else dt.simpleString

  def point(v: Any): (Double, Double) = {
    val r = v.asInstanceOf[InternalRow]
    (r.getDouble(0), r.getDouble(1))
  }
  def line(v: Any): Array[(Double, Double)] = {
    val a = v.asInstanceOf[ArrayData]
    Array.tabulate(a.numElements()) { i =>
      val p = a.getStruct(i, 2); (p.getDouble(0), p.getDouble(1))
    }
  }
  def polygon(v: Any): Array[Array[(Double, Double)]] = {
    val a = v.asInstanceOf[ArrayData]
    Array.tabulate(a.numElements())(i => line(a.getArray(i)))
  }
}

/** ST_AREA / ST_PERIMETER over ARRAY<ARRAY<STRUCT<lon, lat>>>. */
case class PolygonMeasureExpr(child: Expression, fn: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  // r12: analysis-loud on a non-polygon (same unsafe-reinterpret hazard
  // PolygonContainsExpr had — ST_AREA(linestring) must not getArray on
  // struct elements)
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (GeoShapes.isPolygon(child.dataType)) TypeCheckSuccess
    else TypeCheckFailure(
      s"$fn: requires a polygon, got ${GeoShapes.shapeName(child.dataType)}")
  }
  override protected def nullSafeEval(v: Any): Any = {
    val parsed = GeoShapes.polygon(v)
    if (fn == "ST_AREA") SphericalGeo.area(parsed)
    else SphericalGeo.perimeter(parsed)
  }
  override protected def withNewChildInternal(newChild: Expression): PolygonMeasureExpr =
    copy(child = newChild)
}

/** ST_CONTAINS/ST_COVERS (and flipped ST_WITHIN/ST_COVEREDBY) with a
  * POLYGON left side: dispatches at analysis time on the right shape —
  * polygon×point (winding containment), polygon×linestring (all
  * vertices interior + crossing-free), polygon×polygon (shell interior
  * + crossing-free + no a-hole poking into b). A non-polygon LEFT side
  * (point/linestring container — pure boundary membership) stays
  * analysis-loud; boundary touching is documented-undefined, same as
  * ST_INTERSECTS (COVERS differs from CONTAINS only on boundaries, so
  * both lower here).
  */
case class PolygonContainsExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = true
  // r12 (ADVICE): validate the shape pair at analysis time —
  // nullSafeEval casts raw ArrayData/InternalRow, and a linestring on
  // the left would reinterpret unsafe memory instead of failing
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (GeoShapes.isPolygon(left.dataType) && (GeoShapes.isPoint(right.dataType) ||
      GeoShapes.isLine(right.dataType) || GeoShapes.isPolygon(right.dataType)))
      TypeCheckSuccess
    else TypeCheckFailure(
      s"ST_CONTAINS family: requires (polygon, point|linestring|polygon), got " +
        s"(${GeoShapes.shapeName(left.dataType)}, " +
        s"${GeoShapes.shapeName(right.dataType)}) — a point or linestring " +
        "container is boundary membership, which is documented-undefined " +
        "in this engine")
  }
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val poly = GeoShapes.polygon(l)
    val rdt = right.dataType
    if (GeoShapes.isPoint(rdt)) {
      val (lon, lat) = GeoShapes.point(r)
      SphericalGeo.containsPoint(poly, lon, lat)
    } else if (GeoShapes.isLine(rdt))
      SphericalGeo.containsLine(poly, GeoShapes.line(r))
    else SphericalGeo.containsPolygon(poly, GeoShapes.polygon(r))
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PolygonContainsExpr =
    copy(left = newLeft, right = newRight)
}

/** ST_ASTEXT over any geography shape (r12, closes the ADVICE-medium
  * silent-map hazard: the old text-level `.lon` lowering MAPPED over a
  * linestring's points and rendered the array). Dispatches on the
  * child's type; doubles format exactly like Spark's CAST(d AS STRING)
  * (Java Double.toString) with the same trailing-`.0` strip the old
  * point lowering applied, so e77's WKT text is bit-identical.
  */
case class GeogAsTextExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (GeoShapes.isPoint(child.dataType) || GeoShapes.isLine(child.dataType) ||
      GeoShapes.isPolygon(child.dataType)) TypeCheckSuccess
    else TypeCheckFailure(
      s"ST_ASTEXT: not a geography value: ${child.dataType.simpleString}")
  }
  private def fmt(d: Double): String = {
    val s = d.toString
    if (s.endsWith(".0")) s.dropRight(2) else s
  }
  private def coords(ps: Array[(Double, Double)]): String =
    ps.map { case (lon, lat) => s"${fmt(lon)} ${fmt(lat)}" }.mkString(", ")
  override protected def nullSafeEval(v: Any): Any = {
    val dt = child.dataType
    val text =
      if (GeoShapes.isPoint(dt)) {
        val (lon, lat) = GeoShapes.point(v)
        s"POINT(${fmt(lon)} ${fmt(lat)})"
      } else if (GeoShapes.isLine(dt)) s"LINESTRING(${coords(GeoShapes.line(v))})"
      else GeoShapes.polygon(v)
        .map(r => s"(${coords(r)})").mkString("POLYGON(", ", ", ")")
    org.apache.spark.unsafe.types.UTF8String.fromString(text)
  }
  override protected def withNewChildInternal(newChild: Expression): GeogAsTextExpr =
    copy(child = newChild)
}

/** Shape-dispatching ST_INTERSECTS (r12): symmetric like BigQuery's
  * (closes the r11 ADVICE asymmetry — ST_INTERSECTS(point, polygon)
  * used to die on a runtime cast), and extended from polygon×point to
  * the segment-crossing pairings a pipeline's geofencing actually
  * joins on. Dispatch is at ANALYSIS time on the static shape pair:
  *   point×point        exact coordinate equality (S2 snap differences
  *                      are documented-undefined at boundary resolution)
  *   point×polygon      tangent-frame winding containment (either order)
  *   line×line          any proper great-circle segment crossing
  *   line×polygon       segment×ring-edge crossing, or a vertex interior
  *   polygon×polygon    edge crossing, or either shell's vertex interior
  * point×linestring is pure boundary membership — documented-undefined
  * here, fails analysis loud. Touching (shared vertex / collinear
  * overlap) is likewise undefined; gates construct probes ≥ 0.25° from
  * every vertex.
  */
case class GeogIntersectsExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import GeoShapes._
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = true
  private def shapeOf(dt: org.apache.spark.sql.types.DataType): Int =
    if (isPoint(dt)) 0 else if (isLine(dt)) 1 else if (isPolygon(dt)) 2 else -1
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    val (l, r) = (shapeOf(left.dataType), shapeOf(right.dataType))
    if (l < 0 || r < 0) TypeCheckFailure(
      s"ST_INTERSECTS: not a geography value: " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else if ((l, r) == (0, 1) || (l, r) == (1, 0)) TypeCheckFailure(
      "ST_INTERSECTS: point × linestring is boundary membership, which " +
        "is documented-undefined in this engine")
    else TypeCheckSuccess
  }
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    (shapeOf(left.dataType), shapeOf(right.dataType)) match {
      case (0, 0) => point(l) == point(r)
      case (2, 0) =>
        val (lon, lat) = point(r); SphericalGeo.containsPoint(polygon(l), lon, lat)
      case (0, 2) =>
        val (lon, lat) = point(l); SphericalGeo.containsPoint(polygon(r), lon, lat)
      case (1, 1) => SphericalGeo.lineIntersectsLine(line(l), line(r))
      case (1, 2) => SphericalGeo.lineIntersectsPolygon(polygon(r), line(l))
      case (2, 1) => SphericalGeo.lineIntersectsPolygon(polygon(l), line(r))
      case (2, 2) => SphericalGeo.polygonIntersectsPolygon(polygon(l), polygon(r))
      case other => throw new IllegalStateException(
        s"ST_INTERSECTS: unreachable shape pair $other")
    }
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GeogIntersectsExpr =
    copy(left = newLeft, right = newRight)
}

/** ST_BOUNDINGBOX over any geography shape (point struct, linestring
  * array, polygon array-of-arrays) → STRUCT<xmin, ymin, xmax, ymax>.
  * Naive lon min/max — shapes crossing the antimeridian are not
  * re-wrapped (documented; BigQuery wraps the box across ±180).
  */
case class BoundingBoxExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._
  override def dataType: DataType = StructType(Seq(
    StructField("xmin", DoubleType), StructField("ymin", DoubleType),
    StructField("xmax", DoubleType), StructField("ymax", DoubleType)))
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.ArrayData
    val pts = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    def addPoint(r: InternalRow): Unit = pts += ((r.getDouble(0), r.getDouble(1)))
    def addRing(a: ArrayData): Unit =
      (0 until a.numElements()).foreach(i => addPoint(a.getStruct(i, 2)))
    child.dataType match {
      case _: StructType => addPoint(v.asInstanceOf[InternalRow])
      case ArrayType(_: StructType, _) => addRing(v.asInstanceOf[ArrayData])
      case ArrayType(ArrayType(_: StructType, _), _) =>
        val rings = v.asInstanceOf[ArrayData]
        (0 until rings.numElements()).foreach(i => addRing(rings.getArray(i)))
      case other => throw new IllegalArgumentException(
        s"ST_BOUNDINGBOX: not a geography value: ${other.simpleString}")
    }
    if (pts.isEmpty) throw new IllegalArgumentException(
      "ST_BOUNDINGBOX: empty geography")
    org.apache.spark.sql.catalyst.InternalRow(
      pts.map(_._1).min, pts.map(_._2).min, pts.map(_._1).max, pts.map(_._2).max)
  }
  override protected def withNewChildInternal(newChild: Expression): BoundingBoxExpr =
    copy(child = newChild)
}

/** ST_GEOMETRYTYPE / ST_NUMPOINTS / ST_DIMENSION — pure metadata over
  * the static shape (r12). NUMPOINTS counts DISTINCT vertices the way
  * S2 loops store them: an explicitly-closed ring's duplicate closing
  * vertex is not double-counted.
  */
case class GeogMetaExpr(child: Expression, fn: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._
  override def dataType: DataType =
    if (fn == "ST_GEOMETRYTYPE") StringType else LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (GeoShapes.isPoint(child.dataType) || GeoShapes.isLine(child.dataType) ||
      GeoShapes.isPolygon(child.dataType)) TypeCheckSuccess
    else TypeCheckFailure(
      s"$fn: not a geography value: ${child.dataType.simpleString}")
  }
  private def ringCount(r: Array[(Double, Double)]): Long =
    if (r.length >= 2 && r.head == r.last) r.length - 1L else r.length.toLong
  override protected def nullSafeEval(v: Any): Any = {
    val dt = child.dataType
    fn match {
      case "ST_GEOMETRYTYPE" =>
        org.apache.spark.unsafe.types.UTF8String.fromString(
          if (GeoShapes.isPoint(dt)) "ST_Point"
          else if (GeoShapes.isLine(dt)) "ST_LineString" else "ST_Polygon")
      case "ST_DIMENSION" =>
        if (GeoShapes.isPoint(dt)) 0L else if (GeoShapes.isLine(dt)) 1L else 2L
      case _ => // ST_NUMPOINTS
        if (GeoShapes.isPoint(dt)) 1L
        else if (GeoShapes.isLine(dt)) GeoShapes.line(v).length.toLong
        else GeoShapes.polygon(v).map(ringCount).sum
    }
  }
  override protected def withNewChildInternal(newChild: Expression): GeogMetaExpr =
    copy(child = newChild)
}

/** ST_POINTN (and ST_STARTPOINT/ST_ENDPOINT through it): 1-based
  * vertex access on a LINESTRING, negative n counts from the end,
  * n = 0 or out of range errors like BigQuery. Typed: a polygon
  * argument fails analysis (element_at would silently return a ring).
  */
case class LinePointExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._
  override def dataType: DataType = left.dataType match {
    case ArrayType(e, _) => e
    case _ => StructType(Seq(StructField("lon", DoubleType),
      StructField("lat", DoubleType)))
  }
  override def nullable: Boolean = true
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (!GeoShapes.isLine(left.dataType)) TypeCheckFailure(
      s"ST_POINTN family: requires a linestring, got " +
        s"${GeoShapes.shapeName(left.dataType)}")
    else if (!Seq(IntegerType, LongType, ShortType, ByteType)
        .contains(right.dataType)) TypeCheckFailure(
      "ST_POINTN: the index must be an integer")
    else TypeCheckSuccess
  }
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val len = a.numElements()
    val n = r match {
      case i: Int => i.toLong; case i: Long => i
      case i: Short => i.toLong; case i: Byte => i.toLong
    }
    val idx = if (n > 0) n - 1 else len + n // 1-based; negative from end
    if (n == 0 || idx < 0 || idx >= len) throw new IllegalArgumentException(
      s"ST_POINTN: index $n out of range for a $len-point linestring")
    a.getStruct(idx.toInt, 2).copy()
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LinePointExpr =
    copy(left = newLeft, right = newRight)
}

/** ST_GEOHASH(point[, maxchars]) — the public geohash encoding
  * (base-32 character alphabet, bit-interleaved lon/lat bisection,
  * odd bits lon-first). Deterministic, pinned to the published test
  * vectors ('ezs42' etc.); BigQuery default length 20.
  */
case class GeohashExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (!GeoShapes.isPoint(left.dataType)) TypeCheckFailure(
      s"ST_GEOHASH: requires a point, got ${GeoShapes.shapeName(left.dataType)}")
    else if (!Seq(IntegerType, LongType).contains(right.dataType))
      TypeCheckFailure("ST_GEOHASH: maxchars must be an integer")
    else TypeCheckSuccess
  }
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (lon, lat) = GeoShapes.point(l)
    val len = r.asInstanceOf[Number].intValue()
    if (len < 1 || len > 20) throw new IllegalArgumentException(
      s"ST_GEOHASH: maxchars must be in [1, 20], got $len")
    org.apache.spark.unsafe.types.UTF8String.fromString(
      Geohash.encode(lon, lat, len))
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GeohashExpr =
    copy(left = newLeft, right = newRight)
}

object Geohash {
  val ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"

  def encode(lon: Double, lat: Double, len: Int): String = {
    require(lon >= -180 && lon <= 180 && lat >= -90 && lat <= 90,
      s"ST_GEOHASH: point out of range ($lon, $lat)")
    var (lonLo, lonHi) = (-180.0, 180.0)
    var (latLo, latHi) = (-90.0, 90.0)
    val sb = new StringBuilder
    var evenBit = true // geohash interleave starts with longitude
    var bits = 0
    var ch = 0
    while (sb.length < len) {
      if (evenBit) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
        else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else { ch = ch << 1; latHi = mid }
      }
      evenBit = !evenBit
      bits += 1
      if (bits == 5) { sb += ALPHABET.charAt(ch); bits = 0; ch = 0 }
    }
    sb.toString
  }

  /** Decode to the CELL CENTER (BigQuery's ST_GEOGPOINTFROMGEOHASH). */
  def decodeCenter(hash: String): (Double, Double) = {
    require(hash.nonEmpty, "ST_GEOGPOINTFROMGEOHASH: empty geohash")
    var (lonLo, lonHi) = (-180.0, 180.0)
    var (latLo, latHi) = (-90.0, 90.0)
    var evenBit = true
    hash.toLowerCase.foreach { c =>
      val v = ALPHABET.indexOf(c)
      if (v < 0) throw new IllegalArgumentException(
        s"ST_GEOGPOINTFROMGEOHASH: invalid geohash character '$c'")
      var b = 4
      while (b >= 0) {
        val bit = (v >> b) & 1
        if (evenBit) {
          val mid = (lonLo + lonHi) / 2
          if (bit == 1) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (bit == 1) latLo = mid else latHi = mid
        }
        evenBit = !evenBit
        b -= 1
      }
    }
    ((lonLo + lonHi) / 2, (latLo + latHi) / 2)
  }
}

/** ST_GEOGPOINTFROMGEOHASH(hash) → the cell-center point. */
case class GeohashDecodeExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._
  override def dataType: DataType = StructType(Seq(
    StructField("lon", DoubleType), StructField("lat", DoubleType)))
  override def nullable: Boolean = true
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType == StringType) TypeCheckSuccess
    else TypeCheckFailure("ST_GEOGPOINTFROMGEOHASH: requires a STRING")
  }
  override protected def nullSafeEval(v: Any): Any = {
    val (lon, lat) = Geohash.decodeCenter(v.toString)
    org.apache.spark.sql.catalyst.InternalRow(lon, lat)
  }
  override protected def withNewChildInternal(
      newChild: Expression): GeohashDecodeExpr = copy(child = newChild)
}

object GeoKernels {
  def register(spark: SparkSession): Unit = {
    if (spark.sessionState.functionRegistry.functionExists(
        FunctionIdentifier("graft_st_x"))) return
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_st_x", e => PointFieldExpr(e.head, "ST_X", "lon"), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_st_y", e => PointFieldExpr(e.head, "ST_Y", "lat"), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_st_area", e => PolygonMeasureExpr(e.head, "ST_AREA"), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_st_perimeter", e => PolygonMeasureExpr(e.head, "ST_PERIMETER"), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_st_contains", e => PolygonContainsExpr(e(0), e(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_st_bbox", e => BoundingBoxExpr(e.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_st_astext", e => GeogAsTextExpr(e.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_st_intersects", e => GeogIntersectsExpr(e(0), e(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_st_geometrytype", e => GeogMetaExpr(e.head, "ST_GEOMETRYTYPE"), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_st_numpoints", e => GeogMetaExpr(e.head, "ST_NUMPOINTS"), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_st_dimension", e => GeogMetaExpr(e.head, "ST_DIMENSION"), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_st_pointn", e => LinePointExpr(e(0), e(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_st_geohash", e => GeohashExpr(e(0), e(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_st_fromgeohash", e => GeohashDecodeExpr(e.head), "scala_udf")
  }
}
