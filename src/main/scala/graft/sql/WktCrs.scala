package graft.sql

/** OGC WKT1 / ESRI WKT coordinate-system parser — the `.prj` sidecar
  * format every shapefile in the wild carries (reference: geopandas gets
  * `.prj` handling free through pyogrio/pyproj; pyproj accepts WKT CRS
  * strings in `to_crs`, `expr.py:255-257`).
  *
  * Strategy: parse the nested `KEYWORD[...]` tree, then REDUCE to a CRS
  * string the rest of this engine already understands —
  *   - an `EPSG:xxxx` code when the outermost AUTHORITY node carries one
  *     (the authoritative identity; preferred whenever present), else
  *   - a synthesized proj record built from PROJECTION/PARAMETER/SPHEROID/
  *     TOWGS84/UNIT nodes, mapped through the published ESRI/OGC
  *     projection-name tables onto the kernel families in [[Crs]].
  * Unit-aware: a PROJCS UNIT factor != 1 (the US State Plane feet zones)
  * converts the false offsets to meters and emits `+to_meter=`, matching
  * proj's unit semantics. GEOGCS-only strings resolve to `EPSG:4326` when
  * they name WGS84 (the overwhelmingly common `.prj`), else to a
  * `+proj=longlat` record on the declared spheroid.
  *
  * Returns None for WKT naming a projection family the engine lacks —
  * callers surface the supported set instead of mis-parsing.
  */
object WktCrs {

  // ----------------------------------------------------------- tree model
  sealed trait Node
  final case class Obj(name: String, args: Vector[Node]) extends Node
  final case class Str(v: String) extends Node
  final case class Num(v: Double) extends Node

  /** Parse one WKT node: `NAME[arg, arg, ...]` with quoted strings,
    * numbers, and nested nodes. WKT1 is LL(1) — a hand parser suffices.
    */
  def parseTree(s: String): Option[Obj] = {
    val in = s.trim
    var i = 0
    def ws(): Unit = while (i < in.length && in(i).isWhitespace) i += 1
    def ident(): String = {
      val start = i
      while (i < in.length && (in(i).isLetterOrDigit || in(i) == '_')) i += 1
      in.substring(start, i)
    }
    def node(): Node = {
      ws()
      if (in(i) == '"') {
        i += 1
        val start = i
        while (i < in.length && in(i) != '"') i += 1
        val v = in.substring(start, i)
        i += 1
        Str(v)
      } else if (in(i) == '-' || in(i) == '+' || in(i) == '.' || in(i).isDigit) {
        val start = i
        while (i < in.length && "+-.0123456789eE".indexOf(in(i)) >= 0) i += 1
        Num(in.substring(start, i).toDouble)
      } else {
        val name = ident()
        ws()
        // WKT2 has bare enumeration keywords (CS[Cartesian,2], axis
        // directions `east`/`north`) — an identifier not followed by a
        // bracket is an atom, not a node
        if (i >= in.length || (in(i) != '[' && in(i) != '(')) return Str(name)
        // WKT1 uses [ ]; some writers emit ( )
        val open = in(i); require(open == '[' || open == '(', s"expected [ at $i")
        val close = if (open == '[') ']' else ')'
        i += 1
        val args = Vector.newBuilder[Node]
        ws()
        if (in(i) != close) {
          args += node(); ws()
          while (in(i) == ',') { i += 1; args += node(); ws() }
        }
        require(in(i) == close, s"expected $close at $i")
        i += 1
        Obj(name.toUpperCase, args.result())
      }
    }
    try node() match { case o: Obj => Some(o); case _ => None }
    catch { case _: Exception => None }
  }

  // ------------------------------------------------------------ reduction

  private def children(o: Obj, name: String): Seq[Obj] =
    o.args.collect { case c: Obj if c.name == name => c }
  private def child(o: Obj, name: String): Option[Obj] = children(o, name).headOption
  private def firstStr(o: Obj): Option[String] = o.args.collectFirst { case Str(v) => v }
  private def nums(o: Obj): Seq[Double] = o.args.collect { case Num(v) => v }

  private def authority(o: Obj): Option[String] =
    // the LAST direct AUTHORITY child is the node's own identity
    children(o, "AUTHORITY").lastOption.flatMap { a =>
      a.args.toList match {
        case Str(auth) :: Str(code) :: _ if code.forall(_.isDigit) =>
          Some(auth.toUpperCase + ":" + code)
        case _ => None
      }
    }

  /** ESRI / OGC projection names -> proj family. Published mapping (the
    * same table OGR's WKT importer carries).
    */
  private val projNames: Map[String, String] = Map(
    "TRANSVERSE_MERCATOR" -> "tmerc",
    "GAUSS_KRUGER" -> "tmerc",
    "LAMBERT_CONFORMAL_CONIC" -> "lcc",
    "LAMBERT_CONFORMAL_CONIC_2SP" -> "lcc",
    "LAMBERT_CONFORMAL_CONIC_1SP" -> "lcc1sp",
    "ALBERS" -> "aea",
    "ALBERS_CONIC_EQUAL_AREA" -> "aea",
    "LAMBERT_AZIMUTHAL_EQUAL_AREA" -> "laea",
    "CYLINDRICAL_EQUAL_AREA" -> "cea",
    "MERCATOR" -> "merc",
    "MERCATOR_1SP" -> "merc1sp",
    "MERCATOR_2SP" -> "merc",
    "MERCATOR_AUXILIARY_SPHERE" -> "webmerc",
    "POPULAR_VISUALISATION_PSEUDO_MERCATOR" -> "webmerc",
    "POLAR_STEREOGRAPHIC" -> "stere_polar",
    "STEREOGRAPHIC_NORTH_POLE" -> "stere_polar",
    "STEREOGRAPHIC_SOUTH_POLE" -> "stere_polar",
    "OBLIQUE_STEREOGRAPHIC" -> "sterea",
    "DOUBLE_STEREOGRAPHIC" -> "sterea",
    "CASSINI_SOLDNER" -> "cass",
    "CASSINI" -> "cass",
    "SINUSOIDAL" -> "sinu",
    "MOLLWEIDE" -> "moll",
    "ECKERT_IV" -> "eck4",
    "MILLER_CYLINDRICAL" -> "mill",
    "ROBINSON" -> "robin",
    "VANDERGRINTEN" -> "vandg",
    "VAN_DER_GRINTEN_I" -> "vandg",
    "GNOMONIC" -> "gnom",
    "ORTHOGRAPHIC" -> "ortho",
    "AZIMUTHAL_EQUIDISTANT" -> "aeqd",
    "EQUIDISTANT_CONIC" -> "eqdc",
    "POLYCONIC" -> "poly",
    "KROVAK" -> "krovak",
    "HOTINE_OBLIQUE_MERCATOR_AZIMUTH_CENTER" -> "omerc",
    "HOTINE_OBLIQUE_MERCATOR" -> "omerc_nouoff",
    "EQUAL_EARTH" -> "eqearth",
    "BONNE" -> "bonne")

  /** Reduce a parsed WKT1 CRS to a string [[Crs.projFor]] / the EPSG
    * table understands. Preference order: outer AUTHORITY EPSG code
    * (when this engine supports it), else a synthesized proj record.
    */
  /** A non-Greenwich PRIMEM (Paris/Ferro historic datums) would silently
    * shift every longitude if ignored — reject the whole CRS instead.
    */
  private def greenwichPrimem(geogcs: Obj): Boolean =
    child(geogcs, "PRIMEM").forall(p =>
      nums(p).headOption.forall(v => math.abs(v) < 1e-12))

  def reduce(root: Obj): Option[String] = root.name match {
    // WKT2 (ISO 19162) heads adapt onto the WKT1 shapes below
    case "GEOGCRS" | "GEODCRS" => wkt2Geog(root).flatMap(reduce)
    case "PROJCRS"             => wkt2Proj(root).flatMap(reduce)
    case "BOUNDCRS"            => wkt2Bound(root).flatMap(reduce)
    case "GEOGCS" if !greenwichPrimem(root) => None
    case "GEOGCS" =>
      authority(root) match {
        case Some(code) if code == "EPSG:4326" => Some(code)
        case other =>
          val name = firstStr(root).getOrElse("")
          if (name.toUpperCase.contains("WGS") && name.contains("84")) Some("EPSG:4326")
          else {
            // WGS84-equivalent geographic datums resolve like normCrs
            val up = name.toUpperCase
            val equiv = Seq("NAD83", "NORTH_AMERICAN_1983", "ETRS", "GDA", "NZGD2000")
            if (other.exists(Set("EPSG:4269", "EPSG:4258", "EPSG:4283",
                "EPSG:7844", "EPSG:4167", "EPSG:6668")) ||
                equiv.exists(up.contains)) Some("EPSG:4326")
            else spheroidOf(root).map { case (a, rf) =>
              val tow = towgs84Of(root).map(t => s" +towgs84=$t").getOrElse("")
              s"+proj=longlat +a=$a +rf=$rf$tow"
            }
          }
      }
    case "PROJCS" =>
      val geog = child(root, "GEOGCS")
      if (!geog.forall(greenwichPrimem)) return None
      val sph = geog.flatMap(spheroidOf)
      val projName = child(root, "PROJECTION").flatMap(firstStr).map(_.toUpperCase)
      val params: Map[String, Double] = children(root, "PARAMETER").flatMap { p =>
        (firstStr(p), nums(p).headOption) match {
          case (Some(n), Some(v)) => Some(n.toUpperCase -> v)
          case _ => None
        }
      }.toMap
      def pm(keys: String*): Option[Double] = keys.flatMap(k => params.get(k.toUpperCase)).headOption
      def p0(keys: String*): Double = pm(keys: _*).getOrElse(0.0)
      // unit factor (meters per unit); false offsets are in this unit
      val unit = child(root, "UNIT").map(nums).flatMap(_.headOption).getOrElse(1.0)
      // prefer the authoritative code when the engine can already serve it
      val auth = authority(root)
      val authServed = auth.filter(Crs.servedAuthority)
      if (authServed.isDefined) return authServed
      for {
        (a, rf) <- sph
        fam <- projName.flatMap(projNames.get)
      } yield {
        val lat0 = p0("latitude_of_origin", "latitude_of_center")
        val lon0 = p0("central_meridian", "longitude_of_center")
        val k = pm("scale_factor").getOrElse(1.0)
        val feM = p0("false_easting") * unit
        val fnM = p0("false_northing") * unit
        val sp1 = pm("standard_parallel_1")
        val sp2 = pm("standard_parallel_2")
        val core = fam match {
          case "tmerc" => s"+proj=tmerc +lat_0=$lat0 +lon_0=$lon0 +k=$k"
          case "lcc" =>
            val l1 = sp1.getOrElse(lat0); val l2 = sp2.getOrElse(l1)
            s"+proj=lcc +lat_0=$lat0 +lon_0=$lon0 +lat_1=$l1 +lat_2=$l2 +k_0=$k"
          case "lcc1sp" =>
            s"+proj=lcc +lat_0=$lat0 +lon_0=$lon0 +lat_1=$lat0 +lat_2=$lat0 +k_0=$k"
          case "aea" =>
            s"+proj=aea +lat_0=$lat0 +lon_0=$lon0 +lat_1=${sp1.getOrElse(lat0)} +lat_2=${sp2.getOrElse(sp1.getOrElse(lat0))}"
          case "laea" => s"+proj=laea +lat_0=$lat0 +lon_0=$lon0"
          case "cea"  => s"+proj=cea +lat_ts=${sp1.getOrElse(0.0)} +lon_0=$lon0"
          case "merc" => sp1 match {
            case Some(ts) => s"+proj=merc +lat_ts=$ts +lon_0=$lon0"
            case None     => s"+proj=merc +lon_0=$lon0 +k=$k"
          }
          case "merc1sp" => s"+proj=merc +lon_0=$lon0 +k=$k"
          case "webmerc" => s"+proj=webmerc +lon_0=$lon0"
          case "stere_polar" =>
            val ts = sp1.getOrElse(lat0)
            val pole = if (ts < 0 || lat0 < 0) -90.0 else 90.0
            s"+proj=stere +lat_0=$pole +lat_ts=$ts +lon_0=$lon0 +k=$k"
          case "sterea" => s"+proj=sterea +lat_0=$lat0 +lon_0=$lon0 +k=$k"
          case "cass"   => s"+proj=cass +lat_0=$lat0 +lon_0=$lon0"
          case "sinu"   => s"+proj=sinu +lon_0=$lon0"
          case "moll"   => s"+proj=moll +lon_0=$lon0"
          case "eck4"   => s"+proj=eck4 +lon_0=$lon0"
          case "mill"   => s"+proj=mill +lon_0=$lon0"
          case "robin"  => s"+proj=robin +lon_0=$lon0"
          case "vandg"  => s"+proj=vandg +lon_0=$lon0"
          case "gnom"   => s"+proj=gnom +lat_0=$lat0 +lon_0=$lon0"
          case "ortho"  => s"+proj=ortho +lat_0=$lat0 +lon_0=$lon0"
          case "aeqd"   => s"+proj=aeqd +lat_0=$lat0 +lon_0=$lon0"
          case "eqdc"   =>
            s"+proj=eqdc +lat_0=$lat0 +lon_0=$lon0 +lat_1=${sp1.getOrElse(lat0)} +lat_2=${sp2.getOrElse(sp1.getOrElse(lat0))}"
          case "poly"   => s"+proj=poly +lat_0=$lat0 +lon_0=$lon0"
          case "eqearth" => s"+proj=eqearth +lon_0=$lon0"
          case "bonne"  => s"+proj=bonne +lat_1=${sp1.getOrElse(lat0)} +lon_0=$lon0"
          case "krovak" => s"+proj=krovak"
          case "omerc" | "omerc_nouoff" =>
            val az = p0("azimuth")
            val gam = pm("rectified_grid_angle").map(g => s" +gamma=$g").getOrElse("")
            val off = if (fam == "omerc_nouoff") " +no_uoff" else ""
            s"+proj=omerc +lat_0=$lat0 +lonc=${p0("longitude_of_center", "central_meridian")} +alpha=$az +k_0=$k$gam$off"
          case other => return None
        }
        val tow = geog.flatMap(towgs84Of).map(t => s" +towgs84=$t").getOrElse("")
        val um = if (math.abs(unit - 1.0) > 1e-12) s" +to_meter=$unit" else ""
        s"$core +a=$a +rf=$rf +x_0=$feM +y_0=$fnM$tow$um"
      }
    case _ => None
  }

  private def spheroidOf(geogcs: Obj): Option[(Double, Double)] =
    child(geogcs, "DATUM").flatMap(child(_, "SPHEROID")).flatMap { s =>
      nums(s) match {
        case Seq(a, rf, _*) =>
          // rf = 0 marks a sphere in WKT1; the record grammar wants a
          // finite rf — a huge one is flattening 0 to double precision
          Some((a, if (rf == 0.0) 1e12 else rf))
        case _ => None
      }
    }

  private def towgs84Of(geogcs: Obj): Option[String] =
    child(geogcs, "DATUM").flatMap(child(_, "TOWGS84")).map { t =>
      nums(t).padTo(7, 0.0).take(7).mkString(",")
    }.filter(_.split(",").exists(_.toDouble != 0.0))

  // ---------------------------------------------- WKT2 (ISO 19162) input

  /** WKT2 is what pyproj >= 3 and modern GDAL emit by default, so real
    * `.prj` sidecars / CRS metadata increasingly arrive in it. The grammar
    * is the same bracket tree; node names, EPSG method/parameter spellings,
    * and unit handling differ. Strategy: ADAPT the WKT2 tree onto the
    * WKT1 shape [[reduce]] already serves (same preference order: served
    * ID/AUTHORITY code first, else a synthesized proj record), converting
    * per-parameter units (ANGLEUNIT grad/radian -> degree, LENGTHUNIT ->
    * the CS unit) in the process. Axis order nodes are ignored — the
    * engine's coordinates are always lon/lat, easting/northing (the same
    * always-xy convention the reference applies via pyproj).
    */

  /** EPSG method names (WKT2 METHOD) -> the WKT1 projection names in
    * [[projNames]]. Published mapping (EPSG Guidance Note 7-2 method
    * names; same table GDAL's WKT2->WKT1 exporter carries).
    */
  private val wkt2Methods: Map[String, String] = Map(
    "TRANSVERSE MERCATOR" -> "TRANSVERSE_MERCATOR",
    "GAUSS-KRUGER" -> "TRANSVERSE_MERCATOR",
    "LAMBERT CONIC CONFORMAL (2SP)" -> "LAMBERT_CONFORMAL_CONIC_2SP",
    "LAMBERT CONIC CONFORMAL (1SP)" -> "LAMBERT_CONFORMAL_CONIC_1SP",
    "ALBERS EQUAL AREA" -> "ALBERS_CONIC_EQUAL_AREA",
    "LAMBERT AZIMUTHAL EQUAL AREA" -> "LAMBERT_AZIMUTHAL_EQUAL_AREA",
    "LAMBERT CYLINDRICAL EQUAL AREA" -> "CYLINDRICAL_EQUAL_AREA",
    "MERCATOR (VARIANT A)" -> "MERCATOR_1SP",
    "MERCATOR (VARIANT B)" -> "MERCATOR_2SP",
    "POPULAR VISUALISATION PSEUDO MERCATOR" -> "POPULAR_VISUALISATION_PSEUDO_MERCATOR",
    "POLAR STEREOGRAPHIC (VARIANT A)" -> "POLAR_STEREOGRAPHIC",
    "POLAR STEREOGRAPHIC (VARIANT B)" -> "POLAR_STEREOGRAPHIC",
    "OBLIQUE STEREOGRAPHIC" -> "OBLIQUE_STEREOGRAPHIC",
    "CASSINI-SOLDNER" -> "CASSINI_SOLDNER",
    "SINUSOIDAL" -> "SINUSOIDAL",
    "MOLLWEIDE" -> "MOLLWEIDE",
    "ECKERT IV" -> "ECKERT_IV",
    "MILLER CYLINDRICAL" -> "MILLER_CYLINDRICAL",
    "ROBINSON" -> "ROBINSON",
    "VAN DER GRINTEN" -> "VANDERGRINTEN",
    "GNOMONIC" -> "GNOMONIC",
    "ORTHOGRAPHIC" -> "ORTHOGRAPHIC",
    "AZIMUTHAL EQUIDISTANT" -> "AZIMUTHAL_EQUIDISTANT",
    "MODIFIED AZIMUTHAL EQUIDISTANT" -> "AZIMUTHAL_EQUIDISTANT",
    "EQUIDISTANT CONIC" -> "EQUIDISTANT_CONIC",
    "AMERICAN POLYCONIC" -> "POLYCONIC",
    "KROVAK" -> "KROVAK",
    "HOTINE OBLIQUE MERCATOR (VARIANT A)" -> "HOTINE_OBLIQUE_MERCATOR",
    "HOTINE OBLIQUE MERCATOR (VARIANT B)" -> "HOTINE_OBLIQUE_MERCATOR_AZIMUTH_CENTER",
    "EQUAL EARTH" -> "EQUAL_EARTH",
    "BONNE" -> "BONNE")

  /** EPSG parameter names (WKT2 PARAMETER) -> WKT1 parameter names. */
  private val wkt2Params: Map[String, String] = Map(
    "LATITUDE OF NATURAL ORIGIN" -> "latitude_of_origin",
    "LONGITUDE OF NATURAL ORIGIN" -> "central_meridian",
    "SCALE FACTOR AT NATURAL ORIGIN" -> "scale_factor",
    "FALSE EASTING" -> "false_easting",
    "FALSE NORTHING" -> "false_northing",
    "LATITUDE OF FALSE ORIGIN" -> "latitude_of_origin",
    "LONGITUDE OF FALSE ORIGIN" -> "central_meridian",
    "EASTING AT FALSE ORIGIN" -> "false_easting",
    "NORTHING AT FALSE ORIGIN" -> "false_northing",
    "LATITUDE OF 1ST STANDARD PARALLEL" -> "standard_parallel_1",
    "LATITUDE OF 2ND STANDARD PARALLEL" -> "standard_parallel_2",
    "LATITUDE OF STANDARD PARALLEL" -> "standard_parallel_1",
    "LONGITUDE OF ORIGIN" -> "central_meridian",
    "LATITUDE OF PROJECTION CENTRE" -> "latitude_of_center",
    "LONGITUDE OF PROJECTION CENTRE" -> "longitude_of_center",
    "AZIMUTH OF INITIAL LINE" -> "azimuth",
    "AZIMUTH AT PROJECTION CENTRE" -> "azimuth",
    "ANGLE FROM RECTIFIED TO SKEW GRID" -> "rectified_grid_angle",
    "ANGLE FROM RECTIFIED TO SKEWED GRID" -> "rectified_grid_angle",
    "SCALE FACTOR ON INITIAL LINE" -> "scale_factor",
    "SCALE FACTOR AT PROJECTION CENTRE" -> "scale_factor",
    "EASTING AT PROJECTION CENTRE" -> "false_easting",
    "NORTHING AT PROJECTION CENTRE" -> "false_northing")

  private val angleParamNames = Set("latitude_of_origin", "central_meridian",
    "standard_parallel_1", "standard_parallel_2", "latitude_of_center",
    "longitude_of_center", "azimuth", "rectified_grid_angle")

  /** degrees per unit for a node's ANGLEUNIT/UNIT child (default: degree).
    * WKT2 unit factors are radians per unit.
    */
  private def angleFactorDeg(o: Obj): Double =
    child(o, "ANGLEUNIT").orElse(child(o, "UNIT")).flatMap(u => nums(u).headOption)
      .map { radPerUnit =>
        val f = radPerUnit * 180.0 / math.Pi
        // the WKT degree factor is a DECIMAL approximation of pi/180 — its
        // round trip lands 1 ulp off 1.0 and would perturb every converted
        // angle (lon_0=15 -> 14.999999999999998); degrees pass through exact
        if (math.abs(f - 1.0) < 1e-10) 1.0 else f
      }.getOrElse(1.0)

  /** meters per unit for a node's LENGTHUNIT/UNIT child (default: metre). */
  private def lengthFactorM(o: Obj): Double =
    child(o, "LENGTHUNIT").orElse(child(o, "UNIT")).flatMap(u => nums(u).headOption)
      .getOrElse(1.0)

  /** WKT2 ID[...] (code as number or string) -> a WKT1 AUTHORITY node. */
  private def idAuthority(o: Obj): Option[Obj] =
    children(o, "ID").lastOption.flatMap { id =>
      id.args.toList match {
        case Str(auth) :: rest =>
          rest.collectFirst {
            case Num(v) if v == math.floor(v) => v.toLong.toString
            case Str(s) if s.nonEmpty && s.forall(_.isDigit) => s
          }.map(code => Obj("AUTHORITY", Vector(Str(auth), Str(code))))
        case _ => None
      }
    }.orElse(children(o, "AUTHORITY").lastOption)

  /** ELLIPSOID under DATUM / datum ENSEMBLE / TRF, semi-major converted to
    * meters via its own LENGTHUNIT.
    */
  private def wkt2Ellipsoid(datum: Obj): Option[(Double, Double)] =
    child(datum, "ELLIPSOID").orElse(child(datum, "SPHEROID")).flatMap { e =>
      nums(e) match {
        case Seq(a, rf, _*) =>
          Some((a * lengthFactorM(e), if (rf == 0.0) 1e12 else rf))
        case _ => None
      }
    }

  /** GEOGCRS / GEODCRS / BASEGEOGCRS / BASEGEODCRS -> a WKT1 GEOGCS node
    * [[reduce]] serves. None for a non-Greenwich prime meridian (same
    * rejection as WKT1 — ignoring it would shift every longitude).
    */
  private def wkt2Geog(g: Obj): Option[Obj] = {
    val datum = child(g, "DATUM").orElse(child(g, "ENSEMBLE")).orElse(child(g, "TRF"))
    val primOk = child(g, "PRIMEM").forall { p =>
      math.abs(nums(p).headOption.getOrElse(0.0) * angleFactorDeg(p)) < 1e-12
    }
    if (!primOk) None
    else datum.flatMap(wkt2Ellipsoid).map { case (a, rf) =>
      val dName = datum.flatMap(firstStr).getOrElse("unnamed")
      Obj("GEOGCS", Vector[Node](Str(firstStr(g).getOrElse("unnamed")),
        Obj("DATUM", Vector(Str(dName),
          Obj("SPHEROID", Vector(Str(dName), Num(a), Num(rf))))),
        Obj("PRIMEM", Vector(Str("Greenwich"), Num(0.0)))) ++
        idAuthority(g).toVector)
    }
  }

  /** PROJCRS -> a WKT1 PROJCS node: BASEGEOGCRS adapts through
    * [[wkt2Geog]], the CONVERSION's METHOD/PARAMETERs map through the
    * EPSG-name tables with angle parameters converted to degrees and
    * length parameters to the CS unit (so the WKT1 unit-scaling semantics
    * — false offsets in CS units, `+to_meter` for non-metric grids —
    * apply unchanged).
    */
  private def wkt2Proj(root: Obj): Option[Obj] = {
    // CS unit: a LENGTHUNIT directly under PROJCRS (after the axes) or
    // inside the first AXIS node
    val csUnitM = child(root, "LENGTHUNIT").orElse(child(root, "UNIT"))
      .flatMap(u => nums(u).headOption)
      .orElse(children(root, "AXIS").headOption.map(lengthFactorM))
      .getOrElse(1.0)
    for {
      base <- child(root, "BASEGEOGCRS").orElse(child(root, "BASEGEODCRS"))
      g1 <- wkt2Geog(base)
      conv <- child(root, "CONVERSION")
      methodName <- child(conv, "METHOD").flatMap(firstStr).map(_.toUpperCase)
      wkt1Proj <- wkt2Methods.get(methodName)
    } yield {
      val params: Vector[Node] = children(conv, "PARAMETER").flatMap { p =>
        for {
          pn <- firstStr(p).map(_.toUpperCase)
          w1 <- wkt2Params.get(pn)
          v <- nums(p).headOption
        } yield {
          val vv =
            if (angleParamNames(w1)) v * angleFactorDeg(p)
            else if (w1 == "false_easting" || w1 == "false_northing")
              v * lengthFactorM(p) / csUnitM // express in the CS unit
            else v
          Obj("PARAMETER", Vector(Str(w1), Num(vv))): Node
        }
      }.toVector
      Obj("PROJCS", Vector[Node](Str(firstStr(root).getOrElse("unnamed")), g1,
        Obj("PROJECTION", Vector(Str(wkt1Proj)))) ++ params ++
        Vector[Node](Obj("UNIT", Vector(Str("unit"), Num(csUnitM)))) ++
        idAuthority(root).toVector)
    }
  }

  /** BOUNDCRS: adapt the SOURCECRS and inject the ABRIDGEDTRANSFORMATION's
    * Helmert terms as a WKT1 TOWGS84 (abridged conventions: translations
    * in meters, rotations in arc-seconds, scale as the (1 + dS)
    * multiplier -> ppm).
    */
  private def wkt2Bound(root: Obj): Option[Obj] = {
    val src = child(root, "SOURCECRS")
      .flatMap(_.args.collectFirst { case o: Obj => o })
    val adapted = src.flatMap {
      case g if g.name == "GEOGCRS" || g.name == "GEODCRS" => wkt2Geog(g)
      case p if p.name == "PROJCRS" => wkt2Proj(p)
      case _ => None
    }
    val tow: Option[Obj] = child(root, "ABRIDGEDTRANSFORMATION").map { tr =>
      val pv: Map[String, Double] = children(tr, "PARAMETER").flatMap { p =>
        (firstStr(p).map(_.toUpperCase), nums(p).headOption) match {
          case (Some(n), Some(v)) => Some(n -> v)
          case _ => None
        }
      }.toMap
      def g(n: String): Double = pv.getOrElse(n, 0.0)
      val ppm = pv.get("SCALE DIFFERENCE").map(m => (m - 1.0) * 1e6).getOrElse(0.0)
      Obj("TOWGS84", Vector(
        Num(g("X-AXIS TRANSLATION")), Num(g("Y-AXIS TRANSLATION")),
        Num(g("Z-AXIS TRANSLATION")), Num(g("X-AXIS ROTATION")),
        Num(g("Y-AXIS ROTATION")), Num(g("Z-AXIS ROTATION")), Num(ppm)))
    }
    adapted.map { w1 =>
      tow match {
        case None => w1
        case Some(t) =>
          def addTow(o: Obj): Obj = o.name match {
            case "GEOGCS" => Obj("GEOGCS", o.args.map {
              case d: Obj if d.name == "DATUM" => Obj("DATUM", d.args :+ (t: Node))
              case other => other
            })
            case "PROJCS" => Obj("PROJCS", o.args.map {
              case g: Obj if g.name == "GEOGCS" => addTow(g): Node
              case other => other
            })
            case _ => o
          }
          addTow(w1)
      }
    }
  }

  // ------------------------------------------------------------ synthesis

  /** proj family -> WKT1 PROJECTION name + the parameters it carries, for
    * [[recordToWkt]] (the inverse direction of [[reduce]]'s name table).
    */
  private val famToWkt: Map[String, String] = Map(
    "tmerc" -> "Transverse_Mercator", "aea" -> "Albers_Conic_Equal_Area",
    "laea" -> "Lambert_Azimuthal_Equal_Area", "cea" -> "Cylindrical_Equal_Area",
    "sterea" -> "Oblique_Stereographic", "cass" -> "Cassini_Soldner",
    "sinu" -> "Sinusoidal", "moll" -> "Mollweide", "eck4" -> "Eckert_IV",
    "mill" -> "Miller_Cylindrical", "robin" -> "Robinson",
    "vandg" -> "VanDerGrinten", "gnom" -> "Gnomonic", "ortho" -> "Orthographic",
    "aeqd" -> "Azimuthal_Equidistant", "eqdc" -> "Equidistant_Conic",
    "poly" -> "Polyconic", "eqearth" -> "Equal_Earth", "bonne" -> "Bonne")

  /** Synthesize a WKT1 `.prj` body from a proj record in the supported
    * grammar — the write-direction closure of [[parse]]: for every record
    * R that [[Crs.parseProj]] serves, `parse(recordToWkt(R))` resolves to
    * a projection whose forward map equals R's (the spec asserts this
    * numerically per family). `+nadgrids` has no WKT1 expression — None.
    */
  def recordToWkt(rec: String): Option[String] = {
    val kv = rec.trim.split("\\s+").iterator.filter(_.startsWith("+"))
      .map(_.stripPrefix("+")).map { tok =>
        val i = tok.indexOf('=')
        if (i < 0) tok -> "" else tok.substring(0, i) -> tok.substring(i + 1)
      }.toMap
    if (kv.contains("nadgrids")) return None
    if (Crs.projFor(rec).isEmpty) return None
    def d(k: String, dflt: Double): Double =
      kv.get(k).map(_.toDouble).getOrElse(dflt)
    // ellipsoid values exactly as parseProj resolves them
    val named = Map("WGS84" -> (6378137.0, 298.257223563),
      "GRS80" -> (6378137.0, 298.257222101), "airy" -> (6377563.396, 299.3249646),
      "intl" -> (6378388.0, 297.0), "bessel" -> (6377397.155, 299.1528128),
      "krass" -> (6378245.0, 298.3), "clrk66" -> (6378206.4, 294.978698214))
    val (ea, erf) = kv.get("ellps").flatMap(named.get).getOrElse((6378137.0, 298.257223563))
    val a = d("a", ea)
    val rf = kv.get("rf").map(_.toDouble)
      .orElse(kv.get("b").map(b => a / (a - b.toDouble))).getOrElse(erf)
    val toM = d("to_meter", kv.get("units") match {
      case Some("ft") => 0.3048; case Some("us-ft") => 1200.0 / 3937.0; case _ => 1.0
    })
    val tow = kv.get("towgs84").map { t =>
      s""",TOWGS84[${t.split(",").map(_.trim).padTo(7, "0").take(7).mkString(",")}]"""
    }.getOrElse("")
    val geogcs = s"""GEOGCS["unnamed",DATUM["unnamed",SPHEROID["unnamed",$a,$rf]$tow],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]"""
    val fam = kv.getOrElse("proj", "")
    if (fam == "longlat" || fam == "latlong") return Some(geogcs)
    val lat0 = d("lat_0", 0.0); val lon0 = d("lon_0", 0.0)
    val k0 = d("k", d("k_0", 1.0))
    val feU = d("x_0", 0.0) / toM; val fnU = d("y_0", 0.0) / toM
    def p(n: String, v: Double) = s""",PARAMETER["$n",$v]"""
    val (projName, params): (String, String) = fam match {
      case "utm" =>
        val zone = kv("zone").toInt
        ("Transverse_Mercator",
          p("latitude_of_origin", 0.0) + p("central_meridian", zone * 6.0 - 183.0) +
            p("scale_factor", 0.9996) + p("false_easting", 500000.0 / toM) +
            p("false_northing", (if (kv.contains("south")) 10000000.0 else 0.0) / toM))
      case "tmerc" =>
        ("Transverse_Mercator", p("latitude_of_origin", lat0) +
          p("central_meridian", lon0) + p("scale_factor", k0) +
          p("false_easting", feU) + p("false_northing", fnU))
      case "lcc" =>
        val l1 = d("lat_1", lat0); val l2 = d("lat_2", l1)
        if (math.abs(l1 - l2) < 1e-9)
          ("Lambert_Conformal_Conic_1SP", p("latitude_of_origin", lat0) +
            p("central_meridian", lon0) + p("scale_factor", k0) +
            p("false_easting", feU) + p("false_northing", fnU))
        else
          ("Lambert_Conformal_Conic_2SP", p("standard_parallel_1", l1) +
            p("standard_parallel_2", l2) + p("latitude_of_origin", lat0) +
            p("central_meridian", lon0) +
            p("false_easting", feU) + p("false_northing", fnU))
      case "aea" =>
        ("Albers_Conic_Equal_Area", p("standard_parallel_1", d("lat_1", lat0)) +
          p("standard_parallel_2", d("lat_2", d("lat_1", lat0))) +
          p("latitude_of_origin", lat0) + p("central_meridian", lon0) +
          p("false_easting", feU) + p("false_northing", fnU))
      case "eqdc" =>
        ("Equidistant_Conic", p("standard_parallel_1", d("lat_1", lat0)) +
          p("standard_parallel_2", d("lat_2", d("lat_1", lat0))) +
          p("latitude_of_origin", lat0) + p("central_meridian", lon0) +
          p("false_easting", feU) + p("false_northing", fnU))
      case "cea" =>
        ("Cylindrical_Equal_Area", p("standard_parallel_1", d("lat_ts", 0.0)) +
          p("central_meridian", lon0) +
          p("false_easting", feU) + p("false_northing", fnU))
      case "merc" =>
        kv.get("lat_ts") match {
          case Some(ts) => ("Mercator_2SP", p("standard_parallel_1", ts.toDouble) +
            p("central_meridian", lon0) +
            p("false_easting", feU) + p("false_northing", fnU))
          case None => ("Mercator_1SP", p("central_meridian", lon0) +
            p("scale_factor", k0) +
            p("false_easting", feU) + p("false_northing", fnU))
        }
      case "webmerc" =>
        ("Popular_Visualisation_Pseudo_Mercator", p("central_meridian", lon0) +
          p("false_easting", feU) + p("false_northing", fnU))
      case "stere" =>
        ("Polar_Stereographic",
          p("latitude_of_origin", lat0) +
            p("standard_parallel_1", d("lat_ts", if (lat0 < 0) -90.0 else 90.0)) +
            p("central_meridian", lon0) + p("scale_factor", k0) +
            p("false_easting", feU) + p("false_northing", fnU))
      case "omerc" =>
        // the two-point form (+lat_1/lon_1/... without +alpha/+lonc) has
        // no WKT1 spelling — emitting azimuth=0 would be a WRONG sidecar
        if (!kv.contains("alpha") || !kv.contains("lonc")) return None
        val gam = kv.get("gamma").map(g => p("rectified_grid_angle", g.toDouble))
          .getOrElse("")
        val name = if (kv.contains("no_uoff") || kv.contains("no_off"))
          "Hotine_Oblique_Mercator" else "Hotine_Oblique_Mercator_Azimuth_Center"
        (name, p("latitude_of_center", lat0) +
          p("longitude_of_center", d("lonc", 0.0)) +
          p("azimuth", d("alpha", 0.0)) + gam + p("scale_factor", k0) +
          p("false_easting", feU) + p("false_northing", fnU))
      case "bonne" =>
        ("Bonne", p("standard_parallel_1", d("lat_1", 0.0)) +
          p("central_meridian", lon0) +
          p("false_easting", feU) + p("false_northing", fnU))
      case f if famToWkt.contains(f) =>
        // one-origin families: lat_0/lon_0 (+k where the parser reads it)
        (famToWkt(f), p("latitude_of_origin", lat0) + p("central_meridian", lon0) +
          p("scale_factor", k0) +
          p("false_easting", feU) + p("false_northing", fnU))
      case _ => return None // tpeqd/geos/krovak have no faithful WKT1 spelling here
    }
    val unit = if (math.abs(toM - 1.0) > 1e-12)
      s"""UNIT["unit",$toM]""" else """UNIT["metre",1]"""
    Some(s"""PROJCS["unnamed",$geogcs,PROJECTION["$projName"]$params,$unit]""")
  }

  private val wgs84Geogcs =
    """GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563,AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433],AUTHORITY["EPSG","4326"]]"""

  /** Synthesize a WKT1 `.prj` body: literal registry WKT for EPSG:4326 /
    * EPSG:3857 / the WGS84 UTM zones (authority-stamped), and
    * [[recordToWkt]] synthesis for ANY supported proj record (r11) —
    * covering every family [[Crs.parseProj]] serves except nadgrids /
    * tpeqd / geos / krovak, which have no faithful WKT1 spelling here.
    * Unsupported inputs return None and the writer skips the sidecar
    * (a WRONG .prj silently shifts data; absence just loses metadata).
    */
  def toWkt(crs: String): Option[String] = crs match {
    case rec if rec.trim.startsWith("+") => recordToWkt(rec)
    case "EPSG:4326" => Some(wgs84Geogcs)
    case "EPSG:3857" => Some(
      s"""PROJCS["WGS 84 / Pseudo-Mercator",$wgs84Geogcs,PROJECTION["Mercator_1SP"],PARAMETER["central_meridian",0],PARAMETER["scale_factor",1],PARAMETER["false_easting",0],PARAMETER["false_northing",0],UNIT["metre",1],EXTENSION["PROJ4","+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 +x_0=0 +y_0=0 +k=1 +units=m +nadgrids=@null +wktext +no_defs"],AUTHORITY["EPSG","3857"]]""")
    case utm if utm.matches("EPSG:32[67]\\d\\d") =>
      val code = utm.drop(5)
      val south = code.startsWith("327")
      val zone = code.drop(3).toInt
      val cm = zone * 6 - 183
      val fn = if (south) 10000000 else 0
      val hemi = if (south) "S" else "N"
      Some(s"""PROJCS["WGS 84 / UTM zone $zone$hemi",$wgs84Geogcs,PROJECTION["Transverse_Mercator"],PARAMETER["latitude_of_origin",0],PARAMETER["central_meridian",$cm],PARAMETER["scale_factor",0.9996],PARAMETER["false_easting",500000],PARAMETER["false_northing",$fn],UNIT["metre",1],AUTHORITY["EPSG","$code"]]""")
    case _ => None
  }

  /** Full entry point: WKT text -> a CRS string this engine serves, or
    * None (unsupported family / malformed). Memoized: st_transform
    * normalizes its CRS arguments per ROW, and a WKT parse must not run
    * 600k times for one query (same contract as Crs.projFor).
    */
  // ------------------------------------------------------------ PROJJSON

  private lazy val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** PROJJSON → the engine's normalized CRS. PROJJSON is the JSON form of
    * WKT2 and the encoding the GeoParquet spec (and pyproj ≥3 /
    * `to_json()`) uses for the `geo` footer's `crs` field — real
    * geopandas-written files carry an OBJECT here, not a string. The
    * adapter converts the JSON tree into the same WKT2 node shapes
    * [[reduce]] already handles (GEOGCRS/PROJCRS/BOUNDCRS with
    * METHOD/PARAMETER/ELLIPSOID/ID children, per-parameter unit nodes),
    * so the EPSG method/parameter tables and unit semantics are shared
    * with the WKT2 path. An authority `id` resolves first (the common
    * case: every EPSG-coded CRS), structural reduction covers id-less
    * custom CRS.
    */
  def parseProjJson(json: String): Option[String] = {
    val cached = cache.get(json)
    if (cached != null) return cached
    val r = try {
      val n = jsonMapper.readTree(json)
      // id short-circuits ONLY when the engine already serves the code
      // (the WKT path's authServed rule); a non-served EPSG id must fall
      // through to structural reduction of the parameters pyproj always
      // writes alongside it — otherwise st_transform rejects a CRS whose
      // full definition is sitting right there in the JSON
      val servable = (s: String) =>
        Crs.servedAuthority(s) || s.startsWith("+") && Crs.projFor(s).isDefined
      pjId(n).filter(Crs.servedAuthority)
        .orElse(pjToObj(n).flatMap(reduce).filter(servable))
    } catch { case scala.util.control.NonFatal(_) => None }
    if (cache.size < 4096) cache.put(json, r)
    r
  }

  private def pjId(n: com.fasterxml.jackson.databind.JsonNode): Option[String] =
    Option(n.get("id")).flatMap { id =>
      for {
        a <- Option(id.get("authority")).map(_.asText())
        c <- Option(id.get("code"))
          .map(c => if (c.isNumber) c.asLong().toString else c.asText())
        if a.nonEmpty && c.nonEmpty
      } yield s"${a.toUpperCase}:$c"
    }

  /** unit spec (string name or {type, conversion_factor} object) →
    * (kind, factor): angular = radians/unit, linear = meters/unit,
    * scale = multiplier/unit.
    */
  private def pjUnit(u: com.fasterxml.jackson.databind.JsonNode): Option[(String, Double)] = {
    if (u == null || u.isNull) None
    else if (u.isTextual) u.asText() match {
      case "degree" => Some(("angular", math.Pi / 180.0))
      case "arc-second" => Some(("angular", math.Pi / 180.0 / 3600.0))
      case "grad" => Some(("angular", math.Pi / 200.0))
      case "radian" => Some(("angular", 1.0))
      case "metre" | "meter" => Some(("linear", 1.0))
      case "kilometre" => Some(("linear", 1000.0))
      case "foot" => Some(("linear", 0.3048))
      case "US survey foot" => Some(("linear", 1200.0 / 3937.0))
      case "unity" => Some(("scale", 1.0))
      case "parts per million" => Some(("scale", 1e-6))
      case _ => None
    } else {
      val kind = Option(u.get("type")).map(_.asText()) match {
        case Some("AngularUnit") => "angular"
        case Some("LinearUnit") => "linear"
        case Some("ScaleUnit") => "scale"
        case _ => "other"
      }
      Option(u.get("conversion_factor")).filter(_.isNumber)
        .map(f => (kind, f.asDouble()))
    }
  }

  /** number, or {value, unit} converted through `want` ("linear" →
    * meters, "angular" → degrees).
    */
  private def pjVal(n: com.fasterxml.jackson.databind.JsonNode,
      want: String): Option[Double] = {
    if (n == null || n.isNull) None
    else if (n.isNumber) Some(n.asDouble())
    else for {
      v <- Option(n.get("value")).filter(_.isNumber).map(_.asDouble())
    } yield pjUnit(n.get("unit")) match {
      case Some(("linear", f)) if want == "linear" => v * f
      case Some(("angular", f)) if want == "angular" => v * f * 180.0 / math.Pi
      case _ => v
    }
  }

  private def pjToObj(n: com.fasterxml.jackson.databind.JsonNode): Option[Obj] =
    Option(n.get("type")).map(_.asText()).flatMap {
      case "GeographicCRS" | "GeodeticCRS" => pjGeog(n, "GEOGCRS")
      case "ProjectedCRS" => pjProj(n)
      case "BoundCRS" => pjBound(n)
      case _ => None
    }

  private def pjGeog(n: com.fasterxml.jackson.databind.JsonNode,
      head: String): Option[Obj] = {
    val datum = Option(n.get("datum")).orElse(Option(n.get("datum_ensemble")))
    for {
      d <- datum
      ell <- Option(d.get("ellipsoid"))
      a <- pjVal(ell.get("semi_major_axis"), "linear")
        .orElse(pjVal(ell.get("radius"), "linear"))
    } yield {
      val rf = Option(ell.get("inverse_flattening")).filter(_.isNumber)
        .map(_.asDouble())
        .orElse(pjVal(ell.get("semi_minor_axis"), "linear")
          .map(b => if (b == a) 0.0 else a / (a - b)))
        .getOrElse(0.0)
      val name = Option(n.get("name")).map(_.asText()).getOrElse("unnamed")
      val dName = Option(d.get("name")).map(_.asText()).getOrElse(name)
      val primem = Option(n.get("prime_meridian")).flatMap { pm =>
        pjVal(pm.get("longitude"), "angular")
      }.map(lonDeg => Obj("PRIMEM", Vector(Str("pm"), Num(lonDeg))): Node)
      val id = pjId(n).map { code =>
        val Array(auth, c) = code.split(":", 2)
        Obj("ID", Vector(Str(auth), Str(c))): Node
      }
      Obj(head, Vector[Node](Str(name),
        Obj("DATUM", Vector(Str(dName),
          Obj("ELLIPSOID", Vector(Str(dName), Num(a), Num(rf)))))) ++
        primem.toVector ++ id.toVector)
    }
  }

  private def pjParam(p: com.fasterxml.jackson.databind.JsonNode): Option[Node] =
    for {
      name <- Option(p.get("name")).map(_.asText())
      v <- Option(p.get("value")).filter(_.isNumber).map(_.asDouble())
    } yield {
      val unitNode: Vector[Node] = pjUnit(p.get("unit")) match {
        case Some(("angular", f)) => Vector(Obj("ANGLEUNIT", Vector(Str("u"), Num(f))))
        case Some(("linear", f)) => Vector(Obj("LENGTHUNIT", Vector(Str("u"), Num(f))))
        case _ => Vector.empty
      }
      Obj("PARAMETER", Vector[Node](Str(name), Num(v)) ++ unitNode): Node
    }

  private def pjProj(n: com.fasterxml.jackson.databind.JsonNode): Option[Obj] =
    for {
      baseN <- Option(n.get("base_crs"))
      base <- pjGeog(baseN, "BASEGEOGCRS")
      conv <- Option(n.get("conversion"))
      method <- Option(conv.get("method")).flatMap(m => Option(m.get("name")))
        .map(_.asText())
    } yield {
      val params: Vector[Node] = Option(conv.get("parameters")) match {
        case Some(arr) if arr.isArray =>
          (0 until arr.size()).flatMap(i => pjParam(arr.get(i))).toVector
        case _ => Vector.empty
      }
      // CS unit from the first axis (GeoParquet/pyproj emit per-axis units)
      val csUnitM: Double = (for {
        cs <- Option(n.get("coordinate_system"))
        ax <- Option(cs.get("axis")).filter(a => a.isArray && a.size() > 0)
        (kind, f) <- pjUnit(ax.get(0).get("unit"))
        if kind == "linear"
      } yield f).getOrElse(1.0)
      val id = pjId(n).map { code =>
        val Array(auth, c) = code.split(":", 2)
        Obj("ID", Vector(Str(auth), Str(c))): Node
      }
      Obj("PROJCRS", Vector[Node](
        Str(Option(n.get("name")).map(_.asText()).getOrElse("unnamed")),
        base,
        Obj("CONVERSION", Vector[Node](Str("conv"),
          Obj("METHOD", Vector(Str(method)))) ++ params),
        Obj("LENGTHUNIT", Vector(Str("unit"), Num(csUnitM)))) ++ id.toVector)
    }

  private def pjBound(n: com.fasterxml.jackson.databind.JsonNode): Option[Obj] =
    for {
      srcN <- Option(n.get("source_crs"))
      src <- pjToObj(srcN)
    } yield {
      // Helmert terms normalized to the abridged conventions wkt2Bound
      // expects: translations meters, rotations arc-seconds, scale as the
      // (1 + dS) multiplier
      val tr: Vector[Node] = (for {
        t <- Option(n.get("transformation"))
        arr <- Option(t.get("parameters")).filter(_.isArray)
      } yield (0 until arr.size()).flatMap { i =>
        val p = arr.get(i)
        for {
          name <- Option(p.get("name")).map(_.asText())
          v <- Option(p.get("value")).filter(_.isNumber).map(_.asDouble())
        } yield {
          val u = pjUnit(p.get("unit"))
          val up = name.toUpperCase
          val vv =
            if (up.contains("TRANSLATION"))
              v * u.collect { case ("linear", f) => f }.getOrElse(1.0)
            else if (up.contains("ROTATION"))
              v * u.collect { case ("angular", f) => f }
                .getOrElse(math.Pi / 180.0 / 3600.0) / (math.Pi / 180.0 / 3600.0)
            else if (up.contains("SCALE"))
              1.0 + v * u.collect { case ("scale", f) => f }.getOrElse(1e-6)
            else v
          Obj("PARAMETER", Vector[Node](Str(name), Num(vv))): Node
        }
      }.toVector).getOrElse(Vector.empty)
      Obj("BOUNDCRS", Vector[Node](
        Obj("SOURCECRS", Vector(src)),
        Obj("ABRIDGEDTRANSFORMATION", Vector[Node](Str("t")) ++ tr)))
    }

  def parse(wkt: String): Option[String] = {
    val c = cache.get(wkt)
    if (c != null) return c
    val t = wkt.trim
    // case-insensitive head check (WKT keywords are case-insensitive and
    // mixed-case writers exist — e.g. "GeogCS[..."); must match normCrs's
    // detection or a recognized .prj falls through to the unsupported error
    val head = t.takeWhile(c => c.isLetterOrDigit || c == '_').toUpperCase
    val r =
      if (!WktHeads.contains(head)) None
      else parseTree(t).flatMap(reduce).filter { s =>
        s.startsWith("EPSG:") || Crs.projFor(s).isDefined
      }
    // bounded: distinct CRS strings in real queries number a handful, but
    // a pathological per-row GENERATED WKT column must not grow the cache
    // without limit — beyond the cap, parses stay correct, just uncached
    if (cache.size < 4096) cache.put(wkt, r)
    r
  }
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[String]]()

  /** Heads [[parse]] recognizes: WKT1/ESRI and WKT2 (ISO 19162) CRS text. */
  val WktHeads: Set[String] =
    Set("GEOGCS", "PROJCS", "GEOGCRS", "GEODCRS", "PROJCRS", "BOUNDCRS")
}
