package graft.sql

import org.scalatest.funsuite.AnyFunSuite

/** WKT1/ESRI `.prj` parsing: real-world sidecar strings reduce to CRS the
  * engine serves, synthesized records match the corresponding kernels
  * numerically, and unit-bearing (feet) grids scale correctly.
  */
class WktCrsSpec extends AnyFunSuite {

  test("ESRI GEOGCS WGS84 (the overwhelmingly common .prj) -> EPSG:4326") {
    val esri = """GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]"""
    assert(WktCrs.parse(esri).contains("EPSG:4326"))
    val ogc = """GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433],AUTHORITY["EPSG","4326"]]"""
    assert(WktCrs.parse(ogc).contains("EPSG:4326"))
    // NAD83 geographic resolves WGS84-equivalent, like normCrs
    val nad83 = """GEOGCS["GCS_North_American_1983",DATUM["D_North_American_1983",SPHEROID["GRS_1980",6378137.0,298.257222101]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]"""
    assert(WktCrs.parse(nad83).contains("EPSG:4326"))
    // WKT keywords are case-insensitive; mixed-case writers exist
    val mixed = """GeogCS["GCS_WGS_1984",Datum["D_WGS_1984",Spheroid["WGS_1984",6378137.0,298.257223563]],PriMem["Greenwich",0.0],Unit["Degree",0.0174532925199433]]"""
    assert(WktCrs.parse(mixed).contains("EPSG:4326"))
  }

  test("PROJCS with a served EPSG authority short-circuits to the code") {
    val bng = """PROJCS["OSGB 1936 / British National Grid",GEOGCS["OSGB 1936",DATUM["OSGB_1936",SPHEROID["Airy 1830",6377563.396,299.3249646]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],PARAMETER["latitude_of_origin",49],PARAMETER["central_meridian",-2],PARAMETER["scale_factor",0.9996012717],PARAMETER["false_easting",400000],PARAMETER["false_northing",-100000],UNIT["metre",1],AUTHORITY["EPSG","27700"]]"""
    assert(WktCrs.parse(bng).contains("EPSG:27700"))
    val utm = """PROJCS["WGS 84 / UTM zone 33N",GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],PARAMETER["latitude_of_origin",0],PARAMETER["central_meridian",15],PARAMETER["scale_factor",0.9996],PARAMETER["false_easting",500000],PARAMETER["false_northing",0],UNIT["metre",1],AUTHORITY["EPSG","32633"]]"""
    assert(WktCrs.parse(utm).contains("EPSG:32633"))
  }

  test("authority-less UTM PROJCS synthesizes a record matching the UTM kernel") {
    val wkt = """PROJCS["UTM_Zone_33N",GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],PARAMETER["latitude_of_origin",0.0],PARAMETER["central_meridian",15.0],PARAMETER["scale_factor",0.9996],PARAMETER["false_easting",500000.0],PARAMETER["false_northing",0.0],UNIT["Meter",1.0]]"""
    val rec = WktCrs.parse(wkt).get
    assert(rec.startsWith("+proj=tmerc"))
    val p = Crs.projFor(rec).get
    val (x, y) = p.forward(14.0, 47.0)
    val (ux, uy) = Crs.utmForward(14.0, 47.0, 33, southern = false)
    assert(math.abs(x - ux) < 0.01 && math.abs(y - uy) < 0.01,
      s"($x,$y) vs UTM ($ux,$uy)")
    val (lo, la) = p.inverse(x, y)
    assert(math.hypot(lo - 14.0, la - 47.0) < 1e-6)
  }

  test("US State Plane LCC in US survey feet: unit-scaled output, roundtrip") {
    // California zone 3 shape (NAD83, Lambert 2SP, US foot)
    val wkt = """PROJCS["NAD_1983_StatePlane_California_III_FIPS_0403_Feet",GEOGCS["GCS_North_American_1983",DATUM["D_North_American_1983",SPHEROID["GRS_1980",6378137.0,298.257222101]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],PROJECTION["Lambert_Conformal_Conic"],PARAMETER["False_Easting",6561666.666666666],PARAMETER["False_Northing",1640416.666666667],PARAMETER["Central_Meridian",-120.5],PARAMETER["Standard_Parallel_1",37.06666666666667],PARAMETER["Standard_Parallel_2",38.43333333333333],PARAMETER["Latitude_Of_Origin",36.5],UNIT["Foot_US",0.3048006096012192]]"""
    val rec = WktCrs.parse(wkt).get
    assert(rec.contains("+proj=lcc") && rec.contains("+to_meter=0.3048006096012192"), rec)
    val p = Crs.projFor(rec).get
    // the same grid in meters: offsets converted, no unit wrapper
    val meters = Crs.projFor(
      "+proj=lcc +lat_0=36.5 +lon_0=-120.5 +lat_1=37.06666666666667 " +
        "+lat_2=38.43333333333333 +k_0=1.0 +a=6378137.0 +rf=298.257222101 " +
        s"+x_0=${6561666.666666666 * 0.3048006096012192} " +
        s"+y_0=${1640416.666666667 * 0.3048006096012192}").get
    val (fx, fy) = p.forward(-121.5, 37.5)
    val (mx, my) = meters.forward(-121.5, 37.5)
    assert(math.abs(fx * 0.3048006096012192 - mx) < 1e-6)
    assert(math.abs(fy * 0.3048006096012192 - my) < 1e-6)
    // natural origin lands on the false origin IN FEET
    val (ox, oy) = p.forward(-120.5, 36.5)
    assert(math.abs(ox - 6561666.666666666) < 1e-4)
    assert(math.abs(oy - 1640416.666666667) < 1e-4)
    val (lo, la) = p.inverse(fx, fy)
    assert(math.hypot(lo + 121.5, la - 37.5) < 1e-7)
  }

  test("long-tail families parse from ESRI names; unsupported family -> None") {
    val moll = """PROJCS["World_Mollweide",GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],PROJECTION["Mollweide"],PARAMETER["False_Easting",0.0],PARAMETER["False_Northing",0.0],PARAMETER["Central_Meridian",0.0],UNIT["Meter",1.0]]"""
    val rec = WktCrs.parse(moll).get
    val (x, y) = Crs.projFor(rec).get.forward(40.0, -20.0)
    val (rx, ry) = new Crs.Mollweide(6378137.0, 0.0, 0.0, 0.0).forward(40.0, -20.0)
    assert(x == rx && y == ry)
    val bonne = moll.replace("\"Mollweide\"", "\"Craster_Parabolic\"")
    assert(WktCrs.parse(bonne).isEmpty, "unsupported projection name")
    assert(WktCrs.parse("LOCAL_CS[\"engineering\"]").isEmpty)
    assert(WktCrs.parse("not wkt at all").isEmpty)
    // a non-Greenwich prime meridian (NTF Paris) must be rejected whole —
    // ignoring it would silently shift every longitude by 2.33 degrees
    val paris = """GEOGCS["NTF (Paris)",DATUM["Nouvelle_Triangulation_Francaise_Paris",SPHEROID["Clarke 1880 (IGN)",6378249.2,293.4660212936265]],PRIMEM["Paris",2.33722917],UNIT["grad",0.01570796326794897]]"""
    assert(WktCrs.parse(paris).isEmpty, "Paris meridian must reject")
  }

  test("ESRI polar stereo spellings map to the polar kernel") {
    val esri = """PROJCS["South_Pole_Stereographic",GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],PROJECTION["Stereographic_South_Pole"],PARAMETER["False_Easting",0.0],PARAMETER["False_Northing",0.0],PARAMETER["Central_Meridian",0.0],PARAMETER["Standard_Parallel_1",-71.0],UNIT["Meter",1.0]]"""
    val rec = WktCrs.parse(esri).get
    val p = Crs.projFor(rec).get
    // must agree with the EPSG:3031 kernel (same lat_ts/lon_0)
    val (x, y) = p.forward(45.0, -80.0)
    val (ex, ey) = Crs.byEpsg("EPSG:3031").forward(45.0, -80.0)
    assert(math.abs(x - ex) < 1e-6 && math.abs(y - ey) < 1e-6, s"($x,$y) vs ($ex,$ey)")
  }

  test("TOWGS84 in the GEOGCS becomes +towgs84 on the record") {
    val wkt = """PROJCS["Monte Mario / Italy zone 1",GEOGCS["Monte Mario",DATUM["Monte_Mario",SPHEROID["International 1924",6378388,297],TOWGS84[-104.1,-49.1,-9.9,0.971,-2.917,0.714,-11.68]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],PARAMETER["latitude_of_origin",0],PARAMETER["central_meridian",9],PARAMETER["scale_factor",0.9996],PARAMETER["false_easting",1500000],PARAMETER["false_northing",0],UNIT["metre",1]]"""
    val rec = WktCrs.parse(wkt).get
    assert(rec.contains("+towgs84=-104.1,-49.1,-9.9,0.971,-2.917,0.714,-11.68"), rec)
    // the shift must move the result vs the shiftless twin
    val shifted = Crs.projFor(rec).get
    val plain = Crs.projFor(rec.replaceAll(" \\+towgs84=[^ ]+", "")).get
    val (sx, sy) = shifted.forward(12.0, 42.0)
    val (px, py) = plain.forward(12.0, 42.0)
    assert(math.hypot(sx - px, sy - py) > 30.0)
    val (lo, la) = shifted.inverse(sx, sy)
    assert(math.hypot(lo - 12.0, la - 42.0) < 1e-6)
  }

  test("recordToWkt closure: parse(synthesize(R)) matches R's forward map per family") {
    val records = Seq(
      "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 +y_0=-100000 +ellps=airy",
      "+proj=utm +zone=33 +ellps=WGS84",
      "+proj=utm +zone=19 +south +ellps=GRS80",
      "+proj=lcc +lat_0=46.5 +lon_0=3 +lat_1=49 +lat_2=44 +x_0=700000 +y_0=6600000 +ellps=GRS80",
      "+proj=lcc +lat_0=39 +lat_1=39 +lat_2=39 +lon_0=-77 +k_0=0.9995 +x_0=400000 +y_0=100000",
      "+proj=aea +lat_0=23 +lon_0=-96 +lat_1=29.5 +lat_2=45.5",
      "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 +ellps=GRS80",
      "+proj=cea +lat_ts=30 +lon_0=0",
      "+proj=merc +lat_ts=20 +lon_0=5",
      "+proj=merc +k=0.98 +lon_0=5",
      "+proj=webmerc +lon_0=0",
      "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45",
      "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0",
      "+proj=sterea +lat_0=52.15616055555555 +lon_0=5.38763888888889 +k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel",
      "+proj=cass +lat_0=10.44 +lon_0=-61.33 +x_0=430000 +y_0=325000 +ellps=intl",
      "+proj=sinu +lon_0=10 +ellps=WGS84",
      "+proj=moll +lon_0=20",
      "+proj=eck4 +lon_0=-30",
      "+proj=mill +lon_0=90",
      "+proj=robin +lon_0=0",
      "+proj=vandg +lon_0=0",
      "+proj=gnom +lat_0=40 +lon_0=-100",
      "+proj=ortho +lat_0=52 +lon_0=5 +ellps=GRS80",
      "+proj=aeqd +lat_0=10 +lon_0=25 +ellps=WGS84",
      "+proj=eqdc +lat_0=23 +lon_0=-96 +lat_1=29.5 +lat_2=45.5",
      "+proj=poly +lat_0=0 +lon_0=-54 +ellps=intl",
      "+proj=eqearth +lon_0=12",
      "+proj=bonne +lat_1=45 +lon_0=10 +ellps=WGS84",
      "+proj=omerc +lat_0=4 +lonc=115 +alpha=53.31582 +k_0=0.99984 +x_0=590476.87 +y_0=442857.65 +ellps=WGS84",
      "+proj=tmerc +lat_0=0 +lon_0=9 +k=0.9996 +x_0=1500000 +ellps=intl +towgs84=-104.1,-49.1,-9.9,0.971,-2.917,0.714,-11.68",
      "+proj=lcc +lat_0=36.5 +lon_0=-120.5 +lat_1=37.0667 +lat_2=38.4333 +x_0=2000000 +y_0=500000 +units=us-ft +ellps=GRS80",
      "+proj=longlat +ellps=intl")
    for (rec <- records) {
      val orig = Crs.projFor(rec)
      assert(orig.isDefined, s"fixture record must parse: $rec")
      val wkt = WktCrs.recordToWkt(rec)
      assert(wkt.isDefined, s"no WKT synthesized for $rec")
      val back = WktCrs.parse(wkt.get)
      assert(back.isDefined, s"synthesized WKT failed to parse back: ${wkt.get}")
      val p2 = if (back.get.startsWith("EPSG:")) None else Crs.projFor(back.get)
      // EPSG short-circuit (e.g. 4326 via a WGS84 GEOGCS) is equivalence
      // by identity; otherwise compare forward maps on in-domain samples
      p2.foreach { q =>
        val p1 = orig.get
        val samples = rec match {
          case r if r.contains("cass")  => Seq((-61.0, 10.7), (-61.5, 10.0))
          case r if r.contains("gnom")  => Seq((-95.0, 43.0), (-100.0, 40.0))
          case r if r.contains("ortho") => Seq((3.0, 50.0), (5.0, 52.0))
          case r if r.contains("omerc") => Seq((113.0, 5.0), (117.0, 2.0))
          case r if r.contains("stere +lat_0=-90") => Seq((10.0, -75.0), (-60.0, -80.0))
          case r if r.contains("stere +lat_0=90")  => Seq((10.0, 75.0), (-60.0, 80.0))
          case _ => Seq((3.0, 40.0), (-15.0, 52.0))
        }
        for ((lo, la) <- samples) {
          val (x1, y1) = p1.forward(lo, la)
          val (x2, y2) = q.forward(lo, la)
          assert(math.hypot(x1 - x2, y1 - y2) < 1e-6,
            s"$rec forward mismatch at ($lo,$la): ($x1,$y1) vs ($x2,$y2) via ${back.get}")
        }
      }
    }
    // no faithful WKT1 spelling -> None, never a wrong sidecar
    assert(WktCrs.recordToWkt("+proj=tpeqd +lat_1=35 +lon_1=-10 +lat_2=45 +lon_2=25").isEmpty)
    assert(WktCrs.recordToWkt("+proj=omerc +lat_0=4 +lat_1=1 +lon_1=110 " +
      "+lat_2=7 +lon_2=120").isEmpty, "two-point omerc has no WKT1 spelling")
    assert(WktCrs.recordToWkt("+proj=geos +h=35786023 +lon_0=-75 +sweep=x").isEmpty)
    assert(WktCrs.recordToWkt("+proj=krovak +ellps=bessel").isEmpty)
    assert(WktCrs.recordToWkt("+proj=tmerc +nadgrids=@foo").isEmpty)
    assert(WktCrs.recordToWkt("+proj=nosuch").isEmpty)
  }

  test("st_transform accepts WKT text directly (pyproj to_crs parity)") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    import graft.sql.functions._
    import spark.implicits._
    val esri = "GEOGCS[\"GCS_WGS_1984\",DATUM[\"D_WGS_1984\",SPHEROID[\"WGS_1984\",6378137.0,298.257223563]],PRIMEM[\"Greenwich\",0.0],UNIT[\"Degree\",0.0174532925199433]]"
    val utmWkt = "PROJCS[\"UTM_Zone_33N\",GEOGCS[\"GCS_WGS_1984\",DATUM[\"D_WGS_1984\",SPHEROID[\"WGS_1984\",6378137.0,298.257223563]],PRIMEM[\"Greenwich\",0.0],UNIT[\"Degree\",0.0174532925199433]],PROJECTION[\"Transverse_Mercator\"],PARAMETER[\"latitude_of_origin\",0.0],PARAMETER[\"central_meridian\",15.0],PARAMETER[\"scale_factor\",0.9996],PARAMETER[\"false_easting\",500000.0],PARAMETER[\"false_northing\",0.0],UNIT[\"Meter\",1.0]]"
    val got = Seq((14.0, 47.0)).toDF("lon", "lat")
      .select(st_transform(st_point($"lon", $"lat"), lit(esri), lit(utmWkt)).as("g"))
      .select(st_x($"g"), st_y($"g")).as[(Double, Double)].head()
    val (ux, uy) = Crs.utmForward(14.0, 47.0, 33, southern = false)
    assert(math.abs(got._1 - ux) < 0.01 && math.abs(got._2 - uy) < 0.01)
  }

  test("toCrs fails fast at plan time on an unsupported CRS") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    import graft.sql.functions._
    import spark.implicits._
    val g = graft.api.GeoDataFrame(Seq((1L, 5.0, 50.0)).toDF("id", "x", "y")
      .withColumn("geometry", st_point($"x", $"y")))
    val ex = intercept[IllegalArgumentException] { g.toCrs("EPSG:99999") }
    assert(ex.getMessage.contains("unsupported target"))
    intercept[IllegalArgumentException] { g.toCrs("+proj=igh") }
    // supported strings of every form pass the gate
    g.toCrs("EPSG:32633"); g.toCrs("+proj=eqearth"); g.toCrs("ESRI:54009")
  }

  test("shapefile .prj sidecar: written on write(crs=), detected on read") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    import graft.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("shp_prj").toString
    val df = Seq((1L, 7.44, 46.95), (2L, -0.13, 51.5))
      .toDF("id", "lon", "lat")
      .withColumn("geometry", st_point($"lon", $"lat"))
      .select($"id", $"geometry")
    graft.io.ShapefileIO.write(df.repartition(2), dir, crs = Some("EPSG:4326"))
    // every part trio carries a sidecar
    val prjs = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".prj"))
    assert(prjs.length == new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".shp")))
    val back = graft.api.GeoDataFrame.readShapefile(spark, dir)
    assert(back.crs.contains("EPSG:4326"))
    // the DSv2 connector carries the same crs metadata on its schema
    val viaConnector = spark.read.format("shapefile").load(dir)
    val gf = viaConnector.schema("geometry")
    assert(gf.metadata.contains("crs") && gf.metadata.getString("crs") == "EPSG:4326")
    // unsupported synthesis: no sidecar, read detects nothing, still works
    val dir2 = java.nio.file.Files.createTempDirectory("shp_noprj").toString
    graft.io.ShapefileIO.write(df, dir2, crs = Some("EPSG:5514"))
    assert(!new java.io.File(dir2).listFiles().exists(_.getName.endsWith(".prj")))
    assert(graft.api.GeoDataFrame.readShapefile(spark, dir2).crs.isEmpty)
  }

  // ------------------------------------------------------------- WKT2

  test("WKT2: pyproj-default GEOGCRS (datum ensemble, axes, usage) -> EPSG:4326") {
    // exactly the shape `pyproj.CRS(4326).to_wkt()` emits (WKT2-2019)
    val wkt2 = """GEOGCRS["WGS 84",ENSEMBLE["World Geodetic System 1984 ensemble",MEMBER["World Geodetic System 1984 (Transit)"],MEMBER["World Geodetic System 1984 (G2296)"],ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]],ENSEMBLEACCURACY[2.0]],PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]],CS[ellipsoidal,2],AXIS["geodetic latitude (Lat)",north,ORDER[1],ANGLEUNIT["degree",0.0174532925199433]],AXIS["geodetic longitude (Lon)",east,ORDER[2],ANGLEUNIT["degree",0.0174532925199433]],USAGE[SCOPE["Horizontal component of 3D system."],AREA["World."],BBOX[-90,-180,90,180]],ID["EPSG",4326]]"""
    assert(WktCrs.parse(wkt2).contains("EPSG:4326"))
    // WKT2-2015 spelling (GEODCRS + plain DATUM)
    val wkt2015 = """GEODCRS["WGS 84",DATUM["World Geodetic System 1984",ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]]],PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]],CS[ellipsoidal,2],AXIS["latitude",north],AXIS["longitude",east],ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",4326]]"""
    assert(WktCrs.parse(wkt2015).contains("EPSG:4326"))
  }

  test("WKT2: PROJCRS with EPSG ID short-circuits; without ID synthesizes the UTM kernel") {
    val base = """BASEGEOGCRS["WGS 84",ENSEMBLE["World Geodetic System 1984 ensemble",MEMBER["World Geodetic System 1984 (Transit)"],ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]],ENSEMBLEACCURACY[2.0]],PRIMEM["Greenwich",0,ANGLEUNIT["degree",0.0174532925199433]],ID["EPSG",4326]]"""
    val conv = """CONVERSION["UTM zone 33N",METHOD["Transverse Mercator",ID["EPSG",9807]],PARAMETER["Latitude of natural origin",0,ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",8801]],PARAMETER["Longitude of natural origin",15,ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",8802]],PARAMETER["Scale factor at natural origin",0.9996,SCALEUNIT["unity",1],ID["EPSG",8805]],PARAMETER["False easting",500000,LENGTHUNIT["metre",1],ID["EPSG",8806]],PARAMETER["False northing",0,LENGTHUNIT["metre",1],ID["EPSG",8807]]]"""
    val cs = """CS[Cartesian,2],AXIS["(E)",east,ORDER[1],LENGTHUNIT["metre",1]],AXIS["(N)",north,ORDER[2],LENGTHUNIT["metre",1]]"""
    val withId = s"""PROJCRS["WGS 84 / UTM zone 33N",$base,$conv,$cs,USAGE[SCOPE["Navigation."],AREA["Between 12E and 18E."],BBOX[0,12,84,18]],ID["EPSG",32633]]"""
    assert(WktCrs.parse(withId).contains("EPSG:32633"))

    val noId = s"""PROJCRS["WGS 84 / UTM zone 33N",$base,$conv,$cs]"""
    val rec = WktCrs.parse(noId).get
    assert(rec.startsWith("+proj=tmerc"), rec)
    val p = Crs.projFor(rec).get
    val (x, y) = p.forward(14.0, 47.0)
    val (ux, uy) = Crs.utmForward(14.0, 47.0, 33, southern = false)
    assert(math.abs(x - ux) < 0.01 && math.abs(y - uy) < 0.01, s"($x,$y) vs ($ux,$uy)")
  }

  test("WKT2: per-parameter units convert (grad angles, US-foot false origin)") {
    // lat_0 given as 50 grad = 45 degrees
    val grad = """PROJCRS["grad tmerc",BASEGEOGCRS["WGS 84",DATUM["World Geodetic System 1984",ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]]],PRIMEM["Greenwich",0]],CONVERSION["c",METHOD["Transverse Mercator"],PARAMETER["Latitude of natural origin",50,ANGLEUNIT["grad",0.015707963267948967]],PARAMETER["Longitude of natural origin",9,ANGLEUNIT["degree",0.0174532925199433]],PARAMETER["Scale factor at natural origin",1,SCALEUNIT["unity",1]],PARAMETER["False easting",0,LENGTHUNIT["metre",1]],PARAMETER["False northing",0,LENGTHUNIT["metre",1]]],CS[Cartesian,2],AXIS["(E)",east],AXIS["(N)",north],LENGTHUNIT["metre",1]]"""
    val pg = Crs.projFor(WktCrs.parse(grad).get).get
    val pd = Crs.projFor("+proj=tmerc +lat_0=45 +lon_0=9 +k=1 +a=6378137 " +
      "+rf=298.257223563 +x_0=0 +y_0=0").get
    val (gx, gy) = pg.forward(10.0, 46.0)
    val (dx, dy) = pd.forward(10.0, 46.0)
    assert(math.abs(gx - dx) < 1e-6 && math.abs(gy - dy) < 1e-6, s"($gx,$gy) vs ($dx,$dy)")

    // California zone 3 in US survey feet — the WKT2 twin of the WKT1
    // State Plane test: false-origin params + CS unit in feet
    val usft = "0.304800609601219"
    val feet = s"""PROJCRS["NAD83 / California zone 3 (ftUS)",BASEGEOGCRS["NAD83",DATUM["North American Datum 1983",ELLIPSOID["GRS 1980",6378137,298.257222101,LENGTHUNIT["metre",1]]],PRIMEM["Greenwich",0]],CONVERSION["SPCS83 California zone 3 (US Survey feet)",METHOD["Lambert Conic Conformal (2SP)",ID["EPSG",9802]],PARAMETER["Latitude of false origin",36.5,ANGLEUNIT["degree",0.0174532925199433]],PARAMETER["Longitude of false origin",-120.5,ANGLEUNIT["degree",0.0174532925199433]],PARAMETER["Latitude of 1st standard parallel",37.06666666666667,ANGLEUNIT["degree",0.0174532925199433]],PARAMETER["Latitude of 2nd standard parallel",38.43333333333333,ANGLEUNIT["degree",0.0174532925199433]],PARAMETER["Easting at false origin",6561666.666666666,LENGTHUNIT["US survey foot",$usft]],PARAMETER["Northing at false origin",1640416.666666667,LENGTHUNIT["US survey foot",$usft]]],CS[Cartesian,2],AXIS["(E)",east,ORDER[1],LENGTHUNIT["US survey foot",$usft]],AXIS["(N)",north,ORDER[2],LENGTHUNIT["US survey foot",$usft]]]"""
    val rec = WktCrs.parse(feet).get
    assert(rec.contains("+proj=lcc") && rec.contains("+to_meter=" + usft), rec)
    val p = Crs.projFor(rec).get
    // natural origin lands on the false origin IN FEET
    val (ox, oy) = p.forward(-120.5, 36.5)
    assert(math.abs(ox - 6561666.666666666) < 1e-4, ox.toString)
    assert(math.abs(oy - 1640416.666666667) < 1e-4, oy.toString)
  }

  test("WKT2: BOUNDCRS abridged transformation becomes +towgs84") {
    val wkt = """BOUNDCRS[SOURCECRS[PROJCRS["Monte Mario / Italy zone 1",BASEGEOGCRS["Monte Mario",DATUM["Monte Mario",ELLIPSOID["International 1924",6378388,297,LENGTHUNIT["metre",1]]],PRIMEM["Greenwich",0]],CONVERSION["Italy zone 1",METHOD["Transverse Mercator"],PARAMETER["Latitude of natural origin",0],PARAMETER["Longitude of natural origin",9],PARAMETER["Scale factor at natural origin",0.9996],PARAMETER["False easting",1500000,LENGTHUNIT["metre",1]],PARAMETER["False northing",0,LENGTHUNIT["metre",1]]],CS[Cartesian,2],AXIS["(E)",east],AXIS["(N)",north],LENGTHUNIT["metre",1]]],TARGETCRS[GEOGCRS["WGS 84",ENSEMBLE["World Geodetic System 1984 ensemble",ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]],ENSEMBLEACCURACY[2.0]],PRIMEM["Greenwich",0],CS[ellipsoidal,2],AXIS["latitude",north],AXIS["longitude",east],ANGLEUNIT["degree",0.0174532925199433],ID["EPSG",4326]]],ABRIDGEDTRANSFORMATION["Monte Mario to WGS 84 (1)",METHOD["Position Vector transformation (geog2D domain)",ID["EPSG",9606]],PARAMETER["X-axis translation",-104.1,ID["EPSG",8605]],PARAMETER["Y-axis translation",-49.1,ID["EPSG",8606]],PARAMETER["Z-axis translation",-9.9,ID["EPSG",8607]],PARAMETER["X-axis rotation",0.971,ID["EPSG",8608]],PARAMETER["Y-axis rotation",-2.917,ID["EPSG",8609]],PARAMETER["Z-axis rotation",0.714,ID["EPSG",8610]],PARAMETER["Scale difference",0.99998832,ID["EPSG",8611]]]]"""
    val rec = WktCrs.parse(wkt).get
    assert(rec.startsWith("+proj=tmerc") && rec.contains("+towgs84="), rec)
    val tow = rec.split("\\+towgs84=")(1).split(" ")(0).split(",").map(_.toDouble)
    assert(tow(0) == -104.1 && tow(1) == -49.1 && tow(2) == -9.9)
    assert(tow(3) == 0.971 && tow(4) == -2.917 && tow(5) == 0.714)
    // (1 + dS) multiplier -> ppm
    assert(math.abs(tow(6) - -11.68) < 1e-6, tow(6).toString)
    // the shift must move the result vs the shiftless twin
    val shifted = Crs.projFor(rec).get
    val plain = Crs.projFor(rec.replaceAll(" \\+towgs84=[^ ]+", "")).get
    val (sx, sy) = shifted.forward(10.0, 45.0)
    val (px, py) = plain.forward(10.0, 45.0)
    assert(math.hypot(sx - px, sy - py) > 10.0)
  }

  test("WKT2: polar stereographic variant B matches the EPSG:3031 kernel") {
    val wkt = """PROJCRS["Antarctic Polar Stereographic",BASEGEOGCRS["WGS 84",DATUM["World Geodetic System 1984",ELLIPSOID["WGS 84",6378137,298.257223563,LENGTHUNIT["metre",1]]],PRIMEM["Greenwich",0]],CONVERSION["Antarctic Polar Stereographic",METHOD["Polar Stereographic (variant B)",ID["EPSG",9829]],PARAMETER["Latitude of standard parallel",-71,ANGLEUNIT["degree",0.0174532925199433]],PARAMETER["Longitude of origin",0,ANGLEUNIT["degree",0.0174532925199433]],PARAMETER["False easting",0,LENGTHUNIT["metre",1]],PARAMETER["False northing",0,LENGTHUNIT["metre",1]]],CS[Cartesian,2],AXIS["(E)",east],AXIS["(N)",north],LENGTHUNIT["metre",1]]"""
    val p = Crs.projFor(WktCrs.parse(wkt).get).get
    val (x, y) = p.forward(45.0, -80.0)
    val (ex, ey) = Crs.byEpsg("EPSG:3031").forward(45.0, -80.0)
    assert(math.abs(x - ex) < 1e-6 && math.abs(y - ey) < 1e-6, s"($x,$y) vs ($ex,$ey)")
  }

  // ----------------------------------------------------------- PROJJSON

  test("PROJJSON: EPSG-id'd CRS short-circuit (the real geopandas footer shape)") {
    // exactly the shape pyproj.CRS(32633).to_json() emits (trimmed)
    val utm = """{"$schema":"https://proj.org/schemas/v0.7/projjson.schema.json","type":"ProjectedCRS","name":"WGS 84 / UTM zone 33N","base_crs":{"name":"WGS 84","datum_ensemble":{"name":"World Geodetic System 1984 ensemble","ellipsoid":{"name":"WGS 84","semi_major_axis":6378137,"inverse_flattening":298.257223563}},"coordinate_system":{"subtype":"ellipsoidal","axis":[{"name":"Geodetic latitude","abbreviation":"Lat","direction":"north","unit":"degree"},{"name":"Geodetic longitude","abbreviation":"Lon","direction":"east","unit":"degree"}]},"id":{"authority":"EPSG","code":4326}},"conversion":{"name":"UTM zone 33N","method":{"name":"Transverse Mercator","id":{"authority":"EPSG","code":9807}},"parameters":[{"name":"Latitude of natural origin","value":0,"unit":"degree"},{"name":"Longitude of natural origin","value":15,"unit":"degree"},{"name":"Scale factor at natural origin","value":0.9996,"unit":"unity"},{"name":"False easting","value":500000,"unit":"metre"},{"name":"False northing","value":0,"unit":"metre"}]},"coordinate_system":{"subtype":"Cartesian","axis":[{"name":"Easting","abbreviation":"E","direction":"east","unit":"metre"},{"name":"Northing","abbreviation":"N","direction":"north","unit":"metre"}]},"id":{"authority":"EPSG","code":32633}}"""
    assert(WktCrs.parseProjJson(utm).contains("EPSG:32633"))
    val geog = """{"type":"GeographicCRS","name":"WGS 84","datum_ensemble":{"name":"World Geodetic System 1984 ensemble","ellipsoid":{"name":"WGS 84","semi_major_axis":6378137,"inverse_flattening":298.257223563}},"coordinate_system":{"subtype":"ellipsoidal","axis":[]},"id":{"authority":"EPSG","code":4326}}"""
    assert(WktCrs.parseProjJson(geog).contains("EPSG:4326"))
  }

  test("PROJJSON: id-less ProjectedCRS reduces structurally, equal to the WKT2 route") {
    val pj = """{"type":"ProjectedCRS","name":"custom TM","base_crs":{"name":"custom geog","datum":{"type":"GeodeticReferenceFrame","name":"d","ellipsoid":{"name":"GRS 1980","semi_major_axis":6378137,"inverse_flattening":298.257222101}},"coordinate_system":{"subtype":"ellipsoidal","axis":[]}},"conversion":{"name":"c","method":{"name":"Transverse Mercator"},"parameters":[{"name":"Latitude of natural origin","value":0,"unit":"degree"},{"name":"Longitude of natural origin","value":147,"unit":"degree"},{"name":"Scale factor at natural origin","value":0.9996,"unit":"unity"},{"name":"False easting","value":500000,"unit":"metre"},{"name":"False northing","value":10000000,"unit":"metre"}]},"coordinate_system":{"subtype":"Cartesian","axis":[{"name":"Easting","abbreviation":"E","direction":"east","unit":"metre"},{"name":"Northing","abbreviation":"N","direction":"north","unit":"metre"}]}}"""
    val viaJson = WktCrs.parseProjJson(pj)
    assert(viaJson.isDefined, "PROJJSON TM must reduce")
    val wkt2 = """PROJCRS["custom TM",BASEGEOGCRS["custom geog",DATUM["d",ELLIPSOID["GRS 1980",6378137,298.257222101,LENGTHUNIT["metre",1]]]],CONVERSION["c",METHOD["Transverse Mercator"],PARAMETER["Latitude of natural origin",0,ANGLEUNIT["degree",0.0174532925199433]],PARAMETER["Longitude of natural origin",147,ANGLEUNIT["degree",0.0174532925199433]],PARAMETER["Scale factor at natural origin",0.9996,SCALEUNIT["unity",1]],PARAMETER["False easting",500000,LENGTHUNIT["metre",1]],PARAMETER["False northing",10000000,LENGTHUNIT["metre",1]]],CS[Cartesian,2],AXIS["(E)",east,ORDER[1],LENGTHUNIT["metre",1]],AXIS["(N)",north,ORDER[2],LENGTHUNIT["metre",1]]]"""
    assert(WktCrs.parse(wkt2) == viaJson,
      s"wkt2 ${WktCrs.parse(wkt2)} vs projjson $viaJson")
    // both must drive the same kernel as the EPSG 28355 parameter row
    val p = Crs.projFor(viaJson.get).get
    val (x, y) = p.forward(147.5, -30.0)
    val (ex, ey) = Crs.byEpsg("EPSG:28355").forward(147.5, -30.0)
    assert(math.abs(x - ex) < 1e-6 && math.abs(y - ey) < 1e-6)
  }

  test("PROJJSON: foot-unit grid and BoundCRS towgs84") {
    // false easting in US survey feet must scale exactly like the WKT2 path
    val ft = """{"type":"ProjectedCRS","name":"ft grid","base_crs":{"name":"g","datum":{"type":"GeodeticReferenceFrame","name":"d","ellipsoid":{"name":"GRS 1980","semi_major_axis":6378137,"inverse_flattening":298.257222101}},"coordinate_system":{"subtype":"ellipsoidal","axis":[]}},"conversion":{"name":"c","method":{"name":"Transverse Mercator"},"parameters":[{"name":"Latitude of natural origin","value":0,"unit":"degree"},{"name":"Longitude of natural origin","value":-93,"unit":"degree"},{"name":"Scale factor at natural origin","value":0.9996,"unit":"unity"},{"name":"False easting","value":1640416.666666667,"unit":"US survey foot"},{"name":"False northing","value":0,"unit":"US survey foot"}]},"coordinate_system":{"subtype":"Cartesian","axis":[{"name":"Easting","abbreviation":"E","direction":"east","unit":"US survey foot"},{"name":"Northing","abbreviation":"N","direction":"north","unit":"US survey foot"}]}}"""
    val r = WktCrs.parseProjJson(ft)
    assert(r.isDefined && r.get.contains("+to_meter="), s"foot grid -> $r")
    val p = Crs.projFor(r.get).get
    // 500 km false easting expressed in usft: x at the central meridian
    // must read the false easting back in usft
    val (x, _) = p.forward(-93.0, 0.0)
    assert(math.abs(x - 1640416.666666667) < 1e-6, s"x=$x")
    // BoundCRS: Helmert terms land as +towgs84
    val bound = """{"type":"BoundCRS","source_crs":{"type":"GeographicCRS","name":"src","datum":{"type":"GeodeticReferenceFrame","name":"d","ellipsoid":{"name":"intl","semi_major_axis":6378388,"inverse_flattening":297}},"coordinate_system":{"subtype":"ellipsoidal","axis":[]}},"target_crs":{"type":"GeographicCRS","name":"WGS 84"},"transformation":{"name":"t","method":{"name":"Position Vector transformation (geog2D domain)"},"parameters":[{"name":"X-axis translation","value":-87,"unit":"metre"},{"name":"Y-axis translation","value":-98,"unit":"metre"},{"name":"Z-axis translation","value":-121,"unit":"metre"}]}}"""
    val b = WktCrs.parseProjJson(bound)
    assert(b.isDefined && b.get.contains("+towgs84=-87.0,-98.0,-121.0"), s"bound -> $b")
  }

  test("PROJJSON: NON-served EPSG id falls back to structural reduction") {
    // Belgian Lambert 72 shape (no engine parameter-table row for 31370):
    // the id must NOT short-circuit to a code st_transform would reject —
    // the LCC-2SP parameters pyproj writes alongside it reduce to a record
    val pj = """{"type":"ProjectedCRS","name":"BD72ish","base_crs":{"name":"g","datum":{"type":"GeodeticReferenceFrame","name":"d","ellipsoid":{"name":"intl","semi_major_axis":6378388,"inverse_flattening":297}},"coordinate_system":{"subtype":"ellipsoidal","axis":[]}},"conversion":{"name":"c","method":{"name":"Lambert Conic Conformal (2SP)"},"parameters":[{"name":"Latitude of false origin","value":90,"unit":"degree"},{"name":"Longitude of false origin","value":4.367486666666666,"unit":"degree"},{"name":"Latitude of 1st standard parallel","value":51.16666723333333,"unit":"degree"},{"name":"Latitude of 2nd standard parallel","value":49.8333339,"unit":"degree"},{"name":"Easting at false origin","value":150000.013,"unit":"metre"},{"name":"Northing at false origin","value":5400088.438,"unit":"metre"}]},"coordinate_system":{"subtype":"Cartesian","axis":[{"name":"E","abbreviation":"E","direction":"east","unit":"metre"},{"name":"N","abbreviation":"N","direction":"north","unit":"metre"}]},"id":{"authority":"EPSG","code":31370}}"""
    val r = WktCrs.parseProjJson(pj)
    assert(r.isDefined && r.get.startsWith("+proj=lcc"), s"31370 -> $r")
    assert(Crs.projFor(r.get).isDefined, "the reduced record must be servable")
  }

  test("PROJJSON: malformed and unknown inputs return None") {
    assert(WktCrs.parseProjJson("{not json").isEmpty)
    assert(WktCrs.parseProjJson("""{"type":"VerticalCRS","name":"x"}""").isEmpty)
    assert(WktCrs.parseProjJson("""{"type":"ProjectedCRS","name":"x"}""").isEmpty)
  }
}
