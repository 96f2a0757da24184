package graft

import graft.functions.Geo
import org.apache.spark.sql.functions._

/** Haversine + to_geo properties, including known city-pair distances
  * (public figures, asserted within ±1%).
  */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  private def dist(lat1: Double, lon1: Double,
                   lat2: Double, lon2: Double): Double =
    Seq((lat1, lon1, lat2, lon2)).toDF("a", "b", "c", "d")
      .select(Geo.haversineKm(col("a"), col("b"), col("c"), col("d")))
      .head().getDouble(0)

  test("haversine matches known city-pair distances") {
    val sfLa = dist(37.7749, -122.4194, 34.0522, -118.2437)
    assert(math.abs(sfLa - 559.0) < 6.0, s"SF->LA was $sfLa")
    val lonParis = dist(51.5074, -0.1278, 48.8566, 2.3522)
    assert(math.abs(lonParis - 343.6) < 4.0, s"London->Paris was $lonParis")
    val equatorDegree = dist(0.0, 0.0, 0.0, 1.0)
    assert(math.abs(equatorDegree - 111.19) < 0.5,
      s"equator degree was $equatorDegree")
    val antipodes = dist(0.0, 0.0, 0.0, 180.0)
    assert(math.abs(antipodes - math.Pi * Geo.EarthRadiusKm) < 1.0,
      s"antipodes was $antipodes")
  }

  test("haversine properties: zero, symmetry, positivity") {
    val rnd = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val (la1, lo1) = (rnd.nextDouble() * 170 - 85, rnd.nextDouble() * 360 - 180)
      val (la2, lo2) = (rnd.nextDouble() * 170 - 85, rnd.nextDouble() * 360 - 180)
      assert(dist(la1, lo1, la1, lo1) === 0.0)
      val ab = dist(la1, lo1, la2, lo2)
      val ba = dist(la2, lo2, la1, lo1)
      assert(math.abs(ab - ba) < 1e-9, "symmetry")
      assert(ab >= 0.0 && ab <= math.Pi * Geo.EarthRadiusKm + 1e-9)
    }
  }

  test("geoPoint builds the (lat, lon) struct the geometry surface uses") {
    val row = Seq((37.5, -122.25)).toDF("la", "lo")
      .select(Geo.geoPoint(col("la"), col("lo")).as("p"))
      .select(col("p.lat"), col("p.lon")).head()
    assert(row.getDouble(0) === 37.5)
    assert(row.getDouble(1) === -122.25)
  }

  test("to_geo resolves cells through the geocode store") {
    val loc = spark.read.parquet("/root/repo/fixtures/locations.parquet")
    val gw = spark.read.parquet("/root/repo/fixtures/ledger_gateways.parquet")
    val resolved = Geo.toGeo(loc, gw.select(col("address"), col("location")),
      "location")
    assert(resolved.filter(col("lat").isNotNull).count() > 0)
    // a cell that is in the geocode store resolves to exactly its row
    val one = loc.select("location", "lat", "lon").head()
    val hit = resolved.filter(col("location") === one.getString(0))
      .select("lat", "lon").head()
    assert(hit.getDouble(0) === one.getDouble(1))
    assert(hit.getDouble(1) === one.getDouble(2))
    // ungeocoded cells stay null (the left join, not an inner)
    assert(resolved.filter(col("lat").isNull).count() ===
      gw.join(loc.select("location"), Seq("location"), "left_anti").count())
  }
}
