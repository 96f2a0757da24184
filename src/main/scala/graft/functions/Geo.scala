package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geo scalar set (ref: src/be_db_geocoder.erl:49-51 builds a PostGIS
  * point per geocoded cell; :204-225 calls h3:to_geo for the cell
  * centroid; SURVEY §2.8 maps the geometry surface to a (lat, lon)
  * struct + haversine distance).
  *
  * All of it is pure Catalyst math (sin/cos/asin/sqrt are codegen'd
  * builtins) — no UDF in any hot path.
  */
object Geo {

  /** Mean Earth radius (km), the figure the haversine convention uses. */
  val EarthRadiusKm = 6371.0

  /** The ST_MakePoint stand-in: a typed (lat, lon) struct column. */
  def geoPoint(lat: Column, lon: Column): Column =
    struct(lat.as("lat"), lon.as("lon"))

  /** Great-circle distance in km between two (lat, lon) pairs in
    * degrees — haversine form, numerically stable for small distances.
    * Written with explicit multiplications (never pow) so the DuckDB
    * oracle can mirror the exact operation sequence.
    */
  def haversineKm(lat1: Column, lon1: Column,
                  lat2: Column, lon2: Column): Column = {
    val sLat = sin(radians(lat2 - lat1) / 2)
    val sLon = sin(radians(lon2 - lon1) / 2)
    val a = sLat * sLat +
      cos(radians(lat1)) * cos(radians(lat2)) * sLon * sLon
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }

  /** The matching DuckDB SQL fragment (same operation order). */
  def haversineSql(lat1: String, lon1: String,
                   lat2: String, lon2: String): String = {
    val sLat = s"sin(radians($lat2 - $lat1) / 2)"
    val sLon = s"sin(radians($lon2 - $lon1) / 2)"
    s"(2 * $EarthRadiusKm * asin(sqrt($sLat * $sLat + " +
      s"cos(radians($lat1)) * cos(radians($lat2)) * $sLon * $sLon)))"
  }

  /** h3 cell → (lat, lon): a broadcast point-lookup against the geocode
    * store, which carries the centroid of every cell the pipeline has
    * geocoded — the engine's equivalent of the reference's h3:to_geo
    * call at geocode-result time (be_db_geocoder.erl:218-225). A
    * closed-form H3 to_geo needs the 122-entry base-cell dataset, which
    * is not reproducible in this offline build; resolving through the
    * geocode store gives exact coordinates for every cell the system
    * has seen, with the same broadcast-join cost profile as the other
    * ledger point-lookups.
    */
  def toGeo(locations: DataFrame, df: DataFrame, cellCol: String): DataFrame =
    df.join(
      broadcast(locations.select(col("location").as(cellCol),
        col("lat"), col("lon"))),
      Seq(cellCol), "left_outer")
}
