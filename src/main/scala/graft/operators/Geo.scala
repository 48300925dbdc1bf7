package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geographic primitives. Latitude/longitude are the reference's only
  * numeric payload (the one `parseFloat` in geonames.js:143–146 builds
  * the GeoJSON point) — this adds the distance algebra over them:
  * great-circle distance and radius predicates, the "places within R km
  * of X" query the GeoNames ecosystem exists to serve.
  *
  * Composed entirely from codegen'd builtin expressions (radians / sin
  * / cos / asin / sqrt) — no UDF, so the predicate stays inside
  * WholeStageCodegen and survives column pruning; squares are written
  * as explicit products (not `pow(x, 2)`) so both this engine and a SQL
  * oracle evaluate the identical IEEE expression tree.
  */
object Geo {

  /** Haversine great-circle distance in kilometers (mean Earth radius
    * 6371 km): 2R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2))).
    */
  def haversineKm(lat1: Column, lon1: Column,
                  lat2: Column, lon2: Column): Column = {
    val sdLat = sin(radians(lat2 - lat1) / 2)
    val sdLon = sin(radians(lon2 - lon1) / 2)
    val a = sdLat * sdLat +
      cos(radians(lat1)) * cos(radians(lat2)) * sdLon * sdLon
    lit(12742.0) * asin(sqrt(a))
  }
}
