package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GeoSpec extends SparkSpec {
  import spark.implicits._

  private def dist(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double =
    Seq((lat1, lon1, lat2, lon2)).toDF("a", "b", "c", "d")
      .select(Geo.haversineKm(col("a"), col("b"), col("c"), col("d")).as("km"))
      .as[Double].collect()(0)

  test("haversine matches known city distances within mean-radius error") {
    // NYC (40.7128, -74.0060) to London (51.5074, -0.1278): ~5570 km
    dist(40.7128, -74.0060, 51.5074, -0.1278) shouldBe 5570.0 +- 10.0
    // Paris to Berlin: ~878 km
    dist(48.8566, 2.3522, 52.52, 13.405) shouldBe 878.0 +- 5.0
  }

  test("haversine degenerate and symmetry properties") {
    dist(10.0, 20.0, 10.0, 20.0) shouldBe 0.0
    val ab = dist(10.0, 20.0, -30.0, 140.0)
    val ba = dist(-30.0, 140.0, 10.0, 20.0)
    ab shouldBe ba +- 1e-9
    // antipodal points: half the mean circumference ~ 20015 km
    dist(0.0, 0.0, 0.0, 180.0) shouldBe 20015.0 +- 5.0
  }
}
