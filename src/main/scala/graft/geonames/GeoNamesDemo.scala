package graft.geonames

import org.apache.spark.sql.SparkSession

/** Runnable example of the GeoNames pipeline:
  * `sbt "runMain graft.geonames.GeoNamesDemo <stagingDir> <outDir>"`
  * where stagingDir holds allCountries.txt + admin1CodesASCII.txt +
  * admin2Codes.txt (see [[GeoNamesIngest]] for producing them). Prints
  * the first NDJSON lines and writes the full output to outDir.
  */
object GeoNamesDemo {
  def main(args: Array[String]): Unit = {
    val Array(stagingDir, outDir) = args
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val config = GeoNames.Config(
      filters = Seq(Map("countryCode" -> "US"), Map("countryCode" -> "DE")),
      types = Map(
        "PPL" -> "hg:Place", "ADM1" -> "hg:Province",
        "ADM2" -> "hg:Municipality", "ADM" -> "hg:Admin", "S" -> "hg:Spot"))
    GeoNames.transform(spark, stagingDir, outDir, config)
    val out = spark.read.text(outDir)
    println(s"[geonames-demo] wrote ${out.count()} NDJSON records to $outDir")
    out.take(5).foreach(r => println(r.getString(0)))
    spark.stop()
  }
}
