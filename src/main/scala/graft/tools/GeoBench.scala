package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.geonames.GeoNames

/** GeoNames pipeline throughput harness: generates an N-row synthetic
  * allCountries extract (deterministic, GeoNames-shaped, ~125 B/row)
  * plus admin-code dimensions, runs the full transform (filter →
  * classify → pits ∪ relations → NDJSON), and prints one JSON line with
  * rows/sec. The reference processes the real dump strictly
  * sequentially, one row at a time (geonames.js:249–250) and publishes
  * no timings; this gives our side a measured number at the same
  * workload shape.
  *
  *   sbt "runMain graft.tools.GeoBench [rows] [workDir]"
  */
object GeoBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 2000000L
    val work = if (args.length > 1) args(1) else
      Files.createTempDirectory("geobench").toFile.getAbsolutePath
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // --- synthetic staging files (deterministic) ---------------------
    val countries = (0 until 50).map(i => f"C$i%02d")
    val fcodes = Seq("PPL", "PPLA", "ADM1", "ADM2", "ADM2H", "STM", "XYZ", "ZZZ")
    val stage = s"$work/stage"
    Files.createDirectories(Paths.get(stage))
    val place = spark.range(rows).select(concat_ws("\t",
      (col("id") + 1000).cast("string"),                        // geonameid
      concat(lit("Place "), col("id")),                         // name
      concat(lit("Place "), col("id")),                         // asciiname
      lit(""),                                                  // alternatenames
      (pmod(col("id") * 7, lit(180)) - 90).cast("string"),   // lat
      (pmod(col("id") * 13, lit(360)) - 180).cast("string"), // lon
      lit("P"),
      element_at(typedLit(fcodes), pmod(col("id"), lit(fcodes.size)).cast("int") + 1),
      element_at(typedLit(countries), pmod(col("id"), lit(50)).cast("int") + 1),
      lit(""),
      concat(lit("A"), pmod(col("id"), lit(20))),                    // admin1
      when(pmod(col("id"), lit(3)) === 0, concat(lit("B"), pmod(col("id"), lit(100))))
        .otherwise(lit("")),                                    // admin2 (⅓ of rows)
      lit(""), lit(""), lit("0"), lit(""), lit("0"),
      lit("UTC"), lit("2024-01-01")))
    place.coalesce(cpus.toInt).write.mode("overwrite").text(s"$stage/ac")
    // single logical file path expected by transform: pass the dir
    val admin1 = for (c <- countries; a <- 0 until 20)
      yield s"$c.A$a\tAdmin1 $c$a\tAdmin1 $c$a\t${9000000 + c.hashCode.abs % 100000 + a}"
    val admin2 = for (c <- countries; a <- 0 until 20; b <- 0 until 34)
      yield s"$c.A$a.B${(b * 3) % 100}\tAdmin2\tAdmin2\t${8000000 + (c + a + b).hashCode.abs % 1000000}"
    Files.writeString(Paths.get(s"$stage/admin1CodesASCII.txt"), admin1.mkString("\n"))
    Files.writeString(Paths.get(s"$stage/admin2Codes.txt"), admin2.mkString("\n"))

    val config = GeoNames.Config(
      filters = (0 until 25).map(i => Map("countryCode" -> f"C$i%02d")), // half the countries
      types = Map("PPL" -> "hg:Place", "ADM" -> "hg:Admin", "S" -> "hg:Spot"))

    // --- timed transform --------------------------------------------
    val places = GeoNames.readAllCountries(spark, s"$stage/ac")
    val a1 = GeoNames.readAdminCodes(spark, s"$stage/admin1CodesASCII.txt")
    val a2 = GeoNames.readAdminCodes(spark, s"$stage/admin2Codes.txt")
    val t0 = System.nanoTime()
    val outPath = s"$work/out"
    GeoNames.envelopes(places, a1, a2, config)
      .write.mode("overwrite").text(outPath)
    val sec = (System.nanoTime() - t0) / 1e9
    val outRows = spark.read.text(outPath).count()

    // --- untimed golden invariants on the full-dump output -----------
    // (the GeoNamesSpec contracts, spot-held at dump scale): every line
    // parses back as a typed envelope, pit uris are unique, both record
    // types are present, and every relation's `from` references an
    // emitted pit (the fallback join must never leave dangling edges).
    val (pits, rels) = GeoNames.readEnvelopes(spark, outPath)
    val nPits = pits.count()
    val nRels = rels.count()
    require(nPits > 0 && nRels > 0, s"degenerate output: $nPits pits / $nRels rels")
    require(nPits + nRels == outRows,
      s"unparseable envelope lines: $nPits + $nRels != $outRows")
    require(pits.select(col("uri")).distinct().count() == nPits,
      "duplicate pit uris")
    val dangling = rels.select(col("from").as("uri"))
      .join(pits.select(col("uri")), Seq("uri"), "left_anti").count()
    require(dangling == 0L, s"$dangling relations reference missing pits")
    println(s"""{"metric":"geonames_transform","input_rows":$rows,"output_rows":$outRows,"pits":$nPits,"relations":$nRels,"sec":$sec,"rows_per_sec":${(rows / sec).toLong},"cpus":$cpus}""")
    spark.stop()
  }
}
