package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corrupt-input behavior of the text sources — at 100 TB some records
  * WILL be malformed, and the failure mode must be a per-record policy
  * (capture or drop), never a job abort.
  */
class MalformedSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType)))

  private def writeLines(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("malformed").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "part-0.json")
    val w = new java.io.PrintWriter(f)
    lines.foreach(w.println)
    w.close()
    dir.getAbsolutePath
  }

  private val lines = Seq(
    """{"id": 1, "name": "ok"}""",
    """{"id": oops not json""",
    """{"id": 3, "name": "also ok"}""")

  test("PERMISSIVE json scan captures malformed lines in _corrupt_record") {
    val path = writeLines(lines)
    val withCorrupt = schema.add("_corrupt_record", StringType)
    val df = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache() // required before filtering on the corrupt column (Spark contract)
    df.count() shouldBe 3
    df.where(col("_corrupt_record").isNotNull).count() shouldBe 1
    df.where(col("_corrupt_record").isNull).select("id")
      .collect().map(_.getLong(0)).sorted shouldBe Array(1L, 3L)
    df.unpersist()
  }

  test("DROPMALFORMED json scan silently drops bad lines; good rows survive") {
    val path = writeLines(lines)
    val df = spark.read.schema(schema)
      .option("mode", "DROPMALFORMED")
      .json(path)
    df.collect().map(_.getLong(0)).sorted shouldBe Array(1L, 3L)
  }

  test("csv scan with FAILFAST aborts loudly on a bad row (the explicit opt-in)") {
    val dir = Files.createTempDirectory("malformed-csv").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "part-0.csv")
    val w = new java.io.PrintWriter(f)
    w.println("1\tok")
    w.println("not_a_long\tbad")
    w.close()
    val df = spark.read.schema(schema)
      .option("sep", "\t").option("mode", "FAILFAST")
      .csv(dir.getAbsolutePath)
    intercept[org.apache.spark.SparkException] { df.collect() }
  }

  test("parquet schema evolution: mergeSchema unions columns, old files read null") {
    import spark.implicits._
    val dir = Files.createTempDirectory("evolve").toFile
    dir.deleteOnExit()
    // epoch 1: (id, name); epoch 2 adds a quality column
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.parquet(dir.getAbsolutePath + "/e=1")
    Seq((3L, "c", 0.9)).toDF("id", "name", "quality")
      .write.parquet(dir.getAbsolutePath + "/e=2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(dir.getAbsolutePath)
    merged.schema.fieldNames.toSet shouldBe Set("id", "name", "quality", "e")
    val rows = merged.select("id", "quality").orderBy("id")
      .as[(Long, Option[Double])].collect()
    rows shouldBe Array((1L, None), (2L, None), (3L, Some(0.9)))
    // without mergeSchema the first-listed footer wins — the default the
    // fixed-schema Tables contract relies on (no surprise columns)
    val single = spark.read.parquet(dir.getAbsolutePath)
    single.schema.fieldNames should contain("id")
  }
}
