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
}
