package graft.geonames

import java.io.{BufferedInputStream, FileOutputStream, InputStream}
import java.net.URI
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.zip.ZipFile

/** The reference's `download` step (geonames.js:184–221): fetch
  * `allCountries.zip` + the two admin-code files, then extract
  * `allCountries.txt` from the zip.
  *
  * This is deliberately driver-side, as in the reference — ingest of a
  * handful of upstream files is not an executor problem. At 100 TB the
  * right pattern is unchanged: land raw files onto shared/object storage
  * (here `destDir`), then let executors scan them; for *many* zips the
  * parallel alternative is `spark.read.format("binaryFile")` + a
  * per-file decompress in `flatMap`, which this module intentionally
  * does not need for 3 files.
  *
  * `fetch` is injectable so unit tests (and zero-egress environments)
  * can supply local streams instead of HTTP.
  */
object GeoNamesIngest {

  val files: Seq[String] =
    Seq("allCountries.zip", "admin1CodesASCII.txt", "admin2Codes.txt")

  type Fetcher = String => InputStream

  /** Default fetcher: HTTP GET via URL stream (geonames.js:61–67). */
  def httpFetcher(baseUrl: String = GeoNames.baseUrl): Fetcher =
    name => new BufferedInputStream(new URI(baseUrl + name).toURL.openStream())

  /** Download the three source files into `destDir` (sequential, like the
    * reference's `.series()` — three files, no parallelism needed).
    */
  def download(destDir: String, fetch: Fetcher): Unit = {
    Files.createDirectories(Paths.get(destDir))
    files.foreach { name =>
      val in = fetch(name)
      try Files.copy(in, Paths.get(destDir, name), StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
    }
  }

  /** Extract one entry from a zip (geonames.js:198–219: lazy entry scan
    * for `allCountries.txt`, piped to `destPath`).
    */
  def unzipEntry(zipPath: String, entryName: String, destPath: String): Unit = {
    val zf = new ZipFile(zipPath)
    try {
      val entry = zf.stream().filter(_.getName.endsWith(entryName)).findFirst()
        .orElseThrow(() => new IllegalArgumentException(
          s"entry $entryName not found in $zipPath"))
      val in = zf.getInputStream(entry)
      val out = new FileOutputStream(destPath)
      try in.transferTo(out)
      finally { in.close(); out.close() }
    } finally zf.close()
  }

  /** Full ingest: download + extract, leaving the three text files the
    * transform step reads (geonames.js:224, 230 staging contract).
    */
  def ingest(destDir: String, fetch: Fetcher): Unit = {
    download(destDir, fetch)
    unzipEntry(s"$destDir/allCountries.zip", "allCountries.txt",
      s"$destDir/allCountries.txt")
  }
}
