package graft.tools

import graft.geonames.JsNum

/** Differential-fuzz stdin worker for tools/jsnum_fuzz.py: one 16-hex
  * IEEE-754 bit pattern per input line, one [[JsNum.render]] output per
  * line — compared against node's `JSON.stringify` of the same bits to
  * prove the shortest-digit renderer matches ECMAScript across the
  * double regimes (uniform bit patterns hit subnormals, binade
  * boundaries, and non-short-decimal values that no TSV-sourced corpus
  * contains).
  */
object JsNumFuzz {
  def main(args: Array[String]): Unit = {
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(System.in), 1 << 20)
    val out = new java.io.PrintWriter(
      new java.io.BufferedWriter(new java.io.OutputStreamWriter(System.out), 1 << 20))
    var line = in.readLine()
    while (line != null) {
      val bits = java.lang.Long.parseUnsignedLong(line.trim, 16)
      out.println(JsNum.render(java.lang.Double.longBitsToDouble(bits)))
      line = in.readLine()
    }
    out.flush()
  }
}
