package graft.gen

import graft.sketch.Murmur3x64

/** Deterministic raw text/CSV fixtures for the line-scan and CSV-field
  * operators (SURVEY §2.1 S1/S5, §2.2 P2). The reference consumes raw
  * stdin lines (/root/reference/src/stream_reducer.rs:13-29 strips the
  * trailing `\n` and an optional `\r`) and CSV exports (the amazon
  * notebook's reviewer extraction); here the same bytes are read through
  * `spark.read.text` / `spark.read.csv` — and, because the fixture is a
  * pure function of nothing but this code, DuckDB reads an identical copy
  * written by Verify for the oracle compare.
  */
object RawFixtures {

  /** key ' ' value lines with MIXED `\n` / `\r\n` terminators — the
    * newline-normalization case (P2): every third line is CRLF, and a
    * correct line scan must strip the `\r` before the value is used. */
  def linesText: String = {
    val sb = new StringBuilder
    (0 until 2000).foreach { i =>
      val k = Murmur3x64.mix64(i.toLong + 11) & 7
      // values repeat across lines (mod 311) so the per-key distinct
      // count differs from the line count — a \r leaking into the value
      // splits every CRLF value into a distinct group and fails the gate
      val v = Murmur3x64.mix64(i.toLong * 31 + 7) & 311
      sb.append(s"key$k v$v")
      sb.append(if (i % 3 == 0) "\r\n" else "\n")
    }
    sb.toString
  }

  /** RFC4180 CSV with a header and adversarial quoting: embedded commas,
    * doubled quotes, and quoted fields — the parse must agree byte-for-
    * byte between Spark's univocity reader and DuckDB's sniffer. */
  def csvText: String = {
    def quote(s: String): String =
      if (s.exists(c => c == ',' || c == '"')) "\"" + s.replace("\"", "\"\"") + "\""
      else s
    val sb = new StringBuilder("id,cat,msg,val\n")
    (0 until 600).foreach { i =>
      val cat = "c" + (Murmur3x64.mix64(i.toLong + 3) & 3)
      val msg =
        if (i % 5 == 0) s"hello, world #$i"
        else if (i % 11 == 0) s"""say "hi" $i"""
        else s"plain message $i"
      val cents = math.floorMod(Murmur3x64.mix64(i.toLong * 13 + 1), 100000L)
      sb.append(s"$i,$cat,${quote(msg)},${cents / 100}.${f"${cents % 100}%02d"}\n")
    }
    sb.toString
  }

  /** Idempotent write of a fixture under java.io.tmpdir; returns the
    * absolute path (the queries read it, Verify copies the same content
    * into its outDir for DuckDB). */
  def tmpPath(name: String, content: String): String = {
    val f = new java.io.File(System.getProperty("java.io.tmpdir"), name)
    val bytes = content.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (!f.exists() || f.length() != bytes.length)
      java.nio.file.Files.write(f.toPath, bytes): Unit
    f.getAbsolutePath
  }

  def linesPath: String = tmpPath("graft_lines_input.txt", linesText)
  def csvPath: String = tmpPath("graft_csv_input.csv", csvText)
}
