package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** CSV exports ≙ the reference's `sits_to_csv` (sample metadata,
  * /root/reference/R/sits_csv.R:25-50) and `sits_timeseries_to_csv`
  * (unnested per-point series, R/sits_csv.R). Plain `df.write.csv` with
  * header; `single = true` coalesces to one part file for the reference's
  * one-file convention — an explicit, bounded choice the caller makes for
  * sample-set exports, never the default (at cube scale you keep the
  * distributed multi-part layout).
  */
object Exports {

  /** Sample metadata export (`sits_to_csv`): identity + extent + label per
    * series — here (conv_id, start_ts, end_ts, n_points, label?).
    */
  def toCsv(df: DataFrame, path: String, single: Boolean = false): Unit =
    write(df, path, single)

  /** Per-point long-format series export (`sits_timeseries_to_csv`):
    * (conv_id, ts, metric, value) rows from a metric grid.
    */
  def timeseriesToCsv(grid: DataFrame, metric: String, path: String,
      single: Boolean = false): Unit =
    write(grid.select(col("conv_id"), col("bucket_ts").as("ts"),
      lit(metric).as("metric"), col("value")), path, single)

  private def write(df: DataFrame, path: String, single: Boolean): Unit =
    (if (single) df.coalesce(1) else df)
      .write.mode(SaveMode.Overwrite).option("header", "true")
      // ISO-8601 UTC timestamps so a round-trip re-read parses identically
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .csv(path)

  /** Re-read a CSV export with an explicit schema (no inference — schemas
    * are fixed in this engine, SURVEY §1.3).
    */
  def readCsv(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .csv(path)

  /** XLSX export ≙ `sits_to_xlsx` (R/sits_xlsx.R:110-160): one worksheet per
    * accuracy/confusion relation. The reference writes these via openxlsx
    * from driver-resident accuracy objects; the analog is a GUARDED collect
    * (accuracy tables are classes², sampling designs are label-count-sized —
    * never data-scale; `maxRows` makes the bound explicit and loud). The
    * workbook is written dependency-free as minimal OOXML: a zip of five XML
    * parts with inline strings — readable by Excel/LibreOffice/openpyxl.
    * Numbers stay typed numeric cells, booleans typed boolean, everything
    * else an escaped inline string; row 1 carries the column headers.
    */
  def toXlsx(sheets: Seq[(String, DataFrame)], path: String,
      maxRows: Int = 100000): Unit = {
    require(sheets.nonEmpty, "toXlsx: no sheets")
    val collected = sheets.map { case (name, df) =>
      val rows = df.limit(maxRows + 1).collect()
      require(rows.length <= maxRows,
        s"toXlsx sheet '$name' exceeds maxRows=$maxRows — xlsx export is for " +
          "summary relations; use parquet/csv for data-scale output")
      (name, df.columns.toSeq, rows)
    }
    def esc(s: String): String = {
      val cleaned = s.map(ch =>
        // XML 1.0 forbids most C0 controls even escaped — substitute
        if (ch < 0x20 && ch != '\t' && ch != '\n' && ch != '\r') '\ufffd' else ch)
      cleaned.replace("&", "&amp;").replace("<", "&lt;")
        .replace(">", "&gt;").replace("\"", "&quot;")
    }
    def colRef(i: Int): String = { // 0-based index → A, B, …, Z, AA, …
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    def cell(ref: String, v: Any): String = v match {
      case null => ""
      // NaN/Infinity are not valid OOXML numbers — write them as text
      case n: Double if n.isNaN || n.isInfinite =>
        s"""<c r="$ref" t="inlineStr"><is><t>$n</t></is></c>"""
      case n: Float if n.isNaN || n.isInfinite =>
        s"""<c r="$ref" t="inlineStr"><is><t>$n</t></is></c>"""
      case n: Byte => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Short => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Int => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Long => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Float => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Double => s"""<c r="$ref"><v>$n</v></c>"""
      case n: java.math.BigDecimal => s"""<c r="$ref"><v>$n</v></c>"""
      case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
      case s => s"""<c r="$ref" t="inlineStr"><is><t>${esc(s.toString)}</t></is></c>"""
    }
    def sheetXml(cols: Seq[String], rows: Array[org.apache.spark.sql.Row]): String = {
      val sb = new StringBuilder
      sb ++= """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
      sb ++= """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>"""
      sb ++= s"""<row r="1">${cols.zipWithIndex.map { case (c, i) =>
        cell(s"${colRef(i)}1", c) }.mkString}</row>"""
      rows.zipWithIndex.foreach { case (r, ri) =>
        val rn = ri + 2
        sb ++= s"""<row r="$rn">"""
        cols.indices.foreach(ci => sb ++= cell(s"${colRef(ci)}$rn", r.get(ci)))
        sb ++= "</row>"
      }
      sb ++= "</sheetData></worksheet>"
      sb.toString
    }
    val names = collected.zipWithIndex.map { case ((name, _, _), i) =>
      val clean = name.replaceAll("[\\\\/?*\\[\\]:]", "_").take(31)
      if (clean.isEmpty) s"sheet${i + 1}" else clean
    }
    // Excel requires case-insensitively unique sheet names and reserves
    // the name "History"
    require(names.map(_.toLowerCase).distinct.length == names.length,
      s"toXlsx: sheet names clash case-insensitively after cleaning: $names")
    require(!names.exists(_.equalsIgnoreCase("History")),
      "toXlsx: 'History' is a reserved sheet name in Excel")
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(path)))
    def part(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    try {
      val n = collected.length
      part("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        (1 to n).map(i =>
          s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString +
        "</Types>")
      part("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        "</Relationships>")
      part("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
        names.zipWithIndex.map { case (nm, i) =>
          s"""<sheet name="${esc(nm)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>""" }.mkString +
        "</sheets></workbook>")
      part("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        (1 to n).map(i =>
          s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""").mkString +
        "</Relationships>")
      collected.zipWithIndex.foreach { case ((_, cols, rows), i) =>
        part(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(cols, rows))
      }
    } finally zos.close()
  }
}
