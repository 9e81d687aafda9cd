package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.sources.DelimitedText

/** The delimited-scan contract: enforced schema, explicit malformed-row
  * handling (FAILFAST stops the load; PERMISSIVE quarantines into
  * `_corrupt_record` without losing the batch).
  */
class DelimitedTextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  private def writeCsv(name: String, lines: Seq[String]): String = {
    val dir = TestSpark.scratch(name)
    val f = new java.io.File(s"$dir/part.csv")
    f.getParentFile.mkdirs()
    val w = new java.io.PrintWriter(f)
    try lines.foreach(w.println) finally w.close()
    dir
  }

  test("strict scan reads clean data and fails the job on a malformed row") {
    val clean = writeCsv("csv-clean", Seq("id,name,score", "1,a,0.5", "2,b,1.5"))
    val rows = DelimitedText.readStrict(spark, clean, schema)
      .as[(Long, String, Double)].collect().toSet
    assert(rows == Set((1L, "a", 0.5), (2L, "b", 1.5)))

    val dirty = writeCsv("csv-dirty", Seq("id,name,score", "1,a,0.5", "oops,b,not_a_number"))
    val err = intercept[org.apache.spark.SparkException] {
      DelimitedText.readStrict(spark, dirty, schema).collect()
    }
    // the malformed-record error sits in the cause chain under the
    // generic FAILED_READ_FILE wrapper
    val messages = Iterator.iterate(err: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage.toLowerCase).mkString(" | ")
    assert(messages.contains("malformed"))
  }

  test("permissive scan quarantines malformed rows in _corrupt_record") {
    val dirty = writeCsv("csv-quarantine",
      Seq("id,name,score", "1,a,0.5", "oops,b,not_a_number", "3,c,2.25"))
    // Spark disallows projecting ONLY the corrupt column off a raw CSV
    // scan, so materialize full rows once and split in memory
    val rows = DelimitedText.readPermissive(spark, dirty, schema).collect()
    val (bad, clean) = rows.partition(r =>
      r.getAs[String](DelimitedText.CorruptColumn) != null)
    assert(clean.map(r => (r.getAs[Long]("id"), r.getAs[String]("name"),
      r.getAs[Double]("score"))).toSet == Set((1L, "a", 0.5), (3L, "c", 2.25)))
    assert(bad.map(_.getAs[String](DelimitedText.CorruptColumn)).toSeq ==
      Seq("oops,b,not_a_number"))
  }

  test("format conversion roundtrips parquet -> orc -> csv -> parquet exactly") {
    import graft.sources.Convert
    val base = TestSpark.scratch("convert")
    val src = Tables(spark, TestSpark.sf).orders
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    src.write.mode("overwrite").parquet(s"$base/p0")
    Convert.convert(spark, s"$base/p0", "parquet", s"$base/orc", "orc")
    Convert.convert(spark, s"$base/orc", "orc", s"$base/csv", "csv",
      repartitionTo = Some(2))
    // csv re-ingestion takes the enforced schema back
    Convert.convert(spark, s"$base/csv", "csv", s"$base/p1", "parquet",
      schema = Some(src.schema))
    val back = spark.read.parquet(s"$base/p1")
    assert(back.schema == src.schema)
    val a = src.orderBy("o_orderkey").collect().toSeq
    val b = back.orderBy("o_orderkey").collect().toSeq
    assert(a == b)
    // text sources without a schema are refused, not inferred
    val err = intercept[IllegalArgumentException] {
      Convert.read(spark, s"$base/csv", "csv")
    }
    assert(err.getMessage.contains("enforced schema"))
  }
}
