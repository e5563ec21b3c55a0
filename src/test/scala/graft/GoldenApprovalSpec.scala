package graft

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's own correctness paradigm — golden-output approval
  * testing (`test_compare_sql_local_and_prod_data.py:78-99`): cast every
  * cell to string, serialize each COLUMN to a newline-joined snapshot,
  * diff against the approved file. First run writes the goldens (they
  * are committed); later runs must match byte-for-byte.
  */
class GoldenApprovalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark
  val goldenDir: Path = Paths.get("src/test/resources/golden")
  val dir = TestSession.sfDir("0.001")

  /** Column-wise serialization exactly as the reference does: astype(str)
    * then '\n'.join per column (nulls rendered as the reference's pandas
    * 'None'). */
  def columnSnapshot(df: DataFrame, c: String): String =
    df.select(coalesce(col(c).cast("string"), lit("None")))
      .collect().map(_.getString(0)).mkString("\n")

  def approve(name: String, df: DataFrame): Unit = {
    Files.createDirectories(goldenDir)
    df.columns.foreach { c =>
      val f = goldenDir.resolve(s"$name.$c.approved.txt")
      val got = columnSnapshot(df, c)
      if (!Files.exists(f)) {
        Files.writeString(f, got)
        info(s"wrote golden ${f.getFileName} (first run)")
      } else {
        assert(got == Files.readString(f),
          s"column $c drifted from approved golden ${f.getFileName}")
      }
    }
  }

  test("golden: full ingest pipeline head (reference approval-diff shape)") {
    approve("q01_head", graft.operators.EtlOps.fullIngest(spark, dir).limit(100))
  }

  test("golden: freshness aggregation") {
    approve("q16", graft.operators.EtlOps.freshnessLatest(spark, dir))
  }

  test("golden: language-ID scores") {
    approve("q26_head", graft.operators.TextOps.langId(spark, dir).limit(50))
  }
}
