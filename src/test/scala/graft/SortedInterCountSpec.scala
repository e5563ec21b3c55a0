package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native sorted_inter_count must equal size(array_intersect(a, b))
  * on SORTED inputs — every LSH verification and the k-truss support
  * computation ride that equivalence (round-13 optimization). */
class SortedInterCountSpec extends AnyFunSuite {

  private val spark = TestSession.spark

  test("equals size(array_intersect) on random sorted long arrays " +
      "(with duplicates and empties)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (1 to 500).map { _ =>
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(30).toLong).sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(30).toLong).sorted
      (a, b)
    } :+ ((Seq.empty[Long], Seq.empty[Long])) :+
      ((Seq(1L, 1L, 1L), Seq(1L, 1L))) :+
      ((Seq(1L, 2L, 3L), Seq.empty[Long]))
    val df = rows.toDF("a", "b")
      .select(
        call_function("sorted_inter_count", col("a"), col("b"))
          .as("native"),
        size(array_intersect(col("a"), col("b"))).cast("bigint")
          .as("builtin"))
    assert(df.filter(col("native") =!= col("builtin")).count() == 0)
  }

  test("equals size(array_intersect) on random sorted string arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val words = Vector("alpha", "beta", "gamma", "delta", "", "é漢",
      "zz top", "a", "ab", "abc")
    val rows = (1 to 500).map { _ =>
      val a = Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.size))).sorted
      val b = Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.size))).sorted
      (a, b)
    }
    val df = rows.toDF("a", "b")
      .select(
        call_function("sorted_inter_count", col("a"), col("b"))
          .as("native"),
        size(array_intersect(col("a"), col("b"))).cast("bigint")
          .as("builtin"))
    assert(df.filter(col("native") =!= col("builtin")).count() == 0)
  }

  test("null elements sort first and match once (array_intersect rule)") {
    import spark.implicits._
    val rows = Seq(
      (Seq(Option.empty[Long], Some(1L), Some(2L)),
        Seq(Option.empty[Long], Some(2L))),
      (Seq(Option.empty[Long], Option.empty[Long], Some(3L)),
        Seq(Option.empty[Long])),
      (Seq(Some(1L)), Seq(Option.empty[Long], Some(1L))))
    val df = rows.toDF("a", "b").select(
      call_function("sorted_inter_count", col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).cast("bigint")
        .as("builtin"))
    assert(df.filter(col("native") =!= col("builtin")).count() == 0)
  }

  test("null array input yields null (nullIntolerant)") {
    import spark.implicits._
    val df = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]]))
      .toDF("a", "b")
      .select(call_function("sorted_inter_count", col("a"), col("b"))
        .as("n"))
    assert(df.filter(col("n").isNull).count() == 1)
  }

  test("sort_array(collect_list) feed matches the unsorted " +
      "array_intersect verification on a real shingle frame") {
    val dir = TestSession.sfDir("0.001")
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        explode(expr(graft.operators.DedupOps.wordGramArrayExpr(3)))
          .as("shingle"))
      .distinct()
    val sorted = d.groupBy("doc_id")
      .agg(sort_array(collect_list(col("shingle"))).as("shs"))
    val unsorted = d.groupBy("doc_id")
      .agg(collect_list(col("shingle")).as("shs"))
    val pairs = sorted.limit(50).select(col("doc_id").as("ia"),
        col("shs").as("sa"))
      .crossJoin(sorted.limit(50).select(col("doc_id").as("ib"),
        col("shs").as("sb")))
    val pairsU = unsorted.limit(50).select(col("doc_id").as("ia"),
        col("shs").as("sa"))
      .crossJoin(unsorted.limit(50).select(col("doc_id").as("ib"),
        col("shs").as("sb")))
    val n1 = pairs.select(
      call_function("sorted_inter_count", col("sa"), col("sb")).as("n"),
      col("ia"), col("ib"))
    val n2 = pairsU.select(
      size(array_intersect(col("sa"), col("sb"))).cast("bigint").as("n"),
      col("ia"), col("ib"))
    assert(n1.join(n2, Seq("ia", "ib"))
      .filter(n1("n") =!= n2("n")).count() == 0)
  }
}
