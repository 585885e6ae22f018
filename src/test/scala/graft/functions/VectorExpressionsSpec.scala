package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorExpressionsSpec extends SparkSpec {

  import spark.implicits._

  test("intVecDot computes exact long dot products") {
    val df = Seq((Seq(1, 2, 3), Seq(4, 5, 6))).toDF("a", "b")
    val r = df.select(VectorFunctions.intVecDot($"a", $"b")).as[Long].collect()
    assert(r.toSeq === Seq(32L))
  }

  test("intVecDot agrees with the HOF formulation it replaces") {
    val df = Seq(
      (Seq(255, 0, 128, 7), Seq(1, 255, 2, 3)),
      (Seq(0, 0, 0, 0), Seq(255, 255, 255, 255))).toDF("a", "b")
    val rows = df.select(
      VectorFunctions.intVecDot($"a", $"b").as("native"),
      aggregate(zip_with($"a", $"b", (x, y) => (x * y).cast("long")),
        lit(0L), (acc, x) => acc + x).as("hof")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("mismatched lengths and null arrays yield NULL, not a prefix dot") {
    val df = Seq(
      (Some(Seq(1, 2, 3)), Some(Seq(1, 2))),
      (None: Option[Seq[Int]], Some(Seq(1, 2)))).toDF("a", "b")
    val r = df.select(VectorFunctions.intVecDot($"a", $"b")).collect()
    assert(r.forall(_.isNullAt(0)))
  }

  test("int_vec_dot is reachable from SQL") {
    Seq((Seq(2, 3), Seq(10, 100))).toDF("a", "b").createOrReplaceTempView("ivd")
    val r = spark.sql("SELECT int_vec_dot(a, b) AS s FROM ivd").as[Long].collect()
    assert(r.toSeq === Seq(320L))
  }

  test("no int32 overflow on max-magnitude int codes") {
    val big = Seq.fill(4)(Int.MaxValue)
    val df = Seq((big, Seq(2, 2, 2, 2))).toDF("a", "b")
    val r = df.select(VectorFunctions.intVecDot($"a", $"b")).as[Long].collect()
    assert(r.head === 4L * 2L * Int.MaxValue)
  }
}
