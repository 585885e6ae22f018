package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import SketchFunctions.{kminValues, kmvEstimate, kmvJaccard, kmvUnion}

/** [[KMinValues]] / [[SketchFunctions]]: bounded sketch contents,
  * exact-below-k estimates, partition/merge invariance, null
  * skipping, SQL registration, cross-sketch mergeability.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("below k the sketch IS the sorted distinct set and the estimate is exact") {
    val df = Seq(5L, 3L, 9L, 3L, 5L, 1L).toDF("h")
    val row = df.agg(
      kminValues(col("h"), 10).as("s"),
      kmvEstimate(kminValues(col("h"), 10), 10).as("e")).collect().head
    assert(row.getSeq[Long](0) === Seq(1L, 3L, 5L, 9L))
    assert(row.getDouble(1) === 4.0)
  }

  test("at k the sketch keeps exactly the k smallest distinct values") {
    val df = (1L to 100L).map(i => i * 7L).toDF("h")
    val got = df.agg(kminValues(col("h"), 8)).collect().head.getSeq[Long](0)
    assert(got === (1L to 8L).map(_ * 7L))
  }

  test("partitioning does not change the sketch (map-side partials merge)") {
    val vals = (1L to 5000L).map(i => (i * 2654435761L) % (1L << 40))
    val a = vals.toDF("h").repartition(1)
      .agg(kminValues(col("h"), 64)).collect().head.getSeq[Long](0)
    val b = vals.toDF("h").repartition(13)
      .agg(kminValues(col("h"), 64)).collect().head.getSeq[Long](0)
    assert(a === b)
    assert(a.length === 64)
  }

  test("null hashes are skipped; all-null group yields an empty sketch") {
    val df = Seq[(String, Option[Long])](("g", Some(4L)), ("g", None),
      ("n", None)).toDF("k", "h")
    val m = df.groupBy("k").agg(kminValues(col("h"), 4).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(m("g") === Seq(4L))
    assert(m("n") === Seq.empty)
  }

  test("two sub-corpus sketches merged == one sketch of the union") {
    val left = (1L to 2000L).map(i => (i * 40503L) % 100000L)
    val right = (1L to 2000L).map(i => (i * 69069L) % 100000L)
    val union = (left ++ right).toDF("h")
      .agg(kminValues(col("h"), 32)).collect().head.getSeq[Long](0)
    // merge = re-sketch over the concatenated sketch arrays: sound
    // because every value smaller than either kth-min survives in its
    // side's sketch
    val sketches = Seq(left, right).map(v =>
      v.toDF("h").agg(kminValues(col("h"), 32)).collect().head.getSeq[Long](0))
    val merged = sketches.flatten.toDF("h")
      .agg(kminValues(col("h"), 32)).collect().head.getSeq[Long](0)
    assert(merged === union)
  }

  test("SQL registration: kmin_values works in spark.sql") {
    Seq(9L, 2L, 5L).toDF("h").createOrReplaceTempView("kmv_in")
    val got = spark.sql("SELECT kmin_values(h, 2) AS s FROM kmv_in")
      .collect().head.getSeq[Long](0)
    assert(got === Seq(2L, 5L))
  }

  test("kmvUnion equals the union corpus's sketch; kmvJaccard exact below k") {
    val k = 8
    val left = Seq(1L, 2L, 3L, 4L, 5L)
    val right = Seq(4L, 5L, 6L, 7L)
    val row = Seq((left, right)).toDF("l", "r")
      .select(
        kmvUnion(
          kminValuesOf(left, k), kminValuesOf(right, k), k).as("u"),
        kmvJaccard(
          kminValuesOf(left, k), kminValuesOf(right, k), k).as("j"))
      .collect().head
    // below k both sketches are the exact sets, so the union sketch is
    // the exact union and the Jaccard estimate is the exact Jaccard
    assert(row.getSeq[Long](0) === Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    assert(row.getDouble(1) === 2.0 / 7)
    // disjoint sides -> 0; empty-vs-empty -> null
    val r2 = Seq(1).toDF("x").select(
      kmvJaccard(kminValuesOf(Seq(1L, 2L), k), kminValuesOf(Seq(3L), k), k).as("j0"),
      kmvJaccard(kminValuesOf(Nil, k), kminValuesOf(Nil, k), k).as("jn"))
      .collect().head
    assert(r2.getDouble(0) === 0.0)
    assert(r2.isNullAt(1))
  }

  /** Literal array stand-in for a sketch (k smallest distinct, sorted). */
  private def kminValuesOf(vals: Seq[Long], k: Int) = {
    val sk = vals.distinct.sorted.take(k)
    array(sk.map(lit): _*).cast("array<bigint>")
  }

  test("estimator lands near truth on a 60-bit uniform-ish domain") {
    // md5-derived hashes of 20k distinct strings, k=256
    val df = (1L to 20000L).map(_.toString).toDF("s")
      .select(conv(substring(md5(col("s")), 1, 15), 16, 10)
        .cast("long").as("h"))
    val est = df.agg(kmvEstimate(kminValues(col("h"), 256), 256))
      .collect().head.getDouble(0)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.15,
      s"KMV estimate $est too far from 20000")
  }
}
