package graft.silver

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.queries.Fixtures

/** Property layer (SURVEY §5 item 4): randomized auction batches —
  * missing keys, string-typed numerics, zero/null quantity, duplicate
  * ids — asserting the port's invariants. Uses raw ScalaCheck `Gen`
  * with a fixed seed (the scalatest-plus bridge isn't in the offline
  * cache); 10 deterministic samples per property.
  */
class SilverPropertiesSpec extends SparkSpec {

  private val auctionGen: Gen[String] = for {
    id <- Gen.choose(1L, 50L)
    itemId <- Gen.option(Gen.choose(100L, 110L))
    qty <- Gen.oneOf(
      Gen.const(Option.empty[String]),
      Gen.choose(0L, 5L).map(q => Option(q.toString)), // numeric
      Gen.choose(0L, 5L).map(q => Option("\"" + q + "\""))) // string-typed
    unitPrice <- Gen.option(Gen.choose(1L, 10000L))
    buyout <- Gen.option(Gen.choose(1L, 10000L))
    tl <- Gen.oneOf("SHORT", "MEDIUM", "LONG", "VERY_LONG")
  } yield {
    val fields = Seq(
      Some(s""""id": $id"""),
      itemId.map(i => s""""item": {"id": $i}"""),
      qty.map(q => s""""quantity": $q"""),
      unitPrice.map(p => s""""unit_price": $p"""),
      buyout.map(b => s""""buyout": $b"""),
      Some(s""""time_left": "$tl"""")).flatten
    fields.mkString("{", ", ", "}")
  }

  private val batchGen: Gen[List[String]] = Gen.listOfN(8, auctionGen)

  /** Deterministic samples — same batches every run. */
  private def samples(n: Int, seed: Long): Seq[List[String]] =
    (0 until n).map(i =>
      batchGen.apply(Gen.Parameters.default, Seed(seed + i))
        .getOrElse(sys.error("gen failed")))

  private def parse(batch: List[String], name: String) = {
    val json = batch.mkString("{\"auctions\": [", ",\n", "]}")
    SilverTransform.fromJson(
      spark, Fixtures.materialize(name, json), Fixtures.day1Date)
  }

  test("silver row count equals raw auction count (explode is 1:1)") {
    samples(10, 1000L).foreach { batch =>
      assert(parse(batch, "prop_count.json").count() === batch.length)
    }
  }

  test("unit_price null ==> no source could derive it") {
    samples(10, 2000L).foreach { batch =>
      val bad = parse(batch, "prop_null.json")
        .where("unit_price IS NULL AND (buyout IS NOT NULL AND quantity != 0)")
        .count()
      assert(bad === 0, s"batch: $batch")
    }
  }

  test("first-seen dedup is idempotent over random day pairs") {
    samples(5, 3000L).zip(samples(5, 4000L)).foreach { case (b1, b2) =>
      val d1 = parse(b1, "prop_d1.json").dropDuplicates("id")
      val d2 = parse(b2, "prop_d2.json").dropDuplicates("id")
      val merged = d1.unionByName(SilverTransform.firstSeenOnly(d2, d1))
      // second application adds nothing
      assert(SilverTransform.firstSeenOnly(d2, merged).count() === 0)
      // merged is unique by id
      assert(merged.groupBy("id").count().where("count > 1").count() === 0)
    }
  }
}
