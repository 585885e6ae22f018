package graft.queries

import java.nio.file.{Files, Path, Paths}
import java.nio.charset.StandardCharsets

/** Reference-domain fixtures (FIXTURES.md §A) used by the gate queries
  * that exercise the REAL bronze→silver path
  * (reference `data_pipeline/assets/silver/transformation.py:17-84`),
  * and by the unit tests.
  *
  * Day 1 is FIXTURES.md A1 extended with the documented edge rows:
  * missing `item` struct (→ null item_id), null quantity (→ default 1),
  * quantity 0 with buyout only (→ division guard, null unit_price),
  * non-divisible buyout (→ floor/truncating division).
  * Day 2 overlaps auction id 1002 with day 1 → first-seen-wins dedup.
  */
object Fixtures {

  val day1Json: String =
    """{
      |  "_links": {},
      |  "connected_realm": {"id": 3209},
      |  "auctions": [
      |    {"id": 1001, "item": {"id": 190320, "modifiers": [{"type": 9, "value": 70}]},
      |     "quantity": 1, "buyout": 1250000, "bid": 1000000, "time_left": "VERY_LONG"},
      |    {"id": 1002, "item": {"id": 2589},
      |     "quantity": 200, "unit_price": 350, "time_left": "SHORT"},
      |    {"id": 1003, "item": {"id": 2589},
      |     "quantity": 50, "unit_price": 375, "time_left": "LONG"},
      |    {"id": 1004, "time_left": "MEDIUM"},
      |    {"id": 1005, "item": {"id": 777},
      |     "quantity": 0, "buyout": 5000, "time_left": "SHORT"},
      |    {"id": 1006, "item": {"id": 888},
      |     "quantity": 4, "buyout": 999, "time_left": "LONG"}
      |  ]
      |}""".stripMargin

  val day2Json: String =
    """{
      |  "connected_realm": {"id": 3209},
      |  "auctions": [
      |    {"id": 1002, "item": {"id": 2589},
      |     "quantity": 150, "unit_price": 360, "time_left": "MEDIUM"},
      |    {"id": 2001, "item": {"id": 2589},
      |     "quantity": 10, "unit_price": 400, "time_left": "SHORT"},
      |    {"id": 2002, "item": {"id": 190320, "modifiers": []},
      |     "quantity": 1, "buyout": 90000, "time_left": "LONG"}
      |  ]
      |}""".stripMargin

  val day1Date: java.sql.Date = java.sql.Date.valueOf("2026-02-13")
  val day2Date: java.sql.Date = java.sql.Date.valueOf("2026-02-14")

  /** Write a fixture document to a stable temp path (idempotent —
    * content is deterministic) and return the path, so the gate query
    * exercises the real file-reading `SilverTransform.fromJson`.
    */
  def materialize(name: String, content: String): String = {
    val dir = Paths.get(sys.props("java.io.tmpdir"), "graft-fixtures")
    Files.createDirectories(dir)
    val p: Path = dir.resolve(name)
    Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    p.toString
  }
}
