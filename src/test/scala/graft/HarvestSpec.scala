package graft

import java.time.LocalDate

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Harvest

/** Harvest planner (S1) + incremental window (X28) + last-write-wins
  * upsert (S6). */
class HarvestSpec extends AnyFunSuite {

  test("striped page plan covers [0, total) exactly once, stride w*limit") {
    val pages = Harvest.planPages(total = 1000, limit = 100, workers = 3)
    val offsets = pages.map(_.offset).sorted
    assert(offsets == (0 until 1000 by 100).toList)
    // worker stripes: 0 -> 0,300,600,900; 1 -> 100,400,700; 2 -> 200,500,800
    assert(pages.filter(_.worker == 0).map(_.offset) == Seq(0, 300, 600, 900))
    assert(pages.filter(_.worker == 1).map(_.offset) == Seq(100, 400, 700))
    // total smaller than one stripe
    assert(Harvest.planPages(50, 100, 3).map(_.offset) == Seq(0))
    assert(Harvest.planPages(0, 100, 3).isEmpty)
  }

  test("incremental window is the 10-day code behavior, not the 5-day doc") {
    assert(Harvest.incrementalParams(LocalDate.of(2026, 7, 15)) ==
      Map("updated_time__gte" -> "2026-07-05"))
  }

  test("upsert keeps latest version per id, new batch wins ties") {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val old = Seq((1L, "a", "2024-01-01"), (2L, "b", "2024-01-02"))
      .toDF("id", "v", "updated")
    val neu = Seq((2L, "b2", "2024-01-03"), (2L, "b-tie", "2024-01-02"),
      (3L, "c", "2024-01-01")).toDF("id", "v", "updated")
    val merged = Harvest.upsert(old, neu, "id", "updated")
      .orderBy("id").select("id", "v").as[(Long, String)].collect().toSeq
    assert(merged == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
  }
}
