package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Hybrid, Mmr}

/** Behavioral contracts of the retrieval composition operators (RRF
  * fusion, MMR re-ranking) that the hash gates can't express: exact
  * fusion arithmetic on crafted lists, and the greedy diversity
  * properties of MMR against its own relevance baseline. */
class RetrievalSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("rrfFuse sums exact integer contributions across lists") {
    import spark.implicits._
    // doc 1 is rank 1 in both lists; doc 2 only lexical rank 2; doc 3
    // only semantic rank 2 — all contributions are floor(1e9/(60+r))
    val lex = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "rank")
    val sem = Seq((1L, 1L), (3L, 2L)).toDF("doc_id", "rank")
    val fused = Hybrid.rrfFuse(Seq("lex" -> lex, "sem" -> sem), topK = 10)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rrf"),
        r.getAs[Long]("lex_rank"), r.getAs[Long]("sem_rank"))).toSeq
    val c1 = 1000000000L / 61; val c2 = 1000000000L / 62
    assert(fused == Seq((1L, 2 * c1, 1L, 1L), (2L, c2, 2L, 0L),
      (3L, c2, 0L, 2L)), fused.toString)
  }

  test("a doc on both lists outranks a doc that leads only one (fusion point)") {
    import spark.implicits._
    // doc 9 is rank 1 lexical only; doc 5 is rank 3 on BOTH lists —
    // 2/63 > 1/61, the precise reason hybrid beats either single list
    val lex = Seq((9L, 1L), (7L, 2L), (5L, 3L)).toDF("doc_id", "rank")
    val sem = Seq((8L, 1L), (6L, 2L), (5L, 3L)).toDF("doc_id", "rank")
    val top = Hybrid.rrfFuse(Seq("lex" -> lex, "sem" -> sem), topK = 1)
      .collect()(0)
    assert(top.getAs[Long]("doc_id") == 5L, top.toString)
  }

  test("MMR's first pick per query is the pure relevance argmax") {
    val e = Tables.embeddings(spark, sf)
    val picks = Mmr.mmrRerank(e).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("step"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("mmr")))
    val first = picks.filter(_._2 == 1L)
    assert(first.length == Mmr.NQueries)
    // step-1 mmr equals rel (empty picked set): re-derive the argmax
    // from the brute relevance ranking and compare
    val rel = SparkEntry.queries("q30_cosine_topk")(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) =>
        q -> rs.minBy(r => (-r.getAs[Double]("sim"),
          r.getAs[Long]("neighbor_id"))).getAs[Long]("neighbor_id")
      }
    for ((q, _, d, _) <- first if rel.contains(q))
      assert(rel(q) == d, s"query $q: MMR first pick $d != relevance argmax ${rel(q)}")
  }

  test("MMR picks are distinct per query and diversity engages somewhere") {
    val e = Tables.embeddings(spark, sf)
    val picks = Mmr.mmrRerank(e).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("step"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("mmr")))
    val byQ = picks.groupBy(_._1)
    byQ.foreach { case (q, ps) =>
      assert(ps.map(_._3).distinct.length == ps.length, s"query $q repeated a pick")
      assert(ps.map(_._2).sorted.toSeq == (1L to ps.length).toSeq, s"query $q steps")
    }
    // the diversity penalty must actually bite: at least one query's
    // MMR top-5 differs from its relevance top-5
    val relTop = SparkEntry.queries("q30_cosine_topk")(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val diverged = byQ.exists { case (q, ps) =>
      relTop.contains(q) && ps.map(_._3).toSet != relTop(q)
    }
    assert(diverged, "MMR never diverged from pure relevance — penalty inert")
    // (no monotonicity assertion on the objective: with near-orthogonal
    // vectors the max-sim penalty goes NEGATIVE, so a later step's
    // rel − maxsim can legitimately exceed an earlier step's)
  }
}
