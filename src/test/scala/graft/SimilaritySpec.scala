package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {

  lazy val exact = Similarity.bruteForceTopK(spark, sf).collect()
  lazy val approx = Similarity.ivfTopK(spark, sf).collect()

  test("brute force returns k neighbors per query with ranks 1..k") {
    val byQuery = exact.groupBy(_.getLong(0))
    assert(byQuery.size == Similarity.NumQueries)
    byQuery.values.foreach { rows =>
      assert(rows.map(_.getLong(1)).sorted.sameElements(1L to Similarity.K))
    }
  }

  test("cosines are descending within each query") {
    exact.groupBy(_.getLong(0)).values.foreach { rows =>
      val cos = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cos.sameElements(cos.sortBy(-_)))
    }
  }

  test("IVF recall@k clears the random-data floor (nProbe/C)") {
    val e = exact.map(r => (r.getLong(0), r.getLong(2))).toSet
    val a = approx.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (e & a).size.toDouble / e.size
    info(s"IVF recall@${Similarity.K} = $recall")
    assert(recall >= Similarity.NProbe.toDouble / Similarity.Centroids)
  }

  test("IVF neighbors never beat the exact top-1") {
    val best = exact.filter(_.getLong(1) == 1L)
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    approx.foreach { r =>
      assert(r.getDouble(3) <= best(r.getLong(0)) + 1e-12)
    }
  }
}
