package graft

import graft.queries.VectorQueries

/** Semantics pin for vec_silhouette: well-separated label clusters score
  * near 1; labels scattered across the same blob score near 0 — the
  * discrimination that makes the metric worth reporting next to
  * centroids in an embedding-dedup pipeline.
  */
class SilhouetteSpec extends SparkSpec {
  import sqlImplicits._

  private def write(vecs: Seq[(Long, Array[Float], Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("sil").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def vec(axis: Int, jitter: Float): Array[Float] = {
    val a = Array.fill(8)(0.0f)
    a(axis) = 10.0f
    a((axis + 1) % 8) = jitter
    a
  }

  test("separated clusters score near 1, scattered labels near 0") {
    // two tight clusters on orthogonal axes, 20 vectors each
    val sep = (0 until 40).map { i =>
      val lab = i % 2
      (i.toLong, vec(axis = lab * 4, jitter = (i / 2 % 5) * 0.1f), lab)
    }
    val sepScores = VectorQueries.queries("vec_silhouette")(spark,
      write(sep)).as[(Int, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(sepScores.values.forall(_ > 0.9), s"separated $sepScores")

    // same blob, labels assigned arbitrarily: b ≈ a ⇒ s ≈ 0
    val mixed = (0 until 40).map { i =>
      (i.toLong, vec(axis = 0, jitter = (i % 5) * 0.1f), i % 2)
    }
    val mixScores = VectorQueries.queries("vec_silhouette")(spark,
      write(mixed)).as[(Int, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(mixScores.values.forall(_.abs < 0.3), s"mixed $mixScores")
  }
}
