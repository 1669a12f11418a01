package graft

import graft.operators.{Search, Similarity}
import org.apache.spark.sql.functions._

/** Model-based lifecycle fuzz for the two persisted stores: a SEEDED
  * random sequence of maintenance ops (append / delete / compact),
  * each optionally killed at a random protocol step boundary and then
  * retried, must leave the store equivalent to an in-memory model of
  * the live corpus after EVERY op. The single-op crash properties
  * (SearchSpec / SimilaritySpec) pin each protocol in isolation; this
  * pins their INTERACTIONS — append after delete, delete over
  * appended batches, compact mid-history, crash debris crossing op
  * boundaries. */
class StoreLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Vector("spark", "join", "window", "scan", "merge",
    "sort", "filter", "pad", "hash", "stream")

  test("postings store lifecycle fuzz: random op sequences with crash-retry always converge to the model") {
    val rnd = new scala.util.Random(1313L)
    def randText(): String =
      Seq.fill(3 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    (1 to 2).foreach { trial =>
      val path = java.nio.file.Files.createTempDirectory(s"graft_fuzz$trial").toString + "/idx"
      var nextId = 0L
      def mint(n: Int): Map[Long, String] =
        (1 to n).map { _ => nextId += 1; nextId -> randText() }.toMap
      var model = mint(6)
      Search.buildPostingsIndex(model.toSeq.toDF("doc_id", "text"), path,
        "doc_id", "text", nBuckets = 4)
      var batchNo = 0

      def checkEquivalent(stepTag: String): Unit = {
        val terms = rnd.shuffle(vocab).take(2).sorted
        val got = Search.queryPostingsIndex(spark, path, "doc_id", terms, k = 10)
          .collect().map(_.toSeq).toSet
        val want = Search.bm25TopK(model.toSeq.toDF("doc_id", "text"),
            "doc_id", "text", terms, k = 10)
          .collect().map(_.toSeq).toSet
        assert(got == want, s"[$stepTag] store diverged from model on terms $terms")
      }

      (1 to 8).foreach { step =>
        val tag = s"trial $trial step $step"
        rnd.nextInt(3) match {
          case 0 => // append, killed at a random boundary, then retried
            val delta = mint(1 + rnd.nextInt(3))
            batchNo += 1
            val bid = s"b$batchNo"
            val deltaDf = delta.toSeq.toDF("doc_id", "text")
            val steps = Search.appendPostingsSteps(deltaDf, path, "doc_id", "text", bid)
            steps.take(rnd.nextInt(steps.length + 1)).foreach(_._2())
            Search.appendPostingsIndex(deltaDf, path, "doc_id", "text", batchId = bid)
            model ++= delta
          case 1 => // delete a random (possibly empty) strict subset —
            // a store compacted to ZERO docs has no postings files to
            // infer a schema from (documented ≥1-doc contract)
            val victims = model.keys.toSeq.sorted
              .filter(_ => rnd.nextBoolean()).take(model.size - 1)
            Search.deleteFromPostingsIndex(spark, path,
              victims.toDF("doc_id"), "doc_id")
            model --= victims
          case 2 => // compact, killed at a random boundary, then retried
            if (new java.io.File(s"$path/deleted").exists()) {
              val steps = Search.compactPostingsSteps(spark, path)
              steps.take(rnd.nextInt(steps.length + 1)).foreach(_._2())
            }
            Search.compactPostingsIndex(spark, path)
        }
        checkEquivalent(tag)
      }
    }
  }

  test("IVF store lifecycle fuzz: random append/delete sequences with crash-retry match the frozen-quantizer model") {
    val rnd = new scala.util.Random(4242L)
    val dim = 8
    def randVec(): Seq[Float] = Seq.fill(dim)((rnd.nextGaussian() * 0.5).toFloat)
    val path = java.nio.file.Files.createTempDirectory("graft_fuzz_ivf").toString + "/idx"
    var nextId = 0L
    def mint(n: Int): Map[Long, Seq[Float]] =
      (1 to n).map { _ => nextId += 1; nextId -> randVec() }.toMap
    var model = mint(20)
    val centroids = Similarity.buildIvfIndex(model.toSeq.toDF("vec_id", "embedding"),
      path, "vec_id", "embedding", dim = dim, nCentroids = 4)
    var batchNo = 0

    def checkEquivalent(stepTag: String): Unit = {
      // exact check: the store's (id, cell) relation == a fresh
      // assignment of the model under the SAME frozen centroids
      val cell1 = graft.functions.VectorExpressions
        .nearestCentroids(col("embedding"), centroids, dim, centroids.length / dim, 1)
      val want = model.toSeq.toDF("vec_id", "embedding")
        .select(col("vec_id"), element_at(cell1, 1).as("__cell"))
        .collect().map(_.toSeq).toSet
      val got = spark.read.parquet(path)
        .select("vec_id", "__cell").collect().map(_.toSeq).toSet
      assert(got == want, s"[$stepTag] IVF store diverged from model")
    }

    (1 to 8).foreach { step =>
      val tag = s"ivf step $step"
      if (rnd.nextBoolean()) { // append, killed at a random boundary, then retried
        val delta = mint(1 + rnd.nextInt(4))
        batchNo += 1
        val bid = s"b$batchNo"
        val deltaDf = delta.toSeq.toDF("vec_id", "embedding")
        val steps = Similarity.appendIvfSteps(deltaDf, path, centroids,
          "embedding", dim, bid)
        steps.take(rnd.nextInt(steps.length + 1)).foreach(_._2())
        Similarity.appendIvfIndex(deltaDf, path, centroids, "embedding",
          dim = dim, batchId = bid)
        model ++= delta
      } else { // delete a strict subset, killed at a random boundary,
        // then retried (≥1 vector stays — the ≥1-doc store contract)
        val victims = model.keys.toSeq.sorted
          .filter(_ => rnd.nextBoolean()).take(model.size - 1)
        val delDf = victims.toDF("vec_id")
        val steps = Similarity.deleteFromIvfSteps(spark, path, delDf, "vec_id")._2
        steps.take(rnd.nextInt(steps.length + 1)).foreach(_._2())
        Similarity.deleteFromIvfIndex(spark, path, delDf, "vec_id")
        model --= victims
      }
      checkEquivalent(tag)
    }
  }
}
