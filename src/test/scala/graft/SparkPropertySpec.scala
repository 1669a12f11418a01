package graft

import graft.core.Gds
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized-batch properties for the distributed merge/span
  * operators: each case is one Spark job over MANY generated groups
  * (a per-sample job would make shrink-driven scalacheck runs take
  * minutes), repeated across fixed seeds — deterministic, no flake.
  * The references are independent single-node brute forces. */
class SparkPropertySpec extends SparkSpec {
  import spark.implicits._

  test("upsertLatest == brute-force latest-wins for random out-of-order update batches") {
    for (seed <- Seq(11, 23, 47)) {
      val rnd = new Random(seed)
      val keys = (0L until 60L).toVector
      // key-unique target over a random subset of keys
      val target = keys.filter(_ => rnd.nextBoolean())
        .map(k => (k, rnd.nextInt(100).toLong, s"t$k"))
      // 0..4 updates per key with DISTINCT versions (equal versions with
      // different payloads are outside the contract: no order is latest)
      val updates = keys.flatMap { k =>
        rnd.shuffle((0 to 120).toList).take(rnd.nextInt(5))
          .map(o => (k, o.toLong, s"u$k-$o"))
      }
      val merged = Gds(target.toDF("k", "ord", "v"))
        .upsertLatest(Gds(rnd.shuffle(updates).toDF("k", "ord", "v")),
          keys = Seq("k"), orderCols = Seq("ord"))
        .df.collect().map(r => (r.getLong(0), (r.getLong(1), r.getString(2)))).toMap

      val tBy = target.map(t => t._1 -> (t._2, t._3)).toMap
      val uBy = updates.groupBy(_._1).map { case (k, us) =>
        k -> us.map(u => (u._2, u._3)).maxBy(_._1)
      }
      val expected = (tBy.keySet ++ uBy.keySet).map { k =>
        k -> ((tBy.get(k), uBy.get(k)) match {
          case (Some(t), Some(u)) => if (u._1 >= t._1) u else t
          case (Some(t), None)    => t
          case (None, Some(u))    => u
          case _                  => sys.error("unreachable")
        })
      }.toMap
      assert(merged == expected, s"seed=$seed")
    }
  }

  test("cutSpans == brute-force interval-union token filter for random span sets") {
    for (seed <- Seq(5, 17, 31)) {
      val rnd = new Random(seed)
      val words = Vector("aa", "bb", "cc", "dd")
      val docs = (0L until 40L).map { id =>
        val ts = Vector.fill(1 + rnd.nextInt(15))(words(rnd.nextInt(words.size)))
        (id, ts.mkString(" "), ts)
      }
      val spans = docs.flatMap { case (id, _, ts) =>
        Vector.fill(rnd.nextInt(5)) {
          val s = rnd.nextInt(ts.length)
          val len = 1 + rnd.nextInt(ts.length - s)
          (0L, id, 0L, s.toLong, len.toLong)
        }
      }
      val out = Dedup.cutSpans(
        docs.map(d => (d._1, d._2)).toDF("doc_id", "text"),
        spans.toDF("id_l", "id_r", "pos_l", "pos_r", "span_len"),
        "doc_id", "text", k = 3)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap

      docs.foreach { case (id, _, ts) =>
        val covered = spans.filter(_._2 == id)
          .flatMap(sp => sp._4 until (sp._4 + sp._5)).toSet
        val kept = ts.zipWithIndex.collect { case (t, i) if !covered(i.toLong) => t }
        assert(out(id) == ((ts.length.toLong, covered.size.toLong, kept.mkString(" "))),
          s"seed=$seed doc=$id")
      }
    }
  }

  test("phraseSearch == brute-force sliding-window scan for random corpora and phrases") {
    val vocab = Vector("go", "stop", "the", "data", "lake", "x9")
    for (seed <- Seq(5, 17, 91)) {
      val rnd = new Random(seed)
      val docs = (1L to 80L).map { id =>
        id -> Vector.fill(3 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
      }
      val df = docs.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("doc_id", "text")
      // random phrases of length 1..3 (repeats allowed: "go go")
      val phrases = (0 until 5).map { _ =>
        Vector.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size)))
      }
      phrases.foreach { p =>
        val got = graft.operators.Search.phraseSearch(df, "doc_id", "text", p)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val want = docs.flatMap { case (id, ts) =>
          (0 to ts.length - p.length).collect {
            case i if ts.slice(i, i + p.length) == p => (id, i.toLong)
          }
        }.toSet
        assert(got == want, s"seed=$seed phrase=${p.mkString(" ")}")
      }
    }
  }

  test("proximityWindow == brute-force minimal covering window for random corpora") {
    val vocab = Vector("go", "stop", "the", "data", "lake", "x9")
    for (seed <- Seq(7, 29, 83)) {
      val rnd = new Random(seed)
      val docs = (1L to 80L).map { id =>
        id -> Vector.fill(3 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
      }
      val df = docs.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("doc_id", "text")
      val termSets = Seq(Seq("go"), Seq("go", "data"), Seq("the", "data", "x9"))
      termSets.foreach { terms =>
        val got = graft.operators.Search.proximityWindow(df, "doc_id", "text", terms)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = docs.flatMap { case (id, ts) =>
          val wins = for {
            i <- ts.indices; j <- i until ts.length
            if terms.forall(t => ts.slice(i, j + 1).contains(t))
          } yield (j - i + 1).toLong
          if (wins.isEmpty) None else Some(id -> wins.min)
        }.toMap
        assert(got == want, s"seed=$seed terms=${terms.mkString(",")}")
      }
    }
  }

  test("TopKAggregate == row_number window under randomized dense ties, any partitioning") {
    // the bounded-heap primitive half the ranking surface leans on
    // (search/ANN/top-paths): its (score DESC, id ASC) tie contract
    // must match the window formulation EXACTLY — scores drawn from a
    // tiny domain so ties dominate, ids unique per group (the operator
    // contract), insertion order randomized by the repartition
    for (seed <- Seq(7, 19, 31)) {
      val rnd = new Random(seed)
      val rows = (0 until 60).flatMap { g =>
        val n = rnd.nextInt(25)
        (0 until n).map { i =>
          (g.toLong, (rnd.nextInt(5) - 2).toDouble, g * 1000L + i)
        }
      }
      for (k <- Seq(1, 3, 8); parts <- Seq(1, 13)) {
        val df = rows.toDF("g", "score", "id").repartition(parts)
        val heap = df.groupBy(col("g"))
          .agg(graft.functions.TopKAggregate.topK(col("score"), col("id"), k).as("top"))
          .select(col("g"), posexplode(col("top")).as(Seq("r", "e")))
          .select(col("g"), col("e.id"), col("e.score"), (col("r") + 1).cast("long").as("rank"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)
        val win = df.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= k)
          .collect().map(r => (r.getAs[Long]("g"), r.getAs[Long]("id"),
            r.getAs[Double]("score"), r.getAs[Int]("rank").toLong)).toSet
        assert(heap == win, s"seed=$seed k=$k parts=$parts")
      }
    }
  }
}
