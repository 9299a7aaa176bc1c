package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.dedup.Dedup
import graft.multimodal.{MediaCodec, Multimodal}
import graft.similarity.Similarity
import graft.text.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens / shingles / counts") {
    val df = Seq("  the quick brown fox  ", "a b").toDF("text")
    val out = df.select(
      TextOps.tokenCount($"text").as("n"),
      TextOps.wordShingles(TextOps.tokens($"text"), 3).as("sh3"))
    val rows = out.as[(Int, Seq[String])].collect()
    assert(rows(0) === ((4, Seq("the quick brown", "quick brown fox"))))
    assert(rows(1) === ((2, Seq.empty))) // shorter than n -> empty, not desc-sequence
  }

  test("stopword ratio and quality score bounds") {
    val df = Seq("the the the", "alpha beta gamma delta").toDF("text")
    val r = df.select(
      TextOps.stopwordRatio(TextOps.tokens($"text"), Seq("the")).as("sr"),
      TextOps.qualityScore($"text", Seq("the")).as("q"))
      .as[(Double, Double)].collect()
    assert(r(0)._1 === 1.0)
    assert(r(0)._2 === 0.0) // all stopwords -> zero quality
    assert(r(1)._1 === 0.0)
    assert(r(1)._2 > 0.0 && r(1)._2 <= 1.0)
  }

  test("fused qualityMetrics struct equals the HOF formulation, " +
      "including split/trim edge cases") {
    graft.functions.Native.register(spark)
    val stops = Seq("the", "a", "of", "and", "is")
    // adversarial shapes: tabs (trim strips only 0x20, split keeps
    // leading/trailing empty fields), all-space (-> [""] token), unicode
    // (non-alnum per codepoint), punctuation, repeated stopwords
    val texts = Seq(
      "the quick brown fox", "  padded  both  ends  ", "\tleading tab",
      // ("" excluded: ANSI mode makes the HOF division throw on length
      // 0; the fused expression yields NaN there instead — below)
      "trailing tab\t", "a\tb\nc\rd", "   ", "the the the the",
      "caFÉ déjà-vu ünïcode", "x" * 250 + " the end", "1 2 3 4!!!",
      "of", "OF the The", "a  a   a", "mixedvertical\ftab")
    val df = texts.toDF("text")
    val hof = df.select(
      size(TextOps.tokens($"text")).as("n_tokens"),
      TextOps.stopwordRatio(TextOps.tokens($"text"), stops).as("stop_ratio"),
      TextOps.nonAlnumRatio($"text").as("nonalnum_ratio"),
      TextOps.qualityScore($"text", stops).as("quality"))
      .collect().map(_.toString)
    val fused = df.select(TextOps.qualityMetrics($"text", stops).as("m"))
      .select(col("m.n_tokens"), col("m.stop_ratio"),
        col("m.nonalnum_ratio"), col("m.quality"))
      .collect().map(_.toString)
    // bit-identical per row
    assert(fused.toSeq === hof.toSeq)
    // empty text: one empty token, NaN char ratios (no ANSI throw)
    val e = Seq("").toDF("text")
      .select(TextOps.qualityMetrics($"text", stops).as("m"))
      .select(col("m.n_tokens"), col("m.nonalnum_ratio")).head
    assert(e.getInt(0) === 1 && e.getDouble(1).isNaN)
  }

  test("fused gopherMetrics struct equals the pinned-HOF formulation, " +
      "including empty-token and repeated-gram edge cases") {
    graft.functions.Native.register(spark)
    import graft.ops.Ops.materializedColumn
    // adversarial shapes: heavy repetition (top/dup fracs interact),
    // single-token (no bigrams), two-token (no trigrams), tabs (empty
    // leading/trailing fields join into grams like " a"), all-space
    // (-> [""] token), case-sensitive tokens, long repeated runs
    val texts = Seq(
      "the quick brown fox", "a a a a a a", "one", "two words",
      "\ttab lead", "trail\t", "   ", "a b a b a b a b c",
      "x y x z x y x z", "A a A a", "w " * 80 + "end",
      "p q r p q r p q r p q", "solo  double   triple")
    val df = texts.toDF("text")
    val withT = materializedColumn(df, "t", TextOps.tokens($"text"))
    val withBg = materializedColumn(withT, "bg", TextOps.wordShingles($"t", 2))
    val withTg = materializedColumn(withBg, "tg", TextOps.wordShingles($"t", 3))
    val hof = withTg.select(
      size($"t").as("n_tokens"),
      TextOps.dupGramFrac($"t").as("dup_token_frac"),
      TextOps.topGramFrac($"bg").as("top_bigram_frac"),
      TextOps.dupGramFrac($"bg").as("dup_bigram_frac"),
      TextOps.topGramFrac($"tg").as("top_trigram_frac"))
      .collect().map(_.toString)
    val fused = df.select(TextOps.gopherMetrics($"text").as("g"))
      .select(col("g.n_tokens"), col("g.dup_token_frac"),
        col("g.top_bigram_frac"), col("g.dup_bigram_frac"),
        col("g.top_trigram_frac"))
      .collect().map(_.toString)
    assert(fused.toSeq === hof.toSeq) // bit-identical per row
  }

  test("fused tokenStats and langScores equal their HOF formulations " +
      "on split/trim/unicode edge cases") {
    graft.functions.Native.register(spark)
    import graft.ops.Ops.materializedColumn
    val texts = Seq(
      "the quick brown fox", "  padded  both  ends  ", "\tleading tab",
      "trailing tab\t", "a\tb\nc\rd", "   ", "one", "two words",
      "caFÉ déjà-vu ünïcode", "der und die la le est y es", "the la",
      "el el el", "und", "x" * 300, "a  a   a")
    val df = texts.toDF("text")
    val withT = materializedColumn(df, "t", TextOps.tokens($"text"))
    // token stats: n_tokens / n_shingles(3) / total codepoint chars
    val hofStats = withT.select(
      size($"t").as("n"),
      size(TextOps.wordShingles($"t", 3)).as("n_sh"),
      TextOps.tokenChars($"t").as("chars"))
      .collect().map(_.toString)
    val fusedStats = df.select(TextOps.tokenStatsFused($"text").as("st"))
      .select(col("st.n_tokens").as("n"),
        greatest(col("st.n_tokens") - 2, lit(0)).as("n_sh"),
        col("st.total_chars").as("chars"))
      .collect().map(_.toString)
    assert(fusedStats.toSeq === hofStats.toSeq)
    // language scores: per-profile frequency counts in profile order
    val hofScores = withT.select(
      TextOps.langScores($"t").map { case (l, c) => c.as(s"s_$l") }: _*)
      .collect().map(_.toString)
    val fusedScores = df
      .select(TextOps.langScoresFused($"text").as("sc"))
      .select(TextOps.langProfiles.zipWithIndex.map { case ((l, _), i) =>
        element_at(col("sc"), i + 1).as(s"s_$l") }: _*)
      .collect().map(_.toString)
    assert(fusedScores.toSeq === hofScores.toSeq)
  }

  test("fingerprint is whitespace/case-insensitive") {
    val df = Seq(("a", "Hello  World"), ("b", "hello world")).toDF("id", "text")
    val fps = df.select(TextOps.fingerprint($"text")).as[String].collect()
    assert(fps(0) === fps(1))
  }

  test("langId picks the dominant profile with fixed tiebreak") {
    val df = Seq("der und das ist gut", "xyzzy blorp", "the a of and").toDF("text")
    val r = df.select(TextOps.langId($"text")).as[String].collect()
    assert(r === Array("de", "und", "en"))
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exactKeepMin keeps the smallest tiebreak row per key") {
    val df = Seq((1L, "x", "keep"), (2L, "x", "drop"), (3L, "y", "only"))
      .toDF("id", "key", "tag")
    val out = Dedup.exactKeepMin(df, $"key", $"id")
      .orderBy("id").as[(Long, String, String)].collect()
    assert(out === Array((1L, "x", "keep"), (3L, "y", "only")))
  }

  test("passageDedupStats keeps first occurrences across and within docs") {
    // chunk size 4: doc 1 = [abcd][efg], doc 2 repeats [abcd] then
    // diverges, doc 3 is an exact copy of doc 1 — so doc 2 loses its
    // first passage, doc 3 loses both, and the partial tail chunk
    // counts 3 tokens, not 4.
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d x y z"),
      (3L, "a b c d e f g")).toDF("doc_id", "text")
    val out = Dedup.passageDedupStats(docs, "doc_id", "text", 4)
      .orderBy("doc_id").as[(Long, Int, Int, Long)].collect()
    assert(out === Array((1L, 2, 0, 7L), (2L, 2, 1, 3L), (3L, 2, 2, 0L)))
    // within-doc repetition: the same passage twice in ONE doc keeps
    // only the first (position is part of the total order)
    val self = Seq((7L, "a b c d a b c d")).toDF("doc_id", "text")
    val o2 = Dedup.passageDedupStats(self, "doc_id", "text", 4)
      .as[(Long, Int, Int, Long)].head()
    assert(o2 === ((7L, 2, 1, 4L)))
  }

  test("jaccard is exact set similarity") {
    val df = Seq((Seq(1L, 2L, 3L, 3L), Seq(2L, 3L, 4L))).toDF("a", "b")
    val j = df.select(Dedup.jaccard($"a", $"b")).as[Double].head()
    assert(j === 0.5) // {1,2,3} vs {2,3,4}: 2 / 4
  }

  test("pairsFromIds expands unordered unique pairs") {
    val df = Seq(Seq(3L, 1L, 2L)).toDF("ids")
    val pairs = df.select(explode(Dedup.pairsFromIds($"ids")).as("p"))
      .select("p.id1", "p.id2").as[(Long, Long)].collect().sorted
    assert(pairs === Array((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("minHashNearDupPairs finds planted near-duplicates") {
    val docs = (0 until 40).map { i =>
      (i.toLong, (0 until 30).map(j => s"tok${i}_$j").mkString(" "))
    }
    val planted = docs.take(4).map { case (id, text) =>
      (id + 1000L, text + " extra pad tail")
    }
    val df = (docs ++ planted).toDF("doc_id", "text")
    val pairs = Dedup.minHashNearDupPairs(df, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    val found = pairs.map(p => (p._1, p._2)).toSet
    assert((0 until 4).forall(i => found.contains((i.toLong, i + 1000L))))
    assert(pairs.forall(_._3 >= 0.5))
    // no cross-document false positives among unrelated docs
    assert(pairs.forall(p => p._2 - p._1 == 1000L))
  }

  test("releaseCache frees the default-persisted shingle projection " +
    "while the caller still holds the result") {
    val df = (0 until 30).map(i =>
      (i.toLong, (0 until 20).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = Dedup.minHashNearDupPairs(df, "doc_id", "text")
    pairs.collect() // materialize -> the persisted base loads its blocks
    val imrs = pairs.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }
    assert(imrs.nonEmpty, "the shingle projection must be cached by default")
    assert(imrs.exists(_.cacheBuilder.isCachedColumnBuffersLoaded))
    Dedup.releaseCache(pairs)
    assert(imrs.forall(!_.cacheBuilder.isCachedColumnBuffersLoaded),
      "releaseCache must drop the cached blocks the held result pins")
    // the result stays usable — re-use simply re-materializes
    assert(pairs.count() >= 0)
  }

  test("connectedComponents resolves clusters to min-id representatives") {
    // chain 1-2-3-4-5 (multi-round propagation), pair {10,11}, pair
    // {20,21} plus cross-edge 21-22; node 30 isolated via self-pair-free
    // absence (not in any pair -> not in output)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L),
      (21L, 20L), (21L, 22L)).toDF("id1", "id2")
    val comp = Dedup.connectedComponents(pairs, "id1", "id2")
      .orderBy("id").as[(Long, Long)].collect()
    assert(comp === Array(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connectedComponents converges on a long chain and detects cycles") {
    val chain = (1L until 30L).map(i => (i, i + 1)).toDF("id1", "id2")
    val got = Dedup.connectedComponents(chain, "id1", "id2")
      .as[(Long, Long)].collect()
    assert(got.length === 30 && got.forall(_._2 == 1L))
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("id1", "id2")
    val gotC = Dedup.connectedComponents(cycle, "id1", "id2")
      .as[(Long, Long)].collect()
    assert(gotC.length === 3 && gotC.forall(_._2 == 1L))
    // maxRounds guard throws rather than spinning
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, "id1", "id2", maxRounds = 2)
    }
  }

  test("pointer jumping: a 1000-node path graph converges in < 15 " +
      "rounds (O(log diameter), not O(diameter))") {
    // plain one-hop min propagation needs ~1000 rounds here; the
    // rep(rep(id)) path-halving step makes the label distance shrink
    // geometrically — maxRounds = 15 would throw without it
    val path = (1L until 1000L).map(i => (i, i + 1)).toDF("id1", "id2")
    val got = Dedup.connectedComponents(path, "id1", "id2", maxRounds = 15)
      .as[(Long, Long)].collect()
    assert(got.length === 1000 && got.forall(_._2 == 1L))
  }

  test("maxBucket caps pathological-bucket pair expansion") {
    // 120 identical docs: every band bucket holds all 120 ids. Uncapped,
    // that expands 120·119/2 pairs; with the cap the hot buckets are
    // dropped (and counted in the observe metric) so work stays bounded.
    val df = (0 until 120).map(i =>
      (i.toLong, "same boiler plate text repeated again and again"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.minHashNearDupPairs(df, "doc_id", "text")
    assert(uncapped.count() === 120L * 119 / 2)
    val capped = Dedup.minHashNearDupPairs(df, "doc_id", "text", maxBucket = 50)
    assert(capped.collect().isEmpty)
  }

  test("capBuckets drops oversized buckets and reports them via observe") {
    val grouped = Seq(
      (1, (1L to 3L).toSeq), (2, (1L to 100L).toSeq), (3, (1L to 2L).toSeq))
      .toDF("b", "ids")
    val capped = Dedup.capBuckets(grouped, size($"ids"), "graft_test_buckets", 50)
    // survivors: the two small buckets (size 3 and 2); the 100-bucket drops
    // (collect capped ITSELF so its QueryExecution carries the metrics)
    assert(capped.collect().map(_.getInt(0)).sorted === Array(1, 3))
    val m = capped.queryExecution.observedMetrics("graft_test_buckets")
    assert(m.getAs[Long]("dropped_buckets") === 1L)
    assert(m.getAs[Int]("max_bucket") === 100)
  }

  test("lshNearDupPairs star-collapses oversized buckets: O(m) pivot " +
    "pairs, connectivity kept, star_buckets reported") {
    // 12 identical vectors -> one bucket of 12. Below the star
    // threshold: all 66 pairs; with starBucket = 5 the bucket exceeds
    // the threshold (but not the drop cap) -> 11 pivot pairs from the
    // min id, every member still connected, metric reports the collapse.
    val corpus = (0 until 12).map(i => (i.toLong, Seq(1.0, 2.0, 3.0)))
      .toDF("id", "vec")
    val all = Similarity.lshNearDupPairs(corpus, "id", "vec", dims = 3,
      minCosine = 0.99, bits = 4)
    assert(all.count() === 12L * 11 / 2)
    val starred = Similarity.lshNearDupPairs(corpus, "id", "vec", dims = 3,
      minCosine = 0.99, bits = 4, starBucket = 5)
    val rows = starred.collect()
    assert(rows.length === 11)
    assert(rows.forall(_.getLong(0) == 0L), "pivot must be the min id")
    assert(rows.map(_.getLong(1)).sorted === (1L to 11L).toArray)
    val m = starred.queryExecution.observedMetrics("graft_lsh_buckets")
    assert(m.getAs[Long]("star_buckets") === 1L)
    assert(m.getAs[Long]("dropped_buckets") === 0L)
  }

  test("simHash: identical docs hamming 0, perturbed docs close, " +
    "unrelated docs far") {
    val df = Seq(
      ("same", "a b c d e f g h i j"),
      ("same2", "a b c d e f g h i j"),
      ("other", "completely different words entirely here now ok"))
      .toDF("name", "text")
    val fps = df.select($"name", Dedup.simHash64(TextOps.tokens($"text")).as("fp"))
      .as[(String, Long)].collect().toMap
    assert(fps("same") === fps("same2"))
    assert(java.lang.Long.bitCount(fps("same") ^ fps("other")) > 10)
  }

  test("simHashNearDupPairs catches exact copies via chunk banding") {
    val docs = (0 until 20).map(i =>
      (i.toLong, (0 until 25).map(j => s"w${i}_$j").mkString(" ")))
    val copies = docs.take(3).map { case (id, t) => (id + 100L, t) }
    val out = Dedup.simHashNearDupPairs((docs ++ copies).toDF("doc_id", "text"),
      "doc_id", "text").as[(Long, Long, Int)].collect()
    val found = out.map(p => (p._1, p._2)).toSet
    assert((0 until 3).forall(i => found.contains((i.toLong, i + 100L))))
    assert(out.filter(p => p._2 - p._1 == 100L).forall(_._3 === 0))
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosineQ: colinear vectors -> 1.0, orthogonal -> 0.0") {
    val df = Seq(
      (Seq(1.0, 2.0, 0.0), Seq(2.0, 4.0, 0.0)),
      (Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0))).toDF("a", "b")
    val r = df.select(Similarity.cosineQ(
      Similarity.quantize($"a"), Similarity.quantize($"b"))).as[Double].collect()
    assert(math.abs(r(0) - 1.0) < 1e-9)
    assert(r(1) === 0.0)
  }

  test("bruteForceTopK returns k nearest with deterministic ranks") {
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(1.0f, 0.05f)), (4L, Seq(-1.0f, 0.0f))).toDF("id", "vec")
    val queries = corpus.filter($"id" === 0L)
      .select($"id".as("qid"), $"vec".as("qvec"))
    val top = Similarity.bruteForceTopK(queries, corpus, 2)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect()
    assert(top.map(_._2).toSeq === Seq(3L, 1L)) // nearest first
    assert(top.map(_._4).toSeq === Seq(1, 2))
  }

  test("ivfRangeSearch equals brute-force rangeSearch at every radius") {
    // pseudo-random 8-dim vectors + planted near-duplicates: the
    // pruning bound is exact, so the IVF-pruned result must match the
    // brute-force result ROW-FOR-ROW at any threshold and any k.
    def prng(i: Long, d: Int): Double = {
      val x = i * 2654435761L + d * 40503L
      ((x ^ (x >> 16)) % 1000).toDouble / 100.0 - 4.5
    }
    val base = (0L until 120L).map(i => (i, (0 until 8).map(d => prng(i, d))))
    val dups = base.filter(_._1 % 11 == 0).map { case (i, v) =>
      (i + 1000L, v.updated(0, v.head + 0.01)) }
    val corpus = (base ++ dups).toDF("id", "vec")
    val queries = corpus.filter($"id" < 8)
      .select($"id".as("qid"), $"vec".as("qvec"))
    for (k <- Seq(4, 9); tau <- Seq(0.2, 0.5, 0.9)) {
      val cents = Similarity.kmeansCentroids(corpus, k = k, iters = 3)
      val exact = Similarity.rangeSearch(queries, corpus, tau)
        .orderBy("qid", "id").as[(Long, Long, Double)].collect().toSeq
      val pruned = Similarity.ivfRangeSearch(queries, corpus, cents, tau)
        .orderBy("qid", "id").as[(Long, Long, Double)].collect().toSeq
      assert(pruned === exact, s"k=$k tau=$tau")
      assert(exact.nonEmpty || tau > 0.5) // low radii must find matches
    }
  }

  test("kmeansCentroids recovers well-separated clusters " +
    "deterministically; trained centroids drive ivfTopK") {
    // 3 angularly-separated clusters of 10 vectors each (tight jitter)
    val vecs = (0 until 30).map { i =>
      val axis = i % 3
      val base = Array(0.0, 0.0, 0.0)
      base(axis) = 10.0
      base((axis + 1) % 3) = 0.1 * (i / 3) // small within-cluster spread
      (i.toLong, base.toSeq)
    }
    val corpus = vecs.toDF("id", "vec")
    val c1 = Similarity.kmeansCentroids(corpus, k = 3, iters = 4)
    val c2 = Similarity.kmeansCentroids(corpus, k = 3, iters = 4)
    // deterministic across runs
    assert(c1.orderBy("cid").collect().toSeq ===
      c2.orderBy("cid").collect().toSeq)
    assert(c1.count() === 3)
    // every vector's nearest trained centroid separates the 3 clusters:
    // assignment must be pure (all members of an axis share a centroid,
    // different axes different centroids)
    val assign = Similarity.ivfAssign(corpus, c1)
      .select($"id", $"cid").as[(Long, Int)].collect().toMap
    val byAxis = (0 until 3).map(a =>
      (0 until 30).filter(_ % 3 == a).map(i => assign(i.toLong)).toSet)
    assert(byAxis.forall(_.size == 1), s"impure clusters: $byAxis")
    assert(byAxis.flatten.toSet.size === 3, s"clusters collapsed: $byAxis")
    // IVF search with trained centroids agrees with brute force
    val queries = corpus.filter($"id" === 0L)
      .select($"id".as("qid"), $"vec".as("qvec"))
    val ivf = Similarity.ivfTopK(queries, corpus, c1, nprobe = 1, k = 3)
      .select($"id").as[Long].collect().toSet
    val brute = Similarity.bruteForceTopK(queries, corpus, 3)
      .select($"id").as[Long].collect().toSet
    assert(ivf === brute)
  }

  test("ivfAssign unique-id contract: one row per id on unique input; " +
    "a duplicated id SURFACES as duplicate rows (never silently collapsed)") {
    val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
      .toDF("cid", "cvec")
    val unique = Seq((0L, Seq(1.0, 0.1)), (1L, Seq(0.1, 1.0)))
      .toDF("id", "vec")
    val a = Similarity.ivfAssign(unique, cents)
    assert(a.count() === 2)
    assert(a.select("id").distinct().count() === 2)
    // duplicate id 0 (conflicting vectors): the pre-r5 first(vq) shape
    // picked one arbitrarily; the join-back shape must emit BOTH rows so
    // the caller's input defect is visible, not masked
    val dup = unique.union(Seq((0L, Seq(0.2, 1.0))).toDF("id", "vec"))
    val d = Similarity.ivfAssign(dup, cents)
    // best is 1 row per id (2), join-back fans id 0 out over both its
    // corpus rows: 2 + 1 = 3 emitted rows
    assert(d.count() === 3, "duplicated id must yield duplicate rows")
    assert(d.filter($"id" === 0L).count() === 2)
  }

  test("pair generation scans the corpus ONCE: base projection cached, " +
      "no repeated file scans in the executed plan") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_scan_count").toString
    (0 until 40).map(i =>
        (i.toLong, (0 until 8).map(d => math.sin(i + d).toDouble).toSeq,
          s"tok${i % 5} tok${(i + 1) % 5} tok${(i + 2) % 5} tail$i end here"))
      .toDF("id", "vec", "text")
      .write.mode("overwrite").parquet(dir)
    val src = spark.read.parquet(dir)
    // In the executed plan every FileScan must sit INSIDE an
    // InMemoryTableScan's cached-plan print (the tree string prints the
    // cached child under each cache node, so equal counts == no bare
    // file scan), and the base must be referenced through the cache at
    // least twice (band branch + verify-join sides).
    def sourceScans(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      df.collect() // finalize any adaptive plan before inspecting
      // AQE prints "== Final Plan ==" then "== Initial Plan ==";
      // inspect only the final section (the whole string otherwise)
      val s = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      ("FileScan parquet".r.findAllIn(s).size,
        "InMemoryTableScan".r.findAllIn(s).size)
    }
    val (lshFile, lshMem) = sourceScans(
      Similarity.lshNearDupPairs(src, "id", "vec", dims = 8, minCosine = 0.9))
    assert(lshMem >= 2, "lsh plan does not share the cached base")
    assert(lshFile === lshMem,
      s"lsh plan has a file scan outside the cache ($lshFile vs $lshMem)")
    val (mhFile, mhMem) = sourceScans(
      Dedup.minHashNearDupPairs(src, "id", "text"))
    assert(mhMem >= 2, "minhash plan does not share the cached base")
    assert(mhFile === mhMem,
      s"minhash plan has a file scan outside the cache ($mhFile vs $mhMem)")
  }

  test("lshNearDupPairs finds planted near-identical vectors") {
    val vecs = (0 until 30).map { i =>
      (i.toLong, (0 until 8).map(d => math.sin(i * 8 + d + 1).toFloat * 2).toSeq)
    }
    val df = vecs.toDF("id", "fvec")
      .select($"id", transform($"fvec", x => x.cast("double")).as("vec"))
    val planted = df.filter($"id" < 3)
      .select(($"id" + 100L).as("id"), $"vec")
    val out = Similarity.lshNearDupPairs(df.unionByName(planted), "id", "vec",
      dims = 8, minCosine = 0.9999).as[(Long, Long, Double)].collect()
    val found = out.map(p => (p._1, p._2)).toSet
    assert((0 until 3).forall(i => found.contains((i.toLong, i + 100L))))
  }

  test("semanticDedup dominance rule: less central near-dup drops, " +
    "dissimilar cluster members survive, exact-tie keeps the lower id") {
    val cents = Seq((0, Seq(1.0, 0.0, 0.0)), (1, Seq(0.0, 1.0, 0.0)))
      .toDF("cid", "cvec")
    val corpus = Seq(
      (1L, Seq(10.0, 0.0, 0.0)),  // cluster 0, most central
      (2L, Seq(10.0, 0.5, 0.0)),  // cos(1,2)≈0.9988 ≥ τ → drops (less central)
      (3L, Seq(10.0, 3.0, 0.0)),  // cos(1,3)≈0.958 < τ → kept
      (4L, Seq(0.0, 10.0, 0.0)),  // cluster 1, most central
      (5L, Seq(0.0, 10.0, 0.5)),  // near-dup of 4 → drops
      (6L, Seq(10.0, 0.0, 0.0))   // exact duplicate of 1: ccos tie → higher id drops
    ).toDF("id", "vec")
    val out = Similarity.semanticDedup(corpus, cents, minCosine = 0.995)
      .orderBy("id").as[(Long, Int, Double, Boolean)].collect()
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L, 5L, 6L))
    assert(out.filter(_._4).map(_._1).toSet === Set(1L, 3L, 4L))
    // cluster assignment sanity: x-axis rows in cluster 0, y-axis in 1
    assert(out.filter(r => Set(1L, 2L, 3L, 6L)(r._1)).forall(_._2 == 0))
    assert(out.filter(r => Set(4L, 5L)(r._1)).forall(_._2 == 1))
  }

  test("semanticDedup star regime examines pivot pairs only — " +
    "non-pivot near-dups survive there but drop under all-pairs") {
    val cents = Seq((0, Seq(1.0, 0.0, 0.0))).toDF("cid", "cvec")
    // pivot (min id 10) is DISSIMILAR to both others; 11 and 12 are
    // near-identical to each other
    val corpus = Seq(
      (10L, Seq(10.0, 3.0, 0.0)),
      (11L, Seq(10.0, 0.0, 0.0)),
      (12L, Seq(10.0, 0.01, 0.0))
    ).toDF("id", "vec")
    def kept(star: Int) =
      Similarity.semanticDedup(corpus, cents, minCosine = 0.995,
          starBucket = star)
        .filter($"kept").select($"id").as[Long].collect().toSet
    // all-pairs: (11,12) over τ → 12 drops (11 is more central)
    assert(kept(star = 1000) === Set(10L, 11L))
    // star regime (m=3 > starBucket=2): only (10,11) and (10,12)
    // examined, both under τ → everything survives (documented
    // recall degradation, never a wrong drop)
    assert(kept(star = 2) === Set(10L, 11L, 12L))
  }

  test("IVF search over a persisted cid-partitioned assignment table " +
    "matches the inline path and partition-prunes") {
    val corpus = (0L until 60L).map { i =>
      (i, (0 until 8).map(d => math.cos(i * 3 + d).toDouble))
    }.toDF("id", "vec")
    val cents = corpus.filter($"id" % 15 === 0)
      .select($"id".as("cid"), $"vec".as("cvec"))
    val queries = corpus.filter($"id" < 3)
      .select($"id".as("qid"), $"vec".as("qvec"))
    val inline = Similarity.ivfTopK(queries, corpus, cents, nprobe = 2, k = 3)
      .orderBy("qid", "rank").collect()
    // persist the inverted lists partitioned by cid — the 100 TB layout
    val path = graft.TestSpark.scratch("ivf-assigned")
    Similarity.ivfAssign(corpus, cents)
      .write.partitionBy("cid").parquet(path)
    val persisted = Similarity.ivfSearchAssigned(
      spark.read.parquet(path), queries, cents, nprobe = 2, k = 3)
    assert(persisted.orderBy("qid", "rank").collect() === inline)
    // the probe join prunes list directories (dynamic partition pruning)
    val plan = persisted.queryExecution.executedPlan.toString()
    assert(plan.contains("dynamicpruning") ||
      plan.contains("DynamicPruning") || plan.contains("PartitionFilters"),
      s"expected partition pruning on the cid-partitioned read:\n$plan")
  }

  test("multi-table LSH (OR amplification) recalls a superset of one table") {
    val vecs = (0 until 50).map { i =>
      (i.toLong, (0 until 8).map(d => math.sin(i * 8 + d + 1) * 2).toSeq)
    }
    val df = vecs.toDF("id", "vec")
    val planted = df.filter($"id" < 4).select(($"id" + 100L).as("id"), $"vec")
    val corpus = df.unionByName(planted)
    def pairs(tables: Int) =
      Similarity.lshNearDupPairs(corpus, "id", "vec", dims = 8,
        minCosine = 0.9999, tables = tables)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
    val one = pairs(1)
    val three = pairs(3)
    // every candidate is cosine-verified, so more tables can only ADD
    // true pairs, never false ones
    assert(one.subsetOf(three))
    assert((0 until 4).forall(i => three.contains((i.toLong, i + 100L))))
  }

  test("lshNearDupPairs caps degenerate buckets and honours bit width") {
    // 80 copies of one vector: a single signature bucket. Capped at 20,
    // the bucket is dropped and no O(m²) expansion happens.
    val df = (0 until 80).map(i => (i.toLong, Seq(1.0, 2.0, 3.0, 4.0)))
      .toDF("id", "vec")
    val capped = Similarity.lshNearDupPairs(df, "id", "vec",
      dims = 4, minCosine = 0.5, maxBucket = 20)
    assert(capped.collect().isEmpty)
    // wider signatures still bucket exact duplicates together
    val wide = Similarity.lshNearDupPairs(df.limit(3), "id", "vec",
      dims = 4, minCosine = 0.5, bits = 20)
    assert(wide.count() === 3L) // 3 ids -> 3 pairs
  }

  test("PQ: codebooks train deterministically, codes reconstruct clusters, " +
    "search with exact rerank recalls the brute-force top-k") {
    // 3 angular clusters in 8 dims (2 subspaces of 4): PQ codes must
    // separate them, and pqTopK with a generous rerank must reproduce
    // the exact scan's neighbor SET.
    val vecs = (0 until 30).map { i =>
      val axis = i % 3
      val base = Array.fill(8)(0.0)
      base(axis) = 10.0
      base(axis + 4) = 10.0
      base((axis + 1) % 3) = 0.2 * (i / 3)
      (i.toLong, base.toSeq)
    }
    val corpus = vecs.toDF("id", "vec")
    val cb1 = Similarity.pqTrain(corpus, m = 2, k = 3, iters = 3)
    val cb2 = Similarity.pqTrain(corpus, m = 2, k = 3, iters = 3)
    assert(cb1 === cb2) // deterministic training
    assert(cb1.length === 2 && cb1.forall(_.length === 3))
    // same-cluster vectors share a code word; different clusters differ
    val codes = Similarity.pqEncode(corpus, cb1)
      .as[(Long, Seq[Int])].collect().toMap
    (0 until 3).foreach { axis =>
      val cluster = (0 until 30).filter(_ % 3 == axis).map(i => codes(i.toLong))
      assert(cluster.distinct.size === 1, s"cluster $axis split: $cluster")
    }
    assert((0 until 3).map(a => codes(a.toLong)).distinct.size === 3)
    // search: top-3 of query 0 under PQ+rerank == exact top-3 set
    val queries = corpus.filter($"id" === 0L)
      .select($"id".as("qid"), $"vec".as("qvec"))
    val pq = Similarity.pqTopK(queries, corpus, cb1, rerank = 10, k = 3)
      .select($"id").as[Long].collect().toSet
    val exact = Similarity.bruteForceTopK(queries, corpus, 3)
      .select($"id").as[Long].collect().toSet
    assert(pq === exact, s"pq $pq != exact $exact")
    // IVF-PQ: k-means routing + ADC + rerank still reproduces the exact
    // top-3 (the query's cluster is among its nprobe nearest lists)
    val cents = Similarity.kmeansCentroids(corpus, k = 3, iters = 3)
    val ivfpq = Similarity.ivfPqTopK(queries, corpus, cents, cb1,
        nprobe = 2, rerank = 10, k = 3)
      .select($"id").as[Long].collect().toSet
    assert(ivfpq === exact, s"ivfpq $ivfpq != exact $exact")
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("payload plumbing: byte length, content key, fake features") {
    val df = Seq("hello", "hello", "other").toDF("text")
      .select(Multimodal.asPayload($"text").as("p"))
    val out = df.select(
      Multimodal.byteLen($"p").as("n"),
      Multimodal.contentKey($"p").as("k"),
      Multimodal.fakeFeatures($"p", 4).as("f"))
      .as[(Int, String, Seq[Double])].collect()
    assert(out(0)._1 === 5)
    assert(out(0)._2 === out(1)._2) // content-addressed
    assert(out(0)._2 !== out(2)._2)
    assert(out(0)._3 === out(1)._3) // deterministic fake decode
    assert(out(0)._3.length === 4)
    assert(out(0)._3.forall(v => v >= 0.0 && v < 1.0))
  }

  test("decodePartitioned runs the codec once per payload, batched") {
    val payloads = spark.createDataset(
      Seq("aa", "bbb", "cccc").map(_.getBytes("UTF-8")))
    val out = Multimodal.decodePartitioned(payloads, MediaCodec.stub)
      .collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(2, 3, 4))
    assert(out.map(_._2).distinct.length === 3)
  }

  test("imageIO codec decodes generated PNGs exactly (real javax.imageio)") {
    val payloads = spark.createDataset(Seq(
      Multimodal.makePng(12, 9, 77),
      Multimodal.makePng(31, 2, 255),
      Multimodal.makePng(1, 1, 0)))
    val out = Multimodal.decodePartitioned(payloads, MediaCodec.imageIO)
      .collect().sortBy(_._1)
    assert(out === Array((1, 1, 0L), (12, 9, 77L), (31, 2, 255L)))
  }

  test("wav codec parses RIFF chunks in any order and skips unknown ones") {
    val samples = Array[Short](100, -200, 300, -32768)
    val wav = Multimodal.makeWav(16000, samples)
    // meanAbs = (100+200+300+32768)/4 = 33368/4 = 8342
    assert(MediaCodec.wavPcm.open().decode(wav) === ((16000, 4, 8342L)))
    // Insert an unknown odd-sized chunk between fmt and data: the
    // walker must skip it (with word-alignment padding) and still land
    // on the data chunk.
    val head = wav.take(36) // RIFF header + fmt chunk
    val tail = wav.drop(36) // data chunk
    val junk = java.nio.ByteBuffer.allocate(8 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    junk.put("LIST".getBytes("US-ASCII")); junk.putInt(3) // odd size -> pad
    junk.put(Array[Byte](1, 2, 3, 0))
    val padded = head ++ junk.array() ++ tail
    assert(MediaCodec.wavPcm.open().decode(padded) === ((16000, 4, 8342L)))
    // Non-WAV payloads are rejected, not misparsed.
    intercept[IllegalArgumentException] {
      MediaCodec.wavPcm.open().decode("definitely not audio".getBytes)
    }
  }

  test("y4m codec samples every k-th frame and means only those lumas") {
    // 5 frames of lumas 10,20,30,40,50; every=2 samples frames 0,2,4
    // -> mean (10+30+50)/3 = 30. Dimensions and counts decode exactly.
    val y4m = Multimodal.makeY4m(4, 2, Array(10, 20, 30, 40, 50))
    assert(MediaCodec.y4mFrameSample(2).open().decode(y4m) ===
      ((4, 2, 5, 3, 30L)))
    // every=1 is a full decode: mean (10+20+30+40+50)/5 = 30.
    assert(MediaCodec.y4mFrameSample(1).open().decode(y4m) ===
      ((4, 2, 5, 5, 30L)))
    // Non-y4m payloads are rejected, not misparsed.
    intercept[IllegalArgumentException] {
      MediaCodec.y4mFrameSample(2).open().decode("not a video".getBytes)
    }
  }

  test("mjpeg-avi codec walks the container and decodes sampled frames exactly") {
    // 5 frames of grays 10,20,30,40,50; every=2 samples frames 0,2,4
    // -> mean (10+30+50)/3 = 30, through REAL JPEG decode (uniform
    // frames are DC-only, so the lossy codec is exact).
    val avi = Multimodal.makeMjpegAvi(12, 10, Array(10, 20, 30, 40, 50))
    assert(MediaCodec.aviMjpegFrameSample(2).open().decode(avi) ===
      ((12, 10, 5, 3, 30L)))
    assert(MediaCodec.aviMjpegFrameSample(1).open().decode(avi) ===
      ((12, 10, 5, 5, 30L)))
    // Non-AVI payloads are rejected, not misparsed (a WAV is also RIFF).
    intercept[IllegalArgumentException] {
      MediaCodec.aviMjpegFrameSample(2).open()
        .decode(Multimodal.makeWav(8000, Array[Short](1, 2, 3)))
    }
    intercept[IllegalArgumentException] {
      MediaCodec.aviMjpegFrameSample(2).open().decode("not a video".getBytes)
    }
  }

  test("avi idx1 random access decodes exactly the indexed frame and " +
      "rejects a lying or missing index") {
    val grays = Array(10, 20, 30, 40, 50, 60, 70)
    val avi = Multimodal.makeMjpegAvi(12, 10, grays)
    // every frame reachable by index, exact uniform gray back
    grays.indices.foreach { k =>
      assert(Multimodal.aviFrameAt(avi, k) === ((12, 10, 7, grays(k).toLong)),
        s"frame $k")
    }
    // the sequential sampler still works on the indexed container
    assert(MediaCodec.aviMjpegFrameSample(2).open().decode(avi) ===
      ((12, 10, 7, 4, 40L)))
    // out-of-range frame
    intercept[IllegalArgumentException](Multimodal.aviFrameAt(avi, 7))
    intercept[IllegalArgumentException](Multimodal.aviFrameAt(avi, -1))
    // a lying index: point entry 2's offset at entry 3's chunk minus
    // garbage -> the entry/chunk cross-check must reject
    val bb = java.nio.ByteBuffer.wrap(avi)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tagAt(off: Int) = new String(avi, off, 4, "US-ASCII")
    var pos = 12; var idxPos = -1
    while (idxPos < 0 && pos + 8 <= avi.length) {
      if (tagAt(pos) == "idx1") idxPos = pos + 8
      else pos = pos + 8 + bb.getInt(pos + 4) + (bb.getInt(pos + 4) & 1)
    }
    assert(idxPos > 0, "test could not locate idx1")
    val forged = avi.clone()
    val fb = java.nio.ByteBuffer.wrap(forged)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    fb.putInt(idxPos + 16 * 2 + 8, fb.getInt(idxPos + 16 * 2 + 8) + 2)
    intercept[IllegalArgumentException](Multimodal.aviFrameAt(forged, 2))
    // ...but an honest entry in the same forged file still decodes
    assert(Multimodal.aviFrameAt(forged, 1)._4 === 20L)
    // index vs declared-frames disagreement: shrink idx1 by one entry
    val shrunk = avi.clone()
    val sb = java.nio.ByteBuffer.wrap(shrunk)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    sb.putInt(idxPos - 4, bb.getInt(idxPos - 4) - 16)
    intercept[IllegalArgumentException](Multimodal.aviFrameAt(shrunk, 0))
    // no AVIF_HASINDEX flag: the avih body is the first chunk inside
    // the first LIST (hdrl) — clear flags at body+12
    val noflag = avi.clone()
    val nb = java.nio.ByteBuffer.wrap(noflag)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // 12 = RIFF hdr; LIST at 12, 'hdrl' at 20, 'avih' at 24, body at 32
    assert(tagAt(24) == "avih", "layout assumption broken")
    nb.putInt(32 + 12, 0)
    intercept[IllegalArgumentException](Multimodal.aviFrameAt(noflag, 0))
  }

  test("G.711 mu-law: exhaustive exact integer round-trip properties") {
    // canonical G.711 invariants over the FULL 16-bit input range:
    // re-encoding the decoded value reproduces the code (decode∘encode
    // is an idempotent quantization), quantization error stays under
    // the top segment step (1024), zero is exact, and the codec is
    // sign-symmetric.
    var x = -33000
    while (x <= 33000) {
      val c = Multimodal.ulawEncode(x)
      val d = Multimodal.ulawDecode(c)
      // G.711 famously has two zeros (+0 → 0xFF, −0 → 0x7F): a small
      // negative decodes to 0, which re-encodes as the POSITIVE zero.
      // Idempotence holds everywhere else; at zero both codes decode
      // to the same value, which is what the oracle consumes.
      if (d != 0)
        assert(Multimodal.ulawEncode(d) === c, s"non-idempotent at $x")
      else assert(Set(0x7F, 0xFF)(c), s"zero from non-zero code at $x")
      val clamped = math.max(-32635, math.min(32635, x))
      assert(math.abs(d - clamped) < 1024, s"error too large at $x: $d")
      x += 1
    }
    assert(Multimodal.ulawDecode(Multimodal.ulawEncode(0)) === 0)
    (1 to 32635 by 97).foreach { v =>
      assert(Multimodal.ulawDecode(Multimodal.ulawEncode(-v)) ===
        -Multimodal.ulawDecode(Multimodal.ulawEncode(v)))
    }
    // WAV container round trip: codec mean equals the direct formula
    val samples = Array[Short](0, 100, -100, 1023, -1024, 900)
    val expected = samples.map(s =>
      math.abs(Multimodal.ulawDecode(Multimodal.ulawEncode(s))).toLong)
      .sum / samples.length
    assert(MediaCodec.wavUlaw.open()
      .decode(Multimodal.makeUlawWav(8000, samples)) ===
      ((8000, samples.length, expected)))
    // Non-mu-law WAVs are rejected, not misparsed
    intercept[IllegalArgumentException] {
      MediaCodec.wavUlaw.open()
        .decode(Multimodal.makeWav(8000, Array[Short](1, 2)))
    }
  }

  test("G.711 A-law: exhaustive exact integer round-trip properties") {
    // A-law invariants over all codes and the full 16-bit input range:
    // every 8-bit code is a fixed point of encode∘decode (the decoded
    // level re-encodes to the same code — a perfect mid-rise
    // quantizer, so unlike mu-law there is NO zero output and no
    // two-zeros quirk), the negative axis mirrors via the
    // one's-complement magnitude (decode(enc(−x−1)) = −decode(enc(x))),
    // and quantization error stays under the top-segment step.
    (0 until 256).foreach { c =>
      assert(Multimodal.alawEncode(Multimodal.alawDecode(c)) === c,
        s"code $c not a fixed point")
    }
    var x = -33000
    while (x <= 33000) {
      val d = Multimodal.alawDecode(Multimodal.alawEncode(x))
      assert(d != 0, s"A-law has no zero level, got one at $x")
      val clamped = math.max(-32768, math.min(32767, x))
      assert(math.abs(d - clamped) <= 1024, s"error too large at $x: $d")
      x += 1
    }
    (0 to 32767 by 89).foreach { v =>
      assert(Multimodal.alawDecode(Multimodal.alawEncode(-v - 1)) ===
        -Multimodal.alawDecode(Multimodal.alawEncode(v)))
    }
    // WAV container round trip: codec mean equals the direct formula
    val samples = Array[Short](0, 100, -100, 5000, -17000, 32767)
    val expected = samples.map(s =>
      math.abs(Multimodal.alawDecode(Multimodal.alawEncode(s))).toLong)
      .sum / samples.length
    assert(MediaCodec.wavAlaw.open()
      .decode(Multimodal.makeAlawWav(8000, samples)) ===
      ((8000, samples.length, expected)))
    // Non-A-law WAVs are rejected, not misparsed
    intercept[IllegalArgumentException] {
      MediaCodec.wavAlaw.open()
        .decode(Multimodal.makeUlawWav(8000, Array[Short](1, 2)))
    }
  }

  test("tiff codec round-trips the LZW-compressed gradient exactly") {
    // Exhaustive over the mm_image_tiff query family's (w, h, base)
    // grid: TIFF/LZW is lossless, so the decoded mean must equal the
    // direct gradient arithmetic for every id.
    val codec = MediaCodec.imageIO.open()
    (0L until 256L).foreach { id =>
      val w = 8 + (id % 16).toInt
      val h = 8 + ((id * 3) % 16).toInt
      val base = ((id * 37) % 256).toInt
      val sum = (0 until w * h).map(i =>
        (base + 3 * (i % w) + 11 * (i / w)) % 256).map(_.toLong).sum
      assert(codec.decode(Multimodal.makeTiff(w, h, base)) ===
        ((w, h, sum / (w * h))), s"tiff mismatch at id=$id")
    }
  }

  test("gif codec reads the JDK-written sequence and samples every k-th frame") {
    // 5 frames of grays 10,20,30,40,50; every=2 samples frames 0,2,4
    // -> mean (10+30+50)/3 = 30, through the JDK's multi-image GIF
    // reader (lossless, exact palette for uniform frames).
    val gif = Multimodal.makeGif(12, 10, Array(10, 20, 30, 40, 50))
    assert(MediaCodec.gifFrameSample(2).open().decode(gif) ===
      ((12, 10, 5, 3, 30L)))
    assert(MediaCodec.gifFrameSample(1).open().decode(gif) ===
      ((12, 10, 5, 5, 30L)))
    // a session decodes many payloads through ONE reused reader
    val session = MediaCodec.gifFrameSample(1).open()
    (0 until 8).foreach { g =>
      assert(session.decode(Multimodal.makeGif(8, 8, Array(g * 30))) ===
        ((8, 8, 1, 1, (g * 30).toLong)))
    }
    // Non-GIF payloads are rejected, not misparsed.
    intercept[IllegalArgumentException] {
      MediaCodec.gifFrameSample(2).open().decode("not a video".getBytes)
    }
  }

  test("mjpeg round-trip is exact for every gray the query family emits") {
    // The mm_video_mjpeg oracle assumes gray-in == mean-luma-out for all
    // 256 uniform grays across the family's dimension grid (w,h in
    // 8,10..22). Verify the worst-case corners + full gray sweep at one
    // dimension pair, and the dimension sweep at two grays — the same
    // exhaustive style as makeJpeg's image check.
    val codec = MediaCodec.aviMjpegFrameSample(1).open()
    (0 until 256).foreach { g =>
      val (_, _, _, _, mean) =
        codec.decode(Multimodal.makeMjpegAvi(8, 22, Array(g)))
      assert(mean === g.toLong, s"gray $g did not round-trip at 8x22")
    }
    for (w <- 8 to 22 by 2; h <- 8 to 22 by 2; g <- Seq(7, 250)) {
      val (dw, dh, _, _, mean) =
        codec.decode(Multimodal.makeMjpegAvi(w, h, Array(g)))
      assert((dw, dh, mean) === ((w, h, g.toLong)), s"${w}x$h gray $g")
    }
  }

  test("nearest-neighbor resize samples exactly the expected source rows") {
    // 4×16 gradient (row y = gray 10+y) resized to 8×8: target row y
    // samples source row (y*16)/8 = 2y, so the resized mean must be
    // floor(avg(10 + 2y for y in 0..7)) = 10+7 = 17.
    val png = Multimodal.makeGradientPng(4, 16, 10)
    val codec = MediaCodec.imageResize(8, 8).open()
    assert(codec.decode(png) === ((8, 8, 17L)))
    // Upscale keeps a uniform image uniform, any target size.
    val uni = Multimodal.makePng(3, 5, 200)
    assert(MediaCodec.imageResize(10, 7).open().decode(uni) === ((10, 7, 200L)))
    // Identity resize of a gradient = plain decode mean.
    val g = Multimodal.makeGradientPng(6, 6, 0)
    assert(MediaCodec.imageResize(6, 6).open().decode(g) ===
      ((6, 6, (0 to 5).sum.toLong / 6)))
  }
}
