package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.kv.{KvSchema, KvTable, SinkMode}
import graft.text.TextOps

/** Deduplication EXT queries. The synthetic documents table has no real
  * duplicates, so each query constructs a deterministic corpus-with-
  * copies IN the query (exact copies or perturbed near-copies with
  * shifted ids) — both engines build the identical corpus, so the
  * dedup result is fully oracle-checkable.
  */
object DedupQueries {

  /** documents ∪ exact copies of every 7th doc (id + 1_000_000). */
  private def corpusExact(s: SparkSession, dir: String): DataFrame = {
    val d = table(s, dir, "documents")
    d.select(col("doc_id"), col("text"))
      .unionByName(d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
  }

  /** documents ∪ near-copies of every 10th doc (3 appended tokens). */
  private def corpusNear(s: SparkSession, dir: String): DataFrame = {
    val d = table(s, dir, "documents")
    d.select(col("doc_id"), col("text"))
      .unionByName(d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" xtra token pad")).as("text")))
  }

  private val corpusExactSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT doc_id + 1000000 AS doc_id, text
      |FROM documents WHERE doc_id % 7 = 0""".stripMargin

  private val corpusNearSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT doc_id + 1000000 AS doc_id, text || ' xtra token pad' AS text
      |FROM documents WHERE doc_id % 10 = 0""".stripMargin

  /** The persisted fingerprint index dedup_incremental serves from:
    * fp → first owner over the already-accepted corpus (doc_id % 5 ≠
    * 0), bulk-loaded into its compacted 8-bucket KvTable layout in one
    * job. Bench builds it untimed (prepare); Verify rebuilds per run. */
  private def fpIndexPath(s: SparkSession, dir: String): String = {
    val path = scratchDir("dedup_fp_index", dir)
    ensureSetup(path) {
      val idx = table(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(5L)) =!= 0)
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .groupBy(col("fp")).agg(min(col("doc_id")).as("owner"))
      KvTable.bulkLoad(idx, path, KvSchema.of("fp", "owner" -> ("d", "owner")),
        buckets = 8, SinkMode.Replace)
    }
    path
  }

  /** The persisted MinHash band-bucket index dedup_incremental_near
    * probes: the accepted corpus's (id, sh) shingle projection and its
    * (id, band_idx, band_key) LSH band rows, both parquet. Bands are
    * derived FROM the written shingles so the text tokenizes once. */
  private def nearIndexPath(s: SparkSession, dir: String): String = {
    val path = scratchDir("dedup_near_index", dir)
    ensureSetup(path) {
      val idx = table(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(5L)) =!= 0)
        .select(col("doc_id"), col("text"))
      Dedup.shingleProjection(idx, "doc_id", "text")
        .write.mode("overwrite").parquet(s"$path/shingles")
      Dedup.bandProjection(s.read.parquet(s"$path/shingles"))
        .write.mode("overwrite").parquet(s"$path/bands")
    }
    path
  }

  /** Bench runs these untimed before timing the query bodies. */
  val prepares: Map[String, (SparkSession, String) => Unit] = checked(
    "dedup_incremental" -> ((s, d) => { fpIndexPath(s, d); () }),
    "dedup_incremental_near" -> ((s, d) => { nearIndexPath(s, d); () }))

  val defs: Map[String, Q] = checked(
    // Exact dedup by content fingerprint: deterministic keeper (min id)
    // + copy count per group. One partial-agg shuffle at any scale.
    "dedup_exact" -> { (s, dir) =>
      corpusExact(s, dir)
        .groupBy(TextOps.fingerprint(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("keep_id"))
    },

    // Passage-level exact dedup over the near-dup corpus: planted
    // near-copies share every full 16-token passage with their source
    // (the perturbation appends tokens at the end), so the dup counts
    // show the SUB-document dedup firing where whole-doc exact dedup
    // would not.
    "dedup_paragraph" -> { (s, dir) =>
      graft.functions.Native.register(s)
      Dedup.passageDedupStats(corpusNear(s, dir), "doc_id", "text",
        chunkTokens = 16)
        .orderBy(col("doc_id"))
    },

    // Passage dedup reached through SQL: `graft_passage_dedup` is a
    // registered TABLE function (graft.functions.TableFns) expanding
    // to passageDedupStats' plan at analysis — the SQL user gets the
    // identical no-window partial-agg shape, here over the raw
    // documents table, gated by the same oracle family as
    // dedup_paragraph.
    "dedup_passage_sql" -> { (s, dir) =>
      graft.functions.Native.register(s)
      graft.functions.TableFns.register(s)
      s.sql("SELECT * FROM graft_passage_dedup(" +
        s"'$dir/documents.parquet', 16) ORDER BY doc_id")
    },

    // ExactSubstr-style duplicated-substring detection (Lee et al.
    // 2021): EVERY 16-token window, stride 1 — the sub-passage dedup
    // mode dedup_paragraph's aligned chunks cannot see (a duplicated
    // span straddling a chunk boundary). The near-copy corpus
    // exercises the union-span math: planted copies share all windows
    // with their original except the padded tail, so overlapping
    // duplicated windows must merge, not double-count. Fingerprints
    // are the O(tokens) rolling Rabin-Karp native pass; the oracle
    // mirrors the nested-Horner equal form.
    "dedup_exact_substr" -> { (s, dir) =>
      graft.functions.Native.register(s)
      Dedup.substrDupStats(corpusNear(s, dir), "doc_id", "text", k = 16)
        .orderBy(col("doc_id"))
    },

    // INCREMENTAL exact dedup — the daily-crawl shape: a persisted KV
    // fingerprint index (the classic content-addressed dedup index a
    // log-structured store serves) holds every already-accepted
    // document's fingerprint → first owner; each new batch is checked
    // with one fingerprint pass + one join against the index, O(batch)
    // work regardless of corpus history. The index is born compacted
    // via bulkLoad (sorted bucket files, blooms, manifest). At 100 TB
    // the index side stays a bucket-compacted KvTable; a batch
    // repartitioned by the same key bucketing joins storage-partitioned
    // (kv_colocated_join demonstrates that machinery) — here the plain
    // join is the shape under test. Batch = the unindexed split
    // (doc_id % 5 == 0) ∪ replayed copies of every 7th INDEXED doc
    // (re-crawled pages — the hits the index exists to catch).
    "dedup_incremental" -> { (s, dir) =>
      val path = fpIndexPath(s, dir)
      val idx = KvTable.readV2(s, path).select(col("fp").as("__fp"), col("owner"))
      val docs = table(s, dir, "documents")
      val batch = docs.filter(pmod(col("doc_id"), lit(5L)) === 0)
        .select(col("doc_id"), col("text"))
        .unionByName(docs
          .filter(pmod(col("doc_id"), lit(5L)) =!= 0 &&
            pmod(col("doc_id"), lit(7L)) === 1)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      batch
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .join(idx, col("fp") === col("__fp"), "left")
        .select(col("doc_id"), col("fp"), col("owner"),
          col("owner").isNotNull.as("is_dup"))
        .orderBy(col("doc_id"))
    },

    // INCREMENTAL near-dup — dedup_incremental's LSH sibling: the
    // persisted MinHash band-bucket index over the accepted corpus is
    // PROBED by each new batch's band keys (one signature pass over the
    // batch + one join against the index — O(batch + hits), never a
    // rescan of corpus history), candidates verified by exact Jaccard
    // against the indexed shingles. Hot index buckets above the cap are
    // excluded from probing (the capBuckets rule, here as a census
    // semi-join, mirrored in the oracle). Batch = the unindexed split ∪
    // padded near-copies of every 7th indexed doc (re-crawled pages
    // with boilerplate drift — the hits LSH exists to catch where exact
    // fingerprints miss).
    "dedup_incremental_near" -> { (s, dir) =>
      val path = nearIndexPath(s, dir)
      val docs = table(s, dir, "documents")
      val batch = docs.filter(pmod(col("doc_id"), lit(5L)) === 0)
        .select(col("doc_id"), col("text"))
        .unionByName(docs
          .filter(pmod(col("doc_id"), lit(5L)) =!= 0 &&
            pmod(col("doc_id"), lit(7L)) === 1)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(col("text"), lit(" xtra token pad")).as("text")))
      val bBase = Dedup.shingleProjection(batch, "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val iBands = s.read.parquet(s"$path/bands")
      val okb = iBands.groupBy(col("band_idx"), col("band_key"))
        .agg(count(lit(1)).as("__m"))
        .filter(col("__m") <= lit(Dedup.DefaultMaxBucket))
        .select(col("band_idx"), col("band_key"))
      // the cap prunes the INDEX side BEFORE the probe join — a hot
      // bucket must never reach the pair-producing join
      val iOk = iBands.withColumnRenamed("id", "iid")
        .join(okb, Seq("band_idx", "band_key"), "left_semi")
      val cand = Dedup.bandProjection(bBase)
        .withColumnRenamed("id", "bid")
        .join(iOk, Seq("band_idx", "band_key"))
        .select(col("bid"), col("iid")).distinct()
      cand
        .join(bBase.select(col("id").as("bid"), col("sh").as("sh1")),
          Seq("bid"))
        .join(s.read.parquet(s"$path/shingles")
          .select(col("id").as("iid"), col("sh").as("sh2")), Seq("iid"))
        .withColumn("jaccard", Dedup.jaccard(col("sh1"), col("sh2")))
        .filter(col("jaccard") >= 0.5)
        .select(col("bid").as("batch_id"), col("iid").as("owner_id"),
          col("jaccard"))
        .orderBy(col("batch_id"), col("owner_id"))
    },

    // MinHash + banded LSH near-dup pairs with exact Jaccard verify.
    "dedup_minhash" -> { (s, dir) =>
      Dedup.minHashNearDupPairs(corpusNear(s, dir), "doc_id", "text",
          shingleLen = 3, k = 12, bands = 6, minJaccard = 0.5)
        .orderBy(col("id1"), col("id2"))
    },

    // Duplicate-CLUSTER resolution: connected components over the
    // MinHash near-dup pair graph (min-label propagation to fixpoint),
    // then one keeper per cluster (min id) + cluster sizes. This is the
    // step between pair generation and the actual drop decision in a
    // corpus dedup pipeline — near-dup similarity is not transitive, so
    // pairs alone don't say which rows to keep.
    "dedup_clusters" -> { (s, dir) =>
      val pairs = Dedup.minHashNearDupPairs(corpusNear(s, dir), "doc_id",
        "text", shingleLen = 3, k = 12, bands = 6, minJaccard = 0.5)
      val comp = Dedup.connectedComponents(pairs, "id1", "id2")
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("rep"))
      comp.select(col("id").as("doc_id"), col("rep"),
          count(lit(1)).over(w).as("cluster_size"),
          (col("id") === col("rep")).as("is_keeper"))
        .orderBy(col("doc_id"))
    },

    // Quality-aware cluster resolution: within each near-dup cluster
    // keep the most COMPLETE copy (max token count, doc_id tiebreak) —
    // the "keep best, not first" policy real pipelines want when dups
    // are truncations/paddings of each other (here the planted copies
    // carry extra tokens, so the keeper is NOT the min-id original —
    // exercising genuinely quality-driven selection). Integer token
    // counts keep keeper choice exact across engines. One extra
    // partial-agg shuffle over dedup_clusters.
    "dedup_cluster_best" -> { (s, dir) =>
      val corpus = corpusNear(s, dir)
      val pairs = Dedup.minHashNearDupPairs(corpus, "doc_id", "text",
        shingleLen = 3, k = 12, bands = 6, minJaccard = 0.5)
      val comp = Dedup.connectedComponents(pairs, "id1", "id2")
      val toks = corpus.select(col("doc_id"),
        graft.text.TextOps.tokenCount(col("text")).cast("long").as("n"))
      comp.join(toks, comp("id") === toks("doc_id"))
        .groupBy(col("rep"))
        .agg(
          max_by(col("doc_id"), struct(col("n"), -col("doc_id")))
            .as("keeper"),
          max(col("n")).as("keeper_tokens"),
          count(lit(1)).as("cluster_size"))
        .orderBy(col("rep"))
    },

    // Benchmark DECONTAMINATION: flag training documents whose shingle
    // overlap with an evaluation set crosses a threshold (the n-gram
    // decontamination every serious pretraining pipeline runs). Eval =
    // every 50th doc; train = the rest plus planted perturbed copies of
    // eval docs. Scale shape: the eval shingle set is small and
    // BROADCAST; the train side (the 100 TB side) streams once through
    // a semi-join + one partial-agg count — no shuffle of shingles.
    // Threshold compare is exact integer arithmetic (2*overlap >= n).
    "dedup_decontaminate" -> { (s, dir) =>
      graft.functions.Native.register(s)
      import graft.functions.Native
      import graft.ops.Ops.materializedColumn
      val d = table(s, dir, "documents")
      val corpus = d.select(col("doc_id"), col("text"),
          (col("doc_id") % 50 === 0).as("is_eval"))
        .unionByName(d.filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(col("text"), lit(" xtra token pad")).as("text"),
            lit(false).as("is_eval")))
      val withSh = materializedColumn(corpus, "sh0",
        Native.shingleHashes(Native.tokenHashes(TextOps.tokens(col("text"))), 3))
        .select(col("doc_id"), col("is_eval"),
          array_distinct(col("sh0")).as("sh"))
      val evalSh = withSh.filter(col("is_eval"))
        .select(explode(col("sh")).as("h")).distinct()
      val train = withSh.filter(!col("is_eval") && size(col("sh")) > 0)
      val overlap = train
        .select(col("doc_id"), explode(col("sh")).as("h"))
        .join(broadcast(evalSh), Seq("h"), "left_semi")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("int").as("n_overlap"))
      train.select(col("doc_id"), size(col("sh")).as("n_shingles"))
        .join(overlap, Seq("doc_id"))
        .filter(col("n_overlap") * 2 >= col("n_shingles"))
        .orderBy(col("doc_id"))
    },

    // SUB-document dedup over content-defined chunks: the rsync/CDC
    // trick as a corpus operator. Rolling-hash boundaries move with
    // CONTENT, so a boilerplate passage shared across documents yields
    // byte-identical chunks regardless of where it sits in each doc
    // (fixed windows would misalign) — those chunks dedup to their
    // first occurrence and every doc is reassembled from its surviving
    // chunks. Plant: every 5th doc carries a 40-token boilerplate tail
    // (5 interior CDC boundaries, so its chunks resynchronize).
    "dedup_cdc_chunks" -> { (s, dir) =>
      graft.functions.Native.register(s)
      import graft.functions.Native
      import graft.ops.Ops.materializedColumn
      import org.apache.spark.sql.expressions.Window
      val docs = table(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" " + CdcBoiler))).otherwise(col("text"))
          .as("text"))
      val withT = materializedColumn(docs.select(col("doc_id"), col("text")),
        "t", TextOps.tokens(col("text")))
      val withRh = materializedColumn(withT, "rh",
        Native.shingleHashes(Native.tokenHashes(col("t")), 3))
      // token-space cut positions: boundary shingle i cuts after token
      // i+2; cuts strictly inside the doc, then the doc end
      val boundaryCuts = when(size(col("rh")) > 0,
        filter(
          transform(sequence(lit(1), size(col("rh"))),
            i => when(element_at(col("rh"), i) % 8 === 0, i + 2)
              .otherwise(-1)),
          x => x > 0 && x < size(col("t"))))
        .otherwise(array().cast("array<int>"))
      val withCuts = materializedColumn(withRh, "cuts",
        concat(boundaryCuts, array(size(col("t")))))
      val chunkStrs = transform(sequence(lit(1), size(col("cuts"))), j => {
        val prev = when(j === 1, lit(0))
          .otherwise(element_at(col("cuts"), (j - 1).cast("int")))
        concat_ws(" ", slice(col("t"), prev + 1,
          element_at(col("cuts"), j.cast("int")) - prev))
      })
      val chunks = withCuts
        .select(col("doc_id"), size(col("cuts")).as("n_chunks"),
          posexplode(chunkStrs).as(Seq("p", "chunk")))
        .select(col("doc_id"), col("n_chunks"),
          (col("p") + 1).as("cidx"), col("chunk"))
      val kept = chunks.withColumn("rn", row_number().over(
          Window.partitionBy(col("chunk"))
            .orderBy(col("doc_id"), col("cidx"))))
        .filter(col("rn") === 1)
      kept.groupBy(col("doc_id"))
        .agg(min(col("n_chunks")).cast("int").as("n_chunks"),
          count(lit(1)).cast("int").as("n_kept"),
          md5(concat_ws(" ",
            transform(sort_array(collect_list(struct(col("cidx"), col("chunk")))),
              s => s.getField("chunk")))).as("clean_fp"))
        .orderBy(col("doc_id"))
    },

    // SimHash near-dup pairs — md5-60bit token hashes, so the DuckDB
    // oracle mirrors the ENTIRE pipeline (64 bit-votes, chunk banding,
    // hamming verify) value-for-value.
    "dedup_simhash" -> { (s, dir) =>
      Dedup.simHashNearDupPairs(corpusExact(s, dir), "doc_id", "text",
          maxHamming = 3)
        .orderBy(col("id1"), col("id2"))
    },

    // Exact bigram Jaccard within (source, length-bucket) blocks.
    // Doc-inside-doc detection by CONTAINMENT (|A∩B| / |A|): corpus =
    // documents ∪ planted PREFIX-QUOTES (first 25 tokens of every 7th
    // doc). Jaccard misses them (the union is the long doc); the
    // max-directional containment from the short side is 1.0. Blocking
    // is by the shared two-token PREFIX — the head-quote blocking key;
    // general (anywhere-inside) containment runs the same verify over
    // MinHash-LSH candidates instead.
    "dedup_containment" -> { (s, dir) =>
      val d = table(s, dir, "documents")
      val toks = TextOps.tokens(col("text"))
      val corpus = d.select(col("doc_id"), col("text"))
        .unionByName(d.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            concat_ws(" ", slice(TextOps.tokens(col("text")), 1, 25))
              .as("text")))
      Dedup.blockedContainmentPairs(corpus, "doc_id", "text",
          concat_ws(" ", slice(toks, 1, 2)), ngram = 2)
        .filter(col("containment") >= 0.9)
        .orderBy(col("id1"), col("id2"))
    },

    // Blocking key = source | length-bucket | first-2-token prefix.
    // The CONTENT component is what makes this scale: source × length
    // bucket alone has FIXED cardinality, so block membership grows
    // linearly with the corpus and in-block pair expansion grows
    // QUADRATICALLY (measured: 24.6k pairs at sf0.1 → 10.8M at sf2,
    // the 10k cap never triggering). Prefix blocking keys grow with
    // content diversity — blocks stay O(1) at any corpus size
    // (measured max block 2 at sf0.1/sf1/sf2) and the planted
    // tail-padded near-dups share their source's prefix. The
    // documented blind spot (near-dups differing in their FIRST
    // tokens) is inherent to prefix blocking; MinHash-LSH
    // (`dedup_minhash`) is the general-recall candidate generator.
    "dedup_ngram_jaccard" -> { (s, dir) =>
      val d = table(s, dir, "documents")
      val corpus = d.select(col("doc_id"), col("text"), col("source"))
        .unionByName(d.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(col("text"), lit(" pad")).as("text"), col("source")))
      Dedup.blockedJaccardPairs(corpus, "doc_id", "text",
          concat(col("source"), lit("|"),
            expr("length(text) DIV 20").cast("string"), lit("|"),
            concat_ws(" ", slice(TextOps.tokens(col("text")), 1, 2))),
          ngram = 2)
        .filter(col("jaccard") >= 0.1)
        .orderBy(col("id1"), col("id2"))
    },

    // Fuzzy (edit-distance) join — entity resolution over a bounded
    // key: corpus = documents ∪ OCR-noise copies of every 7th doc
    // (one character substituted at position 24 — inside the 48-char
    // comparison key, outside the 10-char blocking prefix, length-
    // preserving so the copy stays in its source's length bucket).
    // Same source|length-bucket|content-prefix blocking as
    // dedup_ngram_jaccard; pairs verified with the THRESHOLD
    // Levenshtein DP (O(maxDist·|key|), never the full matrix).
    "dedup_fuzzy_join" -> { (s, dir) =>
      val d = table(s, dir, "documents")
      val corpus = d.select(col("doc_id"), col("text"), col("source"))
        .unionByName(d.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 3000000L).as("doc_id"),
            concat(substring(col("text"), 1, 23), lit("#"),
              expr("substring(text, 25)")).as("text"),
            col("source")))
      Dedup.blockedEditDistancePairs(corpus, "doc_id",
          substring(lower(col("text")), 1, 48),
          concat(col("source"), lit("|"),
            expr("length(text) DIV 20").cast("string"), lit("|"),
            substring(lower(col("text")), 1, 10)),
          maxDist = 2)
        .orderBy(col("id1"), col("id2"))
    },

    // Embedding-cosine near-dup: exact all-pairs cosine over integer-
    // quantized vectors (the embedding analog of dedup_ngram_jaccard's
    // exact verify). Corpus = embeddings ∪ deterministically perturbed
    // copies of every 10th vector (+0.001·((i mod 7)−3) per dim, double
    // arithmetic both engines reproduce bit-for-bit). This brute-force
    // O(n²) shape is the exact-verify BASELINE, so it runs on a FIXED
    // calibration sample (vec_id < 2000 — the whole table at the
    // sf0.01 gate and at sf0.1, a bounded sample beyond): quadratic
    // exact verify is how you calibrate the LSH threshold, never the
    // corpus-scale path — that is Similarity.lshNearDupPairs
    // (`ann_lsh_neardup`), whose banded buckets make it the candidate
    // generator and this cosine the per-candidate verify. Without the
    // cap this query measured 110× at 10× rows (sf1 scale run).
    "dedup_embed_cosine" -> { (s, dir) =>
      import graft.similarity.Similarity
      val e = table(s, dir, "embeddings").filter(col("vec_id") < 2000)
      val base = e.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
      val copies = e.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            x.cast("double") + lit(0.001) * (((i + 1) % 7) - 3)).as("vec"))
      val corpus = base.unionByName(copies)
        .select(col("vec_id"), Similarity.quantize(col("vec")).as("q"))
      graft.functions.Native.register(s)
      // Both predicates live IN the join condition, cheap one first:
      // a trailing .filter(cosine >= 0.95) gets pushed into the BNLJ
      // with the pushed conjunct ordered BEFORE the join's own
      // id1 < id2, so every ORDERED pair (both (a,b) and (b,a)) paid
      // the 64-dim cosine loop before the 1-op id compare — 2× the
      // necessary work (optimization r11; And short-circuits left-to-
      // right and Catalyst does not cost-reorder conjuncts). Survivors
      // recompute cosine in the projection (~100 rows, negligible);
      // values identical — same expression on the same quantized
      // vectors.
      // The streamed side is a ~2-partition tiny scan (the calibration
      // sample is BOUNDED by design), so the O(n²) pair loop ran on ≤2
      // cores; round-robin it across the session's shuffle width first
      // — a few-KB shuffle that buys full-cluster parallelism for the
      // quadratic stage at any SF (guide §2.6: stragglers/idle
      // capacity).
      corpus.select(col("vec_id").as("id1"), col("q").as("q1"))
        .repartition(s.conf.get("spark.sql.shuffle.partitions").toInt)
        .join(broadcast(corpus.select(col("vec_id").as("id2"), col("q").as("q2"))),
          col("id1") < col("id2") &&
            graft.functions.Native.cosineQ(col("q1"), col("q2")) >= 0.95)
        .select(col("id1"), col("id2"),
          graft.functions.Native.cosineQ(col("q1"), col("q2")).as("cosine"))
        .orderBy(col("id1"), col("id2"))
    }
  )

  /** 40-token boilerplate with 5 interior CDC boundaries (verified),
    * so its chunks resynchronize across host documents. */
  private val CdcBoiler =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu " +
      "nu xi omicron pi rho sigma tau upsilon phi chi psi omega aleph bet " +
      "gimel dalet he vav zayin het tet yod kaf lamed mem nun samekh ayin"

  private val cdcChunksSql =
    raw"""WITH corpus AS (
         |  SELECT doc_id, CASE WHEN doc_id % 5 = 0
         |    THEN text || ' $CdcBoiler' ELSE text END AS text
         |  FROM documents),
         |tk AS (SELECT doc_id,
         |  list_transform(string_split_regex(trim(text), '\s+'),
         |    x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT) % 1000000007) AS th,
         |  string_split_regex(trim(text), '\s+') AS t
         |  FROM corpus),
         |sh AS (SELECT doc_id, t,
         |  CASE WHEN len(th) >= 3 THEN list_transform(range(1, len(th)-1),
         |    i -> (th[i]*961 + th[i+1]*31 + th[i+2]) % 1000000007)
         |  ELSE [] END AS rh
         |  FROM tk),
         |cuts AS (SELECT doc_id, t,
         |  list_append(
         |    list_filter(
         |      list_transform(range(1, len(rh)+1),
         |        i -> CASE WHEN rh[i] % 8 = 0 THEN i + 2 ELSE -1 END),
         |      x -> x > 0 AND x < len(t)),
         |    len(t)) AS cuts
         |  FROM sh),
         |chunks AS (
         |  SELECT doc_id, len(cuts) AS n_chunks, j.i AS cidx,
         |    array_to_string(
         |      t[(CASE WHEN j.i = 1 THEN 0 ELSE cuts[j.i - 1] END + 1):cuts[j.i]],
         |      ' ') AS chunk
         |  FROM cuts, unnest(range(1, len(cuts)+1)) AS j(i)),
         |ranked AS (SELECT *,
         |  row_number() OVER (PARTITION BY chunk ORDER BY doc_id, cidx) AS rn
         |  FROM chunks)
         |SELECT doc_id, CAST(MIN(n_chunks) AS INT) AS n_chunks,
         |  CAST(COUNT(*) AS INT) AS n_kept,
         |  md5(string_agg(chunk, ' ' ORDER BY cidx)) AS clean_fp
         |FROM ranked WHERE rn = 1
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Shared hash-pipeline SQL: one md5 per token reduced to a 60-bit int
    * mod P, then n-gram shingle hashes as a base-31 polynomial — the
    * exact mirror of Dedup.tokenHashes/shingleHashes. */
  private def thSql(src: String) =
    raw"""SELECT doc_id,
         |    list_transform(string_split_regex(trim(text), '\s+'),
         |      x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT) % 1000000007) AS th
         |  FROM $src""".stripMargin

  private val minhashSql =
    s"""WITH corpus AS ($corpusNearSql),
       |th AS (${thSql("corpus")}),
       |sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(th) >= 3
       |      THEN list_transform(range(1, len(th)-1),
       |             i -> (th[i]*961 + th[i+1]*31 + th[i+2]) % 1000000007)
       |      ELSE [] END AS sh
       |  FROM th),
       |sigs AS (
       |  SELECT doc_id,
       |    list_transform(range(0, 12), i ->
       |      list_min(list_transform(sh,
       |        h -> ((i*7919 + 1) * h + i*104729) % 1000000007))) AS sig
       |  FROM sh),
       |bands AS (
       |  SELECT doc_id, b.band_idx,
       |    sig[b.band_idx*2+1] * 1000000007 + sig[b.band_idx*2+2] AS band_key
       |  FROM sigs, (SELECT unnest(range(0, 6)) AS band_idx) b),
       |okb AS (
       |  SELECT band_idx, band_key FROM bands
       |  GROUP BY 1, 2 HAVING COUNT(*) BETWEEN 2 AND 10000),
       |candids AS (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |   AND a.doc_id < b.doc_id
       |  JOIN okb o ON o.band_idx = a.band_idx AND o.band_key = a.band_key),
       |cand AS (
       |  SELECT c.id1, c.id2, s1.sh AS sh1, s2.sh AS sh2
       |  FROM candids c
       |  JOIN sh s1 ON s1.doc_id = c.id1
       |  JOIN sh s2 ON s2.doc_id = c.id2)
       |SELECT id1, id2, jaccard FROM (
       |  SELECT id1, id2,
       |    CAST(len(list_filter(list_distinct(sh1), x -> list_contains(sh2, x))) AS DOUBLE)
       |    / (len(list_distinct(sh1)) + len(list_distinct(sh2))
       |       - len(list_filter(list_distinct(sh1), x -> list_contains(sh2, x)))) AS jaccard
       |  FROM cand)
       |WHERE jaccard >= 0.5""".stripMargin + "\nORDER BY id1, id2"

  /** Transitive closure over the mirrored MinHash pair graph: DuckDB's
    * recursive CTE reproduces the engine's label-propagation fixpoint
    * exactly (both compute min-id-per-component, a plan-independent
    * value). */
  private val clustersSql =
    s"""WITH RECURSIVE pairs AS (
       |${minhashSql.stripSuffix("\nORDER BY id1, id2")}
       |),
       |edges AS (
       |  SELECT id1 AS src, id2 AS dst FROM pairs
       |  UNION
       |  SELECT id2, id1 FROM pairs),
       |reach(id, lab) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.id),
       |comp AS (SELECT id, MIN(lab) AS rep FROM reach GROUP BY id)
       |SELECT id AS doc_id, rep,
       |  COUNT(*) OVER (PARTITION BY rep) AS cluster_size,
       |  (id = rep) AS is_keeper
       |FROM comp
       |ORDER BY doc_id""".stripMargin

  private val clusterBestSql =
    raw"""WITH RECURSIVE pairs AS (
       |${minhashSql.stripSuffix("\nORDER BY id1, id2")}
       |),
       |edges AS (
       |  SELECT id1 AS src, id2 AS dst FROM pairs
       |  UNION
       |  SELECT id2, id1 FROM pairs),
       |reach(id, lab) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, r.lab FROM edges e JOIN reach r ON e.dst = r.id),
       |comp AS (SELECT id, MIN(lab) AS rep FROM reach GROUP BY id),
       |corpus2 AS ($corpusNearSql),
       |tk AS (SELECT doc_id,
       |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
       |  FROM corpus2),
       |ranked AS (
       |  SELECT c.rep, c.id, t.n,
       |    row_number() OVER (PARTITION BY c.rep
       |      ORDER BY t.n DESC, c.id ASC) AS rn,
       |    COUNT(*) OVER (PARTITION BY c.rep) AS cs
       |  FROM comp c JOIN tk t ON c.id = t.doc_id)
       |SELECT rep, id AS keeper, n AS keeper_tokens, cs AS cluster_size
       |FROM ranked WHERE rn = 1
       |ORDER BY rep""".stripMargin

  private val jaccardSql = {
    s"""WITH corpus AS (
       |  SELECT doc_id, text, source FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000 AS doc_id, text || ' pad' AS text, source
       |  FROM documents WHERE doc_id % 5 = 0),
       |th AS (
       |  SELECT doc_id, source || '|' || CAST(length(text) // 20 AS VARCHAR)
       |      || '|' || array_to_string(
       |           string_split_regex(trim(text), '\\s+')[1:2], ' ') AS blk,
       |    list_transform(string_split_regex(trim(text), '\\s+'),
       |      x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT) % 1000000007) AS th
       |  FROM corpus),
       |base AS (
       |  SELECT doc_id, blk,
       |    CASE WHEN len(th) >= 2
       |      THEN list_transform(range(1, len(th)),
       |             i -> (th[i]*31 + th[i+1]) % 1000000007)
       |      ELSE [] END AS sh
       |  FROM th),
       |okblk AS (
       |  SELECT blk FROM base GROUP BY 1 HAVING COUNT(*) BETWEEN 2 AND 10000)
       |SELECT id1, id2, jaccard FROM (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2,
       |    CAST(len(list_filter(list_distinct(a.sh), x -> list_contains(b.sh, x))) AS DOUBLE)
       |    / (len(list_distinct(a.sh)) + len(list_distinct(b.sh))
       |       - len(list_filter(list_distinct(a.sh), x -> list_contains(b.sh, x)))) AS jaccard
       |  FROM base a JOIN base b ON a.blk = b.blk AND a.doc_id < b.doc_id
       |  JOIN okblk o ON o.blk = a.blk)
       |WHERE jaccard >= 0.1
       |ORDER BY id1, id2""".stripMargin
  }

  // Mirrors blockedEditDistancePairs exactly: same planted corpus,
  // same blocking key, same census window (2..10000), DuckDB's
  // levenshtein for the verify (the engine's threshold DP returns the
  // true distance whenever it is ≤ maxDist, so filtering the full
  // distance at ≤ 2 selects the identical pairs; the engine-side
  // |length| pre-guard rejects only pairs with dist > maxDist and
  // needs no mirror).
  private val fuzzyJoinSql =
    s"""WITH corpus AS (
       |  SELECT doc_id, text, source FROM documents
       |  UNION ALL
       |  SELECT doc_id + 3000000 AS doc_id,
       |    substr(text, 1, 23) || '#' || substr(text, 25) AS text, source
       |  FROM documents WHERE doc_id % 7 = 0),
       |base AS (
       |  SELECT doc_id AS id,
       |    source || '|' || CAST(length(text) // 20 AS VARCHAR)
       |      || '|' || substr(lower(text), 1, 10) AS blk,
       |    substr(lower(text), 1, 48) AS k
       |  FROM corpus),
       |okblk AS (
       |  SELECT blk FROM base GROUP BY 1 HAVING COUNT(*) BETWEEN 2 AND 10000)
       |SELECT id1, id2, dist FROM (
       |  SELECT a.id AS id1, b.id AS id2,
       |    CAST(levenshtein(a.k, b.k) AS INT) AS dist
       |  FROM base a JOIN base b ON a.blk = b.blk AND a.id < b.id
       |  JOIN okblk o ON o.blk = a.blk)
       |WHERE dist <= 2
       |ORDER BY id1, id2""".stripMargin

  /** Full SimHash mirror: raw 60-bit md5 token hashes, 64 bit-votes
    * (bit set iff 2·set-count ≥ token-count — exactly SimHash64Expr's
    * votes ≥ 0), 4×16-bit chunk banding with the bucket cap, hamming ≤ 3
    * verify. Bit weights are emitted as LITERALS (DuckDB's `<<`
    * overflow-checks at bit 63; bit 63's weight is Long.MinValue, and
    * the ascending-order sum stays in range by construction). */
  private val simhashSql = {
    val fpExpr = (0 to 63).map { i =>
      s"""(CASE WHEN 2 * len(list_filter(th, h -> (h >> $i) & 1 = 1)) >= len(th)
         |  THEN CAST(${1L << i} AS BIGINT) ELSE 0 END)""".stripMargin
    }.mkString(" + ")
    s"""WITH corpus AS ($corpusExactSql),
       |th AS (
       |  SELECT doc_id,
       |    list_transform(string_split_regex(trim(text), '\\s+'),
       |      x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)) AS th
       |  FROM corpus),
       |fps AS (SELECT doc_id, $fpExpr AS fp FROM th),
       |chunks AS (
       |  SELECT doc_id, fp, j.j, (fp >> (j.j * 16)) & 65535 AS chunk
       |  FROM fps, (SELECT unnest(range(0, 4)) AS j) j),
       |okc AS (
       |  SELECT j, chunk FROM chunks GROUP BY 1, 2
       |  HAVING COUNT(*) BETWEEN 2 AND 10000),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
       |    a.fp AS fp1, b.fp AS fp2
       |  FROM chunks a JOIN chunks b ON a.j = b.j AND a.chunk = b.chunk
       |   AND a.doc_id < b.doc_id
       |  JOIN okc o ON o.j = a.j AND o.chunk = a.chunk)
       |SELECT id1, id2, CAST(bit_count(xor(fp1, fp2)) AS INT) AS hamming
       |FROM cand WHERE bit_count(xor(fp1, fp2)) <= 3
       |ORDER BY id1, id2""".stripMargin
  }

  /** Passage-dedup mirror over a pluggable corpus CTE — dual-base
    * Horner mirror of AlignedChunkFingerprints: list_reduce seeds with
    * the first element, which equals Horner from 0 because every
    * element is already < P. Shared by `dedup_paragraph` (near-dup
    * corpus) and `dedup_passage_sql` (raw documents via the SQL table
    * function). */
  private def passageDedupMirror(corpusSql: String): String = {
    def chunkFp(base: Int): String =
      s"""list_reduce(list_slice(th, i*16+1, LEAST((i+1)*16, n)),
         |      (a, b) -> (a*$base + b) % 1000000007)""".stripMargin
    s"""WITH corpus AS ($corpusSql),
       |th AS (
       |  SELECT doc_id,
       |    list_transform(string_split(text, ' '),
       |      x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)
       |           % 1000000007) AS th,
       |    len(string_split(text, ' ')) AS n
       |  FROM corpus),
       |chunks AS (
       |  SELECT doc_id, i AS idx,
       |    (${chunkFp(31)}) * 1000000007 + (${chunkFp(37)}) AS fp,
       |    LEAST((i+1)*16, n) - i*16 AS ctoks
       |  FROM th CROSS JOIN UNNEST(range(0, (n + 15) // 16)) AS u(i)),
       |marked AS (
       |  SELECT doc_id, idx, ctoks,
       |    row_number() OVER (PARTITION BY fp ORDER BY doc_id, idx) AS rn
       |  FROM chunks)
       |SELECT doc_id, CAST(count(*) AS INT) AS n_chunks,
       |  CAST(sum(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS INT) AS n_dup_chunks,
       |  CAST(sum(CASE WHEN rn = 1 THEN ctoks ELSE 0 END) AS BIGINT)
       |    AS kept_tokens
       |FROM marked GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  val oracles: Map[String, String] = checked(
    "dedup_exact" ->
      s"""SELECT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
         |  MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
         |FROM ($corpusExactSql)
         |GROUP BY 1 ORDER BY keep_id""".stripMargin,
    "dedup_paragraph" -> passageDedupMirror(corpusNearSql),
    // same mirror, raw documents corpus — the spark.sql entry point
    // must reproduce the operator exactly
    "dedup_passage_sql" ->
      passageDedupMirror("SELECT doc_id, text FROM documents"),
    "dedup_exact_substr" -> {
      // nested-Horner mirror of the rolling Rabin-Karp fingerprint:
      // mathematically equal mod P, every intermediate < 2^36
      def horner(base: Int): String =
        (1 until 16).foldLeft("th[i]") { (e, j) =>
          s"(($e) * $base + th[i+$j]) % 1000000007"
        }
      s"""WITH corpus AS ($corpusNearSql),
         |th AS (${thSql("corpus")}),
         |win AS (
         |  SELECT doc_id, i AS pos,
         |    (${horner(31)}) * 1000000007 + (${horner(37)}) AS fp
         |  FROM th CROSS JOIN UNNEST(range(1, len(th) - 14)) AS u(i)),
         |dup AS (SELECT fp FROM win GROUP BY fp HAVING count(*) >= 2),
         |sp AS (
         |  SELECT w.doc_id, w.pos,
         |    lag(w.pos) OVER (PARTITION BY w.doc_id ORDER BY w.pos) AS pp
         |  FROM win w JOIN dup USING (fp)),
         |agg AS (
         |  SELECT doc_id, count(*) AS ndw,
         |    sum(CASE WHEN pp IS NULL THEN 16
         |             ELSE least(16, pos - pp) END) AS ndt
         |  FROM sp GROUP BY doc_id)
         |SELECT t.doc_id, CAST(len(th) AS INT) AS n_tokens,
         |  CAST(greatest(len(th) - 15, 0) AS INT) AS n_windows,
         |  CAST(COALESCE(ndw, 0) AS INT) AS n_dup_windows,
         |  CAST(COALESCE(ndt, 0) AS BIGINT) AS n_dup_tokens,
         |  COALESCE(ndt, 0) * 2 < len(th) AS keep
         |FROM th t LEFT JOIN agg USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin
    },
    "dedup_incremental" ->
      raw"""WITH idx AS (
           |  SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
           |    MIN(doc_id) AS owner
           |  FROM documents WHERE doc_id % 5 <> 0 GROUP BY 1),
           |batch AS (
           |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
           |  UNION ALL
           |  SELECT doc_id + 1000000, text FROM documents
           |  WHERE doc_id % 5 <> 0 AND doc_id % 7 = 1),
           |fps AS (
           |  SELECT doc_id,
           |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
           |  FROM batch)
           |SELECT f.doc_id, f.fp, i.owner, i.owner IS NOT NULL AS is_dup
           |FROM fps f LEFT JOIN idx i USING (fp)
           |ORDER BY f.doc_id""".stripMargin,
    "dedup_incremental_near" -> {
      def shCte(th: String) =
        s"""SELECT doc_id,
           |    CASE WHEN len(th) >= 3
           |      THEN list_transform(range(1, len(th)-1),
           |             i -> (th[i]*961 + th[i+1]*31 + th[i+2]) % 1000000007)
           |      ELSE [] END AS sh
           |  FROM $th""".stripMargin
      def sigCte(sh: String) =
        s"""SELECT doc_id,
           |    list_transform(range(0, 12), i ->
           |      list_min(list_transform(sh,
           |        h -> ((i*7919 + 1) * h + i*104729) % 1000000007))) AS sig
           |  FROM $sh""".stripMargin
      def bandsCte(sig: String) =
        s"""SELECT doc_id, b.band_idx,
           |    sig[b.band_idx*2+1] * 1000000007 + sig[b.band_idx*2+2] AS band_key
           |  FROM $sig, (SELECT unnest(range(0, 6)) AS band_idx) b""".stripMargin
      s"""WITH idxc AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0),
         |batchc AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, text || ' xtra token pad' AS text
         |  FROM documents WHERE doc_id % 5 <> 0 AND doc_id % 7 = 1),
         |thi AS (${thSql("idxc")}),
         |shi AS (${shCte("thi")}),
         |sigi AS (${sigCte("shi")}),
         |bandsi AS (${bandsCte("sigi")}),
         |thb AS (${thSql("batchc")}),
         |shb AS (${shCte("thb")}),
         |sigb AS (${sigCte("shb")}),
         |bandsb AS (${bandsCte("sigb")}),
         |okb AS (
         |  SELECT band_idx, band_key FROM bandsi
         |  GROUP BY 1, 2 HAVING COUNT(*) <= 10000),
         |candids AS (
         |  SELECT DISTINCT b.doc_id AS bid, a.doc_id AS iid
         |  FROM bandsb b
         |  JOIN bandsi a
         |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |  JOIN okb o
         |    ON o.band_idx = a.band_idx AND o.band_key = a.band_key),
         |cand AS (
         |  SELECT c.bid, c.iid, s1.sh AS sh1, s2.sh AS sh2
         |  FROM candids c
         |  JOIN shb s1 ON s1.doc_id = c.bid
         |  JOIN shi s2 ON s2.doc_id = c.iid)
         |SELECT batch_id, owner_id, jaccard FROM (
         |  SELECT bid AS batch_id, iid AS owner_id,
         |    CAST(len(list_filter(list_distinct(sh1), x -> list_contains(sh2, x))) AS DOUBLE)
         |    / (len(list_distinct(sh1)) + len(list_distinct(sh2))
         |       - len(list_filter(list_distinct(sh1), x -> list_contains(sh2, x)))) AS jaccard
         |  FROM cand)
         |WHERE jaccard >= 0.5
         |ORDER BY batch_id, owner_id""".stripMargin
    },
    "dedup_minhash" -> minhashSql,
    "dedup_clusters" -> clustersSql,
    "dedup_cluster_best" -> clusterBestSql,
    "dedup_cdc_chunks" -> cdcChunksSql,
    "dedup_decontaminate" ->
      raw"""WITH corpus AS (
           |  SELECT doc_id, text, (doc_id % 50 = 0) AS is_eval FROM documents
           |  UNION ALL
           |  SELECT doc_id + 1000000, text || ' xtra token pad', false
           |  FROM documents WHERE doc_id % 50 = 0),
           |sh AS (SELECT doc_id, is_eval,
           |  list_distinct(CASE WHEN len(th) >= 3
           |    THEN list_transform(range(1, len(th)-1),
           |      i -> (th[i]*961 + th[i+1]*31 + th[i+2]) % 1000000007)
           |    ELSE [] END) AS sh
           |  FROM (SELECT doc_id, is_eval,
           |    list_transform(string_split_regex(trim(text), '\s+'),
           |      x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)
           |        % 1000000007) AS th
           |    FROM corpus)),
           |eval_sh AS (SELECT DISTINCT unnest(sh) AS h FROM sh WHERE is_eval),
           |train AS (SELECT doc_id, sh FROM sh
           |          WHERE NOT is_eval AND len(sh) > 0),
           |overlap AS (
           |  SELECT t.doc_id, CAST(len(t.sh) AS INT) AS n_shingles,
           |    CAST(COUNT(e.h) AS INT) AS n_overlap
           |  FROM train t
           |  LEFT JOIN (SELECT doc_id, unnest(sh) AS h FROM train) x
           |    ON x.doc_id = t.doc_id
           |  LEFT JOIN eval_sh e ON e.h = x.h
           |  GROUP BY t.doc_id, len(t.sh))
           |SELECT doc_id, n_shingles, n_overlap FROM overlap
           |WHERE n_overlap * 2 >= n_shingles
           |ORDER BY doc_id""".stripMargin,
    "dedup_simhash" -> simhashSql,
    "dedup_ngram_jaccard" -> jaccardSql,
    "dedup_fuzzy_join" -> fuzzyJoinSql,
    "dedup_containment" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id,
        |    array_to_string(list_slice(
        |      string_split_regex(trim(text), '\s+'), 1, 25), ' ') AS text
        |  FROM documents WHERE doc_id % 7 = 0),
        |th AS (
        |  SELECT doc_id,
        |    array_to_string(list_slice(
        |      string_split_regex(trim(text), '\s+'), 1, 2), ' ') AS blk,
        |    list_transform(string_split_regex(trim(text), '\s+'),
        |      x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT) % 1000000007) AS th
        |  FROM corpus),
        |base AS (
        |  SELECT doc_id, blk,
        |    CASE WHEN len(th) >= 2
        |      THEN list_transform(range(1, len(th)),
        |             i -> (th[i]*31 + th[i+1]) % 1000000007)
        |      ELSE [] END AS sh
        |  FROM th),
        |okblk AS (
        |  SELECT blk FROM base GROUP BY 1 HAVING COUNT(*) BETWEEN 2 AND 10000)
        |SELECT id1, id2, containment FROM (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2,
        |    greatest(
        |      CAST(len(list_filter(list_distinct(a.sh),
        |             x -> list_contains(b.sh, x))) AS DOUBLE)
        |        / len(list_distinct(a.sh)),
        |      CAST(len(list_filter(list_distinct(b.sh),
        |             x -> list_contains(a.sh, x))) AS DOUBLE)
        |        / len(list_distinct(b.sh))) AS containment
        |  FROM base a JOIN base b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |  JOIN okblk o ON o.blk = a.blk)
        |WHERE containment >= 0.9
        |ORDER BY id1, id2""".stripMargin,
    "dedup_embed_cosine" ->
      """WITH corpus AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        |  FROM embeddings WHERE vec_id < 2000
        |  UNION ALL
        |  SELECT vec_id + 1000000,
        |    list_transform(range(1, len(embedding) + 1),
        |      i -> CAST(embedding[i] AS DOUBLE) + 0.001 * ((i % 7) - 3))
        |  FROM embeddings WHERE vec_id % 10 = 0 AND vec_id < 2000),
        |qv AS (
        |  SELECT vec_id,
        |    list_transform(vec, x -> CAST(round(x * 10000) AS BIGINT)) AS q
        |  FROM corpus)
        |SELECT id1, id2, cosine FROM (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2,
        |    list_dot_product(a.q, b.q)
        |      / (sqrt(list_dot_product(a.q, a.q))
        |         * sqrt(list_dot_product(b.q, b.q))) AS cosine
        |  FROM qv a, qv b WHERE a.vec_id < b.vec_id)
        |WHERE cosine >= 0.95
        |ORDER BY id1, id2""".stripMargin
  )
}
