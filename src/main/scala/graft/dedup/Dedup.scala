package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Deduplication operators for training-data pipelines (north-star EXT):
  * exact, MinHash+LSH near-dup, SimHash, and exact n-gram Jaccard.
  *
  * Scale design: every stage is a DataFrame op with partial aggregation
  * or a bounded equi-join — no cross joins against the full corpus.
  * MinHash/LSH turns O(N²) near-dup search into |bucket|²-bounded
  * equi-join work, the standard approach for trillion-token corpora
  * (shingle → signature → band → bucket join).
  *
  * MinHash base-hashes each shingle ONCE (md5 → 60-bit int) and derives
  * the k permutations arithmetically (a_i·h + b_i mod P) — the classic
  * multiply-shift family, reproducible across engines because md5 and
  * 63-bit modular arithmetic are engine-agnostic (the DuckDB oracle
  * computes the identical signatures and band keys).
  */
object Dedup {

  /** Deterministic exact dedup: group rows by `key` and keep the row
    * with the smallest `tiebreak` (dropDuplicates keeps an ARBITRARY
    * row — unacceptable for reproducible pipelines). One partial-agg
    * shuffle via max_by/min_by.
    */
  def exactKeepMin(df: DataFrame, key: Column, tiebreak: Column): DataFrame = {
    val cols = df.columns.toSeq
    df.groupBy(key.as("__dedup_key"))
      .agg(min_by(struct(cols.map(col): _*), tiebreak).as("__row"))
      .select(cols.map(c => col(s"__row.$c").as(c)): _*)
  }

  /** Passage-level exact dedup — the sub-document pass of published
    * training-data dedup pipelines (remove repeated boilerplate
    * passages ACROSS documents, not whole-document copies): split each
    * document's token stream into consecutive `chunkTokens`-token
    * passages, keep only the globally FIRST occurrence of each
    * distinct passage (total order: (doc_id, position) — order-free
    * and deterministic, no sequential sweep), and report per-document
    * retention: (doc_id, n_chunks, n_dup_chunks, kept_tokens).
    *
    * Scale shape — deliberately NOT a window over the passage text: a
    * boilerplate passage repeated millions of times (the very thing
    * this operator removes) would land every occurrence in ONE window
    * partition and serialize there. Instead the first occurrence per
    * passage is a `min(struct(doc_id, idx, ctoks))` PARTIAL aggregate
    * — a hot passage collapses to one row per map task before the
    * exchange — and the per-doc stats come from two more partial aggs
    * (total chunks by doc, winner chunks by doc) joined on doc_id.
    * No window, no driver state; every exchange is skew-proof by
    * map-side combine. The winners exchange is keyed by the passage's
    * 60-bit dual-base FINGERPRINT ([[graft.functions.Native.chunkFingerprints]]),
    * not its text — 8 bytes per chunk move instead of the ~100-byte
    * passage string (measured: total query shuffle write 14.4 MB →
    * 6.0 MB at sf1, 2.4× less, on the ~97%-collapsed near-dup corpus;
    * the ratio grows with chunk distinctness since winners dominate
    * the exchange). A ~2^60 fp collision can only MERGE two distinct passages
    * (over-dedup by one), the accepted fingerprint-dedup trade, and
    * the oracle groups by the same value so the gate stays exact.
    * Requires [[graft.functions.Native.register]] on the session.
    */
  def passageDedupStats(docs: DataFrame, idCol: String, textCol: String,
                        chunkTokens: Int): DataFrame = {
    val toks = split(col(textCol), " ")
    val fps = graft.functions.Native.chunkFingerprints(
      graft.functions.Native.tokenHashes(toks), chunkTokens)
    val exploded = docs
      .select(col(idCol).as("doc_id"), size(toks).as("n_toks"),
        posexplode(fps))
      .select(col("doc_id"), col("pos").as("idx"), col("col").as("fp"),
        least(col("n_toks") - col("pos") * chunkTokens, lit(chunkTokens))
          .as("ctoks"))
    val totals = exploded.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_chunks"))
    // first occurrence = lexicographic min of (doc_id, idx); ctoks
    // rides in the struct's last slot and never influences the order
    // because (doc_id, idx) is unique
    val winners = exploded
      .groupBy(col("fp"))
      .agg(min(struct(col("doc_id"), col("idx"), col("ctoks"))).as("w"))
      .groupBy(col("w.doc_id").as("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_kept"),
        sum(col("w.ctoks")).cast("bigint").as("kept_tokens"))
    totals.join(winners, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        (col("n_chunks") - coalesce(col("n_kept"), lit(0))).cast("int")
          .as("n_dup_chunks"),
        coalesce(col("kept_tokens"), lit(0L)).cast("bigint")
          .as("kept_tokens"))
  }

  /** ExactSubstr-style duplicated-substring statistics (Lee et al.
    * 2021, "Deduplicating Training Data Makes Language Models Better"):
    * every k-token window (stride 1) is fingerprinted; a window whose
    * fingerprint occurs >= 2 times anywhere in the corpus — any doc,
    * any position, including elsewhere in the same doc — is
    * duplicated. Per doc: window totals, duplicated-window count, and
    * the UNION length of the duplicated spans. Because all windows
    * share length k, the union of sorted overlapping intervals needs
    * no gaps-and-islands pass: each window past the first contributes
    * min(k, pos - prev_pos) tokens, so one per-doc lag suffices.
    *
    * Scale shape: fingerprints come from the O(tokens) rolling
    * Rabin-Karp native pass ([[graft.functions.Native.substrFingerprints]],
    * 60-bit), the global occurrence count is a partial-agg shuffle of
    * (fp) longs — the same order of bytes the published suffix-array
    * formulation moves — and the per-doc lag window is bounded by
    * document length. A 60-bit fingerprint pair-collides at ~2^30
    * windows; a collision marks one extra window duplicated (never
    * drops one), the accepted trade of published fingerprint dedup.
    * Requires [[graft.functions.Native.register]] on the session. */
  def substrDupStats(docs: DataFrame, idCol: String, textCol: String,
                     k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = graft.text.TextOps.tokens(col(textCol))
    val base = docs.select(col(idCol).as("doc_id"),
      graft.functions.Native.tokenHashes(toks).as("th"))
    val win = base
      .select(col("doc_id"),
        posexplode(graft.functions.Native.substrFingerprints(col("th"), k)))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("fp"))
    val dupFp = win.groupBy(col("fp"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
    val lagW = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val perDoc = win.join(dupFp.select("fp"), Seq("fp"))
      .withColumn("prev", lag(col("pos"), 1).over(lagW))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_dup_windows"),
        sum(when(col("prev").isNull, lit(k.toLong))
          .otherwise(least(lit(k.toLong), col("pos") - col("prev"))))
          .cast("bigint").as("n_dup_tokens"))
    docs
      .select(col(idCol).as("doc_id"), size(toks).as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens").cast("int").as("n_tokens"),
        greatest(col("n_tokens") - (k - 1), lit(0)).cast("int")
          .as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0)).cast("int")
          .as("n_dup_windows"),
        coalesce(col("n_dup_tokens"), lit(0L)).cast("bigint")
          .as("n_dup_tokens"))
      .withColumn("keep", col("n_dup_tokens") * 2 < col("n_tokens"))
  }

  /** Modulus for the MinHash permutation family: fits every intermediate
    * in 63 bits (h < P, a ≤ 12·7919, so a·h + b < 2^63) — no overflow in
    * Spark OR an overflow-checking oracle engine. */
  val MinHashP = 1000000007L

  /** 60-bit base hash of a string: the first 15 hex chars of its md5,
    * reduced mod [[MinHashP]]. One md5 per token; reproducible on any
    * engine with md5 + hex parsing. */
  def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long") % MinHashP

  /** Per-token hashes for a token array — hash each token ONCE, then do
    * everything downstream (shingles, signatures, bands, Jaccard) in
    * long arithmetic. String shingles are never materialized: with
    * higher-order functions evaluated interpreted (no codegen), string
    * building dominates; integer folds are ~10× cheaper. */
  def tokenHashes(toks: Column): Column = transform(toks, t => hash60(t))

  /** n-gram shingle hashes from token hashes: a base-31 polynomial roll
    * of n consecutive token hashes mod P (th < P ≈ 2^30, so every
    * intermediate fits a long for n ≤ 3). Hash-set Jaccard over these
    * equals string-shingle Jaccard up to ~|set|²/P collision odds
    * (negligible, and identically mirrored in the oracle). */
  def shingleHashes(th: Column, n: Int): Column =
    when(size(th) >= n,
      transform(sequence(lit(1), size(th) - lit(n - 1)), i =>
        (0 until n).map(j => element_at(th, i + lit(j)) *
          lit(math.pow(31, n - 1 - j).toLong)).reduce(_ + _) % lit(MinHashP)))
      .otherwise(array().cast("array<bigint>"))

  /** MinHash signature: k min-order-statistics under the permutation
    * family h_i(x) = (a_i·x + b_i) mod P over pre-hashed shingles.
    * Feed a materialized long-array column (one base hash per shingle,
    * computed once) — the k permutations are then pure arithmetic. */
  def minHashSignature(hashes: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(hashes, h =>
        ((i * lit(7919L) + lit(1L)) * h + i * lit(104729L)) % lit(MinHashP))))

  /** LSH band keys: split the k-signature into `bands` groups of
    * k/bands rows; each band key combines its slice arithmetically
    * (values < P, so a base-P polynomial of r=2 terms fits a long).
    * Docs sharing ANY (band_idx, band_key) become candidate pairs. */
  def lshBandKeys(sig: Column, k: Int, bands: Int): Column = {
    val r = k / bands
    require(r == 2, s"bands ($bands) must be k/2 (k=$k) for the long-packed band key")
    transform(sequence(lit(0), lit(bands - 1)), j =>
      element_at(sig, j * lit(r) + lit(1)) * lit(MinHashP) +
        element_at(sig, j * lit(r) + lit(2)))
  }

  /** All unordered pairs {id1 < id2} from a bucket's id list, as an
    * array of structs (order-canonicalized with least/greatest so the
    * result is independent of collect_list's arrival order). */
  def pairsFromIds(ids: Column): Column =
    flatten(transform(sequence(lit(1), size(ids) - 1), i =>
      transform(slice(ids, i + lit(1), size(ids) - i), y =>
        struct(least(element_at(ids, i), y).as("id1"),
          greatest(element_at(ids, i), y).as("id2")))))

  /** Star (pivot) pairs for an OVERSIZED candidate bucket: (min_id, x)
    * for every other member — O(m) rows instead of m·(m-1)/2. A giant
    * bucket is, in practice, one near-identical duplicate cluster (the
    * skew campaign's hot embedding cluster produced a 5930-member bucket
    * = 17.6M all-pairs); its consumer (clustering / keeper election)
    * needs the cluster CONNECTED, not its quadratic pair closure, and
    * every star pair is still exact-verified downstream. `id1 < id2`
    * holds because the pivot is the bucket minimum. */
  def starPairsFromIds(ids: Column): Column = {
    val pivot = array_min(ids)
    transform(filter(ids, x => x =!= pivot),
      x => struct(pivot.as("id1"), x.as("id2")))
  }

  /** Bucket size above which pair expansion degrades to star pairs
    * (all-pairs below it; see [[starPairsFromIds]]). Far above any
    * bucket observed on uniform corpora at 20× gate scale, so the
    * collapse only engages on degenerate hot clusters. */
  val DefaultStarBucket = 1000

  /** Exact Jaccard similarity of two token/shingle arrays (set
    * semantics, duplicate-safe, engine-reproducible). array_intersect /
    * array_distinct are hash-based O(n+m) — never the O(n·m)
    * contains-scan. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val union = size(array_distinct(a)) + size(array_distinct(b)) - inter
    inter.cast("double") / union
  }

  /** Full MinHash/LSH near-dup candidate pipeline over (id, text):
    * returns candidate pairs (id1 < id2) with their exact shingle
    * Jaccard, filtered to `minJaccard`. The only shuffles are the band
    * self-equi-join and a distinct.
    */
  /** Upper bound on candidate-bucket size before pair expansion. A bucket
    * of m ids expands m·(m-1)/2 pairs inside ONE task; a pathological
    * bucket (boilerplate text hashing to one band key) would otherwise do
    * O(m²) work and OOM the task at corpus scale. Buckets above the cap
    * are dropped — their members are by construction low-signal
    * boilerplate, the standard production trade (recall on spam-sized
    * clusters for bounded worst-case work). Drops are observable via the
    * named `observe` metrics (`<name>: dropped_buckets, max_bucket`). */
  val DefaultMaxBucket = 10000

  private[graft] def capBuckets(grouped: DataFrame, sizeOf: Column,
                                metricName: String, maxBucket: Int,
                                starBucket: Int = Int.MaxValue): DataFrame =
    grouped
      .filter(sizeOf > 1)
      .observe(metricName,
        sum(when(sizeOf > maxBucket, 1L).otherwise(0L)).as("dropped_buckets"),
        coalesce(max(sizeOf), lit(0)).as("max_bucket"),
        sum(when(sizeOf > starBucket && sizeOf <= maxBucket, 1L)
          .otherwise(0L)).as("star_buckets"))
      .filter(sizeOf <= maxBucket)

  /** NOTE on input scans: the shingle pipeline (`base`) is referenced by
    * the band branch AND both sides of the verify join — Spark
    * re-executes the subplan per reference, so without the cache `docs`
    * would be scanned ~3×. Carrying shingle arrays through the band
    * shuffle (the no-cache alternative to re-scanning) multiplies
    * shuffle volume by shingle size, so the projection is PERSISTED by
    * default: one corpus scan feeds all three references.
    *
    * @param persistShingles cache the (id, sh) projection
    *   (MEMORY_AND_DISK) so the three references compute it once. The
    *   cache entry outlives the call (the returned DataFrame is lazy);
    *   Spark's ContextCleaner reclaims the blocks once the caller drops
    *   the result, a caller that keeps the result alive hands the
    *   blocks back explicitly via [[releaseCache]], and callers owning
    *   a tighter lifecycle (a long-lived service looping over corpora)
    *   can pass false and persist or pre-write the projection
    *   themselves.
    */
  /** The (id, sh) shingle-hash projection [[minHashNearDupPairs]]
    * builds internally, exposed for INDEX pipelines (incremental
    * near-dup): compute once over the accepted corpus, persist, probe
    * later. md5 runs once per TOKEN; shingling is long arithmetic in
    * single-pass native expressions behind generator barriers — same
    * math as the HOF column API, same oracle. Docs too short to
    * shingle are dropped (they can't be near-dups, and without the
    * filter they all share null band keys → one O(m²) bucket). */
  def shingleProjection(docs: DataFrame, idCol: String, textCol: String,
                        shingleLen: Int = 3): DataFrame = {
    import graft.functions.Native
    import graft.ops.Ops.materializedColumn
    Native.register(docs.sparkSession)
    materializedColumn(
      materializedColumn(
        docs.select(col(idCol).as("id"), col(textCol).as("text")),
        "th", Native.tokenHashes(TextOps.tokens(col("text")))),
      "sh", Native.shingleHashes(col("th"), shingleLen))
      .select(col("id"), col("sh"))
      .filter(size(col("sh")) > 0)
  }

  /** The (id, band_idx, band_key) LSH band projection over a (id, sh)
    * shingle table — the INDEX rows an incremental near-dup pipeline
    * persists and probes. The signature evaluates once behind a
    * generator barrier (inlined, it would recompute per band). */
  def bandProjection(base: DataFrame, k: Int = 12,
                     bands: Int = 6): DataFrame = {
    import graft.functions.Native
    import graft.ops.Ops.materializedColumn
    Native.register(base.sparkSession)
    materializedColumn(base, "sig", Native.minHashSig(col("sh"), k))
      .select(col("id"),
        posexplode(lshBandKeys(col("sig"), k, bands))
          .as(Seq("band_idx", "band_key")))
  }

  def minHashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          shingleLen: Int = 3, k: Int = 12, bands: Int = 6,
                          minJaccard: Double = 0.5,
                          maxBucket: Int = DefaultMaxBucket,
                          persistShingles: Boolean = true): DataFrame = {
    val base0 = shingleProjection(docs, idCol, textCol, shingleLen)
    val base =
      if (persistShingles)
        base0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else base0
    val bandsDf = bandProjection(base, k, bands)
    // Candidate pairs via ONE pass: group ids per bucket and expand i<j
    // pairs locally (the self-join alternative scans the corpus twice).
    // Buckets above `maxBucket` are dropped before expansion (capBuckets)
    // so one hot bucket can never blow up a task.
    val cand = capBuckets(
      bandsDf
        .groupBy(col("band_idx"), col("band_key"))
        .agg(collect_list(col("id")).as("ids")),
      size(col("ids")), "graft_minhash_buckets", maxBucket)
      .select(explode(pairsFromIds(col("ids"))).as("p"))
      .select(col("p.id1"), col("p.id2"))
      .distinct()
    cand
      .join(base.select(col("id").as("id1"), col("sh").as("sh1")), Seq("id1"))
      .join(base.select(col("id").as("id2"), col("sh").as("sh2")), Seq("id2"))
      .withColumn("jaccard", jaccard(col("sh1"), col("sh2")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** 64-bit SimHash over a token array: per bit, tokens vote ±1 by the
    * corresponding xxhash64 bit; the sign becomes the fingerprint bit.
    * The bit loop unrolls in Scala (shift amounts must be literals); each
    * bit is one local aggregate over the token array — no shuffle.
    */
  def simHash64(toks: Column): Column =
    simHash64FromHashes(transform(toks, t => xxhash64(t)))

  /** SimHash from pre-computed token hashes: 64 bit-votes over a long
    * array. Feed this an already-materialized hash column (see
    * Ops.materializedColumn) so tokens are hashed once, not 64 times. */
  def simHash64FromHashes(hashes: Column): Column =
    (0 to 63).map { i =>
      when(
        aggregate(hashes, lit(0L), (acc, h) =>
          acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, lit(1L))
            .otherwise(lit(-1L))) >= 0L,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: band the 64-bit fingerprint into 4 16-bit
    * chunks (pigeonhole: hamming ≤ 3 guarantees one identical chunk),
    * equi-join on chunks, then filter by exact hamming distance.
    */
  def simHashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          maxHamming: Int = 3,
                          maxBucket: Int = DefaultMaxBucket): DataFrame = {
    import graft.functions.Native
    import graft.ops.Ops.materializedColumn
    Native.register(docs.sparkSession)
    // Hash tokens once per doc (RAW 60-bit md5 — engine-reproducible, so
    // the DuckDB oracle mirrors the whole pipeline; xxhash64 would make
    // this rows-only checkable), then pin the fingerprint itself (it is
    // referenced once per 16-bit chunk downstream).
    val base = materializedColumn(
      materializedColumn(
        docs.select(col(idCol).as("id"), col(textCol).as("text")),
        "th", Native.tokenHashesRaw(TextOps.tokens(col("text")))),
      "fp", Native.simHash64(col("th")))
      .select(col("id"), col("fp"))
    val chunked = base.select(col("id"), col("fp"),
      posexplode(array((0 to 3).map(j =>
        shiftright(col("fp"), j * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk_idx", "chunk")))
    // One pass: bucket by chunk, expand pairs locally carrying the
    // fingerprints (struct comparison orders by id first). Hot chunks
    // above `maxBucket` are dropped before expansion (capBuckets).
    capBuckets(
      chunked
        .groupBy(col("chunk_idx"), col("chunk"))
        .agg(collect_list(struct(col("id"), col("fp"))).as("xs")),
      size(col("xs")), "graft_simhash_buckets", maxBucket)
      .select(explode(pairsFromIds(col("xs"))).as("p"))
      .select(col("p.id1.id").as("id1"), col("p.id2.id").as("id2"),
        col("p.id1.fp").as("fp1"), col("p.id2.fp").as("fp2"))
      .distinct()
      .withColumn("hamming", hamming64(col("fp1"), col("fp2")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
  }

  /** Exact n-gram Jaccard over a candidate blocking key (e.g. same
    * source + length bucket): pairwise similarity only within blocks,
    * never across the full corpus. Blocks larger than `maxBlock` are
    * dropped before the self-join (work within a block is O(m²); one
    * degenerate blocking key would otherwise dominate the whole job) —
    * drops observable via the `graft_jaccard_blocks` observe metric.
    */
  def blockedJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                          blockKey: Column, ngram: Int,
                          maxBlock: Int = DefaultMaxBucket): DataFrame =
    blockedShinglePairs(docs, idCol, textCol, blockKey, ngram, maxBlock,
        "graft_jaccard_blocks")
      .withColumn("jaccard", jaccard(col("sh1"), col("sh2")))
      .select(col("id1"), col("id2"), col("jaccard"))

  /** Per-group cap by census broadcast + EXACT integer hash threshold:
    * keep rows where `hash60(id) · n_group < cap · MinHashP` — an
    * engine- and partitioning-independent, subset-stable ~cap-per-group
    * sample (the expected kept count per group is `cap`, independent of
    * group size). THE stratified-sampling rule, shared by the sampler
    * query and the curation pipeline so it can never diverge. */
  def stratifiedCap(df: DataFrame, groupCol: Column, idCol: Column,
                    cap: Int): DataFrame = {
    val census = df.groupBy(groupCol.as("__grp"))
      .agg(count(lit(1)).as("__n_grp"))
    // the product side runs in DECIMAL(38,0): hash60 < P ~ 1e9, so a
    // LONG product would overflow (silently flipping keep decisions)
    // once a group passes ~9.2e9 rows — real at the 100 TB target.
    // Same kept set as the long math wherever that didn't overflow, so
    // the SQL mirrors are unchanged.
    df.join(broadcast(census), groupCol === col("__grp"))
      .filter(hash60(idCol.cast("string")).cast("decimal(38,0)") *
        col("__n_grp") < lit(cap.toLong) * lit(MinHashP))
      .drop("__grp", "__n_grp")
  }

  /** Containment similarity C(A→B) = |A∩B| / |A| over shingle-hash
    * sets — the doc-inside-doc signal Jaccard misses: a short document
    * fully quoted inside a long one has a tiny Jaccard (the union is
    * dominated by the long side) but containment 1.0 from the short
    * side. The asymmetric verify a dedup pipeline adds for quote /
    * subset / boilerplate-wrapper detection. Set semantics,
    * duplicate-safe, same hash-based O(n+m) ops as [[jaccard]]. */
  def containment(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_distinct(a))

  /** Blocked candidate pairs scored by MAX-DIRECTIONAL containment
    * (`greatest(C(a→b), C(b→a))`). Same census-capped blocking as
    * [[blockedJaccardPairs]]; pair a PREFIX-derived block key (e.g. the
    * first tokens) to catch head-quotes, or feed LSH candidates for
    * general containment. */
  def blockedContainmentPairs(docs: DataFrame, idCol: String,
                              textCol: String, blockKey: Column, ngram: Int,
                              maxBlock: Int = DefaultMaxBucket): DataFrame =
    blockedShinglePairs(docs, idCol, textCol, blockKey, ngram, maxBlock,
        "graft_containment_blocks")
      .withColumn("containment",
        greatest(containment(col("sh1"), col("sh2")),
          containment(col("sh2"), col("sh1"))))
      .select(col("id1"), col("id2"), col("containment"))

  /** Shared blocked-pair skeleton of the exact-verify dedups:
    * tokens → hashed `ngram` shingles, census-capped blocks, in-block
    * pair expansion → `(id1, id2, sh1, sh2)` with `id1 < id2`. */
  private def blockedShinglePairs(docs: DataFrame, idCol: String,
                                  textCol: String, blockKey: Column,
                                  ngram: Int, maxBlock: Int,
                                  metricName: String): DataFrame = {
    import graft.functions.Native
    import graft.ops.Ops.materializedColumn
    Native.register(docs.sparkSession)
    // Work on n-gram HASH sets (one md5 per token), not string shingles —
    // see shingleHashes.
    // persisted for the same reason minHashNearDupPairs persists its
    // shingle projection (r11): the subplan feeds the census AND both
    // self-join sides — uncached, the corpus was tokenized+shingled 3×
    // per run. ContextCleaner reclaims the blocks when the result is
    // dropped.
    val base = materializedColumn(
      docs.select(col(idCol).as("id"), blockKey.as("blk"), col(textCol).as("text")),
      "th", Native.tokenHashes(TextOps.tokens(col("text"))))
      .select(col("id"), col("blk"), Native.shingleHashes(col("th"), ngram).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // block-size census is tiny (one row per block) -> broadcast it
    val okBlocks = broadcast(capBuckets(
      base.groupBy(col("blk")).agg(count(lit(1)).cast("int").as("__bn")),
      col("__bn"), metricName, maxBlock)
      .select(col("blk")))
    val capped = base.join(okBlocks, Seq("blk"))
    val a = capped.select(col("blk"), col("id").as("id1"), col("sh").as("sh1"))
    val b = capped.select(col("blk"), col("id").as("id2"), col("sh").as("sh2"))
    a.join(b, Seq("blk"))
      .filter(col("id1") < col("id2"))
  }

  /** Fuzzy (edit-distance) similarity join — the entity-resolution
    * primitive Jaccard misses: two records whose KEY differs by a few
    * character-level errors (OCR noise, typos, transliteration) share
    * almost all their n-grams' positions but none of their exact
    * shingles once a char shifts. Candidate pairs come from the same
    * census-capped blocking skeleton as [[blockedJaccardPairs]]
    * (block sizes are O(1) when `blockKey` carries a content prefix;
    * hot blocks above `maxBlock` are dropped, observable via the
    * `graft_editdist_blocks` observe metric), then each pair is
    * verified with Levenshtein under Spark's THRESHOLD variant —
    * the banded O(maxDist·n) DP that abandons a row the moment the
    * distance provably exceeds `maxDist`, not the full O(n·m) matrix.
    * A |length| pre-guard prunes most pairs before any DP runs (it
    * rejects only pairs the threshold DP would reject, so results are
    * unchanged and the SQL mirror needs no guard). Compare BOUNDED
    * keys (a name/title/prefix), never whole documents — pair cost is
    * O(maxDist·|key|) by design. Returns (id1, id2, dist), id1 < id2,
    * dist ≤ maxDist. */
  def blockedEditDistancePairs(docs: DataFrame, idCol: String, key: Column,
                               blockKey: Column, maxDist: Int,
                               maxBlock: Int = DefaultMaxBucket): DataFrame = {
    val base = docs.select(col(idCol).as("id"), blockKey.as("blk"), key.as("k"))
    val okBlocks = broadcast(capBuckets(
      base.groupBy(col("blk")).agg(count(lit(1)).cast("int").as("__bn")),
      col("__bn"), "graft_editdist_blocks", maxBlock)
      .select(col("blk")))
    val capped = base.join(okBlocks, Seq("blk"))
    val a = capped.select(col("blk"), col("id").as("id1"), col("k").as("k1"))
    val b = capped.select(col("blk"), col("id").as("id2"), col("k").as("k2"))
    a.join(b, Seq("blk"))
      .filter(col("id1") < col("id2"))
      .filter(abs(length(col("k1")) - length(col("k2"))) <= maxDist)
      .withColumn("dist", levenshtein(col("k1"), col("k2"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id1"), col("id2"), col("dist"))
  }

  /** Connected components over an undirected pair list: returns one row
    * per node appearing in any pair, `(id, rep)` where `rep` is the
    * smallest id in the node's component — the duplicate-CLUSTER
    * resolution step a dedup pipeline needs after pair generation
    * (near-dup similarity is not transitive, but the keep-one-per-
    * cluster decision is made on the pair graph's components; keeping
    * the min id is the deterministic-keeper convention used by
    * [[exactKeepMin]]).
    *
    * Algorithm: min-label propagation to a fixpoint. Each round every
    * node adopts the smallest label among itself and its neighbors —
    * one equi-join of the (persisted) symmetric edge list against the
    * current labels plus one `min` aggregation, i.e. two shuffles per
    * round at any scale, no driver-side data. Rounds needed = the
    * graph's diameter; near-dup graphs are unions of small dense
    * clusters (diameter rarely exceeds single digits even at corpus
    * scale — a chain of pairwise-similar-but-transitively-different
    * docs is the pathological case, bounded by `maxRounds`).
    * Convergence is detected by the label-sum checksum: labels only
    * ever decrease, so the per-round `sum(rep)` is strictly decreasing
    * until the fixpoint, where it is stable — one O(1)-row action per
    * round. Each round's labels are `localCheckpoint`ed (lineage
    * truncation is NOT optional: an iterative plan chain grows
    * super-linearly in analysis/explain cost and OOMs the driver
    * within a few dozen rounds) and the PREVIOUS round's checkpoint
    * blocks are freed once the new one is materialized, so peak cached
    * state is two label sets — never O(rounds). On a cluster with
    * dynamic executors, a reliable `checkpoint` dir is the safer
    * variant of the same call.
    */
  /** Free a `localCheckpoint`'d DataFrame's cached blocks
    * (Dataset.unpersist only covers CacheManager entries; the
    * checkpoint's RDD is held by the LogicalRDD leaf the checkpoint
    * rewrote the plan to). Call once a checkpointed result — e.g.
    * [[connectedComponents]]' returned labels — has been fully
    * consumed; until then (and absent this call) the blocks live until
    * the ContextCleaner collects the dropped RDD reference. */
  def freeCheckpoint(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case lr: org.apache.spark.sql.execution.LogicalRDD =>
      lr.rdd.unpersist(false)
    case _ => ()
  }

  /** Release the MEMORY_AND_DISK blocks of every cached relation a
    * returned result still references — the explicit hand-back for the
    * `persistShingles` / `persistBase` default caches
    * ([[minHashNearDupPairs]], `Similarity.lshNearDupPairs`). Those
    * blocks are normally reclaimed by the ContextCleaner once the
    * caller drops the result, but a long-lived session that HOLDS
    * returned DataFrames pins them indefinitely; call this once the
    * rows have been consumed. Walks the cache-substituted plan and
    * clears each cached relation's buffers; the DataFrame stays valid
    * (a re-use simply re-materializes the cache). */
  def releaseCache(df: DataFrame): Unit =
    df.queryExecution.optimizedPlan.foreach {
      case imr: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        imr.cacheBuilder.clearCache(false)
      case _ => ()
    }

  def connectedComponents(pairs: DataFrame, idCol1: String, idCol2: String,
                          maxRounds: Int = 50): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val half = pairs.select(col(idCol1).cast("long").as("src"),
      col(idCol2).cast("long").as("dst"))
    val edges = half
      .unionByName(half.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    def checksum(labels: DataFrame): java.math.BigDecimal =
      labels.agg(coalesce(sum(col("rep").cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as("s"))
        .head.getDecimal(0)
    def free(df: DataFrame): Unit = Dedup.freeCheckpoint(df)
    try {
      // lazy checkpoints: the checksum action materializes each round's
      // labels, so a round costs ONE job, not a checkpoint job plus a
      // checksum job — and the previous round's blocks are freed only
      // AFTER the new round is materialized (its computation reads them)
      var labels = edges.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("rep"))
        .localCheckpoint(false)
      var prevSum = checksum(labels)
      var round = 0
      var converged = false
      while (!converged && round < maxRounds) {
        val viaNeighbor = edges
          .join(labels.select(col("id").as("dst"), col("rep")), Seq("dst"))
          .select(col("src").as("id"), col("rep"))
        // pointer jumping (path halving): also adopt rep(rep(id)) — an
        // existing label of a same-component node, so the min-label
        // invariant is untouched, but chain-shaped components converge
        // in O(log diameter) rounds instead of O(diameter) (the
        // adversarial case for plain propagation; dense near-dup
        // clusters converge in a few rounds either way). Skipped in
        // round 1, where labels are still the identity map and
        // rep(rep(id)) = rep(id) — the join would be pure overhead.
        val withPointer =
          if (round == 0) labels.unionByName(viaNeighbor)
          else labels.unionByName(viaNeighbor).unionByName(
            labels
              .join(labels.select(col("id").as("rep"), col("rep").as("rep2")),
                Seq("rep"))
              .select(col("id"), col("rep2").as("rep")))
        val next = withPointer
          .groupBy(col("id")).agg(min(col("rep")).as("rep"))
          .localCheckpoint(false)
        val s = checksum(next) // materializes `next`
        free(labels)
        converged = s.compareTo(prevSum) == 0
        prevSum = s
        labels = next
        round += 1
      }
      if (!converged) {
        free(labels)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxRounds rounds " +
            "(pair graph has a path longer than maxRounds; raise maxRounds)")
      }
      labels
    } finally edges.unpersist()
  }
}
