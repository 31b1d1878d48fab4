package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Candidate-vs-verified growth probe for the blocking near-dup family
  * (t09 shingle-Jaccard, t26 containment, t08 simhash, t13 embedding
  * LSH) — the numbers behind PLANS.md's density/scaling claims,
  * measured by counting the operators' OWN candidate stages
  * ([[graft.operators.Dedup.shingleCandidates]],
  * [[graft.operators.Dedup.simHashCandidates]],
  * [[graft.operators.Similarity.lshCandidates]]) instead of reading
  * them off wall times or spark-shell transcripts (the round-14
  * posture). Runs on the queries' exact planted corpora, so a
  * "verified" count is the size of the answer the oracle checks.
  *
  * Exists for the round-14 verdict's top item: under the FIXED
  * ScaleGen resample the shingle type space saturates and the t09/t26
  * df∈[2,20] blocking passes zero candidates at 100×, so the decade
  * rows measured only the blocking aggregate. Under heaps-mode corpora
  * the verify arm does real work at every factor — measured round 16,
  * candidate/verified counts per decade in PLANS.md round 16.
  *
  * Usage: runMain graft.CandidateProbe [family ...]   (default: all)
  *   SPARK_GRAFT_SF_DIR  corpus dir (default /root/testdata/sf0.1)
  */
object CandidateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fams: Set[String] =
      if (args.nonEmpty) args.toSet else Set("t09", "t26", "t08", "t13")
    val spark = graft.core.Sessions.local("graft-candidate-probe")
    import graft.GoldenGen.ModelParams._
    import graft.operators.{Dedup, Similarity}

    def timed(df: => DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = df.count()
      (n, math.round((System.nanoTime() - t0) / 1e6) / 1e3)
    }
    val fields = scala.collection.mutable.ArrayBuffer[String]()
    def emit(fam: String, stage: String, n: Long, wall: Double): Unit = {
      fields += s""""${fam}_$stage":$n,"${fam}_${stage}_s":$wall"""
      println(s"[candprobe] $fam $stage n=$n wall=${wall}s")
    }

    // "<fam>cand" runs the blocking stage only — the verify arm's
    // shuffle volume is candidates × per-doc payload (measured ~180 GB
    // at the 1000× corpus), an aggregate-cluster-disk resource a single
    // probe node may not have; the blocking stage stays measurable
    val planted = graft.queries.LlmQueries.plantedCorpus(spark, sfDir)
    if (fams("t09") || fams("t09cand")) {
      val (nc, wc) = timed(Dedup.shingleCandidates(planted, 3, 20))
      emit("t09", "candidates", nc, wc)
    }
    if (fams("t09")) {
      val (nv, wv) = timed(
        Dedup.jaccardPairs(planted, "text", "doc_id", threshold = 0.6))
      emit("t09", "verified", nv, wv)
    }
    if (fams("t26") || fams("t26cand")) {
      // the t26 corpus: docs ∪ 'pre <text> post' wrappers (id + 2e6)
      val docs = graft.core.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      val wrapped = docs.unionAll(docs.select(
        (col("doc_id") + 2000000L).as("doc_id"),
        concat(lit("pre "), col("text"), lit(" post")).as("text")))
      val (nc, wc) = timed(Dedup.shingleCandidates(wrapped, 3, 20))
      emit("t26", "candidates", nc, wc)
      if (fams("t26")) {
        val (nv, wv) = timed(Dedup.containmentPairs(wrapped, "text", "doc_id"))
        emit("t26", "verified", nv, wv)
      }
    }
    if (fams("t08")) {
      val (nc, wc) = timed(Dedup.simHashCandidates(
        planted, "text", "doc_id", blocks = SimBlocks))
      emit("t08", "candidates", nc, wc)
      val (nv, wv) = timed(Dedup.simHashPairs(planted, "text", "doc_id",
        maxHamming = SimHamming, blocks = SimBlocks))
      emit("t08", "verified", nv, wv)
    }
    if (fams("t08plan")) {
      // the round-17 scale mode: corpus-sized multi-block keys + the
      // occupancy cap ([[Dedup.simHashPlan]]). Measures the gated raw
      // stream, the distinct candidate set, the verified answer, and —
      // when "t08exactv" also runs — recall vs the exact hamming ball.
      val n = planted.count()
      val planned = Dedup.simHashPlan(n, SimHamming)
      // frontier sweep overrides (probe-only): GRAFT_T08_BLOCKS /
      // _KEYBLOCKS / _CAP (0 = no cap) replace the plan's choices
      val b = sys.env.get("GRAFT_T08_BLOCKS").map(_.toInt).getOrElse(planned._1)
      val k = sys.env.get("GRAFT_T08_KEYBLOCKS").map(_.toInt).getOrElse(planned._2)
      val cap = sys.env.get("GRAFT_T08_CAP")
        .map(_.toInt).map(c => if (c == 0) None else Some(c)).getOrElse(planned._3)
      println(s"[candprobe] t08plan n=$n blocks=$b keyBlocks=$k cap=$cap")
      fields += s""""t08plan_blocks":$b,"t08plan_keyblocks":$k,"t08plan_cap":${cap.getOrElse(0)}"""
      // stage gates: the candidate DISTINCT materializes the full
      // candidate set (32 B/row spill) — beyond ~1 B candidates that
      // exceeds a single probe box's disk, so it is opt-out via env
      // (the verified stage is safe at any cap: Catalyst pushes the
      // Hamming filter below the distinct, so only answer-pair rows
      // reach the exchange)
      if (!sys.env.contains("GRAFT_T08_SKIP_COLLISIONS")) {
        val (nr, wr) = timed(Dedup.simHashCollisions(planted, "text", "doc_id",
          blocks = b, keyBlocks = k, maxBucket = cap))
        emit("t08plan", "collisions", nr, wr)
      }
      if (!sys.env.contains("GRAFT_T08_SKIP_CANDIDATES")) {
        val (nc, wc) = timed(Dedup.simHashCandidates(planted, "text", "doc_id",
          blocks = b, keyBlocks = k, maxBucket = cap))
        emit("t08plan", "candidates", nc, wc)
      }
      if (!sys.env.contains("GRAFT_T08_SKIP_VERIFIED")) {
        val (nv, wv) = timed(Dedup.simHashPairs(planted, "text", "doc_id",
          maxHamming = SimHamming, blocks = b, keyBlocks = k, maxBucket = cap))
        emit("t08plan", "verified", nv, wv)
      }
      if (fams("t08dist")) {
        // recall structure under the cap: verified pairs by Hamming
        // distance (the cap should lose far-radius pairs first) and
        // PLANTED-pair recall — the dedup-relevant number (each base
        // doc's ' graftdup' copy sits at tiny distance; losing edges
        // inside an already-connected dense cluster does not change
        // cluster membership, losing a doc's ONLY edge does)
        val v = Dedup.simHashPairs(planted, "text", "doc_id",
          maxHamming = SimHamming, blocks = b, keyBlocks = k, maxBucket = cap)
        val byd = v.groupBy(col("hamming")).agg(count(lit(1)).as("c"))
          .orderBy(col("hamming")).collect()
          .map(r => s""""${r.get(0)}":${r.getLong(1)}""").mkString("{", ",", "}")
        val plantedHits = v.filter(col("right_id") === col("left_id") + 1000000L)
          .count()
        println(s"[candprobe] t08plan by_hamming=$byd planted_hits=$plantedHits")
        fields += s""""t08plan_by_hamming":$byd,"t08plan_planted_hits":$plantedHits"""
      }
    }
    if (fams("t08planted")) {
      // planted-recall denominator WITHOUT the quadratic exact run
      // (the 1000× decade's classic stream is ~7.6 T rows — hours):
      // planted pairs are id-linked (doc, doc + 1e6 at sf scale,
      // doc + half-corpus under ScaleGen), so their Hamming spectrum
      // is ONE linear self-join by id offset. Emits the number of
      // planted pairs within the radius — the denominator the capped
      // run's planted_hits divides by.
      val sigs = Dedup.simHash(planted, "text", "doc_id")
      val offset = sys.env.get("GRAFT_PLANTED_OFFSET").map(_.toLong)
        .getOrElse(1000000L)
      val within = sigs.join(
          sigs.select((col("doc_id") - offset).as("doc_id"),
            col("simhash").as("simhash2")), Seq("doc_id"))
        .filter(Dedup.hamming(col("simhash"), col("simhash2")) <= SimHamming)
        .count()
      println(s"[candprobe] t08planted offset=$offset within_radius=$within")
      fields += s""""t08planted_within":$within"""
    }
    if (fams("t08hist")) {
      // bucket-occupancy histogram under the planned blocking — the
      // data that picks maxBucket: for each log2 size class, how many
      // buckets and how much pair mass (sum m(m-1)/2). The cumulative
      // pair mass BELOW a cap is the collision stream that cap admits;
      // the bucket count ABOVE it bounds what the cap drops.
      val n = planted.count()
      val planned = Dedup.simHashPlan(n, SimHamming)
      val b = sys.env.get("GRAFT_T08_BLOCKS").map(_.toInt).getOrElse(planned._1)
      val k = sys.env.get("GRAFT_T08_KEYBLOCKS").map(_.toInt).getOrElse(planned._2)
      println(s"[candprobe] t08hist n=$n blocks=$b keyBlocks=$k")
      val rows = Dedup.simHashCollisionBuckets(planted, "text", "doc_id", b, k)
        .groupBy(col("sizeClass")).agg(
          count(lit(1)).as("buckets"),
          sum(col("m")).as("members"),
          sum(col("m") * (col("m") - 1) / 2).as("pairs"))
        .orderBy(col("sizeClass")).collect()
      rows.foreach { r =>
        println(s"[candprobe] t08hist size<=2^${r.getInt(0)} " +
          s"buckets=${r.getLong(1)} members=${r.getLong(2)} pairs=${r.get(3)}")
      }
      val hist = rows.map(r =>
        s"""{"log2":${r.getInt(0)},"buckets":${r.getLong(1)},"pairs":${r.get(3)}}""")
        .mkString("[", ",", "]")
      fields += s""""t08hist":$hist"""
    }
    if (fams("t08big")) {
      // the fourth-decade row, sized for a corpus whose ANSWER no
      // longer fits one box's spill disk (1000× heaps: ~4.4 B pairs):
      // counts the capped collision stream and the post-filter verify
      // stream WITHOUT the candidate distinct (both pure streams), and
      // measures planted recall by filtering to the id-linked planted
      // subset BEFORE the distinct (≤ one row per planted pair per
      // matching table — bounded). The full answer materialization is
      // an aggregate-cluster-disk operation, same note as the t09
      // 1000× verify arm (r16).
      val n = planted.count()
      val planned = Dedup.simHashPlan(n, SimHamming)
      val b = sys.env.get("GRAFT_T08_BLOCKS").map(_.toInt).getOrElse(planned._1)
      val k = sys.env.get("GRAFT_T08_KEYBLOCKS").map(_.toInt).getOrElse(planned._2)
      val cap = sys.env.get("GRAFT_T08_CAP")
        .map(_.toInt).map(c => if (c == 0) None else Some(c)).getOrElse(planned._3)
      val offset = sys.env.get("GRAFT_PLANTED_OFFSET").map(_.toLong)
        .getOrElse(1000000L)
      println(s"[candprobe] t08big n=$n blocks=$b keyBlocks=$k cap=$cap")
      fields += s""""t08big_blocks":$b,"t08big_keyblocks":$k,"t08big_cap":${cap.getOrElse(0)}"""
      val coll = Dedup.simHashCollisions(planted, "text", "doc_id",
        blocks = b, keyBlocks = k, maxBucket = cap)
      val (nc, wc) = timed(coll)
      emit("t08big", "collisions", nc, wc)
      val filtered = coll.filter(
        Dedup.hamming(col("left_simhash"), col("right_simhash")) <= SimHamming)
      val (nf, wf) = timed(filtered)
      emit("t08big", "verify_stream", nf, wf)
      val (np, wp) = timed(filtered
        .select(least(col("left_id"), col("right_id")).as("l"),
          greatest(col("left_id"), col("right_id")).as("r"))
        .filter(col("r") === col("l") + offset).distinct())
      emit("t08big", "planted_hits", np, wp)
    }
    if (fams("t08exactv")) {
      // the exact hamming-ball answer under the guarantee scheme — the
      // recall denominator for t08plan, countable even where the
      // candidate distinct is not (the hamming filter is pushed below
      // the distinct, so only true pairs reach it)
      val (nv, wv) = timed(Dedup.simHashPairs(planted, "text", "doc_id",
        maxHamming = SimHamming, blocks = SimBlocks))
      emit("t08exact", "verified", nv, wv)
      if (fams("t08dist")) {
        val v = Dedup.simHashPairs(planted, "text", "doc_id",
          maxHamming = SimHamming, blocks = SimBlocks)
        val byd = v.groupBy(col("hamming")).agg(count(lit(1)).as("c"))
          .orderBy(col("hamming")).collect()
          .map(r => s""""${r.get(0)}":${r.getLong(1)}""").mkString("{", ",", "}")
        val plantedHits = v.filter(col("right_id") === col("left_id") + 1000000L)
          .count()
        println(s"[candprobe] t08exact by_hamming=$byd planted_hits=$plantedHits")
        fields += s""""t08exact_by_hamming":$byd,"t08exact_planted_hits":$plantedHits"""
      }
    }
    if (fams("t08raw")) {
      // the enumeration the full query streams through the pushed-down
      // Hamming filter — countable without the candidate distinct, so
      // it scales to corpora where the distinct itself is the bottleneck
      val (nr, wr) = timed(Dedup.simHashCollisions(
        planted, "text", "doc_id", blocks = SimBlocks))
      emit("t08raw", "collisions", nr, wr)
    }
    if (fams("t08onepass")) {
      // the fourth-decade recall cells (r17 verdict item 2) in ONE pass:
      // r17 measured the capped collision stream (2283 s for the count
      // alone), so three separate stage passes (stream count, by-hamming,
      // planted hits) would cost ~2 h — instead one aggregation job over
      // the filtered stream computes all three: groupBy(hamming) with a
      // plain count (stream rows) and a distinct count over the
      // id-linked planted pairs (bounded: ≤ 5 M distinct, nulled
      // elsewhere, so the distinct expand collapses map-side). The full
      // DISTINCT verified count stays out of reach of one box at this
      // decade (~4.4 B pairs × 32 B spill > disk) — the by-hamming
      // stream + the histogram identity bound it instead.
      val n = planted.count()
      val planned = Dedup.simHashPlan(n, SimHamming)
      val b = sys.env.get("GRAFT_T08_BLOCKS").map(_.toInt).getOrElse(planned._1)
      val k = sys.env.get("GRAFT_T08_KEYBLOCKS").map(_.toInt).getOrElse(planned._2)
      val cap = sys.env.get("GRAFT_T08_CAP")
        .map(_.toInt).map(c => if (c == 0) None else Some(c)).getOrElse(planned._3)
      val offset = sys.env.get("GRAFT_PLANTED_OFFSET").map(_.toLong)
        .getOrElse(1000000L)
      println(s"[candprobe] t08onepass n=$n blocks=$b keyBlocks=$k cap=$cap " +
        s"offset=$offset")
      fields += s""""t08onepass_blocks":$b,"t08onepass_keyblocks":$k,"t08onepass_cap":${cap.getOrElse(0)}"""
      val t0 = System.nanoTime()
      val coll = Dedup.simHashCollisions(planted, "text", "doc_id",
        blocks = b, keyBlocks = k, maxBucket = cap)
      val rows = coll
        .withColumn("d", Dedup.hamming(col("left_simhash"), col("right_simhash")))
        .filter(col("d") <= SimHamming)
        .select(col("d"), least(col("left_id"), col("right_id")).as("l"),
          greatest(col("left_id"), col("right_id")).as("r"))
        .groupBy(col("d")).agg(
          count(lit(1)).as("stream_rows"),
          // the distinct key is the LONG left id, not a (l, r) struct:
          // r == l + offset makes l alone identify the planted pair, and
          // a primitive key keeps the distinct's partial aggregate in
          // HashAggregate's fast map — the struct-keyed first attempt
          // planned SortAggregate, whose pre-agg sort of the 14.8 B-row
          // stream spilled the probe box's disk dry at the fourth decade
          count_distinct(when(col("r") === col("l") + offset, col("l")))
            .as("planted"))
        .orderBy(col("d")).collect()
      val wall = math.round((System.nanoTime() - t0) / 1e6) / 1e3
      val byd = rows.map(r =>
        s""""${r.get(0)}":{"stream":${r.getLong(1)},"planted":${r.getLong(2)}}""")
        .mkString("{", ",", "}")
      val streamTotal = rows.map(_.getLong(1)).sum
      val plantedTotal = rows.map(_.getLong(2)).sum
      println(s"[candprobe] t08onepass stream=$streamTotal " +
        s"planted_hits=$plantedTotal wall=${wall}s by_hamming=$byd")
      fields += s""""t08onepass_stream":$streamTotal,"t08onepass_planted_hits":$plantedTotal,"t08onepass_s":$wall,"t08onepass_by_hamming":$byd"""
    }
    if (fams("t13hist")) {
      // bucket-occupancy histogram under the production lshPlan width —
      // the data that picks nearDupPairsAuto's capFactor (the t08hist
      // convention): cumulative pair mass below a cap IS the candidate
      // stream that cap admits
      val embs = graft.queries.LlmQueries.plantedEmbeddings(spark, sfDir)
      val n = embs.count()
      val (bits, tables) = Similarity.lshPlan(n, NearDupThreshold,
        NearDupTargetRecall, NearDupBucketSize)
      println(s"[candprobe] t13hist n=$n bits=$bits tables=$tables")
      val rows = Similarity.lshCollisionBuckets(embs, "vec_id", "embedding",
          Dims, bits, tables)
        .groupBy(col("sizeClass")).agg(
          count(lit(1)).as("buckets"),
          sum(col("m")).as("members"),
          sum(col("m") * (col("m") - 1) / 2).as("pairs"))
        .orderBy(col("sizeClass")).collect()
      rows.foreach { r =>
        println(s"[candprobe] t13hist size<=2^${r.getInt(0)} " +
          s"buckets=${r.getLong(1)} members=${r.getLong(2)} pairs=${r.get(3)}")
      }
      val hist = rows.map(r =>
        s"""{"log2":${r.getInt(0)},"buckets":${r.getLong(1)},"pairs":${r.get(3)}}""")
        .mkString("[", ",", "]")
      fields += s""""t13hist":$hist"""
    }
    if (fams("t13cap")) {
      // capped-mode recall audit (r17 verdict item 4): sampled exhaustive
      // ground truth (the t13recall harness) vs the production lshPlan
      // width under occupancy caps — the measurement behind
      // nearDupPairsAuto's capFactor default. cap = 0 row is the capless
      // reference the capped rows are compared against.
      val embs = graft.queries.LlmQueries.plantedEmbeddings(spark, sfDir)
      val n = embs.count()
      val sampleK = math.max(1L, n / 1000L)
      def inSample(c: org.apache.spark.sql.Column) =
        pmod(xxhash64(c), lit(sampleK)) === 0
      val sVecs = embs.filter(inSample(col("vec_id")))
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val truth = embs.crossJoin(broadcast(sVecs))
        .filter(col("vec_id") =!= col("qid"))
        .filter(Similarity.cosine(col("embedding"), col("qvec"))
          >= NearDupThreshold)
        .select(least(col("qid"), col("vec_id")).as("left_id"),
          greatest(col("qid"), col("vec_id")).as("right_id"))
        .distinct().localCheckpoint(eager = true)
      val tCount = truth.count()
      val (bits, tables) = Similarity.lshPlan(n, NearDupThreshold,
        NearDupTargetRecall, NearDupBucketSize)
      println(s"[candprobe] t13cap n=$n bits=$bits tables=$tables " +
        s"sampleK=$sampleK truth=$tCount")
      fields += s""""t13cap_truth":$tCount,"t13cap_bits":$bits,"t13cap_tables":$tables"""
      val tbs = NearDupBucketSize
      for (factor <- Seq(0, 1, 2, 4, 8, 16, 32)) {
        val cap = if (factor == 0) None else Some((tbs * factor).toInt)
        val cands = Similarity.lshCandidates(
          embs, "vec_id", "embedding", Dims, bits, tables, maxBucket = cap)
        val (nc, wc) = timed(cands)
        val hits = truth.join(
          cands.filter(inSample(col("left_id")) || inSample(col("right_id"))),
          Seq("left_id", "right_id"), "left_semi").count()
        val recall = if (tCount == 0) 1.0
          else math.round(hits.toDouble / tCount * 10000.0) / 10000.0
        println(s"[candprobe] t13cap factor=$factor cap=${cap.getOrElse(0)} " +
          s"candidates=$nc wall=${wc}s hits=$hits recall=$recall")
        fields += s""""t13cap_f$factor":{"cap":${cap.getOrElse(0)},""" +
          s""""candidates":$nc,"candidates_s":$wc,"hits":$hits,"recall":$recall}"""
      }
    }
    if (fams("t13recall")) {
      // t78-style recall audit for the embedding LSH family (round-17
      // verdict item 4): sampled ground truth (every >= threshold
      // neighbor of ~1k sampled vectors, by brute-force cosine against
      // the whole corpus — broadcast of the tiny sample side, one
      // corpus scan per audit) vs the candidate sets three lshPlan
      // operating points generate. Recall here is CANDIDATE recall —
      // the verify stage is exact, so a truth pair missing from the
      // candidates is the only loss mode the sketch has.
      val embs = graft.queries.LlmQueries.plantedEmbeddings(spark, sfDir)
      val n = embs.count()
      val sampleK = math.max(1L, n / 1000L)
      def inSample(c: org.apache.spark.sql.Column) =
        pmod(xxhash64(c), lit(sampleK)) === 0
      val sVecs = embs.filter(inSample(col("vec_id")))
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val truth = embs.crossJoin(broadcast(sVecs))
        .filter(col("vec_id") =!= col("qid"))
        .filter(Similarity.cosine(col("embedding"), col("qvec"))
          >= NearDupThreshold)
        .select(least(col("qid"), col("vec_id")).as("left_id"),
          greatest(col("qid"), col("vec_id")).as("right_id"))
        .distinct().localCheckpoint(eager = true)
      val (tCount, tWall) = timed(truth)
      println(s"[candprobe] t13recall n=$n sampleK=$sampleK truth=$tCount " +
        s"wall=${tWall}s")
      fields += s""""t13recall_truth":$tCount"""
      for (tbs <- Seq(32L, 64L, 128L, 256L)) {
        val (bits, tables) = Similarity.lshPlan(n, NearDupThreshold,
          NearDupTargetRecall, tbs)
        val cands = Similarity.lshCandidates(
          embs, "vec_id", "embedding", Dims, bits, tables)
        val (nc, wc) = timed(cands)
        val hits = truth.join(
          cands.filter(inSample(col("left_id")) || inSample(col("right_id"))),
          Seq("left_id", "right_id"), "left_semi").count()
        val recall = if (tCount == 0) 1.0
          else math.round(hits.toDouble / tCount * 10000.0) / 10000.0
        println(s"[candprobe] t13recall tbs=$tbs bits=$bits tables=$tables " +
          s"candidates=$nc wall=${wc}s hits=$hits recall=$recall")
        fields += s""""t13recall_tbs$tbs":{"bits":$bits,"tables":$tables,""" +
          s""""candidates":$nc,"candidates_s":$wc,"hits":$hits,"recall":$recall}"""
      }
    }
    if (fams("t13budget")) {
      // the fourth-decade budgeted row for the embedding LSH family
      // (r18 verdict item 3) — the PROBE_t08_r18 discipline applied to
      // [[Similarity.nearDupPairsBudgeted]]'s machinery: (1) ONE
      // histogram aggregate under the production lshPlan width sizes
      // the cap for the per-vec stream budget (GRAFT_T13_BUDGET,
      // default the production 1024); the histogram identity — 2 ×
      // cumulative pair mass at classes ≤ log2 cap — IS the admitted
      // ordered candidate stream, exactly as validated for t08 in r18;
      // (2) planted recall is measured on the id-linked planted subset
      // of the gated pair enumeration BEFORE the candidate distinct
      // (bounded ≤ tables rows per planted pair), then the exact
      // cosine verify. The full candidate distinct at this decade is
      // an aggregate-cluster operation — same adjudication as t08big.
      val embs = graft.queries.LlmQueries.plantedEmbeddings(spark, sfDir)
      val n = embs.count()
      val (bits, tables) = Similarity.lshPlan(n, NearDupThreshold,
        NearDupTargetRecall, NearDupBucketSize)
      val budget = sys.env.get("GRAFT_T13_BUDGET").map(_.toDouble)
        .getOrElse(1024.0)
      val offset = sys.env.get("GRAFT_PLANTED_OFFSET").map(_.toLong)
        .getOrElse(1000000L)
      println(s"[candprobe] t13budget n=$n bits=$bits tables=$tables " +
        s"budget=$budget/vec offset=$offset")
      val th0 = System.nanoTime()
      val histRows = Similarity.lshCollisionBuckets(embs, "vec_id",
          "embedding", Dims, bits, tables)
        .groupBy(col("sizeClass")).agg(
          count(lit(1)).as("buckets"),
          sum(col("m")).as("members"),
          sum(col("m") * (col("m") - 1) / 2).as("pairs"))
        .orderBy(col("sizeClass")).collect()
      val histWall = math.round((System.nanoTime() - th0) / 1e6) / 1e3
      histRows.foreach { r =>
        println(s"[candprobe] t13budget size<=2^${r.getInt(0)} " +
          s"buckets=${r.getLong(1)} members=${r.getLong(2)} pairs=${r.get(3)}")
      }
      val histJson = histRows.map(r =>
        s"""{"log2":${r.getInt(0)},"buckets":${r.getLong(1)},"pairs":${r.get(3)}}""")
        .mkString("[", ",", "]")
      val hist = histRows.map(r => (r.getInt(0), r.getDouble(3).toLong)).toSeq
      val cap = Dedup.capFromHistogram(hist, n, budget)
      val lim = cap.map(Integer.numberOfTrailingZeros).getOrElse(Int.MaxValue)
      val admitted = 2L * hist.filter(_._1 <= lim).map(_._2).sum
      val budgetRows = (budget * n).toLong
      println(s"[candprobe] t13budget cap=${cap.getOrElse(0)} " +
        s"admitted_stream=$admitted budget_rows=$budgetRows hist_s=$histWall")
      fields += s""""t13budget_hist":$histJson,"t13budget_n":$n,""" +
        s""""t13budget_bits":$bits,"t13budget_tables":$tables,""" +
        s""""t13budget_budget":$budget,"t13budget_cap":${cap.getOrElse(0)},""" +
        s""""t13budget_admitted":$admitted,"t13budget_budget_rows":$budgetRows,""" +
        s""""t13budget_hist_s":$histWall"""
      if (!sys.env.contains("GRAFT_T13_SKIP_RECALL")) {
        // gated enumeration (the [[Similarity.lshCandidates]] shape,
        // replicated so the planted filter lands BEFORE the distinct)
        val bucketed = embs.select(col("vec_id").as("id"),
          explode(Similarity.lshBuckets(col("embedding"), Dims, bits, tables))
            .as("tb"))
          .select(col("id"), col("tb.tbl").as("tbl"),
            col("tb.bucket").as("bucket"))
        val gated = cap match {
          case Some(c) =>
            val small = bucketed.groupBy(col("tbl"), col("bucket"))
              .agg(count(lit(1)).as("__bn"))
              .filter(col("__bn") <= c)
              .select(col("tbl"), col("bucket"))
            bucketed.join(small.hint("merge"), Seq("tbl", "bucket"),
                "left_semi")
              .repartition(col("tbl"), col("bucket"))
          case None => bucketed
        }
        val plantedCand = graft.operators.SaltedSelfJoin
          .pairs(gated, Seq("tbl", "bucket"), "id",
            maxBucketHint = cap.map(_.toLong))
          .select(least(col("left_id"), col("right_id")).as("l"),
            greatest(col("left_id"), col("right_id")).as("r"))
          .filter(col("r") === col("l") + offset)
          .distinct()
        val vecs = embs.select(col("vec_id"), col("embedding"))
        val verified = plantedCand
          .join(vecs.select(col("vec_id").as("l"), col("embedding").as("lv")),
            Seq("l"))
          .join(vecs.select(col("vec_id").as("r"), col("embedding").as("rv")),
            Seq("r"))
          .filter(round(Similarity.cosine(col("lv"), col("rv")), 4)
            >= NearDupThreshold)
        val (hits, hitsWall) = timed(verified)
        // denominator: planted pairs actually within the threshold
        // (one linear id-offset self-join — the t08planted convention)
        val within = embs.join(
            embs.select((col("vec_id") - offset).as("vec_id"),
              col("embedding").as("e2")), Seq("vec_id"))
          .filter(round(Similarity.cosine(col("embedding"), col("e2")), 4)
            >= NearDupThreshold)
          .count()
        val recall = if (within == 0) 1.0
          else math.round(hits.toDouble / within * 10000.0) / 10000.0
        println(s"[candprobe] t13budget planted_hits=$hits within=$within " +
          s"recall=$recall wall=${hitsWall}s")
        fields += s""""t13budget_planted_hits":$hits,""" +
          s""""t13budget_planted_within":$within,""" +
          s""""t13budget_recall":$recall,"t13budget_recall_s":$hitsWall"""
      }
    }
    if (fams("t13")) {
      val embs = graft.queries.LlmQueries.plantedEmbeddings(spark, sfDir)
      val n = embs.count()
      val (bits, tables) = Similarity.lshPlan(n, NearDupThreshold,
        NearDupTargetRecall, NearDupBucketSize)
      println(s"[candprobe] t13 lshPlan n=$n bits=$bits tables=$tables")
      val (nc, wc) = timed(Similarity.lshCandidates(
        embs, "vec_id", "embedding", Dims, bits, tables))
      emit("t13", "candidates", nc, wc)
      val (nv, wv) = timed(Similarity.nearDupPairsAuto(embs, "vec_id",
        "embedding", dims = Dims, threshold = NearDupThreshold,
        targetRecall = NearDupTargetRecall,
        targetBucketSize = NearDupBucketSize))
      emit("t13", "verified", nv, wv)
    }
    println(s"""{"metric":"candidate_probe","sf":"$sfDir",${fields.mkString(",")}}""")
    spark.stop()
  }
}
