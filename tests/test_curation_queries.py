"""Training-data curation queries (rounds 4-5): Gopher repetition
rules, PII scrub, stratified domain-mix sampling, corpus-unigram
quality score, and the n-gram LSH bucket cap. Value parity vs DuckDB
is the driver gate; here we pin the semantics on hand-built rows and
the scale-critical plan shapes."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from python_crawler_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


# ------------------------------------------------------------- semantics


def test_gopher_repetition_flags_degenerate_docs(spark, tmp_path):
    rows = [
        # 'spam spam spam spam': 1 unique word of 4, top bigram 3/3
        (1, "spam spam spam spam", "en", "s", 19),
        # all-distinct words, every bigram unique
        (2, "alpha beta gamma delta", "en", "s", 22),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["doc_id"]: r
        for r in QUERIES["gopher_repetition"](spark, str(tmp_path)).collect()
    }
    assert got[1]["dup_word_frac"] == 0.75
    assert got[1]["top_bigram_frac"] == 1.0
    assert got[1]["keep"] is False
    assert got[2]["dup_word_frac"] == 0.0
    assert got[2]["top_bigram_frac"] == 0.3333  # 1/3, all bigrams tie at 1
    assert got[2]["keep"] is False  # 0.3333 > 0.18 threshold
    # a long doc with no repeated bigram passes
    rows.append((3, " ".join(f"w{i}" for i in range(40)), "en", "s", 0))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["doc_id"]: r
        for r in QUERIES["gopher_repetition"](spark, str(tmp_path)).collect()
    }
    assert got[3]["keep"] is True


def test_pii_scrub_counts_and_redacts(spark):
    out = QUERIES["pii_scrub"](spark, SF_DIR)
    hit = out.filter(F.col("doc_id") % 5 == 0)
    miss = out.filter(F.col("doc_id") % 5 != 0)
    assert hit.filter((F.col("n_emails") != 1) | (F.col("n_phones") != 1)).count() == 0
    assert miss.filter((F.col("n_emails") != 0) | (F.col("n_phones") != 0)).count() == 0
    # redaction replaced the synthetic suffix; no raw email survives
    assert hit.filter(~F.col("tail_redacted").contains("<PHONE>")).count() == 0
    assert hit.filter(F.col("tail_redacted").rlike("@example[.]com")).count() == 0


def test_domain_mix_sample_quota_and_determinism(spark):
    out = QUERIES["domain_mix_sample"](spark, SF_DIR)
    per = out.groupBy("source").count().collect()
    assert all(r["count"] <= 5 for r in per)
    # deterministic across runs (md5 order, not a seeded RNG)
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, QUERIES["domain_mix_sample"](spark, SF_DIR).collect()))
    assert a == b


def test_unigram_logprob_orders_common_vs_rare(spark, tmp_path):
    rows = [
        (1, "the the the the", "en", "s", 0),  # most common token only
        (2, "zzzquux the the the", "en", "s", 0),  # one rare token
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["doc_id"]: r["avg_logprob"]
        for r in QUERIES["unigram_logprob"](spark, str(tmp_path)).collect()
    }
    assert got[1] > got[2]  # the rare-token doc scores lower


# ------------------------------------------------------------ plan shapes


def test_pii_scrub_plan_is_pure_codegen_map(spark):
    plan = _plan(QUERIES["pii_scrub"](spark, SF_DIR))
    assert "Exchange" not in plan  # no shuffle: embarrassingly parallel
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "* Project" in plan  # '*' = inside a WholeStageCodegen span


def test_unigram_logprob_vocab_join_not_forced_broadcast(spark):
    """VERDICT r4 #1: an open-web vocab is an unbounded aggregate, so
    the token->vocab join must carry NO broadcast hint (a hint forces
    the broadcast at any size and OOMs at 100 TB). With auto-broadcast
    disabled, only a hint could still produce a BroadcastHashJoin —
    assert the vocab join degrades to a shuffle join while the 1-row
    corpus total stays deliberately hinted."""
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(QUERIES["unigram_logprob"](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "BroadcastNestedLoopJoin" in plan  # the hinted 1-row total


def test_gopher_repetition_no_cartesian_and_partial_agg(spark):
    plan = _plan(QUERIES["gopher_repetition"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # bigram mode computed via two-stage agg (map-side partial present)
    assert "partial_count" in plan or "partial_max" in plan


def test_domain_mix_sample_two_stage_salted_windows(spark):
    """VERDICT r4 #2: the top-k must never run a window partitioned by
    raw source alone over the full input — stage 1 is keyed by
    (source, _salt) so a hot source splits across _MIX_SALTS window
    partitions; stage 2's per-source window only ever sees the
    <= k*n_salts stage-1 survivors."""
    plan = _plan(QUERIES["domain_mix_sample"](spark, SF_DIR))
    assert plan.count("Window") >= 2  # two-stage rank
    assert "_salt" in plan  # stage-1 partition key carries the salt
    # two physical Exchanges (salt shuffle + survivor shuffle); the
    # formatted plan names each node twice (tree line + detail block)
    assert plan.count("Exchange") <= 4


def test_domain_mix_sample_skewed_equals_single_window(spark, tmp_path):
    """On a skewed fixture (80% of docs on one CDN-like source) the
    salted two-stage top-k must return EXACTLY the single-window
    result — the salt changes the plan, never the answer."""
    rows = [
        (i, f"text {i}", "en", "cdn.example" if i < 400 else f"s{i % 7}", 10)
        for i in range(500)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = sorted(
        map(tuple, QUERIES["domain_mix_sample"](spark, str(tmp_path)).collect())
    )
    docs = spark.read.parquet(f"{tmp_path}/documents.parquet")
    w = Window.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")))
    ref = sorted(
        map(
            tuple,
            docs.withColumn("rk", F.row_number().over(w))
            .filter("rk <= 5")
            .select("source", "doc_id", "rk")
            .collect(),
        )
    )
    assert got == ref


def test_ngram_bucket_cap_drops_boilerplate_not_real_pairs(spark, tmp_path):
    """VERDICT r4 #3: k docs sharing a boilerplate gram set must not
    self-join into O(k^2) candidate pairs. 70 identical docs (> cap
    64) overflow all 3 band buckets and emit ZERO pairs, while a
    genuine near-dup pair in a small bucket is still found; the
    dropped buckets stay auditable via ngram_band_overflow."""
    boiler = "the quick brown fox jumps over a lazy dog again and again"
    base = " ".join(f"w{i}" for i in range(11))
    rows = [(i, boiler, "en", "s", 1) for i in range(70)]
    rows += [
        (1000, base + " theta", "en", "s", 1),  # 12 words, 10 grams
        (1001, base + " iota", "en", "s", 1),  # J = 9/11 ~ 0.818 >= 0.8
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    pairs = QUERIES["ngram_jaccard_pairs"](spark, str(tmp_path)).collect()
    assert {(r["a"], r["b"]) for r in pairs} == {(1000, 1001)}
    over = QUERIES["ngram_band_overflow"](spark, str(tmp_path)).collect()
    assert len(over) == 3  # one oversized bucket per band
    assert all(r["bucket_size"] == 70 and r["min_doc"] == 0 for r in over)


def test_gopher_repetition_single_token_doc_excluded(spark, tmp_path):
    """A 1-token doc has no bigram; both engines drop it (Spark's
    sequence(1, 0) DESCENDS — without the filter it would fabricate
    junk bigram indices where DuckDB's range(2, 2) is empty)."""
    rows = [
        (1, "solo", "en", "s", 4),
        (2, "two words here now", "en", "s", 18),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = QUERIES["gopher_repetition"](spark, str(tmp_path)).collect()
    assert [r["doc_id"] for r in got] == [2]


def test_decontaminate_flags_leaked_docs(spark, tmp_path):
    """Round-5 decontamination semantics on a hand-built corpus: the
    benchmark doc (id 0, %97==0) and the leaked doc (id 31, %31==0)
    both carry the sentinel 8-gram, so 31 is contaminated; a doc
    sharing no 8-gram with the benchmark is clean; the benchmark doc
    itself never appears in the output."""
    clean = " ".join(f"w{i}" for i in range(20))
    rows = [
        (0, "bench text one two three four five six seven", "en", "s", 0),
        (31, clean, "en", "s", 0),  # %31==0 -> sentinel appended
        (5, clean, "en", "s", 0),  # same base text, no sentinel
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {r["doc_id"]: r for r in QUERIES["decontaminate"](spark, str(tmp_path)).collect()}
    assert set(got) == {31, 5}  # benchmark doc 0 excluded from output
    assert got[31]["contaminated"] is True and got[31]["n_hits"] >= 1
    assert got[5]["contaminated"] is False and got[5]["n_hits"] == 0


def test_decontaminate_benchmark_side_stays_broadcast(spark):
    """The benchmark shingle set is small by construction (eval suites,
    not corpora), so its hint must survive auto-broadcast being off —
    the 100-TB train side is never shuffled for the overlap join."""
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(QUERIES["decontaminate"](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert "BroadcastHashJoin" in plan  # the hinted benchmark set
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_chunk_dedup_counts_shared_chunks(spark, tmp_path):
    """Two docs sharing one exact 10-word chunk are both flagged with
    the right fraction; a doc with no shared chunk reports 0.0. Also
    pins the ceil(n/10) chunking: 25 words -> 3 chunks."""
    shared = " ".join(f"s{i}" for i in range(10))
    uniq_a = " ".join(f"a{i}" for i in range(15))  # 25 words total -> 3 chunks
    uniq_b = " ".join(f"b{i}" for i in range(10))
    uniq_c = " ".join(f"c{i}" for i in range(12))
    rows = [
        (1, f"{shared} {uniq_a}", "en", "s", 0),
        (2, f"{shared} {uniq_b}", "en", "s", 0),
        (3, uniq_c, "en", "s", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {r["doc_id"]: r for r in QUERIES["chunk_dedup"](spark, str(tmp_path)).collect()}
    assert got[1]["n_chunks"] == 3 and got[1]["dup_chunk_frac"] == 0.3333
    assert got[2]["n_chunks"] == 2 and got[2]["dup_chunk_frac"] == 0.5
    assert got[3]["n_chunks"] == 2 and got[3]["dup_chunk_frac"] == 0.0
    assert got[1]["keep"] is True and got[3]["keep"] is True
    # two %7==0 docs with identical text: boilerplate chunk AND tail
    # chunk both duplicate -> frac 1.0, dropped
    rows.append((7, "x", "en", "s", 0))
    rows.append((14, "x", "en", "s", 0))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {r["doc_id"]: r for r in QUERIES["chunk_dedup"](spark, str(tmp_path)).collect()}
    assert got[7]["dup_chunk_frac"] == 1.0 and got[7]["keep"] is False


def test_chunk_dedup_plan_partial_agg_no_python(spark):
    """The occurrence count must partially aggregate map-side (the
    groupBy key is the chunk text) and the whole pipeline stays JVM —
    chunking is transform/slice, not a UDF."""
    plan = _plan(QUERIES["chunk_dedup"](spark, SF_DIR))
    assert "partial_count" in plan  # map-side combine before the shuffle
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_semdedup_assigns_and_drops_within_cluster(spark, tmp_path):
    """Hand-built geometry: centroids 0-3 are the R^4 basis, 4-7 are
    mixed directions; vectors 10/11 point along e0 so they land in
    cluster 0 and both duplicate against earlier members (the centroid
    itself and each other); every cluster's lowest-id member is kept."""
    import numpy as np

    basis = np.eye(4, dtype=np.float32)
    mixed = np.array(
        [[1, 1, 0, 0], [0, 1, 1, 0], [0, 0, 1, 1], [1, 0, 0, 1]], dtype=np.float32
    )
    rows = [(i, [float(x) for x in basis[i]], 0) for i in range(4)]
    rows += [(4 + i, [float(x) for x in mixed[i]], 0) for i in range(4)]
    rows.append((10, [2.0, 0.1, 0.0, 0.0], 1))
    rows.append((11, [4.0, 0.2, 0.0, 0.0], 1))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    got = {r["vec_id"]: r for r in QUERIES["semdedup"](spark, str(tmp_path)).collect()}
    assert got[10]["cluster"] == 0 and got[11]["cluster"] == 0
    assert got[10]["is_dup"] is True and got[11]["is_dup"] is True
    assert got[0]["is_dup"] is False  # lowest id in cluster 0 is kept
    for cid in range(1, 8):  # each centroid alone in its own cluster
        assert got[cid]["cluster"] == cid and got[cid]["is_dup"] is False


def test_semdedup_plan_broadcast_codebook_equi_cluster_join(spark):
    """The centroid codebook fan-out must stay a broadcast (it is a
    config-sized constant) even with auto-broadcast off, and the
    within-cluster pairing must be an equi-join on the cluster id —
    never an unpruned cartesian over the corpus."""
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(QUERIES["semdedup"](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert "BroadcastNestedLoopJoin" in plan  # the hinted 8-row codebook
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan  # cluster join
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_shard_pack_conserves_items_and_flags_consistently(spark):
    """Every item lands in exactly one of the 32 shards (counts
    conserve vs the corpus), and the oversized flag is exactly the
    >1.2x-of-mean predicate on the emitted skew ratio."""
    rows = QUERIES["shard_pack"](spark, SF_DIR).collect()
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert sum(r["n_items"] for r in rows) == n_docs
    assert all(0 <= r["shard"] < 32 for r in rows)
    mean = sum(r["shard_bytes"] for r in rows) / len(rows)
    for r in rows:
        assert abs(r["skew_ratio"] - r["shard_bytes"] / mean) < 1e-3
        assert r["oversized"] == (r["skew_ratio"] > 1.2)


def test_shard_pack_plan_partial_agg_broadcast_mean(spark):
    """Shard rollup aggregates map-side (n_shards rows per partition
    cross the wire); the mean joins as a broadcast single row — never
    a driver count(), never a cartesian over data."""
    plan = _plan(QUERIES["shard_pack"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan or "Partial" in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row mean, by design
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_split_leakage_audit_semantics(spark, tmp_path):
    """Hand-built corpus: a val doc duplicated in train is leaked; a
    val doc whose only duplicate is another val doc is NOT (val-val
    never crosses the split); unique and empty-text val docs are
    unleaked (no signature => no match)."""
    import hashlib

    def split_of(i: int) -> str:
        h = int(hashlib.md5(f"{i}:split".encode()).hexdigest()[:15], 16)
        return "val" if h % 20 == 0 else "train"

    val_ids = [i for i in range(400) if split_of(i) == "val"][:4]
    train_ids = [i for i in range(400) if split_of(i) == "train"][:2]
    assert len(val_ids) == 4 and len(train_ids) == 2
    leaked_text = "alpha beta gamma delta"
    valdup_text = "epsilon zeta eta theta"
    rows = [
        (val_ids[0], leaked_text, "en", "s", 0),    # dup in train -> leaked
        (val_ids[1], valdup_text, "en", "s", 0),    # dup only in val
        (val_ids[2], valdup_text, "en", "s", 0),    # dup only in val
        (val_ids[3], "", "en", "s", 0),             # empty: no signature
        (train_ids[0], leaked_text, "en", "s", 0),
        (train_ids[1], "iota kappa lambda mu", "en", "s", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r["doc_id"]: r["leaked"]
        for r in QUERIES["split_leakage_audit"](spark, str(tmp_path)).collect()
    }
    assert set(got) == set(val_ids)  # exactly the val slice gets a verdict
    assert got[val_ids[0]] is True
    assert got[val_ids[1]] is False and got[val_ids[2]] is False
    assert got[val_ids[3]] is False


def test_split_leakage_plan_equi_joins_only(spark):
    """The audit joins on the 4-hash signature key — equi-joins only,
    never doc x doc, no Python stage."""
    plan = _plan(QUERIES["split_leakage_audit"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_minhash_recall_audit_recovers_and_attributes_misses(spark, tmp_path):
    """A genuine near-dup pair is ground truth AND recovered (identical
    gram sets collide on every band); a boilerplate cluster larger
    than the bucket cap stays ground truth but UNRECOVERED — the audit
    surfaces exactly the pairs the cap routed away from LSH."""
    base = " ".join(f"tok{i}" for i in range(40))
    near = base + " tail"  # J = 38/41 ~ 0.93
    boiler = " ".join(f"b{i}" for i in range(20))
    rows = [(1, base, "en", "s", 0), (2, near, "en", "s", 0)]
    rows += [(100 + i, boiler, "en", "s", 0) for i in range(70)]  # cap is 64
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = QUERIES["minhash_recall_audit"](spark, str(tmp_path)).collect()
    got = {(r["a"], r["b"]): r for r in out}
    assert got[(1, 2)]["recovered"] is True
    assert got[(1, 2)]["jaccard"] >= 0.8
    boiler_pairs = [r for (a, b), r in got.items() if a >= 100 and b >= 100]
    assert len(boiler_pairs) == 70 * 69 // 2  # all truth pairs present
    assert all(r["jaccard"] == 1.0 and r["recovered"] is False for r in boiler_pairs)


def test_minhash_recall_audit_plan_equi_joins_only(spark):
    """Truth and candidate sides are both equi-joins (gram key / band
    key) — never doc x doc, no Python stage."""
    plan = _plan(QUERIES["minhash_recall_audit"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
