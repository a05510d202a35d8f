"""Subpartitioned window keys for the en-dominance skew answer
(VERDICT r4 item 3): `pack_sequences` and `training_mix` must window over
(lang, sub) — sub a 16-way md5 hash prefix of doc_id — never bare lang,
which funnels ~half a real crawl through one window partition."""

import pyspark.sql.functions as F

from activestorage_ocr_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _final_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]


class TestSubpartitionedWindows:
    def test_pack_sequences_window_key_includes_hash_sub(self, spark):
        df = QUERIES["pack_sequences"](spark, SF)
        plan = _final_plan(df)
        # every Window node must partition by BOTH lang and the sub key
        win_lines = [ln for ln in plan.splitlines() if "windowspecdefinition(" in ln]
        assert win_lines, "expected a Window node in the plan"
        for ln in win_lines:
            assert "lang" in ln and "sub" in ln, f"window not subpartitioned: {ln}"

    def test_training_mix_window_key_includes_hash_sub(self, spark):
        df = QUERIES["training_mix"](spark, SF)
        plan = _final_plan(df)
        win_lines = [ln for ln in plan.splitlines() if "windowspecdefinition(" in ln]
        assert win_lines, "expected a Window node in the plan"
        for ln in win_lines:
            assert "lang" in ln and "sub" in ln, f"window not subpartitioned: {ln}"

    def test_sub_key_actually_spreads(self, spark):
        # the md5 prefix must populate all 16 subpartitions at test scale —
        # a constant or near-constant sub column would silently restore the
        # bare-lang funnel while still passing the plan-string check
        for name in ("pack_sequences", "training_mix"):
            df = QUERIES[name](spark, SF)
            n_subs = df.select("sub").distinct().count()
            assert n_subs == 16, f"{name}: sub key collapsed to {n_subs} values"

    def test_training_mix_pro_rata_quota_fills(self, spark):
        # each (lang, sub) slice fills independently against quota/16: the
        # running total BEFORE any selected doc stays under the slice quota,
        # and every slice with enough tokens has at least one selected doc
        rows = QUERIES["training_mix"](spark, SF).collect()
        quota = {"en": 1250, "de": 500}
        by_slice = {}
        for r in rows:
            by_slice.setdefault((r.lang, r.sub), []).append(r)
        assert len(by_slice) > 16
        for (lang, _sub), docs in by_slice.items():
            q = quota.get(lang, 200)
            for r in docs:
                assert r.selected == (r.cum_tokens_before < q)

    def test_pack_bins_respect_budget_per_sub(self, spark):
        # bin_offset is always < 2048 and bins are scoped to (lang, sub):
        # offsets restart from the doc's own running sum inside its slice
        rows = QUERIES["pack_sequences"](spark, SF).collect()
        assert rows
        for r in rows:
            assert 0 <= r.bin_offset < 2048
            assert r.bin_id >= 0


class TestRobotsRfc9309:
    # r5 upgrade: wildcards, $ anchors, Allow rules, longest-match
    # precedence (most specific rule wins; Allow wins length ties)

    def test_rule_shapes_fire(self, spark):
        rows = {
            (r.host, r.path): r.blocked
            for r in QUERIES["robots_filter"](spark, SF).collect()
        }
        # short prefix blocks /p/1 AND /p/13 on a host_id%3==0 host...
        assert rows[("site3.example", "/p/1")] is True
        assert rows[("site3.example", "/p/13")] is True
        # ...but the LONGER Allow '/p/12' carves that one path back in
        assert rows[("site3.example", "/p/12")] is False
        # $ anchor: exactly /p/2, not /p/20
        assert rows[("site0.example", "/p/2")] is True
        assert rows[("site0.example", "/p/20")] is False
        # host without the anchor rule keeps /p/2
        assert rows[("site2.example", "/p/2")] is False
        # mid-pattern wildcard /q/*/x on host_id%4==0 hosts only
        q4 = [b for (h, p), b in rows.items()
              if h == "site4.example" and p.startswith("/q/")]
        q1 = [b for (h, p), b in rows.items()
              if h == "site1.example" and p.startswith("/q/")]
        assert q4 and all(q4)
        assert q1 and not any(q1)
        # /admin still blocks everywhere
        admin = [b for (h, p), b in rows.items() if p.startswith("/admin")]
        assert admin and all(admin)


class TestBpePacking:
    # round 6: pack_sequences_bpe — same subpartitioned-window machinery,
    # budgeted in real BPE subword units instead of whitespace tokens

    def test_window_key_includes_hash_sub(self, spark):
        df = QUERIES["pack_sequences_bpe"](spark, SF)
        plan = _final_plan(df)
        win_lines = [ln for ln in plan.splitlines() if "windowspecdefinition(" in ln]
        assert win_lines, "expected a Window node in the plan"
        for ln in win_lines:
            assert "lang" in ln and "sub" in ln, f"window not subpartitioned: {ln}"

    def test_plan_stays_jvm_side_one_exchange(self, spark):
        # the 64-merge chain must compile to JVM replace expressions: one
        # scan, ONE exchange (the window), zero Python nodes
        df = QUERIES["pack_sequences_bpe"](spark, SF)
        plan = _final_plan(df)
        assert plan.count("Exchange") == 1, plan
        assert "Python" not in plan, "BPE chain fell out of the JVM"

    def test_bpe_budget_differs_from_heuristic(self, spark):
        # the whole point: pieces != words, so per-doc budgets differ (the
        # words-to-pieces ratio varies by document)
        b = {r.doc_id: r.n_tokens
             for r in QUERIES["pack_sequences_bpe"](spark, SF).collect()}
        h = {r.doc_id: r.n_tokens
             for r in QUERIES["pack_sequences"](spark, SF).collect()}
        assert set(b) == set(h)
        differing = sum(1 for d in b if b[d] != h[d])
        assert differing / len(b) > 0.9, f"only {differing}/{len(b)} differ"
        # NOTE: no b >= h invariant — the BPE normalizer deletes
        # punctuation-only tokens the whitespace heuristic counts, so BPE
        # CAN undercut the heuristic on punctuation-heavy text
