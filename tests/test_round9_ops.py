"""Round-9 additions (VERDICT r8 / ADVICE r8): parameterized SimHash
banding, the `match_events` CEP API + hot-user cap, the asymmetric
containment join, real BPE token counting, and the cross-engine
float-determinism hardening. Correctness vs DuckDB is covered by the
oracle gate; these tests pin the semantic invariants and scale
postures the oracles can't express.
"""

from __future__ import annotations

import itertools

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_DIR
from wd2duckdb_spark.plans import plan_summary

# ---------------------------------------------------------------------------
# SimHash banding parameterization (VERDICT r8 item 1)
# ---------------------------------------------------------------------------


def test_simhash_pigeonhole_lemma_generalized():
    """The zero-false-negative claim for ANY (blocks, hamming): for
    any signature and any ≤hamming flipped bits, at least one probe
    table's combined key (a concatenation of blocks−hamming blocks)
    is untouched. Hypothesis searches for a counterexample across the
    layouts the engine registers plus uneven-width ones."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from wd2duckdb_spark.functions.dedup import (
        simhash_block_widths,
        simhash_tables,
    )

    layouts = [(60, 4, 3), (60, 6, 3), (60, 5, 2), (59, 7, 3), (48, 6, 2)]

    def combo_key(sig: int, combo, widths, offsets) -> int:
        key = 0
        for b in combo:
            key = (key << widths[b]) | ((sig >> offsets[b]) & ((1 << widths[b]) - 1))
        return key

    @settings(max_examples=400, deadline=None)
    @given(
        layout=st.sampled_from(layouts),
        sig=st.integers(min_value=0, max_value=(1 << 63) - 1),
        data=st.data(),
    )
    def prop(layout, sig, data):
        bits, blocks, hamming = layout
        sig &= (1 << bits) - 1
        flips = data.draw(
            st.sets(
                st.integers(min_value=0, max_value=bits - 1),
                min_size=0,
                max_size=hamming,
            )
        )
        other = sig
        for f in flips:
            other ^= 1 << f
        widths = simhash_block_widths(bits, blocks)
        offsets = [sum(widths[:i]) for i in range(blocks)]
        assert any(
            combo_key(sig, c, widths, offsets)
            == combo_key(other, c, widths, offsets)
            for c in simhash_tables(blocks, hamming)
        )

    prop()


def test_simhash_block_widths_cover_signature():
    from wd2duckdb_spark.functions.dedup import simhash_block_widths

    for bits, blocks in [(60, 4), (60, 6), (59, 7), (1, 1), (63, 9)]:
        w = simhash_block_widths(bits, blocks)
        assert sum(w) == bits and len(w) == blocks
        assert max(w) - min(w) <= 1


def test_simhash_wide_equals_narrow_equals_bruteforce(spark):
    """All valid layouts produce the same EXACT answer set, and that
    set is the brute-force all-pairs Hamming ≤ 3 set."""
    from wd2duckdb_spark.functions.dedup import (
        SIMHASH_HAMMING,
        _simhash_sig,
        simhash_pairs,
    )

    sig = _simhash_sig(spark, SF_DIR)
    narrow = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in simhash_pairs(sig, blocks=4, hamming=3).collect()
    }
    wide = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in simhash_pairs(sig, blocks=6, hamming=3).collect()
    }
    assert narrow == wide and narrow
    sigs = {r["doc_id"]: r["sim"] for r in sig.collect()}
    brute = {
        (a, b): bin(sigs[a] ^ sigs[b]).count("1")
        for a, b in itertools.combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= SIMHASH_HAMMING
    }
    assert narrow == brute


def test_simhash_wide_keys_cut_candidate_volume(spark):
    """The point of the wide layout: on the same signatures, 30-bit
    combined keys admit no more candidates than 15-bit single-block
    keys (strictly fewer whenever random collisions exist at all).
    True pairs are a subset of both, so equality would mean the
    narrow keys had zero random collisions at this corpus size."""
    from wd2duckdb_spark.functions.dedup import (
        _simhash_sig,
        simhash_candidates,
    )

    sig = _simhash_sig(spark, SF_DIR)
    narrow = simhash_candidates(sig, blocks=4, hamming=3).count()
    wide = simhash_candidates(sig, blocks=6, hamming=3).count()
    assert wide <= narrow


def test_simhash_banding_validation():
    from wd2duckdb_spark.functions.dedup import (
        simhash_pairs,
        simhash_signatures,
    )

    with pytest.raises(ValueError, match="hamming"):
        simhash_pairs(None, blocks=4, hamming=4)
    with pytest.raises(ValueError, match="blocks"):
        simhash_pairs(None, bits=60, blocks=61, hamming=3)
    with pytest.raises(ValueError, match="bits"):
        simhash_pairs(None, bits=64, blocks=4, hamming=3)
    with pytest.raises(ValueError, match="table"):
        simhash_pairs(None, bits=60, blocks=20, hamming=10)
    with pytest.raises(ValueError, match="bits"):
        simhash_signatures(None, bits=61)


def test_simhash_pairs_plan_stays_jvm_side(spark):
    """The probe-table explode is a Generate over a Column array —
    no Python anywhere, and the self-join is an equi-join (never a
    nested loop)."""
    from wd2duckdb_spark.functions.dedup import q_simhash_wide_pairs

    s = plan_summary(q_simhash_wide_pairs(spark, SF_DIR))
    assert s["python_udf"] == 0 and s["map_in_pandas"] == 0
    assert s["nested_loop_join"] == 0

# ---------------------------------------------------------------------------
# match_events CEP API (VERDICT r8 items 3+5)
# ---------------------------------------------------------------------------


def test_match_events_validation():
    from wd2duckdb_spark.operators.analytics import EVENT_CODES, match_events

    with pytest.raises(ValueError, match="non-empty"):
        match_events(None, "v", {})
    with pytest.raises(ValueError, match="single lowercase"):
        match_events(None, "v", {"view": "V"})
    with pytest.raises(ValueError, match="duplicate"):
        match_events(None, "v", {"view": "v", "visit": "v"})
    with pytest.raises(ValueError, match="reserved"):
        match_events(None, "v", {"other": "o"})
    with pytest.raises(ValueError, match="lookaround|not portable"):
        match_events(None, "v(?!p)", EVENT_CODES)
    with pytest.raises(ValueError, match="backreference"):
        match_events(None, r"(v)\1", EVENT_CODES)
    with pytest.raises(ValueError, match="not registered"):
        match_events(None, "v[^ep]*x", EVENT_CODES)
    with pytest.raises(ValueError, match="compile"):
        match_events(None, "v[", EVENT_CODES)
    with pytest.raises(ValueError, match="max_events"):
        match_events(None, "v", EVENT_CODES, max_events=0)


def test_abandoned_cart_planted_sequences(spark, tmp_path):
    """Planted abandoned-cart semantics: end-of-stream and next-view
    both close an unconverted cart; a purchase converts it; an error
    between view and click voids the cart."""
    from datetime import datetime

    from wd2duckdb_spark.operators.analytics import q_abandoned_cart

    seqs = {
        1: "vc",  # abandoned at end of stream
        2: "vcp",  # converted
        3: "vcvcp",  # first cart abandoned at the second view
        4: "vec",  # error voids the view->click funnel
        5: "c",  # click with no view
    }
    names = {"v": "view", "c": "click", "p": "purchase", "e": "error"}
    rows = [
        (u * 100 + i, datetime(2024, 1, 1, 0, 0, i), u, names[ch], 1.0, "{}")
        for u, s in seqs.items()
        for i, ch in enumerate(s)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))

    out = {
        r["user_id"]: r["n_abandoned"]
        for r in q_abandoned_cart(spark, str(tmp_path)).collect()
    }
    assert out == {1: 1, 3: 1}


def test_match_events_hot_user_cap(spark):
    """VERDICT r8 item 5: a 120k-event bot user is processed with
    bounded task state — the sequence is capped at max_events IN
    STREAM ORDER and the overflow is flagged, never silent."""
    from wd2duckdb_spark.operators.analytics import (
        EVENT_CODES,
        FUNNEL_PATTERN,
        MAX_SEQ_EVENTS,
        match_events,
    )

    n = 120_000
    e = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.col("id") + 1_600_000_000).alias("ts"),
        F.lit(7).alias("user_id"),
        F.when(F.col("id") % 3 == 0, "view")
        .when(F.col("id") % 3 == 1, "click")
        .otherwise("purchase")
        .alias("event_type"),
    )
    capped = match_events(e, FUNNEL_PATTERN, EVENT_CODES).collect()[0]
    assert capped["truncated"] and capped["n_events"] == n
    # seq is "vcpvcp…": the first MAX_SEQ_EVENTS chars hold
    # floor(MAX/3) complete funnels — the cap bound, not the full 40k
    assert capped["n_matches"] == MAX_SEQ_EVENTS // 3
    full = match_events(
        e, FUNNEL_PATTERN, EVENT_CODES, max_events=n
    ).collect()[0]
    assert not full["truncated"] and full["n_matches"] == n // 3


def test_match_events_plan_stays_jvm_side(spark):
    from wd2duckdb_spark.operators.analytics import q_abandoned_cart

    s = plan_summary(q_abandoned_cart(spark, SF_DIR))
    assert (
        s["broadcast_hash_join"]
        + s["sort_merge_join"]
        + s["shuffled_hash_join"]
        + s["nested_loop_join"]
        == 0
    )
    assert s["python_udf"] == 0 and s["map_in_pandas"] == 0

# ---------------------------------------------------------------------------
# Asymmetric containment join (VERDICT r8 item 4)
# ---------------------------------------------------------------------------


def test_containment_join_finds_planted_embedded_doc(spark, tmp_path):
    """The mode Jaccard misses: a small document embedded verbatim in
    a much larger one has containment 1.0 but tiny Jaccard. The
    prefix-bounded plan must find the planted directed pair, and the
    Jaccard-0.8 join must NOT (that asymmetry is the reason the
    operator exists)."""
    import random

    from wd2duckdb_spark.functions.dedup import (
        q_containment_join,
        q_jaccard_prefix_join,
    )

    rng = random.Random(9)
    vocab = [f"w{i}" for i in range(500)]
    small = " ".join(rng.choice(vocab) for _ in range(30))
    big = (
        " ".join(rng.choice(vocab) for _ in range(800))
        + " " + small + " "
        + " ".join(rng.choice(vocab) for _ in range(800))
    )
    fillers = [
        " ".join(rng.choice(vocab) for _ in range(60)) for _ in range(20)
    ]
    rows = [(0, small, "en", "s", len(small)), (1, big, "en", "s", len(big))]
    rows += [
        (i + 2, t, "en", "s", len(t)) for i, t in enumerate(fillers)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    cont = {
        (r["a_id"], r["b_id"]): r["containment"]
        for r in q_containment_join(spark, str(tmp_path)).collect()
    }
    assert (0, 1) in cont and cont[(0, 1)] >= 0.9
    # directional: the big doc is NOT contained in the small one
    assert (1, 0) not in cont
    jac = {
        (r["a_id"], r["b_id"])
        for r in q_jaccard_prefix_join(spark, str(tmp_path)).collect()
    }
    assert (0, 1) not in jac and (1, 0) not in jac


def test_containment_prefix_bound_integer_exact():
    """ceil(9n/10) = (9n+9) DIV 10 for every n — the integer prefix
    bound can never under-shoot (an FP ceil rounding
    27.000000000000004 up would silently shorten a prefix)."""
    from wd2duckdb_spark.functions.dedup import CONTAIN_DEN, CONTAIN_NUM

    for n in range(1, 5000):
        exact_ceil = -((-CONTAIN_NUM * n) // CONTAIN_DEN)
        assert (CONTAIN_NUM * n + CONTAIN_NUM) // CONTAIN_DEN == exact_ceil


def test_containment_join_plan_no_nested_loop(spark):
    from wd2duckdb_spark.functions.dedup import q_containment_join

    s = plan_summary(q_containment_join(spark, SF_DIR))
    assert s["nested_loop_join"] == 0
    assert s["python_udf"] == 0 and s["map_in_pandas"] == 0

# ---------------------------------------------------------------------------
# Real BPE tokenization (VERDICT r8 item 2)
# ---------------------------------------------------------------------------


def _ref_bpe_encode(word, merges):
    """Independent reference encoder (GPT-2-style pair-set loop) —
    deliberately a different implementation shape from the library's
    list-scan encoder."""
    ranks = {m: i for i, m in enumerate(merges)}
    syms = list(word)
    while len(syms) > 1:
        pairs = {(syms[i], syms[i + 1]) for i in range(len(syms) - 1)}
        ranked = [(ranks[p], p) for p in pairs if p in ranks]
        if not ranked:
            break
        _, (a, b) = min(ranked)
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_trainer_sennrich_hand_example():
    """First four merges on the classic Sennrich corpus (no
    end-of-word marker), hand-computed: es(9) -> est(9) -> lo(7, tie
    with ow broken lexicographically) -> low(7)."""
    from wd2duckdb_spark.functions.bpe import encode_word, merge_ranks, train_bpe_merges

    freqs = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe_merges(freqs, 4)
    assert merges == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    ranks = merge_ranks(merges)
    assert encode_word("newest", ranks) == ["n", "e", "w", "est"]
    assert encode_word("lowest", ranks) == ["low", "est"]
    assert encode_word("unseen", ranks) == list("unseen")


def test_bpe_encode_token_for_token_vs_reference(spark):
    """The distributed mapInPandas encoder reproduces the independent
    reference encoder token-for-token on real fixture documents under
    the corpus-trained merges."""
    from wd2duckdb_spark.catalog import tbl
    from wd2duckdb_spark.functions.bpe import bpe_encode, corpus_merges

    merges = corpus_merges(spark, SF_DIR)
    assert len(merges) > 50  # the corpus supports a real merge table
    docs = tbl(spark, SF_DIR, "documents").filter(F.col("doc_id") < 50)
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(docs, merges, output="tokens").collect()
    }
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        want = []
        for w in (text or "").lower().strip(" ").split(" "):
            if w:
                want.extend(_ref_bpe_encode(w, merges))
        assert got[doc_id] == want, f"doc {doc_id} token drift"


def test_token_count_real_bpe_query_shape(spark):
    """Counts cover every document; each word is >= 1 and <= len(word)
    tokens, so n_bpe_tokens is bracketed by word and char counts."""
    from wd2duckdb_spark.catalog import tbl
    from wd2duckdb_spark.functions.bpe import q_token_count_real_bpe

    d = tbl(spark, SF_DIR, "documents")
    out = q_token_count_real_bpe(spark, SF_DIR)
    assert out.count() == d.count()
    bounds = (
        out.join(d, "doc_id")
        .select(
            "n_bpe_tokens",
            F.size(
                F.filter(
                    F.split(F.lower(F.trim("text")), " "),
                    lambda w: w != "",
                )
            ).alias("n_words"),
            F.length(F.regexp_replace(F.lower(F.trim("text")), " ", ""))
            .alias("n_chars"),
        )
        .filter(
            (F.col("n_bpe_tokens") < F.col("n_words"))
            | (F.col("n_bpe_tokens") > F.col("n_chars"))
        )
        .count()
    )
    assert bounds == 0


def test_budget_plan_consumes_bpe_counts(spark):
    """VERDICT r8 item 2, consumer half: token_budget_plan's public
    seam budgets on REAL BPE counts — allocations are integer, sum to
    <= budget, and differ from the whitespace-estimate plan."""
    from wd2duckdb_spark.catalog import tbl
    from wd2duckdb_spark.functions.bpe import bpe_encode, corpus_merges
    from wd2duckdb_spark.functions.training import (
        budget_plan_from_counts,
        q_token_budget_plan,
    )

    d = tbl(spark, SF_DIR, "documents")
    counts = (
        bpe_encode(d, corpus_merges(spark, SF_DIR))
        .join(d.select("doc_id", "source"), "doc_id")
        .select("source", F.col("n_bpe_tokens").alias("n_tokens"))
    )
    plan = budget_plan_from_counts(counts, budget=100_000).collect()
    assert sum(r["alloc_tokens"] for r in plan) <= 100_000
    assert all(r["alloc_tokens"] >= 0 for r in plan)
    ws = {r["source"]: r["available_tokens"]
          for r in q_token_budget_plan(spark, SF_DIR).collect()}
    bpe_avail = {r["source"]: r["available_tokens"] for r in plan}
    assert set(ws) == set(bpe_avail)
    # real subword counts exceed whitespace word counts
    assert all(bpe_avail[s] >= ws[s] for s in ws)


def test_bpe_validation():
    from wd2duckdb_spark.functions.bpe import (
        bpe_encode,
        bpe_word_freqs,
        train_bpe_merges,
    )

    with pytest.raises(ValueError, match="n_merges"):
        train_bpe_merges([("a", 1)], 0)
    with pytest.raises(ValueError, match="top_k"):
        bpe_word_freqs(None, top_k=0)
    with pytest.raises(ValueError, match="output"):
        bpe_encode(None, [], output="words")

# ---------------------------------------------------------------------------
# ADVICE r8 determinism/completeness fixes
# ---------------------------------------------------------------------------


def test_vocab_divergence_reports_disjoint_sources(spark, tmp_path):
    """ADVICE r8: two sources with fully disjoint vocabularies — the
    most-divergent pairs a drift audit exists to find — now appear
    with exactly JS = ln 2 (floor-4dp) and n_shared_words = 0."""
    from wd2duckdb_spark.functions.text import q_vocab_divergence

    rows = [
        (1, "alpha bravo charlie alpha", "en", "s1", 0),
        (2, "delta echo foxtrot delta echo", "en", "s2", 0),
        (3, "alpha zulu bravo", "en", "s3", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    out = {
        (r["source_a"], r["source_b"]): r
        for r in q_vocab_divergence(spark, str(tmp_path)).collect()
    }
    assert set(out) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    assert out[("s1", "s2")]["n_shared_words"] == 0
    assert out[("s1", "s2")]["js_divergence"] == 0.6931
    assert out[("s2", "s3")]["n_shared_words"] == 0
    assert out[("s2", "s3")]["js_divergence"] == 0.6931
    # s1/s3 share alpha+bravo: strictly inside (0, ln 2)
    assert out[("s1", "s3")]["n_shared_words"] == 2
    assert 0 < out[("s1", "s3")]["js_divergence"] < 0.6931


def test_perplexity_stats_integer_micro_sums(spark):
    """ADVICE r8: mu/sigma now derive from exact integer micro-unit
    sums — recompute them in Python from the per-doc frame and check
    the bucket boundaries agree with the query's own output."""
    import math

    from wd2duckdb_spark.functions.text import (
        doc_surprisal,
        q_perplexity_bucket_sample,
    )

    per_doc = doc_surprisal(spark, SF_DIR).collect()
    micro = [int(math.floor(r["doc_surprisal"] * 1e4 + 0.5)) for r in per_doc]
    n, s, ssq = len(micro), sum(micro), sum(m * m for m in micro)
    var = (ssq - s * s / n) / (n - 1)
    sigma = math.sqrt(var)
    buckets = {}
    for r, m in zip(per_doc, micro):
        z = math.floor((m - s / n) / sigma * 1e4 + 0.5) / 1e4
        b = "head" if z < -0.5 else ("middle" if z <= 0.5 else "tail")
        key = (b, r["source"])
        buckets[key] = buckets.get(key, 0) + 1
    got = {
        (r["bucket"], r["source"]): r["n_docs"]
        for r in q_perplexity_bucket_sample(spark, SF_DIR).collect()
    }
    assert got == buckets

# ---------------------------------------------------------------------------
# Derived-view TPC-H queries (VERDICT r8 "What's missing" item 2)
# ---------------------------------------------------------------------------


def test_partsupp_derivation_shape(spark):
    """Every part gets exactly PS_PER_PART distinct suppliers, all
    inside the supplier key range, with positive integer qty/cost."""
    from wd2duckdb_spark.catalog import tbl
    from wd2duckdb_spark.operators.tpch_derived import PS_PER_PART, partsupp

    ps = partsupp(spark, SF_DIR)
    n_parts = tbl(spark, SF_DIR, "part").count()
    n_supp = tbl(spark, SF_DIR, "supplier").count()
    assert ps.count() == n_parts * PS_PER_PART
    bad = (
        ps.groupBy("ps_partkey")
        .agg(F.countDistinct("ps_suppkey").alias("d"))
        .filter(F.col("d") != PS_PER_PART)
        .count()
    )
    assert bad == 0
    assert (
        ps.filter(
            (F.col("ps_suppkey") < 0)
            | (F.col("ps_suppkey") >= n_supp)
            | (F.col("ps_availqty") < 1)
            | (F.col("ps_supplycost_cents") < 100)
        ).count()
        == 0
    )


def test_q2_window_rewrite_plan(spark):
    """The Spark side replaces the spec's correlated scalar subquery
    with ONE window min — no second partsupp join, no nested loop."""
    from wd2duckdb_spark.operators.tpch_derived import q_q2_min_cost_supplier

    s = plan_summary(q_q2_min_cost_supplier(spark, SF_DIR))
    # the one BNLJ is the 1-row supplier-count broadcast inside the
    # partsupp derivation (the engine's blessed global-stats shape)
    assert s["nested_loop_join"] <= 1
    # part/supplier/nation/region all broadcast
    assert s["broadcast_hash_join"] >= 3
    assert s["sort_merge_join"] == 0 and s["shuffled_hash_join"] == 0


def test_q21_decorrelated_aggregate_plan_and_semantics(spark, tmp_path):
    """The de-correlated Q21: one order-keyed aggregate instead of
    EXISTS + NOT EXISTS self-joins, and the per-LINE counting
    semantics hold (a supplier with two late lines in a qualifying
    order contributes 2)."""
    from datetime import datetime

    from wd2duckdb_spark.operators.tpch_derived import q_q21_late_suppliers

    s = plan_summary(q_q21_late_suppliers(spark, SF_DIR))
    assert s["nested_loop_join"] == 0

    # planted: order 100 has supplier 0 late twice, supplier 1 on time
    # -> numwait 2 for supplier 0; order 200 has BOTH suppliers late ->
    # excluded; order 300 single-supplier late -> excluded
    def li(ok, ln, sk):
        # l_orderkey, l_partkey, l_suppkey, l_linenumber, qty, price,
        # disc, tax, rf, ls, shipdate
        return (ok, 1, sk, ln, 1.0, 1.0, 0.0, 0.0, "N", "O",
                datetime(1996, 3, 1))

    # choose (orderkey, linenumber) so the derived commit/receipt make
    # the line late iff we want: late <=> (ok + 5*ln) % 30 + 1 >
    # (3*ok + 7*ln) % 61 - 30
    def is_late(ok, ln):
        return (ok + 5 * ln) % 30 + 1 > (3 * ok + 7 * ln) % 61 - 30

    # find concrete line numbers with the desired lateness
    def pick(ok, want_late, n, start=1):
        out, ln = [], start
        while len(out) < n:
            if is_late(ok, ln) == want_late:
                out.append(ln)
            ln += 1
        return out

    rows = []
    l1, l2 = pick(100, True, 2)
    rows += [li(100, l1, 0), li(100, l2, 0)]
    rows += [li(100, pick(100, False, 1, l2 + 1)[0], 1)]
    a, b = pick(200, True, 2)
    rows += [li(200, a, 0), li(200, b, 1)]
    rows += [li(300, pick(300, True, 1)[0], 0)]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber long, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(100, 1, "F", 1.0, datetime(1996, 1, 1), "1-URGENT"),
         (200, 1, "F", 1.0, datetime(1996, 1, 1), "1-URGENT"),
         (300, 1, "F", 1.0, datetime(1996, 1, 1), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(0, "Supplier#0", 0, 100.0), (1, "Supplier#1", 0, 100.0)],
        "s_suppkey long, s_name string, s_nationkey long,"
        " s_acctbal double",
    ).write.parquet(str(tmp_path / "supplier.parquet"))

    out = {r["s_name"]: r["numwait"]
           for r in q_q21_late_suppliers(spark, str(tmp_path)).collect()}
    assert out == {"Supplier#0": 2}

# ---------------------------------------------------------------------------
# Session-scoped CEP (WITHIN semantics via gap markers)
# ---------------------------------------------------------------------------


def test_session_gap_validation():
    from wd2duckdb_spark.operators.analytics import EVENT_CODES, match_events

    with pytest.raises(ValueError, match="session-gap marker"):
        match_events(None, "v", {"gap": "g"})
    with pytest.raises(ValueError, match="positive"):
        match_events(None, "v", EVENT_CODES, session_gap_seconds=0)
    with pytest.raises(ValueError, match="session_gap_seconds is not set"):
        match_events(None, "v[^g]*p", EVENT_CODES)


def test_session_funnel_gap_breaks_pattern(spark, tmp_path):
    """Planted WITHIN semantics: the same v→c→p triple matches the
    unscoped funnel but NOT the session-scoped one when a gap larger
    than the threshold separates click from purchase; a within-gap
    triple matches both."""
    from datetime import datetime, timedelta

    from wd2duckdb_spark.operators.analytics import (
        EVENT_CODES,
        FUNNEL_PATTERN,
        SESSION_FUNNEL_PATTERN,
        match_events,
    )

    t0 = datetime(2024, 1, 1)
    rows = [
        # user 1: v, c, then purchase 2h later -> gap breaks session
        (1, t0, 1, "view"),
        (2, t0 + timedelta(minutes=5), 1, "click"),
        (3, t0 + timedelta(hours=2, minutes=5), 1, "purchase"),
        # user 2: all within minutes -> clean in both
        (11, t0, 2, "view"),
        (12, t0 + timedelta(minutes=3), 2, "click"),
        (13, t0 + timedelta(minutes=6), 2, "purchase"),
    ]
    e = spark.createDataFrame(
        [(i, ts, u, t, 1.0, "{}") for (i, ts, u, t) in rows],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    unscoped = {
        r["user_id"]: r["n_matches"]
        for r in match_events(e, FUNNEL_PATTERN, EVENT_CODES).collect()
    }
    scoped = {
        r["user_id"]: r["n_matches"]
        for r in match_events(
            e,
            SESSION_FUNNEL_PATTERN,
            EVENT_CODES,
            session_gap_seconds=1800,
        ).collect()
    }
    assert unscoped == {1: 1, 2: 1}
    assert scoped == {1: 0, 2: 1}


def test_session_funnel_bounded_by_unscoped(spark):
    """On the fixture: every user's session-scoped funnel count is <=
    their unscoped count (gap markers only remove matches)."""
    from wd2duckdb_spark.operators.analytics import (
        q_event_pattern_match,
        q_session_funnel,
    )

    unscoped = {
        r["user_id"]: r["n_clean_funnels"]
        for r in q_event_pattern_match(spark, SF_DIR).collect()
    }
    scoped = {
        r["user_id"]: r["n_session_funnels"]
        for r in q_session_funnel(spark, SF_DIR).collect()
    }
    assert scoped and set(scoped) <= set(unscoped)
    assert all(scoped[u] <= unscoped[u] for u in scoped)

# ---------------------------------------------------------------------------
# Content-defined chunking + domain cap (round-9 wave 2)
# ---------------------------------------------------------------------------


def test_cdc_chunks_resynchronize_after_insertion(spark, tmp_path):
    """The reason CDC exists: prepending one token to a document
    shifts EVERY fixed-grid chunk (zero shared 32-token grid chunks),
    but content-defined boundaries re-synchronize, so the pair shares
    most of its CDC chunks."""
    import random

    from wd2duckdb_spark.functions.dedup import q_cdc_chunk_dedup

    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(300)]
    base = [rng.choice(vocab) for _ in range(320)]
    edited = ["inserted"] + base
    rows = [
        (0, " ".join(base), "en", "s", 0),
        (1, " ".join(edited), "en", "s", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    shared = [
        r
        for r in q_cdc_chunk_dedup(spark, str(tmp_path)).collect()
        if r["n_docs"] == 2
    ]
    assert len(shared) >= 3, "CDC failed to re-synchronize"

    # fixed 32-token grid on the same pair shares NOTHING: the
    # 1-token prepend shifts every grid boundary
    def grid(toks):
        return {
            " ".join(toks[i : i + 32]) for i in range(0, len(toks), 32)
        }

    assert not (grid(base) & grid(edited))


@pytest.mark.slow
def test_cdc_chunks_reconstruct_document(spark):
    """Losslessness: concatenating a document's CDC chunks in order
    reproduces its token stream exactly (checked corpus-wide via
    token counts and per-doc md5 of the rejoined stream)."""
    from wd2duckdb_spark.catalog import tbl
    from wd2duckdb_spark.functions.dedup import (
        _cdc_chunks_col,
        _cdc_cuts_col,
    )

    d = tbl(spark, SF_DIR, "documents")
    toks = d.select(
        "doc_id",
        F.expr("filter(split(lower(trim(text)), ' '), x -> x <> '')").alias(
            "tk"
        ),
    ).filter(F.size("tk") >= 1)
    hashed = toks.withColumn(
        "th",
        F.expr(
            "transform(tk, t -> cast(conv(substr(md5(t), 1, 8), 16, 10)"
            " as bigint))"
        ),
    ).withColumn("cuts", _cdc_cuts_col())
    bad = (
        hashed.withColumn("chunks", _cdc_chunks_col())
        .select(
            F.md5(F.concat_ws(" ", "tk")).alias("orig"),
            F.md5(F.array_join(F.col("chunks"), " ")).alias("rejoined"),
        )
        .filter(F.col("orig") != F.col("rejoined"))
        .count()
    )
    assert bad == 0


def test_domain_cap_sample_semantics(spark):
    """Per-source keep counts are min(n_source, CAP), and the kept
    set is deterministic across reruns (md5 order, not rand)."""
    from wd2duckdb_spark.functions.training import (
        DOMAIN_CAP,
        q_domain_cap_sample,
    )

    rows = q_domain_cap_sample(spark, SF_DIR).collect()
    per_src: dict = {}
    for r in rows:
        tot, kept = per_src.setdefault(r["source"], [0, 0])
        per_src[r["source"]][0] += 1
        per_src[r["source"]][1] += int(r["kept"])
    for src, (tot, kept) in per_src.items():
        assert kept == min(tot, DOMAIN_CAP), src
    again = {
        (r["doc_id"], r["kept"])
        for r in q_domain_cap_sample(spark, SF_DIR).collect()
    }
    assert again == {(r["doc_id"], r["kept"]) for r in rows}


def test_domain_cap_keep_plan_uses_window_group_limit(spark):
    """The PRUNING form's rank<=K filter must plan as
    WindowGroupLimit (map-side per-source top-K before the exchange)
    — the property that bounds a hot domain's shuffle at K rows per
    task. (The registered flag-output form keeps every row by design,
    so group-limit pruning is impossible there — that's why the two
    forms exist.) The kept set must equal the flag form's."""
    from wd2duckdb_spark.catalog import tbl
    from wd2duckdb_spark.functions.training import (
        domain_cap_keep,
        q_domain_cap_sample,
    )
    from wd2duckdb_spark.plans import explain_str

    kept = domain_cap_keep(tbl(spark, SF_DIR, "documents"))
    assert "WindowGroupLimit" in explain_str(kept, "simple")
    got = {r["doc_id"] for r in kept.select("doc_id").collect()}
    want = {
        r["doc_id"]
        for r in q_domain_cap_sample(spark, SF_DIR).collect()
        if r["kept"]
    }
    assert got == want
    with pytest.raises(ValueError, match="cap"):
        domain_cap_keep(None, cap=0)
