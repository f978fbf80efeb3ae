"""Operator edge cases: degenerate inputs that a corpus at scale WILL
contain somewhere (empty partitions, sub-shingle documents, more
centroids than vectors) must degrade gracefully, not throw."""

from __future__ import annotations

from pyspark.sql import functions as F

from rpa_etl_investing_spark.operators.dedup import (
    exact_dedup,
    minhash_signatures,
)
from rpa_etl_investing_spark.operators.similarity import ivf_topk


def test_minhash_drops_sub_shingle_docs(spark):
    """Documents with fewer than 3 tokens have no 3-shingles and must
    drop out of the signature relation (matching the oracle's UNNEST
    of an empty list), not produce NULL signatures."""
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "a b c d"), (3, "x")], ["doc_id", "text"]
    )
    sigs = minhash_signatures(docs).collect()
    assert {r.doc_id for r in sigs} == {2}
    assert all(v is not None for v in sigs[0].asDict().values())


def test_exact_dedup_empty_input_keeps_schema(spark):
    docs = spark.createDataFrame([], "doc_id bigint, text string")
    out = exact_dedup(docs)
    assert out.columns == ["content_hash", "canonical_id", "n_copies"]
    assert out.count() == 0


def test_ivf_with_fewer_vectors_than_centroids(spark):
    """A cell index built over fewer vectors than requested centroids
    must still answer queries (every vector seeds its own cell)."""
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(3)]
    vecs = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = ivf_topk(
        vecs.filter(F.col("vec_id") == 0),
        vecs,
        n_centroids=8,
        k=2,
        queries_in_corpus=True,
    ).collect()
    assert {r.neighbor_id for r in out}.issubset({1, 2})
    assert all(r.query_id == 0 for r in out)


def test_minhash_band_bucket_cap_drops_hot_bucket(spark):
    """r3 verdict item #2: a synthetic hot bucket (40 identical docs →
    same signature → same 4 band buckets) must be dropped by the cap so
    the self-join never sees its B² pairs; the audit reports the drop,
    and distinct docs below the cap still pair up."""
    from pyspark.sql import functions as F

    from rpa_etl_investing_spark.operators.dedup import (
        minhash_bucket_audit,
        minhash_candidate_pairs,
    )

    clone = "alpha beta gamma delta epsilon zeta"
    # a second, below-cap clone pair: identical text → identical bands
    # deterministically (a near-dup pair would share a band only
    # probabilistically at 16 hashes)
    other = "one two three four five six seven"
    rows = [(i, clone) for i in range(40)] + [(100, other), (101, other)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    capped = minhash_candidate_pairs(docs, max_bucket=10)
    pair_ids = {
        (r["doc_a"], r["doc_b"]) for r in capped.select("doc_a", "doc_b").collect()
    }
    assert all(a >= 100 for a, _ in pair_ids), pair_ids  # no clone pairs
    assert (100, 101) in pair_ids  # below-cap bucket still joins

    uncapped = minhash_candidate_pairs(docs, max_bucket=None)
    n_clone_pairs = uncapped.filter(F.col("doc_b") < 100).count()
    assert n_clone_pairs == 40 * 39 // 2  # what the cap prevented

    audit = minhash_bucket_audit(docs, max_bucket=10).collect()[0]
    assert audit["n_capped_buckets"] == 4  # one hot bucket per band
    assert audit["max_bucket_size"] == 40
    assert audit["n_dropped_bucket_pairs"] == 4 * (40 * 39 // 2)


def test_gap_fill_derived_bounds_equal_literal_bounds(spark, sf_dir):
    """r3 verdict item #6: omitting the spine bounds derives them from
    the data (broadcast min/max day scalar) and must reproduce the
    literal-bounds form exactly when the literals are the true extent."""
    from rpa_etl_investing_spark.catalog import tbl
    from rpa_etl_investing_spark.plans.timeseries import gap_fill_locf

    ev = tbl(spark, sf_dir, "events")
    from pyspark.sql import functions as F

    lo, hi = ev.agg(
        F.date_trunc("day", F.min("ts")), F.date_trunc("day", F.max("ts"))
    ).collect()[0]
    derived = {tuple(r) for r in gap_fill_locf(ev).collect()}
    literal = {tuple(r) for r in gap_fill_locf(ev, str(lo), str(hi)).collect()}
    assert derived == literal
    days = {r[1] for r in derived}
    assert min(days) == lo and max(days) == hi


def test_excise_spans_overlap_full_and_none(spark):
    from rpa_etl_investing_spark.operators.text import excise_spans

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x y z"), (3, "p q r s")],
        "doc_id long, text string",
    )
    # doc 1: overlapping spans [1,3] and [2,4] → remove positions 1-4;
    # doc 2: span covers everything; doc 3: no spans.
    spans = spark.createDataFrame(
        [(1, 1, 3), (1, 2, 3), (2, 0, 3)],
        "doc_id long, span_start long, span_tokens long",
    )
    out = {r.doc_id: r for r in excise_spans(docs, spans).collect()}
    assert out[1].clean_text == "a f" and out[1].n_tokens_removed == 4
    assert out[2].clean_text == "" and out[2].n_tokens_removed == 3
    assert out[3].clean_text == "p q r s" and out[3].n_tokens_removed == 0


def test_normalize_text_edge_cases(spark):
    """Control chars, NBSP, zero-width chars, mixed whitespace runs,
    all-junk strings, and already-clean strings."""
    from rpa_etl_investing_spark.operators.text import normalize_text

    cases = [
        ("a\u00a0b", "a b"),
        ("a\u200b\u200c\u200db", "a b"),  # zero-width run -> one space
        ("  a\t\tb\r\nc  ", "a b c"),
        ("\u0001\u0002 \u007f", ""),  # all junk collapses to empty
        ("\ufeffbom", "bom"),
        ("already clean", "already clean"),
        ("", ""),
    ]
    df = spark.createDataFrame(cases, "raw string, expected string")
    out = df.select("raw", "expected", normalize_text("raw").alias("got"))
    bad = out.filter(F.col("got") != F.col("expected")).collect()
    assert not bad, [(r["raw"], r["got"], r["expected"]) for r in bad]


def test_simhash_hamming_band_pigeonhole(spark):
    """A pair at exactly max_hamming must survive the band join; the
    guard must refuse a radius the pigeonhole can't cover."""
    import pytest

    from rpa_etl_investing_spark.operators.dedup import simhash_hamming_pairs

    # identical docs -> hamming 0; near-identical -> small hamming
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "alpha beta gamma delta epsilon eta"),
            (4, "totally different words entirely here now"),
        ],
        "doc_id bigint, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_hamming_pairs(docs, max_hamming=3).collect()
    }
    assert pairs.get((1, 2)) == 0
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_hamming_pairs(docs, max_hamming=4, n_bands=4)


def test_pagerank_star_and_cycle(spark):
    """PageRank sanity on known topologies: in a directed star all leaves
    pour rank into the hub (hub ranks strictly highest); in a symmetric
    cycle every node gets exactly the same rank. Also checks rank mass
    stays within the grid (teleport + damped flow can only lose mass to
    integer floors and dangling nodes, never create it)."""
    from rpa_etl_investing_spark.operators.graph import GRID, pagerank

    nodes = spark.createDataFrame([(i,) for i in range(4)], ["node"])
    star_edges = spark.createDataFrame(
        [(i, 0, 1) for i in range(1, 4)], ["src", "dst", "w"]
    )
    star = {r["node"]: r["rank_q"] for r in pagerank(nodes, star_edges, 3).collect()}
    assert star[0] > max(star[i] for i in range(1, 4))
    assert sum(star.values()) <= GRID

    cycle_edges = spark.createDataFrame(
        [(i, (i + 1) % 4, 7) for i in range(4)], ["src", "dst", "w"]
    )
    cyc = {r["node"]: r["rank_q"] for r in pagerank(nodes, cycle_edges, 3).collect()}
    assert len(set(cyc.values())) == 1
    assert sum(cyc.values()) <= GRID


def test_simhash64_banded_recall_equals_brute_force(spark, sf_dir):
    """The 4×16-bit band join over the 64-bit BIGINT signature must
    recover EXACTLY the pairs the brute-force all-pairs bit_count(xor)
    finds (pigeonhole recall at max_hamming ≤ 3), and signatures must
    be native longs with band keys inside the 16-bit domain."""
    from rpa_etl_investing_spark.catalog import tbl
    from rpa_etl_investing_spark.operators.dedup import (
        simhash64_hamming_pairs,
        simhash64_signatures,
    )

    docs = tbl(spark, sf_dir, "documents")
    sig = simhash64_signatures(docs)
    assert dict(sig.dtypes)["sig"] == "bigint"
    rng = sig.agg(
        F.min(F.least("band0", "band1", "band2", "band3")).alias("lo"),
        F.max(F.greatest("band0", "band1", "band2", "band3")).alias("hi"),
    ).collect()[0]
    assert 0 <= rng["lo"] and rng["hi"] <= 65535

    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash64_hamming_pairs(docs, max_hamming=3).collect()
    }
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sa"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sb"))
    brute = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
            .cast("bigint")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == brute and len(brute) > 0

    import pytest

    with pytest.raises(ValueError, match="max_hamming"):
        simhash64_hamming_pairs(docs, max_hamming=4)


def test_simhash64_bucket_cap_drops_hot_buckets(spark):
    """r6 verdict item #5: the occupancy cap must bound the Hamming
    band join's fan-out — a bucket above ``max_bucket`` is dropped
    whole (its pairs vanish) and the audit row counts exactly what was
    dropped; pairs outside hot buckets survive untouched."""
    from rpa_etl_investing_spark.operators.dedup import (
        simhash64_bucket_audit,
        simhash64_hamming_pairs,
    )

    # 5 identical docs (one hot bucket per band) + 2 distinct singletons
    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(5)]
    rows += [(10, "totally different words here now"), (11, "yet another doc")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    uncapped = simhash64_hamming_pairs(docs, max_bucket=None)
    clones = {(a, b) for a in range(5) for b in range(5) if a < b}
    got = {(r["doc_a"], r["doc_b"]) for r in uncapped.collect()}
    assert clones <= got  # identical docs are hamming-0 pairs

    capped = simhash64_hamming_pairs(docs, max_bucket=3)
    got_capped = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert not (clones & got_capped)  # the hot cluster's pairs are gone
    assert got_capped == got - clones  # and nothing else was dropped

    audit = simhash64_bucket_audit(docs, max_bucket=3).collect()[0]
    assert audit["n_capped_buckets"] >= 4  # one hot bucket per band
    # each hot bucket of 5 drops C(5,2)=10 within-bucket pairs
    assert audit["n_dropped_bucket_pairs"] == audit["n_capped_buckets"] * 10
    assert audit["max_bucket_size"] == 5


def test_grid_proximity_exact_recall_vs_brute_force(spark):
    """The 3x3 cell-neighborhood join must find EXACTLY the pairs a
    brute-force O(n^2) scan finds, including pairs straddling a cell
    boundary, and produce each pair exactly once (no distinct pass)."""
    import itertools

    from rpa_etl_investing_spark.operators.spatial import grid_proximity_pairs

    # deterministic lattice-ish cloud with boundary-straddling points:
    # multiples of eps land exactly on cell edges
    eps = 0.1
    pts = [
        (i, (i * 37 % 19) * 0.025 - 0.2, (i * 53 % 17) * 0.025 - 0.2)
        for i in range(80)
    ]
    df = spark.createDataFrame(pts, "id bigint, x double, y double")
    got = {
        (r.id_a, r.id_b)
        for r in grid_proximity_pairs(df, eps).collect()
    }
    want = {
        (a[0], b[0])
        for a, b in itertools.combinations(pts, 2)
        if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 < eps * eps
    }
    assert got == want
    # uniqueness: collect() above already proves no duplicate tuples in
    # a set-compare, but assert the frame itself has no dup rows either
    out = grid_proximity_pairs(df, eps)
    assert out.count() == out.distinct().count() == len(want)


def test_grid_proximity_plans_equi_join_not_cartesian(spark):
    """The proximity join must plan a hash/sort-merge equi-join on the
    cell key — never a cartesian/broadcast-nested-loop fallback."""
    from rpa_etl_investing_spark.operators.spatial import grid_proximity_pairs

    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 10 * 0.03).alias("x"),
        (F.col("id") % 7 * 0.03).alias("y"),
    )
    plan = grid_proximity_pairs(df, 0.05)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rendezvous_moves_only_to_new_shard(spark, sf_dir):
    """HRW property: growing the pool 8 -> 9 relocates a doc ONLY when
    the new shard wins it — every moved doc's 9-shard assignment must
    be shard 8, and the moved fraction stays near 1/9."""
    from rpa_etl_investing_spark.catalog import tbl
    from rpa_etl_investing_spark.plans.curation_queries import (
        hrw_packed_assignments,
    )

    d = tbl(spark, sf_dir, "documents").select("doc_id")
    a = hrw_packed_assignments(d).select(
        "doc_id", (F.col("p8") % 16).alias("s8"), (F.col("p9") % 16).alias("s9")
    )
    moved = a.where(F.col("s8") != F.col("s9"))
    n, n_moved = a.count(), moved.count()
    assert moved.where(F.col("s9") != 8).count() == 0
    assert 0 < n_moved < n / 4  # expected ~ n/9


def test_grid_proximity_property_random_clouds(spark):
    """Property sweep: for hypothesis-style generated point clouds
    (three deterministic seeds × adversarial geometries: dense cluster,
    boundary lattice, mixed-scale spread), the grid join equals brute
    force. One Spark round-trip per cloud, generation is pure Python."""
    import itertools
    import random

    from rpa_etl_investing_spark.operators.spatial import grid_proximity_pairs

    for seed, eps in [(1, 0.05), (2, 0.013), (3, 0.3)]:
        rng = random.Random(seed)
        pts = []
        for i in range(60):
            kind = i % 3
            if kind == 0:  # tight cluster around origin
                pts.append((i, rng.gauss(0, eps), rng.gauss(0, eps)))
            elif kind == 1:  # exact cell-boundary lattice
                pts.append((i, (i // 3 % 7) * eps, (i // 3 % 5) * eps))
            else:  # spread out
                pts.append((i, rng.uniform(-3, 3), rng.uniform(-3, 3)))
        df = spark.createDataFrame(pts, "id bigint, x double, y double")
        got = {
            (r.id_a, r.id_b) for r in grid_proximity_pairs(df, eps).collect()
        }
        want = {
            (a[0], b[0])
            for a, b in itertools.combinations(pts, 2)
            if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 < eps * eps
        }
        assert got == want, f"seed={seed} eps={eps}"


def test_grid_proximity_empty_and_singleton(spark):
    """Zero points and a single point must both yield an empty pair set
    with the contract schema, not an error."""
    from rpa_etl_investing_spark.operators.spatial import grid_proximity_pairs

    empty = spark.createDataFrame([], "id bigint, x double, y double")
    out = grid_proximity_pairs(empty, 0.1)
    assert out.columns == ["id_a", "id_b", "dist2"]
    assert out.count() == 0
    one = spark.createDataFrame([(1, 0.0, 0.0)], "id bigint, x double, y double")
    assert grid_proximity_pairs(one, 0.1).count() == 0


def test_grid_proximity_coincident_points(spark):
    """Exactly coincident points (dist2 = 0 < eps²) must pair up — the
    degenerate case a dedup-shaped consumer cares about most."""
    from rpa_etl_investing_spark.operators.spatial import grid_proximity_pairs

    pts = spark.createDataFrame(
        [(1, 2.5, -1.0), (2, 2.5, -1.0), (3, 9.9, 9.9)],
        "id bigint, x double, y double",
    )
    rows = grid_proximity_pairs(pts, 0.05).collect()
    assert [(r.id_a, r.id_b, r.dist2) for r in rows] == [(1, 2, 0.0)]


def test_dedup_cache_registry_keys_on_corpus_not_just_plan_shape(spark):
    """Regression: canonicalized plans ERASE data-source paths, so two
    different corpora with identical pipeline shapes must still get
    their own cached signatures — reuse keyed on plan shape alone once
    served sf0.01's signatures for sf0.001 (25 pairs instead of 28)."""
    from rpa_etl_investing_spark.catalog import tbl
    from rpa_etl_investing_spark.operators import dedup

    d1 = tbl(spark, "/root/testdata/sf0.01", "documents")
    d2 = tbl(spark, "/root/testdata/sf0.001", "documents")
    dedup.release_sig_caches()
    fresh1 = dedup.minhash_candidate_pairs(d1).count()
    fresh2 = dedup.minhash_candidate_pairs(d2).count()  # d1 now cached
    dedup.release_sig_caches()
    alone2 = dedup.minhash_candidate_pairs(d2).count()
    assert fresh2 == alone2
    # and same-corpus invocations DO reuse the registry entry
    again1 = dedup.minhash_candidate_pairs(d1).count()
    assert again1 == fresh1
    dedup.release_sig_caches()
