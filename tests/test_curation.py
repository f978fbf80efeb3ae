"""Training-data curation operators: deterministic splits, weighted
source mixing, connected-components cluster resolution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rpa_etl_investing_spark.catalog import tbl
from rpa_etl_investing_spark.operators.components import connected_components
from rpa_etl_investing_spark.operators.sampling import (
    deterministic_split,
    frac_to_hex,
    weighted_source_mix,
)


def test_frac_to_hex_thresholds():
    assert frac_to_hex(0.0) == "0000"
    assert frac_to_hex(0.5) == "8000"
    assert frac_to_hex(1.0) == "g"  # lexicographically above every bucket
    assert frac_to_hex(0.8) == "cccd"


def test_split_partitions_exactly(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    split = deterministic_split(docs, "doc_id")
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    # 80/10/10 within loose tolerance at fixture scale
    assert counts["train"] > counts.get("val", 0)
    assert counts["train"] > counts.get("test", 0)


def test_split_is_stable_under_repartition(spark, sf_dir):
    """The property that justifies hash splits: physical layout must not
    affect assignment."""
    docs = tbl(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["split"] for r in deterministic_split(docs, "doc_id").select("doc_id", "split").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(docs.repartition(13), "doc_id").select("doc_id", "split").collect()
    }
    assert a == b


def test_weighted_mix_rates(spark, sf_dir):
    docs = tbl(spark, sf_dir, "documents")
    kept = weighted_source_mix(docs, "doc_id", "source", {"src0": 1.0, "src1": 0.0})
    per_src = {r["source"]: r["n"] for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    n_src0 = docs.filter(F.col("source") == "src0").count()
    assert per_src.get("src0") == n_src0  # weight 1.0 keeps everything
    assert "src1" not in per_src  # weight 0.0 keeps nothing
    assert set(per_src) == {"src0"}  # unlisted sources dropped


def test_connected_components_chain_and_triangle(spark):
    """Chain 1-2-3-4 (transitive, needs >1 round), triangle 10-11-12,
    isolated pair (20,21)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["doc_a", "doc_b"],
    )
    got = {
        r["doc_id"]: r["cluster_id"] for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def _ground_truth_components(edge_list):
    """Driver-side union-find reference for tiny property graphs."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


@pytest.mark.parametrize("seed", [7, 101, 2026])
@pytest.mark.slow
def test_large_small_star_equals_iterative(spark, seed):
    """Property: on random graphs (plus an adversarial 40-chain, the
    diameter case large/small-star exists for), the SoCC'14 alternating
    algorithm, the iterative min-label propagation, and a driver-side
    union-find all agree exactly."""
    import random

    from rpa_etl_investing_spark.operators.components import (
        large_small_star_components,
    )

    rng = random.Random(seed)
    n = 60
    edge_list = [(i, i + 1) for i in range(100, 140)]  # 40-vertex chain
    edge_list += [
        (rng.randrange(n), rng.randrange(n)) for _ in range(45)
    ]
    edge_list = [(a, b) for a, b in edge_list if a != b]
    edges = spark.createDataFrame(edge_list, ["doc_a", "doc_b"])

    expect = _ground_truth_components(edge_list)
    got_star = {
        r["doc_id"]: r["cluster_id"]
        for r in large_small_star_components(edges).collect()
    }
    got_iter = {
        r["doc_id"]: r["cluster_id"] for r in connected_components(edges).collect()
    }
    assert got_star == expect
    assert got_iter == expect


@pytest.mark.parametrize("seed", [7, 2026])
def test_pointer_jumping_equals_union_find(spark, seed):
    """r8: the hook+jump variant agrees with the union-find ground
    truth on random graphs plus the adversarial chain — and, the point
    of the algorithm, converges on a 64-vertex chain within the
    O(log diameter) round budget (reach doubles per round), where
    plain propagation needs 64 rounds."""
    import random

    from rpa_etl_investing_spark.operators.components import (
        pointer_jumping_components,
    )

    rng = random.Random(seed)
    n = 60
    edge_list = [(i, i + 1) for i in range(100, 164)]  # 64-vertex chain
    edge_list += [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
    edge_list = [(a, b) for a, b in edge_list if a != b]
    edges = spark.createDataFrame(edge_list, ["doc_a", "doc_b"])

    expect = _ground_truth_components(edge_list)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in pointer_jumping_components(edges, max_iter=10).collect()
    }
    assert got == expect


def test_components_raise_on_exhausted_round_budget(spark):
    """r9 (ADVICE item #3): an under-provisioned ``max_iter`` must RAISE,
    never return plausible-but-wrong labels — the DuckDB oracle twin
    empties its result in this case, and the engine side used to return
    the last (unconverged) labels silently. A 12-vertex chain cannot
    converge (and prove it with a stable round) in 2 rounds under any
    of the three algorithms."""
    import pytest as _pytest

    from rpa_etl_investing_spark.operators.components import (
        connected_components,
        large_small_star_components,
        pointer_jumping_components,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["doc_a", "doc_b"]
    )
    for fn in (
        connected_components,
        large_small_star_components,
        pointer_jumping_components,
    ):
        with _pytest.raises(RuntimeError, match="did not converge"):
            fn(edges, max_iter=2)


# ---- two-level (sharded) prefix sums (operators/prefix.py) ----------------


def _single_window_end_off(docs):
    """Reference: the naive one-window-per-source running sum."""
    from pyspark.sql import Window

    n_tok = F.size(F.split("text", " ")).cast("bigint")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select("doc_id", "source", n_tok.alias("n_tok"))
        .withColumn("end_off", F.sum("n_tok").over(w))
        .select("doc_id", "end_off")
    )


@pytest.mark.parametrize("n_shards", [1, 3, 32])
def test_sharded_running_sum_matches_single_window(spark, sf_dir, n_shards):
    """Bit-equality of the two-level prefix sum with the naive window at
    several shard counts — including n_shards=1 (degenerate single
    shard) and more shards than rows per source."""
    from rpa_etl_investing_spark.operators.prefix import (
        SHARD,
        sharded_running_sum,
        with_id_range_shard,
    )

    docs = tbl(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " ")).cast("bigint")
    base = with_id_range_shard(
        docs.select("doc_id", "source", n_tok.alias("n_tok")), "doc_id", n_shards
    )
    got = {
        r["doc_id"]: r["end_off"]
        for r in sharded_running_sum(
            base, ["source"], [F.col("doc_id")], "n_tok", "end_off"
        )
        .drop(SHARD)
        .collect()
    }
    expect = {r["doc_id"]: r["end_off"] for r in _single_window_end_off(docs).collect()}
    assert got == expect


def test_id_range_shard_bounds_and_monotone(spark, sf_dir):
    """Shards land in [0, n), are monotone in the id, and split the id
    space into more than one group (parallelism actually exists)."""
    from rpa_etl_investing_spark.operators.prefix import SHARD, with_id_range_shard

    docs = tbl(spark, sf_dir, "documents").select("doc_id")
    rows = with_id_range_shard(docs, "doc_id", 8).orderBy("doc_id").collect()
    shards = [r[SHARD] for r in rows]
    assert all(0 <= s < 8 for s in shards)
    assert shards == sorted(shards)  # monotone in doc_id
    assert len(set(shards)) > 1


def test_quality_shard_is_monotone_in_sort_order(spark, sf_dir):
    """The atom-aware quality shard must be non-decreasing along the
    (quality DESC, doc_id ASC) order — the contract the sharded running
    sum depends on — and must sub-shard the 0.0/0.25 atoms by id."""
    from rpa_etl_investing_spark.operators.prefix import SHARD
    from rpa_etl_investing_spark.operators.text import quality_score
    from rpa_etl_investing_spark.plans.curation_queries import _with_quality_shard

    docs = tbl(spark, sf_dir, "documents")
    q = quality_score(docs).select("doc_id", "quality")
    rows = (
        _with_quality_shard(docs.select("doc_id", "source").join(q, "doc_id"))
        .orderBy(F.desc("quality"), "doc_id")
        .select("quality", SHARD)
        .collect()
    )
    shards = [r[SHARD] for r in rows]
    assert shards == sorted(shards), "shard not monotone along sort order"
    atoms = {r[SHARD] for r in rows if r["quality"] in (0.0, 0.25)}
    if len([r for r in rows if r["quality"] in (0.0, 0.25)]) > 200:
        assert len(atoms) > 1, "quality atoms not sub-sharded"


def test_quality_filter_two_pass_equals_percent_rank(spark, sf_dir):
    """The integer-rank cutoff (rank <= floor(0.5*(n-1)) + 1) keeps
    exactly the rows percent_rank <= 0.5 keeps."""
    from pyspark.sql import Window

    from rpa_etl_investing_spark.operators.text import quality_score
    from rpa_etl_investing_spark.plans import QUERIES

    docs = tbl(spark, sf_dir, "documents")
    q = quality_score(docs).select("doc_id", "quality")
    w = Window.partitionBy("lang").orderBy(F.desc("quality"), "doc_id")
    expect = {
        (r["lang"], r["n_kept"])
        for r in docs.select("doc_id", "lang")
        .join(q, "doc_id")
        .withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") <= 0.5)
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"))
        .collect()
    }
    got = {
        (r["lang"], r["n_kept"])
        for r in QUERIES["curation_quality_filter"].fn(spark, sf_dir).collect()
    }
    assert got == expect


@pytest.mark.parametrize("n_shards", [1, 4, 32])
def test_exact_quantiles_match_sorted_reference(spark, n_shards):
    """Sharded exact selection equals the k-th element of the sorted
    list (k = floor(q*(n-1))+1) on data with heavy ties — including a
    constant column (degenerate single shard) and q at both edges."""
    from rpa_etl_investing_spark.operators.prefix import exact_quantiles

    vals = [float(x) for x in [5, 1, 3, 3, 3, 9, 2, 2, 8, 7, 3, 3, 1, 9]]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    qs = {"q0": 0.0, "q25": 0.25, "q50": 0.5, "q99": 0.99, "q100": 1.0}
    row = exact_quantiles(df, "x", qs, n_shards=n_shards).collect()[0]
    srt = sorted(vals)
    for lbl, q in qs.items():
        k = int(q * (len(vals) - 1)) + 1 if q < 1.0 else len(vals)
        import math

        k = math.floor(q * (len(vals) - 1)) + 1
        assert row[lbl] == srt[k - 1], (lbl, row[lbl], srt[k - 1])

    const = spark.createDataFrame([(4.0,)] * 6, ["x"])
    crow = exact_quantiles(const, "x", {"p50": 0.5}, n_shards=n_shards).collect()[0]
    assert crow["p50"] == 4.0


def test_exact_quantiles_grouped_matches_sorted_reference(spark):
    """Per-group sharded selection equals per-group sorted k-th picks,
    with groups of different sizes and cross-group value overlap."""
    import math

    from rpa_etl_investing_spark.operators.prefix import exact_quantiles

    data = {
        "a": [5.0, 1.0, 3.0, 3.0, 9.0, 2.0],
        "b": [4.0, 4.0, 4.0],
        "c": [7.0, 1.0, 8.0, 8.0, 2.0, 2.0, 6.0, 3.0],
    }
    rows = [(g, v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, ["g", "x"])
    got = {
        r["g"]: (r["p50"], r["p90"])
        for r in exact_quantiles(
            df, "x", {"p50": 0.5, "p90": 0.9}, n_shards=4, group_cols=["g"]
        ).collect()
    }
    for g, vs in data.items():
        srt = sorted(vs)
        for lbl, q in [("p50", 0.5), ("p90", 0.9)]:
            k = math.floor(q * (len(vs) - 1)) + 1
            idx = {"p50": 0, "p90": 1}[lbl]
            assert got[g][idx] == srt[k - 1], (g, lbl, got[g], srt)


def test_semantic_dedup_keeps_earliest_of_planted_pair(spark):
    from rpa_etl_investing_spark.operators.similarity import semantic_dedup

    # 4-dim corpus: ids 0-1 are (near-)orthogonal seeds; 10 duplicates 0,
    # 11 duplicates 1 (scaled — cosine is scale-invariant), 12 is unique.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (10, [2.0, 0.0, 0.0, 0.0]),
        (11, [0.0, 3.0, 0.0, 0.0]),
        (12, [0.0, 0.0, 1.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = semantic_dedup(df, n_centroids=2, threshold=0.95)
    got = {r.vec_id for r in kept.collect()}
    # 10 and 11 are dropped (cosine 1.0 to a lower-id cell-mate);
    # seeds and the unique vector survive.
    assert got == {0, 1, 12}


def test_semantic_dedup_is_single_pass_not_transitive(spark):
    from rpa_etl_investing_spark.operators.similarity import semantic_dedup

    # A chain a~b, b~c where a!~c: b drops (similar to a), and c ALSO
    # drops — single-pass greedy compares against all lower-id mates,
    # dropped or not (unlike a transitive-closure/survivor pass, which
    # would keep c once b is gone). Documents the SemDeDup semantics.
    import math

    def unit(theta):
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]

    rows = [
        (0, unit(0.0)),          # a (also the only centroid seed)
        (5, unit(0.5)),          # b: cos(a,b)=.878
        (6, unit(1.0)),          # c: cos(b,c)=.878, cos(a,c)=.540
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = {r.vec_id for r in semantic_dedup(df, n_centroids=1, threshold=0.8).collect()}
    assert kept == {0}


def test_segment_boilerplate_strip_planted(spark):
    from rpa_etl_investing_spark.operators.text import segment_boilerplate_strip

    boiler = "b1 b2 b3 b4"  # 4-word boilerplate segment shared by 2 docs
    rows = [
        (1, boiler + " u1 u2 u3 u4"),
        (2, boiler + " v1 v2 v3 v4"),
        (3, "w1 w2 w3 w4"),
        (4, boiler),  # pure boilerplate: must survive with empty text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in segment_boilerplate_strip(df, seg_words=4, max_df=1).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[1].clean_text == "u1 u2 u3 u4" and out[1].n_segments == 2
    assert out[2].clean_text == "v1 v2 v3 v4" and out[2].n_kept == 1
    assert out[3].clean_text == "w1 w2 w3 w4"  # unique doc untouched
    assert out[4].clean_text == "" and out[4].n_kept == 0 and out[4].n_segments == 1


def test_temperature_mix_damps_by_sqrt_and_keeps_smallest(spark):
    from rpa_etl_investing_spark.operators.sampling import temperature_mix

    # Source 'big' is 16x the size of 'small' → keep_frac sqrt(1/16)=0.25;
    # the smallest source must be kept in full (threshold 'g' keeps every
    # bucket).
    rows = [(i, "small", 10) for i in range(50)] + [
        (1000 + i, "big", 10) for i in range(800)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    kept = temperature_mix(df, "doc_id", "source", "n_chars")
    by_src = {r["source"]: r for r in
              kept.groupBy("source", "keep_frac").count().collect()}
    assert by_src["small"]["keep_frac"] == 1.0
    assert by_src["small"]["count"] == 50
    assert by_src["big"]["keep_frac"] == 0.25
    # hash filter is uniform: kept count concentrates near 800*0.25=200
    assert 140 <= by_src["big"]["count"] <= 260


def test_dsir_weights_separate_target_from_raw(spark, sf_dir):
    """The point of DSIR: documents drawn from the target distribution
    should, on average, score higher under the target/raw likelihood
    ratio than raw documents do. With the fixture's shared vocabulary the
    gap is small but the SIGN of the mean difference must be right."""
    from rpa_etl_investing_spark.operators.importance import dsir_weights

    docs = tbl(spark, sf_dir, "documents")
    w = dsir_weights(docs, F.col("lang") == "en").join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    rows = w.groupBy(F.col("lang") == "en").agg(
        (F.sum("q_weight") / F.sum("n_tokens")).alias("per_token")
    ).collect()
    per = {r[0]: r["per_token"] for r in rows}
    assert per[True] > per[False], per


def test_dsir_weights_stable_under_repartition(spark, sf_dir):
    """Exact-integer accumulation ⇒ partitioning can't move a weight."""
    from rpa_etl_investing_spark.operators.importance import dsir_weights

    docs = tbl(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["q_weight"] for r in dsir_weights(docs, F.col("lang") == "en").collect()}
    b = {
        r["doc_id"]: r["q_weight"]
        for r in dsir_weights(docs.repartition(17, "source"), F.col("lang") == "en").collect()
    }
    assert a == b


def test_gumbel_key_is_pure_function_of_doc_id(spark, sf_dir):
    """Resampling must be rerun-stable: the perturbation depends only on
    the key, never on partitioning, session, or time."""
    from rpa_etl_investing_spark.operators.importance import gumbel_quantized

    docs = tbl(spark, sf_dir, "documents")
    a = docs.select("doc_id", gumbel_quantized(F.col("doc_id")).alias("g"))
    b = docs.repartition(13).select("doc_id", gumbel_quantized(F.col("doc_id")).alias("g"))
    assert {(r["doc_id"], r["g"]) for r in a.collect()} == {
        (r["doc_id"], r["g"]) for r in b.collect()
    }
    # Gumbel(0,1) draws concentrate in [-2, 12] for 16-bit u granularity
    lo, hi = a.agg(F.min("g"), F.max("g")).first()
    assert lo >= -2_000_000 and hi <= 12_000_000, (lo, hi)


def test_gram_blocked_equals_flat(spark, sf_dir):
    """gram_matrix_blocked (Arrow block-pair integer matmul) must
    reproduce the flat explode path cell-for-cell — including with a
    block size that doesn't divide the dimension (ragged tail blocks)."""
    from rpa_etl_investing_spark.catalog import tbl
    from rpa_etl_investing_spark.operators.similarity import (
        gram_matrix,
        gram_matrix_blocked,
    )

    emb = tbl(spark, sf_dir, "embeddings")
    flat = {
        (r["i"], r["j"]): (r["s_q"], r["n_vecs"], r["gram"])
        for r in gram_matrix(emb).collect()
    }
    blocked = {
        (r["i"], r["j"]): (r["s_q"], r["n_vecs"], r["gram"])
        for r in gram_matrix_blocked(emb, block=7).collect()
    }
    assert flat == blocked and len(flat) > 0


def test_interpolated_quantiles_match_numpy(spark):
    """exact_quantiles_cont's type-7 contract against numpy's default
    (the definition the docstring names), on an adversarial tie-heavy
    array and several shard counts."""
    import numpy as np

    from rpa_etl_investing_spark.operators.prefix import exact_quantiles_cont

    vals = [float(v) for v in [1, 1, 1, 2, 5, 5, 7, 7, 7, 7, 9, 100, 100, 3]]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    for n_shards in (1, 4, 16):
        row = exact_quantiles_cont(
            df, "v", {"q25": 0.25, "q5": 0.5, "q99": 0.99}, n_shards=n_shards
        ).collect()[0]
        assert row["q25"] == np.percentile(vals, 25)
        assert row["q5"] == np.percentile(vals, 50)
        assert row["q99"] == np.percentile(vals, 99)
