"""Deterministic sampling + KMV sketch: planted-data behavior tests."""

import numpy as np
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_bernoulli_sample_deterministic_rate():
    import ray.data as rd

    from entity_extractor_ray.stages.samples import bernoulli_sample_hash

    df = pd.DataFrame({"k": np.arange(20000), "v": np.arange(20000) * 2})
    out1 = bernoulli_sample_hash(rd.from_pandas(df), "k", hex_prefix_lt="1a").to_pandas()
    out2 = bernoulli_sample_hash(rd.from_pandas(df), "k", hex_prefix_lt="1a").to_pandas()
    # identical row set across runs
    assert sorted(out1["k"]) == sorted(out2["k"])
    # rate ~ 0x1a/256 = 10.16%, binomial 3-sigma band at n=20k is ~±0.7pp
    rate = len(out1) / len(df)
    assert 0.08 < rate < 0.125
    # columns pass through untouched
    assert (out1["v"] == out1["k"] * 2).all()


@pytest.mark.usefixtures("ray_session")
def test_stratified_sample_per_group_k():
    import ray.data as rd

    from entity_extractor_ray.stages.samples import stratified_sample

    df = pd.DataFrame(
        {"g": np.repeat(["a", "b", "c"], 300), "k": np.arange(900)}
    )
    out = stratified_sample(
        rd.from_pandas(df), "g", "k", k=25, keep_cols=["g", "k"], n_buckets=4
    ).to_pandas()
    sizes = out.groupby("g")["k"].count()
    assert dict(sizes) == {"a": 25, "b": 25, "c": 25}
    # deterministic: rerun picks the same rows
    out2 = stratified_sample(
        rd.from_pandas(df), "g", "k", k=25, keep_cols=["g", "k"], n_buckets=4
    ).to_pandas()
    assert sorted(map(tuple, out.values.tolist())) == sorted(
        map(tuple, out2.values.tolist())
    )
    # a group smaller than k returns all its rows
    small = pd.DataFrame({"g": ["z"] * 5, "k": range(5)})
    out3 = stratified_sample(
        rd.from_pandas(small), "g", "k", k=25, keep_cols=["g", "k"], n_buckets=2
    ).to_pandas()
    assert len(out3) == 5


@pytest.mark.usefixtures("ray_session")
def test_kmv_exact_below_k():
    import ray.data as rd

    from entity_extractor_ray.stages.sketches import approx_distinct_by

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y"], 5000),
            "u": rng.integers(0, 400, 5000),  # <= 400 distinct per group << k
        }
    )
    out = approx_distinct_by(
        rd.from_pandas(df), "g", "u", k=4096, out_col="n", n_buckets=4
    ).to_pandas()
    exp = df.groupby("g")["u"].nunique()
    got = dict(zip(out["g"], out["n"]))
    assert got == dict(exp)
    assert out["exact"].all()


@pytest.mark.usefixtures("ray_session")
def test_frequent_tokens_exact_and_mg_regimes():
    import ray.data as rd

    from entity_extractor_ray.stages.sketches import frequent_tokens

    # skewed corpus: 'zzz' dominates, long uniform tail
    docs = ["zzz " * 30 + f"tail{i} tail{i+1}" for i in range(200)]
    df = pd.DataFrame({"doc_id": range(200), "text": docs})

    exact = frequent_tokens(rd.from_pandas(df), top_n=5, k=65536).to_pandas()
    assert exact["token"].iloc[0] == "zzz" and exact["n"].iloc[0] == 6000

    # k small enough to force MG decrements: counts become lower bounds,
    # but the dominant heavy hitter must survive on top
    approx = frequent_tokens(rd.from_pandas(df), top_n=5, k=16).to_pandas()
    assert approx["token"].iloc[0] == "zzz"
    assert approx["n"].iloc[0] <= 6000  # lower bound, never an overcount


@pytest.mark.usefixtures("ray_session")
def test_kmv_estimates_above_k():
    import ray.data as rd

    from entity_extractor_ray.stages.sketches import approx_distinct_by

    n_true = 20000
    df = pd.DataFrame({"g": ["hot"] * n_true, "u": np.arange(n_true)})
    out = approx_distinct_by(
        rd.from_pandas(df), "g", "u", k=256, out_col="n", n_buckets=2
    ).to_pandas()
    assert not out["exact"].iloc[0]
    est = int(out["n"].iloc[0])
    # k=256 -> se ~ 1/sqrt(254) ~ 6.3%; allow 4 sigma
    assert abs(est - n_true) / n_true < 0.25


@pytest.mark.usefixtures("ray_session")
def test_pack_documents_straddle_and_order():
    import ray.data as rd

    from entity_extractor_ray.stages.textstats import pack_documents

    # "a b c" = 3 tokens per doc; budget 5: doc0 starts at 0 (bin 0),
    # doc1 starts at 3 (bin 0, straddles into bin 1), doc2 starts at 6
    # (bin 1) — straddlers belong to their STARTING bin
    df = pd.DataFrame(
        {
            "doc_id": [2, 0, 1, 3],  # arrival order != doc_id order
            "text": ["a b c"] * 4,
            "lang": ["en"] * 4,
        }
    )
    out = (
        pack_documents(rd.from_pandas(df).repartition(2), budget=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["bin"].tolist() == [0, 0, 1, 1]
    assert out["n_tokens"].tolist() == [3, 3, 3, 3]


@pytest.mark.usefixtures("ray_session")
def test_assign_splits_deterministic_and_partitioned():
    import ray.data as rd

    from entity_extractor_ray.stages.samples import assign_splits

    df = pd.DataFrame({"doc_id": np.arange(1000)})
    a = assign_splits(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
    b = assign_splits(rd.from_pandas(df).repartition(7)).to_pandas().sort_values("doc_id")
    assert a["split"].tolist() == b["split"].tolist()  # partition-invariant
    frac = a["split"].value_counts(normalize=True)
    assert 0.7 < frac["train"] < 0.9 and frac["val"] < 0.2 and frac["test"] < 0.2


# -------------------------------------------------- approximate quantiles

def test_compact_bins_invariants():
    from entity_extractor_ray.stages.sketches import _compact_bins

    rng = np.random.default_rng(3)
    x = np.round(rng.lognormal(5, 1.2, 50_000), 2)
    vals, cnts = np.unique(x, return_counts=True)
    cv, cc = _compact_bins(vals, cnts, 256)
    assert len(cv) == 256
    assert cc.sum() == len(x)                      # mass preserved
    assert np.all(np.diff(cv) > 0)                 # still sorted ascending
    assert vals[0] <= cv[0] and cv[-1] <= vals[-1]  # value bounds preserved
    # no-op below the cap
    sv, sc = _compact_bins(vals[:100], cnts[:100], 256)
    assert np.array_equal(sv, vals[:100]) and np.array_equal(sc, cnts[:100])


def test_compact_bins_merge_accuracy():
    """Map-side compaction + merge + reduce compaction keeps quantile rank
    error far below the ~2/k bound on a heavy-tailed 200k-value stream."""
    from entity_extractor_ray.stages.sketches import _compact_bins

    rng = np.random.default_rng(0)
    x = np.round(rng.lognormal(5, 1.2, 200_000), 2)
    k = 512
    merged: dict = {}
    for ch in np.array_split(rng.permutation(x), 20):
        v, c = np.unique(ch, return_counts=True)
        v, c = _compact_bins(v, c, k)
        for vv, cc in zip(v, c):
            merged[vv] = merged.get(vv, 0) + cc
    mv = np.array(sorted(merged))
    mc = np.array([merged[v] for v in mv])
    mv, mc = _compact_bins(mv, mc, k)
    assert mc.sum() == len(x)
    cum = mc.cumsum()
    xs = np.sort(x)
    for q in (0.5, 0.9, 0.99):
        est = mv[np.searchsorted(cum, int(np.ceil(q * len(x))))]
        rank_err = abs(np.searchsorted(xs, est, side="right") / len(xs) - q)
        assert rank_err < 0.02, (q, rank_err)


@pytest.mark.usefixtures("ray_session")
def test_approx_quantiles_exact_regime():
    import ray.data as rd

    from entity_extractor_ray.stages.sketches import approx_quantiles_by

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b"], 5000),
            "v": rng.integers(0, 300, 5000),  # < k distinct -> exact
        }
    )
    out = (
        approx_quantiles_by(rd.from_pandas(df).repartition(5), "g", "v",
                            qs=(0.5, 0.9), k=4096, n_buckets=2)
        .to_pandas().set_index("g")
    )
    for g, sub in df.groupby("g"):
        xs = np.sort(sub["v"].to_numpy())
        assert out.loc[g, "exact"]
        assert out.loc[g, "n"] == len(xs)
        for q, col in [(0.5, "p50"), (0.9, "p90")]:
            assert out.loc[g, col] == float(xs[int(np.ceil(q * len(xs))) - 1])


@pytest.mark.usefixtures("ray_session")
def test_approx_quantiles_above_cap_flags_and_estimates():
    import ray.data as rd

    from entity_extractor_ray.stages.sketches import approx_quantiles_by

    rng = np.random.default_rng(1)
    x = np.round(rng.lognormal(5, 1.0, 30_000), 3)  # ~30k distinct > k
    df = pd.DataFrame({"g": ["hot"] * len(x), "v": x})
    out = approx_quantiles_by(
        rd.from_pandas(df).repartition(4), "g", "v", qs=(0.5, 0.9),
        k=512, n_buckets=2,
    ).to_pandas()
    assert not out["exact"].iloc[0]
    assert out["n"].iloc[0] == len(x)
    xs = np.sort(x)
    for q, col in [(0.5, "p50"), (0.9, "p90")]:
        est = out[col].iloc[0]
        rank_err = abs(np.searchsorted(xs, est, side="right") / len(xs) - q)
        assert rank_err < 0.02, (q, rank_err)


# ------------------------------------------------------ mixture rebalancing

@pytest.mark.usefixtures("ray_session")
def test_rebalance_sources_integer_mixture():
    import ray.data as rd

    from entity_extractor_ray.stages.samples import rebalance_sources

    df = pd.DataFrame(
        {
            "doc_id": np.arange(100),
            "source": ["A"] * 50 + ["B"] * 30 + ["C"] * 20,
        }
    )
    # weights A:3 B:1 -> units = min(50//3, 30//1) = 16 -> quotas A=48 B=16;
    # C unweighted -> dropped entirely
    out = rebalance_sources(
        rd.from_pandas(df).repartition(4), weights={"A": 3, "B": 1}, n_buckets=2
    ).to_pandas()
    got = out["source"].value_counts().to_dict()
    assert got == {"A": 48, "B": 16}
    # deterministic across runs and partitionings
    out2 = rebalance_sources(
        rd.from_pandas(df).repartition(9), weights={"A": 3, "B": 1}, n_buckets=3
    ).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


@pytest.mark.usefixtures("ray_session")
def test_rebalance_sources_infeasible_source_zeroes_all():
    import ray.data as rd

    from entity_extractor_ray.stages.samples import rebalance_sources

    df = pd.DataFrame({"doc_id": np.arange(10), "source": ["A"] * 10})
    # B demanded but absent: units computed over PRESENT weighted sources
    # only -> A still sampled at its own ratio
    out = rebalance_sources(
        rd.from_pandas(df), weights={"A": 2, "B": 1}, n_buckets=2
    ).to_pandas()
    assert out["source"].value_counts().to_dict() == {"A": 10}


# ------------------------------------------------------------- table profiler

@pytest.mark.usefixtures("ray_session")
def test_profile_table_exact_census():
    import ray.data as rd

    from entity_extractor_ray.stages.profile import profile_table

    df = pd.DataFrame(
        {
            "a": [1, 2, 2, None, 5],
            "s": ["x", None, "b", "b", "a"],
            "t": pd.to_datetime(
                ["2024-01-01", "2024-06-01", None, "2023-12-31", "2024-01-01"]
            ).astype("datetime64[us]"),
        }
    )
    out = (
        profile_table(rd.from_pandas(df).repartition(3), n_buckets=2)
        .to_pandas().set_index("col")
    )
    assert out.loc["a", "n_rows"] == 5 and out.loc["a", "n_null"] == 1
    assert out.loc["a", "n_distinct"] == 3 and out.loc["a", "exact"]
    assert out.loc["a", "min_num"] == 1.0 and out.loc["a", "max_num"] == 5.0
    assert pd.isna(out.loc["a", "min_str"])
    assert out.loc["s", "min_str"] == "a" and out.loc["s", "max_str"] == "x"
    assert out.loc["s", "n_distinct"] == 3
    assert pd.isna(out.loc["s", "min_num"])
    ts_min = pd.Timestamp("2023-12-31").value // 1000  # ns -> us
    assert out.loc["t", "min_num"] == float(ts_min)
    assert out.loc["t", "n_null"] == 1 and out.loc["t", "n_distinct"] == 3


@pytest.mark.usefixtures("ray_session")
def test_profile_table_kmv_regime():
    import ray.data as rd

    from entity_extractor_ray.stages.profile import profile_table

    n = 5000
    df = pd.DataFrame({"u": np.arange(n, dtype=np.int64)})
    out = profile_table(rd.from_pandas(df).repartition(4), k=256,
                        n_buckets=2).to_pandas()
    row = out.iloc[0]
    assert not row["exact"]
    assert abs(row["n_distinct"] - n) / n < 0.25  # ~4 sigma at k=256
    assert row["min_num"] == 0.0 and row["max_num"] == float(n - 1)


def test_hll_bit_length_exact_at_float_trap_boundaries():
    from entity_extractor_ray.stages.sketches import _bit_length

    # 2^k - 1 for large k is where float64 log2 rounds UP to k; the shift
    # cascade must stay at k-1
    v = np.array(
        [1, 2, 3, 4, 7, 8, (1 << 50) - 1, 1 << 50, (1 << 51) - 1],
        dtype=np.uint64,
    )
    assert list(_bit_length(v)) == [0, 1, 1, 2, 2, 3, 49, 50, 50]


def test_hll_partial_merge_is_union():
    from entity_extractor_ray.stages.sketches import _hll_estimate, _hll_partial

    a = _hll_partial([f"u{i}" for i in range(0, 3000)])
    b = _hll_partial([f"u{i}" for i in range(1500, 6000)])
    whole = _hll_partial([f"u{i}" for i in range(0, 6000)])
    assert np.array_equal(np.maximum(a, b), whole)
    # idempotent and commutative by construction; estimate within 3 sigma
    n, est = 6000, _hll_estimate(whole)
    assert abs(est - n) / n < 3 * 1.04 / np.sqrt(whole.size)


@pytest.mark.usefixtures("ray_session")
def test_hll_distinct_by_matches_serial_reference():
    import ray.data as rd

    from entity_extractor_ray.stages.sketches import (
        _hll_estimate,
        _hll_partial,
        hll_distinct_by,
    )

    rng = np.random.RandomState(5)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 20000),
            "v": [f"u{rng.randint(0, 4000)}" for _ in range(20000)],
        }
    )
    out = (
        hll_distinct_by(rd.from_pandas(df).repartition(8), "g", "v",
                        n_buckets=2)
        .to_pandas()
        .set_index("g")["n_distinct_est"]
        .to_dict()
    )
    for g, sub in df.groupby("g"):
        exact = sub["v"].nunique()
        # distributed == serial single-pass reference, REGISTER-exact
        want = _hll_estimate(_hll_partial(sub["v"].drop_duplicates().to_numpy()))
        assert out[g] == want
        assert abs(out[g] - exact) / exact < 3 * 1.04 / np.sqrt(1 << 12)


@pytest.mark.usefixtures("ray_session")
def test_frequent_bigrams_exact_and_mg_regimes():
    import ray.data as rd

    from entity_extractor_ray.stages.sketches import frequent_bigrams

    # 'aa bb' appears 3x per doc (aa bb aa bb aa bb), tail bigrams once
    docs = ["aa bb " * 3 + f"t{i} u{i}" for i in range(100)]
    df = pd.DataFrame({"doc_id": range(100), "text": docs})

    exact = frequent_bigrams(rd.from_pandas(df), top_n=3, k=65536).to_pandas()
    # per doc: 'aa bb' x3, 'bb aa' x2, 'bb t{i}' x1, 't{i} u{i}' x1
    assert exact["bigram"].iloc[0] == "aa bb" and exact["n"].iloc[0] == 300
    assert exact["bigram"].iloc[1] == "bb aa" and exact["n"].iloc[1] == 200

    approx = frequent_bigrams(rd.from_pandas(df), top_n=3, k=8).to_pandas()
    assert approx["bigram"].iloc[0] == "aa bb"
    assert approx["n"].iloc[0] <= 300  # MG lower bound, never an overcount


@pytest.mark.usefixtures("ray_session")
def test_zipf_slope_matches_serial_and_guards():
    import math
    import random

    import ray.data as rd

    from entity_extractor_ray.stages.textstats import (
        _VOCAB_RE,
        _exact_int_sum,
        zipf_slope_by_source,
    )

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(40)]
    # zipf-ish draws for source A/B; source 'one' has a single distinct
    # term -> zero rank variance -> NULL slope (the den==0 guard)
    rows = []
    for i in range(120):
        src = "A" if i % 2 else "B"
        n = rng.randint(3, 30)
        toks = [vocab[min(int(rng.paretovariate(1.0)), 39)] for _ in range(n)]
        rows.append((i, " ".join(toks), src))
    rows.append((900, "solo solo solo", "one"))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "source"])

    out = zipf_slope_by_source(rd.from_pandas(df).repartition(4)).to_pandas()
    got = {r.source: (r.vocab_size, r.zipf_slope) for r in out.itertuples()}

    # serial reference with the same microlog grid
    for src in ("A", "B", "one"):
        counts: dict = {}
        for _, text, s in rows:
            if s != src:
                continue
            for t in _VOCAB_RE.findall(text.lower()):
                counts[t] = counts.get(t, 0) + 1
        ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        lx = [math.floor(math.log(r + 1) * 1e6) for r in range(len(ordered))]
        ly = [math.floor(math.log(c) * 1e6) for _, c in ordered]
        v = len(ordered)
        sx, sy = sum(lx), sum(ly)
        sxx = sum(x * x for x in lx)
        sxy = sum(x * y for x, y in zip(lx, ly))
        den = v * sxx - sx * sx
        exp = float(v * sxy - sx * sy) / float(den) if den else None
        assert got[src][0] == v
        if exp is None:
            assert got[src][1] is None or pd.isna(got[src][1])
        else:
            assert got[src][1] == exp  # bit-exact: same integer stats

    # natural-ish text should fit a clearly negative slope
    assert got["A"][1] < -0.3 and got["B"][1] < -0.3

    # the exact big-int sum survives magnitudes that overflow an int64 sum
    big = np.full(1 << 16, (1 << 62) // (1 << 14), dtype=np.int64)
    assert _exact_int_sum(big) == int(big[0]) * big.size


@pytest.mark.usefixtures("ray_session")
def test_weighted_reservoir_serial_equality_and_partition_invariance():
    import math

    import ray.data as rd

    from entity_extractor_ray.stages.samples import (
        _U64_SCALE,
        _md5_lower64,
        weighted_reservoir_sample,
    )

    n = 300
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            # heavy tail of weights incl. zero/negative rows to exercise
            # the w > 0 guard
            "n_chars": np.where(np.arange(n) % 7 == 0, 0, (np.arange(n) % 50) + 1).astype(np.int64),
        }
    )
    k = 40

    def serial(df):
        rows = []
        for d, w in zip(df["doc_id"], df["n_chars"]):
            if w <= 0:
                continue
            u = int(_md5_lower64([d])[0]) / _U64_SCALE
            rows.append((math.log(u) / w, d, w))
        rows.sort(key=lambda r: (-r[0], r[1]))
        return [(d, w, math.floor(es * 1e6) / 1e6) for es, d, w in rows[:k]]

    exp = serial(df)
    for nparts in (1, 4, 13):
        out = weighted_reservoir_sample(
            rd.from_pandas(df).repartition(nparts), weight_col="n_chars", k=k
        ).to_pandas()
        got = list(zip(out["doc_id"], out["n_chars"], out["es_key"]))
        assert [(int(a), int(b), c) for a, b, c in got] == exp

    # the draw is weight-sensitive: members' mean weight must exceed the
    # population mean (heavier rows are proportionally likelier)
    w_pop = df.loc[df["n_chars"] > 0, "n_chars"].mean()
    w_sel = np.mean([w for _, w, _ in exp])
    assert w_sel > w_pop


@pytest.mark.usefixtures("ray_session")
def test_temperature_rebalance_quota_math_and_tail_upweight():
    import math

    import ray.data as rd

    from entity_extractor_ray.stages.samples import temperature_rebalance

    # head source 320 docs, mid 80, tail 20: alpha=0.5 quotas must follow
    # sqrt proportions (integer micro-sqrt grid), not raw proportions
    sizes = {"head": 320, "mid": 80, "tail": 20}
    rows, i = [], 0
    for s, n in sizes.items():
        for _ in range(n):
            rows.append((i, s))
            i += 1
    df = pd.DataFrame(rows, columns=["doc_id", "source"])
    budget = 100
    out = temperature_rebalance(
        rd.from_pandas(df).repartition(4), budget=budget
    ).to_pandas()
    got = out.groupby("source").size().to_dict()

    r = {s: math.floor(math.sqrt(n) * 1e6) for s, n in sizes.items()}
    tot = sum(r.values())
    exp = {s: (budget * v) // tot for s, v in r.items()}
    assert got == exp
    # sqrt flattening: tail share of the sample strictly exceeds its
    # corpus share; head share shrinks
    assert got["tail"] / budget > sizes["tail"] / 420
    assert got["head"] / budget < sizes["head"] / 420
    # quota > availability keeps everything, never invents rows
    out2 = temperature_rebalance(
        rd.from_pandas(df).repartition(4), budget=100000
    ).to_pandas()
    assert out2.groupby("source").size().to_dict() == {
        s: min(sizes[s], (100000 * r[s]) // tot) for s in sizes
    }


@pytest.mark.usefixtures("ray_session")
def test_psi_drift_planted_shift_and_empty_bins():
    import math

    import ray.data as rd

    from entity_extractor_ray.stages.profile import psi_drift

    # side A (even ids) concentrated in bin 0, side B (odd ids) in bin 5;
    # bin 9 empty on side B only -> NULL psi_term there
    rows = []
    i = 0
    for _ in range(40):
        rows.append((2 * i, 50)); i += 1          # A -> bin 0
    for _ in range(40):
        rows.append((2 * i + 1, 550)); i += 1     # B -> bin 5
    rows.append((2 * i, 50))                      # one more A in bin 0
    rows.append((2 * i + 2, 2500))                # A-only in bin 9 (cap)
    rows.append((2 * i + 5, 50))                  # one B in bin 0
    df = pd.DataFrame(rows, columns=["doc_id", "n_chars"])
    out = psi_drift(rd.from_pandas(df).repartition(3)).to_pandas()
    out = out.set_index("bin_id")

    ta = (df["doc_id"] % 2 == 0).sum()
    tb = (df["doc_id"] % 2 == 1).sum()
    # bin 0: both sides present -> exact serial psi term
    p, q = 41 / ta, 1 / tb
    exp = math.floor((p - q) * math.log(p / q) * 1e6) / 1e6
    assert out.loc[0, "psi_term"] == exp
    assert out.loc[0, "n_a"] == 41 and out.loc[0, "n_b"] == 1
    # bin 5: B-only -> NULL; bin 9: A-only -> NULL; bin 3: empty-empty -> NULL
    for b in (5, 9, 3):
        assert pd.isna(out.loc[b, "psi_term"])
    # a large shift reads as large total PSI over defined terms
    total = out["psi_term"].dropna().sum()
    assert total > 0.25
