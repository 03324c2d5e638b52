"""Distributed k-means + SemDeDup semantic dedup: planted-structure
recovery, distributed-vs-serial equality, partition invariance, and the
logged cluster cap."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from entity_extractor_ray.stages import cluster as cl


def _blob_table(n_per: int = 40, n_blobs: int = 3, dim: int = 16, seed: int = 7):
    """Well-separated unit blobs around near-orthogonal directions, so the
    true partition is unambiguous and layout-invariant."""
    rng = np.random.RandomState(seed)
    centers = np.zeros((n_blobs, dim))
    for b in range(n_blobs):
        centers[b, 4 * b] = 1.0  # orthogonal axes
    rows, labels = [], []
    for b in range(n_blobs):
        pts = centers[b] + 0.05 * rng.randn(n_per, dim)
        rows.append(pts)
        labels += [b] * n_per
    mat = np.vstack(rows)
    ids = np.arange(len(mat), dtype=np.int64)
    return (
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array([r.tolist() for r in mat], pa.list_(pa.float64())),
            }
        ),
        np.asarray(labels),
        mat,
    )


@pytest.fixture(scope="module")
def blobs(ray_session):
    import ray.data as rd

    tbl, labels, mat = _blob_table()
    return rd.from_arrow(tbl), labels, mat


def _pair_partition_equal(a: np.ndarray, b: np.ndarray) -> bool:
    """Same partition up to label permutation: co-membership matrices equal."""
    return bool(((a[:, None] == a[None, :]) == (b[:, None] == b[None, :])).all())


class TestKMeans:
    def test_recovers_planted_blobs(self, blobs):
        ds, labels, _ = blobs
        out = cl.kmeans_embeddings(ds, k=3, n_iter=8).to_pandas()
        out = out.sort_values("vec_id")
        assert len(out) == len(labels)
        assert _pair_partition_equal(out["cluster"].to_numpy(), labels)
        assert (out["cos_sim"] > 0.9).all()  # tight blobs: high centroid cos

    def test_distributed_fit_matches_serial(self, blobs):
        ds, _, mat = blobs
        dist = cl.kmeans_fit(ds, k=3, n_iter=6, seed=13, init_sample_cap=4096)
        init = cl._init_centroids(mat, 3, 13)  # same stride sample = full set
        serial = cl._lloyd_local(mat, init, 6)
        # same float math up to summation order (blocks sum independently)
        assert np.allclose(np.sort(dist, axis=0), np.sort(serial, axis=0), atol=1e-9)

    def test_partition_invariance(self, blobs):
        ds, _, _ = blobs
        a = cl.kmeans_embeddings(ds, k=3, n_iter=5).to_pandas().sort_values("vec_id")
        b = (
            cl.kmeans_embeddings(ds.repartition(7), k=3, n_iter=5)
            .to_pandas()
            .sort_values("vec_id")
        )
        assert _pair_partition_equal(a["cluster"].to_numpy(), b["cluster"].to_numpy())
        assert np.allclose(a["cos_sim"].to_numpy(), b["cos_sim"].to_numpy(), atol=1e-6)

    def test_sample_fit_recovers_blobs(self, blobs):
        ds, labels, _ = blobs
        out = cl.kmeans_embeddings(ds, k=3, n_iter=8, distributed=False).to_pandas()
        out = out.sort_values("vec_id")
        assert _pair_partition_equal(out["cluster"].to_numpy(), labels)


def _semdedup_serial(ids, mat, clusters, threshold):
    """Brute-force reference: per cluster, row is dup iff an earlier-id row
    in the same cluster has cos >= threshold; dup_of = lowest such id."""
    nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    keep = {}
    dup_of = {}
    for c in np.unique(clusters):
        members = np.flatnonzero(clusters == c)
        members = members[np.argsort(ids[members])]
        for pos, r in enumerate(members):
            earlier = members[:pos]
            over = [e for e in earlier if nm[r] @ nm[e] >= threshold]
            keep[ids[r]] = not over
            dup_of[ids[r]] = int(ids[over[0]]) if over else -1
    return keep, dup_of


class TestSemanticDedup:
    def test_planted_duplicates_flagged(self, ray_session):
        import ray.data as rd

        tbl, labels, mat = _blob_table(n_per=20)
        # plant near-copies: ids 1000+i duplicate row i (tiny noise)
        rng = np.random.RandomState(11)
        dup_rows = mat[:8] + 1e-4 * rng.randn(8, mat.shape[1])
        full_ids = np.concatenate([np.arange(len(mat)), 1000 + np.arange(8)])
        full_mat = np.vstack([mat, dup_rows])
        ds = rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(full_ids, pa.int64()),
                    "embedding": pa.array(
                        [r.tolist() for r in full_mat], pa.list_(pa.float64())
                    ),
                }
            )
        )
        out = cl.semantic_dedup(ds, threshold=0.999, k=3, n_iter=6).to_pandas()
        out = out.set_index("vec_id")
        for i in range(8):
            assert not out.loc[1000 + i, "keep"], f"planted dup {i} survived"
            assert out.loc[1000 + i, "dup_of"] == i
        # originals survive (blob noise at 0.05 stays below 0.999 cos)
        assert out.loc[np.arange(len(mat)), "keep"].all()

        # and the distributed result matches the serial reference exactly
        assigned = (
            cl.kmeans_assign(
                ds, cl.kmeans_fit(ds, k=3, n_iter=6), keep_embedding=False
            )
            .to_pandas()
            .sort_values("vec_id")
        )
        order = np.argsort(full_ids)
        keep_ref, dup_ref = _semdedup_serial(
            full_ids[order], full_mat[order],
            assigned["cluster"].to_numpy(), 0.999,
        )
        for vid in full_ids:
            assert out.loc[vid, "keep"] == keep_ref[vid]
            assert out.loc[vid, "dup_of"] == dup_ref[vid]

    def test_cluster_cap_logged_and_bounded(self, ray_session):
        import ray.data as rd

        tbl, _, _ = _blob_table(n_per=30)
        ds = rd.from_arrow(tbl)
        out = cl.semantic_dedup(
            ds, threshold=0.999, k=3, n_iter=4, cluster_cap=10
        ).to_pandas()
        # every cluster truncated to the cap; output bounded, nothing crashes
        assert (out.groupby("cluster").size() <= 10).all()
        assert len(out) == 30  # 3 clusters x cap


# ------------------------------------------------------------------ PCA

def _planted_lowrank(n=2000, d=64, seed=5):
    rng = np.random.default_rng(seed)
    u = np.zeros(d); u[0] = 1.0
    v = np.zeros(d); v[1] = 1.0
    a = rng.normal(0, 5.0, n)
    b = rng.normal(0, 2.0, n)
    noise = rng.normal(0, 0.05, (n, d))
    return a[:, None] * u + b[:, None] * v + noise


@pytest.mark.usefixtures("ray_session")
def test_pca_recovers_planted_axes_and_matches_numpy():
    import ray.data as rd

    from entity_extractor_ray.stages.cluster import pca_embeddings, pca_fit

    mat = _planted_lowrank()
    df = pd.DataFrame({"vec_id": np.arange(len(mat)),
                       "embedding": [r.astype(np.float32) for r in mat]})
    ds = rd.from_pandas(df).repartition(4)
    mu, comps, ratio = pca_fit(ds, n_components=2)
    # recovered axes align with the planted ones (up to sign, which the
    # canonicalization fixes to positive-largest-loading)
    assert abs(comps[0, 0]) > 0.99 and comps[0, 0] > 0
    assert abs(comps[1, 1]) > 0.99 and comps[1, 1] > 0
    assert ratio[0] > ratio[1] > 0.1
    # projection equals serial numpy PCA under the same sign convention
    f32 = mat.astype(np.float32).astype(np.float64)
    mu_np = f32.mean(axis=0)
    cov = np.cov(f32.T)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:2]
    c_np = evecs[:, order].T
    for i in range(2):
        j = int(np.argmax(np.abs(c_np[i])))
        if c_np[i, j] < 0:
            c_np[i] = -c_np[i]
    proj_np = (f32 - mu_np) @ c_np.T
    out = (pca_embeddings(ds, n_components=2).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    assert np.allclose(out["pc1"].to_numpy(), proj_np[:, 0], atol=1e-6)
    assert np.allclose(out["pc2"].to_numpy(), proj_np[:, 1], atol=1e-6)


@pytest.mark.usefixtures("ray_session")
def test_pca_partition_invariant():
    import ray.data as rd

    from entity_extractor_ray.stages.cluster import pca_embeddings

    mat = _planted_lowrank(n=500, seed=9)
    df = pd.DataFrame({"vec_id": np.arange(len(mat)),
                       "embedding": [r.astype(np.float32) for r in mat]})
    a = (pca_embeddings(rd.from_pandas(df).repartition(2)).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    b = (pca_embeddings(rd.from_pandas(df).repartition(7)).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    assert np.allclose(a["pc1"], b["pc1"], atol=1e-6)
    assert np.allclose(a["pc2"], b["pc2"], atol=1e-6)


@pytest.mark.usefixtures("ray_session")
def test_kcenter_coreset_matches_serial_greedy():
    import ray.data as rd

    from entity_extractor_ray.stages.cluster import kcenter_coreset

    rng = np.random.RandomState(4)
    n, d, k = 120, 8, 7
    x = rng.randn(n, d).astype(np.float32)
    # plant an extreme outlier so the first pick is unambiguous
    x[17] *= 6.0
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(
        pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array(list(x), pa.list_(pa.float32()))})
    ).repartition(5)

    got = kcenter_coreset(ds, k=k)

    # serial greedy with the same float64 expansion + tie rules
    xf = x.astype(np.float64)
    nrm = (xf * xf).sum(axis=1)
    seed = np.lexsort((ids, -nrm))[0]
    chosen = [seed]
    dists = [0.0]
    for _ in range(1, k):
        c = xf[chosen]
        d2 = np.maximum(
            nrm[:, None] + (c * c).sum(axis=1)[None, :] - 2.0 * (xf @ c.T), 0.0
        ).min(axis=1)
        best = np.lexsort((ids, -d2))[0]
        chosen.append(int(best))
        dists.append(float(np.sqrt(d2[best])))
    assert got["vec_id"].tolist() == chosen
    assert got["rank"].tolist() == list(range(k))
    assert np.allclose(got["dist"].to_numpy(), dists)
    # coverage radius is weakly decreasing after the seed row
    t = got["dist"].to_numpy()[1:]
    assert (np.diff(t) <= 1e-12).all()


@pytest.mark.usefixtures("ray_session")
def test_kcenter_coreset_fewer_distinct_points_than_k():
    import ray.data as rd

    from entity_extractor_ray.stages.cluster import kcenter_coreset

    # 3 distinct locations, k=10: must stop at 3 rows, never emit dups
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 2.0]] * 4, dtype=np.float32)
    ds = rd.from_arrow(
        pa.table({"vec_id": pa.array(np.arange(12), pa.int64()),
                  "embedding": pa.array(list(pts), pa.list_(pa.float32()))})
    ).repartition(3)
    out = kcenter_coreset(ds, k=10)
    assert len(out) == 3
    assert len(set(out["vec_id"])) == 3
