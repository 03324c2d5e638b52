"""Product-quantization ANN pinned on planted Gaussian clusters: encode
determinism, code-size contract, and recall@k against the exact scorer."""

import numpy as np
import pyarrow as pa
import pytest


def _planted_ds(n_clusters=5, per=40, d=32, seed=5):
    """Each cluster: 1 query + 10 near-twins (tiny noise) + 29 spread
    points. The quantization error must not scramble a ranking the exact
    scorer can't distinguish either, so the TRUE neighbors are separated
    from the rest by far more than the PQ reconstruction error (~0.01)."""
    import ray.data as rd

    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, d) * 4
    vecs, ids = [], []
    for c in range(n_clusters):
        q = centers[c] + rng.randn(d) * 0.05
        near = q + rng.randn(10, d) * 0.02
        far = centers[c] + rng.randn(per - 11, d) * 1.5
        vecs.append(np.vstack([q[None, :], near, far]))
        ids.extend(range(c * per, c * per + per))
    mat = np.vstack(vecs).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in mat],
                                  pa.list_(pa.float32())),
        }
    )
    return rd.from_arrow(t).repartition(4), mat


@pytest.mark.usefixtures("ray_session")
class TestPq:
    def test_encode_shape_and_determinism(self):
        from entity_extractor_ray.stages.similarity import pq_encode, pq_fit

        ds, _ = _planted_ds()
        books = pq_fit(ds, m=8, k_cent=16)
        assert books.shape == (8, 16, 4)
        enc1 = {r["vec_id"]: tuple(r["codes"]) for r in pq_encode(ds, books).take_all()}
        enc2 = {r["vec_id"]: tuple(r["codes"]) for r in pq_encode(ds, books).take_all()}
        assert enc1 == enc2
        assert all(len(c) == 8 for c in enc1.values())

    def test_recall_vs_exact(self):
        from entity_extractor_ray.stages.similarity import knn_cosine, knn_pq

        ds, _ = _planted_ds()
        qids = [0, 45, 90, 135, 180]
        k = 10
        exact = knn_cosine(ds, query_ids=qids, k=k)
        if not hasattr(exact, "columns"):
            exact = exact.to_pandas()
        approx = knn_pq(ds, query_ids=qids, k=k, m=8, k_cent=16).to_pandas()
        recalls = []
        for q in qids:
            want = set(exact[exact["query_id"] == q]["vec_id"])
            got = set(approx[approx["query_id"] == q]["vec_id"])
            recalls.append(len(want & got) / k)
        # well-separated planted clusters: PQ must keep most true neighbors
        assert np.mean(recalls) >= 0.7, recalls

    def test_scores_bounded_like_cosine(self):
        from entity_extractor_ray.stages.similarity import knn_pq

        ds, _ = _planted_ds()
        df = knn_pq(ds, query_ids=[0], k=5).to_pandas()
        assert len(df) == 5
        assert (df["score"] <= 1.2).all() and (df["score"] >= -1.2).all()


@pytest.mark.usefixtures("ray_session")
def test_encode_once_serving_path_matches_inline():
    from entity_extractor_ray.stages.similarity import knn_pq, pq_encode, pq_fit

    ds, _ = _planted_ds()
    books = pq_fit(ds, m=8, k_cent=16)
    codes = pq_encode(ds, books).materialize()
    inline = knn_pq(ds, query_ids=[0, 90], k=8, m=8, k_cent=16).to_pandas()
    served = knn_pq(
        ds, query_ids=[0, 90], k=8, books=books, codes_ds=codes
    ).to_pandas()
    # identical codebooks + identical codes -> identical rankings
    assert inline.to_dict("records") == served.to_dict("records")
    with pytest.raises(ValueError):
        knn_pq(ds, query_ids=[0], books=books)  # codes_ds missing


@pytest.mark.usefixtures("ray_session")
def test_triplet_mining_planted_and_one_sided_drop():
    import ray.data as rd

    from entity_extractor_ray.stages.similarity import triplet_mining

    # anchor 0 (label 1): vec 50 is the same-label near-copy (positive),
    # vec 3 the closest other-label vector (hard negative). vec 100 is an
    # anchor whose label is unique -> no positive -> dropped.
    vecs = {
        0:   ([1.0, 0.0, 0.0], 1),
        50:  ([0.99, 0.14, 0.0], 1),     # pos for 0
        2:   ([0.0, 1.0, 0.0], 1),       # same label, far
        3:   ([0.95, 0.31, 0.0], 2),     # hard negative for 0
        4:   ([0.0, 0.0, 1.0], 2),       # other label, far
        100: ([0.5, 0.5, 0.5], 3),       # unique label -> one-sided anchor
    }
    t = pa.table(
        {
            "vec_id": pa.array(list(vecs), pa.int64()),
            "embedding": pa.array(
                [v for v, _ in vecs.values()], pa.list_(pa.float32())
            ),
            "label": pa.array([l for _, l in vecs.values()], pa.int32()),
        }
    )
    out = triplet_mining(rd.from_arrow(t).repartition(3), anchor_mod=50)
    rows = {int(r.anchor_id): (int(r.pos_id), int(r.neg_id))
            for r in out.itertuples()}
    # anchors are 0, 50, 100; 100 has no positive -> dropped
    assert set(rows) == {0, 50}
    assert rows[0] == (50, 3)
    assert rows[50] == (0, 3)
    a0 = out[out["anchor_id"] == 0].iloc[0]
    assert a0["pos_cos"] > a0["neg_cos"] > 0.9
