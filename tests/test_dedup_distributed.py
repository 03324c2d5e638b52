"""Round-2 distributed-dedup semantics: min-label propagation (connected
components as groupby rounds), join-based Jaccard verification, and the
exact inverted-index n-gram Jaccard operator vs its DuckDB oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _pairs_ds(pairs):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "id_a": pa.array([p[0] for p in pairs], pa.int64()),
                "id_b": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    )


@pytest.mark.usefixtures("ray_session")
class TestMinLabelPropagation:
    def test_chain_needs_multiple_rounds(self):
        """A long path 1-2-3-...-8 forces label 1 to walk the diameter."""
        from entity_extractor_ray.stages.dedup import propagate_min_labels

        chain = [(i, i + 1) for i in range(1, 8)]
        labels = {r["node"]: r["label"] for r in propagate_min_labels(_pairs_ds(chain), n_buckets=3).take_all()}
        assert labels == {i: 1 for i in range(1, 9)}

    def test_multiple_components(self):
        from entity_extractor_ray.stages.dedup import propagate_min_labels

        pairs = [(5, 9), (9, 2), (10, 20), (30, 31), (31, 7)]
        labels = {r["node"]: r["label"] for r in propagate_min_labels(_pairs_ds(pairs), n_buckets=4).take_all()}
        assert labels[5] == labels[9] == labels[2] == 2
        assert labels[10] == labels[20] == 10
        assert labels[30] == labels[31] == labels[7] == 7

    def test_empty_pairs(self):
        from entity_extractor_ray.stages.dedup import propagate_min_labels

        out = propagate_min_labels(_pairs_ds([]), n_buckets=2)
        assert out.count() == 0

    def test_no_driver_materialization_of_corpus(self):
        """minhash_dedup returns a Dataset covering every doc, singletons
        keeping their own id — WITHOUT take_all on the corpus."""
        import ray.data as rd

        from entity_extractor_ray.stages.dedup import minhash_dedup

        docs = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(list(range(6)), pa.int64()),
                    "text": pa.array(
                        [
                            "alpha beta gamma delta epsilon zeta eta theta",
                            "alpha beta gamma delta epsilon zeta eta theta",  # dup of 0
                            "one two three four five six seven eight nine",
                            "completely different words here about nothing",
                            "the quick brown fox jumps over the lazy dog",
                            "lorem ipsum dolor sit amet consectetur adipiscing",
                        ],
                        pa.string(),
                    ),
                }
            )
        )
        out = minhash_dedup(docs, threshold=0.9).to_pandas().sort_values("doc_id")
        assert len(out) == 6
        cmap = dict(zip(out["doc_id"], out["cluster_id"]))
        assert cmap[0] == cmap[1] == 0
        for i in (2, 3, 4, 5):
            assert cmap[i] == i  # singletons keep their own id


@pytest.mark.usefixtures("ray_session")
class TestExactNgramJaccard:
    def _docs(self):
        import ray.data as rd

        texts = [
            "the cat sat on the mat today",
            "the cat sat on the mat yesterday",  # high overlap with 0
            "dogs bark loudly at night in town",
            "the cat sat on the mat today",  # exact dup of 0
            "tiny",  # <3 words -> single joined gram
            "",  # empty -> no grams, never pairs
        ]
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        )

    def test_matches_duckdb_oracle(self):
        import duckdb

        from entity_extractor_ray.stages.dedup import (
            ngram_jaccard_pairs,
            ngram_jaccard_pairs_sql,
        )

        eng = (
            ngram_jaccard_pairs(self._docs(), threshold=0.2, n_buckets=4)
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        docs_pd = self._docs().to_pandas()
        con.register("documents", docs_pd)
        orc = (
            con.execute(ngram_jaccard_pairs_sql(threshold=0.2))
            .df()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(eng, orc, check_dtype=False)
        # sanity: the exact dup pair is found at jaccard 1.0
        exact = eng[(eng["id_a"] == 0) & (eng["id_b"] == 3)]
        assert len(exact) == 1 and exact["jaccard"].iloc[0] == 1.0

    def test_matches_oracle_on_testdata(self, ray_session):
        """Full parity on the driver's real documents table (sf0.001)."""
        import duckdb

        import ray.data as rd

        from entity_extractor_ray.stages.dedup import (
            ngram_jaccard_pairs,
            ngram_jaccard_pairs_sql,
        )

        docs = rd.read_parquet(
            "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
        )
        eng = (
            ngram_jaccard_pairs(docs, threshold=0.3, n_buckets=8)
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"
        )
        orc = (
            con.execute(ngram_jaccard_pairs_sql(threshold=0.3))
            .df()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        assert len(eng) == len(orc)
        pd.testing.assert_frame_equal(
            eng[["id_a", "id_b"]], orc[["id_a", "id_b"]], check_dtype=False
        )
        assert np.allclose(eng["jaccard"], orc["jaccard"], atol=0)


@pytest.mark.usefixtures("ray_session")
class TestPrefixNgramJaccard:
    """ngram_jaccard_prefix must be BIT-EQUAL to the exhaustive inverted
    index (same lemma-backed candidate superset, same exact verification),
    so it borrows the exhaustive variant's oracle — plus boundary cases the
    sf corpora never hit: pairs sitting EXACTLY at the threshold, where one
    float-rounding slip in the prefix length or the length filter silently
    drops a true pair."""

    def _docs(self, texts):
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        )

    def test_matches_duckdb_oracle_planted(self):
        import duckdb

        from entity_extractor_ray.stages.dedup import (
            ngram_jaccard_pairs_sql,
            ngram_jaccard_prefix,
        )

        texts = [
            "the cat sat on the mat today",
            "the cat sat on the mat yesterday",
            "dogs bark loudly at night in town",
            "the cat sat on the mat today",
            "tiny",
            "",
        ]
        docs = self._docs(texts)
        eng = (
            ngram_jaccard_prefix(docs, threshold=0.2, n_buckets=4)
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", self._docs(texts).to_pandas())
        orc = (
            con.execute(ngram_jaccard_pairs_sql(threshold=0.2))
            .df()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(eng, orc, check_dtype=False)

    def test_exactly_at_threshold_pairs_survive(self):
        """Jaccard == t exactly, twice over: equal-size sets (prefix-length
        boundary) and the 2-vs-4 size pair sitting ON the length filter's
        min >= t*max line. Unigrams so the sets are spelled literally."""
        from entity_extractor_ray.stages.dedup import ngram_jaccard_prefix

        texts = [
            "aa bb cc",        # 0: {aa,bb,cc}
            "aa bb dd",        # 1: {aa,bb,dd}   inter 2 / union 4 = 0.5
            "xx yy cc",        # 2: 1/5 with 0 -> below threshold
            "pp qq",           # 3: {pp,qq}
            "pp qq rr ss",     # 4: inter 2 / union 4 = 0.5, sizes 2 vs 4
        ]
        out = (
            ngram_jaccard_prefix(self._docs(texts), n=1, threshold=0.5,
                                 n_buckets=4)
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        assert list(zip(out["id_a"], out["id_b"])) == [(0, 1), (3, 4)]
        assert (out["jaccard"] == 0.5).all()

    def test_matches_exhaustive_on_testdata(self, ray_session):
        """Full-frame equality (ids AND jaccard) vs ngram_jaccard_pairs on
        the driver's real documents table at sf0.001."""
        import ray.data as rd

        from entity_extractor_ray.stages.dedup import (
            ngram_jaccard_pairs,
            ngram_jaccard_prefix,
        )

        def docs():
            return rd.read_parquet(
                "/root/testdata/sf0.001/documents.parquet",
                columns=["doc_id", "text"],
            )

        a = (
            ngram_jaccard_pairs(docs(), threshold=0.3, n_buckets=8)
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        b = (
            ngram_jaccard_prefix(docs(), threshold=0.3, n_buckets=8)
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        assert len(a) > 0
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
