"""Semantic checks for the training-data operators (beyond oracle parity)."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"


@pytest.mark.usefixtures("ray_session")
class TestDedup:
    def test_minhash_finds_planted_dups_at_sf01(self):
        """sf0.1 documents has 5000 rows / 4992 distinct texts: the 8
        exact-dup pairs MUST cluster together (recall=1 for jaccard=1)."""
        from go_crawler_ray.pipelines.dedup import minhash_clusters
        import duckdb

        got = minhash_clusters(SF_BIG)
        con = duckdb.connect()
        dup_groups = con.sql(
            f"SELECT list(doc_id) AS ids FROM read_parquet('{SF_BIG}/documents.parquet') "
            "GROUP BY text HAVING COUNT(*) > 1").fetchall()
        assert dup_groups
        cl = dict(zip(got["doc_id"], got["cluster_id"]))
        for (ids,) in dup_groups:
            assert len({cl[i] for i in ids}) == 1, f"dup group {ids} split"

    def test_exact_dedup_covers_all_docs(self):
        from go_crawler_ray.pipelines.dedup import exact_dedup

        out = exact_dedup(SF)
        assert out["n_dups"].sum() == 500
        assert (out["n_dups"] >= 1).all()
        assert out["keep_doc_id"].is_unique

    def test_simhash_identical_texts_equal_sigs(self):
        from go_crawler_ray.pipelines.dedup import simhash_signatures
        import duckdb

        got = simhash_signatures(SF_BIG)
        con = duckdb.connect()
        dup_groups = con.sql(
            f"SELECT list(doc_id) FROM read_parquet('{SF_BIG}/documents.parquet') "
            "GROUP BY text HAVING COUNT(*) > 1").fetchall()
        sig = dict(zip(got["doc_id"], got["simhash"]))
        for (ids,) in dup_groups:
            assert len({sig[i] for i in ids}) == 1


@pytest.mark.usefixtures("ray_session")
class TestANN:
    def test_lsh_recall_vs_brute_force(self):
        from go_crawler_ray.pipelines.ann import brute_force_topk, lsh_topk

        bf = brute_force_topk(SF, n_queries=8, k=5)
        # more tables/fewer bits -> higher recall; assert the scale knob works
        lsh = lsh_topk(SF, n_queries=8, k=5, n_bits=4, n_tables=8)
        recall_hits = 0
        for q in bf["query_id"].unique():
            want = set(bf[bf["query_id"] == q]["neighbor_id"])
            got = set(lsh[lsh["query_id"] == q]["neighbor_id"])
            recall_hits += len(want & got)
        recall = recall_hits / len(bf)
        assert recall >= 0.5, f"LSH recall too low: {recall}"

    def test_brute_force_is_exact(self):
        """Driver-side numpy reference must agree exactly."""
        import ray.data as rd
        from go_crawler_ray.pipelines.ann import brute_force_topk

        bf = brute_force_topk(SF, n_queries=4, k=3)
        full = rd.read_parquet(f"{SF}/embeddings.parquet").to_pandas() \
            .sort_values("vec_id")
        V = np.stack(full["embedding"].to_numpy()).astype(np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        ids = full["vec_id"].to_numpy()
        for qi in range(4):
            S = Vn @ Vn[qi]
            S[ids == ids[qi]] = -np.inf
            order = np.lexsort((ids, -S))[:3]
            want = list(ids[order])
            got = list(bf[bf["query_id"] == ids[qi]]["neighbor_id"])
            assert got == want


@pytest.mark.usefixtures("ray_session")
class TestMultimodal:
    def test_decode_parses_planted_header(self):
        from go_crawler_ray.pipelines.multimodal import media_metadata

        out = media_metadata(SF)
        assert out["decode_ok"].all()
        assert (out["width"] == 16 + out["doc_id"] % 64).all()
        assert (out["channels"].isin([1, 2, 3])).all()

    def test_real_decoder_is_marked_stub(self):
        from go_crawler_ray.pipelines.multimodal import DecodeStage

        with pytest.raises(NotImplementedError):
            DecodeStage(real_decoder=True)

    def test_corrupt_payload_flagged(self):
        import pyarrow as pa
        from go_crawler_ray.pipelines.multimodal import DecodeStage

        batch = pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "payload": pa.array([b"NOTMAGIC123"], pa.large_binary()),
        })
        out = DecodeStage()(batch)
        assert out["decode_ok"].to_pylist() == [False]


@pytest.mark.usefixtures("ray_session")
class TestSessionize:
    def test_single_user_gap_semantics(self):
        import pandas as pd
        from go_crawler_ray.pipelines.relational import user_sessions

        out = user_sessions(SF)
        assert (out["n_sessions"] >= 1).all()
        assert (out["n_sessions"] <= out["n_events"]).all()
