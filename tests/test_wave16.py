"""Wave-16: passage dedup, type transitions, length histogram, cluster
assignment — edge shapes the synthetic corpus never produces (within-doc
duplicates, short docs, tie-broken transitions, zero-length docs, seed
tie-breaks)."""

import numpy as np
import pyarrow as pa
import pytest

import anofox_forecast_ray.pipelines.queries_wave16 as w16


@pytest.fixture
def patch_docs(monkeypatch):
    def _patch(table: pa.Table):
        import ray.data as rd

        monkeypatch.setattr(
            w16, "_docs", lambda sf_dir, columns: rd.from_arrow(
                table.select(columns)
            )
        )

    return _patch


@pytest.fixture
def patch_events(monkeypatch):
    def _patch(table: pa.Table):
        import ray.data as rd

        monkeypatch.setattr(
            w16, "_events", lambda sf_dir, columns: rd.from_arrow(
                table.select(columns)
            )
        )

    return _patch


def test_passage_dedup_within_and_across(ray_session, patch_docs):
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            # doc 1: "a b c" twice (within-doc dup) + "x y z"
            "text": pa.array(
                [
                    "a b c a b c x y z",
                    "a b c q r s",   # shares "a b c" with doc 1
                    "u v w",          # unique single passage
                    "t u",            # < w words -> no passages, no row
                ]
            ),
        }
    )
    patch_docs(docs)
    q, _ = w16._passage_dedup_query(3)
    out = q("ignored").to_pandas().set_index("doc_id").sort_index()
    assert list(out.index) == [1, 2, 3]
    assert out.loc[1, "n_passages"] == 3
    assert out.loc[1, "n_dup_passages"] == 2  # both "a b c" copies
    assert out.loc[2, "n_passages"] == 2
    assert out.loc[2, "n_dup_passages"] == 1
    assert out.loc[3, "n_dup_passages"] == 0
    assert out.loc[2, "dup_frac"] == np.float64(1) / np.float64(2)


def test_transitions_tie_break_and_short_users(ray_session, patch_events):
    ev = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
            "ts": pa.array([100, 100, 200, 50, 999, 10],
                           type=pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1, 2, 2, 3], type=pa.int64()),
            "event_type": pa.array(["a", "b", "c", "x", "y", "solo"]),
        }
    )
    patch_events(ev)
    q, _ = w16._transitions_query()
    out = q("ignored").to_pandas()
    got = {(r.from_type, r.to_type): r.cnt for r in out.itertuples()}
    # user 1 ties at ts=100 break by event_id: a -> b -> c
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("x", "y"): 1}


def test_length_histogram_buckets(ray_session, patch_docs):
    docs = pa.table(
        {
            "source": pa.array(["s"] * 5),
            "n_chars": pa.array([0, 1, 2, 8, 15], type=pa.int64()),
        }
    )
    patch_docs(docs)
    q, _ = w16._length_histogram_query()
    out = q("ignored").to_pandas().set_index("bucket").sort_index()
    # '0' -> 1 digit; 1 -> 1; 2 -> 2; 8 -> 4; 15 -> 4
    assert out.loc[1, "cnt"] == 2 and out.loc[1, "sum_chars"] == 1
    assert out.loc[2, "cnt"] == 1
    assert out.loc[4, "cnt"] == 2 and out.loc[4, "sum_chars"] == 23


def test_cluster_assign_tie_breaks_to_lowest_seed(ray_session,
                                                  monkeypatch):
    import ray.data as rd

    # seeds 0 and 1 are equidistant from vec 3 -> cluster 0 wins
    emb = pa.table(
        {
            "vec_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "embedding": pa.array(
                [[1.0, 0.0], [-1.0, 0.0], [0.9, 0.1], [0.0, 5.0]],
                type=pa.list_(pa.float32()),
            ),
        }
    )

    def fake_read(path, columns=None, override_num_blocks=None):
        return rd.from_arrow(emb.select(columns))

    monkeypatch.setattr("ray.data.read_parquet", fake_read)
    q, _ = w16._cluster_assign_query(k=2)
    out = q("ignored").to_pandas().set_index("vec_id").sort_index()
    assert out.loc[0, "cluster"] == 0 and out.loc[0, "dist"] == 0.0
    assert out.loc[1, "cluster"] == 1
    assert out.loc[2, "cluster"] == 0
    assert out.loc[3, "cluster"] == 0  # tie -> lowest seed id
    # dist is the sequential fold of exact f64 squares
    assert out.loc[3, "dist"] == 1.0 + 25.0
