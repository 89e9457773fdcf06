"""Property: the vectorized bucketed equi-join (sort + searchsorted +
repeat/arange M:N expansion) equals a pandas inner merge for any input —
duplicate keys on both sides, keys with no match, empty sides."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st




def test_join_matches_pandas_merge(ray_session):
    import ray
    import ray.data as rd

    from anofox_forecast_ray.stages.join import bucketed_equi_join

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(st.integers(0, 8), max_size=25),
        st.lists(st.integers(0, 8), max_size=25),
    )
    def check(lkeys, rkeys):
        lt = pa.table(
            {
                "k": pa.array(lkeys, type=pa.int64()),
                "lv": pa.array(
                    np.arange(len(lkeys), dtype=np.int64) * 7
                ),
            }
        )
        rt = pa.table(
            {
                "k": pa.array(rkeys, type=pa.int64()),
                "rv": pa.array(
                    np.arange(len(rkeys), dtype=np.int64) * 13
                ),
            }
        )
        out_ds = bucketed_equi_join(
            rd.from_arrow(lt), rd.from_arrow(rt), key="k"
        )
        tabs = [t for t in (ray.get(r) for r in out_ds.to_arrow_refs())
                if t.num_columns > 0]
        got = (
            pa.concat_tables(tabs).to_pandas()
            .sort_values(["k", "lv", "rv"]).reset_index(drop=True)
            if tabs else None
        )
        ref = (
            lt.to_pandas().merge(rt.to_pandas(), on="k", how="inner")
            .sort_values(["k", "lv", "rv"]).reset_index(drop=True)
        )
        if got is None:
            assert len(ref) == 0
        else:
            assert got[["k", "lv", "rv"]].equals(ref[["k", "lv", "rv"]])

    check()


def test_join_bucket_row_order():
    """ADVICE r4: the per-bucket kernel's row order must MATCH pandas
    merge on the same input tables, compared UNSORTED — left order
    outer, right input order within each match group."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from anofox_forecast_ray.stages.join import join_bucket_tables

    rng = np.random.default_rng(13)
    lk = rng.integers(0, 12, 80)
    rk = rng.integers(0, 15, 40)
    lt = pa.table(
        {"k": pa.array(lk, type=pa.int64()),
         "lv": pa.array(np.arange(80), type=pa.int64())}
    )
    rt = pa.table(
        {"k": pa.array(rk, type=pa.int64()),
         "rv": pa.array(np.arange(40), type=pa.int64())}
    )
    got = join_bucket_tables(lt, rt, "k", ["k", "lv"], ["rv"]).to_pandas()
    want = pd.merge(
        lt.to_pandas(), rt.to_pandas(), on="k", how="inner", sort=False
    )
    # unsorted equality: row order itself is the property under test
    assert got[["k", "lv", "rv"]].values.tolist() == \
        want[["k", "lv", "rv"]].values.tolist()
