"""Property-based check of the LWW compaction kernel (hypothesis).

The reference's core invariant — the max-LSN event per key determines
the final row, regardless of arrival order (SURVEY §4
single-writer-per-partition; ChangeEventQueue FIFO) — must hold for
ARBITRARY event sequences, not just generator-shaped ones. Hypothesis
drives random op sequences over a small key space through all three
kernel variants (max_by, pandas, salted pandas) and a pure-Python
fold; all four must agree exactly.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from debezium_spark.operators.compaction import compact

_SCHEMA = (
    "key struct<repo:string,path:string>, lsn bigint, op string, "
    "after struct<content:string>, schema_version int"
)

_events = st.lists(
    st.tuples(
        st.integers(0, 2),  # repo index
        st.integers(0, 2),  # path index
        st.sampled_from(["c", "u", "d"]),
        st.integers(0, 999),  # content token
    ),
    min_size=1,
    max_size=30,
)


def _result_map(df):
    return {
        (r["repo"], r["path"]): (
            r["lsn"],
            r["op"],
            None if r["after"] is None else r["after"]["content"],
        )
        for r in (x.asDict(recursive=True) for x in df.collect())
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_events)
def test_lww_kernels_match_python_fold_on_arbitrary_logs(spark, evs):
    rows = []
    expected = {}
    for lsn, (ri, pi, op, tok) in enumerate(evs, start=1):
        key = (f"r{ri}", f"p{pi}")
        content = None if op == "d" else f"v{tok}"
        rows.append(
            (
                {"repo": key[0], "path": key[1]},
                lsn,
                op,
                None if op == "d" else {"content": content},
                1,
            )
        )
        expected[key] = (lsn, op, content)
    df = spark.createDataFrame(rows, _SCHEMA)
    a = _result_map(compact(df, "max_by"))
    b = _result_map(compact(df, "pandas"))
    c = _result_map(compact(df, "pandas", salt=4))
    assert a == expected
    assert b == expected
    assert c == expected
