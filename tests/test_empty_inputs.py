"""Empty-input robustness: every declared query must plan and execute
against 0-row tables without raising.

At 100 TB this is not a corner case — partition filters, tenant splits,
and incremental windows routinely produce empty inputs mid-pipeline, and
an operator that throws on them kills the whole job.  Found-and-fixed by
this sweep: the broadcast GEMM probe np.stack'ing an empty vector list
(dedup.py embedding_near_dup_pairs) and lsh_topk raising instead of
returning a typed empty frame.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet").slice(0, 0), str(out / f"{t}.parquet"))
    return str(out)


def test_every_query_survives_empty_tables(spark, empty_sf):
    import __spark_entry__ as m

    failures = {}
    for name, fn in m.queries().items():
        try:
            fn(spark, empty_sf).count()
        except Exception as e:  # noqa: BLE001 — collecting the full list
            failures[name] = str(e).splitlines()[0][:160]
    assert not failures, f"queries crashed on empty input: {failures}"


NULLABLE = {
    "documents": ["text", "lang", "source"],
    "events": ["event_type", "props"],
    "embeddings": ["embedding"],
}


@pytest.fixture(scope="module")
def nulled_sf(tmp_path_factory):
    import pyarrow as pa

    out = tmp_path_factory.mktemp("null_sf")
    for t in TABLES:
        tb = pq.read_table(f"{SRC}/{t}.parquet")
        for col in NULLABLE.get(t, []):
            idx = tb.schema.get_field_index(col)
            arr = tb.column(col).to_pylist()
            arr = [None if i % 7 == 3 else v for i, v in enumerate(arr)]
            tb = tb.set_column(idx, col, pa.array(arr, type=tb.schema.field(col).type))
        pq.write_table(tb, str(out / f"{t}.parquet"))
    return str(out)


def test_every_query_survives_null_injection(spark, nulled_sf):
    """NULLs in every nullable text/payload/vector column (every 7th
    row) must not crash any operator — NULL text folds through the
    tokenize chain, NULL vectors are dropped at vector-operator entry
    (drop_null_vectors: a missing embedding has no geometry).  Found by
    this sweep: 8 vector operators np.stack-crashing on NULL embeddings."""
    import __spark_entry__ as m

    failures = {}
    for name, fn in m.queries().items():
        try:
            fn(spark, nulled_sf).count()
        except Exception as e:  # noqa: BLE001
            failures[name] = str(e).splitlines()[0][:160]
    assert not failures, f"queries crashed on NULL-injected input: {failures}"
