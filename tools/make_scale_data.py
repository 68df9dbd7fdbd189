"""Generate a ~sf{R/10} scale-up of the sf0.1 tables for slope benching.

The driver ships no sf1 parquet, so scale-slope evidence needs a scaled
input.  Naive row replication would change the *workload shape*, not
just its size — 10 exact copies of every document/embedding would make
the dedup operators' pair count quadratic in the replication factor.
Instead each replica preserves the source distribution while staying
dissimilar from its siblings:

- lineitem: plain replication with id offsets (aggregation/correlation
  queries are insensitive to value duplication).
- documents: replica r interleaves a replica-specific token every 4
  words — token/length distribution is preserved, but cross-replica
  3-shingle Jaccard drops to ~0.25, far under the 0.7 dedup threshold.
- embeddings: each replica vector is normalize(0.2*v + 0.98*u) with u a
  per-(vec_id, replica) seeded gaussian — cos(replica, original) ~ 0.2,
  under the 0.4 near-dup threshold, and replicas are mutually
  near-orthogonal, i.e. fresh draws from the same near-random corpus.

Usage: python tools/make_scale_data.py [R] [src_dir] [out_dir]
Defaults: R=10, src=/root/testdata/sf0.1, out=/root/repo/.scale_sf1
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def scale_lineitem(src: str, out: str, r_factor: int) -> None:
    t = pq.read_table(f"{src}/lineitem.parquet")
    n = t.num_rows
    chunks = []
    okey = t.column("l_orderkey").to_numpy()
    max_okey = int(okey.max()) + 1
    for r in range(r_factor):
        rep = t.set_column(
            t.schema.get_field_index("l_orderkey"),
            "l_orderkey",
            pa.array(okey + r * max_okey, type=t.schema.field("l_orderkey").type),
        )
        chunks.append(rep)
    pq.write_table(pa.concat_tables(chunks), f"{out}/lineitem.parquet")
    print(f"lineitem: {n} -> {n * r_factor} rows")


def scale_documents(src: str, out: str, r_factor: int) -> None:
    t = pq.read_table(f"{src}/documents.parquet")
    n = t.num_rows
    doc_id = t.column("doc_id").to_numpy()
    max_id = int(doc_id.max()) + 1
    texts = t.column("text").to_pylist()
    other_cols = {
        name: t.column(name)
        for name in t.schema.names
        if name not in ("doc_id", "text")
    }
    chunks = []
    for r in range(r_factor):
        if r == 0:
            new_texts = texts
        else:
            tag = f"rep{r}x"
            new_texts = [
                " ".join(
                    tok if (i + 1) % 4 else f"{tok} {tag}"
                    for i, tok in enumerate(txt.split())
                )
                if txt
                else txt
                for txt in texts
            ]
        cols = {
            "doc_id": pa.array(doc_id + r * max_id, type=t.schema.field("doc_id").type),
            "text": pa.array(new_texts, type=t.schema.field("text").type),
        }
        cols.update(other_cols)
        chunks.append(pa.table([cols[nm] for nm in t.schema.names], names=t.schema.names))
    pq.write_table(pa.concat_tables(chunks), f"{out}/documents.parquet")
    print(f"documents: {n} -> {n * r_factor} rows")


def scale_embeddings(src: str, out: str, r_factor: int) -> None:
    t = pq.read_table(f"{src}/embeddings.parquet")
    n = t.num_rows
    vec_id = t.column("vec_id").to_numpy()
    max_id = int(vec_id.max()) + 1
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()])
    dim = mat.shape[1]
    vec_type = t.schema.field("embedding").type
    other_cols = {
        name: t.column(name)
        for name in t.schema.names
        if name not in ("vec_id", "embedding")
    }
    chunks = []
    for r in range(r_factor):
        if r == 0:
            new_mat = mat
        else:
            rng = np.random.default_rng(1_000_003 * r)
            noise = rng.standard_normal((n, dim))
            noise /= np.linalg.norm(noise, axis=1)[:, None]
            scaled = 0.2 * (mat / np.maximum(np.linalg.norm(mat, axis=1), 1e-12)[:, None])
            new_mat = scaled + 0.98 * noise
            # restore the source norm distribution
            new_mat *= (
                np.linalg.norm(mat, axis=1) / np.maximum(np.linalg.norm(new_mat, axis=1), 1e-12)
            )[:, None]
        cols = {
            "vec_id": pa.array(vec_id + r * max_id, type=t.schema.field("vec_id").type),
            "embedding": pa.array(
                [row.astype(np.float32).tolist() for row in new_mat], type=vec_type
            ),
        }
        cols.update(other_cols)
        chunks.append(pa.table([cols[nm] for nm in t.schema.names], names=t.schema.names))
    pq.write_table(pa.concat_tables(chunks), f"{out}/embeddings.parquet")
    print(f"embeddings: {n} -> {n * r_factor} rows")


def scale_events(src: str, out: str, r_factor: int) -> None:
    """Replicate events with offset user/event ids, timestamps unchanged.

    Shifting user_id keeps every replica's per-user session structure
    identical to the source (sessionize windows partition by user), so
    the workload shape of window/join queries is preserved — the event
    stream just has R× more users, which is exactly how a bigger
    deployment grows."""
    t = pq.read_table(f"{src}/events.parquet")
    n = t.num_rows
    eid = t.column("event_id").to_numpy()
    uid = t.column("user_id").to_numpy()
    max_eid, max_uid = int(eid.max()) + 1, int(uid.max()) + 1
    chunks = []
    for r in range(r_factor):
        rep = t.set_column(
            t.schema.get_field_index("event_id"),
            "event_id",
            pa.array(eid + r * max_eid, type=t.schema.field("event_id").type),
        )
        rep = rep.set_column(
            rep.schema.get_field_index("user_id"),
            "user_id",
            pa.array(uid + r * max_uid, type=t.schema.field("user_id").type),
        )
        chunks.append(rep)
    pq.write_table(pa.concat_tables(chunks), f"{out}/events.parquet")
    print(f"events: {n} -> {n * r_factor} rows")


def scale_orders(src: str, out: str, r_factor: int) -> None:
    """Replicate orders with o_orderkey offset by the SAME max-key
    scheme as scale_lineitem (the sf tables share max(l_orderkey) ==
    max(o_orderkey), asserted below, so the lineitem ⋈ orders join
    pairs each replica with itself) and o_custkey offset per replica —
    a bigger deployment has more customers, while suppliers (not
    offset in lineitem) stay shared, so e.g. the co-trade graph grows
    10× in edges with the realistic more-customers-per-supplier shape."""
    t = pq.read_table(f"{src}/orders.parquet")
    li_max = int(pq.read_table(f"{src}/lineitem.parquet", columns=["l_orderkey"])
                 .column("l_orderkey").to_numpy().max()) + 1
    okey = t.column("o_orderkey").to_numpy()
    ckey = t.column("o_custkey").to_numpy()
    max_okey, max_ckey = int(okey.max()) + 1, int(ckey.max()) + 1
    assert max_okey == li_max, "orderkey domains diverged; join would break"
    n = t.num_rows
    chunks = []
    for r in range(r_factor):
        rep = t.set_column(
            t.schema.get_field_index("o_orderkey"),
            "o_orderkey",
            pa.array(okey + r * max_okey, type=t.schema.field("o_orderkey").type),
        )
        rep = rep.set_column(
            rep.schema.get_field_index("o_custkey"),
            "o_custkey",
            pa.array(ckey + r * max_ckey, type=t.schema.field("o_custkey").type),
        )
        chunks.append(rep)
    pq.write_table(pa.concat_tables(chunks), f"{out}/orders.parquet")
    print(f"orders: {n} -> {n * r_factor} rows")


def scale_customer(src: str, out: str, r_factor: int) -> None:
    """Replicate customers with key offsets, REGENERATING each
    replica's c_name from its new key (names are key-derived in TPC-H,
    so replicated names would alias the originals and corrupt any
    name-blocked linkage or suffix-keyed join at 10×)."""
    t = pq.read_table(f"{src}/customer.parquet")
    n = t.num_rows
    key = t.column("c_custkey").to_numpy()
    max_key = int(key.max()) + 1
    chunks = []
    for r in range(r_factor):
        new_key = key + r * max_key
        rep = t.set_column(
            t.schema.get_field_index("c_custkey"),
            "c_custkey",
            pa.array(new_key, type=t.schema.field("c_custkey").type),
        )
        rep = rep.set_column(
            t.schema.get_field_index("c_name"),
            "c_name",
            pa.array([f"Customer#{int(k):09d}" for k in new_key]),
        )
        chunks.append(rep)
    pq.write_table(pa.concat_tables(chunks), f"{out}/customer.parquet")
    print(f"customer: {n} -> {n * r_factor} rows")


def copy_dims(src: str, out: str) -> None:
    """supplier/nation/region pass through UNSCALED: the orders scaler's
    rationale (a bigger deployment has more customers/orders while
    suppliers stay shared) means the Q21/Q15 shapes grow on the fact
    side against fixed dimensions — the realistic 10× shape, and the
    one that stresses their semi/anti joins hardest (more lines per
    supplier)."""
    for name in ("supplier", "nation", "region", "part"):
        t = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(t, f"{out}/{name}.parquet")
        print(f"{name}: {t.num_rows} rows (dims unscaled)")


def main() -> None:
    r_factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.scale_sf1"
    from pathlib import Path

    Path(out).mkdir(parents=True, exist_ok=True)
    scale_lineitem(src, out, r_factor)
    scale_documents(src, out, r_factor)
    scale_embeddings(src, out, r_factor)
    scale_events(src, out, r_factor)
    scale_orders(src, out, r_factor)
    scale_customer(src, out, r_factor)
    copy_dims(src, out)


if __name__ == "__main__":
    main()
