"""Distributed k-means clustering over embedding columns.

The corpus-clustering primitive LLM-data pipelines use for domain
discovery, cluster-balanced sampling, and cluster-based dedup/mixing.

Unlike similarity.py's ``_kmeans_cells`` (a driver-side numpy fit on a
bounded sample, feeding IVF), this is the FULL distributed form — every
vector participates in every Lloyd iteration — built so each step is
bit-reproducible across engines (the DuckDB oracle replays the exact
same arithmetic and hash-matches the final assignment):

- init: the k lowest-id vectors (deterministic, growth-stable);
- assignment: a NARROW projection — centroids are inlined as a literal
  array-of-arrays, each row computes squared-L2 to every centroid via a
  ``zip_with`` + sequential ``aggregate`` fold (double addition in index
  order — the same order ``list_sum`` uses in DuckDB, so distances are
  bit-identical), argmin = ``array_position`` of the min (first-min →
  lowest cluster id, the same tie-break as ``ORDER BY dist, cid``);
- update: one shuffle — ``posexplode`` to (cid, pos, val), decimal-
  stable mean per (cid, pos) rounded to 9 places (exact decimal sums →
  one double division → round: identical doubles on both engines);
  the K×dim result is collected to the driver (tiny, like IVF
  centroids / LSH planes) and inlined as next iteration's literals.

At 100 TB: per iteration, the corpus is touched twice (one narrow
assignment pass fused into the explode, one (cid, pos)-keyed partial
aggregate whose map-side combine reduces each task to ≤ k·dim rows).
No corpus collect, no corpus-side join.  Driver state is k·dim doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign_expr(vec, centroids: list[list[float]]):
    """cluster id (1-based) of ``vec`` against literal ``centroids``."""
    cents_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    dists = F.transform(
        cents_lit,
        lambda c: F.aggregate(
            F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return F.array_position(dists, F.array_min(dists)).cast("int")


def _min_dist_expr(vec, centroids: list[list[float]]):
    """Squared L2 distance from ``vec`` to its NEAREST literal centroid —
    the d²(x, C) every k-means‖ round scores points by."""
    cents_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    return F.array_min(
        F.transform(
            cents_lit,
            lambda c: F.aggregate(
                F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    )


def _hash_unit(col):
    """Deterministic pseudo-uniform in [0, 1) from a column — md5 bucket
    over the id, the same reproducible-sampling trick as
    text.train_test_split (content-independent, growth-stable)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")
        % 1_000_000
    ) / 1_000_000.0


#: above this many centroids, the literal-array Catalyst expression is
#: replaced by a broadcast numpy GEMM kernel.  ADVICE r7 introduced the
#: split at 128 as a codegen-blowup guard for the k-means|| passes; r9
#: measured the actual crossover on 64-dim vectors and the kernel wins
#: at EVERY k (k=8: 3.2 vs 4.6 s; k=64: 1.3 vs 7.4 s — the interpreted
#: HOF chain grows ~linearly in k·dim while the GEMM is flat), so the
#: threshold now only protects the BIT-EXACT literal arithmetic the
#: DuckDB oracle gates replay (they pin k ≤ 4); everything bigger —
#: auto-sized semantic dedup at √n cells, k-means|| rounds — rides the
#: kernel.
_MAX_LITERAL_CENTERS = 16


def _scored_frame(base: DataFrame, centers: list[list[float]]) -> DataFrame:
    """``(_id, _v, _d2)`` — every row plus its squared L2 to the nearest
    center.  Literal Catalyst expression for small center sets (the
    oracle-replayable arithmetic); a broadcast numpy kernel via
    ``mapInPandas`` above ``_MAX_LITERAL_CENTERS`` (ADVICE r7) — same
    narrow no-shuffle shape, GEMM-form distances (deterministic, but not
    fold-order-identical to the literal form; only the k-means|| rounds,
    which are rows-only-gated, ever reach this regime)."""
    if len(centers) <= _MAX_LITERAL_CENTERS:
        return base.withColumn("_d2", _min_dist_expr(F.col("_v"), centers))
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    bc = base.sparkSession.sparkContext.broadcast(
        np.asarray(centers, dtype=np.float64)
    )
    id_type = base.schema["_id"].dataType.simpleString()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value
        cc = (c * c).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
            d2 = (x * x).sum(axis=1)[:, None] - 2.0 * (x @ c.T) + cc[None, :]
            yield pd.DataFrame(
                {
                    "_id": pdf["_id"],
                    "_v": pdf["_v"],
                    "_d2": np.maximum(d2.min(axis=1), 0.0),
                }
            )

    return base.select("_id", "_v").mapInPandas(
        gen, schema=f"_id {id_type}, _v array<double>, _d2 double"
    )


def _assign_frame(base: DataFrame, centers: list[list[float]]) -> DataFrame:
    """``(_id, _v, cid)`` — every row plus its 1-based nearest-center id,
    with the same literal-vs-GEMM regime split as :func:`_scored_frame`
    (r9: the split previously covered only the k-means‖ scoring passes;
    ``kmeans_fit``/``kmeans_assign`` still built the literal expression
    at ANY k — at k=141 × 64 dims that is a ~9 000-literal interpreted
    HOF chain evaluated per row, measured 90 s for a 20 k-row
    assignment the GEMM kernel does in under a second).  numpy argmin
    returns the FIRST minimum, matching ``array_position(dists,
    array_min(dists))`` tie-breaking; the GEMM distance form is
    deterministic but not fold-order-identical to the literal form —
    only above ``_MAX_LITERAL_CENTERS``, a regime no bit-exact oracle
    gate reaches (they pin small explicit k)."""
    if len(centers) <= _MAX_LITERAL_CENTERS:
        return base.withColumn("cid", _assign_expr(F.col("_v"), centers))
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    bc = base.sparkSession.sparkContext.broadcast(
        np.asarray(centers, dtype=np.float64)
    )
    id_type = base.schema["_id"].dataType.simpleString()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value
        cc = (c * c).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
            d2 = (x * x).sum(axis=1)[:, None] - 2.0 * (x @ c.T) + cc[None, :]
            yield pd.DataFrame(
                {
                    "_id": pdf["_id"],
                    "_v": pdf["_v"],
                    "cid": (d2.argmin(axis=1) + 1).astype(np.int32),
                }
            )

    return base.select("_id", "_v").mapInPandas(
        gen, schema=f"_id {id_type}, _v array<double>, cid int"
    )


def _attraction_counts(base: DataFrame, centers: list[list[float]]) -> dict[int, int]:
    """{1-based center index: number of rows nearest to it} — the
    k-means|| candidate-weighting pass, with the same literal-vs-kernel
    regime split as :func:`_scored_frame` (argmin ties → lowest index in
    both forms)."""
    if len(centers) <= _MAX_LITERAL_CENTERS:
        rows = (
            base.select(_assign_expr(F.col("_v"), centers).alias("cid"))
            .groupBy("cid")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        return {r["cid"]: r["n"] for r in rows}
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    bc = base.sparkSession.sparkContext.broadcast(
        np.asarray(centers, dtype=np.float64)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value
        cc = (c * c).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
            d2 = (x * x).sum(axis=1)[:, None] - 2.0 * (x @ c.T) + cc[None, :]
            yield pd.DataFrame({"cid": (d2.argmin(axis=1) + 1).astype(np.int32)})

    counted = (
        base.select("_v")
        .mapInPandas(gen, schema="cid int")
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {r["cid"]: r["n"] for r in counted}


def kmeans_parallel_init(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rounds: int = 3,
    oversample: int | None = None,
) -> list[list[float]]:
    """Scalable k-means‖ seeding (Bahmani et al., VLDB 2012 — the public
    construction behind every production distributed k-means init),
    made DETERMINISTIC by replacing the Bernoulli coin with an md5 unit
    hash of the row id, so repeated fits seed identically (r6 verdict
    item 5: lowest-id seeding is oracle-friendly but degenerate on real
    corpora where the first k ids can be near-identical vectors).

    Per round (``rounds`` ≈ 3-5 replaces k-means++'s k sequential
    passes): score every row by d²(x, C) against the current centers
    (NARROW literal projection, no shuffle), compute the corpus cost φ
    in one map-side-combined agg, then independently select each row
    with probability ``min(1, ℓ·d²/φ)`` (ℓ = ``oversample``, default
    2k) — expected ≤ ℓ new centers per round, fetched with a bounded
    collect.  Afterwards each candidate is weighted by the number of
    rows it is nearest to (one agg) and a weighted driver-side Lloyd
    over the ~``1 + rounds·ℓ`` candidates reduces them to k seeds.
    Driver state: O(rounds·ℓ·dim) doubles — bounded at any corpus size.

    Returns at most ``k`` seeds (fewer iff the corpus has fewer rows)."""
    import numpy as np

    from kafka_merge_purge_spark.functions.vectors import drop_null_vectors

    base = drop_null_vectors(emb, vec_col).select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    ell = 2 * k if oversample is None else oversample
    # first center: lowest md5-bucket row (pseudo-random but reproducible)
    first = base.orderBy(_hash_unit(F.col("_id")), "_id").limit(1).collect()
    if not first:
        return []
    centers: list[list[float]] = [list(map(float, first[0]["_v"]))]
    for r in range(rounds):
        scored = _scored_frame(base, centers)
        phi = scored.select(F.sum("_d2").alias("phi")).collect()[0]["phi"]
        if not phi or phi <= 0:
            break  # every row coincides with a center already
        # per-round decorrelated coin: hash of the id STRING with a round
        # suffix — ADVICE r7: the earlier `id * (round+2)` arithmetic
        # NULLed out on string ids, silently dropping every candidate
        coin = _hash_unit(F.concat(F.col("_id").cast("string"), F.lit(f":{r}")))
        picked = (
            scored
            .filter(coin < F.least(F.lit(1.0), F.lit(float(ell)) * F.col("_d2") / F.lit(float(phi))))
            .select("_id", "_v")
            .orderBy("_id")
            .limit(2 * ell)  # hard bound on the collect (expected ≤ ℓ;
            # ADVICE r7: 2ℓ keeps the candidate set — and any literal
            # expressions over it — near the expected size)
            .collect()
        )
        centers.extend(list(map(float, p["_v"])) for p in picked)
    # weight candidates by attraction counts, then weighted Lloyd to k
    counts = _attraction_counts(base, centers)
    cand = np.array(centers)
    w = np.array([counts.get(j + 1, 0) for j in range(len(centers))], dtype=np.float64)
    if len(cand) <= k:
        return [list(map(float, c)) for c in cand]
    # weighted k-means++-style greedy pick then fixed Lloyd rounds, all on
    # the tiny candidate set (deterministic: argmax ties -> lowest index)
    seeds = [int(np.argmax(w))]
    d = ((cand - cand[seeds[0]]) ** 2).sum(axis=1)
    while len(seeds) < k:
        j = int(np.argmax(w * d))
        seeds.append(j)
        d = np.minimum(d, ((cand - cand[j]) ** 2).sum(axis=1))
    cents = cand[seeds].copy()
    for _ in range(8):
        dist = ((cand[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = dist.argmin(axis=1)
        for j in range(k):
            m = assign == j
            if w[m].sum() > 0:
                cents[j] = (cand[m] * w[m, None]).sum(axis=0) / w[m].sum()
    return [[float(v) for v in c] for c in cents]


def kmeans_fit(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: str = "lowest-id",
) -> list[list[float]]:
    """Lloyd's k-means fit: ``iters`` assign+update rounds; returns the
    final centroid list (empty for an empty corpus).  Deterministic —
    repeated fits are identical, so the fit can be cached/persisted and
    reused across query batches the way IVF centroids are
    (similarity.ivf_topk(centroids=...)).

    ``init`` picks the seeding (r6 verdict item 5):

    - ``"lowest-id"`` (default): the k lowest-id vectors — trivially
      deterministic and SQL-replayable, which is what the bit-identical
      DuckDB oracle gates; degenerate when the first k ids happen to be
      near-identical vectors (real ingest orders cluster by source).
    - ``"kmeans||"``: :func:`kmeans_parallel_init` — the Bahmani et al.
      oversampling construction, deterministic via md5-hash coins; pays
      ``rounds`` extra corpus passes for spread-out seeds that survive
      adversarial id orderings (inertia win pinned in pytest on a
      planted skewed corpus).

    NOTE: each round re-reads the corpus; an A/B of persisting the
    casted frame measured NO win at sf0.1 (5.7 s vs 6.1 s for the two
    gated queries) — the pruned-column parquet re-scan beats cache
    bookkeeping, and at real scale caching the whole corpus is the
    worse posture anyway (spill)."""
    from kafka_merge_purge_spark.functions.vectors import drop_null_vectors

    base = drop_null_vectors(emb, vec_col).withColumn(
        "_v", F.col(vec_col).cast("array<double>")
    )
    if init == "kmeans||":
        cents = kmeans_parallel_init(emb, k, id_col, vec_col)
        if not cents:
            return []
    elif init == "lowest-id":
        seeds = base.select(id_col, "_v").orderBy(id_col).limit(k).collect()
        if not seeds:
            return []
        cents = [list(map(float, r["_v"])) for r in seeds]
    else:
        raise ValueError(f"kmeans_fit: init must be 'lowest-id' or 'kmeans||', got {init!r}")
    for _ in range(iters):
        # literal expression at small k (the oracle-replayable form),
        # broadcast GEMM kernel above _MAX_LITERAL_CENTERS (r9: the fit
        # previously built the literal at ANY k — quadratic-expression
        # driver/executor blowup once auto-k sizing pushed k past ~100)
        assigned = _assign_frame(
            base.select(F.col(id_col).alias("_id"), "_v"), cents
        )
        means = (
            assigned.select("cid", F.posexplode("_v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(
                F.round(
                    F.sum(F.col("val").cast("decimal(28,12)")).cast("double")
                    / F.count(F.lit(1)),
                    9,
                ).alias("m")
            )
            .collect()
        )
        new: dict[int, dict[int, float]] = {}
        for r in means:
            new.setdefault(r["cid"], {})[r["pos"]] = r["m"]
        cents = [
            [new[j + 1][p] for p in sorted(new[j + 1])] if (j + 1) in new else cents[j]
            for j in range(len(cents))
        ]
    return cents


def kmeans_inertia(
    emb: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> float:
    """Total within-cluster squared-L2 cost Σ d²(x, C) — the objective
    both inits compete on; one narrow projection + one agg, no shuffle
    of vectors."""
    from kafka_merge_purge_spark.functions.vectors import drop_null_vectors

    if not centroids:
        return 0.0
    base = drop_null_vectors(emb, vec_col)
    d2 = _min_dist_expr(F.col(vec_col).cast("array<double>"), centroids)
    row = base.select(F.sum(d2).alias("phi")).collect()[0]
    return float(row["phi"] or 0.0)


def kmeans_assign(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Lloyd's k-means: fit (or reuse ``centroids`` from a prior
    :func:`kmeans_fit` — the amortized path) then a final assignment.

    Returns the input frame plus a 1-based ``cluster_id`` column.  Rows
    whose vector is NULL survive with a NULL ``cluster_id`` — the same
    row-set contract the empty-seed path has (r5 advice: the two paths
    used to disagree, the filtered base silently dropping NULL-vector
    rows).  An emptied cluster keeps its previous centroid (cannot occur
    on the synthetic corpus; documented for callers on adversarial data —
    the SQL oracle assumes non-empty clusters).
    """
    cents = (
        centroids
        if centroids is not None
        else kmeans_fit(emb, k, iters, id_col, vec_col)
    )
    if not cents:
        return emb.withColumn("cluster_id", F.lit(None).cast("int"))
    # NULL-vector rows keep their row with a NULL cluster_id via a NARROW
    if len(cents) > _MAX_LITERAL_CENTERS:
        # GEMM regime (r9): the literal expression at k=141 × 64 dims is
        # a ~9k-literal interpreted HOF chain (measured 90 s for a 20k
        # assignment the kernel does in <1 s).  The kernel emits a
        # narrow (id, cid) frame; one equi-join re-attaches it — at this
        # k the join is strictly cheaper than the expression, and the
        # row-set contract (NULL-vector rows survive with NULL
        # cluster_id) holds via the left join.
        narrow = (
            emb.filter(F.col(vec_col).isNotNull())
            .select(
                F.col(id_col).alias("_id"),
                F.col(vec_col).cast("array<double>").alias("_v"),
            )
        )
        cids = _assign_frame(narrow, cents).select(
            F.col("_id").alias(id_col), F.col("cid").alias("cluster_id")
        )
        return emb.join(cids, id_col, "left")
    # conditional projection — not a corpus self-join (r6 review: the
    # join re-scanned and shuffled the corpus; when() preserves the same
    # row-set contract with zero exchanges, keeping the documented
    # 'no corpus-side join' plan shape true)
    return emb.withColumn(
        "cluster_id",
        F.when(
            F.col(vec_col).isNotNull(),
            _assign_expr(F.col(vec_col).cast("array<double>"), cents),
        ),
    )


def kmeans_cluster_stats(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Per-cluster rollup of the final assignment: member count, lowest
    member id, and mean label — the hash-checkable face of the fit."""
    a = kmeans_assign(
        emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col, centroids=centroids
    )
    # NULL-vector rows carry a NULL cluster_id (see kmeans_assign); they
    # are not members of any cluster, so the per-cluster rollup drops them
    a = a.filter(F.col("cluster_id").isNotNull())
    return a.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min(id_col).alias("min_id"),
        F.round(F.sum(label_col) / F.count(F.lit(1)), 6).alias("mean_label"),
    )
