"""Record linkage (entity resolution): blocked candidate generation +
multi-field similarity scoring + thresholded match decision — the
deterministic-scoring half of the classic Fellegi-Sunter setup (the
other half, EM-learned log-likelihood weights, is a model-fitting
problem; this operator takes the caller's weights, which is how the
public production recipes (dedupe.io-style, Splink's deterministic
tier) run at scale).

Built for the oracle-gate discipline: every similarity kind is an
exact, engine-portable expression (integer Levenshtein, equality,
tolerance-clamped numeric distance), the weighted sum folds in the
caller's field order, and the one float division per field rounds at
the end — so the whole match set hash-matches a DuckDB replay.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: similarity kinds: how one field pair scores in [0, 1]
#: - "string":  1 − levenshtein/max(len)  (0 when both empty → 1.0)
#: - "exact":   1.0 on equality (null-safe), else 0.0
#: - ("numeric", tol): 1 − min(|a−b|/tol, 1)
SimSpec = tuple  # (col, kind, weight)


def _field_sim(kind, a: Column, b: Column) -> Column:
    # NULL discipline: a NULL on either side scores 0.0 (no agreement
    # evidence), NEVER NULL — a NULL similarity would null the whole
    # weighted sum and silently drop the pair at the threshold filter,
    # turning one missing phone number into a guaranteed non-match.
    # ("exact" keeps eqNullSafe: NULL≡NULL is positive evidence there.)
    if kind == "string":
        mx = F.greatest(F.length(a), F.length(b))
        sim = F.when(mx == 0, F.lit(1.0)).otherwise(
            F.lit(1.0) - F.levenshtein(a, b) / mx
        )
        return F.when(a.isNull() | b.isNull(), F.lit(0.0)).otherwise(sim)
    if kind == "exact":
        return a.eqNullSafe(b).cast("double")
    if isinstance(kind, tuple) and kind[0] == "numeric":
        tol = float(kind[1])
        sim = F.lit(1.0) - F.least(F.abs(a - b) / F.lit(tol), F.lit(1.0))
        # NaN is "missing" too: a NaN on either side would make the
        # weighted sum NaN, and `NaN >= threshold` is false — the pair
        # would be silently dropped, exactly the failure the NULL
        # discipline above forbids (and inconsistent with the explicit
        # NaN screens in weighted_reservoir / winsorize).  Cast before
        # isnan so integer-typed numeric fields stay legal.
        degenerate = (
            a.isNull()
            | b.isNull()
            | F.isnan(a.cast("double"))
            | F.isnan(b.cast("double"))
        )
        return F.when(degenerate, F.lit(0.0)).otherwise(sim)
    raise ValueError(f"record_linkage: unknown similarity kind {kind!r}")


def record_linkage(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    block_cols: list[str],
    sim_cols: list[SimSpec],
    threshold: float = 0.8,
) -> DataFrame:
    """Link records of ``a`` to records of ``b``: candidates share ALL
    ``block_cols`` (equi join — the blocking pass every production
    linkage runs, since scoring all n·m pairs is the definition of not
    scaling), each candidate pair scores
    ``Σ wᵢ·simᵢ / Σ wᵢ`` over ``sim_cols`` = (column, kind, weight),
    and pairs with ``score ≥ threshold`` emit.

    Blocking recall is the caller's contract (same as every blocking
    system): a true match whose block key was corrupted is missed —
    pick keys from stable fields, or union several
    ``record_linkage`` passes with different block keys (multi-pass
    blocking) for corruption-tolerant recall.

    Scale shape: ONE equi join on the block key (near-uniform if the
    key is selective), scoring is a narrow projection on the candidate
    rows, no window.  Output: (id_a, id_b, score ∈ [0,1])."""
    tw = sum(float(w) for _, _, w in sim_cols)
    if tw <= 0:
        raise ValueError("record_linkage: weights must sum > 0")
    left = a.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"_ba_{i}") for i, c in enumerate(block_cols)],
        *[F.col(c).alias(f"_fa_{i}") for i, (c, _, _) in enumerate(sim_cols)],
    )
    right = b.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"_bb_{i}") for i, c in enumerate(block_cols)],
        *[F.col(c).alias(f"_fb_{i}") for i, (c, _, _) in enumerate(sim_cols)],
    )
    cond = None
    for i in range(len(block_cols)):
        c = F.col(f"_ba_{i}") == F.col(f"_bb_{i}")
        cond = c if cond is None else (cond & c)
    score = F.lit(0.0)
    for i, (_, kind, w) in enumerate(sim_cols):
        score = score + F.lit(float(w)) * _field_sim(
            kind, F.col(f"_fa_{i}"), F.col(f"_fb_{i}")
        )
    score = F.round(score / F.lit(tw), 6)
    return (
        left.join(right, cond)
        .select("id_a", "id_b", score.alias("score"))
        .filter(F.col("score") >= threshold)
    )


def edit_distance_join(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 2,
    q: int = 3,
) -> DataFrame:
    """EXACT string-similarity join: every cross pair with
    ``levenshtein(a, b) ≤ max_dist`` — blocking-free fuzzy matching
    (the record_linkage family's complement for when no reliable block
    key exists), via the classic q-gram count filter (Gravano et al.
    2001, "Approximate string joins in a database (almost) for free").

    EXACT, not approximate: an edit operation destroys at most ``q``
    of a string's positional q-grams, so within ``max_dist`` edits at
    least one of ANY ``q·max_dist + 1`` grams survives — candidates
    come from the rarity-PREFIX join (Ed-Join, Xiao/Wang/Lin VLDB'08):
    each string contributes only its ``q·max_dist + 1`` globally-RAREST
    gram occurrences (frequency asc, gram asc, occurrence-rank — the
    containment_pairs total order, bag semantics via (gram, rank)
    pairing), prefixes join on (gram, rank), the ``||s|−|t]| ≤
    max_dist`` length screen applies, and the real ``levenshtein``
    verifies.  Recall 1 by the prefix-filter theorem (the bag overlap
    of a within-distance pair is ≥ max(g_s, g_t) − q·d, so prefixes of
    length q·d+1 must intersect).  Rarity ordering is what makes this
    robust on low-entropy corpora: a shared literal prefix
    ("Customer#000…") puts its grams at the FREQUENT end, so they
    never enter anyone's prefix — a plain shared-gram count join
    degenerated to Σ posting² there (timed out at the 10× scale data;
    the prefix join runs it in seconds).  The oracle is the NAIVE
    cross levenshtein join.

    The count bound is only POSITIVE when ``max(|s|,|t|) > q−1+q·d``;
    below that (short strings — including the no-q-gram ``|s| < q``
    case) two strings can be within ``max_dist`` while sharing ZERO
    q-grams, so those route through a length-bucketed candidate tier
    (equi join on length ± max_dist keys, still no cross product),
    kept exact by the same levenshtein verify.  NULL texts never
    match.

    Scale shape: the prefix join shuffles ≤ q·d+1 (id, gram, rank)
    rows per string, never the cross product; verification joins the
    two string payloads back by id (candidate-bound).  SIZE ``q`` TO
    THE CORPUS: the gram key space (alphabet^q) must stay far above
    the corpus size, or posting lists grow linearly and candidates
    quadratically no matter how rare the prefix grams are (measured:
    q=3 over hex = 4096 keys ran a 14.5× slope at the 10× corpus;
    q=6 = 16.7M keys, 2.2×) — while strings must keep
    ``|s| − q + 1 ≥ q·d + 1`` grams or they fall to the short tier.
    Worst case remains a corpus of near-identical strings — where the
    OUTPUT is the quadratic object.

    Output: (id_a, id_b, dist ≤ max_dist)."""
    from pyspark.sql import Window

    if max_dist < 0 or q < 1:
        raise ValueError("edit_distance_join: max_dist >= 0 and q >= 1 required")

    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(f"id_{tag}"),
            F.col(text_col).alias(f"t_{tag}"),
            F.length(text_col).cast("int").alias(f"len_{tag}"),
        ).filter(F.col(f"t_{tag}").isNotNull())

    sa, sb = side(a, "a"), side(b, "b")

    def grams(df: DataFrame, tag: str) -> DataFrame:
        t = F.col(f"t_{tag}")
        idxs = F.sequence(F.lit(1), F.col(f"len_{tag}") - (q - 1))
        return (
            df.filter(F.col(f"len_{tag}") >= q)
            .select(
                f"id_{tag}",
                f"len_{tag}",
                F.explode(
                    F.transform(idxs, lambda i: F.substring(t, i, q))
                ).alias("_g"),
            )
            # BAG semantics: the count bound speaks of gram occurrences
            # (Σ min(count_s, count_t)), so duplicate grams inside one
            # string pair up by rank — join on (gram, rank) computes
            # exactly the bag intersection
            .withColumn(
                "_r",
                F.row_number().over(
                    Window.partitionBy(f"id_{tag}", "_g").orderBy(
                        F.monotonically_increasing_id()
                    )
                ),
            )
        )

    ga, gb = grams(sa, "a"), grams(sb, "b")
    # global gram frequencies over BOTH sides — the shared total order
    # (freq asc, gram, occurrence-rank) both prefixes sort by
    freq = (
        ga.select(F.col("_g"))
        .unionByName(gb.select(F.col("_g")))
        .groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_f"))
    )
    plen = q * max_dist + 1

    def prefix(g: DataFrame, tag: str) -> DataFrame:
        ranked = g.join(freq, "_g").withColumn(
            "_p",
            F.row_number().over(
                Window.partitionBy(f"id_{tag}").orderBy("_f", "_g", "_r")
            ),
        )
        return ranked.filter(F.col("_p") <= plen).select(
            f"id_{tag}", f"len_{tag}", "_g", "_r"
        )

    pa, pb = prefix(ga, "a"), prefix(gb, "b")
    shared = (
        pa.join(pb, (pa["_g"] == pb["_g"]) & (pa["_r"] == pb["_r"]))
        .filter(F.abs(F.col("len_a") - F.col("len_b")) <= max_dist)
        .select("id_a", "id_b")
        .distinct()
    )
    # short tier: when max(|s|,|t|) <= q-1+q*d the count bound is <= 0
    # and the gram filter proves nothing (a within-distance pair can
    # share zero grams).  Those pairs — both sides necessarily short —
    # come from a length-bucketed equi join: each b row emits its
    # acceptable a-lengths (len ± max_dist keys), so same-length-ish
    # shorts pair without any cross product.
    short_cap = q - 1 + q * max_dist
    short_a = sa.filter(F.col("len_a") <= short_cap).select("id_a", "len_a")
    short_b = (
        sb.filter(F.col("len_b") <= short_cap)
        .select(
            "id_b",
            "len_b",
            F.explode(
                F.sequence(
                    F.greatest(F.col("len_b") - max_dist, F.lit(0)),
                    F.col("len_b") + max_dist,
                )
            ).alias("len_a"),
        )
    )
    short_pairs = short_a.join(short_b, "len_a").select("id_a", "id_b")
    cand = shared.unionByName(short_pairs).distinct()
    verified = (
        cand.join(sa.select("id_a", "t_a"), "id_a")
        .join(sb.select("id_b", "t_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein(F.col("t_a"), F.col("t_b")).alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )
    return verified


def record_linkage_multipass(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    passes: list[list[str]],
    sim_cols: list[SimSpec],
    threshold: float = 0.8,
) -> DataFrame:
    """Multi-pass blocking (the corruption-tolerant recall documented
    in :func:`record_linkage`): run one blocked pass per block-key set
    in ``passes`` and union the matches — a true match whose key was
    corrupted in one pass survives via any pass whose keys held.  The
    score is a pure function of the FIELD values, so a pair found by
    several passes scores identically everywhere; duplicates collapse
    with ``dropDuplicates`` (no max-aggregate needed).

    Scale shape: each pass is one equi join; the union's dedup keys on
    the (id_a, id_b) pair — output-sized, not candidate-sized."""
    if not passes:
        raise ValueError("record_linkage_multipass: passes must be non-empty")
    out = None
    for block_cols in passes:
        p = record_linkage(a, b, id_col, block_cols, sim_cols, threshold)
        out = p if out is None else out.unionByName(p)
    return out.dropDuplicates(["id_a", "id_b"])
