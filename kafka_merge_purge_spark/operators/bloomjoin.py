"""Bloom-filter semi-join — the runtime-filter scale path for big⋈big.

At 100 TB the expensive part of ``big JOIN small`` (where ``small`` is
10⁶–10⁸ keys: too big to broadcast as rows, far smaller than ``big``) is
shuffling the probe side.  Engines solve it with a runtime filter: build
a tiny Bloom sketch of the build side's keys, apply it to the probe side
BEFORE its exchange, and let the real join see only the survivors.
Spark injects these automatically for some shapes
(``spark.sql.optimizer.runtime.bloomFilter.enabled``); this operator is
the explicit, always-available form with an EXACT result — Bloom false
positives are removed by a verification semi-join that now runs over the
pruned candidate set instead of the full probe side.

Layout: a *blocked* Bloom filter (one 64-bit word per key — Putze,
Sanders & Singler 2007's cache-line blocking collapsed to word width).
Each key picks one word by hash and sets ``bits_per_key`` bits inside
it, so the whole sketch is a ``(word_idx, word)`` table of at most
``n_words`` rows that broadcasts even when the key set itself cannot.
Membership test = ONE broadcast equi-join on ``word_idx`` + a bitwise
mask compare — no range join, no per-row Python.

False-positive rate ≈ (bits_per_key · n_keys / (64 · n_words))^bits_per_key;
the default sizing (n_words = n_keys / 4, 3 bits) gives ~0.7 %, i.e. the
verification join's input is the true matches plus <1 % noise.

Exactness: the final result is precisely ``big LEFT SEMI JOIN keys`` —
the Bloom stage only ever REMOVES definite non-matches (a word absent
from the sketch, or a set-bit missing, proves no build key hashed
there), and the verification join removes the false positives.  NULL
probe keys are dropped, matching SQL ``IN`` / semi-join semantics.

All hashing is the repo's portable md5 convention (dedup.md5_int), so
the operator is deterministic across engines and restarts — but note
the ORACLE does not need to replay the sketch at all: the declared
semantics are the plain semi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_merge_purge_spark.operators.dedup import md5_int

#: sketch rows per distinct build key (n_words = n_keys // WORDS_DIVISOR,
#: clamped) — 4 keys/word × 3 bits ≈ 0.7 % FPR, 8 bytes of sketch per
#: 4 keys ⇒ a 10⁸-key build side becomes a ~200 MB... no: 10⁸/4 words
#: × 8 B = 200 MB is past broadcast comfort; the clamp caps the sketch
#: at MAX_WORDS (16 MiB of words) and lets the FPR degrade gracefully
#: instead — at the cap a 10⁸-key side sees load 3·10⁸/(64·2²¹) ≈ 2.2,
#: i.e. the filter saturates and passes everything through to the
#: verification join, which is exactly the plan you'd have had anyway.
WORDS_DIVISOR = 4
MIN_WORDS = 1 << 10
MAX_WORDS = 1 << 21


def _bloom_cols(key: Column, n_words: int, bits_per_key: int) -> tuple[Column, Column]:
    """(word_idx, mask) for one key — identical expressions on both the
    build and probe sides, all inside whole-stage codegen."""
    s = key.cast("string")
    word_idx = F.pmod(md5_int(F.concat(F.lit("bw:"), s)), F.lit(n_words))
    mask = F.lit(0).cast("long")
    for i in range(bits_per_key):
        bit = F.pmod(md5_int(F.concat(F.lit(f"bb{i}:"), s)), F.lit(64))
        # F.shiftleft only takes a literal bit count; call_function
        # passes the column form through to the same JVM expression.
        mask = mask.bitwiseOR(
            F.call_function("shiftleft", F.lit(1).cast("long"), bit.cast("int"))
        )
    return word_idx, mask


def bloom_sketch(
    keys: DataFrame,
    key: str,
    n_words: int,
    bits_per_key: int = 3,
) -> DataFrame:
    """Aggregate a key frame into the (word_idx, word) Bloom table.

    One hash aggregate: map-side combine collapses each task to its
    distinct word indexes, so the shuffle carries ≤ n_words rows per
    task regardless of key count."""
    word_idx, mask = _bloom_cols(F.col(key), n_words, bits_per_key)
    return (
        keys.filter(F.col(key).isNotNull())
        .select(word_idx.alias("word_idx"), mask.alias("_mask"))
        .groupBy("word_idx")
        .agg(F.bit_or("_mask").alias("word"))
    )


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    small_key: str | None = None,
    bits_per_key: int = 3,
    n_words: int | None = None,
) -> DataFrame:
    """``big LEFT SEMI JOIN small ON key`` with a Bloom pre-filter on the
    probe side — exact result, probe-side shuffle reduced to (true
    matches + <1 % false positives).

    Stages:
      1. ``keys`` = distinct build keys (the semi-join's right side).
      2. Sketch: one aggregate of ``keys`` into ≤ ``n_words`` rows.
      3. Prune: probe rows inner-join the broadcast sketch on
         ``word_idx``; survivors must have every mask bit set.
      4. Verify: left-semi join of survivors against ``keys`` removes
         Bloom false positives — the only shuffle that still sees probe
         rows, now candidate-bound.

    ``n_words`` defaults from one bounded count of ``keys`` (the
    ``_state_hint`` probe convention); pass it explicitly to skip the
    probe job when the build cardinality is already known.
    ``small_key`` names the build side's key column when it differs
    from the probe side's (``o_orderkey`` vs ``l_orderkey``).

    Key dtypes must MATCH: the sketch hashes each side's key via its
    own string rendering, so a bigint probe against a decimal build
    would hash ``'1'`` vs ``'1.00'`` and silently prune every true
    match — an error the verification join could never repair (it
    only sees bloom survivors).  Mismatches raise at plan time; cast
    one side explicitly to state which coercion you mean.
    """
    sk = small_key or key
    big_t = dict(big.dtypes).get(key)
    small_t = dict(small.dtypes).get(sk)
    if big_t != small_t:
        raise ValueError(
            f"bloom_semi_join: key dtype mismatch — big.{key} is {big_t}, "
            f"small.{sk} is {small_t}; md5(cast-to-string) would disagree "
            "and silently drop true matches. Cast one side explicitly."
        )
    keys = small.select(F.col(sk).alias(key)).distinct()
    if n_words is None:
        n_keys = keys.limit(64 * MAX_WORDS).count()
        n_words = max(MIN_WORDS, min(MAX_WORDS, n_keys // WORDS_DIVISOR))
    sketch = bloom_sketch(keys, key, n_words, bits_per_key)

    # temp/sketch column names must not collide with probe columns: a
    # probe column named _bloom_word_idx/_bloom_mask would be silently
    # overwritten-then-dropped (data loss), and a probe column 'word'
    # would make the sketch filter ambiguous (r13 advice) — uniquify
    # by suffixing a counter while any candidate name is taken.
    suffix, n = "", 0
    while any(
        c + suffix in big.columns for c in ("_bloom_word_idx", "_bloom_mask", "_bloom_word")
    ):
        n += 1
        suffix = str(n)
    widx_c, mask_c, word_c = (
        "_bloom_word_idx" + suffix,
        "_bloom_mask" + suffix,
        "_bloom_word" + suffix,
    )
    word_idx, mask = _bloom_cols(F.col(key), n_words, bits_per_key)
    candidates = (
        big.withColumn(widx_c, word_idx)
        .withColumn(mask_c, mask)
        .join(
            F.broadcast(
                sketch.select(
                    F.col("word_idx").alias(widx_c), F.col("word").alias(word_c)
                )
            ),
            widx_c,
        )
        .filter(F.col(word_c).bitwiseAND(F.col(mask_c)) == F.col(mask_c))
        .drop(widx_c, mask_c, word_c)
    )
    return candidates.join(keys, key, "left_semi")
