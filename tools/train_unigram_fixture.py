"""Regenerate the committed tiny unigram-LM vocab fixture
(kafka_merge_purge_spark/resources/unigram_vocab_tiny.tsv) from the
sf0.001 documents table — run once, commit the output; the x_unigram
oracle SQL is generated from this file at import time (the
bpe_merges_tiny.txt convention)."""

import sys

from kafka_merge_purge_spark.session import get_spark
from kafka_merge_purge_spark.sources.batch import load_table
from kafka_merge_purge_spark.operators.text import (
    DEFAULT_UNIGRAM_VOCAB,
    corpus_unigram_vocab,
)


def main(sf_dir: str = "/root/testdata/sf0.001", vocab_size: int = 48) -> None:
    spark = get_spark("train-unigram-fixture")
    docs = load_table(spark, sf_dir, "documents")
    vocab = corpus_unigram_vocab(docs, vocab_size=vocab_size)
    with open(DEFAULT_UNIGRAM_VOCAB, "w", encoding="utf-8") as fh:
        fh.write("# piece\tscore_q — trained by tools/train_unigram_fixture.py\n")
        for piece, score in sorted(vocab.items()):
            fh.write(f"{piece}\t{score}\n")
    print(f"wrote {len(vocab)} pieces to {DEFAULT_UNIGRAM_VOCAB}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
