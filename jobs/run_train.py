"""spark-submit entry: train a correction model on pair files — the
Spark analogue of the reference's `cor-asv-ann-train` CLI
(scripts/train.py: gen_lines over TSV/.pkl pairs, incremental vocab,
train/val split, fit with early stopping).

    python jobs/run_train.py --data pairs.tsv --out model.npz \
        [--width 32] [--epochs 20] [--lr 2e-3] [--val-split 0.1]

Distributed synchronous SGD: weights broadcast per epoch, per-partition
gradient sums, one treeAggregate per epoch (model/train_np.py). Prints
one JSON line with the loss curve and held-out CER before/after.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, nargs="+")
    ap.add_argument("--out", required=True, help="output .npz weights")
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--val-split", type=float, default=0.1)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cor_asv_ann_spark.model.seq2seq_np import Seq2SeqModel, make_vocab
    from cor_asv_ann_spark.model.train_np import train_distributed
    from cor_asv_ann_spark.session import build_session
    from cor_asv_ann_spark.sources.lines import read_pairs, scan_vocabulary

    spark = build_session(app="train", cpus=args.cpus)
    pairs = None
    for p in args.data:
        part = read_pairs(spark, p).select("source", "target")
        pairs = part if pairs is None else pairs.unionByName(part)

    # incremental vocabulary from the data (seq2seq.py map_files analogue)
    vocab_chars = set()
    for col in ("source", "target"):
        chars = (
            pairs.select(F.explode(F.split(F.col(col), "")).alias("ch"))
            .filter(F.col("ch") != "")
            .distinct()
            .collect()
        )
        vocab_chars |= {r.ch for r in chars}
    model = Seq2SeqModel(make_vocab(vocab_chars), width=args.width, depth=1)

    train, val = pairs.randomSplit([1 - args.val_split, args.val_split], seed=42)
    train = train.persist()
    val_rows = val.collect()

    def val_cer() -> float | None:
        if not val_rows:
            return None
        srcs = [r.source if r.source.endswith("\n") else r.source + "\n" for r in val_rows]
        tgts = [r.target if r.target.endswith("\n") else r.target + "\n" for r in val_rows]
        outs, _, _ = model.decode_greedy_batch(srcs)
        import difflib

        dist = sum(
            1 - difflib.SequenceMatcher(None, o, t).ratio() for o, t in zip(outs, tgts)
        )
        return round(dist / len(val_rows), 6)

    cer_before = val_cer()
    losses = train_distributed(
        spark, train, model, epochs=args.epochs, lr=args.lr
    )
    cer_after = val_cer()
    model.save_npz(args.out)
    print(
        json.dumps(
            {
                "n_train": train.count(),
                "n_val": len(val_rows),
                "loss_first": round(losses[0], 6) if losses else None,
                "loss_last": round(losses[-1], 6) if losses else None,
                "val_cer_before": cer_before,
                "val_cer_after": cer_after,
                "model": args.out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
