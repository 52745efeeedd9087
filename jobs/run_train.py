"""spark-submit entry: train a correction model on pair files — the
Spark analogue of the reference's `cor-asv-ann-train` CLI
(scripts/train.py: gen_lines over TSV/.pkl pairs, incremental vocab,
train/val split, fit with early stopping).

    python jobs/run_train.py --data pairs.tsv --out model.npz \
        [--width 32] [--depth 2] [--epochs 20] [--lr 2e-3] \
        [--val-split 0.1] [--patience 3] \
        [--scheduled-sampling linear|sigmoid|exponential] [--degrade] \
        [--lm-loss 0.5] [--init-from-lm lm.npz] [--lm-only]

LM recipe (reference transfer-dta-lm.py + seq2seq lm_loss): first
``--lm-only`` pretrains a decoder-only char LM on the target column
(distributed, same treeAggregate loop); then ``--init-from-lm lm.npz``
starts a correction run from its decoder+embedding (adopting the LM's
vocab), optionally regularized by ``--lm-loss W`` (the decoder keeps
training as a plain LM alongside the correction objective).

Distributed synchronous SGD: weights broadcast per epoch, per-partition
gradient sums, one treeAggregate per epoch (model/train_np.py); with a
val split, validation loss drives reference-style early stopping
(patience 3, best weights restored — seq2seq.py:619-623) and optional
scheduled sampling / encoder degradation replay the reference's
gen_data training-time transforms. Prints one JSON line with the loss
curve and held-out CER before/after.
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
    ap.add_argument("--depth", type=int, default=1,
                    help="LSTM stack depth per side (reference default: 2)")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--val-split", type=float, default=0.1)
    ap.add_argument("--patience", type=int, default=3,
                    help="early-stopping patience on val loss (0 = off)")
    ap.add_argument("--scheduled-sampling", choices=["linear", "sigmoid", "exponential"],
                    default=None)
    ap.add_argument("--degrade", action="store_true",
                    help="encoder degradation (~1%% of lines, one position → index 0)")
    ap.add_argument(
        "--val-cap",
        type=int,
        default=10000,
        help="max val lines used for CER (applied before any materialization)",
    )
    ap.add_argument(
        "--lm-loss", type=float, default=0.0, metavar="WEIGHT",
        help="auxiliary LM loss weight (reference seq2seq lm_loss: the "
             "decoder also trains as a plain LM on the targets)",
    )
    ap.add_argument(
        "--init-from-lm", default=None, metavar="LM_NPZ",
        help="initialize decoder+embedding from a pretrained LM model "
             "(the transfer-dta-lm recipe); the LM's vocab/width/depth "
             "are adopted",
    )
    ap.add_argument(
        "--lm-only", action="store_true",
        help="train a pure decoder LM on the TARGET column only "
             "(produces a model for --init-from-lm)",
    )
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

    # incremental vocabulary from the data (seq2seq.py map_files analogue):
    # one scan over both columns, one distinct (bounded by the charset)
    chars = (
        pairs.select(
            F.explode(F.split(F.concat_ws("", "source", "target"), "")).alias("ch")
        )
        .filter(F.col("ch") != "")
        .distinct()
        .collect()
    )
    vocab_chars = {r.ch for r in chars}
    if args.init_from_lm:
        # the transfer keeps the LM's mapping (reference transfer-dta-lm):
        # vocab/width/depth come from the LM; decoder+embedding weights
        # are copied, encoder/attention stay freshly initialized
        from cor_asv_ann_spark.model.train_np import (
            get_params,
            init_from_lm,
            set_params,
        )

        lm = Seq2SeqModel.load_npz(args.init_from_lm)
        missing = vocab_chars - set(lm.vocab)
        if missing:
            raise SystemExit(
                f"--init-from-lm: {len(missing)} data chars absent from the "
                f"LM vocab (e.g. {sorted(missing)[:5]}) — retrain the LM "
                "with a covering charset"
            )
        model = Seq2SeqModel(lm.vocab, width=lm.width, depth=lm.depth)
        set_params(model, init_from_lm(get_params(model), get_params(lm)))
    else:
        model = Seq2SeqModel(make_vocab(vocab_chars), width=args.width, depth=args.depth)

    train, val = pairs.randomSplit([1 - args.val_split, args.val_split], seed=42)
    train = train.persist()
    # the val set is bounded BY CONSTRUCTION (limit before anything is
    # materialized), and CER is computed distributed: broadcast weights,
    # Arrow-batched greedy decode per partition, builtin-levenshtein
    # aggregate — nothing line-shaped ever reaches the driver (the old
    # val.collect() + driver-side decode was an OOM and a single-threaded
    # eval at corpus scale)
    val = val.limit(args.val_cap).persist()
    n_val = val.count()

    from cor_asv_ann_spark.model.corrector import model_state

    def val_cer() -> float | None:
        if n_val == 0:
            return None
        bc = spark.sparkContext.broadcast(model_state(model))

        def run(batches):
            import pandas as pd

            from cor_asv_ann_spark.model.corrector import _model_from_state

            m = _model_from_state(bc.value)
            for pdf in batches:
                srcs = [s if s.endswith("\n") else s + "\n" for s in pdf["source"]]
                tgts = [t if t.endswith("\n") else t + "\n" for t in pdf["target"]]
                outs, _, _ = m.decode_greedy_batch(srcs)
                yield pd.DataFrame({"gt_text": tgts, "ocr_text": outs})

        dec = val.mapInPandas(run, schema="gt_text string, ocr_text string")
        r = dec.agg(
            F.sum(F.levenshtein("ocr_text", "gt_text")).cast("double").alias("d"),
            F.sum(F.greatest(F.length("ocr_text"), F.length("gt_text")))
            .cast("double")
            .alias("l"),
        ).collect()[0]
        bc.unpersist()
        return round(r.d / r.l, 6) if r.l else None

    cer_before = None if args.lm_only else val_cer()
    losses = train_distributed(
        spark, train, model, epochs=args.epochs, lr=args.lr,
        val_df=val if (n_val and args.patience) else None,
        patience=args.patience or 3,
        scheduled_sampling=args.scheduled_sampling,
        encoder_degradation=args.degrade,
        lm_weight=args.lm_loss,
        lm_only=args.lm_only,
    )
    cer_after = None if args.lm_only else val_cer()
    model.save_npz(args.out)
    print(
        json.dumps(
            {
                "n_train": train.count(),
                "n_val": n_val,
                "depth": args.depth,
                "n_epochs_run": len(losses),
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
