"""Interactive REPL: try a correction model (and the Spark operators)
from a Python prompt — the engine's analogue of the reference's
`cor-asv-ann-repl` (/root/reference/ocrd_cor_asv_ann/scripts/repl.py:
1-146: load model → `transcode_line` with greedy + beam decode,
alignment/probability display, readline history, `code.interact`).

    python jobs/repl.py [--model m.h5|m.npz] [--spark]

Bound into the session:
  * ``transcode_line('hello world!')`` → (corrected, score); prints the
    greedy AND beam decodes with per-char probabilities and an ASCII
    attention-alignment map (matplotlib heatmaps when importable —
    absent from this container, so the text rendering is the default,
    matching the reference's plotting-optional behavior).
  * ``model`` — the loaded Seq2SeqModel / RefSeq2Seq.
  * with ``--spark``: ``spark`` (a local session), ``synth_spans``,
    ``correct_pipeline`` and the operator modules for ad-hoc pipeline
    exploration.
"""

from __future__ import annotations

import argparse
import atexit
import code
import os
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def _render_alignment(align: np.ndarray, source: str, target: str) -> str:
    """ASCII attention map: rows = output chars, cols = source chars,
    '#'/'+'/'.' by weight (the reference draws this with imshow)."""
    lines = ["    " + "".join((c if c.isprintable() and c != "\n" else "·") for c in source)]
    for i, row in enumerate(align[: len(target)]):
        ch = target[i] if i < len(target) else "?"
        ch = ch if ch.isprintable() and ch != "\n" else "·"
        cells = "".join(
            "#" if w > 0.5 else "+" if w > 0.2 else "." if w > 0.05 else " "
            for w in row[: len(source)]
        )
        lines.append(f"  {ch} {cells}")
    return "\n".join(lines)


def make_transcode_line(model, beam_width: int = 4):
    def transcode_line(source_line: str):
        src = source_line if source_line.endswith("\n") else source_line + "\n"
        outs, probs, aligns = model.decode_greedy_batch([src])
        greedy, gprobs = outs[0], probs[0]
        gscore = float(-np.sum(np.log(np.maximum(gprobs, 1e-12))) / max(len(gprobs), 1))
        print(f"greedy (ppl={np.exp(gscore):.2f}): {greedy!r}")
        print(_render_alignment(np.asarray(aligns[0]), src, greedy))
        try:
            # decode_beam_batch: both graph flavors (numpy + reference-
            # h5) share it, same (texts, probs, aligns) contract
            bouts, bprobs, _ = model.decode_beam_batch([src], beam_width=beam_width)
            btext = bouts[0]
            bscore = float(
                -np.sum(np.log(np.maximum(bprobs[0], 1e-12))) / max(len(bprobs[0]), 1)
            )
            print(f"beamed (ppl={np.exp(bscore):.2f}): {btext!r}")
        except Exception as e:  # beam path is optional for charmap stubs
            btext, bscore = greedy, gscore
            print(f"(beam unavailable: {e})")
        try:
            from matplotlib import pyplot

            pyplot.imshow(np.asarray(aligns[0]))
            pyplot.title("alignment")
            pyplot.show()
        except ModuleNotFoundError:
            pass
        return btext, bscore

    return transcode_line


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None, help=".h5 (reference format) or .npz")
    ap.add_argument("--beam-width", type=int, default=4)
    ap.add_argument("--spark", action="store_true",
                    help="also start a local SparkSession with the operators bound")
    args = ap.parse_args()

    if args.model and args.model.endswith(".h5"):
        from cor_asv_ann_spark.model.keras_graph import RefSeq2Seq

        model = RefSeq2Seq.load_h5(args.model)
    elif args.model:
        from cor_asv_ann_spark.model.seq2seq_np import Seq2SeqModel

        model = Seq2SeqModel.load_npz(args.model)
    else:
        from cor_asv_ann_spark.model.seq2seq_np import Seq2SeqModel, make_vocab

        print("no --model: untrained demo model (identity-ish output)")
        model = Seq2SeqModel(
            make_vocab(set("abcdefghijklmnopqrstuvwxyz .,!?\n")), width=32, seed=1)

    bindings = {"model": model, "np": np,
                "transcode_line": make_transcode_line(model, args.beam_width)}
    if args.spark:
        from cor_asv_ann_spark import operators
        from cor_asv_ann_spark.operators.correction import correct_pipeline
        from cor_asv_ann_spark.session import build_session
        from cor_asv_ann_spark.sources.spans import synth_spans

        spark = build_session(app="repl", cpus=8, shuffle_partitions=8)
        bindings.update(spark=spark, synth_spans=synth_spans,
                        correct_pipeline=correct_pipeline, operators=operators)

    try:
        import readline
        import rlcompleter

        history = os.path.expanduser("~/.cor_asv_ann_spark_repl_history")
        if os.path.exists(history):
            readline.read_history_file(history)
        atexit.register(lambda: readline.write_history_file(history))
        readline.set_completer(rlcompleter.Completer(bindings).complete)
        readline.parse_and_bind("tab:complete")
    except ImportError:
        pass

    print(
        "usage example:\n"
        ">>> transcode_line('hello world!')\n"
        + (">>> correct_pipeline(synth_spans(spark, '/root/testdata/sf0.001', "
           "noisy=True)).show(3)\n" if args.spark else "")
        + "now entering REPL...\n"
    )
    code.interact(local=bindings)


if __name__ == "__main__":
    main()
