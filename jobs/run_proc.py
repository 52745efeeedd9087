"""spark-submit entry: apply a correction model to text files, writing
one corrected output file per input file — the Spark re-expression of
the reference's `cor-asv-ann-proc` CLI
(/root/reference/ocrd_cor_asv_ann/scripts/proc.py:1-100: load model,
decode source side of plain/TSV/.pkl files in batches accounting for
file names line by line, write each file's lines to a name derived by
stripping ``--old-suffix`` and appending ``--new-suffix``).

    python jobs/run_proc.py --model m.h5|m.npz [--fast] \
        [--rejection 0.5] [--charmap '{"ſ":"s"}'] \
        [--old-suffix ''] [--new-suffix .cor.txt] FILE [FILE...]

Spark shape: the FILE is the unit of parallelism (exactly the
reference's batching grain) — a ``binaryFile`` scan yields one row per
input file, an Arrow batch splits it into ordered (file, line_no,
source) rows, the model corrector decodes lines Arrow-batched across
the cluster, and each file's lines come back through an ordered
per-file collect (files are CLI arguments — a bounded driver-side
list; the LINES within them are decoded distributed). Greedy is the
default and ``--fast`` is accepted for reference-CLI compatibility;
beam is opt-in via ``--beam`` (the reference defaults to beamed and
offers -f/--fast — flipped here because greedy is the documented ~10×
cheaper path and both CLIs expose both).

Formats: plain text (one source line per line), TSV (first field =
source, target ignored — as the reference does), ``.pkl`` dumps of
(source, target) string pairs. Prob-line/confmat pickle channels go
through ``jobs/run_correction.py`` (the spans pipeline carries conf
columns); this file-to-file CLI is for the string path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, ".")


def read_files_ordered(spark, paths: list[str]):
    """binaryFile scan over the given files → (file, line_no, source)
    with exact in-file line order (one Arrow row per file in, split in
    Python — text row order from a parallel text scan is NOT
    guaranteed, file bytes are)."""
    import pickle

    import pandas as pd

    df = spark.read.format("binaryFile").load(paths)

    def split(batches):
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                name = path[len("file:"):] if path.startswith("file:") else path
                if name.endswith(".pkl"):
                    pairs = pickle.loads(bytes(content))
                    lines = []
                    for pair in pairs:
                        src = pair[0] if isinstance(pair, (list, tuple)) else pair
                        if not isinstance(src, str):
                            raise NotImplementedError(
                                "prob-line/confmat pickles: use "
                                "jobs/run_correction.py (conf channels ride "
                                "the spans pipeline)"
                            )
                        lines.append(src.rstrip("\n"))
                else:
                    text = bytes(content).decode("utf-8", errors="replace")
                    lines = text.split("\n")
                    if lines and lines[-1] == "":
                        lines.pop()
                    # TSV: source is the first tab field (reference proc
                    # ignores the target side)
                    lines = [ln.split("\t", 1)[0] for ln in lines]
                yield pd.DataFrame(
                    {
                        "file": [name] * len(lines),
                        "line_no": range(len(lines)),
                        "source": lines,
                    }
                )

    return df.mapInPandas(split, schema="file string, line_no long, source string")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, help=".h5 / .npz weights")
    ap.add_argument("--fast", action="store_true",
                    help="greedy decode (reference-CLI compat; greedy is "
                         "already the default here)")
    ap.add_argument("--beam", action="store_true", help="beam decode")
    ap.add_argument("--rejection", type=float, default=0.5,
                    help="input-char probability in all hypotheses "
                         "(0 = raw predictions)")
    ap.add_argument("--charmap", default=None,
                    help="JSON map applied to input chars before decoding")
    ap.add_argument("--old-suffix", default="",
                    help="suffix to strip from input names")
    ap.add_argument("--new-suffix", default=".cor.txt",
                    help="suffix appended to derive output names")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("data", nargs="+", help="plain/TSV/.pkl input files")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from cor_asv_ann_spark.model.corrector import make_model_corrector
    from cor_asv_ann_spark.operators.correction import correct_lines
    from cor_asv_ann_spark.session import build_session

    if args.model.endswith(".h5"):
        from cor_asv_ann_spark.model.keras_graph import RefSeq2Seq

        model = RefSeq2Seq.load_h5(args.model)
    else:
        from cor_asv_ann_spark.model.seq2seq_np import Seq2SeqModel

        model = Seq2SeqModel.load_npz(args.model)

    spark = build_session(app="proc", cpus=args.cpus)
    lines = read_files_ordered(spark, args.data)
    if args.charmap:
        cmap = json.loads(args.charmap)
        src = F.col("source")
        for frm, to in cmap.items():
            src = F.replace(src, F.lit(frm), F.lit(to))
        lines = lines.withColumn("source", src)

    corrector = make_model_corrector(
        spark, model, beam=args.beam and not args.fast,
        rejection_threshold=args.rejection,
    )
    frame = lines.select(
        F.col("file").alias("doc_id"),
        F.col("line_no").cast("int").alias("line_no"),
        F.array(F.lit("line")).alias("kinds"),
        F.array(F.concat(F.col("source"), F.lit("\n"))).alias("texts"),
        F.array(F.lit(None).cast("string")).alias("media_refs"),
        F.array(F.lit(0)).alias("offsets"),
    )
    out = correct_lines(frame, corrector).select(
        F.col("doc_id").alias("file"), "line_no",
        F.concat_ws("", F.col("out_texts")).alias("corrected"),
    )
    # STREAM the ordered result to the client — toLocalIterator pulls
    # one partition at a time, so driver memory stays bounded even when
    # one input file is huge (a groupBy + collect_list + collect would
    # materialize every corrected line of a file at once). Output-file
    # writing is inherently client-side (exactly as the reference CLI
    # writes its per-file outputs).
    done = []
    cur_name, cur_f = None, None
    for row in out.orderBy("file", "line_no").toLocalIterator():
        if row.file != cur_name:
            if cur_f is not None:
                cur_f.close()
            cur_name = row.file
            base = cur_name
            if args.old_suffix and base.endswith(args.old_suffix):
                base = base[: -len(args.old_suffix)]
            elif not args.old_suffix:
                base = os.path.splitext(base)[0]
            out_path = base + args.new_suffix
            cur_f = open(out_path, "w", encoding="utf-8")
            done.append(out_path)
        cur_f.write(row.corrected.rstrip("\n") + "\n")
    if cur_f is not None:
        cur_f.close()
    print(json.dumps({"files": len(done), "outputs": done}))
    spark.stop()


if __name__ == "__main__":
    main()
