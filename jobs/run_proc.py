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

Formats (proc.py:33-40 + lib/seq2seq.py:946-964 gen_lines):
 - plain text (one source line per line; CRLF-safe via splitlines),
 - TSV (first field = source, target ignored — as the reference does),
 - ``.pkl`` dumps of (source, target) pairs where source is
   - a plain string,
   - a prob line (sequence of (char, prob) tuples), or
   - a confmat (sequence of alternative lists of (string, prob)).
Prob lines and confmats ride the confmat channel of the model
corrector (encoding 3): a prob-line char (c, p) becomes the chunk
[(c, p), ('', 1-p)] whose vectorization is bit-identical to the
prob-line encoding (p at c's index, the deficit at index 0 /
underspecified — seq2seq.py:1037-1041 semantics).

The ``--charmap`` is applied single-pass with str.translate /
str.maketrans (seq2seq.py:929-930,975-976) inside the line-splitting
UDF — each character mapped exactly once, so swap maps like
{"a":"b","b":"a"} cannot cascade (a chained per-entry replace would
corrupt them). Multi-char keys fall back to one regex alternation
pass, longest key first. Lines are NFC-normalized after the charmap
(seq2seq.py:978-979).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, ".")


def make_charmap_fn(cmap: dict[str, str] | None):
    """Single-pass charmap: str.translate for 1-char keys (the
    reference's exact mechanism, seq2seq.py:929-930), one regex
    alternation pass (longest-first) when multi-char keys appear.
    Either way every input character is consumed exactly once — no
    output of one mapping can feed another."""
    if not cmap:
        return lambda s: s
    if all(len(k) == 1 for k in cmap):
        table = str.maketrans(cmap)
        return lambda s: s.translate(table)
    import re

    pat = re.compile(
        "|".join(re.escape(k) for k in sorted(cmap, key=len, reverse=True))
    )
    return lambda s: pat.sub(lambda m: cmap[m.group(0)], s)


def _pkl_source_row(src, charmap_fn):
    """One pickle pair's source side → (text, confmat_json|None)
    following gen_lines (seq2seq.py:946-964): prob lines and confmats
    keep their confidence as confmat chunks; a source without a
    trailing EOS is replaced by a bare newline line (seq2seq.py:962-964
    'except when it's not')."""
    import unicodedata

    pre_mapped = False
    if isinstance(src, str):
        text, chunks = src, None
    elif not src:  # empty
        text, chunks = "", None
    elif isinstance(src[0], tuple) and isinstance(src[0][0], str) and len(src[0]) == 2 \
            and not isinstance(src[0][1], (list, tuple)):
        # prob line: [(char, prob), ...] → exact confmat chunks. The
        # chars are charmapped + NFC'd EXACTLY like the nominal text —
        # the reference translates/normalizes the prob-line source it
        # vectorizes (seq2seq.py:975-979), so decoding the raw chars
        # would silently diverge from the reference CLI. (EOS presence
        # is judged on the RAW chars, as the reference does at :962
        # before its translate at :975.)
        mapped = [
            unicodedata.normalize("NFC", charmap_fn(c)) for c, _ in src
        ]
        text = "".join(mapped)
        chunks = [
            [{"alt": mc, "p": float(p)}] + ([{"alt": "", "p": 1.0 - float(p)}]
                                            if float(p) < 1.0 else [])
            for mc, (_, p) in zip(mapped, src)
        ]
        pre_mapped = True
    else:
        # confmat: [[(alt, prob), ...], ...]; nominal text = first
        # alternative of each chunk (seq2seq.py:957-958); the chunks
        # themselves stay untranslated — the reference vectorizes
        # source_conf, not the translated text, for this encoding
        text = "".join(chunk[0][0] if chunk else "" for chunk in src)
        chunks = [
            [{"alt": a, "p": float(p)} for a, p in chunk] for chunk in src
        ]
    raw_text = "".join(c for c, _ in src) if pre_mapped else text
    if not raw_text.endswith("\n") and chunks is not None:
        # reference replaces a non-EOS-terminated confidence line
        # entirely with a bare EOS (seq2seq.py:962-964); plain strings
        # keep their content — EOS is appended by the frame
        # construction below (mirrors the reference text path)
        return "", json.dumps([[{"alt": "\n", "p": 1.0}]])
    if pre_mapped:
        text = text.rstrip("\n")
    else:
        text = unicodedata.normalize("NFC", charmap_fn(text.rstrip("\n")))
    return text, (json.dumps(chunks) if chunks is not None else None)


def read_files_ordered(spark, paths: list[str], cmap: dict[str, str] | None = None):
    """binaryFile scan over the given files → (file, line_no, source,
    confmat) with exact in-file line order (one Arrow row per file in,
    split in Python — text row order from a parallel text scan is NOT
    guaranteed, file bytes are). ``confmat`` is a JSON chunk list for
    pickle prob-line/confmat sources, null for plain strings."""
    import pickle
    import unicodedata

    import pandas as pd

    df = spark.read.format("binaryFile").load(paths)

    def split(batches):
        charmap_fn = make_charmap_fn(cmap)
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                name = path[len("file:"):] if path.startswith("file:") else path
                cms: list[str | None]
                if name.endswith(".pkl"):
                    pairs = pickle.loads(bytes(content))
                    lines, cms = [], []
                    for pair in pairs:
                        # pickle rows are (source, target) pairs
                        # (seq2seq.py:946 `source_text, target_text = line`);
                        # tolerate bare source strings too
                        src = pair[0] if isinstance(pair, (list, tuple)) \
                            and len(pair) == 2 else pair
                        text, cm = _pkl_source_row(src, charmap_fn)
                        lines.append(text)
                        cms.append(cm)
                else:
                    # universal newlines EXACTLY as text mode: \r\n, \r,
                    # \n only (str.splitlines would also split on \f,
                    # \v, \x85, U+2028… which the reference keeps
                    # inside a line)
                    import re as _re

                    text = bytes(content).decode("utf-8", errors="replace")
                    lines = _re.split(r"\r\n|\r|\n", text)
                    if lines and lines[-1] == "":
                        lines.pop()
                    # TSV: source is the first tab field (reference proc
                    # ignores the target side)
                    lines = [
                        unicodedata.normalize(
                            "NFC", charmap_fn(ln.split("\t", 1)[0]))
                        for ln in lines
                    ]
                    cms = [None] * len(lines)
                yield pd.DataFrame(
                    {
                        "file": [name] * len(lines),
                        "line_no": range(len(lines)),
                        "source": lines,
                        "confmat": cms,
                    }
                )

    return df.mapInPandas(
        split, schema="file string, line_no long, source string, confmat string"
    )


def derive_output_name(name: str, old_suffix: str, new_suffix: str) -> str:
    """Output-name derivation matching proc.py:72-78: remove
    ``old_suffix`` wherever it occurs; if it was given but absent, fall
    back to stripping the last extension with a warning."""
    if old_suffix and old_suffix in name:
        base = name.replace(old_suffix, "")
    else:
        base, ext = os.path.splitext(name)
        if old_suffix:
            print(
                f"warning: input file '{name}' does not contain suffix "
                f"'{old_suffix}', removing '{ext}'",
                file=sys.stderr,
            )
    if base == name:
        print(f"warning: input file '{name}' does not have a suffix",
              file=sys.stderr)
    return base + new_suffix


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

    cmap = json.loads(args.charmap) if args.charmap else None
    has_confidence = any(p.endswith(".pkl") for p in args.data)

    spark = build_session(app="proc", cpus=args.cpus)
    lines = read_files_ordered(spark, args.data, cmap)

    corrector = make_model_corrector(
        spark, model, beam=args.beam and not args.fast,
        rejection_threshold=args.rejection,
        use_confmat=has_confidence and not args.beam,
    )
    frame = lines.select(
        F.col("file").alias("doc_id"),
        F.col("line_no").cast("int").alias("line_no"),
        F.array(F.lit("line")).alias("kinds"),
        F.array(F.concat(F.col("source"), F.lit("\n"))).alias("texts"),
        F.array(F.lit(None).cast("string")).alias("media_refs"),
        F.array(F.lit(0)).alias("offsets"),
        F.col("confmat"),
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
            out_path = derive_output_name(
                cur_name, args.old_suffix, args.new_suffix)
            cur_f = open(out_path, "w", encoding="utf-8")
            done.append(out_path)
        cur_f.write(row.corrected.rstrip("\n") + "\n")
    if cur_f is not None:
        cur_f.close()
    print(json.dumps({"files": len(done), "outputs": done}))
    spark.stop()


if __name__ == "__main__":
    main()
