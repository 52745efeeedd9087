"""Bridge the numpy seq2seq into the Spark correction pipeline.

The weight dict is broadcast once (sc.broadcast — the Spark analogue of
the reference loading its h5 model once per process, seq2seq.py:1121-;
the reference capped correction at max_workers=1 because the TF model
couldn't be shared, wrapper/transcode.py:46 — broadcasting removes that
ceiling entirely). Each Python worker rebuilds the model lazily from
the broadcast on first use and caches it for all subsequent Arrow
batches.

The corrector returns per-line soft-alignment-derived Viterbi paths so
span segmentation uses the model's attention (J5) instead of the NW
fallback.
"""

from __future__ import annotations

import pandas as pd

from .seq2seq_np import Seq2SeqModel, viterbi_path

_MODEL_CACHE: dict[int, Seq2SeqModel] = {}


def _model_from_state(state: dict):
    if state.get("kind") == "ref":
        # reference-graph model loaded from a Keras HDF5 file
        from .keras_graph import RefSeq2Seq

        return RefSeq2Seq.from_state(state)
    m = Seq2SeqModel(
        state["vocab"], width=state["width"], depth=state["depth"], window=state["window"]
    )
    z = state["weights"]
    m.embed = z["embed"]
    m.att_We, m.att_Wd, m.att_v = z["att_We"], z["att_Wd"], z["att_v"]
    m.out_W, m.out_b = z["out_W"], z["out_b"]
    for name, layer in [("enc_fwd", m.enc_fwd), ("enc_bwd", m.enc_bwd)] + [
        (f"enc{i}", l) for i, l in enumerate(m.enc_stack)
    ] + [(f"dec{i}", l) for i, l in enumerate(m.dec_stack)]:
        layer.W, layer.U, layer.b = z[f"{name}_W"], z[f"{name}_U"], z[f"{name}_b"]
    return m


def model_state(model) -> dict:
    if hasattr(model, "state"):  # RefSeq2Seq (Keras-h5-loaded graph)
        return model.state()
    return {
        "vocab": model.vocab,
        "width": model.width,
        "depth": model.depth,
        "window": model.window,
        "weights": model.weights_dict(),
    }


def make_model_corrector(
    spark,
    model,
    beam: bool = False,
    beam_width: int = 4,
    rejection_threshold: float = 0.3,
    beam_width_in: int = 15,
    beam_threshold: float = 0.2,
    use_conf: bool = False,
    use_confmat: bool = False,
    charmap: "dict[str, str] | None" = None,
    lm=None,
):
    """CorrectorFn over a broadcast model: texts → (out_lines, probs,
    viterbi paths).

    ``beam=True`` switches to beam decoding (the reference's opt-in slow
    path, README "up to ten times less CPU" for greedy) — batched
    encoder + hypothesis-parallel expansion, alignments preserved.
    ``use_conf=True`` consumes a per-line confidence channel (prob-line
    encoding); ``use_confmat=True`` the confusion-network channel
    (encoding 3 — the reference flagship's multi-TextEquiv input,
    wrapper/transcode.py:236-277). ``charmap`` is the processor's input
    character translation, applied SINGLE-PASS via str.maketrans before
    decoding (transcode.py:249-260) — incl. confmat alternatives.
    ``beam_width_in``/``beam_threshold`` are the reference's
    fixed_beam_width / relative_beam_width parameters."""
    trans = str.maketrans(charmap) if charmap else None
    bc = spark.sparkContext.broadcast(model_state(model))
    bc_lm = (
        spark.sparkContext.broadcast({"table": lm.table, "order": lm.order})
        if lm is not None
        else None
    )

    def _model() -> Seq2SeqModel:
        key = id(bc)
        m = _MODEL_CACHE.get(key)
        if m is None:
            m = _model_from_state(bc.value)
            _MODEL_CACHE[key] = m
        return m

    def _lm():
        if bc_lm is None:
            return None
        key = ("lm", id(bc_lm))
        l = _MODEL_CACHE.get(key)
        if l is None:
            from ..operators.lm import CharNgramLM

            l = CharNgramLM(bc_lm.value["table"], order=bc_lm.value["order"])
            _MODEL_CACHE[key] = l
        return l

    def corrector(texts: pd.Series, confs: pd.Series | None = None):
        m = _model()
        if trans is not None:
            texts = texts.map(lambda t: (t or "").translate(trans))
        if beam:
            # batched-encoder + hypothesis-parallel beam; alignments come
            # back so beam mode keeps the Viterbi segmentation path too.
            # lm (broadcast with the weights) reranks hypotheses
            outs, probs, aligns = m.decode_beam_batch(
                list(texts),
                beam_width=beam_width,
                rejection_threshold=rejection_threshold,
                beam_width_in=beam_width_in,
                beam_threshold=beam_threshold,
                lm=_lm(),
            )
            paths = [
                viterbi_path(al[:, : len(t)] if al.size else al)
                for t, al in zip(texts, aligns)
            ]
            return pd.Series(outs, index=texts.index), probs, paths
        if use_confmat and confs is not None:
            # confs carries the confmat column here (chunk lists of
            # {alt, p} structs from Arrow) → (alt, p) tuples
            def _tr(s: str) -> str:
                return s.translate(trans) if trans is not None else s

            cms = [
                [
                    [(_tr(d["alt"]), float(d["p"])) for d in chunk]
                    for chunk in cm
                ]
                if cm is not None
                else [[(ch, 1.0)] for ch in t]
                for t, cm in zip(texts, confs)
            ]
            outs, probs, aligns = m.decode_greedy_confmat(cms)
        elif use_conf and confs is not None:
            outs, probs, aligns = m.decode_greedy_prob(
                list(texts), [list(c) if c is not None else None for c in confs]
            )
        else:
            outs, probs, aligns = m.decode_greedy_batch(list(texts))
        paths = []
        for t, out, al in zip(texts, outs, aligns):
            # attention matrix is (out_len, in_len) → input-offset map
            paths.append(viterbi_path(al[:, : len(t)] if al.size else al))
        return pd.Series(outs, index=texts.index), probs, paths

    corrector.wants_conf = use_conf
    corrector.wants_confmat = use_confmat
    return corrector


def make_stateful_doc_corrector(spark, model, charmap=None):
    """Document-sequential corrector for STATEFUL models (h5 config
    stateful=True, seq2seq.py:1134/1152): decoder LSTM state carries
    across a document's lines, reset at document boundaries. Takes
    per-document line lists; lines of many documents still advance in
    lockstep (one batched pass per round — model.decode_greedy_docs).

    Returns ``correct_docs(doc_lines) -> (outs, probs, paths)`` with
    per-document lists, consumed by
    ``operators.correction.correct_lines_stateful``.

    Only meaningful for stateful-TRAINED models: a stateless-trained
    model decoded this way enters decoder states it never saw in
    training and degrades hard (measured 6× worse doc edit distance
    with the trained_w64_d1 fixture). jobs/run_correction auto-routes
    here only when the h5 config says stateful=True."""
    bc = spark.sparkContext.broadcast(model_state(model))

    def _model():
        key = id(bc)
        m = _MODEL_CACHE.get(key)
        if m is None:
            m = _model_from_state(bc.value)
            _MODEL_CACHE[key] = m
        return m

    trans = str.maketrans(charmap) if charmap else None

    def correct_docs(doc_lines: list[list[str]]):
        m = _model()
        if trans is not None:
            # same single-pass translation as the greedy/beam corrector
            # (transcode.py:249-260); like the reference — which mutates
            # the input annotation in place — alignment paths are
            # relative to the TRANSLATED text
            doc_lines = [
                [(t or "").translate(trans) for t in lines_]
                for lines_ in doc_lines
            ]
        outs, probs, aligns = m.decode_greedy_docs(doc_lines)
        paths = [
            [
                viterbi_path(al[:, : len(t)] if al.size else al)
                for t, al in zip(lines_, als)
            ]
            for lines_, als in zip(doc_lines, aligns)
        ]
        return outs, probs, paths

    return correct_docs
