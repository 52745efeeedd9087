"""Training loop (M7): from-scratch numpy backprop for the seq2seq
graph at ANY depth + a Spark data-parallel epoch loop with the
reference's training-loop semantics.

The reference trains with Keras fit over generator batches
(/root/reference/ocrd_cor_asv_ann/lib/seq2seq.py:490-554,590-649,
846-917, lib/keras_train.py:27-120): teacher forcing, padded-sample
masking, early stopping on validation loss (patience 3, best weights
restored, NaN guard), "empirical" scheduled sampling (greedy decoder
feedback substituted as *data* — no gradient through the sample,
seq2seq.py:866 comment), and encoder degradation (a random position of
~1% of lines zeroed to the underspecified index, seq2seq.py:909-915).
This module re-derives the training half by hand for the numpy graph in
``seq2seq_np.Seq2SeqModel`` — depth-general: tied embedding, half-width
BiLSTM + (depth-1) stacked-LSTM encoder, depth-stacked LSTM decoder
with additive attention on the top layer, [h;ctx] projection to the
transposed embedding (the reference's published models are depth 2):

* :func:`forward_backward` — one teacher-forced pass with
  cross-entropy loss and full BPTT gradients for every parameter
  (verified against central finite differences at depth 1 AND 2 in
  tests/test_train_np.py);
* :func:`forward_loss` — forward-only (validation);
* :func:`sample_ratio` / :func:`greedy_decoder_inputs` — scheduled
  sampling schedule + teacher-less rollout (both reference formulas);
* :func:`train_local` — full-batch loop (fixture-scale);
* :func:`train_distributed` — synchronous data-parallel SGD the
  Spark way: weights broadcast per epoch, per-partition gradient sums
  via ``mapPartitions`` over Arrow-sized row chunks, one
  ``treeAggregate`` reduction per epoch (gradients are dense small
  tensors — the classic broadcast/tree-reduce parameter loop; this is
  the one justified RDD use in the engine). Per-line randomness
  (scheduled-sampling draw, degradation position) is derived from
  ``hash(source, epoch)`` so it is deterministic and
  partitioning-independent — local and distributed walk the same curve.

Training ignores the local attention window (a hard non-differentiable
mask; the reference applies it in training too, where it acts as a
constant gate — at fixture scale full attention trains faster and
decodes identically through the windowed inference path).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

from .seq2seq_np import EOS, Seq2SeqModel


def get_params(model: Seq2SeqModel) -> dict[str, np.ndarray]:
    """Every trainable tensor, named as in ``weights_dict`` (depth-
    general: enc_fwd/enc_bwd + enc{i} stack + dec{i} stack)."""
    return dict(model.weights_dict())


def set_params(model: Seq2SeqModel, params: dict[str, np.ndarray]) -> None:
    model.embed = params["embed"]
    model.att_We, model.att_Wd, model.att_v = params["att_We"], params["att_Wd"], params["att_v"]
    model.out_W, model.out_b = params["out_W"], params["out_b"]
    for name, layer in [("enc_fwd", model.enc_fwd), ("enc_bwd", model.enc_bwd)] + [
        (f"enc{i}", l) for i, l in enumerate(model.enc_stack)
    ] + [(f"dec{i}", l) for i, l in enumerate(model.dec_stack)]:
        layer.W, layer.U, layer.b = params[f"{name}_W"], params[f"{name}_U"], params[f"{name}_b"]


def _stack_counts(params: dict) -> tuple[int, int]:
    """(number of extra encoder layers, number of decoder layers)."""
    n_enc = 0
    while f"enc{n_enc}_W" in params:
        n_enc += 1
    n_dec = 0
    while f"dec{n_dec}_W" in params:
        n_dec += 1
    return n_enc, n_dec


def vectorize_targets(model: Seq2SeqModel, targets: list[str]):
    """Decoder-side tensors only: input = zero start row + shifted
    target one-hots; output = target one-hots; mask 0 on padding."""
    V = model.voc_size
    tl = np.array([len(t) for t in targets], dtype=np.int64)
    Tt = int(tl.max()) if len(tl) else 0
    Yin = np.zeros((len(targets), Tt, V), dtype=np.float32)
    Ytgt = np.zeros((len(targets), Tt, V), dtype=np.float32)
    Wm = np.zeros((len(targets), Tt), dtype=np.float32)
    for b, t in enumerate(targets):
        for j, ch in enumerate(t):
            idx = model.vocab.get(ch, 0)
            Ytgt[b, j, idx] = 1.0
            if j + 1 < Tt:
                Yin[b, j + 1, idx] = 1.0  # shifted: position 0 = start symbol
            Wm[b, j] = 1.0
    return Yin, Ytgt, Wm


def vectorize_pairs(model: Seq2SeqModel, sources: list[str], targets: list[str]):
    """Teacher-forcing tensors (seq2seq.py vectorize_lines semantics):
    encoder one-hot X; decoder input = zero start row + target one-hots;
    decoder output = target one-hots; weight mask 0 on padding."""
    X, src_lens = model.encode_onehot(sources)
    Yin, Ytgt, Wm = vectorize_targets(model, targets)
    src_mask = np.arange(X.shape[1])[None, :] < src_lens[:, None] if X.shape[1] else np.zeros((len(sources), 0), bool)
    return X, src_mask, Yin, Ytgt, Wm


def _lstm_forward(X, W, U, b, reverse=False, forget_plus=1.0):
    B, T, _ = X.shape
    H = U.shape[0]
    h = np.zeros((B, H), dtype=X.dtype)
    c = np.zeros((B, H), dtype=X.dtype)
    cache = []
    hs = np.zeros((B, T, H), dtype=X.dtype)
    steps = range(T - 1, -1, -1) if reverse else range(T)
    for t in steps:
        x = X[:, t, :]
        z = x @ W + h @ U + b
        i = 1.0 / (1.0 + np.exp(-np.clip(z[:, :H], -30, 30)))
        f = 1.0 / (1.0 + np.exp(-np.clip(z[:, H:2 * H] + forget_plus, -30, 30)))
        g = np.tanh(z[:, 2 * H:3 * H])
        o = 1.0 / (1.0 + np.exp(-np.clip(z[:, 3 * H:], -30, 30)))
        c_new = f * c + i * g
        h_new = o * np.tanh(c_new)
        cache.append((t, x, h, c, i, f, g, o, c_new))
        h, c = h_new, c_new
        hs[:, t, :] = h
    return hs, h, c, cache


def _lstm_backward(cache, dhs, dh_last, dc_last, W, U):
    """dhs: (B,T,H) per-step output grads; dh_last/dc_last: grads into
    the final state. Returns (dX, dW, dU, db)."""
    H = U.shape[0]
    dW = np.zeros_like(W)
    dU = np.zeros_like(U)
    db = np.zeros(4 * H, dtype=W.dtype)
    B, T, _ = dhs.shape
    dX = np.zeros((B, T, W.shape[0]), dtype=W.dtype)
    dh = dh_last.copy()
    dc = dc_last.copy()
    for (t, x, h_prev, c_prev, i, f, g, o, c_new) in reversed(cache):
        dh = dh + dhs[:, t, :]
        tc = np.tanh(c_new)
        do = dh * tc
        dc = dc + dh * o * (1.0 - tc * tc)
        di = dc * g
        df = dc * c_prev
        dg = dc * i
        dc_prev = dc * f
        dzi = di * i * (1.0 - i)
        dzf = df * f * (1.0 - f)
        dzg = dg * (1.0 - g * g)
        dzo = do * o * (1.0 - o)
        dz = np.concatenate([dzi, dzf, dzg, dzo], axis=1)
        dW += x.T @ dz
        dU += h_prev.T @ dz
        db += dz.sum(axis=0)
        dX[:, t, :] = dz @ W.T
        dh = dz @ U.T
        dc = dc_prev
    return dX, dW, dU, db


def _att_chunk(B: int, Ts: int, W: int, budget: float = 4e7) -> int:
    """Time-chunk size that keeps the (B,ct,Ts,W) attention tanh
    intermediate under ~budget elements (~320 MB float64): the one
    tensor that would otherwise scale as B·Tt·Ts·W and blow executor
    memory at reference width 512 on long lines."""
    return max(1, int(budget / max(B * Ts * W, 1)))


def _forward(params: dict, X, src_mask, Yin, Ytgt, Wm, need_cache: bool,
             lm_weight: float = 0.0):
    """Shared teacher-forced forward pass.

    The whole decoder stack runs as full-sequence LSTMs (teacher
    forcing makes every step's input known up front — bit-identical to
    the inference step loop), and attention is computed for all output
    steps at once; this is what makes the graph depth-general without a
    depth-special-cased step loop.

    ``lm_weight`` > 0 adds the reference's auxiliary LM loss
    (seq2seq.py:321-387 lm_loss: the same decoder weights run as a
    plain language model — no encoder conditioning — and a second
    cross-entropy on the same targets regularizes the decoder to stay
    a good LM). In this graph the decoder LSTM stack never sees the
    encoder (zero initial state, encoder enters via attention only),
    so the LM branch shares Htop verbatim and only the output stage
    differs: context zeroed before the [h;ctx] projection. Total loss
    = s2s + lm_weight · lm (the reference's equal-weight combined
    loss)."""
    E = params["embed"]
    We, Wd, v = params["att_We"], params["att_Wd"], params["att_v"]
    oW, ob = params["out_W"], params["out_b"]
    dt = E.dtype
    n_enc, n_dec = _stack_counts(params)
    NEG = -1e9

    Esrc = X.astype(dt) @ E
    fwd_hs, _, _, fwd_cache = _lstm_forward(
        Esrc, params["enc_fwd_W"], params["enc_fwd_U"], params["enc_fwd_b"])
    bwd_hs, _, _, bwd_cache = _lstm_forward(
        Esrc, params["enc_bwd_W"], params["enc_bwd_U"], params["enc_bwd_b"], reverse=True)
    H = np.concatenate([fwd_hs, bwd_hs], axis=-1)  # (B,Ts,W)
    enc_caches = []
    for i in range(n_enc):
        H, _, _, cache = _lstm_forward(
            H, params[f"enc{i}_W"], params[f"enc{i}_U"], params[f"enc{i}_b"])
        enc_caches.append(cache)
    enc_top = H
    enc_proj = enc_top @ We

    Hd = Yin.astype(dt) @ E
    dec_caches = []
    for d in range(n_dec):
        Hd, _, _, cache = _lstm_forward(
            Hd, params[f"dec{d}_W"], params[f"dec{d}_U"], params[f"dec{d}_b"])
        dec_caches.append(cache)
    Htop = Hd  # (B,Tt,W)

    q = Htop @ Wd  # (B,Tt,W)
    # attention energies computed in time chunks: the (B,ct,Ts,W) tanh
    # intermediate is the one tensor that would not fit executor memory
    # at reference width (512) on long lines — only a (B,Tt,Ts) survives
    B_, Tt_, _ = q.shape
    Ts_ = enc_proj.shape[1]
    e = np.empty((B_, Tt_, Ts_), dtype=dt)
    for lo in range(0, Tt_, _att_chunk(B_, Ts_, q.shape[2])):
        hi = min(lo + _att_chunk(B_, Ts_, q.shape[2]), Tt_)
        e[:, lo:hi] = np.tanh(enc_proj[:, None, :, :] + q[:, lo:hi, None, :]) @ v
    e = np.where(src_mask[:, None, :], e, NEG)
    e = e - e.max(axis=2, keepdims=True)
    ex = np.exp(e)
    a = ex / ex.sum(axis=2, keepdims=True)
    ctx = np.einsum("bts,bsw->btw", a, enc_top)
    hc = np.concatenate([Htop, ctx], axis=-1)  # (B,Tt,2W)
    zz = np.tanh(hc @ oW)
    logits = zz @ E.T + ob
    logits = logits - logits.max(axis=2, keepdims=True)
    pe = np.exp(logits)
    p = pe / pe.sum(axis=2, keepdims=True)
    Wt = Wm.astype(dt)
    n_valid = max(float(Wt.sum()), 1.0)
    eps = 1e-12
    loss = float(-(np.log((p * Ytgt.astype(dt)).sum(axis=2) + eps) * Wt).sum()) / n_valid
    zz_lm = p_lm = None
    if lm_weight:
        # LM branch: same Htop, zero context into the output projection
        zz_lm = np.tanh(Htop @ oW[: Htop.shape[2]])
        logits_lm = zz_lm @ E.T + ob
        logits_lm = logits_lm - logits_lm.max(axis=2, keepdims=True)
        pe_lm = np.exp(logits_lm)
        p_lm = pe_lm / pe_lm.sum(axis=2, keepdims=True)
        loss_lm = float(
            -(np.log((p_lm * Ytgt.astype(dt)).sum(axis=2) + eps) * Wt).sum()
        ) / n_valid
        loss = loss + lm_weight * loss_lm
    if not need_cache:
        return loss, None
    cache = dict(
        fwd_cache=fwd_cache, bwd_cache=bwd_cache, enc_caches=enc_caches,
        dec_caches=dec_caches, enc_top=enc_top, enc_proj=enc_proj, Htop=Htop,
        q=q, a=a, ctx=ctx, hc=hc, zz=zz, p=p, n_valid=n_valid,
        n_enc=n_enc, n_dec=n_dec, zz_lm=zz_lm, p_lm=p_lm,
    )
    return loss, cache


def forward_loss(params: dict, X, src_mask, Yin, Ytgt, Wm,
                 lm_weight: float = 0.0) -> float:
    """Validation loss: the forward half only."""
    loss, _ = _forward(params, X, src_mask, Yin, Ytgt, Wm, need_cache=False,
                       lm_weight=lm_weight)
    return loss


def forward_backward(params: dict, X, src_mask, Yin, Ytgt, Wm,
                     lm_weight: float = 0.0):
    """One teacher-forced pass → (mean loss, gradients dict). All math
    in the dtype of ``params`` (float64 for gradient checks). Works for
    any encoder/decoder stack depth present in ``params``."""
    E = params["embed"]
    We, Wd, v = params["att_We"], params["att_Wd"], params["att_v"]
    oW = params["out_W"]
    dt = E.dtype
    W = Wd.shape[0]
    half = params["enc_fwd_U"].shape[0]
    B = X.shape[0]

    loss, cc = _forward(params, X, src_mask, Yin, Ytgt, Wm, need_cache=True,
                        lm_weight=lm_weight)
    enc_top, enc_proj, Htop, q, a, ctx, hc, zz, p = (
        cc["enc_top"], cc["enc_proj"], cc["Htop"], cc["q"], cc["a"], cc["ctx"],
        cc["hc"], cc["zz"], cc["p"])
    n_valid, n_enc, n_dec = cc["n_valid"], cc["n_enc"], cc["n_dec"]

    grads = {k: np.zeros_like(pv) for k, pv in params.items()}

    dlogits = (p - Ytgt.astype(dt)) * (Wm.astype(dt) / n_valid)[:, :, None]  # (B,Tt,V)
    grads["out_b"] += dlogits.sum(axis=(0, 1))
    grads["embed"] += np.einsum("btv,btw->vw", dlogits, zz)
    dzz = np.einsum("btv,vw->btw", dlogits, E)
    dhc_pre = dzz * (1.0 - zz * zz)
    grads["out_W"] += np.einsum("btk,btw->kw", hc, dhc_pre)
    dhc = dhc_pre @ oW.T
    dHtop = dhc[:, :, :W].copy()
    dctx = dhc[:, :, W:]

    if lm_weight:
        # LM-branch backward: same output stage with ctx = 0, scaled
        # by lm_weight; the zero context half contributes no out_W grad
        zz_lm, p_lm = cc["zz_lm"], cc["p_lm"]
        dlogits_lm = (
            lm_weight * (p_lm - Ytgt.astype(dt)) * (Wm.astype(dt) / n_valid)[:, :, None]
        )
        grads["out_b"] += dlogits_lm.sum(axis=(0, 1))
        grads["embed"] += np.einsum("btv,btw->vw", dlogits_lm, zz_lm)
        dzz_lm = np.einsum("btv,vw->btw", dlogits_lm, E)
        dhc_pre_lm = dzz_lm * (1.0 - zz_lm * zz_lm)
        grads["out_W"][:W] += np.einsum("btk,btw->kw", Htop, dhc_pre_lm)
        dHtop += dhc_pre_lm @ oW[:W].T

    da = np.einsum("btw,bsw->bts", dctx, enc_top)
    denc_top = np.einsum("bts,btw->bsw", a, dctx)
    de = a * (da - (da * a).sum(axis=2, keepdims=True))
    de = np.where(src_mask[:, None, :], de, 0.0)
    # recompute the tanh intermediate per time chunk (forward stored
    # only the (B,Tt,Ts) attention weights — see _forward)
    B_, Tt_, Ts_ = de.shape
    denc_proj = np.zeros_like(enc_proj)  # (B,Ts,W)
    dq = np.empty_like(q)  # (B,Tt,W)
    step = _att_chunk(B_, Ts_, W)
    for lo in range(0, Tt_, step):
        hi = min(lo + step, Tt_)
        s_ch = np.tanh(enc_proj[:, None, :, :] + q[:, lo:hi, None, :])
        grads["att_v"] += np.einsum("btsw,bts->w", s_ch, de[:, lo:hi])
        dpre = de[:, lo:hi, :, None] * v[None, None, None, :] * (1.0 - s_ch * s_ch)
        denc_proj += dpre.sum(axis=1)
        dq[:, lo:hi] = dpre.sum(axis=2)
    dHtop += dq @ Wd.T
    grads["att_Wd"] += np.einsum("btw,btx->wx", Htop, dq)
    grads["att_We"] += np.einsum("bsw,bsx->wx", enc_top, denc_proj)
    denc_top += denc_proj @ We.T

    # decoder stack backward (top → bottom)
    zero_w = np.zeros((B, W), dtype=dt)
    dH = dHtop
    for d in range(n_dec - 1, -1, -1):
        dH, dWd_, dUd_, dbd_ = _lstm_backward(
            cc["dec_caches"][d], dH, zero_w, zero_w,
            params[f"dec{d}_W"], params[f"dec{d}_U"])
        grads[f"dec{d}_W"] += dWd_
        grads[f"dec{d}_U"] += dUd_
        grads[f"dec{d}_b"] += dbd_
    grads["embed"] += np.einsum("btv,btw->vw", Yin.astype(dt), dH)

    # encoder stack backward
    dHe = denc_top
    for i in range(n_enc - 1, -1, -1):
        dHe, dWe_, dUe_, dbe_ = _lstm_backward(
            cc["enc_caches"][i], dHe, zero_w, zero_w,
            params[f"enc{i}_W"], params[f"enc{i}_U"])
        grads[f"enc{i}_W"] += dWe_
        grads[f"enc{i}_U"] += dUe_
        grads[f"enc{i}_b"] += dbe_
    dfwd = dHe[:, :, :half]
    dbwd = dHe[:, :, half:]
    zero_f = np.zeros((B, half), dtype=dt)
    zero_b = np.zeros((B, W - half), dtype=dt)
    dX_f, dWf, dUf, dbf = _lstm_backward(
        cc["fwd_cache"], dfwd, zero_f, zero_f, params["enc_fwd_W"], params["enc_fwd_U"])
    dX_b, dWb, dUb, dbb = _lstm_backward(
        cc["bwd_cache"], dbwd, zero_b, zero_b, params["enc_bwd_W"], params["enc_bwd_U"])
    grads["enc_fwd_W"] += dWf; grads["enc_fwd_U"] += dUf; grads["enc_fwd_b"] += dbf
    grads["enc_bwd_W"] += dWb; grads["enc_bwd_U"] += dUb; grads["enc_bwd_b"] += dbb
    grads["embed"] += np.einsum("btv,btw->vw", X.astype(dt), dX_f + dX_b)
    return loss, grads


# --- pure-LM training + shallow/LM weight transfer --------------------------
# (reference: transfer-dta-lm.py:1-42 copies a pretrained keraslm LM's
# lstm_N weights into decoder_lstm_N, trimming the context input rows;
# seq2seq.py:45-55,143-149 consumes them weight-tied. In this graph the
# decoder input is the tied embedding alone — no context columns to
# trim — so the transfer is a straight copy of embed + dec stack +
# output projection.)


def lm_forward_backward(params: dict, Yin, Ytgt, Wm, need_grads: bool = True):
    """Decoder-only LM pass (train a char LM with the decoder weights):
    dec stack on shifted targets → zero-context output projection →
    cross-entropy. Returns (mean loss, grads) touching only embed,
    dec{i}_*, out_W[:W], out_b — encoder/attention grads stay zero so
    the same Adam/treeAggregate loop drives both modes."""
    E = params["embed"]
    oW, ob = params["out_W"], params["out_b"]
    dt = E.dtype
    _, n_dec = _stack_counts(params)
    W = params["att_Wd"].shape[0]
    B = Yin.shape[0]

    Hd = Yin.astype(dt) @ E
    dec_caches = []
    for d in range(n_dec):
        Hd, _, _, cache = _lstm_forward(
            Hd, params[f"dec{d}_W"], params[f"dec{d}_U"], params[f"dec{d}_b"])
        dec_caches.append(cache)
    Htop = Hd
    zz = np.tanh(Htop @ oW[:W])
    logits = zz @ E.T + ob
    logits = logits - logits.max(axis=2, keepdims=True)
    pe = np.exp(logits)
    p = pe / pe.sum(axis=2, keepdims=True)
    Wt = Wm.astype(dt)
    n_valid = max(float(Wt.sum()), 1.0)
    loss = float(-(np.log((p * Ytgt.astype(dt)).sum(axis=2) + 1e-12) * Wt).sum()) / n_valid
    if not need_grads:
        return loss, None

    grads = {k: np.zeros_like(pv) for k, pv in params.items()}
    dlogits = (p - Ytgt.astype(dt)) * (Wt / n_valid)[:, :, None]
    grads["out_b"] += dlogits.sum(axis=(0, 1))
    grads["embed"] += np.einsum("btv,btw->vw", dlogits, zz)
    dzz = np.einsum("btv,vw->btw", dlogits, E)
    dpre = dzz * (1.0 - zz * zz)
    grads["out_W"][:W] += np.einsum("btk,btw->kw", Htop, dpre)
    dH = dpre @ oW[:W].T
    zero_w = np.zeros((B, W), dtype=dt)
    for d in range(n_dec - 1, -1, -1):
        dH, dWd_, dUd_, dbd_ = _lstm_backward(
            dec_caches[d], dH, zero_w, zero_w,
            params[f"dec{d}_W"], params[f"dec{d}_U"])
        grads[f"dec{d}_W"] += dWd_
        grads[f"dec{d}_U"] += dUd_
        grads[f"dec{d}_b"] += dbd_
    grads["embed"] += np.einsum("btv,btw->vw", Yin.astype(dt), dH)
    return loss, grads


LM_TRANSFER_KEYS = ("embed", "out_W", "out_b")


def init_from_lm(params: dict, lm_params: dict) -> dict:
    """Initialize a correction model's decoder from a pretrained LM
    (the transfer-dta-lm recipe): copies embed, the whole dec stack,
    and the output projection. Shapes must match (same vocab, width,
    decoder depth — the reference keeps the LM's mapping too).
    Returns the mutated ``params`` for chaining."""
    _, n_dec = _stack_counts(params)
    _, n_dec_lm = _stack_counts(lm_params)
    if n_dec != n_dec_lm:
        raise ValueError(f"decoder depth mismatch: {n_dec} vs LM {n_dec_lm}")
    keys = list(LM_TRANSFER_KEYS) + [
        f"dec{d}_{t}" for d in range(n_dec) for t in ("W", "U", "b")
    ]
    for k in keys:
        if params[k].shape != lm_params[k].shape:
            raise ValueError(
                f"{k}: shape {params[k].shape} vs LM {lm_params[k].shape} "
                "(vocab/width must match — the transfer keeps the LM's mapping)"
            )
        params[k] = lm_params[k].copy()
    return params


def train_lm_local(
    model: Seq2SeqModel,
    texts: list[str],
    epochs: int = 30,
    lr: float = 2e-3,
) -> list[float]:
    """Fixture-scale pure-LM pretraining (the in-repo stand-in for the
    reference's external keraslm pretraining): full-batch Adam on the
    decoder-only LM branch over clean text lines. The result plugs into
    :func:`init_from_lm` / run_train ``--init-from-lm``. Corpus-scale
    LM pretraining uses train_distributed(lm_only=True)."""
    tgts = [t if t.endswith(EOS) else t + EOS for t in texts]
    params = get_params(model)
    Yin, Ytgt, Wm = vectorize_targets(model, tgts)
    opt = Adam(params, lr=lr)
    losses = []
    for _ in range(epochs):
        loss, grads = lm_forward_backward(params, Yin, Ytgt, Wm)
        params = opt.step(params, grads)
        losses.append(loss)
        if math.isnan(loss):
            break
    set_params(model, params)
    return losses


# --- scheduled sampling + encoder degradation (reference gen_data) ----------


def sample_ratio(mode: str | None, completed_epochs: int, epochs: int) -> float:
    """Reference schedule (seq2seq.py:865-875, attenuation 3): the
    ratio applied during epoch k+1 after k completed epochs; 0 before
    the first epoch ends."""
    if not mode or completed_epochs < 1:
        return 0.0
    att = 3
    if mode == "linear":
        return att * (completed_epochs - 1) / max(epochs - 1, 1)
    if mode == "sigmoid":
        return 1.0 / (1.0 + math.exp(5 - 10 * att * completed_epochs / epochs))
    if mode == "exponential":
        return 1.0 - 0.9 ** (50 * att * completed_epochs / epochs)
    raise ValueError(f"unknown scheduled-sampling mode {mode!r}")


def _line_rand(source: str, epoch: int, salt: int) -> float:
    """Deterministic uniform [0,1) per (line, epoch, purpose) — makes
    scheduled-sampling draws and degradation positions identical under
    any partitioning/chunking (local == distributed by construction)."""
    h = hashlib.md5(f"{salt}:{epoch}:{source}".encode()).digest()
    return int.from_bytes(h[:8], "big") / 2.0**64


def greedy_decoder_inputs(params: dict, X, src_mask, eos_idx: int) -> np.ndarray:
    """Teacher-less greedy rollout → the decoder-INPUT feed sequence
    (zero start row, then softmax feedback), the analogue of the
    reference's decode_batch_greedy output used as
    ``decoder_input_data_sampled`` (seq2seq.py:896-903). Data only — no
    gradient flows through the rollout ("empirical scheduled sampling
    (i.e. without proper gradient)", seq2seq.py:866)."""
    E = params["embed"]
    We, Wd, v = params["att_We"], params["att_Wd"], params["att_v"]
    oW, ob = params["out_W"], params["out_b"]
    dt = E.dtype
    n_enc, n_dec = _stack_counts(params)
    B, Ts, V = X.shape
    W = Wd.shape[0]
    NEG = -1e9

    Esrc = X.astype(dt) @ E
    fwd_hs, _, _, _ = _lstm_forward(
        Esrc, params["enc_fwd_W"], params["enc_fwd_U"], params["enc_fwd_b"])
    bwd_hs, _, _, _ = _lstm_forward(
        Esrc, params["enc_bwd_W"], params["enc_bwd_U"], params["enc_bwd_b"], reverse=True)
    H = np.concatenate([fwd_hs, bwd_hs], axis=-1)
    for i in range(n_enc):
        H, _, _, _ = _lstm_forward(
            H, params[f"enc{i}_W"], params[f"enc{i}_U"], params[f"enc{i}_b"])
    enc_proj = H @ We

    def lstm_step(x, h, c, Wl, Ul, bl):
        Hh = Ul.shape[0]
        z = x @ Wl + h @ Ul + bl
        i = 1.0 / (1.0 + np.exp(-np.clip(z[:, :Hh], -30, 30)))
        f = 1.0 / (1.0 + np.exp(-np.clip(z[:, Hh:2 * Hh] + 1.0, -30, 30)))
        g = np.tanh(z[:, 2 * Hh:3 * Hh])
        o = 1.0 / (1.0 + np.exp(-np.clip(z[:, 3 * Hh:], -30, 30)))
        c2 = f * c + i * g
        return o * np.tanh(c2), c2

    hs = [np.zeros((B, W), dtype=dt) for _ in range(n_dec)]
    cs = [np.zeros((B, W), dtype=dt) for _ in range(n_dec)]
    feeds = [np.zeros((B, V), dtype=np.float32)]  # start symbol row
    feed = feeds[0].astype(dt)
    done = np.zeros(B, dtype=bool)
    max_steps = 2 * max(Ts, 1)
    for _ in range(max_steps - 1):
        x = feed @ E
        for d in range(n_dec):
            hs[d], cs[d] = lstm_step(
                x, hs[d], cs[d],
                params[f"dec{d}_W"], params[f"dec{d}_U"], params[f"dec{d}_b"])
            x = hs[d]
        q = x @ Wd
        e = np.tanh(enc_proj + q[:, None, :]) @ v
        e = np.where(src_mask, e, NEG)
        e = e - e.max(axis=1, keepdims=True)
        ex = np.exp(e)
        a = ex / ex.sum(axis=1, keepdims=True)
        ctx = (a[:, :, None] * H).sum(axis=1)
        zz = np.tanh(np.concatenate([x, ctx], axis=1) @ oW)
        logits = zz @ E.T + ob
        logits = logits - logits.max(axis=1, keepdims=True)
        pe = np.exp(logits)
        p = pe / pe.sum(axis=1, keepdims=True)
        p[:, 0] = 0.0
        feeds.append(p.astype(np.float32))
        nxt = p.argmax(axis=1)
        done |= nxt == eos_idx
        feed = p
        if done.all():
            break
    return np.stack(feeds, axis=1)  # (B, T', V)


def apply_scheduled_sampling(params, model_vocab, tensors, sources, epoch, ratio):
    """Replace scheduled lines' decoder inputs with the greedy rollout
    (reference gen_data:881-907: sampled inputs overwrite GT inputs;
    target/weight arrays are resized to the sampled shape)."""
    if ratio <= 0.0:
        return tensors
    X, src_mask, Yin, Ytgt, Wm = tensors
    sel = np.array(
        [_line_rand(s, epoch, 1) < ratio for s in sources], dtype=bool)
    if not sel.any():
        return tensors
    sampled = greedy_decoder_inputs(params, X, src_mask, model_vocab[EOS])
    Tn = sampled.shape[1]
    B, Tt, V = Yin.shape

    def resize(arr, T):
        if arr.ndim == 3:
            out = np.zeros((B, T, V), dtype=arr.dtype)
            out[:, : min(T, arr.shape[1])] = arr[:, : min(T, arr.shape[1])]
        else:
            out = np.zeros((B, T), dtype=arr.dtype)
            out[:, : min(T, arr.shape[1])] = arr[:, : min(T, arr.shape[1])]
        return out

    Yin2, Ytgt2, Wm2 = resize(Yin, Tn), resize(Ytgt, Tn), resize(Wm, Tn)
    Yin2[sel] = sampled[sel]
    return X, src_mask, Yin2, Ytgt2, Wm2


def apply_encoder_degradation(X, sources, epoch):
    """Reference gen_data:909-915: ~1% of lines get ONE random position
    overwritten with the underspecified one-hot (index 0) so the model
    learns character underspecification. In-place on a copy."""
    B, Ts, V = X.shape
    if Ts == 0:
        return X
    rand = np.array([_line_rand(s, epoch, 2) for s in sources])
    pos = (Ts * rand / 0.01).astype(np.int64)
    sel = pos < Ts
    if not sel.any():
        return X
    X = X.copy()
    rows = np.nonzero(sel)[0]
    X[rows, pos[sel], :] = 0.0
    X[rows, pos[sel], 0] = 1.0
    return X


class Adam:
    def __init__(self, params: dict, lr: float = 2e-3, b1=0.9, b2=0.999, eps=1e-8):
        self.lr, self.b1, self.b2, self.eps = lr, b1, b2, eps
        self.m = {k: np.zeros_like(p, dtype=np.float64) for k, p in params.items()}
        self.v = {k: np.zeros_like(p, dtype=np.float64) for k, p in params.items()}
        self.t = 0

    def step(self, params: dict, grads: dict) -> dict:
        self.t += 1
        out = {}
        for k, p in params.items():
            g = grads[k].astype(np.float64)
            self.m[k] = self.b1 * self.m[k] + (1 - self.b1) * g
            self.v[k] = self.b2 * self.v[k] + (1 - self.b2) * g * g
            mh = self.m[k] / (1 - self.b1 ** self.t)
            vh = self.v[k] / (1 - self.b2 ** self.t)
            out[k] = (p.astype(np.float64) - self.lr * mh / (np.sqrt(vh) + self.eps)).astype(p.dtype)
        return out


class EarlyStopper:
    """Keras EarlyStopping(monitor='val_loss', patience, mode='min',
    restore_best_weights=True) + TerminateOnNaN semantics as used by the
    reference train loop (seq2seq.py:619-646): NaN terminates AND the
    best weights are still recovered."""

    def __init__(self, patience: int = 3):
        self.patience = patience
        self.best = float("inf")
        self.best_params: dict | None = None
        self.bad = 0

    def update(self, val_loss: float, params: dict) -> bool:
        """Record this epoch; returns True when training should stop."""
        if math.isnan(val_loss):
            return True
        if val_loss < self.best:
            self.best = val_loss
            self.best_params = {k: p.copy() for k, p in params.items()}
            self.bad = 0
            return False
        self.bad += 1
        return self.bad >= self.patience

    def restore(self, params: dict) -> dict:
        return self.best_params if self.best_params is not None else params


def train_local(
    model: Seq2SeqModel,
    pairs: list[tuple[str, str]],
    epochs: int = 30,
    lr: float = 2e-3,
    val_pairs: list[tuple[str, str]] | None = None,
    patience: int = 3,
    scheduled_sampling: str | None = None,
    encoder_degradation: bool = False,
    lm_weight: float = 0.0,
) -> list[float]:
    """Full-batch Adam on (source, target) line pairs (EOS appended if
    missing). With ``val_pairs``, early-stops on validation loss
    (patience epochs without improvement, best weights restored — the
    reference's EarlyStopping configuration) and returns the per-epoch
    VALIDATION loss curve; otherwise returns the training curve."""
    sources = [s if s.endswith(EOS) else s + EOS for s, _ in pairs]
    targets = [t if t.endswith(EOS) else t + EOS for _, t in pairs]
    params = get_params(model)
    tensors = vectorize_pairs(model, sources, targets)
    val_tensors = None
    if val_pairs:
        vs = [s if s.endswith(EOS) else s + EOS for s, _ in val_pairs]
        vt = [t if t.endswith(EOS) else t + EOS for _, t in val_pairs]
        val_tensors = vectorize_pairs(model, vs, vt)
    opt = Adam(params, lr=lr)
    stopper = EarlyStopper(patience=patience) if val_tensors else None
    losses = []
    for e in range(1, epochs + 1):
        t = tensors
        ratio = sample_ratio(scheduled_sampling, e - 1, epochs)
        if ratio > 0.0:
            t = apply_scheduled_sampling(params, model.vocab, t, sources, e, ratio)
        if encoder_degradation:
            t = (apply_encoder_degradation(t[0], sources, e),) + tuple(t[1:])
        loss, grads = forward_backward(params, *t, lm_weight=lm_weight)
        params = opt.step(params, grads)
        if stopper is not None:
            vloss = forward_loss(params, *val_tensors)
            losses.append(vloss)
            if stopper.update(vloss, params):
                break
        else:
            losses.append(loss)
            if math.isnan(loss):
                break
    if stopper is not None:
        params = stopper.restore(params)
    set_params(model, params)
    return losses


def train_distributed(
    spark,
    pairs_df,
    model: Seq2SeqModel,
    epochs: int = 10,
    lr: float = 2e-3,
    chunk: int = 64,
    length_bucket: bool = True,
    val_df=None,
    patience: int = 3,
    scheduled_sampling: str | None = None,
    encoder_degradation: bool = False,
    lm_weight: float = 0.0,
    lm_only: bool = False,
) -> list[float]:
    """Synchronous data-parallel SGD: per epoch, broadcast the weights,
    compute per-partition (gradient sums, loss sum, count) over row
    chunks, treeAggregate to the driver, Adam-update, re-broadcast.
    ``pairs_df``: DataFrame(source, target).

    With ``val_df``, validation loss is computed distributed the same
    way (forward only) and drives reference-style early stopping
    (patience, best-weights restore, NaN guard); the returned curve is
    then the validation curve.

    ``length_bucket`` range-partitions and sorts the pairs by source
    length so every chunk is near-uniform — the reference's batching
    discipline: minimal padding waste, and (because the backward
    encoder half runs THROUGH padding) minimal padding-graph variance
    across chunkings."""
    from pyspark.sql import functions as F

    meta = {"vocab": model.vocab, "width": model.width, "depth": model.depth,
            "window": model.window}
    if lm_only:
        # gen_data transforms are encoder-side — meaningless for pure-LM
        scheduled_sampling = None
        encoder_degradation = False
    params = get_params(model)
    opt = Adam(params, lr=lr)
    losses = []
    sc = spark.sparkContext
    pairs_df = pairs_df.select("source", "target")
    if length_bucket:
        pairs_df = pairs_df.repartitionByRange(
            max(sc.defaultParallelism, 2), F.length("source")
        ).sortWithinPartitions(F.length("source"))
    rdd = pairs_df.rdd.cache()
    val_rdd = None
    if val_df is not None:
        val_rdd = val_df.select("source", "target").rdd.cache()
    stopper = EarlyStopper(patience=patience) if val_rdd is not None else None

    def run_epoch(bc, epoch: int, ratio: float, degrade: bool, backward: bool):
        """One pass over an RDD → (grad sums or None, loss sum, n)."""

        def part_fn(rows):
            m = Seq2SeqModel(meta["vocab"], width=meta["width"],
                             depth=meta["depth"], window=meta["window"])
            set_params(m, bc.value)
            p = bc.value
            acc = None
            loss_sum = 0.0
            n = 0
            buf_s, buf_t = [], []

            def flush():
                nonlocal acc, loss_sum, n
                if not buf_s:
                    return
                tensors = vectorize_pairs(m, list(buf_s), list(buf_t))
                if backward and ratio > 0.0:
                    tensors = apply_scheduled_sampling(
                        p, meta["vocab"], tensors, list(buf_s), epoch, ratio)
                if backward and degrade:
                    tensors = (apply_encoder_degradation(
                        tensors[0], list(buf_s), epoch),) + tuple(tensors[1:])
                n_valid = max(float(tensors[4].sum()), 1.0)
                if backward:
                    if lm_only:
                        loss, grads = lm_forward_backward(p, *tensors[2:])
                    else:
                        loss, grads = forward_backward(
                            p, *tensors, lm_weight=lm_weight)
                    # convert mean-grads back to sums for correct global mean
                    if acc is None:
                        acc = {k: g * n_valid for k, g in grads.items()}
                    else:
                        for k in acc:
                            acc[k] += grads[k] * n_valid
                elif lm_only:
                    loss, _ = lm_forward_backward(p, *tensors[2:], need_grads=False)
                else:
                    loss = forward_loss(p, *tensors, lm_weight=lm_weight)
                loss_sum += loss * n_valid
                n += n_valid
                buf_s.clear()
                buf_t.clear()

            for r in rows:
                s = r.source if r.source.endswith(EOS) else r.source + EOS
                t = r.target if r.target.endswith(EOS) else r.target + EOS
                buf_s.append(s)
                buf_t.append(t)
                if len(buf_s) >= chunk:
                    flush()
            flush()
            if n == 0:
                return iter([])
            return iter([(acc, loss_sum, n)])

        def comb(a, b):
            if a is None:
                return b
            if b is None:
                return a
            if a[0] is not None and b[0] is not None:
                for k in a[0]:
                    a[0][k] += b[0][k]
            return (a[0] if a[0] is not None else b[0], a[1] + b[1], a[2] + b[2])

        src = rdd if backward else val_rdd
        return src.mapPartitions(part_fn).treeAggregate(
            None, lambda z, x: comb(z, x), comb)

    for e in range(1, epochs + 1):
        bc = sc.broadcast(params)
        ratio = sample_ratio(scheduled_sampling, e - 1, epochs)
        agg = run_epoch(bc, e, ratio, encoder_degradation, backward=True)
        if agg is None:
            bc.unpersist()
            break
        grads_sum, loss_sum, n = agg
        grads = {k: g / n for k, g in grads_sum.items()}
        params = opt.step(params, grads)
        if stopper is not None:
            bc.unpersist()
            bc = sc.broadcast(params)
            vagg = run_epoch(bc, e, 0.0, False, backward=False)
            bc.unpersist()
            vloss = vagg[1] / vagg[2] if vagg is not None else float("nan")
            losses.append(vloss)
            if stopper.update(vloss, params):
                break
        else:
            bc.unpersist()
            losses.append(loss_sum / n)
            if math.isnan(loss_sum / n):
                break
    if stopper is not None:
        params = stopper.restore(params)
    rdd.unpersist()
    if val_rdd is not None:
        val_rdd.unpersist()
    set_params(model, params)
    return losses
