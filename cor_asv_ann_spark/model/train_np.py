"""Training loop (M7): from-scratch numpy backprop for the seq2seq
fixture graph + a Spark data-parallel epoch loop.

The reference trains with Keras fit over generator batches
(/root/reference/ocrd_cor_asv_ann/lib/seq2seq.py:490-554,
lib/keras_train.py:27-120): teacher forcing, padded-sample masking,
early stopping on validation loss. This module re-derives the training
half by hand for the numpy graph in ``seq2seq_np.Seq2SeqModel`` (depth-1:
tied embedding, half-width BiLSTM encoder, additive-attention LSTM
decoder, [h;ctx] projection to the transposed embedding):

* :func:`forward_backward` — one teacher-forced pass with
  cross-entropy loss and full BPTT gradients for every parameter
  (verified against central finite differences in
  tests/test_train_np.py);
* :func:`sgd_adam` — driver-side Adam;
* :func:`train_local` — full-batch loop (fixture-scale);
* :func:`train_distributed` — synchronous data-parallel SGD the
  Spark way: weights broadcast per epoch, per-partition gradient sums
  via ``mapPartitions`` over Arrow-sized row chunks, one
  ``treeAggregate`` reduction per epoch (gradients are dense small
  tensors — the classic broadcast/tree-reduce parameter loop; this is
  the one justified RDD use in the engine).

Training ignores the local attention window (a hard non-differentiable
mask; the reference applies it in training too, where it acts as a
constant gate — at fixture scale full attention trains faster and
decodes identically through the windowed inference path).
"""

from __future__ import annotations

import numpy as np

from .seq2seq_np import EOS, Seq2SeqModel

PARAM_KEYS = (
    "embed",
    "att_We",
    "att_Wd",
    "att_v",
    "out_W",
    "out_b",
    "enc_fwd_W", "enc_fwd_U", "enc_fwd_b",
    "enc_bwd_W", "enc_bwd_U", "enc_bwd_b",
    "dec0_W", "dec0_U", "dec0_b",
)


def get_params(model: Seq2SeqModel) -> dict[str, np.ndarray]:
    assert model.depth == 1, "training implemented for depth-1 graphs"
    return {
        "embed": model.embed,
        "att_We": model.att_We,
        "att_Wd": model.att_Wd,
        "att_v": model.att_v,
        "out_W": model.out_W,
        "out_b": model.out_b,
        "enc_fwd_W": model.enc_fwd.W, "enc_fwd_U": model.enc_fwd.U, "enc_fwd_b": model.enc_fwd.b,
        "enc_bwd_W": model.enc_bwd.W, "enc_bwd_U": model.enc_bwd.U, "enc_bwd_b": model.enc_bwd.b,
        "dec0_W": model.dec_stack[0].W, "dec0_U": model.dec_stack[0].U, "dec0_b": model.dec_stack[0].b,
    }


def set_params(model: Seq2SeqModel, params: dict[str, np.ndarray]) -> None:
    model.embed = params["embed"]
    model.att_We, model.att_Wd, model.att_v = params["att_We"], params["att_Wd"], params["att_v"]
    model.out_W, model.out_b = params["out_W"], params["out_b"]
    model.enc_fwd.W, model.enc_fwd.U, model.enc_fwd.b = (
        params["enc_fwd_W"], params["enc_fwd_U"], params["enc_fwd_b"])
    model.enc_bwd.W, model.enc_bwd.U, model.enc_bwd.b = (
        params["enc_bwd_W"], params["enc_bwd_U"], params["enc_bwd_b"])
    model.dec_stack[0].W, model.dec_stack[0].U, model.dec_stack[0].b = (
        params["dec0_W"], params["dec0_U"], params["dec0_b"])


def vectorize_pairs(model: Seq2SeqModel, sources: list[str], targets: list[str]):
    """Teacher-forcing tensors (seq2seq.py vectorize_lines semantics):
    encoder one-hot X; decoder input = zero start row + target one-hots;
    decoder output = target one-hots; weight mask 0 on padding."""
    X, src_lens = model.encode_onehot(sources)
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


def forward_backward(params: dict, X, src_mask, Yin, Ytgt, Wm):
    """One teacher-forced pass → (mean loss, gradients dict). All math
    in the dtype of ``params`` (float64 for gradient checks)."""
    E = params["embed"]
    We, Wd, v = params["att_We"], params["att_Wd"], params["att_v"]
    oW, ob = params["out_W"], params["out_b"]
    dt = E.dtype
    B, Ts, V = X.shape
    Tt = Yin.shape[1]
    W = Wd.shape[0]
    half = params["enc_fwd_U"].shape[0]

    Esrc = X.astype(dt) @ E
    fwd_hs, _, _, fwd_cache = _lstm_forward(
        Esrc, params["enc_fwd_W"], params["enc_fwd_U"], params["enc_fwd_b"])
    bwd_hs, _, _, bwd_cache = _lstm_forward(
        Esrc, params["enc_bwd_W"], params["enc_bwd_U"], params["enc_bwd_b"], reverse=True)
    enc = np.concatenate([fwd_hs, bwd_hs], axis=-1)  # (B,Ts,W)
    enc_proj = enc @ We

    # decoder pass with caches
    h = np.zeros((B, W), dtype=dt)
    c = np.zeros((B, W), dtype=dt)
    dW_keys = {k: np.zeros_like(p) for k, p in params.items()}
    dec_cache = []
    n_valid = max(float(Wm.sum()), 1.0)
    loss = 0.0
    NEG = -1e9
    for t in range(Tt):
        feed = Yin[:, t, :].astype(dt)
        x = feed @ E
        z = x @ params["dec0_W"] + h @ params["dec0_U"] + params["dec0_b"]
        i = 1.0 / (1.0 + np.exp(-np.clip(z[:, :W], -30, 30)))
        f = 1.0 / (1.0 + np.exp(-np.clip(z[:, W:2 * W] + 1.0, -30, 30)))
        g = np.tanh(z[:, 2 * W:3 * W])
        o = 1.0 / (1.0 + np.exp(-np.clip(z[:, 3 * W:], -30, 30)))
        c_new = f * c + i * g
        h_new = o * np.tanh(c_new)
        q = h_new @ Wd
        s = np.tanh(enc_proj + q[:, None, :])  # (B,Ts,W)
        e = s @ v
        e = np.where(src_mask, e, NEG)
        e = e - e.max(axis=1, keepdims=True)
        ex = np.exp(e)
        a = ex / ex.sum(axis=1, keepdims=True)
        ctx = (a[:, :, None] * enc).sum(axis=1)
        hc = np.concatenate([h_new, ctx], axis=1)
        zz = np.tanh(hc @ oW)
        logits = zz @ E.T + ob
        logits = logits - logits.max(axis=1, keepdims=True)
        pe = np.exp(logits)
        p = pe / pe.sum(axis=1, keepdims=True)
        ytgt = Ytgt[:, t, :].astype(dt)
        m = Wm[:, t].astype(dt)
        eps = 1e-12
        loss += float(-(np.log((p * ytgt).sum(axis=1) + eps) * m).sum())
        dec_cache.append((feed, x, h, c, i, f, g, o, c_new, h_new, q, s, a, ctx, hc, zz, p, ytgt, m))
        h, c = h_new, c_new
    loss /= n_valid

    # ---- backward -----------------------------------------------------------
    denc = np.zeros_like(enc)
    denc_proj = np.zeros_like(enc_proj)
    dec_dhs = np.zeros((B, Tt, W), dtype=dt)  # per-step grads into h_new
    dh_next = np.zeros((B, W), dtype=dt)
    dc_next = np.zeros((B, W), dtype=dt)
    dec_lstm_cache = []
    for t, tup in enumerate(dec_cache):
        (feed, x, h_prev, c_prev, i, f, g, o, c_new, h_new, q, s, a, ctx, hc, zz, p, ytgt, m) = tup
        dec_lstm_cache.append((t, x, h_prev, c_prev, i, f, g, o, c_new))
    for t in range(Tt - 1, -1, -1):
        (feed, x, h_prev, c_prev, i, f, g, o, c_new, h_new, q, s, a, ctx, hc, zz, p, ytgt, m) = dec_cache[t]
        dlogits = (p - ytgt) * (m / n_valid)[:, None]
        dW_keys["out_b"] += dlogits.sum(axis=0)
        dW_keys["embed"] += dlogits.T @ zz
        dzz = dlogits @ E
        dhc_pre = dzz * (1.0 - zz * zz)
        dW_keys["out_W"] += hc.T @ dhc_pre
        dhc = dhc_pre @ oW.T
        dh_new = dhc[:, :W].copy()
        dctx = dhc[:, W:]
        da = np.einsum("bw,btw->bt", dctx, enc)
        denc += a[:, :, None] * dctx[:, None, :]
        de = a * (da - (da * a).sum(axis=1, keepdims=True))
        de = np.where(src_mask, de, 0.0)
        ds = de[:, :, None] * v[None, None, :]
        dW_keys["att_v"] += np.einsum("btw,bt->w", s, de)
        dpre = ds * (1.0 - s * s)
        denc_proj += dpre
        dq = dpre.sum(axis=1)
        dh_new += dq @ Wd.T
        dW_keys["att_Wd"] += h_new.T @ dq
        dec_dhs[:, t, :] = dh_new
    dX_dec, dWd_, dUd_, dbd_ = _lstm_backward(
        dec_lstm_cache, dec_dhs, dh_next, dc_next, params["dec0_W"], params["dec0_U"])
    dW_keys["dec0_W"] += dWd_
    dW_keys["dec0_U"] += dUd_
    dW_keys["dec0_b"] += dbd_
    for t in range(Tt):
        dW_keys["embed"] += Yin[:, t, :].astype(dt).T @ dX_dec[:, t, :]

    # encoder side: enc_proj and ctx contributions
    dW_keys["att_We"] += np.einsum("btw,btv->wv", enc, denc_proj)
    denc += denc_proj @ We.T
    dfwd = denc[:, :, :half]
    dbwd = denc[:, :, half:]
    zero_h = np.zeros((B, half), dtype=dt)
    dX_f, dWf, dUf, dbf = _lstm_backward(
        fwd_cache, dfwd, zero_h, zero_h, params["enc_fwd_W"], params["enc_fwd_U"])
    dX_b, dWb, dUb, dbb = _lstm_backward(
        bwd_cache, dbwd, np.zeros((B, W - half), dtype=dt), np.zeros((B, W - half), dtype=dt),
        params["enc_bwd_W"], params["enc_bwd_U"])
    dW_keys["enc_fwd_W"] += dWf; dW_keys["enc_fwd_U"] += dUf; dW_keys["enc_fwd_b"] += dbf
    dW_keys["enc_bwd_W"] += dWb; dW_keys["enc_bwd_U"] += dUb; dW_keys["enc_bwd_b"] += dbb
    dEsrc = dX_f + dX_b
    dW_keys["embed"] += np.einsum("btv,btw->vw", X.astype(dt), dEsrc)
    return loss, dW_keys


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


def train_local(
    model: Seq2SeqModel,
    pairs: list[tuple[str, str]],
    epochs: int = 30,
    lr: float = 2e-3,
) -> list[float]:
    """Full-batch Adam on (source, target) line pairs (EOS appended if
    missing). Returns the per-epoch loss curve."""
    sources = [s if s.endswith(EOS) else s + EOS for s, _ in pairs]
    targets = [t if t.endswith(EOS) else t + EOS for _, t in pairs]
    params = get_params(model)
    tensors = vectorize_pairs(model, sources, targets)
    opt = Adam(params, lr=lr)
    losses = []
    for _ in range(epochs):
        loss, grads = forward_backward(params, *tensors)
        params = opt.step(params, grads)
        losses.append(loss)
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
) -> list[float]:
    """Synchronous data-parallel SGD: per epoch, broadcast the weights,
    compute per-partition (gradient sums, loss sum, count) over row
    chunks, treeAggregate to the driver, Adam-update, re-broadcast.
    ``pairs_df``: DataFrame(source, target).

    ``length_bucket`` range-partitions and sorts the pairs by source
    length so every chunk is near-uniform — the reference's batching
    discipline: minimal padding waste, and (because the backward
    encoder half runs THROUGH padding) minimal padding-graph variance
    across chunkings."""
    from pyspark.sql import functions as F

    meta = {"vocab": model.vocab, "width": model.width, "depth": model.depth,
            "window": model.window}
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
    for _ in range(epochs):
        bc = sc.broadcast(params)

        def part_grads(rows):
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
                n_valid = max(float(tensors[4].sum()), 1.0)
                loss, grads = forward_backward(p, *tensors)
                # convert mean-grads back to sums for correct global mean
                if acc is None:
                    acc = {k: g * n_valid for k, g in grads.items()}
                else:
                    for k in acc:
                        acc[k] += grads[k] * n_valid
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
            if acc is None:
                return iter([])
            return iter([(acc, loss_sum, n)])

        def comb(a, b):
            if a is None:
                return b
            if b is None:
                return a
            for k in a[0]:
                a[0][k] += b[0][k]
            return (a[0], a[1] + b[1], a[2] + b[2])

        agg = rdd.mapPartitions(part_grads).treeAggregate(None, lambda z, x: comb(z, x), comb)
        bc.unpersist()
        if agg is None:
            break
        grads_sum, loss_sum, n = agg
        grads = {k: g / n for k, g in grads_sum.items()}
        params = opt.step(params, grads)
        losses.append(loss_sum / n)
    rdd.unpersist()
    set_params(model, params)
    return losses
