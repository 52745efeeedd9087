"""HDF5 model import (S7 gap from round 1): pure-Python reader/writer
of the reference's Keras save format, the faithful reference-graph
numpy forward pass, and its end-to-end use in the Spark pipeline.

The fixture h5 replicates the exact file layout of
/root/reference/ocrd_cor_asv_ann/lib/seq2seq.py:1121-1141 (Keras 2.x
save_weights groups + config group with width/depth/flags/mapping)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cor_asv_ann_spark.model.hdf5 import read_h5, write_h5
from cor_asv_ann_spark.model.keras_graph import RefSeq2Seq, write_keras_fixture


# --------------------------------------------------------------------------
# hdf5 layer


def test_hdf5_roundtrip_dtypes_and_attrs(tmp_path):
    p = str(tmp_path / "t.h5")
    rng = np.random.default_rng(0)
    tree = {
        "g": {
            "f32": rng.standard_normal((7, 5)).astype(np.float32),
            "f64": rng.standard_normal(11),
            "i64_scalar": np.array(42),
            "u32": rng.integers(0, 9e4, 13).astype(np.uint32),
            "flag": np.array(True),
            "deep": {"nested": np.arange(6, dtype=np.int64).reshape(2, 3)},
        }
    }
    attrs = {
        "": {"layer_names": np.array([b"g"]), "backend": b"tensorflow"},
        "g": {"weight_names": np.array([b"deep/nested"])},
        "g/f32": {"note": b"per-dataset attr"},
    }
    write_h5(p, tree, attrs)
    f = read_h5(p)
    assert np.array_equal(f["g/f32"][()], tree["g"]["f32"])
    assert np.array_equal(f["g/f64"][()], tree["g"]["f64"])
    assert int(f["g/i64_scalar"][()]) == 42
    assert np.array_equal(f["g/u32"][()], tree["g"]["u32"])
    assert bool(f["g/flag"][()]) is True
    assert np.array_equal(f["g/deep/nested"][()], tree["g"]["deep"]["nested"])
    assert f.attrs["backend"] == b"tensorflow"
    assert f["g"].attrs["weight_names"][0] == b"deep/nested"
    assert f["g/f32"].attrs["note"] == b"per-dataset attr"
    assert "g" in f and "g/deep/nested" in f and "g/nope" not in f


def test_hdf5_property_roundtrip(tmp_path):
    """Property test: arbitrary nested trees of arrays survive the
    write→read roundtrip byte-exactly (shapes, dtypes, values, attrs)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    name = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz_0123456789:", min_size=1, max_size=12
    )
    arr = st.one_of(
        arrays(np.float32, st.tuples(st.integers(0, 5), st.integers(1, 4)),
               elements=st.floats(-1e3, 1e3, width=32)),
        arrays(np.int64, st.integers(0, 7),
               elements=st.integers(-(2**40), 2**40)),
        arrays(np.uint32, st.integers(1, 5), elements=st.integers(0, 2**31)),
    )
    tree_strategy = st.recursive(
        st.dictionaries(name, arr, min_size=1, max_size=3),
        lambda children: st.dictionaries(name, st.one_of(arr, children), min_size=1, max_size=3),
        max_leaves=6,
    )

    counter = [0]

    @settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    @given(tree=tree_strategy)
    def check(tree):
        counter[0] += 1
        p = str(tmp_path / f"prop{counter[0]}.h5")
        write_h5(p, tree)
        f = read_h5(p)

        def verify(node, grp):
            for k, v in node.items():
                if isinstance(v, dict):
                    verify(v, grp[k])
                else:
                    got = grp[k].data
                    assert got.dtype == v.dtype, (k, got.dtype, v.dtype)
                    assert got.shape == v.shape
                    assert np.array_equal(got, v)

        verify(tree, f)

    check()


def test_hdf5_many_members_sorted_lookup(tmp_path):
    """Symbol-table entries must be retrievable for wide groups (SNOD
    holds sorted entries; Keras layers easily exceed a handful)."""
    p = str(tmp_path / "wide.h5")
    tree = {f"layer_{i:02d}": {"kernel:0": np.full(3, i, dtype=np.float32)} for i in range(40)}
    write_h5(p, tree)
    f = read_h5(p)
    for i in range(40):
        assert f[f"layer_{i:02d}/kernel:0"][()][0] == i


# --------------------------------------------------------------------------
# keras graph


@pytest.fixture(scope="module")
def h5_model(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("model") / "fixture.h5")
    info = write_keras_fixture(p, width=16, depth=2, seed=7)
    return p, info


def test_load_config_and_shapes(h5_model):
    p, info = h5_model
    m = RefSeq2Seq.load_h5(p)
    assert m.width == 16 and m.depth == 2
    assert m.voc_size == len(info["mapping"])
    assert m.embed.shape == (m.voc_size, 16)
    assert m.enc_fwd.W.shape == (16, 64) and m.enc_bwd.U.shape == (16, 64)
    assert m.enc_stack[0].W.shape == (32, 64)  # layer 2 consumes 2W
    assert m.dec_stack[-1].W.shape == (32, 64)  # top cell: concat(x, ctx)
    assert m.W_a.shape == (16, 16) and m.v_a.shape == (16,)
    assert m.att_dense.shape == (16, 16)
    # '\n' (EOS) must be in the decoded mapping
    assert "\n" in m.c_i


def test_decode_pinned_and_deterministic(h5_model):
    p, _ = h5_model
    m = RefSeq2Seq.load_h5(p)
    texts = ["hello world\n", "abc\n"]
    outs, probs, aligns = m.decode_greedy_batch(texts)
    # pinned outputs for the seeded fixture (catches any silent change in
    # reader byte-decoding, weight mapping, or forward-pass semantics)
    assert outs == ["\n", "jppppppppppppppppppppppp\n"]
    for t, o, pr, al in zip(texts, outs, probs, aligns):
        assert o.endswith("\n")
        assert len(pr) == len(o)
        assert al.shape == (len(o), len(t))
        assert np.allclose(al.sum(axis=1), 1.0, atol=1e-4)
    # fresh load decodes identically
    outs2, _, _ = RefSeq2Seq.load_h5(p).decode_greedy_batch(texts)
    assert outs2 == outs
    # broadcastable state roundtrip (what the Spark corrector ships)
    outs3, _, _ = RefSeq2Seq.from_state(m.state()).decode_greedy_batch(texts)
    assert outs3 == outs


def test_depth1_bidirectional_context(h5_model, tmp_path):
    """depth=1: the attended context is the 2W bidirectional encoder
    output; the top cell kernel must be (W+2W, 4W)."""
    p = str(tmp_path / "d1.h5")
    write_keras_fixture(p, width=16, depth=1, seed=3)
    m = RefSeq2Seq.load_h5(p)
    assert m.dec_stack[0].W.shape == (48, 64)
    outs, _, aligns = m.decode_greedy_batch(["test line\n"])
    assert outs[0].endswith("\n") and aligns[0].shape[1] == 10


def test_bridge_and_residual_load_paths(tmp_path):
    """Optional-config graphs (bridge_dense Dense-tanh on the decoder
    init states; residual adds in both stacks) load and decode."""
    from cor_asv_ann_spark.model.keras_graph import write_keras_fixture

    p = str(tmp_path / "br.h5")
    write_keras_fixture(p, width=16, depth=3, seed=11, bridge_dense=True, residual=True)
    m = RefSeq2Seq.load_h5(p)
    assert m.bridge and m.residual and len(m.bridges) == 3
    outs, _, _ = m.decode_greedy_batch(["abc def\n"])
    assert outs[0].endswith("\n")
    outs2, _, _ = RefSeq2Seq.load_h5(p).decode_greedy_batch(["abc def\n"])
    assert outs2 == outs


def test_split_layer_names_attr(h5_model):
    """Keras chunks >64KB attrs into layer_names0/1/…
    (save_attributes_to_hdf5_group); the loader must reassemble them —
    big models hit this in the wild."""
    p, _ = h5_model
    base_out, _, _ = RefSeq2Seq.load_h5(p).decode_greedy_batch(["abc\n"])
    f = read_h5(p)
    names = list(f.attrs.pop("layer_names"))
    f.attrs["layer_names0"] = np.array(names[:2])
    f.attrs["layer_names1"] = np.array(names[2:])
    m = RefSeq2Seq.from_h5_group(f)
    out, _, _ = m.decode_greedy_batch(["abc\n"])
    assert out == base_out


def test_deep_bidirectional_encoder(tmp_path):
    """deep_bidirectional_encoder graphs: every encoder layer is
    Bidirectional over the cross_sum of the previous layer's outputs
    (seq2seq.py:246-262); the attended context is 2W at any depth."""
    import numpy as np

    from cor_asv_ann_spark.model.keras_graph import write_keras_fixture

    # the cross_sum formula pinned against the reference's own numpy
    # comment: x + flip(reshape(x, (..., d/2, 2)), -1).reshape(x.shape)
    x = np.arange(12, dtype=np.float64).reshape(1, 2, 6)
    cs = RefSeq2Seq._cross_sum(x)
    assert np.array_equal(cs[0, 0], [1, 1, 5, 5, 9, 9])  # pairwise sums

    p = str(tmp_path / "deep.h5")
    write_keras_fixture(p, width=16, depth=2, seed=5, deep_bidirectional=True)
    m = RefSeq2Seq.load_h5(p)
    assert m.deep_bidi
    assert m.enc_stack[0][0].W.shape == (32, 64)  # fwd layer-2 eats 2W
    assert m.dec_stack[-1].W.shape == (48, 64)  # top cell: W + 2W context
    assert m.att_dense.shape == (32, 16)
    outs, _, aligns = m.decode_greedy_batch(["abc def\n"])
    assert outs[0].endswith("\n") and aligns[0].shape[1] == 8
    outs2, _, _ = RefSeq2Seq.load_h5(p).decode_greedy_batch(["abc def\n"])
    assert outs2 == outs


def test_greedy_semantics_reference_parity(h5_model):
    """Loop semantics pinned to seq2seq.py:1242-1258: index 0 never
    emitted, per-line freeze after EOS, step cap 2×batch_length."""
    p, _ = h5_model
    m = RefSeq2Seq.load_h5(p)
    texts = ["abcdefgh\n", "zz\n"]
    outs, probs, _ = m.decode_greedy_batch(texts)
    for o in outs:
        assert "" not in [c for c in o]  # no index-0 char
        assert len(o) <= 2 * 9 + 1  # batch_length cap (+ appended EOS)
        assert o.count("\n") == 1 and o.endswith("\n")


def test_ref_model_all_input_encodings(h5_model):
    """The reference graph consumes all three input encodings
    (SURVEY §1.2); full-confidence single-alternative confmat and
    all-1.0 prob lines must decode exactly like plain one-hot."""
    p, _ = h5_model
    m = RefSeq2Seq.load_h5(p)
    texts = ["abc\n", "hello\n"]
    o1, _, _ = m.decode_greedy_batch(texts)
    o2, _, _ = m.decode_greedy_confmat([[[(ch, 1.0)] for ch in t] for t in texts])
    o3, _, _ = m.decode_greedy_prob(texts, [[1.0] * len(t) for t in texts])
    assert o1 == o2 == o3
    # degraded confidence changes the input tensor (mass shifts to
    # index 0) — decoding may differ, but must stay deterministic
    o4, _, _ = m.decode_greedy_prob(texts, [[0.5] * len(t) for t in texts])
    o5, _, _ = m.decode_greedy_prob(texts, [[0.5] * len(t) for t in texts])
    assert o4 == o5


def test_ref_model_beam_decode(h5_model):
    """The h5-loaded reference graph supports the full beam (shared
    beam_search: rejection path, hypothesis-parallel steps). With a high
    rejection floor the beam echoes the input even under random weights."""
    p, _ = h5_model
    m = RefSeq2Seq.load_h5(p)
    texts = ["abc\n", "hello\n"]
    outs, probs, aligns = m.decode_beam_batch(texts, beam_width=4, rejection_threshold=0.95)
    assert outs == texts  # rejection-dominated: echo of the source
    for t, o, pr, al in zip(texts, outs, probs, aligns):
        assert len(pr) == len(o)
        assert al.shape == (len(o), len(t))
    # deterministic
    outs2, _, _ = m.decode_beam_batch(texts, beam_width=4, rejection_threshold=0.95)
    assert outs2 == outs


def test_ref_model_drives_spark_pipeline(spark, sf_small, h5_model):
    """End-to-end: the h5-loaded model corrects a real span table through
    correct_pipeline (broadcast state, Arrow batches, Viterbi-path
    segmentation) — the round-1 'architecture proven, model missing'
    gap closed."""
    from cor_asv_ann_spark.model.corrector import make_model_corrector
    from cor_asv_ann_spark.operators.correction import correct_pipeline
    from cor_asv_ann_spark.sources.spans import synth_spans

    p, _ = h5_model
    model = RefSeq2Seq.load_h5(p)
    spans = synth_spans(spark, sf_small, noisy=True).limit(8)
    corrector = make_model_corrector(spark, model)
    out = correct_pipeline(spans, corrector=corrector)
    rows = out.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
    )
    collected = rows.collect()
    assert len(collected) > 0
    # media spans ride through untouched; word spans exist
    kinds = {r.kind for r in collected}
    assert "word" in kinds and "newline" in kinds
    for r in collected:
        if r.kind == "media":
            assert r.text == "" and r.media_ref.startswith("img://")


REAL_LAYOUTS = [
    # the physical structures real h5py output uses beyond the writer's
    # simplest contiguous/single-SNOD/v0 form
    {"chunked": True, "chunk_rows": 5},
    {"chunked": True, "gzip": True, "chunk_rows": 4},
    {"max_snod": 3},
    {"superblock_version": 1},
    {"chunked": True, "gzip": True, "chunk_rows": 3, "max_snod": 4,
     "superblock_version": 1},
]


@pytest.mark.parametrize("layout", REAL_LAYOUTS)
def test_hdf5_real_layouts_roundtrip(tmp_path, layout):
    """chunked + gzip chunk B-trees, multi-SNOD group B-trees and the v1
    superblock must all roundtrip byte-exactly — the layouts real h5py
    files use (chunked datasets appear with any compression, multi-SNOD
    groups past ~2·K_leaf links)."""
    rng = np.random.default_rng(1)
    tree = {
        "g": {
            "a": rng.standard_normal((37, 5)).astype(np.float32),
            "b": np.arange(100, dtype=np.int64).reshape(10, 10),
        },
        "many": {f"m{i:03d}": np.arange(i % 9, dtype=np.float32) for i in range(40)},
        "scalar": {"s": np.array(2.5, dtype=np.float64)},
    }
    p = str(tmp_path / "layout.h5")
    write_h5(p, tree, {"g/a": {"tag": b"t"}}, **layout)
    f = read_h5(p)
    assert np.array_equal(f["g/a"].data, tree["g"]["a"])
    assert np.array_equal(f["g/b"].data, tree["g"]["b"])
    assert np.array_equal(f["many/m031"].data, tree["many"]["m031"])
    assert len(f["many"].keys()) == 40
    assert float(f["scalar/s"].data) == 2.5
    assert f["g/a"].attrs["tag"] == b"t"


def test_hdf5_property_roundtrip_real_layouts(tmp_path):
    """Property test over the chunked+gzip+multi-SNOD+v1 layout: the
    reader must agree with the writer for arbitrary trees, not just the
    Keras-shaped fixtures."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    name = st.text(alphabet="abcdefghij_0123456789", min_size=1, max_size=10)
    arr = st.one_of(
        arrays(np.float32, st.tuples(st.integers(0, 9), st.integers(1, 4)),
               elements=st.floats(-1e3, 1e3, width=32)),
        arrays(np.int32, st.integers(0, 11), elements=st.integers(-(2**30), 2**30)),
    )
    tree_strategy = st.dictionaries(name, arr, min_size=1, max_size=5)
    counter = [0]

    @settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    @given(tree=tree_strategy)
    def check(tree):
        counter[0] += 1
        p = str(tmp_path / f"rl{counter[0]}.h5")
        write_h5(p, tree, chunked=True, gzip=True, chunk_rows=3, max_snod=2,
                 superblock_version=1)
        f = read_h5(p)
        for k, v in tree.items():
            got = f[k].data
            assert got.dtype == v.dtype and got.shape == v.shape
            assert np.array_equal(got, v)

    check()


def test_keras_fixture_loads_from_real_layouts(tmp_path):
    """The reference-graph loader must produce the identical model from
    a chunked+gzip / multi-SNOD / v1-superblock fixture as from the
    plain contiguous one — decode outputs pinned equal."""
    plain = str(tmp_path / "plain.h5")
    write_keras_fixture(plain, width=16, depth=2, seed=7)
    m0 = RefSeq2Seq.load_h5(plain)
    base, _, _ = m0.decode_greedy_batch(["hello\n", "world x\n"])
    for i, layout in enumerate(REAL_LAYOUTS):
        p = str(tmp_path / f"real{i}.h5")
        write_keras_fixture(p, width=16, depth=2, seed=7, **layout)
        m = RefSeq2Seq.load_h5(p)
        out, _, _ = m.decode_greedy_batch(["hello\n", "world x\n"])
        assert out == base, f"layout {layout} decoded differently"


def test_stateful_model_loads_and_carries_state(tmp_path):
    """A stateful=True model file (seq2seq.py saves/loads the flag,
    1134/1152) must load — a user transferring an LM hits this first —
    and decode_greedy_docs must thread decoder LSTM state across a
    document's lines with reset at document boundaries (the reference's
    state-transfer-between-batches contract, ResetStatesCallback reset
    at EOF)."""
    import numpy as np

    p = str(tmp_path / "stateful.h5")
    write_keras_fixture(p, width=16, depth=2, seed=9, stateful=True)
    m = RefSeq2Seq.load_h5(p)
    assert m.stateful is True

    line = "the same line\n"
    docs = [[line, line], [line, line]]
    outs, probs, aligns = m.decode_greedy_docs(docs)

    # line 1 uses the encoder-derived init — identical to the stateless
    # batch path
    stateless, sprobs, _ = m.decode_greedy_batch([line])
    assert outs[0][0] == stateless[0]
    assert np.allclose(probs[0][0], sprobs[0])

    # line 2 starts from line 1's carried (h, c): its decoder
    # trajectory must differ numerically from line 1's
    assert not (
        outs[0][1] == outs[0][0]
        and len(probs[0][1]) == len(probs[0][0])
        and np.allclose(probs[0][1], probs[0][0])
    ), "carried state had no effect"

    # documents are isolated: identical docs decode identically
    # (state resets at the boundary; lanes do not cross-talk)
    assert outs[0] == outs[1]
    for a, b in zip(probs[0], probs[1]):
        assert np.allclose(a, b)

    # and a doc run alone matches its lane in the vectorized run
    solo_outs, solo_probs, _ = m.decode_greedy_docs([docs[0]])
    assert solo_outs[0] == outs[0]

    # ragged docs: a 3-line doc next to a 1-line doc round-robins fine
    r_outs, _, r_aligns = m.decode_greedy_docs([[line, "ab\n", "xyz\n"], [line]])
    assert len(r_outs[0]) == 3 and len(r_outs[1]) == 1
    assert r_outs[1][0] == stateless[0]
    for al, src in zip(r_aligns[0], [line, "ab\n", "xyz\n"]):
        assert al.shape[1] == len(src)

