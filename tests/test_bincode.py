"""Byte-level checks of the bincode-1.3 codec against hand-computed
layouts (SURVEY §5; bincode 1.3 legacy defaults: LE fixed-width ints,
usize=u64, u32 enum tags, serde_arrays tuples with no length prefix)."""

import io
import struct

import numpy as np

from vers_tpu.io.bincode import Reader, Writer, dumps


def test_primitives_layout():
    b = dumps(lambda w: (w.u64(5), w.u32(7), w.f32(1.5)))
    assert b == struct.pack("<QIf", 5, 7, 1.5)


def test_vec_u64_layout():
    b = dumps(lambda w: w.vec_u64([1, 2, 3]))
    assert b == struct.pack("<QQQQ", 3, 1, 2, 3)


def test_f32_array_no_length_prefix():
    b = dumps(lambda w: w.f32_array([1.0, 2.0]))
    assert b == struct.pack("<ff", 1.0, 2.0)


def test_matrix_layout():
    m = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
    b = dumps(lambda w: w.vec_f32_matrix(m))
    assert b == struct.pack("<Qffff", 2, 1.0, 2.0, 3.0, 4.0)


def test_reader_roundtrip():
    m = np.arange(12, dtype=np.float32).reshape(3, 4)
    b = dumps(lambda w: (w.u64(9), w.vec_f32_matrix(m), w.vec_u64([4, 5])))
    r = Reader(io.BytesIO(b))
    assert r.u64() == 9
    np.testing.assert_array_equal(r.vec_f32_matrix(4), m)
    np.testing.assert_array_equal(r.vec_u64(), [4, 5])
    assert r.at_eof()


def test_ivfflat_file_layout(tmp_path):
    """Whole-file byte check for a tiny IVFFlat index."""
    from vers_tpu.index.ivfflat import IVFFlatIndex

    values = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]], np.float32)
    centroids = np.array([[0.5, 0.5]], np.float32)
    idx = IVFFlatIndex(1, values, centroids, np.array([0, 0, 0]), [[0, 1, 2]])
    p = str(tmp_path / "tiny.index")
    idx.save_index(p)
    raw = open(p, "rb").read()
    expected = (
        struct.pack("<Q", 1)
        + struct.pack("<Q", 3) + values.tobytes()
        + struct.pack("<Q", 1) + centroids.tobytes()
        + struct.pack("<QQQQ", 3, 0, 0, 0)
        + struct.pack("<QQQQQ", 1, 3, 0, 1, 2)
    )
    assert raw == expected


def test_lsh_node_enum_layout(tmp_path):
    """Leaf node: tag u32=1 + Vec<u64>; Inner: tag u32=0 + hyperplane."""
    from vers_tpu.index.lsh import ANNIndex

    # 4 identical-direction points forced into one leaf (max_size=8)
    x = np.array([[1.0, 0.0], [2.0, 0.0], [3.0, 0.0], [4.0, 0.0]], np.float32)
    idx = ANNIndex.build_index(1, 8, x, np.arange(4))
    p = str(tmp_path / "lsh_tiny.index")
    idx.save_index(p)
    raw = open(p, "rb").read()
    expected = (
        struct.pack("<Q", 8)              # max_node_size
        + struct.pack("<Q", 1)            # num trees
        + struct.pack("<I", 1)            # Node::Leaf tag
        + struct.pack("<QQQQQ", 4, 0, 1, 2, 3)  # leaf members
        + struct.pack("<Q", 4) + x.tobytes()    # values
        + struct.pack("<QQQQQ", 4, 0, 1, 2, 3)  # ids
    )
    assert raw == expected
