"""Hand-crafted byte-level test of the HNSW bincode layout
(`hnsw.rs:20-32` field order, `models.rs:149-153` AdjacencyItemSer):
decode a file we assemble byte-by-byte and check the graph."""

import struct

import numpy as np

from vers_tpu.index.hnsw import HNSWIndex


def _adj_item(heap_pairs, neighbours):
    out = struct.pack("<Q", len(heap_pairs))
    for cid, dist in heap_pairs:
        out += struct.pack("<Qf", cid, dist)
    out += struct.pack("<Q", len(neighbours))
    for n in neighbours:
        out += struct.pack("<Q", n)
    return out


def test_decode_handcrafted_hnsw_file(tmp_path):
    dim = 2
    raw = b""
    raw += struct.pack("<Q", 100)  # ef_construction
    raw += struct.pack("<Q", 32)   # ef_search
    raw += struct.pack("<Q", 4)    # num_neighbours
    raw += struct.pack("<Q", 2)    # num layers
    # layer 0: nodes 0<->1 (dist 0.25)
    raw += struct.pack("<Q", 2)
    raw += struct.pack("<Q", 0) + _adj_item([(1, 0.25)], [1])
    raw += struct.pack("<Q", 1) + _adj_item([(0, 0.25)], [0])
    # layer 1 (top): solitary node 0
    raw += struct.pack("<Q", 1)
    raw += struct.pack("<Q", 0) + _adj_item([], [])
    raw += struct.pack("<f", 1.0 / np.log(4.0))  # layer_multiplier
    # id_to_vec
    raw += struct.pack("<Q", 2)
    raw += struct.pack("<Q", 0) + struct.pack("<ff", 1.0, 0.0)
    raw += struct.pack("<Q", 1) + struct.pack("<ff", 0.0, 1.0)

    p = tmp_path / "hand.index"
    p.write_bytes(raw)
    idx = HNSWIndex.load_index(str(p), dim=2)
    assert idx.ef_construction == 100
    assert idx.ef_search == 32
    assert idx.num_neighbours == 4
    assert idx.get_num_nodes_in_layers() == [2, 1]
    assert idx.layers[0].adjacency[0].neighbours == {1}
    np.testing.assert_allclose(idx._vec(1), [0.0, 1.0])

    # search from the decoded graph: query near node 1
    res = idx.search_approximate(np.array([0.0, 1.0], np.float32), 2)
    assert res[0][0] == 1

    # re-encode and re-decode: graph must survive
    p2 = tmp_path / "rt.index"
    idx.save_index(str(p2))
    idx2 = HNSWIndex.load_index(str(p2), dim=2)
    assert idx2.get_num_nodes_in_layers() == [2, 1]
    assert idx2.layers[0].adjacency[1].neighbours == {0}
