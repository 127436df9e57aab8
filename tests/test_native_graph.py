"""Native (C++) graph engine vs the Python implementation."""
import numpy as np
import pytest

from cvpce_tpu.pipeline import build_graph as py_build_graph
from cvpce_tpu.pipeline import large_common_subgraph as py_lcs
from cvpce_tpu.pipeline import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def grid_boxes(rows, cols, w=10.0, h=10.0, gap=2.0):
    return np.asarray([[c * (w + gap), r * (h + gap),
                        c * (w + gap) + w, r * (h + gap) + h]
                       for r in range(rows) for c in range(cols)],
                      np.float32)


def graphs_equal(g1, g2):
    if set(g1.nodes) != set(g2.nodes):
        return False
    for n in g1.nodes:
        if g1.nodes[n] != g2.nodes[n]:
            return False
    e1 = {(u, v, g1[u][v]["dir"]) for u, v in g1.edges}
    e2 = {(u, v, g2[u][v]["dir"]) for u, v in g2.edges}
    return e1 == e2


@pytest.mark.parametrize("rows,cols", [(2, 3), (3, 3), (1, 5), (4, 6)])
def test_build_graph_matches_python(rows, cols):
    boxes = grid_boxes(rows, cols)
    labels = [f"p{i}" for i in range(rows * cols)]
    assert graphs_equal(native.build_graph(boxes, labels),
                        py_build_graph(boxes, labels))


def test_build_graph_random_layouts():
    rng = np.random.default_rng(0)
    for trial in range(5):
        n = 24
        xy = rng.uniform(0, 120, (n, 2)).astype(np.float32)
        wh = rng.uniform(8, 20, (n, 2)).astype(np.float32)
        boxes = np.concatenate([xy, xy + wh], -1)
        labels = [f"p{i % 7}" for i in range(n)]
        g_native = native.build_graph(boxes, labels)
        g_py = py_build_graph(boxes, labels)
        assert graphs_equal(g_native, g_py), f"trial {trial}"


def test_lcs_matches_python_on_grids():
    boxes = grid_boxes(3, 4)
    labels = [f"p{i}" for i in range(12)]
    g1 = py_build_graph(boxes, labels)
    g2 = py_build_graph(boxes * 1.07 + 3.0, labels)
    want = py_lcs(g1, g2)
    got = native.large_common_subgraph(g1, g2)
    assert got == want


def test_lcs_with_noise_and_missing():
    rng = np.random.default_rng(1)
    boxes = grid_boxes(4, 5)
    labels = [f"p{i}" for i in range(20)]
    keep = [i for i in range(20) if i != 7 and i != 13]
    noisy = boxes[keep] + rng.uniform(-1, 1, (len(keep), 4)).astype(
        np.float32)
    g1 = py_build_graph(boxes, labels)
    g2 = py_build_graph(noisy, [labels[i] for i in keep])
    want = py_lcs(g1, g2)
    got = native.large_common_subgraph(g1, g2)
    # both must find the same-size matching; exact pair sets can differ
    # only when several equal-score hypotheses tie — compare sets since
    # both follow identical deterministic tie-breaking
    assert got == want
