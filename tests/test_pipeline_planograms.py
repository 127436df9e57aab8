"""Tests for planogram graph building, matching, and compliance scoring."""
import numpy as np
import pytest

from cvpce_tpu.pipeline import (
    PlanogramComparator,
    build_graph,
    build_hypotheses,
    finalize_via_ransac,
    large_common_subgraph,
    tonioni_mcs,
)


def grid_boxes(rows, cols, w=10.0, h=20.0, gap=2.0):
    boxes = []
    for r in range(rows):
        for c in range(cols):
            x1 = c * (w + gap)
            y1 = r * (h + gap)
            boxes.append([x1, y1, x1 + w, y1 + h])
    return np.asarray(boxes, np.float32)


class TestBuildGraph:
    def test_grid_edges(self):
        # square-ish products so vertical neighbors fall inside the
        # 0.5 * avg(extent) distance threshold (planograms.py:30-36)
        boxes = grid_boxes(2, 3, w=10.0, h=10.0)
        labels = [f"p{i}" for i in range(6)]
        g = build_graph(boxes, labels)
        # node 0 (top-left): east to 1, south... note image coords: larger y
        # is "down", but directions come from math angles on raw coords, so
        # y+ is N-ish per the reference's convention after its flip.
        assert g[0][1]["dir"] == "E"
        assert g[1][0]["dir"] == "W"
        d03 = g[0][3]["dir"]
        assert d03 in ("N", "S")
        assert g[3][0]["dir"] == ("S" if d03 == "N" else "N")
        # middle node 4 has 4+ neighbors
        assert len(g[4]) >= 3
        assert g.nodes[0]["label"] == "p0"

    def test_keeps_shortest_opposing_edge(self):
        # three collinear boxes: 0 -- 1 -- 2; node 1's W edge must go to 0,
        # not 2, and 2's W edge goes to 1. Tall boxes keep the neighbor
        # distance under the 0.5 * avg(extent) threshold.
        boxes = np.array([[0, 0, 10, 30], [12, 0, 22, 30], [24, 0, 34, 30]],
                         np.float32)
        g = build_graph(boxes, ["a", "b", "c"])
        assert g[1][0]["dir"] == "W"
        assert g[1][2]["dir"] == "E"
        assert g[2][1]["dir"] == "W"
        assert 0 not in g[2] or g[2][0]["dir"] != "W"


class TestMatching:
    def test_identical_graphs_match_fully_or_half(self):
        boxes = grid_boxes(3, 3)
        labels = [f"p{i}" for i in range(9)]
        g1 = build_graph(boxes, labels)
        g2 = build_graph(boxes + 1.5, labels)  # translated copy
        matching = large_common_subgraph(g1, g2)
        # early-stops at > half of min graph size
        assert len(matching) > 4
        for n1, n2 in matching:
            assert n1 == n2

    def test_hypotheses_only_equal_labels(self):
        boxes = grid_boxes(1, 2)
        g1 = build_graph(boxes, ["a", "b"])
        g2 = build_graph(boxes, ["b", "a"])
        hyps = build_hypotheses(g1, g2)
        pairs = {(n1, n2) for _, n1, n2 in hyps}
        assert pairs == {(0, 1), (1, 0)}

    def test_tonioni_mcs_agrees_on_easy_case(self):
        # dense 3x3 grid: center hypotheses score -4/8 < min_score -0.2,
        # so the search actually expands (sparse graphs where every node
        # has one neighbor score -1/8 and are rejected, like the reference)
        boxes = grid_boxes(3, 3, w=10.0, h=10.0)
        labels = [f"p{i}" for i in range(9)]
        g1 = build_graph(boxes, labels)
        g2 = build_graph(boxes * 1.1, labels)
        sol = tonioni_mcs(g1, g2)
        assert len(sol) >= 3
        for n1, n2 in sol:
            assert n1 == n2


class TestFinalize:
    def test_identity_projection_matches_all(self):
        boxes = grid_boxes(2, 3)
        labels = [f"p{i}" for i in range(6)]
        solution = {(i, i) for i in range(6)}
        actual = boxes + np.random.default_rng(0).uniform(
            -0.5, 0.5, boxes.shape).astype(np.float32)
        found, missing_idx, missing_pos, missing_lbl = finalize_via_ransac(
            solution, boxes, actual, labels, labels, reproj_threshold=3.0)
        assert found is not None
        assert found.all()
        assert len(missing_idx) == 0

    def test_cross_points_variant(self):
        """_ransac_points_cross (cvpce/planograms.py:179-185): center +
        4 edge midpoints per box, usable via points_fn."""
        from cvpce_tpu.pipeline.planograms import _ransac_points_cross

        boxes = np.asarray([[0.0, 0.0, 4.0, 2.0]], np.float32)
        pts = _ransac_points_cross(boxes)
        assert pts.shape == (5, 2)
        np.testing.assert_allclose(
            pts, [[2, 1],          # center
                  [2, 0],          # top mid
                  [2, 2],          # bottom mid
                  [0, 1],          # left mid
                  [4, 1]])         # right mid

        grid = grid_boxes(2, 3)
        labels = [f"p{i}" for i in range(6)]
        solution = {(i, i) for i in range(6)}
        actual = grid + np.random.default_rng(0).uniform(
            -0.5, 0.5, grid.shape).astype(np.float32)
        found, _, _, _ = finalize_via_ransac(
            solution, grid, actual, labels, labels,
            reproj_threshold=3.0, points_fn=_ransac_points_cross)
        assert found is not None and found.all()

    def test_missing_product_detected(self):
        boxes = grid_boxes(2, 3)
        labels = [f"p{i}" for i in range(6)]
        keep = [0, 1, 2, 3, 4]  # product 5 missing from the shelf
        actual = boxes[keep]
        solution = {(i, i) for i in keep}
        found, missing_idx, missing_pos, missing_lbl = finalize_via_ransac(
            solution, boxes, actual, labels,
            [labels[i] for i in keep], reproj_threshold=3.0)
        assert found.sum() == 5
        assert list(missing_idx) == [5]
        assert missing_lbl == ["p5"]
        assert missing_pos.shape == (1, 4)


class TestComparator:
    def test_fully_compliant(self):
        boxes = grid_boxes(3, 3)
        labels = [f"p{i}" for i in range(9)]
        comparator = PlanogramComparator()
        score = comparator.compare(
            {"boxes": boxes, "labels": labels},
            {"boxes": boxes * 1.05 + 2.0, "labels": labels},
        )
        assert score == pytest.approx(1.0)

    def test_empty_detections(self):
        boxes = grid_boxes(2, 2)
        comparator = PlanogramComparator()
        assert comparator.compare(
            {"boxes": boxes, "labels": list("abcd")},
            {"boxes": np.zeros((0, 4), np.float32), "labels": []},
        ) == 0.0

    def test_no_label_overlap_scores_zero(self):
        boxes = grid_boxes(2, 2)
        comparator = PlanogramComparator()
        score = comparator.compare(
            {"boxes": boxes, "labels": list("abcd")},
            {"boxes": boxes, "labels": list("wxyz")},
        )
        assert score == 0.0

    def test_partial_compliance(self):
        boxes = grid_boxes(3, 3)
        labels = [f"p{i}" for i in range(9)]
        keep = list(range(8))  # one product missing
        comparator = PlanogramComparator()
        score = comparator.compare(
            {"boxes": boxes, "labels": labels},
            {"boxes": boxes[keep], "labels": [labels[i] for i in keep]},
        )
        assert 0.5 < score < 1.0
