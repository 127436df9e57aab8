"""Planogram graphs: construction, matching, RANSAC finalization.

Re-design of cvpce/planograms.py. The geometry (pairwise distances,
8-sector direction binning) is vectorized numpy
(planograms.py:30-51 is already tensor math in the reference); the
nearest-per-direction edge selection and greedy region growing stay host
Python over networkx (they are per-image, tiny, and pointer-chasing —
planograms.py:53-169); the homography fit runs on device via the batched
RANSAC kernel (ops/ransac.py) instead of cv2.findHomography
(planograms.py:199).
"""
from __future__ import annotations

import math
from typing import Dict, List, Sequence, Set, Tuple

import jax
import networkx as nx
import numpy as np

from ..ops.boxes import pairwise_iou
from ..ops.ransac import find_homography_ransac, project_boxes
from ..utils import labels_to_tensors, tensors_to_labels

CARDINALS = ["E", "NE", "N", "NW", "W", "SW", "S", "SE"]


def _direction_masks(boxes: np.ndarray) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
    """Distances + per-cardinal boolean masks (planograms.py:38-51)."""
    centres = np.stack([(boxes[:, 0] + boxes[:, 2]) / 2,
                        (boxes[:, 1] + boxes[:, 3]) / 2], axis=1)
    diff = centres[None, :, :] - centres[:, None, :]
    dists = np.sqrt((diff**2).sum(-1))
    with np.errstate(invalid="ignore", divide="ignore"):
        dir_vecs = diff / dists[..., None]
    dirs = np.arccos(np.clip(dir_vecs[..., 0], -1, 1))
    over_180 = dir_vecs[..., 1] < 0
    dirs[over_180] = 2 * math.pi - dirs[over_180]

    masks = {"E": (dirs > 15 * math.pi / 8) | (dirs <= math.pi / 8)}
    for i, d in enumerate(CARDINALS[1:]):
        masks[d] = (dirs > (1 + 2 * i) * math.pi / 8) \
            & (dirs <= (1 + 2 * (i + 1)) * math.pi / 8)
    return dists, masks


def _check_dir(i: int, j: int, direction: str, masks, graph: nx.DiGraph,
               dist: float) -> bool:
    """Try adding an i->j edge in `direction`, keeping only the shortest
    opposing edge per node (planograms.py:12-28)."""
    if not masks[direction][i, j]:
        return False
    opposite = CARDINALS[(CARDINALS.index(direction) + 4) % 8]
    for k in graph[j]:
        edge = graph[j][k]
        if edge["dir"] == opposite:
            if edge["weight"] <= dist:
                return False
            graph.remove_edge(j, k)
            graph.remove_edge(k, j)
            break
    graph.add_edge(i, j, dir=direction, weight=dist)
    graph.add_edge(j, i, dir=opposite, weight=dist)
    return True


def build_graph(boxes, labels: Sequence, thresh_size: float = 0.5) -> nx.DiGraph:
    """Boxes + labels -> planogram adjacency DiGraph (planograms.py:30-71):
    per node, connect the nearest neighbor in each of 8 cardinal sectors
    within 0.5 * mean(extent) distance."""
    boxes = np.asarray(boxes, np.float32)
    n = len(boxes)
    avg_dim = ((boxes[:, 2].max() - boxes[:, 0].min())
               + (boxes[:, 3].max() - boxes[:, 1].min())) / 2
    thresh = thresh_size * avg_dim

    dists, masks = _direction_masks(boxes)
    g = nx.DiGraph()
    g.add_nodes_from((i, {"label": labels[i]}) for i in range(n))

    sort_idx = np.argsort(dists, axis=1, kind="stable")
    sorted_dist = np.take_along_axis(dists, sort_idx, axis=1)
    for i in range(n):
        not_found = set(CARDINALS)
        for neigh in g[i]:
            not_found.discard(g[i][neigh]["dir"])
        for d, j in zip(sorted_dist[i], sort_idx[i]):
            if d > thresh or not not_found:
                break
            j = int(j)
            if i == j:
                continue
            for direction in list(not_found):
                if _check_dir(i, j, direction, masks, g, float(d)):
                    not_found.remove(direction)
                    break
    return g


def _outgoing_by_dir(g: nx.DiGraph, n, edge_label: str) -> Dict:
    """Direction -> neighbor attr-dict for one node's out-edges. Planogram
    graphs carry at most one out-edge per cardinal, so a flat dict is
    lossless here (later duplicates would shadow earlier ones, matching
    reference dict-build order, planograms.py:76-82)."""
    return {g[n][v][edge_label]: g.nodes[v] for v in g[n]}


def build_hypotheses(g1: nx.DiGraph, g2: nx.DiGraph,
                     edge_label: str = "dir") -> List[Tuple]:
    """Candidate node correspondences, best first.

    A hypothesis pairs two like-labeled nodes; its score is the fraction
    of the 8 cardinals where both nodes see a like-labeled neighbor
    (planograms.py:73-93). Sorted ascending on the NEGATED score so
    index 0 is the strongest candidate. The per-node direction tables
    are built once per graph instead of per pair."""
    table1 = {n: _outgoing_by_dir(g1, n, edge_label) for n in g1}
    table2 = {n: _outgoing_by_dir(g2, n, edge_label) for n in g2}
    out = []
    for n1 in g1:
        for n2 in g2:
            if g1.nodes[n1] != g2.nodes[n2]:
                continue
            d1, d2 = table1[n1], table2[n2]
            agree = sum(1 for c, attrs in d1.items()
                        if c in d2 and d2[c] == attrs)
            out.append((-agree / len(CARDINALS), n1, n2))
    out.sort()
    return out


def _aligned_neighbors(g1, g2, n1, n2, edge_label: str) -> List[Tuple]:
    """Neighbor pairs reachable from (n1, n2) along a shared direction
    with equal node attrs — the expansion step of region growing
    (planograms.py:96-106). Order: g1 adjacency order, then g2's within
    each direction (same enumeration order as a full pair scan)."""
    bucket: Dict = {}
    for e2 in g2[n2]:
        bucket.setdefault(g2[n2][e2][edge_label], []).append(e2)
    pairs = []
    for e1 in g1[n1]:
        for e2 in bucket.get(g1[n1][e1][edge_label], ()):
            if g1.nodes[e1] == g2.nodes[e2]:
                pairs.append((e1, e2))
    return pairs


def _grow_region(g1, g2, n1, n2, edge_label: str) -> Set[Tuple]:
    """BFS-expand one seed correspondence into a maximal consistent
    region: each node participates in at most one pair; expansion pairs
    are consumed in discovery order."""
    from collections import deque

    region = {(n1, n2)}
    taken1, taken2 = {n1}, {n2}
    frontier = deque(_aligned_neighbors(g1, g2, n1, n2, edge_label))
    while frontier:
        a, b = frontier.popleft()
        if a in taken1 or b in taken2:
            continue
        region.add((a, b))
        taken1.add(a)
        taken2.add(b)
        frontier.extend(_aligned_neighbors(g1, g2, a, b, edge_label))
    return region


def large_common_subgraph(g1: nx.DiGraph, g2: nx.DiGraph,
                          edge_label: str = "dir", min_score: float = -0.2,
                          stop_at_fraction: float = 0.5) -> Set[Tuple]:
    """Greedy common-subgraph search (planograms.py:107-132): grow a
    region from each hypothesis in score order, stop early once a region
    covers `stop_at_fraction` of the smaller graph, and give up on the
    remaining seeds once scores fall below `min_score` (negated)."""
    enough = min(len(g1), len(g2)) * stop_at_fraction
    best: Set[Tuple] = set()
    for neg_score, n1, n2 in build_hypotheses(g1, g2, edge_label):
        if neg_score > min_score and best:
            break
        region = _grow_region(g1, g2, n1, n2, edge_label)
        if len(region) > enough:
            return region
        if len(region) > len(best):
            best = region
    return best


def tonioni_mcs(g1: nx.DiGraph, g2: nx.DiGraph, edge_label: str = "dir",
                min_score: float = -0.2) -> Set[Tuple]:
    """Branch-and-bound maximum-common-subgraph variant
    (planograms.py:134-169); not on the default path, kept for parity
    with the reference's unused alternative (production.py:91 TODO)."""

    def descend(hypo: List[Tuple], incumbent: int) -> Set[Tuple]:
        """Repeatedly commit the strongest hypothesis, rescoring and
        pruning the rest; stop when scores drop below min_score or the
        optimistic bound (committed + pairwise-disjoint survivors) can
        no longer beat the incumbent."""
        chosen: Set[Tuple] = set()
        while hypo:
            neg_s, n1, n2 = hypo[0]
            if neg_s > min_score:
                break
            chosen.add((n1, n2))
            adjacent = set(_aligned_neighbors(g1, g2, n1, n2, edge_label))
            seen1: Set = set()
            seen2: Set = set()
            bound = 0
            survivors = []
            for neg_s2, x1, x2 in hypo[1:]:
                if x1 == n1 or x2 == n2:
                    continue  # mutually exclusive with the commit
                if (x1, x2) in adjacent:
                    neg_s2 -= 1  # reward connectivity to the region
                if x1 not in seen1 and x2 not in seen2:
                    bound += 1
                seen1.add(x1)
                seen2.add(x2)
                survivors.append((neg_s2, x1, x2))
            if len(chosen) + bound < incumbent:
                break
            hypo = sorted(survivors)
        return chosen

    hypotheses = build_hypotheses(g1, g2, edge_label)
    best: Set[Tuple] = set()
    for i in range(len(hypotheses)):
        if len(best) > len(hypotheses) - i:
            break
        sol = descend(hypotheses[i:], len(best))
        if len(sol) > len(best):
            best = sol
    return best


def _ransac_points(boxes: np.ndarray) -> np.ndarray:
    """Top-left, bottom-right and center point per box
    (planograms.py:175-177)."""
    centres = np.stack([(boxes[:, 0] + boxes[:, 2]) / 2,
                        (boxes[:, 1] + boxes[:, 3]) / 2], axis=1)
    return np.concatenate([boxes[:, :2], boxes[:, 2:], centres], axis=0)


def _ransac_points_cross(boxes: np.ndarray) -> np.ndarray:
    """Cross variant: center + edge midpoints (top/bottom/left/right)
    per box — the reference's unused-in-thesis alternative
    (planograms.py:179-185, "might give a bit better results but not a
    big enough improvement"). Kept for parity; finalize_via_ransac
    takes points_fn=_ransac_points_cross to use it."""
    cx = (boxes[:, 0] + boxes[:, 2]) / 2
    cy = (boxes[:, 1] + boxes[:, 3]) / 2
    centres = np.stack([cx, cy], axis=1)
    tops = np.stack([cx, boxes[:, 1]], axis=1)
    bottoms = np.stack([cx, boxes[:, 3]], axis=1)
    lefts = np.stack([boxes[:, 0], cy], axis=1)
    rights = np.stack([boxes[:, 2], cy], axis=1)
    return np.concatenate([centres, tops, bottoms, lefts, rights], axis=0)


def finalize_via_ransac(
    solution: Set[Tuple], b1, b2, l1: Sequence, l2: Sequence,
    reproj_threshold: float = 10.0, iou_threshold: float = 0.5,
    return_matched_actual: bool = False,
    return_expected_positions: bool = False,
    seed: int = 0,
    points_fn=None,
):
    """Fit expected->actual homography on matched pairs, project all
    expected boxes, greedily match per label by IoU (planograms.py:187-245).

    Returns (matched_expected, [matched_actual,] [expected_positions,]
    missing_indices, missing_positions, missing_labels); all-None tuple on
    homography failure.
    """
    b1 = np.asarray(b1, np.float32)
    b2 = np.asarray(b2, np.float32)
    nodes1, nodes2 = (list(x) for x in zip(*solution))
    boxes1 = b1[nodes1]
    boxes2 = b2[nodes2]
    points_fn = points_fn or _ransac_points
    pts1 = points_fn(boxes1)
    pts2 = points_fn(boxes2)
    if len(solution) < 2:  # too few points -> add remaining corners
        pts1 = np.concatenate([pts1, boxes1[:, (2, 1)], boxes1[:, (0, 3)]])
        pts2 = np.concatenate([pts2, boxes2[:, (2, 1)], boxes2[:, (0, 3)]])

    h, inliers, ok = find_homography_ransac(
        pts1, pts2, np.ones(len(pts1), bool),
        jax.random.PRNGKey(seed), reproj_threshold=reproj_threshold,
    )
    none_count = 5 + return_expected_positions if return_matched_actual \
        else 4 + return_expected_positions
    if not bool(ok):
        return (None,) * none_count

    expected_positions = np.asarray(project_boxes(h, b1))

    l1_ids, l2_ids, key = labels_to_tensors(l1, l2)
    matched_expected = np.zeros(len(expected_positions), bool)
    matched_actual = np.zeros(len(b2), bool)

    for lbl in range(len(key)):
        exp_sel = l1_ids == lbl
        rev_exp = np.where(exp_sel)[0]
        if len(rev_exp) == 0:
            continue
        act_sel = l2_ids == lbl
        rev_act = np.where(act_sel)[0]
        if len(rev_act) == 0:
            continue
        ious = np.asarray(pairwise_iou(expected_positions[exp_sel],
                                       b2[act_sel]))
        used = np.zeros(len(rev_act), bool)
        order = np.argsort(-ious, axis=1, kind="stable")
        # NOTE: like the reference (planograms.py:226-232), an expected box
        # consumes EVERY not-yet-used actual above the IoU threshold, not
        # just the first — kept for behavioral parity.
        for i in range(len(rev_exp)):
            for j in order[i]:
                if ious[i, j] < iou_threshold:
                    break
                if used[j]:
                    continue
                used[j] = True
                matched_expected[rev_exp[i]] = True
                matched_actual[rev_act[j]] = True

    missing = np.where(~matched_expected)[0]
    missing_positions = expected_positions[missing]
    missing_labels = tensors_to_labels(key, l1_ids[missing])[0]

    if return_expected_positions and return_matched_actual:
        return (matched_expected, matched_actual, expected_positions,
                missing, missing_positions, missing_labels)
    if return_expected_positions:
        return (matched_expected, expected_positions, missing,
                missing_positions, missing_labels)
    if return_matched_actual:
        return (matched_expected, matched_actual, missing,
                missing_positions, missing_labels)
    return matched_expected, missing, missing_positions, missing_labels
