"""Planogram adapters + planogram test sets.

`read_tonioni_planogram` reproduces cvpce/planogram_adapters.py:17-122: the
GP-180 planogram JSON is a grid graph (nodes with n/s/e/w neighbor indices
and `ogg` product refs); N/S edges are flipped into detector coordinates,
west-edge rows and south-edge cols are walked, and row-y/col-x coordinates
are solved iteratively from product widths/heights, yielding concrete
boxes, labels, and an nx.DiGraph.
"""
from __future__ import annotations

import json
from os import path
from typing import Dict, List

import networkx as nx
import numpy as np

from . import transforms as T
from .grocery import GroceryProductsTestSet


def _flip_ns(direction: str) -> str:
    d = direction.upper()
    if "N" in d:
        return d.replace("N", "S")
    if "S" in d:
        return d.replace("S", "N")
    return d


def read_tonioni_planogram(planogram_path: str):
    """Returns (boxes (N, 4) float32, labels list[str], nx.DiGraph)."""
    with open(planogram_path, "r") as f:
        plano = json.load(f)

    def obj(node):
        return plano["objects"][g.nodes[node]["ogg"]]

    g = nx.DiGraph()
    western, southern = set(), set()
    for i, entry in enumerate(plano["graph"]):
        g.add_node(i, ogg=entry["ogg"])
        g.add_edges_from(
            (i, j, {"dir": _flip_ns(k)})
            for k, j in entry.items() if k != "ogg" and j >= 0
        )
        if entry["w"] == -1:
            western.add(i)
        if entry["n"] == -1:  # flipped: these become southern edge nodes
            southern.add(i)

    rows = {w: [] for w in western}
    cols = {s: [] for s in southern}
    for start, row in rows.items():
        nxt = [start]
        prev = -1
        while nxt:
            if len(nxt) > 1:
                raise RuntimeError(
                    f"Multiple nodes east from {prev}: {nxt} "
                    f"(file: {planogram_path})")
            cur = nxt[0]
            g.nodes[cur]["row"] = start
            row.append(cur)
            prev = cur
            nxt = [e for e in g[cur] if g[cur][e]["dir"] == "E"]
    for start, col in cols.items():
        nxt = [start]
        prev = -1
        while nxt:
            if len(nxt) > 1:
                raise RuntimeError(
                    f"Multiple nodes north from {prev}: {nxt} "
                    f"(file: {planogram_path})")
            cur = nxt[0]
            g.nodes[cur]["col"] = start
            col.append(cur)
            prev = cur
            nxt = [n for n in g[cur] if g[cur][n]["dir"] == "N"]

    row_y = {w: float("-inf") for w in rows}
    col_x = {s: float("-inf") for s in cols}
    for row in rows.values():
        baseline = 0.0
        x = 0.0
        for p in row:
            col = g.nodes[p]["col"]
            if col_x[col] > float("-inf"):
                baseline = col_x[col] - x
                break
            x += obj(p)["width"]
        x = baseline
        for p in row:
            col = g.nodes[p]["col"]
            col_x[col] = max(x, col_x[col])
            x += obj(p)["width"]
    for col in cols.values():
        baseline = 0.0
        y = 0.0
        for p in col:
            row = g.nodes[p]["row"]
            if row_y[row] > float("-inf"):
                baseline = row_y[row] - y
                break
            y += obj(p)["height"]
        y = baseline
        for p in col:
            row = g.nodes[p]["row"]
            row_y[row] = max(y, row_y[row])
            y += obj(p)["height"]

    # second pass: push overlapping columns/rows apart
    for row in rows.values():
        x = col_x[g.nodes[row[0]]["col"]] + obj(row[0])["width"]
        for p in row[1:]:
            col = g.nodes[p]["col"]
            if x > col_x[col]:
                col_x[col] = x
            else:
                x = col_x[col]
            x += obj(p)["width"]
    for col in cols.values():
        y = row_y[g.nodes[col[0]]["row"]] + obj(col[0])["height"]
        for p in col[1:]:
            row = g.nodes[p]["row"]
            if y > row_y[row]:
                row_y[row] = y
            else:
                y = row_y[row]
            y += obj(p)["height"]

    n_nodes = len(plano["graph"])
    boxes = np.zeros((n_nodes, 4), np.float32)
    for i in range(n_nodes):
        o = obj(i)
        x1 = col_x[g.nodes[i]["col"]]
        y2 = row_y[g.nodes[i]["row"]]
        boxes[i] = [x1, y2 - o["height"], x1 + o["width"], y2]
    for i in g:
        label = obj(i)["img_path"].split(".")[0]
        del g.nodes[i]["row"], g.nodes[i]["col"], g.nodes[i]["ogg"]
        g.nodes[i]["label"] = label
    labels = [g.nodes[i]["label"] for i in range(n_nodes)]

    return boxes, labels, g


class PlanogramTestSet(GroceryProductsTestSet):
    """GP-180 test images + parsed Tonioni planograms; GP planograms are
    fully compliant so actual_accuracy = 1.0 (cvpce/datautils.py:697-713)."""

    def __init__(self, image_dir, ann_dir, plano_dir, only=None, skip=None):
        self.plano_dir = plano_dir
        super().__init__(image_dir, ann_dir, only, skip)

    def _build_index(self, ann_dir, only, skip):
        index = super()._build_index(ann_dir, only, skip)
        for entry in index:
            s, i = entry["id"]
            boxes, labels, g = read_tonioni_planogram(
                path.join(self.plano_dir, f"s{s}_{i}.json"))
            entry["plano"] = {
                "boxes": boxes, "labels": labels, "graph": g,
                "actual_accuracy": 1.0,
            }
        return index

    def __getitem__(self, i: int):
        img, anns, boxes = super().__getitem__(i)
        return img, anns, boxes, self.index[i]["plano"]


class InternalPlanoSet:
    """index.json + per-image planogram JSON with code/box entries;
    y-flipped to detector coords; ground-truth accuracy = correct/facings
    (cvpce/datautils.py:715-750)."""

    def __init__(self, root: str):
        self.index = self._build_index(root)

    @staticmethod
    def _build_index(root: str) -> List[Dict]:
        with open(path.join(root, "index.json"), "r") as f:
            index = json.load(f)
        res = []
        for obj in index:
            with open(path.join(root, obj["planogram"]), "r") as f:
                plano = json.load(f)
            anns = [e["code"] for e in plano]
            boxes = np.asarray([e["box"] for e in plano], np.float32)
            maxy = boxes[:, 3].max()
            tmp = maxy - boxes[:, 3]
            boxes[:, 3] = maxy - boxes[:, 1]
            boxes[:, 1] = tmp
            res.append({
                "img": path.join(root, obj["image"]),
                "anns": anns,
                "boxes": boxes,
                "actual_accuracy": obj["correct"] / obj["facings"],
            })
        return res

    def __len__(self):
        return len(self.index)

    def __getitem__(self, i: int):
        e = self.index[i]
        img = T.load_image(e["img"])
        return img, {"labels": e["anns"], "boxes": e["boxes"],
                     "actual_accuracy": e["actual_accuracy"]}
