"""Numpy golden oracle: an independent, recursive re-implementation of the
reference kernels' exact semantics, used only by tests/benchmark validation.

Mirrors, per-node and control-flow-faithfully:
- quadtree_grid stop rule + recursion bboxes (cuda/create_grid.cu:31-35,147-155)
- categorize_points ``<=`` digit rule (cuda/kernels.cu:54-78)
- prepare_boundaries id scheme + DFS order (cuda/kernels.cu:517-537)
- quadrant_search inclusive containment + max-id winner, -1 default
  (cuda/kernels.cu:142-162)
- the point-membership check of the inference driver (cuda/inference.cu:126-137)

All coordinates are float32, as in the CUDA path. The engine
(operators/quadtree.py) is a completely different, level-synchronous
DataFrame algorithm — tests assert the two agree.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import DOMAIN, MAX_DEPTH, MIN_DISTANCE, MIN_POINTS

F32 = np.float32


@dataclass
class Node:
    x1: np.float32
    y1: np.float32
    x2: np.float32
    y2: np.float32
    count: int
    depth: int
    point_idx: np.ndarray  # indices into the input point arrays (subtree points)
    children: list | None = None  # [BL, BR, TL, TR] or None for leaf
    cell_id: int = 0
    rows: list = field(default_factory=list)


def build_quadtree(
    x: np.ndarray,
    y: np.ndarray,
    domain=DOMAIN,
    min_points: int = MIN_POINTS,
    min_distance: float = MIN_DISTANCE,
    max_depth: int = MAX_DEPTH,
) -> Node:
    x = np.asarray(x, dtype=F32)
    y = np.asarray(y, dtype=F32)

    def rec(idx: np.ndarray, x1, y1, x2, y2, depth) -> Node:
        n = int(idx.shape[0])
        node = Node(x1, y1, x2, y2, n, depth, idx)
        if (
            n < min_points
            or (abs(x1 - x2) < min_distance and abs(y1 - y2) < min_distance)
            or depth >= max_depth
        ):
            return node
        mx = F32((x2 + x1) / F32(2))
        my = F32((y2 + y1) / F32(2))
        px, py = x[idx], y[idx]
        bl = idx[(px <= mx) & (py <= my)]
        br = idx[(px > mx) & (py <= my)]
        tl = idx[(px <= mx) & (py > my)]
        tr = idx[(px > mx) & (py > my)]
        node.children = [
            rec(bl, x1, y1, mx, my, depth + 1),
            rec(br, mx, y1, x2, my, depth + 1),
            rec(tl, x1, my, mx, y2, depth + 1),
            rec(tr, mx, my, x2, y2, depth + 1),
        ]
        return node

    return rec(
        np.arange(x.shape[0], dtype=np.int64),
        F32(domain[0]),
        F32(domain[1]),
        F32(domain[2]),
        F32(domain[3]),
        0,
    )


def assign_ids(root: Node) -> None:
    """prepare_boundaries id assignment: DFS, child = id*4 + {1,2,3,4}."""

    def rec(node: Node, cid: int) -> None:
        node.cell_id = cid
        if node.children:
            for k, ch in enumerate(node.children):
                rec(ch, cid * 4 + k + 1)

    rec(root, 0)


def cells_relation(root: Node) -> list[dict]:
    """The tree flattened to rows (every node, interior AND empty leaves)."""
    assign_ids(root)
    rows: list[dict] = []

    def rec(node: Node) -> None:
        rows.append(
            dict(
                cell_id=node.cell_id,
                depth=node.depth,
                min_x=float(node.x1),
                min_y=float(node.y1),
                max_x=float(node.x2),
                max_y=float(node.y2),
                count=node.count,
                is_leaf=node.children is None,
            )
        )
        if node.children:
            for ch in node.children:
                rec(ch)

    rec(root)
    return rows


def boundaries_array(root: Node) -> np.ndarray:
    """(n_cells, 5): id, x1, y1, x2, y2 — the QuadrantBoundary relation."""
    rows = cells_relation(root)
    return np.array(
        [[r["cell_id"], r["min_x"], r["min_y"], r["max_x"], r["max_y"]] for r in rows],
        dtype=np.float64,
    )


def quadrant_search(qx: np.ndarray, qy: np.ndarray, bnds: np.ndarray) -> np.ndarray:
    """max containing id per query (inclusive bbox), -1 if none."""
    qx = np.asarray(qx, dtype=F32).astype(np.float64)
    qy = np.asarray(qy, dtype=F32).astype(np.float64)
    ids = bnds[:, 0].astype(np.int64)
    contains = (
        (qx[:, None] >= bnds[None, :, 1])
        & (qx[:, None] <= bnds[None, :, 3])
        & (qy[:, None] >= bnds[None, :, 2])
        & (qy[:, None] <= bnds[None, :, 4])
    )
    masked = np.where(contains, ids[None, :], np.int64(-1))
    return masked.max(axis=1) if bnds.shape[0] else np.full(qx.shape[0], -1, np.int64)


def point_membership(
    root: Node,
    x: np.ndarray,
    y: np.ndarray,
    qx: np.ndarray,
    qy: np.ndarray,
    found_ids: np.ndarray,
) -> np.ndarray:
    """inference.cu:126-137 — does the found quadrant's own point array hold
    the exact query point?"""
    assign_ids(root)
    by_id: dict[int, Node] = {}

    def rec(node: Node) -> None:
        by_id[node.cell_id] = node
        if node.children:
            for ch in node.children:
                rec(ch)

    rec(root)
    x = np.asarray(x, dtype=F32)
    y = np.asarray(y, dtype=F32)
    out = np.zeros(qx.shape[0], dtype=bool)
    for i, fid in enumerate(found_ids):
        if fid < 0 or int(fid) not in by_id:
            continue
        node = by_id[int(fid)]
        idx = node.point_idx
        out[i] = bool(np.any((x[idx] == F32(qx[i])) & (y[idx] == F32(qy[i]))))
    return out


def ray_cast_pip(px: np.ndarray, py: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Boundary-inclusive even-odd point-in-polygon, scalar per point (the
    slow-but-obvious golden form; the engine kernel is batch-vectorized)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    out = np.zeros(px.shape[0], dtype=bool)
    k = poly.shape[0]
    for j in range(px.shape[0]):
        x, y = px[j], py[j]
        inside = False
        on_edge = False
        for i in range(k):
            x1, y1 = poly[i]
            x2, y2 = poly[(i + 1) % k]
            if (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1) == 0.0 and (
                min(x1, x2) <= x <= max(x1, x2) and min(y1, y2) <= y <= max(y1, y2)
            ):
                on_edge = True
            if (y1 > y) != (y2 > y):
                xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
                if x < xint:
                    inside = not inside
        out[j] = inside or on_edge
    return out
