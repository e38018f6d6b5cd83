"""STR-packed static R-tree over bboxes (numpy, build-once query-many).

Built once per actor in __init__ (the warm per-cell index of the
north-star design) and queried per batch.  Bulk-loaded with the
Sort-Tile-Recursive packing: sort by x, slice into vertical strips,
sort each strip by y, pack leaves of size B, then build parent levels
bottom-up.  Queries walk levels with vectorized bbox-overlap masks.
"""

from __future__ import annotations

import numpy as np


class STRtree:
    def __init__(self, minx, miny, maxx, maxy, leaf_size: int = 16):
        self.n = n = len(minx)
        boxes = np.stack(
            [
                np.asarray(minx, dtype=np.float64),
                np.asarray(miny, dtype=np.float64),
                np.asarray(maxx, dtype=np.float64),
                np.asarray(maxy, dtype=np.float64),
            ],
            axis=1,
        )
        self.leaf_size = leaf_size
        if n == 0:
            self.order = np.empty(0, dtype=np.int64)
            self.levels = []
            return

        # STR packing order
        cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
        cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
        n_leaves = -(-n // leaf_size)
        n_strips = max(1, int(np.ceil(np.sqrt(n_leaves))))
        strip_cap = n_strips * leaf_size
        by_x = np.argsort(cx, kind="stable")
        order = np.empty(n, dtype=np.int64)
        pos = 0
        for s in range(0, n, strip_cap):
            strip = by_x[s : s + strip_cap]
            strip = strip[np.argsort(cy[strip], kind="stable")]
            order[pos : pos + len(strip)] = strip
            pos += len(strip)
        self.order = order
        leaf_boxes = boxes[order]

        # bottom-up level build: level[0] = leaf nodes (groups of leaf_size)
        self.levels = []  # each: (node_boxes (m,4), child_start indices)
        cur = leaf_boxes
        while True:
            m = -(-len(cur) // leaf_size)
            if m <= 1 and self.levels:
                break
            node = np.empty((m, 4))
            for j in range(m):
                seg = cur[j * leaf_size : (j + 1) * leaf_size]
                node[j, 0] = seg[:, 0].min()
                node[j, 1] = seg[:, 1].min()
                node[j, 2] = seg[:, 2].max()
                node[j, 3] = seg[:, 3].max()
            self.levels.append(node)
            cur = node
            if m == 1:
                break
        self.leaf_boxes = leaf_boxes

    @staticmethod
    def _overlap(boxes, qminx, qminy, qmaxx, qmaxy):
        return ~(
            (boxes[:, 0] > qmaxx)
            | (boxes[:, 2] < qminx)
            | (boxes[:, 1] > qmaxy)
            | (boxes[:, 3] < qminy)
        )

    def query(self, qminx, qminy, qmaxx, qmaxy) -> np.ndarray:
        """Indices (original ids) of boxes overlapping the query bbox."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64)
        B = self.leaf_size
        arangeB = np.arange(B, dtype=np.int64)
        # descend level stack top→bottom, expanding surviving nodes
        cand = np.arange(len(self.levels[-1]), dtype=np.int64)
        for li in range(len(self.levels) - 1, -1, -1):
            node = self.levels[li][cand]
            cand = cand[self._overlap(node, qminx, qminy, qmaxx, qmaxy)]
            children = (cand[:, None] * B + arangeB[None, :]).ravel()
            limit = len(self.levels[li - 1]) if li > 0 else self.n
            cand = children[children < limit]
        lb = self.leaf_boxes[cand]
        hit = self._overlap(lb, qminx, qminy, qmaxx, qmaxy)
        return self.order[cand[hit]]

    def query_many(self, qminx, qminy, qmaxx, qmaxy):
        """Batched probe: one vectorized descent for a whole batch of
        query boxes.  Returns ``(row, cand)`` int64 arrays such that
        box ``cand[i]`` overlaps query ``row[i]``; pairs are sorted by
        (row, cand) — identical to calling :meth:`query` per row and
        ``np.sort``-ing each result, with zero per-row Python."""
        qminx = np.asarray(qminx, dtype=np.float64)
        qminy = np.asarray(qminy, dtype=np.float64)
        qmaxx = np.asarray(qmaxx, dtype=np.float64)
        qmaxy = np.asarray(qmaxy, dtype=np.float64)
        nq = len(qminx)
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        if self.n == 0 or nq == 0:
            return empty
        B = self.leaf_size
        arangeB = np.arange(B, dtype=np.int64)
        top = len(self.levels[-1])
        # live (query, node) pairs; the top level is ≤ leaf_size nodes
        q = np.repeat(np.arange(nq, dtype=np.int64), top)
        node = np.tile(np.arange(top, dtype=np.int64), nq)
        for li in range(len(self.levels) - 1, -1, -1):
            nb = self.levels[li][node]
            keep = self._overlap(nb, qminx[q], qminy[q], qmaxx[q], qmaxy[q])
            q, node = q[keep], node[keep]
            if not len(q):
                return empty
            children = node[:, None] * B + arangeB[None, :]
            limit = len(self.levels[li - 1]) if li > 0 else self.n
            valid = children < limit
            q = np.repeat(q, valid.sum(axis=1))
            node = children[valid]
        lb = self.leaf_boxes[node]
        hit = self._overlap(lb, qminx[q], qminy[q], qmaxx[q], qmaxy[q])
        q, cand = q[hit], self.order[node[hit]]
        o = np.lexsort((cand, q))
        return q[o], cand[o]
