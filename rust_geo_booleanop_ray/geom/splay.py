"""Comparator-based splay set — faithful port of the reference's vendored
splay tree (reference lib/src/splay/tree.rs, set.rs; adapted from
splay-rs, itself the classic Sleator–Tarjan top-down splay).

The sweep-line status structure is order-sensitive in degenerate inputs
(duplicate / overlapping segments compare asymmetrically), and the
reference's ``next``/``prev`` are comparator-guided walks performed after
splaying the query key to the root — their results for tied keys depend
on the exact splay restructuring.  Bit-for-bit output parity therefore
requires this exact structure, not just any ordered set.

Keys are compared with a ``cmp(a, b) -> int`` comparator; equality
(cmp == 0) only for identical objects (matching the reference, where
compare_segments returns Equal only on Rc::ptr_eq).
"""

from __future__ import annotations


class _Node:
    __slots__ = ("key", "left", "right")

    def __init__(self, key, left=None, right=None):
        self.key = key
        self.left = left
        self.right = right


class SplaySet:
    __slots__ = ("cmp", "root", "size", "_header")

    def __init__(self, comparator):
        self.cmp = comparator
        self.root: _Node | None = None
        self.size = 0
        # scratch node reused by every _splay (avoids one allocation per
        # splay — ~8 splays per sweep-line op make this measurable)
        self._header = _Node(None)

    def __len__(self):
        return self.size

    def _splay(self, key) -> None:
        """Classic top-down splay (reference tree.rs:395-473): brings `key`
        (or the closest visited node) to the root."""
        t = self.root
        if t is None:
            return
        cmp = self.cmp
        header = self._header
        header.left = header.right = None
        l = header  # tail of the assembled left tree (hangs on .right)
        r = header  # tail of the assembled right tree (hangs on .left)
        while True:
            c = cmp(key, t.key)
            if c == 0:
                break
            if c < 0:
                if t.left is None:
                    break
                if cmp(key, t.left.key) < 0:
                    # rotate right
                    y = t.left
                    t.left = y.right
                    y.right = t
                    t = y
                    if t.left is None:
                        break
                # link right
                r.left = t
                r = t
                t = t.left
            else:
                if t.right is None:
                    break
                if cmp(key, t.right.key) > 0:
                    # rotate left
                    y = t.right
                    t.right = y.left
                    y.left = t
                    t = y
                    if t.right is None:
                        break
                # link left
                l.right = t
                l = t
                t = t.right
        # assemble
        l.right = t.left
        r.left = t.right
        t.left = header.right
        t.right = header.left
        self.root = t

    def insert(self, key) -> bool:
        # reference tree.rs:152-183
        if self.root is None:
            self.root = _Node(key)
            self.size += 1
            return True
        self._splay(key)
        root = self.root
        c = self.cmp(key, root.key)
        if c == 0:
            return False  # value replace in the reference; keys are identical objects
        if c < 0:
            new = _Node(key, left=root.left, right=root)
            root.left = None
        else:
            new = _Node(key, left=root, right=root.right)
            root.right = None
        self.root = new
        self.size += 1
        return True

    def remove(self, key) -> bool:
        # reference tree.rs:185-210
        if self.root is None:
            return False
        self._splay(key)
        if self.cmp(key, self.root.key) != 0:
            return False
        old = self.root
        if old.left is None:
            self.root = old.right
        else:
            right = old.right
            self.root = old.left
            self._splay(key)  # splays max of left subtree to its root
            self.root.right = right
        self.size -= 1
        return True

    def find(self, key):
        """The stored key equal to ``key`` (identity under cmp==0), or
        None (reference set.rs find → tree.rs find_key)."""
        if self.root is None:
            return None
        self._splay(key)
        if self.cmp(key, self.root.key) == 0:
            return self.root.key
        return None

    def contains(self, key) -> bool:
        # reference tree.rs:41-43 (via find_key, which splays)
        if self.root is None:
            return False
        self._splay(key)
        return self.cmp(key, self.root.key) == 0

    def next(self, key):
        # reference tree.rs:92-120: splay, then comparator-guided walk
        if self.root is None:
            return None
        self._splay(key)
        node = self.root
        cmp = self.cmp
        successor = None
        while True:
            if cmp(key, node.key) < 0:
                successor = node.key
                if node.left is None:
                    break
                node = node.left
            else:
                if node.right is None:
                    break
                node = node.right
        return successor

    def prev(self, key):
        # reference tree.rs:122-150
        if self.root is None:
            return None
        self._splay(key)
        node = self.root
        cmp = self.cmp
        predecessor = None
        while True:
            if cmp(key, node.key) > 0:
                predecessor = node.key
                if node.right is None:
                    break
                node = node.right
            else:
                if node.left is None:
                    break
                node = node.left
        return predecessor

    def min(self):
        node = self.root
        if node is None:
            return None
        while node.left is not None:
            node = node.left
        return node.key

    def max(self):
        node = self.root
        if node is None:
            return None
        while node.right is not None:
            node = node.right
        return node.key
