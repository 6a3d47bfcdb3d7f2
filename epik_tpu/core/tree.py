"""Phylogenetic tree with post-order indexing and newick I/O.

Re-provides the reference's ``i2l::phylo_tree`` / ``i2l::io::parse_newick`` /
``i2l::io::to_newick`` contract (reference: epik/src/epik/main.cpp:294-297
loads the newick string embedded in the database, re-serializes it with
jplace-style edge numbers; epik/src/epik/place.cpp:99-125 walks nodes by
post-order id to precompute pendant lengths).

Design notes
------------
* Nodes are stored in **post-order** (children before parent, children in
  input order).  The post-order id doubles as the jplace ``edge_num``
  (reference: epik/src/epik/jplace.cpp:130 writes the branch id returned by
  the database search, which is a post-order id, see place.cpp:99-103).
* Branch lengths and subtree statistics are kept as flat numpy arrays so the
  engine can gather them per placement without touching node objects.
* ``subtree_num_nodes`` / ``subtree_total_length`` reproduce the database's
  ``tree_index()`` records (reference: place.cpp:113-114).  [inference: the
  i2l submodule is empty; from the guard ``num_subtree_nodes > 1`` and the
  comment "excluding the branch with this post-order id" (place.cpp:116-121)
  we define num_nodes = #nodes in the subtree *including* self and
  total_length = sum of branch lengths in the subtree *excluding* self's own
  branch, which makes leaves hit the guard and get mean 0.]
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["PhyloNode", "PhyloTree", "parse_newick", "to_newick"]


@dataclasses.dataclass
class PhyloNode:
    postorder_id: int
    name: str
    branch_length: float | None
    parent: int | None
    children: list[int]

    @property
    def is_leaf(self) -> bool:
        return not self.children


def _format_length(x: float) -> str:
    """Shortest round-trip decimal for a branch length (Grisu-style, like
    rapidjson / python repr)."""
    return repr(float(x))


class PhyloTree:
    """Immutable rooted tree addressed by post-order node id."""

    def __init__(self, nodes: list[PhyloNode], root: int):
        self.nodes = nodes
        self.root = root
        n = len(nodes)
        self.branch_lengths = np.zeros(n, dtype=np.float64)
        for node in nodes:
            self.branch_lengths[node.postorder_id] = node.branch_length or 0.0
        self._tree_index: tuple[np.ndarray, np.ndarray] | None = None

    # -- i2l::phylo_tree surface ------------------------------------------------

    def get_node_count(self) -> int:
        """reference: place.cpp:92-95,166 uses this as the score-array width."""
        return len(self.nodes)

    def get_by_postorder_id(self, i: int) -> PhyloNode:
        """reference: place.cpp:103,429."""
        if not (0 <= i < len(self.nodes)):
            raise KeyError(f"Could not find node by post-order id: {i}")
        return self.nodes[i]

    # -- tree_index (reference: db.tree_index(), place.cpp:113-114) -------------

    def tree_index(self) -> tuple[np.ndarray, np.ndarray]:
        """Per-post-order-node ``(subtree_num_nodes, subtree_total_length)``."""
        if self._tree_index is None:
            n = len(self.nodes)
            num = np.ones(n, dtype=np.int64)
            tot = np.zeros(n, dtype=np.float64)
            for node in self.nodes:  # post-order: children already final
                for c in node.children:
                    num[node.postorder_id] += num[c]
                    tot[node.postorder_id] += tot[c] + self.branch_lengths[c]
            self._tree_index = (num, tot)
        return self._tree_index

    def leaves(self) -> list[PhyloNode]:
        return [n for n in self.nodes if n.is_leaf]

    def __len__(self) -> int:
        return len(self.nodes)


def parse_newick(text: str) -> PhyloTree:
    """Parse a newick string (optionally with jplace ``{edge}`` annotations).

    reference surface: ``i2l::io::parse_newick`` (main.cpp:294).  Supports
    unquoted and single-quoted labels, branch lengths, and ignores bracketed
    comments and ``{N}`` edge annotations.
    """
    s = text.strip()
    if s.endswith(";"):
        s = s[:-1]
    nodes: list[PhyloNode] = []
    pos = 0
    n_chars = len(s)

    def skip_ws(p: int) -> int:
        while p < n_chars and s[p].isspace():
            p += 1
        return p

    def parse_label(p: int) -> tuple[str, int]:
        p = skip_ws(p)
        if p < n_chars and s[p] == "'":
            q = p + 1
            out = []
            while q < n_chars:
                if s[q] == "'":
                    if q + 1 < n_chars and s[q + 1] == "'":
                        out.append("'")
                        q += 2
                        continue
                    q += 1
                    break
                out.append(s[q])
                q += 1
            return "".join(out), q
        q = p
        while q < n_chars and s[q] not in ",():;{[":
            q += 1
        return s[p:q].strip(), q

    def parse_suffix(p: int, children: list[int]) -> tuple[int, int]:
        """Parse ``label[:length][{edge}][comment]`` and materialize a node."""
        name, p = parse_label(p)
        branch_length = None
        p = skip_ws(p)
        if p < n_chars and s[p] == ":":
            q = p + 1
            r = q
            while r < n_chars and s[r] not in ",(){;[":
                r += 1
            branch_length = float(s[q:r].strip())
            p = r
        # jplace edge annotation {N} -- parsed and discarded (ids are
        # recomputed as post-order; the reference emits them that way too).
        p = skip_ws(p)
        if p < n_chars and s[p] == "{":
            r = s.index("}", p)
            p = r + 1
        # bracketed comment
        p = skip_ws(p)
        if p < n_chars and s[p] == "[":
            r = s.index("]", p)
            p = r + 1
        my_id = len(nodes)
        nodes.append(PhyloNode(my_id, name, branch_length, None, children))
        for c in children:
            nodes[c].parent = my_id
        return my_id, p

    # Iterative descent (10k-taxa caterpillar trees overflow Python recursion).
    # `stack` holds the child lists of currently-open '(' groups.
    stack: list[list[int]] = []
    p = skip_ws(pos)
    root = -1
    while True:
        if p < n_chars and s[p] == "(":
            stack.append([])
            p = skip_ws(p + 1)
            continue
        # a leaf (or the suffix of a just-closed group handled below)
        node_id, p = parse_suffix(p, [])
        while True:
            p = skip_ws(p)
            if not stack:
                root = node_id
                break
            stack[-1].append(node_id)
            if p < n_chars and s[p] == ",":
                p = skip_ws(p + 1)
                break
            if p < n_chars and s[p] == ")":
                children = stack.pop()
                node_id, p = parse_suffix(p + 1, children)
                continue
            raise ValueError(f"newick parse error at offset {p}: {s[max(0,p-20):p+20]!r}")
        if root >= 0:
            break
    pos = p
    pos = skip_ws(pos)
    if pos != n_chars:
        raise ValueError(f"trailing characters in newick at offset {pos}: {s[pos:pos+30]!r}")
    return PhyloTree(nodes, root)


def to_newick(tree: PhyloTree, jplace_edges: bool = False) -> str:
    """Serialize; with ``jplace_edges`` append ``{postorder_id}`` per node.

    reference surface: ``i2l::io::to_newick(tree, true)`` (main.cpp:297)
    produces the canonical tree string written into the jplace ``"tree"``
    field.  [inference: the bool selects jplace-style edge annotations,
    required by jplace v3.]
    """
    parts: list[str] = []

    def emit_suffix(node: PhyloNode) -> None:
        if node.name:
            parts.append(node.name)
        if node.branch_length is not None:
            parts.append(":" + _format_length(node.branch_length))
        if jplace_edges:
            parts.append("{%d}" % node.postorder_id)

    # Iterative pre/post traversal (deep trees overflow Python recursion).
    # Work items: ("open", id) to visit, ("close", id) to emit the suffix,
    # ("text", s) for separators.
    work: list[tuple[str, object]] = [("open", tree.root)]
    while work:
        kind, payload = work.pop()
        if kind == "text":
            parts.append(payload)  # type: ignore[arg-type]
            continue
        node = tree.nodes[payload]  # type: ignore[index]
        if kind == "close":
            emit_suffix(node)
            continue
        if node.children:
            parts.append("(")
            work.append(("close", node.postorder_id))
            work.append(("text", ")"))
            for j, c in enumerate(reversed(node.children)):
                work.append(("open", c))
                if j != len(node.children) - 1:
                    work.append(("text", ","))
        else:
            emit_suffix(node)
    parts.append(";")
    return "".join(parts)
