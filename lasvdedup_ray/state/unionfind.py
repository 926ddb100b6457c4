"""Connected components over the verified edge list.

Semantics conformance target: the reference's single-linkage transitive
closure ``cluster_sequences`` (``lasvdedup/utils/sequence_grouping.py:89-118``
— connected components of the <=-threshold graph, boundary d==tau joins,
pinned by ``tests/utils/test_sequence_grouping.py:247-327``).

Two execution paths:

- **Driver DSU** (default below ``dsu_edge_limit`` edges): edges are already
  the *verified near-dup* pairs — a tiny fraction of corpus rows — so they
  stream to the driver via ``iter_batches`` into a union-find with path
  compression.  O(E α(E)) and exact.
- **Distributed min-label propagation** (the scale path): alternate
  (1) neighbor-min rounds — join edge endpoints to current labels,
  ``groupby(node).min(label)`` — with (2) pointer-jumping rounds
  (``label = label[label]``, halving chain depth), until a round changes
  nothing.  Only (id, label) pairs shuffle; converges in O(log d) rounds
  with jumping (cf. large-star/small-star, Kiveris et al., SoCC 2014).

Cluster labels are the lexicographic-minimum member id — value-based and
deterministic regardless of Ray block order (the reference relies on dict
insertion order, ``sequence_grouping.py:99-101``; we pin a total order
instead, per SURVEY §7 "determinism without row order").
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Min


# worker-process-level cache for the broadcast label map (module global:
# survives across tasks within a worker)
_WORKER_LABEL_CACHE: Dict = {}


def strict_project(ds: ray.data.Dataset, cols: List[str]) -> ray.data.Dataset:
    """``select_columns`` that also projects EMPTY blocks.

    Ray 2.49's Project operator passes zero-row blocks through with their
    original (wider) schema, yielding mixed-schema bundles downstream —
    harmless for iter_batches but a crash hazard for Arrow joins and the
    source of "RefBundle with a different schema" warnings.  A map_batches
    projection runs on every block, empty or not."""

    def proj(t: pa.Table) -> pa.Table:
        return t.select(cols)

    return ds.map_batches(proj, batch_format="pyarrow")


def drop_empty_blocks(ds: ray.data.Dataset) -> Optional[ray.data.Dataset]:
    """Rebuild a MATERIALIZED dataset from its non-empty blocks only
    (block refs move, bytes don't).  Zero-row blocks — left behind by
    selective filters — ride through every downstream operator as
    schemaless RefBundles (mixed-schema warnings, wasted tasks); filters
    can't remove them because a map task with empty output still emits a
    bundle.  Returns None when every block is empty."""
    refs = []
    for rb in ds.iter_internal_ref_bundles():
        for bref, meta in zip(rb.block_refs, rb.metadata):
            # keep blocks with UNKNOWN row counts (num_rows is None) — only
            # a known-zero count may be dropped, else silent data loss if
            # Ray ever materializes metadata without counts (ADVICE r4)
            if meta.num_rows is None or meta.num_rows:
                refs.append(bref)
    if not refs:
        return None
    return ray.data.from_arrow_refs(refs)


class DSU:
    """Union-find with path compression + union by rank; roots resolve to
    the lexicographically smallest member id at finalize time."""

    def __init__(self) -> None:
        self.parent: Dict[str, str] = {}
        self.rank: Dict[str, int] = {}

    def find(self, x: str) -> str:
        p = self.parent
        if x not in p:
            p[x] = x
            self.rank[x] = 0
            return x
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:
            p[x], x = root, p[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.rank[ra] < self.rank[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        if self.rank[ra] == self.rank[rb]:
            self.rank[ra] += 1

    def labels(self) -> Dict[str, str]:
        """node -> min-member-id of its component."""
        min_of_root: Dict[str, str] = {}
        for x in self.parent:
            r = self.find(x)
            if r not in min_of_root or x < min_of_root[r]:
                min_of_root[r] = x
        return {x: min_of_root[self.find(x)] for x in self.parent}


def components_driver(edges: ray.data.Dataset) -> Dict[str, str]:
    """Stream (id_a, id_b) batches to a driver DSU; returns node -> label."""
    dsu = DSU()
    for batch in strict_project(edges, ["id_a", "id_b"]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        for a, b in zip(batch["id_a"].to_pylist(), batch["id_b"].to_pylist()):
            dsu.union(a, b)
    return dsu.labels()


def _label_table(ids: List[str], labels: List[str]) -> pa.Table:
    return pa.table(
        {"id": pa.array(ids, pa.string()), "cluster_id": pa.array(labels, pa.string())}
    )


def components_distributed(
    edges: ray.data.Dataset,
    max_rounds: int = 50,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Min-label propagation entirely in Ray Data; returns (id, cluster_id)
    for every node that appears in an edge.

    Each round: labels of both endpoints flow across edges (two hash joins),
    then ``groupby(id).min(label)``; a pointer-jumping self-join follows.
    Terminates when a neighbor round leaves every label unchanged.
    """
    e = strict_project(edges, ["id_a", "id_b"]).materialize()
    # symmetric edge view: (src, dst)
    sym = e.map_batches(
        lambda t: pa.table(
            {
                "src": pa.chunked_array([t["id_a"].combine_chunks(), t["id_b"].combine_chunks()]),
                "dst": pa.chunked_array([t["id_b"].combine_chunks(), t["id_a"].combine_chunks()]),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    from ray.data.aggregate import Count

    nodes = (
        sym.select_columns(["src"])
        .groupby("src")
        .aggregate(Count(alias_name="_c"))  # distinct src values
        .select_columns(["src"])
        .map_batches(
            lambda t: pa.table({"id": t["src"], "label": t["src"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    labels = nodes

    for _ in range(max_rounds):
        # neighbor-min: label(dst) candidates for src
        nb = sym.join(
            labels.map_batches(
                lambda t: pa.table({"dst": t["id"], "nlabel": t["label"]}),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("dst",),
        ).map_batches(
            lambda t: pa.table({"id": t["src"], "label": t["nlabel"]}),
            batch_format="pyarrow",
        )
        cand = nb.union(labels.select_columns(["id", "label"]))
        new_labels = (
            cand.groupby("id").aggregate(Min("label", alias_name="label")).materialize()
        )
        # convergence: any label changed?
        joined = new_labels.join(
            labels.map_batches(
                lambda t: pa.table({"id": t["id"], "old": t["label"]}),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=num_partitions,
            on=("id",),
        )
        changed = joined.map_batches(
            lambda t: pa.table(
                {"c": pa.array([pc.sum(pc.cast(pc.not_equal(t["label"], t["old"]), pa.int64())).as_py() or 0], pa.int64())}
            ),
            batch_format="pyarrow",
        ).sum("c")
        labels = new_labels
        if not changed:
            break
        # pointer jumping: label <- label[label]
        lab_as_node = labels.map_batches(
            lambda t: pa.table({"lid": t["id"], "llabel": t["label"]}),
            batch_format="pyarrow",
        )
        jumped = labels.join(
            lab_as_node,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("label",),
            right_on=("lid",),
        ).map_batches(
            lambda t: pa.table(
                {
                    "id": t["id"],
                    "label": pc.coalesce(t["llabel"], t["label"]),
                }
            ),
            batch_format="pyarrow",
        )
        labels = jumped.materialize()

    return labels.map_batches(
        lambda t: pa.table({"id": t["id"], "cluster_id": t["label"]}),
        batch_format="pyarrow",
    )


def assign_clusters(
    nodes: ray.data.Dataset,
    edges: ray.data.Dataset,
    dsu_edge_limit: int = 2_000_000,
    max_rounds: int = 50,
    num_partitions: int = 32,
    force_distributed: bool = False,
) -> ray.data.Dataset:
    """Attach ``cluster_id`` (string, = min member id) to every node row.
    Nodes untouched by any edge become singleton clusters (cluster_id = id).
    """
    edges = edges.materialize()
    compacted = drop_empty_blocks(edges)
    n_edges = 0 if compacted is None else compacted.count()
    if compacted is not None:
        edges = compacted
    if not force_distributed and n_edges <= dsu_edge_limit:
        label_map = components_driver(edges) if n_edges else {}
        # ship as two Arrow string arrays, not a pickled dict: Arrow
        # buffers travel out-of-band through plasma (zero-copy), while a
        # dict unpickle materializes every key/value string per worker
        # (~1 s x workers at 400k entries); the worker rebuilds the dict
        # ONCE per process from the zero-copy arrays
        ref = ray.put(
            (
                pa.array(list(label_map.keys()), pa.string()),
                pa.array(list(label_map.values()), pa.string()),
            )
        )

        def attach(t: pa.Table) -> pa.Table:
            if ref not in _WORKER_LABEL_CACHE:
                _WORKER_LABEL_CACHE.clear()
                keys_arr, vals_arr = ray.get(ref)
                _WORKER_LABEL_CACHE[ref] = dict(
                    zip(keys_arr.to_pylist(), vals_arr.to_pylist())
                )
            lm = _WORKER_LABEL_CACHE[ref]
            ids = t["id"].to_pylist()
            return t.append_column(
                "cluster_id", pa.array([lm.get(i, i) for i in ids], pa.string())
            )

        return nodes.map_batches(attach, batch_format="pyarrow", batch_size=8192)

    labels = components_distributed(edges, max_rounds, num_partitions).materialize()
    joined = nodes.join(
        labels,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("id",),
    )
    return joined.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("cluster_id"),
            "cluster_id",
            pc.coalesce(t["cluster_id"], t["id"]),
        ),
        batch_format="pyarrow",
    )
