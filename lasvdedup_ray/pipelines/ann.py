"""Similarity search over the ``embeddings`` table (list<float> column).

- ``embedding_topk``: brute-force cosine top-k — numpy matmul per batch
  against a broadcast query matrix (``ray.put`` once, read per actor/task),
  per-batch partial top-k, tiny final merge.  The baseline the SQL oracle
  can check exactly.
- ``embedding_neardup_pairs``: exact cosine near-dup pair join via block
  matmul against the broadcast matrix (SQL-checkable).
- ``embedding_neardup_lsh``: the scale path — random-hyperplane LSH
  buckets + in-bucket verification; probabilistic recall, rows-only check.

Cosines are rounded to 6 decimals on BOTH sides (numpy and DuckDB differ
in low-order bits), and every ordering has a vec_id tie-break.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Min


def _q6(x: np.ndarray) -> np.ndarray:
    """Quantize to micro-units, rounding half away from zero (= DuckDB
    round; np.round is half-to-even)."""
    s = x * 1e6
    return np.where(s >= 0, np.floor(s + 0.5), np.ceil(s - 0.5)).astype(np.int64)


def _load_matrix(sf_dir: str) -> Tuple[np.ndarray, np.ndarray]:
    """(ids, L2-normalized matrix) — the broadcast side."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, mat / norms


def embedding_topk(sf_dir: str, n_queries: int = 5, k: int = 5) -> ray.data.Dataset:
    """For each of the ``n_queries`` lowest vec_ids: top-k most-similar
    other vectors by cosine (descending, vec_id tie-break)."""
    q_ids, q_mat_full = _load_matrix(sf_dir)
    order = np.argsort(q_ids)
    q_sel = order[:n_queries]
    query_ids = q_ids[q_sel]
    query_mat = q_mat_full[q_sel]
    ref = ray.put((query_ids, query_mat))

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def partial_topk(t: pa.Table) -> pa.Table:
        qids, qmat = ray.get(ref)
        vids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        mat = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat = mat / norms
        cos = qmat @ mat.T  # (n_queries, batch)
        out_q, out_v, out_c = [], [], []
        for qi in range(len(qids)):
            row = cos[qi]
            mask = vids != qids[qi]
            vv, cc = vids[mask], row[mask]
            if len(vv) == 0:
                continue
            top = min(k, len(vv))
            # partial top-k inside the batch (rounded, vec_id tie-break)
            cc_q = _q6(cc)  # micro-cosine, engine-exact
            sel = np.lexsort((vv, -cc_q))[:top]
            out_q.extend([qids[qi]] * top)
            out_v.extend(vv[sel])
            out_c.extend(cc_q[sel])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cosine_e6": pa.array(out_c, pa.int64()),
            }
        )

    def final_topk(g: pa.Table) -> pa.Table:
        vv = np.asarray(g["vec_id"].to_pylist(), dtype=np.int64)
        cc = np.asarray(g["cosine_e6"].to_pylist(), dtype=np.int64)
        sel = np.lexsort((vv, -cc))[:k]
        return pa.table(
            {
                "query_id": g["query_id"].take(pa.array(sel)),
                "vec_id": pa.array(vv[sel], pa.int64()),
                "cosine_e6": pa.array(cc[sel], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pyarrow")
        .sort(["query_id", "cosine_e6", "vec_id"], descending=[False, True, False])
    )


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.35) -> ray.data.Dataset:
    """Exact cosine near-dup pairs (id_a < id_b, cosine >= threshold):
    block matmul of each batch against the broadcast full matrix."""
    ids, mat = _load_matrix(sf_dir)
    ref = ray.put((ids, mat))
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def block(t: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        vids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        bm = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        nr = np.linalg.norm(bm, axis=1, keepdims=True)
        nr[nr == 0] = 1.0
        bm = bm / nr
        cos = bm @ all_mat.T  # (batch, N)
        bi, aj = np.where(cos >= threshold)
        keep = vids[bi] < all_ids[aj]  # canonical + excludes self
        bi, aj = bi[keep], aj[keep]
        return pa.table(
            {
                "id_a": pa.array(vids[bi], pa.int64()),
                "id_b": pa.array(all_ids[aj], pa.int64()),
                "cosine_e6": pa.array(_q6(cos[bi, aj]), pa.int64()),
            }
        )

    return ds.map_batches(block, batch_format="pyarrow").sort(["id_a", "id_b"])


def embedding_neardup_lsh(
    sf_dir: str, threshold: float = 0.35, n_planes: int = 6, seed: int = 42
) -> ray.data.Dataset:
    """Scale path: random-hyperplane (SimHash-for-vectors) bucketing, exact
    cosine verification within buckets only.  Probabilistic recall —
    a pair at cosine s collides with prob (1 - acos(s)/pi)^n_planes per
    table; multiple rotations raise it.  Rows-only correctness check."""
    ids, mat = _load_matrix(sf_dir)
    dim = mat.shape[1]
    rng = np.random.default_rng(seed)
    n_tables = 8
    planes = rng.standard_normal((n_tables, n_planes, dim))
    planes_ref = ray.put(planes)

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def bucketize(t: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        vids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        bm = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        nr = np.linalg.norm(bm, axis=1, keepdims=True)
        nr[nr == 0] = 1.0
        bm = bm / nr
        n = len(vids)
        tables, keys, out_ids, vecs = [], [], [], []
        weights = 1 << np.arange(pl.shape[1], dtype=np.int64)
        for ti in range(pl.shape[0]):
            signs = (bm @ pl[ti].T) >= 0  # (n, n_planes)
            key = (signs.astype(np.int64) * weights).sum(axis=1)
            tables.append(np.full(n, ti, dtype=np.int32))
            keys.append(key)
            out_ids.append(vids)
            vecs.append(bm)
        return pa.table(
            {
                "tbl": pa.array(np.concatenate(tables), pa.int32()),
                "bkey": pa.array(np.concatenate(keys), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_ids), pa.int64()),
                "vec": pa.array(list(np.concatenate(vecs)), pa.list_(pa.float64())),
            }
        )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        m = g.num_rows
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if m < 2:
            return empty
        vids = np.asarray(g["vec_id"].to_pylist(), dtype=np.int64)
        vm = np.array(g["vec"].to_pylist(), dtype=np.float64)
        order = np.argsort(vids)
        vids, vm = vids[order], vm[order]
        cos = vm @ vm.T
        iu, ju = np.triu_indices(m, k=1)
        cc = cos[iu, ju]
        keep = cc >= threshold
        return pa.table(
            {
                "id_a": pa.array(vids[iu[keep]], pa.int64()),
                "id_b": pa.array(vids[ju[keep]], pa.int64()),
                "cosine": pa.array(np.round(cc[keep], 6), pa.float64()),
            }
        )

    pairs = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby(["tbl", "bkey"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(Min("cosine", alias_name="cosine"))
    )
    return pairs.sort(["id_a", "id_b"])
