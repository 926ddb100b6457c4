"""Benchmark harness — prints ONE JSON line.

Headline: the flagship MinHash/LSH dedup pipeline over a deterministic
synthetic source-code corpus sized to the scale factor (sf * 200k files),
reported as wall seconds + files/sec.  Also times representative pipelines
from queries() over $GRAFT_SF_DIR tables.

  python bench.py               # one run at $RAY_GRAFT_CPUS (default 32)
  python bench.py --scaling     # fresh processes at 8 and 32 CPUs,
                                # reports both + scaling efficiency

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import lasvdedup_ray  # noqa: F401  (sets NUMPY_MADVISE_HUGEPAGE before ray.init)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
FILES_PER_SF = 200_000
CORPUS_CACHE = "/tmp/raydedup_bench_corpus"


def sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def ensure_corpus(n_files: int) -> str:
    from lasvdedup_ray.sources.corpus import CorpusSpec, write_corpus

    # bench corpus: ~5 KB files (realistic source-file size; the tiny
    # default test files under-weight per-file compute vs fixed overhead)
    # with near-dup mutation rates that mirror real dup clusters (mostly
    # close to exact)
    spec = CorpusSpec(
        n_files=n_files,
        seed=42,
        tokens_per_doc=600,
        mutation_rate=0.015,
        chain_step_rate=0.03,
    )
    out = f"{CORPUS_CACHE}_{n_files}_v2"
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        write_corpus(out, spec, shards=max(8, n_files // 4000))
        open(marker, "w").write("ok")
    return out


def machine_probe() -> dict:
    """Cheap (~2 s) hardware calibration embedded in every bench JSON so
    numbers from different rounds are comparable across VM hosts.  Round 3
    found the sandbox VM's memory system varying by >30x between sessions
    (first-touch page faults 0.7 s .. 42 s per 400 MB on identical code),
    so a wall-clock number without its machine context is meaningless.

    - sign_1core_files_per_sec: the flagship's signing kernel, single
      thread, driver process (CPU + small-alloc speed)
    - fresh_touch_gbps: first write to newly mmapped pages (page-fault
      service rate — the dimension that degrades on lazily-restored VMs)
    - warm_gbps: in-place stream over already-faulted memory (DRAM bw)
    """
    import numpy as np

    from lasvdedup_ray.config import SignatureConfig
    from lasvdedup_ray.stages.signatures import MinHashSigner

    import pyarrow as pa

    rng = np.random.default_rng(7)
    words = ["w%03d" % i for i in range(512)]
    docs = [
        " ".join(rng.choice(words, size=120).tolist()) for _ in range(256)
    ]
    t = pa.table({"content": pa.array(docs)})
    signer = MinHashSigner(SignatureConfig())
    signer(t.slice(0, 8))  # warm imports/JIT paths
    t0 = time.time()
    signer(t)
    sign_rate = 256 / (time.time() - t0)

    # raw anonymous mmap, NOT np.empty: the engine raises glibc's malloc
    # mmap threshold (lasvdedup_ray/_alloc.py), which would silently turn a
    # malloc'd probe buffer into reused heap pages and stop measuring the
    # page-fault service rate this probe exists to track across rounds
    import mmap as _mmap

    n = 200 * 1024 * 1024
    raw = _mmap.mmap(-1, n)
    buf = np.frombuffer(raw, dtype=np.uint8)
    t0 = time.time()
    buf[::4096] = 1  # fault every page
    fresh = n / (time.time() - t0) / 1e9
    t0 = time.time()
    buf[::64] = 2  # touch every cache line, pages already resident
    warm = (n / 64 * 64) / (time.time() - t0) / 1e9
    del buf
    raw.close()
    return {
        "sign_1core_files_per_sec": round(sign_rate, 1),
        "fresh_touch_gbps": round(fresh, 2),
        "warm_gbps": round(warm, 2),
    }


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False

    from lasvdedup_ray.config import PipelineConfig
    from lasvdedup_ray.pipelines import ann, relational, textops
    from lasvdedup_ray.pipelines.dedup import dedup_pipeline
    from lasvdedup_ray.pipelines.docdedup import minhash_dedup_docs

    sf = sf_from_dir(SF_DIR)
    n_files = int(
        os.environ.get("GRAFT_BENCH_FILES", max(2000, int(FILES_PER_SF * sf)))
    )
    corpus_dir = ensure_corpus(n_files)
    corpus_paths = [
        os.path.join(corpus_dir, f)
        for f in sorted(os.listdir(corpus_dir))
        if f.startswith("part-")
    ]

    # warm the page cache + worker pool so we measure steady-state compute
    # and shuffle, not first disk reads or Python-worker cold starts.
    # NOTE: .count() on parquet is metadata-only — a map forces full decode.
    import pyarrow as _pa

    def _touch(t):
        return _pa.table({"n": _pa.array([t.num_rows])})

    from lasvdedup_ray.sources.readers import read_parquet_clean

    rd.read_parquet(corpus_paths).map_batches(_touch, batch_format="pyarrow").count()
    # clean read: the testdata footers carry pandas-metadata dicts that
    # defeat Ray's schema dedup (the "Failed to hash the schemas" warning)
    read_parquet_clean(f"{SF_DIR}/lineitem.parquet").map_batches(
        _touch, batch_format="pyarrow"
    ).count()
    rd.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(
        lambda b: (__import__("numpy"), __import__("pyarrow"), b)[-1],
        batch_size=1,
        num_cpus=1,
    ).count()

    queries = {}

    # headline: flagship dedup over the synthetic source-code corpus
    t0 = time.time()
    cfg = PipelineConfig()
    res = dedup_pipeline(
        rd.read_parquet(corpus_paths), cfg, num_partitions=max(8, NUM_CPUS)
    )
    n_out = res.count()
    headline_sec = time.time() - t0
    assert n_out == n_files, (n_out, n_files)
    queries["dedup_corpus"] = round(headline_sec, 3)

    def timed(name, fn):
        t = time.time()
        out = fn(SF_DIR)
        out.count()
        queries[name] = round(time.time() - t, 3)

    if not os.environ.get("GRAFT_BENCH_HEADLINE_ONLY"):
        timed("minhash_dedup_docs", minhash_dedup_docs)
        timed("q1_pricing_summary", relational.q1_pricing_summary)
        timed("q5_nation_revenue", relational.q5_nation_revenue)
        timed("events_hourly", relational.events_hourly)
        timed("doc_stats", textops.doc_stats)
        timed("simhash_near_pairs", textops.simhash_near_pairs)
        timed("embedding_topk", ann.embedding_topk)
        from lasvdedup_ray.pipelines import curation, windows

        timed("quality_classifier_docs", curation.quality_classifier_docs)
        timed("pack_sequences", curation.pack_sequences)
        timed("bm25_topk", textops.bm25_topk)
        timed("purchase_click_window_join", windows.purchase_click_window_join)
        timed("hll_distinct_users", relational.hll_distinct_users)
        timed("dsir_weights", curation.dsir_weights)
        timed("lm_perplexity_docs", curation.lm_perplexity_docs)
        timed("knn_graph_embeddings", ann.knn_graph_embeddings)

    result = {
        "metric": "flagship dedup wall time (synthetic source-code corpus)",
        "value": round(headline_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "corpus_files": n_files,
        "files_per_sec": round(n_files / headline_sec, 1),
        "machine": machine_probe(),
    }
    ray.shutdown()
    return result


def run_stages() -> dict:
    """Stage-level wall-time split of the flagship at $RAY_GRAFT_CPUS —
    the scaling-efficiency evidence: compute stages (sign) should scale
    near-linearly with CPUs, the all-to-all exchanges (candidates,
    classify) are bounded by single-box memory bandwidth at every CPU
    count.  Prints one JSON line."""
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    import pyarrow as _pa

    from lasvdedup_ray.config import PipelineConfig
    from lasvdedup_ray.pipelines.dedup import SLIM_COLS, candidate_tau
    from lasvdedup_ray.stages.classify import classify_clusters
    from lasvdedup_ray.stages.lsh import candidate_pairs
    from lasvdedup_ray.stages.prepare import prepare
    from lasvdedup_ray.stages.signatures import add_signatures
    from lasvdedup_ray.stages.verify import verify_pairs
    from lasvdedup_ray.state.unionfind import assign_clusters

    sf = sf_from_dir(SF_DIR)
    n_files = int(
        os.environ.get("GRAFT_BENCH_FILES", max(2000, int(FILES_PER_SF * sf)))
    )
    corpus_dir = ensure_corpus(n_files)
    corpus_paths = [
        os.path.join(corpus_dir, f)
        for f in sorted(os.listdir(corpus_dir))
        if f.startswith("part-")
    ]

    def _touch(t):
        return _pa.table({"n": _pa.array([t.num_rows])})

    rd.read_parquet(corpus_paths).map_batches(_touch, batch_format="pyarrow").count()

    cfg = PipelineConfig()
    tau = candidate_tau(cfg)
    emit_tau = tau + cfg.lsh.exact_margin
    stages = {}

    t0 = time.time()
    signed = add_signatures(
        prepare(rd.read_parquet(corpus_paths), batch_size=2048),
        cfg=cfg.signature,
        batch_size=2048,
        concurrency=cfg.execution.signer_concurrency,
    ).materialize()
    stages["sign"] = round(time.time() - t0, 3)

    t0 = time.time()
    edges = verify_pairs(
        candidate_pairs(
            signed.select_columns(["id", "minhash", "simhash"]),
            cfg.signature,
            cfg.lsh,
            tau=emit_tau,
        ),
        signed.select_columns(["id", "content"]),
        cfg.signature,
        cfg.lsh,
        tau=tau,
        num_partitions=max(8, NUM_CPUS),
    ).materialize()
    stages["candidates_verify"] = round(time.time() - t0, 3)

    t0 = time.time()
    meta = signed.select_columns(SLIM_COLS + ["minhash", "simhash"])
    clustered = assign_clusters(
        meta, edges, num_partitions=max(8, NUM_CPUS)
    )
    n_out = classify_clusters(clustered, cfg).count()
    stages["cluster_classify"] = round(time.time() - t0, 3)
    assert n_out == n_files

    result = {
        "metric": "flagship stage split",
        "value": round(sum(stages.values()), 3),
        "unit": "sec",
        "stages": stages,
        "num_cpus": NUM_CPUS,
        "corpus_files": n_files,
    }
    ray.shutdown()
    return result


def run_ceiling() -> dict:
    """Machine scaling ceiling: fixed pure-numpy work (matmul chain), no
    shuffle, no I/O, fresh processes at 8 and 32 CPUs.  The efficiency of
    THIS job bounds the efficiency any pipeline can reach on this box —
    on the sandbox VM it measures ~0.70-0.72 (32 vCPUs share memory
    channels/turbo that 8 vCPUs get exclusively), which calibrates the
    >= 0.8 bar for single-box evidence."""
    body = r"""
import sys, time, json
import ray
ncpu = int(sys.argv[1])
ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")
import ray.data as rd
rd.DataContext.get_current().enable_progress_bars = False
import numpy as np
def work(b):
    rng = np.random.default_rng(int(b["id"][0]))
    x = rng.standard_normal((600, 600))
    for _ in range(12):
        x = x @ x.T
        x /= np.abs(x).max()
    return {"id": b["id"], "s": np.array([float(x.sum())])}
ds = rd.range(256, override_num_blocks=256).map_batches(lambda b: {"id": b["id"]}, batch_size=1)
ds.map_batches(work, batch_size=1, num_cpus=1).count()
t0 = time.time()
ds.map_batches(work, batch_size=1, num_cpus=1).count()
print(json.dumps({"sec": round(time.time()-t0, 2)}))
ray.shutdown()
"""

    def run(ncpu: int) -> float:
        out = subprocess.run(
            [sys.executable, "-c", body, str(ncpu)],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])["sec"]

    t32 = run(32)
    t8 = run(8)
    return {
        "metric": "pure-compute scaling ceiling (no shuffle, 8 -> 32 CPUs)",
        "value": round((t8 / t32) / 4.0, 3),
        "unit": "efficiency",
        "sec_8": t8,
        "sec_32": t32,
    }


def run_scaling() -> dict:
    # scaling evidence needs a compute-dominated input: the fixed per-stage
    # scheduling latency (~5-10 s regardless of CPU count) would swamp the
    # sf-sized corpus, so the same job runs on a 15x larger deterministic
    # corpus at both parallelism levels (same input both runs)
    sf = sf_from_dir(SF_DIR)
    scaling_files = int(os.environ.get("GRAFT_SCALING_FILES", int(6_000_000 * sf)))

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_FILES=str(scaling_files),
            GRAFT_BENCH_HEADLINE_ONLY="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # this box has very high run-to-run variance (measured up to 3x on an
    # identical in-session job): take the MIN over repeats per level — the
    # unbiased estimator of the machine's actual capability under
    # one-sided system noise
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "2"))
    lo_cpus, hi_cpus = 8, 32
    run(lo_cpus if scaling_files <= 50_000 else hi_cpus)  # untimed warm-up: build the corpus cache
    runs_lo = [run(lo_cpus) for _ in range(repeats)]
    runs_hi = [run(hi_cpus) for _ in range(repeats)]
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi = min(runs_hi, key=lambda r: r["value"])
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi_cpus / lo_cpus)
    return {
        "metric": "dedup scaling efficiency (8 -> 32 CPUs, fresh processes)",
        "value": round(eff, 3),
        "machine": machine_probe(),
        "unit": "efficiency",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "sec_8_all": [r["value"] for r in runs_lo],
        "sec_32_all": [r["value"] for r in runs_hi],
        "files_per_sec_8": r_lo["files_per_sec"],
        "files_per_sec_32": r_hi["files_per_sec"],
        "queries_8": r_lo["queries"],
        "queries_32": r_hi["queries"],
        "sf": r_lo["sf"],
        "corpus_files": r_lo["corpus_files"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--stages" in sys.argv:
        print(json.dumps(run_stages()))
    elif "--ceiling" in sys.argv:
        print(json.dumps(run_ceiling()))
    else:
        print(json.dumps(run_bench()))
