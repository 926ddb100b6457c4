"""Session-scoped Ray fixture — Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest
import ray
import ray.data


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_tables():
    """Deterministic synthetic corpus + ground truth (small, shared)."""
    from lasvdedup_ray.sources.corpus import CorpusSpec, generate_corpus

    return generate_corpus(CorpusSpec(n_files=400, seed=42))
