"""Per-stage Parquet checkpoints + manifest — the resume mechanism.

Mirrors the reference's Snakemake semantics (a rule is skipped when its
outputs exist, ``lasvdedup/Snakefile:15-126``): each pinned stage writes a
Parquet directory under ``checkpoint_dir`` atomically (write to a temp dir,
rename) and records completion in ``manifest.json``; a re-run reads the
completed stage instead of recomputing it.

Without a checkpoint_dir, ``pin`` falls back to ``materialize()`` — needed
at pipeline fan-out points because Ray Data re-executes a lazy subplan once
per consumer.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

import ray.data
from ..sources.readers import read_parquet_clean


class StageCheckpointer:
    def __init__(
        self,
        checkpoint_dir: Optional[str] = None,
        fingerprint: Optional[str] = None,
        force: bool = False,
    ):
        """``fingerprint`` identifies the (input, config) pair: a stage
        pinned under a different fingerprint is RECOMPUTED, not reused
        (ADVICE r1: name-only keys silently served stale stages after the
        input or thresholds changed — Snakemake, the stated model,
        invalidates on input change).  ``force`` (the reference's
        ``--force``/``forceall``, pipeline.py:26,74) ignores every
        completed manifest entry: all stages recompute and overwrite."""
        self.dir = checkpoint_dir
        self.fp = fingerprint
        self.force = force
        if self.dir:
            os.makedirs(self.dir, exist_ok=True)
        self._manifest_path = os.path.join(self.dir, "manifest.json") if self.dir else None

    def _manifest(self) -> dict:
        if self._manifest_path and os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                return json.load(f)
        return {}

    def _mark_done(self, name: str) -> None:
        m = self._manifest()
        m[name] = {"done": True, "fingerprint": self.fp}
        tmp = f"{self._manifest_path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._manifest_path)  # atomic

    def status(self, name: str) -> str:
        """Dry-run probe: "cached" (reusable), "stale" (fingerprint
        mismatch -> recompute), "forced" (force re-run), or "missing"."""
        entry = self._manifest().get(name, {})
        if not entry.get("done"):
            return "missing"
        if self.force:
            return "forced"
        if self.fp is not None and entry.get("fingerprint") != self.fp:
            return "stale"
        return "cached"

    def is_done(self, name: str) -> bool:
        if self.force:
            return False
        entry = self._manifest().get(name, {})
        if not entry.get("done"):
            return False
        if self.fp is not None and entry.get("fingerprint") != self.fp:
            import logging

            logging.getLogger(__name__).warning(
                "checkpoint stage %r was pinned under fingerprint %s but the "
                "current run is %s (input or config changed): recomputing",
                name,
                entry.get("fingerprint"),
                self.fp,
            )
            return False
        return True

    def pin(self, ds: ray.data.Dataset, name: str) -> ray.data.Dataset:
        """Execute a stage once and make its result re-readable.

        checkpoint_dir set: write-then-rename Parquet + manifest entry;
        on resume, read the completed stage (Snakemake-equivalent skip).
        checkpoint_dir unset: materialize into the object store.
        """
        if not self.dir:
            return ds.materialize()
        final = os.path.join(self.dir, name)
        if self.is_done(name):
            return read_parquet_clean(final)
        # per-process tmp suffix: two concurrent builders of the same stage
        # (e.g. two ingest jobs racing on a shared index) must not rmtree
        # each other's in-progress writes; each writes its own tmp and the
        # first atomic rename wins
        tmp = f"{final}.tmp.{os.getpid()}"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        ds.write_parquet(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        try:
            os.replace(tmp, final)
        except OSError:
            # a concurrent builder completed between the rmtree and the
            # rename; its result is equivalent (same manifest fingerprint
            # gates this path) — keep it, drop ours
            shutil.rmtree(tmp, ignore_errors=True)
        self._mark_done(name)
        return read_parquet_clean(final)
