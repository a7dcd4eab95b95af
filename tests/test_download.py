"""Asset cache + pod-GCS hardening (round-4 VERDICT ask #7), offline.

All GCS metadata/transport goes through injectable ops, so the reference
behaviors — same-bucket passthrough, scratch->cache promotion, commit-marker
invalidation, cross-region guard (reference shared/download.py:22-430 and
scripts/train.py:126-128) — are proven against fakes without a network.
"""

import subprocess

import pytest

from lap_tpu.utils import download as dl


class FakeOps:
    """In-memory GCS: a dict of object/dir 'paths' -> text."""

    def __init__(self, objects=None, locations=None):
        self.objects = dict(objects or {})
        self.locations = dict(locations or {})
        self.copies: list[tuple[str, str]] = []
        self.location_queries: list[str] = []

    def exists(self, url):
        u = url.rstrip("/")
        return any(k == u or k.startswith(u + "/") for k in self.objects)

    def write_text(self, url, text):
        self.objects[url.rstrip("/")] = text

    def copy(self, src, dst):
        self.copies.append((src, dst))
        s = src.rstrip("/")
        if dst.startswith("gs://"):
            for k, v in list(self.objects.items()):
                if k == s or k.startswith(s + "/"):
                    self.objects[k.replace(s, dst.rstrip("/"), 1)] = v
        else:
            import pathlib

            pathlib.Path(dst).write_text(self.objects[s])

    def rename(self, src, dst):
        s, d = src.rstrip("/"), dst.rstrip("/")
        for k in list(self.objects):
            if k == s or k.startswith(s + "/"):
                self.objects[k.replace(s, d, 1)] = self.objects.pop(k)

    def remove(self, url):
        u = url.rstrip("/")
        for k in list(self.objects):
            if k == u or k.startswith(u + "/"):
                del self.objects[k]

    def bucket_location(self, bucket):
        self.location_queries.append(bucket)
        return self.locations.get(bucket)


# ---------------------------------------------------------------------------
# prevent_cross_region
# ---------------------------------------------------------------------------


def test_cross_region_mismatch_raises():
    ops = FakeOps(locations={"data-bkt": "US-CENTRAL1", "ckpt-bkt": "EUROPE-WEST4"})
    with pytest.raises(ValueError, match="Cross-region"):
        dl.prevent_cross_region(
            "gs://data-bkt/rlds", "gs://ckpt-bkt/runs", ops=ops
        )


def test_same_region_passes_and_local_paths_skipped():
    ops = FakeOps(locations={"data-bkt": "US-CENTRAL1", "ckpt-bkt": "US-CENTRAL1"})
    dl.prevent_cross_region(
        "gs://data-bkt/rlds", "gs://ckpt-bkt/runs", "/local/cache", None, ops=ops
    )
    assert sorted(ops.location_queries) == ["ckpt-bkt", "data-bkt"]


def test_unresolvable_region_warns_not_raises():
    ops = FakeOps(locations={"data-bkt": "US-CENTRAL1"})  # ckpt-bkt unknown
    dl.prevent_cross_region("gs://data-bkt/a", "gs://unknown-bkt/b", ops=ops)


def test_maybe_guard_noop_for_local_and_override(monkeypatch):
    ops = FakeOps(locations={"a": "US", "b": "EU"})
    dl.maybe_prevent_cross_region("/data", "./ckpts", None, ops=ops)
    assert ops.location_queries == []  # never queried
    monkeypatch.setenv("LAP_TPU_ALLOW_CROSS_REGION", "1")
    dl.maybe_prevent_cross_region("gs://a/x", "gs://b/y", ops=ops)  # overridden


# ---------------------------------------------------------------------------
# maybe_download: local cache
# ---------------------------------------------------------------------------


def test_local_path_passthrough(tmp_path):
    p = tmp_path / "x.npz"
    assert dl.maybe_download(str(p)) == p


def test_gcs_download_promotes_scratch_and_caches(tmp_path, monkeypatch):
    monkeypatch.setenv("LAP_TPU_DATA_HOME", str(tmp_path / "cache"))
    ops = FakeOps(objects={"gs://assets/norm_stats.json": "{}"})
    out = dl.maybe_download("gs://assets/norm_stats.json", ops=ops)
    assert out.read_text() == "{}"
    # Scratch path was the copy destination; promotion renamed it into place.
    assert ops.copies == [("gs://assets/norm_stats.json", str(out) + ".partial")]
    assert (out.parent / f".{out.name}.{dl.COMMIT_MARKER}").exists()
    # Second call is a cache hit: no new transport.
    assert dl.maybe_download("gs://assets/norm_stats.json", ops=ops) == out
    assert len(ops.copies) == 1
    # force_download invalidates and re-fetches.
    dl.maybe_download("gs://assets/norm_stats.json", force_download=True, ops=ops)
    assert len(ops.copies) == 2


def test_missing_marker_invalidates_cache(tmp_path, monkeypatch):
    """A cache file WITHOUT its commit marker (killed download before the
    promote) must be re-fetched, not served."""
    monkeypatch.setenv("LAP_TPU_DATA_HOME", str(tmp_path / "cache"))
    ops = FakeOps(objects={"gs://assets/w.bin": "GOOD"})
    stale = tmp_path / "cache" / "assets" / "w.bin"
    stale.parent.mkdir(parents=True)
    stale.write_text("TORN")
    out = dl.maybe_download("gs://assets/w.bin", ops=ops)
    assert out.read_text() == "GOOD"


# ---------------------------------------------------------------------------
# maybe_download: remote cache + same-bucket passthrough
# ---------------------------------------------------------------------------


def test_same_bucket_passthrough(monkeypatch):
    monkeypatch.setenv("LAP_TPU_DATA_HOME", "gs://mybkt/cache")
    ops = FakeOps(objects={"gs://mybkt/ckpts/params": "W"})
    out = dl.maybe_download("gs://mybkt/ckpts/params", ops=ops)
    assert out == "gs://mybkt/ckpts/params"
    assert ops.copies == []  # no transfer at all


def test_same_bucket_passthrough_missing_source_raises(monkeypatch):
    monkeypatch.setenv("LAP_TPU_DATA_HOME", "gs://mybkt/cache")
    ops = FakeOps()
    with pytest.raises(FileNotFoundError):
        dl.maybe_download("gs://mybkt/ckpts/params", ops=ops)


def test_remote_cache_cross_bucket_promotes_with_markers(monkeypatch):
    monkeypatch.setenv("LAP_TPU_DATA_HOME", "gs://cachebkt/cache")
    ops = FakeOps(objects={"gs://srcbkt/ckpts/params": "W"})
    out = dl.maybe_download("gs://srcbkt/ckpts/params", ops=ops)
    assert out == "gs://cachebkt/cache/srcbkt/ckpts/params"
    assert ops.objects[f"{out}/{dl.COMMIT_MARKER}"] == "ok"
    assert ops.objects[f"{out}/{dl.LEGACY_COMMIT_MARKER}"] == "ok"
    # Hit on second call: exactly one copy happened.
    assert dl.maybe_download("gs://srcbkt/ckpts/params", ops=ops) == out
    assert len(ops.copies) == 1


def test_ensure_commit_success_local(tmp_path):
    d = tmp_path / "prepopulated"
    d.mkdir()
    dl.ensure_commit_success(str(d))
    assert (d / dl.COMMIT_MARKER).read_text() == "ok"
    assert (d / dl.LEGACY_COMMIT_MARKER).read_text() == "ok"
    dl.ensure_commit_success(str(tmp_path / "missing"))  # best-effort: no raise


def test_ensure_commit_success_remote():
    ops = FakeOps(objects={"gs://b/dir/file": "x"})
    dl.ensure_commit_success("gs://b/dir", ops=ops)
    assert ops.objects[f"gs://b/dir/{dl.COMMIT_MARKER}"] == "ok"


# ---------------------------------------------------------------------------
# real-gsutil parser (no network: feed canned `gsutil ls -L -b` output)
# ---------------------------------------------------------------------------


def test_gsutil_location_parser(monkeypatch):
    canned = "gs://mybkt/ :\n\tStorage class: STANDARD\n\tLocation constraint: us-central1\n"

    def fake_run(cmd, **kw):
        assert cmd[:4] == ["gsutil", "ls", "-L", "-b"]
        return subprocess.CompletedProcess(cmd, 0, stdout=canned, stderr="")

    monkeypatch.setattr(dl.subprocess, "run", fake_run)
    assert dl._GsutilOps().bucket_location("mybkt") == "US-CENTRAL1"
