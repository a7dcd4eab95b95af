"""Asset cache + pod-GCS hardening (parity: lihzha/lap shared/download.py
and the ``prevent_cross_region`` guard at reference scripts/train.py:23,126-128).

``maybe_download`` resolves local paths directly and mirrors remote assets
(gs:// or http(s)://) into a cache directory (``LAP_TPU_DATA_HOME``, default
~/.cache/lap_tpu), with the reference's behaviors:

- **same-bucket passthrough** (ref download.py:146-162): when the cache dir
  itself is a gs:// URI in the same bucket as the source, return the source
  directly — no copy, no egress.
- **remote (gs://) cache**: the cache may live in GCS; completion is marked
  with COMMIT_SUCCESS (+ the legacy commit_success.txt) objects.
- **scratch -> cache promotion** (ref download.py:85-90): downloads land in
  a ``.partial`` scratch path and are atomically promoted after the
  completion marker is written, so a killed download never half-populates
  the cache.
- commit markers + file locks so concurrent processes don't duplicate work;
  ``force_download=True`` invalidates and re-fetches.

``prevent_cross_region`` raises when gs:// paths resolve to different bucket
locations (the reference calls this on TPU pods before touching data/save
dirs: cross-region GCS traffic silently burns egress dollars at pod scale).

All GCS/remote operations go through module-level hooks (``_gcs_ops``,
``_run``) so the logic is unit-testable offline with fakes; real transport
uses gsutil/curl when present. In zero-egress environments the cache must be
pre-populated.
"""

from __future__ import annotations

import logging
import os
import shutil
import subprocess
import urllib.parse
from pathlib import Path

logger = logging.getLogger(__name__)

COMMIT_MARKER = "COMMIT_SUCCESS"
LEGACY_COMMIT_MARKER = "commit_success.txt"


def cache_home() -> str:
    """Cache root: a local path or a gs:// URI (reference OPENPI_DATA_HOME)."""
    return os.environ.get(
        "LAP_TPU_DATA_HOME", str(Path.home() / ".cache" / "lap_tpu")
    )


def _is_gcs(path) -> bool:
    return str(path).startswith("gs://")


def _run(cmd: list[str], *, timeout: float = 3600) -> None:
    """Transport hook (monkeypatched in tests): run gsutil/curl."""
    subprocess.run(cmd, check=True, capture_output=True, timeout=timeout)


class _GsutilOps:
    """GCS metadata operations behind gsutil; replaced by fakes in tests."""

    def exists(self, url: str) -> bool:
        try:
            subprocess.run(
                ["gsutil", "ls", url], check=True, capture_output=True, timeout=120
            )
            return True
        except (subprocess.CalledProcessError, FileNotFoundError):
            return False

    def write_text(self, url: str, text: str) -> None:
        subprocess.run(
            ["bash", "-c", f"printf %s {text!r} | gsutil cp - {url!r}"],
            check=True,
            capture_output=True,
            timeout=120,
        )

    def copy(self, src: str, dst: str) -> None:
        _run(["gsutil", "-m", "cp", "-r", src, dst])

    def rename(self, src: str, dst: str) -> None:
        _run(["gsutil", "-m", "mv", src, dst])

    def remove(self, url: str) -> None:
        _run(["gsutil", "-m", "rm", "-r", url])

    def bucket_location(self, bucket: str) -> str | None:
        """Bucket location constraint (e.g. 'US-CENTRAL1'), or None if
        undeterminable (no gsutil / no permission)."""
        try:
            out = subprocess.run(
                ["gsutil", "ls", "-L", "-b", f"gs://{bucket}"],
                check=True,
                capture_output=True,
                timeout=120,
                text=True,
            ).stdout
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
        for line in out.splitlines():
            if "Location constraint:" in line:
                return line.split(":", 1)[1].strip().upper()
        return None


_gcs_ops = _GsutilOps()


def prevent_cross_region(*paths, ops=None) -> None:
    """Raise when the gs:// paths among ``paths`` live in different bucket
    locations (reference rail_tpu_utils.prevent_cross_region as used at
    scripts/train.py:126-128 / eval.py:90-92): a pod streaming RLDS from one
    region while checkpointing to another pays cross-region egress on every
    batch and every save. Paths whose location cannot be determined are
    skipped with a warning (the guard must not brick offline runs)."""
    ops = ops or _gcs_ops
    locations: dict[str, str] = {}
    for p in paths:
        if p is None or not _is_gcs(p):
            continue
        bucket = urllib.parse.urlparse(str(p)).netloc
        if not bucket or bucket in locations:
            continue
        loc = ops.bucket_location(bucket)
        if loc is None:
            logger.warning("prevent_cross_region: cannot resolve region of gs://%s", bucket)
            continue
        locations[bucket] = loc
    if len(set(locations.values())) > 1:
        detail = ", ".join(f"gs://{b} -> {loc}" for b, loc in sorted(locations.items()))
        raise ValueError(
            f"Cross-region GCS layout detected ({detail}). Streaming data and "
            "writing checkpoints across regions pays egress on every batch/save "
            "at pod scale; co-locate the buckets (or set "
            "LAP_TPU_ALLOW_CROSS_REGION=1 to override)."
        )


def maybe_prevent_cross_region(*paths, ops=None) -> None:
    """Entry-point guard: run ``prevent_cross_region`` only when any path is
    remote and the override env var is unset."""
    if os.environ.get("LAP_TPU_ALLOW_CROSS_REGION"):
        return
    if any(p is not None and _is_gcs(p) for p in paths):
        prevent_cross_region(*paths, ops=ops)


def _cache_path(cache_dir: str, url: str) -> str:
    parsed = urllib.parse.urlparse(url)
    tail = f"{parsed.netloc}/{parsed.path.lstrip('/')}"
    if _is_gcs(cache_dir):
        return f"{cache_dir.rstrip('/')}/{tail}"
    return str(Path(cache_dir).expanduser() / tail)


def _same_bucket_source(url: str, cache_dir: str, ops) -> str | None:
    """Reference download.py:146-162: cache and source in the same bucket ->
    use the source in place (validated to exist)."""
    if not _is_gcs(cache_dir) or not _is_gcs(url):
        return None
    if urllib.parse.urlparse(cache_dir).netloc != urllib.parse.urlparse(url).netloc:
        return None
    if not ops.exists(url):
        raise FileNotFoundError(f"File not found at {url}")
    return url


def maybe_download(path_or_url: str, *, force_download: bool = False, ops=None):
    """Local path -> itself; remote URL -> cached copy (local or remote cache).

    Returns a ``pathlib.Path`` for local results, or the ``gs://...`` string
    when the cache itself is remote (same-bucket passthrough / remote cache).
    """
    ops = ops or _gcs_ops
    url = str(path_or_url)
    if "://" not in url:
        return Path(url)
    cache_dir = cache_home()

    passthrough = _same_bucket_source(url, cache_dir, ops)
    if passthrough is not None:
        logger.info("same-bucket passthrough: %s", passthrough)
        return passthrough

    target = _cache_path(cache_dir, url)
    if _is_gcs(cache_dir):
        return _download_to_remote_cache(url, target, ops, force_download)
    return _download_to_local_cache(url, Path(target), ops, force_download)


def _download_to_local_cache(url: str, target: Path, ops, force_download: bool) -> Path:
    marker = target.parent / f".{target.name}.{COMMIT_MARKER}"

    def hit() -> bool:
        return target.exists() and marker.exists()

    if hit() and not force_download:
        return target
    target.parent.mkdir(parents=True, exist_ok=True)

    import filelock

    with filelock.FileLock(str(target) + ".lock"):
        if hit() and not force_download:
            return target
        # Invalidate + scratch->promote: a killed download never leaves a
        # half-written cache entry behind the commit marker.
        scratch = target.parent / f"{target.name}.partial"
        for stale in (target, scratch):
            if stale.exists():
                shutil.rmtree(stale) if stale.is_dir() else stale.unlink()
        if marker.exists():
            marker.unlink()
        logger.info("downloading %s -> %s", url, target)
        if url.startswith("gs://"):
            try:
                ops.copy(url, str(scratch))
            except FileNotFoundError as e:  # no gsutil binary (zero egress)
                raise RuntimeError(
                    f"no downloader available for {url}; pre-populate {target}"
                ) from e
        else:
            try:
                _run(["curl", "-fsSL", "-o", str(scratch), url])
            except FileNotFoundError as e:
                raise RuntimeError(
                    f"no downloader available for {url}; pre-populate {target}"
                ) from e
        scratch.rename(target)
        marker.touch()
    return target


def _download_to_remote_cache(url: str, target: str, ops, force_download: bool) -> str:
    """Remote (gs://) cache: scratch object/dir promoted via rename; the
    COMMIT_SUCCESS object marks completeness (no POSIX locks in GCS — last
    writer wins, which matches the reference's remote-cache behavior).

    The markers are written AFTER the promotion, at the target: a GCS
    "rename" of a prefix is per-object copy+delete in arbitrary order, so a
    marker riding inside the scratch could land at the target before the
    data objects do and a reader would see a marked-but-incomplete entry.
    Marker-last keeps the invariant "marker present => promotion finished"
    (a kill between rename and marker just re-downloads next call). It also
    keeps single-OBJECT assets working with real gsutil: ``mv`` of a URL
    that names both an object and pseudo-children is ambiguous, while an
    object-only scratch moves cleanly."""
    marker = f"{target.rstrip('/')}/{COMMIT_MARKER}"
    if not force_download and ops.exists(target) and ops.exists(marker):
        return target
    scratch = f"{target}.partial"
    for stale in (scratch, target):
        if ops.exists(stale):
            ops.remove(stale)
    logger.info("downloading %s -> %s (remote cache)", url, target)
    try:
        ops.copy(url, scratch)
    except FileNotFoundError as e:  # no gsutil binary (zero egress)
        raise RuntimeError(
            f"no downloader available for {url}; pre-populate {target}"
        ) from e
    ops.rename(scratch, target)
    ops.write_text(marker, "ok")
    ops.write_text(f"{target.rstrip('/')}/{LEGACY_COMMIT_MARKER}", "ok")
    return target


def ensure_commit_success(dir_path: str, ops=None) -> None:
    """Best-effort completion markers for a pre-populated local or gs://
    directory (reference download.py:104-123)."""
    ops = ops or _gcs_ops
    try:
        if _is_gcs(dir_path):
            if not ops.exists(dir_path):
                raise FileNotFoundError(dir_path)
            base = dir_path.rstrip("/")
            for name in (COMMIT_MARKER, LEGACY_COMMIT_MARKER):
                if not ops.exists(f"{base}/{name}"):
                    ops.write_text(f"{base}/{name}", "ok")
            return
        d = Path(dir_path)
        if not d.is_dir():
            raise FileNotFoundError(dir_path)
        for name in (COMMIT_MARKER, LEGACY_COMMIT_MARKER):
            p = d / name
            if not p.exists():
                p.write_text("ok")
    except Exception:  # noqa: BLE001 - best-effort by contract
        pass
