"""Asset cache (parity: lihzha/lap shared/download.py).

``maybe_download`` resolves local paths directly and mirrors remote assets
(gs:// or http(s)://) into a cache directory (``LAP_TPU_DATA_HOME``,
default ~/.cache/lap_tpu) with commit markers and file locks so concurrent
processes don't duplicate work. Remote fetch uses gsutil/curl when present;
in zero-egress environments the cache must be pre-populated.
"""

from __future__ import annotations

import logging
import os
import subprocess
import urllib.parse
from pathlib import Path

logger = logging.getLogger(__name__)

COMMIT_MARKER = "COMMIT_SUCCESS"


def cache_home() -> Path:
    return Path(
        os.environ.get("LAP_TPU_DATA_HOME", Path.home() / ".cache" / "lap_tpu")
    ).expanduser()


def _cache_path(url: str) -> Path:
    parsed = urllib.parse.urlparse(url)
    return cache_home() / parsed.netloc / parsed.path.lstrip("/")


def maybe_download(path_or_url: str, **_kwargs) -> Path:
    """Local path -> itself; remote URL -> cached local copy."""
    if "://" not in str(path_or_url):
        return Path(path_or_url)
    target = _cache_path(str(path_or_url))
    marker = target.parent / f".{target.name}.{COMMIT_MARKER}"
    if target.exists() and marker.exists():
        return target
    target.parent.mkdir(parents=True, exist_ok=True)

    import filelock

    with filelock.FileLock(str(target) + ".lock"):
        if target.exists() and marker.exists():
            return target
        url = str(path_or_url)
        tmp = target.with_suffix(target.suffix + ".tmp")
        if url.startswith("gs://"):
            cmd = ["gsutil", "-m", "cp", "-r", url, str(tmp)]
        else:
            cmd = ["curl", "-fsSL", "-o", str(tmp), url]
        logger.info("downloading %s -> %s", url, target)
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=3600)
        except FileNotFoundError as e:
            raise RuntimeError(
                f"no downloader available for {url}; pre-populate {target}"
            ) from e
        tmp.rename(target)
        marker.touch()
    return target
