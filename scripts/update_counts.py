"""Regenerate doc-embedded test counts from pytest collection.

Round-4 VERDICT ask #8: the README's suite-size claim rotted by hand within
a round (717 claimed vs 735 collected). This script makes the number
generated, and ``tests/test_doc_counts.py`` asserts the README matches
collection exactly, so drift fails CI instead of aging in the docs.

Usage:
    python scripts/update_counts.py           # rewrite README.md in place
    python scripts/update_counts.py --check   # exit 1 if README is stale
"""

from __future__ import annotations

import pathlib
import re
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
README = REPO / "README.md"
# The one generated line (see README "## Tests").
PATTERN = re.compile(r"# \d+ tests collected[^\n]*")


def collected_count() -> int:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1200,
    ).stdout
    m = re.search(r"(\d+) tests collected", out)
    if not m:
        # Older pytest wording: "collected N items".
        m = re.search(r"collected (\d+) items", out)
    if not m:
        raise RuntimeError(f"cannot parse pytest collection output:\n{out[-2000:]}")
    return int(m.group(1))


def render_line(n: int) -> str:
    return f"# {n} tests collected on a virtual 8-device CPU mesh (1-3 env-gated skips)"


def main() -> int:
    check = "--check" in sys.argv[1:]
    n = collected_count()
    text = README.read_text()
    if not PATTERN.search(text):
        raise RuntimeError(f"README.md has no '# N tests collected' line to update")
    new = PATTERN.sub(render_line(n), text)
    if check:
        if new != text:
            print(f"README test count is stale (collection says {n}); run scripts/update_counts.py")
            return 1
        print(f"README test count up to date ({n})")
        return 0
    README.write_text(new)
    print(f"README updated: {render_line(n)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
