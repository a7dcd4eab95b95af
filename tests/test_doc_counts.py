"""Doc numbers must be generated, not hand-maintained (VERDICT r4 ask #8).

The README's suite-size line is produced by ``scripts/update_counts.py``;
this test re-derives the count from a fresh ``pytest --collect-only`` and
fails if the README drifted — the 717-vs-735 rot cannot recur silently.
"""

import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_readme_test_count_matches_collection():
    import sys

    sys.path.insert(0, str(REPO / "scripts"))
    import update_counts

    n = update_counts.collected_count()
    text = (REPO / "README.md").read_text()
    m = update_counts.PATTERN.search(text)
    assert m, "README.md lost its generated '# N tests collected' line"
    assert m.group(0) == update_counts.render_line(n), (
        f"README claims {m.group(0)!r} but collection says {n}; "
        "run scripts/update_counts.py"
    )
