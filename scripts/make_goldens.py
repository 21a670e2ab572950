"""Author the committed golden fixtures (tests/fixtures/golden.json).

The corpus generator is the oracle author (FIXTURES.md): goldens are
committed files, never recomputed at test time. Regenerate ONLY when the
kernel contract intentionally changes, and commit the diff.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from powerpoint_context_extractor_spark import corpus  # noqa: E402
from powerpoint_context_extractor_spark.kernel import extract_document  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "golden.json")


def main() -> None:
    goldens = []
    for row in corpus.fixture_pages():
        r = extract_document(row["url"], row["html"])
        goldens.append({
            "url": r.url,
            "sha256": r.sha256(),
            "title": r.title,
            "text": r.text,
            "spans": r.spans,
            "n_blocks": r.n_blocks,
            "error": r.error,
        })
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump(goldens, f, indent=1, ensure_ascii=False, sort_keys=True)
    print(f"wrote {len(goldens)} goldens -> {OUT}")


if __name__ == "__main__":
    main()
