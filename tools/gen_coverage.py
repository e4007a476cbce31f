"""Regenerate COVERAGE.md's §2 id → query table from REGISTRY tags.

The table (and the registered-query count in the header) is mechanical; the
prose header and the "covered outside the registry" section are curated by
hand and preserved verbatim. Run after adding/retagging queries:

    python tools/gen_coverage.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COVERAGE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")


def main() -> None:
    from unsupervised_anomaly_detection_on_noisy_time_series_data_for_accurate_load_forecasting_spark.plans import (
        REGISTRY,
    )

    by_tag: dict[str, list[str]] = {}
    for name, spec in REGISTRY.items():  # registration order within each tag
        for tag in spec.tags:
            by_tag.setdefault(tag, []).append(name)

    table = ["| SURVEY §2 id | queries |", "|---|---|"]
    for tag in sorted(by_tag):
        qs = ", ".join(f"`{q}`" for q in by_tag[tag])
        table.append(f"| {tag} | {qs} |")

    text = open(COVERAGE).read()
    # swap the table body between its header row and the next section header
    new = re.sub(
        r"\| SURVEY §2 id \| queries \|\n(?:\|.*\n)+",
        "\n".join(table) + "\n",
        text,
    )
    # refresh the registered-query count in the prose header
    n = len(REGISTRY)
    new = re.sub(
        r"^\d+ registered queries, \*\*all \d+ with",
        f"{n} registered queries, **all {n} with",
        new,
        flags=re.MULTILINE,
    )
    open(COVERAGE, "w").write(new)
    print(f"COVERAGE.md regenerated: {n} queries, {len(by_tag)} tags")


if __name__ == "__main__":
    main()
