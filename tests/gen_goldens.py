"""Generate committed golden outputs for every fixture archetype.

Run manually (``python tests/gen_goldens.py``) when extraction
semantics *intentionally* change; tests compare against the committed
files, so accidental behavior drift fails CI.  Semantic correctness of
the goldens themselves is pinned by the hand-written assertions in
test_goldens.py (strategy, inclusion/exclusion properties, exact
strings for the fully-predictable archetypes).
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from webtext_extraction_spark.fixtures_pages import ARCHETYPES
from webtext_extraction_spark.kernel.extract import extract_payload

GOLDEN_SEED = 5
GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens"


def main():
    GOLDEN_DIR.mkdir(exist_ok=True)
    index = {}
    for name, builder, tool in ARCHETYPES:
        payload = builder(GOLDEN_SEED)
        result = extract_payload(payload, tool)
        (GOLDEN_DIR / f"{name}.txt").write_text(result.text, encoding="utf-8")
        index[name] = {"strategy": result.strategy, "status": result.status}
    (GOLDEN_DIR / "index.json").write_text(
        json.dumps(index, indent=1, ensure_ascii=False), encoding="utf-8"
    )
    print(f"wrote {len(index)} goldens to {GOLDEN_DIR}")


if __name__ == "__main__":
    main()
