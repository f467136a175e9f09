"""Generate the committed end-to-end golden table.

Runs the pure-Python kernel (no Spark) over the deterministic
transcript skeleton for E2E_CONVS conversations and writes
tests/goldens/e2e.parquet.  The Spark pipeline must reproduce every
(conv_id, turn_idx, extracted_text, strategy) byte-for-byte
(tests/test_e2e_golden.py) — cross-round regression armor.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import pandas as pd

from webtext_extraction_spark.fixtures_pages import payload_for
from webtext_extraction_spark.kernel.extract import extract_payload

E2E_CONVS = 250  # ≈ 1600 turns
OUT = pathlib.Path(__file__).parent / "goldens" / "e2e.parquet"


def rows():
    for i in range(E2E_CONVS):
        conv_id = f"conv{i:06d}"
        for turn_idx in range(1 + i % 12):
            payload, tool = payload_for(conv_id, turn_idx)
            r = extract_payload(payload, tool)
            yield (conv_id, turn_idx, r.text, r.strategy, r.status)


def main():
    df = pd.DataFrame(
        rows(), columns=["conv_id", "turn_idx", "extracted_text", "strategy", "status"]
    )
    df.to_parquet(OUT, index=False)
    print(f"wrote {len(df)} golden rows to {OUT}")


if __name__ == "__main__":
    main()
