#!/usr/bin/env python
"""Materialize the committed KG-oracle fixture: fixtures/kg/*.parquet.

The flagship kg_triples query runs on a synthetic in-memory corpus, which the
DuckDB oracle cannot see — so the oracle-checkable twin `kg_triples_gazetteer`
reads the SAME corpus from committed parquet that both engines (Spark query +
DuckDB oracle SQL) consume. Deterministic: seeded generators + three
handcrafted irregular-plural turns (F8 coverage — 'bacteria'/'ganglia'/
'metastases' link only through the IRREGULAR_PLURALS override table), written
once with pyarrow and committed to git. Re-running this script reproduces the
same logical content.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from otar3088_spark.synth import entity_dictionary_pandas, transcripts_pandas

OUT = Path(__file__).resolve().parents[1] / "fixtures" / "kg"

EXTRA_DICT = [
    # irregular-plural link targets (F8): rule destem cannot produce these
    ("ENT_0101", "bacterium", "CellType", "C101"),
    ("ENT_0102", "dorsal ganglion", "Anatomy", "C102"),
    ("ENT_0103", "metastasis", "AdverseEvent", "C103"),
    # whole-window lemma targets (round 4): inflection on NON-head tokens —
    # the reference compares per-token lemmas across the whole window
    # (labelstudio_e2e.py:218-226), so "mice models" must link "mouse model"
    ("ENT_0104", "mouse model", "CellType", "C104"),
    ("ENT_0105", "foot ulcer", "AdverseEvent", "C105"),
    # first token is an override VALUE ending in 's' ("nucleus" must stay
    # "nucleus", not destem to "nucleu") — exercises the value-fixpoint tier
    ("ENT_0106", "nucleus accumbens", "Anatomy", "C106"),
    # 3-token term: mid-token destem + last-token irregular simultaneously
    ("ENT_0107", "dorsal root ganglion", "Anatomy", "C107"),
]

IRREGULAR_TURNS = [
    ("conv_irr01", 0, "user",
     "the bacteria were cultured and dorsal ganglia were imaged.",
     None, pd.Timestamp("2024-03-01 00:00:00")),
    ("conv_irr01", 1, "assistant",
     "we observed metastases in the liver and feet were swollen.",
     None, pd.Timestamp("2024-03-01 00:01:00")),
    ("conv_irr02", 0, "user",
     "Bacteria's growth slowed. paracetamol was given for headaches.",
     None, pd.Timestamp("2024-03-02 00:00:00")),
    # round-4 whole-window lemma turns: inflected non-head tokens
    ("conv_irr03", 0, "user",
     "the mice models were treated with aspirin and foot ulcers healed.",
     None, pd.Timestamp("2024-03-03 00:00:00")),
    ("conv_irr03", 1, "assistant",
     "feet ulcers recurred; dorsal roots ganglia were dissected.",
     None, pd.Timestamp("2024-03-03 00:01:00")),
    ("conv_irr04", 0, "user",
     "nuclei accumbens lesions appeared. the nucleus accumbens was imaged.",
     None, pd.Timestamp("2024-03-04 00:00:00")),
]


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    t = transcripts_pandas(n_convs=40)
    extra = pd.DataFrame(IRREGULAR_TURNS, columns=t.columns)
    extra["turn_idx"] = extra["turn_idx"].astype("int32")
    t = pd.concat([t, extra], ignore_index=True)
    d = pd.concat(
        [
            entity_dictionary_pandas(),
            pd.DataFrame(EXTRA_DICT, columns=["ent_id", "term", "label", "canonical_id"]),
        ],
        ignore_index=True,
    )
    # Spark cannot read TIMESTAMP(NANOS) parquet — force microseconds
    t["ts"] = t["ts"].astype("datetime64[us]")
    t.to_parquet(OUT / "transcripts.parquet", index=False)
    d.to_parquet(OUT / "dictionary.parquet", index=False)
    print(f"wrote {OUT}/transcripts.parquet ({len(t)} rows), dictionary.parquet ({len(d)} rows)")


if __name__ == "__main__":
    main()
