"""Deterministic synthetic Wikidata-dump generator for ingest
benchmarking (and ad-hoc testing).

Emits the reference's input format (SURVEY §1.1): a JSON array with
one entity object per line, lines comma-terminated, wrapped in ``[`` /
``]`` lines (main.rs:104-119's expectations). Entity content is a pure
function of the line index — no RNG state, so every run produces
byte-identical output and timings are comparable across rounds.

Each entity carries the shapes the ingest dispatcher must route
(value.rs:373-433): labels/descriptions in 3 languages, an item-valued
claim, an external-id string claim, a quantity with bounds, a time, a
globe-coordinate every 5th entity, a novalue snak every 7th, and a
deprecated-rank claim every 11th (which ingest must drop).

Usage: python tools/gen_dump.py <out_path> <n_lines>
"""

from __future__ import annotations

import json
import sys


def entity(i: int) -> dict:
    qid = f"Q{i + 1}"
    claims = {
        "P31": [
            {
                "mainsnak": {
                    "snaktype": "value",
                    "property": "P31",
                    "datatype": "wikibase-item",
                    "datavalue": {
                        "value": {
                            "entity-type": "item",
                            "numeric-id": (i % 1000) + 1,
                            "id": f"Q{(i % 1000) + 1}",
                        },
                        "type": "wikibase-entityid",
                    },
                },
                "rank": "normal",
            }
        ],
        "P214": [
            {
                "mainsnak": {
                    "snaktype": "value",
                    "property": "P214",
                    "datatype": "external-id",
                    "datavalue": {"value": f"VIAF-{i:08d}", "type": "string"},
                },
                "rank": "normal",
            }
        ],
        "P2044": [
            {
                "mainsnak": {
                    "snaktype": "value",
                    "property": "P2044",
                    "datatype": "quantity",
                    "datavalue": {
                        "value": {
                            "amount": f"+{(i * 7) % 8848}.5",
                            "lowerBound": f"+{(i * 7) % 8848}.0",
                            "upperBound": f"+{(i * 7) % 8848 + 1}.0",
                            "unit": "http://www.wikidata.org/entity/Q11573",
                        },
                        "type": "quantity",
                    },
                },
                "rank": "normal",
            }
        ],
        "P569": [
            {
                "mainsnak": {
                    "snaktype": "value",
                    "property": "P569",
                    "datatype": "time",
                    "datavalue": {
                        "value": {
                            "time": f"+{1800 + i % 220:04d}-{(i % 12) + 1:02d}"
                            f"-{(i % 28) + 1:02d}T00:00:00Z",
                            "precision": 11,
                        },
                        "type": "time",
                    },
                },
                "rank": "normal",
            }
        ],
    }
    if i % 5 == 0:
        claims["P625"] = [
            {
                "mainsnak": {
                    "snaktype": "value",
                    "property": "P625",
                    "datatype": "globe-coordinate",
                    "datavalue": {
                        "value": {
                            "latitude": (i % 180) - 90 + 0.25,
                            "longitude": (i % 360) - 180 + 0.5,
                            "precision": 0.001,
                            "globe": "http://www.wikidata.org/entity/Q2",
                        },
                        "type": "globecoordinate",
                    },
                },
                "rank": "normal",
            }
        ]
    if i % 7 == 0:
        claims["P40"] = [
            {
                "mainsnak": {
                    "snaktype": "novalue",
                    "property": "P40",
                    "datatype": "wikibase-item",
                },
                "rank": "normal",
            }
        ]
    if i % 11 == 0:
        claims["P106"] = [
            {
                "mainsnak": {
                    "snaktype": "value",
                    "property": "P106",
                    "datatype": "wikibase-item",
                    "datavalue": {
                        "value": {
                            "entity-type": "item",
                            "numeric-id": 5,
                            "id": "Q5",
                        },
                        "type": "wikibase-entityid",
                    },
                },
                "rank": "deprecated",
            }
        ]
    return {
        "type": "item",
        "id": qid,
        "labels": {
            lang: {"language": lang, "value": f"entity {i} ({lang})"}
            for lang in ("en", "de", "fr")
        },
        "descriptions": {
            lang: {"language": lang, "value": f"synthetic test entity number {i}"}
            for lang in ("en", "de")
        },
        "claims": claims,
    }


def write_dump(path: str, n: int) -> None:
    with open(path, "w") as f:
        f.write("[\n")
        for i in range(n):
            f.write(json.dumps(entity(i), separators=(",", ":")))
            f.write(",\n" if i < n - 1 else "\n")
        f.write("]\n")


if __name__ == "__main__":
    write_dump(sys.argv[1], int(sys.argv[2]))
