"""Synthetic wikidata-dump generator: every dispatch arm, corrupt lines,
framing noise — deterministic in (n, shards).

Shared by the volume test (tests/test_etl_scale.py) and the benchmark's
ETL timing (bench.py), so the production bench does not depend on the
test tree being importable.
"""

from __future__ import annotations

import json
import os

N = 60_000
SHARDS = 8
CORRUPT_EVERY = 997  # i % 997 == 0 → the line is malformed JSON

# i % 10 → claim template; value_type it must land in (None = dropped).
TEMPLATE_TABLE = {
    0: "string",
    1: "entity",
    2: "coordinates",
    3: "quantity",
    4: "time",
    5: "none",  # novalue snak
    6: "unknown",  # somevalue snak
    7: None,  # deprecated rank → dropped before dispatch
    8: "string",  # monolingualtext
    9: "none",  # multilingualtext without English → presence row
}


def make_claim(i: int) -> dict:
    t = i % 10
    snak: dict = {"snaktype": "value", "property": "P31", "datatype": "x"}
    rank = "normal"
    if t == 0:
        snak["datavalue"] = {"type": "string", "value": f"s-{i}"}
    elif t == 1:
        snak["datavalue"] = {
            "type": "wikibase-entityid",
            "value": {"entity-type": "item", "numeric-id": 5, "id": "Q5"},
        }
    elif t == 2:
        snak["datavalue"] = {
            "type": "globecoordinate",
            "value": {
                "latitude": 1.5,
                "longitude": 2.5,
                "precision": 0.1,
                "globe": "http://www.wikidata.org/entity/Q2",
            },
        }
    elif t == 3:
        snak["datavalue"] = {
            "type": "quantity",
            "value": {
                "amount": "+42.5",
                "lowerBound": "+40",
                "upperBound": "+45",
                "unit": "http://www.wikidata.org/entity/Q11573",
            },
        }
    elif t == 4:
        snak["datavalue"] = {
            "type": "time",
            "value": {"time": "+2001-12-31T00:00:00Z", "precision": 11},
        }
    elif t == 5:
        snak = {"snaktype": "novalue", "property": "P31"}
    elif t == 6:
        snak = {"snaktype": "somevalue", "property": "P31"}
    elif t == 7:
        snak["datavalue"] = {"type": "string", "value": "dead"}
        rank = "deprecated"
    elif t == 8:
        snak["datavalue"] = {
            "type": "monolingualtext",
            "value": {"text": f"m-{i}", "language": "en"},
        }
    else:
        snak["datavalue"] = {"type": "multilingualtext", "value": {"texts": {"fr": "bonjour"}}}
    return {"mainsnak": snak, "rank": rank}


def write_dump(root: str, n: int = N, shards: int = SHARDS) -> int:
    """Shard files, wrapped in [ ] with trailing commas (dump framing).
    Returns total bytes."""
    os.makedirs(root)
    per = n // shards
    total = 0
    for s in range(shards):
        path = os.path.join(root, f"shard-{s}.json")
        with open(path, "w") as f:
            f.write("[\n")
            for j in range(per):
                i = s * per + j
                if i % CORRUPT_EVERY == 0:
                    f.write('{"id": "Q broken...,\n')
                    continue
                ent = {
                    "id": f"Q{i + 1}",
                    "type": "item",
                    "labels": {"en": {"language": "en", "value": f"label {i}"}},
                    "descriptions": {},
                    "claims": {"P31": [make_claim(i)]},
                }
                f.write(json.dumps(ent) + ",\n")
            f.write("]\n")
        total += os.path.getsize(path)
    return total
