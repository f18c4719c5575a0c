"""Generate the Wikidata-style entity-dump fixture (FIXTURES.md §A).

Covers every ClaimValueData arm of the reference's type mapping
(/root/reference/src/value.rs:201-261), every id kind (id.rs:6-24),
deprecated-rank drops (main.rs:87), missing-English nulls (main.rs:82-83),
and the framing edge cases (main.rs:188-204): leading '[', trailing ']',
trailing commas, a blank line, a malformed-JSON line.

Run: python tests/fixtures/gen_wd_dump.py  → writes wd_dump.ndjson here.
"""

from __future__ import annotations

import json
import os


def snak(datatype: str, dv_type: str, value, snaktype: str = "value", prop: str = "P1"):
    s = {"snaktype": snaktype, "property": prop, "datatype": datatype}
    if snaktype == "value":
        s["datavalue"] = {"value": value, "type": dv_type}
    return s


def claim(mainsnak, rank="normal"):
    return {"mainsnak": mainsnak, "rank": rank, "type": "statement"}


def entity(eid, etype="item", labels=None, descriptions=None, claims=None):
    def lt(m):
        return {k: {"language": k, "value": v} for k, v in (m or {}).items()}

    return {
        "id": eid,
        "type": etype,
        "labels": lt(labels),
        "descriptions": lt(descriptions),
        "claims": claims or {},
    }


ENT = "wikibase-entityid"


def eidv(kind, num, id_str):
    return {"entity-type": kind, "numeric-id": num, "id": id_str}


ENTITIES = [
    # Q1: full meta + item claim + time claim (preferred rank kept)
    entity(
        "Q1",
        labels={"en": "universe", "de": "Universum"},
        descriptions={"en": "totality of everything"},
        claims={
            "P31": [claim(snak("wikibase-item", ENT, eidv("item", 42, "Q42"), prop="P31"))],
            "P580": [
                claim(
                    snak(
                        "time",
                        "time",
                        {"time": "+1995-01-01T00:00:00Z", "precision": 11,
                         "calendarmodel": "http://www.wikidata.org/entity/Q1985727"},
                        prop="P580",
                    ),
                    rank="preferred",
                )
            ],
        },
    ),
    # Q2: NO English label (German only) → NULL label; quantity with bounds+unit
    entity(
        "Q2",
        labels={"de": "Berg"},
        claims={
            "P2044": [
                claim(
                    snak(
                        "quantity",
                        "quantity",
                        {"amount": "+8848", "lowerBound": "+8847", "upperBound": "+8849",
                         "unit": "http://www.wikidata.org/entity/Q11573"},
                        prop="P2044",
                    )
                )
            ]
        },
    ),
    # P31: property entity; novalue claim → none row
    entity(
        "P31",
        etype="property",
        labels={"en": "instance of"},
        claims={"P31": [claim(snak("wikibase-item", ENT, None, snaktype="novalue", prop="P31"))]},
    ),
    # L99: lexeme; form- and sense-valued claims → entity rows with F/S math
    entity(
        "L99",
        etype="lexeme",
        labels={"en": "run"},
        claims={
            "P5972": [claim(snak("wikibase-form", ENT, eidv("form", 99, "L99-F2"), prop="P5972"))],
            "P5973": [claim(snak("wikibase-sense", ENT, eidv("sense", 99, "L99-S1"), prop="P5973"))],
        },
    ),
    # Q5: every string-ish datatype → string table; plus one deprecated (dropped)
    entity(
        "Q5",
        labels={"en": "strings"},
        claims={
            "P10": [claim(snak("string", "string", "plain"))],
            "P11": [claim(snak("commonsMedia", "string", "photo.jpg"))],
            "P12": [claim(snak("external-id", "string", "ID123"))],
            "P13": [claim(snak("url", "string", "http://example.org"))],
            "P14": [claim(snak("math", "string", "E = mc^2"))],
            "P15": [claim(snak("geo-shape", "string", "Data:shape.map"))],
            "P16": [claim(snak("musical-notation", "string", "\\relative c'"))],
            "P17": [claim(snak("tabular-data", "string", "Data:table.tab"))],
            "P18": [claim(snak("string", "string", "you should not see me"), rank="deprecated")],
        },
    ),
    # Q6: monolingualtext (language discarded) + multilingual en-pick + miss
    entity(
        "Q6",
        labels={"en": "texts"},
        claims={
            "P1476": [
                claim(snak("monolingualtext", "monolingualtext",
                           {"text": "Don Quixote", "language": "es"}, prop="P1476"))
            ],
            "P20": [claim(snak("multilingual", "multilingualtext", {"texts": {"en": "Hello", "fr": "Bonjour"}}, prop="P20"))],
            # no English → none-table presence row, NOT a null string row
            "P21": [claim(snak("multilingual", "multilingualtext", {"texts": {"fr": "Bonjour"}}, prop="P21"))],
        },
    ),
    # Q7: coordinates on Earth and on the Moon (globe Qid encoded)
    entity(
        "Q7",
        labels={"en": "places"},
        claims={
            "P625": [
                claim(snak("globe-coordinate", "globecoordinate",
                           {"latitude": 48.8584, "longitude": 2.2945, "precision": 0.0001,
                            "globe": "http://www.wikidata.org/entity/Q2"}, prop="P625")),
                claim(snak("globe-coordinate", "globecoordinate",
                           {"latitude": 0.6875, "longitude": 23.4333, "precision": 0.01,
                            "globe": "http://www.wikidata.org/entity/Q405"}, prop="P625")),
            ]
        },
    ),
    # Q8: quantity WITHOUT bounds/unit → nullable columns NULL
    entity(
        "Q8",
        labels={"en": "bare quantity"},
        claims={"P1082": [claim(snak("quantity", "quantity", {"amount": "+42", "unit": "1"}, prop="P1082"))]},
    ),
    # Q9: normal time + far-historical time (timestamp overflow → time NULL, raw kept)
    entity(
        "Q9",
        labels={"en": "times"},
        claims={
            "P585": [
                claim(snak("time", "time", {"time": "+2001-12-31T00:00:00Z", "precision": 11}, prop="P585")),
                claim(snak("time", "time", {"time": "-13798000000-00-00T00:00:00Z", "precision": 3}, prop="P585")),
            ]
        },
    ),
    # Q10: somevalue → unknown row; deprecated novalue → dropped even from none
    entity(
        "Q10",
        labels={"en": "unknowns"},
        claims={
            "P40": [claim(snak("wikibase-item", ENT, None, snaktype="somevalue", prop="P40"))],
            "P41": [claim(snak("wikibase-item", ENT, None, snaktype="novalue", prop="P41"), rank="deprecated")],
        },
    ),
    # Q11: preferred + normal on the same property → both kept
    entity(
        "Q11",
        labels={"en": "ranked"},
        claims={
            "P50": [
                claim(snak("string", "string", "preferred-one", prop="P50"), rank="preferred"),
                claim(snak("string", "string", "normal-one", prop="P50"), rank="normal"),
            ]
        },
    ),
]


def main() -> None:
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "wd_dump.ndjson")
    lines = ["["]
    for i, e in enumerate(ENTITIES):
        lines.append(json.dumps(e, separators=(",", ":")) + ",")
        if i == 4:
            lines.append("")  # blank line mid-stream
        if i == 7:
            lines.append('{"id": "Q999", "labels": ')  # malformed JSON line
    # last real line WITHOUT trailing comma (valid JSON array tail), then ]
    lines[-1] = lines[-1].rstrip(",")
    lines.append("]")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(lines)} lines, {len(ENTITIES)} entities")


if __name__ == "__main__":
    main()
