"""Deterministic CDC event fixture (FIXTURES.md §1) + pure-Python fold
oracle for property testing the engine's state reconstruction.

The canonical smoke subset mirrors the reference's only documented
correctness procedure — three escalating put-items on key
``(864732, Adam)`` then a REMOVE (``/root/reference/README.md:43-56``).
Around it, a seeded generator produces valid per-key histories
(INSERT -> MODIFY* -> optional REMOVE -> possibly re-INSERT) so
latest-state (SURVEY §2 B6) has a well-defined fold oracle.
"""

from __future__ import annotations

import json
import random
from dataclasses import dataclass, field

BASE_TS = 1704067200.0  # 2024-01-01T00:00:00Z

DESIGNATIONS = [
    "Architect",
    "Sr. Architect",
    "Developer Advocate",
    "Engineer",
    "Manager",
    "Director",
]


def _attr_s(v: str) -> dict:
    return {"S": v}


def _image(id_: str, name: str, rng: random.Random) -> dict:
    """A typed AttributeValue item image with the fixture attribute set."""
    return {
        "id": _attr_s(id_),
        "name": _attr_s(name),
        "Designation": _attr_s(rng.choice(DESIGNATIONS)),
        "salary": {"N": str(rng.randint(50_000, 250_000))},
        "active": {"BOOL": "true" if rng.random() < 0.8 else "false"},
        "tags": {"L": json.dumps(sorted(rng.sample(["a", "b", "c", "d"], 2)))},
        "address": {"M": json.dumps({"city": f"city{rng.randint(0, 9)}", "zip": str(rng.randint(10000, 99999))})},
    }


@dataclass
class CdcEvent:
    event_id: str
    event_name: str
    approx_ts: float
    keys: dict
    new_image: dict | None
    old_image: dict | None
    seq: int = 0

    def to_json(self) -> str:
        return json.dumps(
            {
                "eventID": self.event_id,
                "eventName": self.event_name,
                "dynamodb": {
                    "ApproximateCreationDateTime": self.approx_ts,
                    "Keys": self.keys,
                    "NewImage": self.new_image,
                    "OldImage": self.old_image,
                },
            }
        )


@dataclass
class CdcFixture:
    events: list[CdcEvent] = field(default_factory=list)

    def json_lines(self) -> list[str]:
        return [e.to_json() for e in self.events]

    def fold_state(self) -> dict[tuple[str, str], dict[str, str]]:
        """The trivial oracle: apply events in (approx_ts, seq) order.

        Returns flattened string attrs per live key — exactly what
        ``reconstruct_table`` must produce.
        """
        state: dict[tuple[str, str], dict[str, str]] = {}
        for e in sorted(self.events, key=lambda e: (e.approx_ts, e.seq)):
            if e.event_name not in ("INSERT", "MODIFY", "REMOVE"):
                continue  # error-routed, never reaches the lake
            k = (e.keys["id"]["S"], e.keys["name"]["S"])
            if e.event_name == "REMOVE":
                state.pop(k, None)
            else:
                img = e.new_image or {}
                state[k] = {a: next(iter(v.values())) for a, v in img.items()}
        return state


def canonical_readme_sequence(start_seq: int = 0) -> list[CdcEvent]:
    """README.md:43-56: INSERT Architect -> MODIFY Sr. Architect ->
    MODIFY Developer Advocate, then one REMOVE."""
    keys = {"id": _attr_s("864732"), "name": _attr_s("Adam")}
    evs = []
    images = []
    for i, desig in enumerate(["Architect", "Sr. Architect", "Developer Advocate"]):
        img = {**keys, "Designation": _attr_s(desig)}
        images.append(img)
        evs.append(
            CdcEvent(
                event_id=f"readme-{i}",
                event_name="INSERT" if i == 0 else "MODIFY",
                approx_ts=BASE_TS + i * 60,
                keys=keys,
                new_image=img,
                old_image=images[i - 1] if i else None,
                seq=start_seq + i,
            )
        )
    evs.append(
        CdcEvent(
            event_id="readme-3",
            event_name="REMOVE",
            approx_ts=BASE_TS + 3 * 60,
            keys=keys,
            new_image=None,
            old_image=images[-1],
            seq=start_seq + 3,
        )
    )
    return evs


def generate_fixture(
    n_keys: int = 300,
    n_events: int = 2000,
    unknown_rate: float = 0.01,
    seed: int = 42,
    hours: int = 48,
) -> CdcFixture:
    """Seeded random histories over ``n_keys`` keys spread across
    ``hours`` hourly partitions, with a sprinkle of unknown events
    (e.g. TTL_DELETE) to exercise error routing (A8)."""
    rng = random.Random(seed)
    fixture = CdcFixture()
    fixture.events.extend(canonical_readme_sequence())
    live: dict[int, dict | None] = {}  # key index -> last image or None
    names = [f"user{k}" for k in range(n_keys)]
    seq = 100
    span = hours * 3600.0
    times = sorted(rng.uniform(0, span) for _ in range(n_events))
    for t in times:
        k = rng.randrange(n_keys)
        id_, name = str(100000 + k), names[k]
        keys = {"id": _attr_s(id_), "name": _attr_s(name)}
        prev = live.get(k)
        if rng.random() < unknown_rate:
            ev_name = "TTL_DELETE"
            new, old = None, prev
        elif prev is None:
            ev_name = "INSERT"
            new, old = _image(id_, name, rng), None
            live[k] = new
        elif rng.random() < 0.12:
            ev_name = "REMOVE"
            new, old = None, prev
            live[k] = None
        else:
            ev_name = "MODIFY"
            new, old = _image(id_, name, rng), prev
            live[k] = new
        fixture.events.append(
            CdcEvent(
                event_id=f"ev-{seq}",
                event_name=ev_name,
                approx_ts=BASE_TS + t,
                keys=keys,
                new_image=new,
                old_image=old,
                seq=seq,
            )
        )
        seq += 1
    return fixture
