#!/usr/bin/env python
"""Derive the registry PRIORITY tuple from the driver's CORRECTNESS
artifacts — mechanizing the rotation rule so it can never be violated
by hand again (round-8 VERDICT "Next round" #2).

Rule (documented at ``registry.py:PRIORITY`` since round 6):

1. names with NO driver row in any ``CORRECTNESS_r*.json`` lead —
   the driver's 50-slot window must prove them first;
2. proven names follow in staleness order — ascending latest-proof
   round — so the stalest re-proof is always nearest the window and
   nothing in the tail is ever staler than anything inside it (the
   ``tests/test_registry.py`` ratchet).

The sort is STABLE with the previously committed tuple as the
baseline, so ties keep their existing order and the derivation does
not depend on Python import order.

``python scripts/rotate_window.py`` prints the derived tuple as Python
source ready to paste into ``registry.py``.  ``--check`` instead
compares the committed PRIORITY against the derivation and exits 1 on
drift — the same comparison ``tests/test_registry.py::
test_priority_matches_derivation`` runs in CI.  When a new
``CORRECTNESS_r{N}.json`` lands, the derivation shifts and the check
goes red until the regenerated tuple is committed: red means "run me",
not "debug me".

Names registered AFTER a rotation (mid-round additions) are deliberately
absent from PRIORITY — ``registry._ordered`` orders them after every
listed name, behind the window, per the r5–r8 precedent; they join the
derivation at the next rotation.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

MANIFEST = "artifacts_manifest.json"


def manifest_round(root: Path = ROOT) -> int:
    """The latest driver round the committed tree has rotated in.
    Ratchets read only artifacts <= this round (round-12 VERDICT #3:
    the driver drops CORRECTNESS_r{N}/bench artifacts AFTER the
    builder's final commit, so un-pinned ratchets were red at judging
    time three rounds running for work the builder could not have
    done)."""
    p = root / MANIFEST
    if not p.exists():
        return 10**9  # no manifest: legacy behavior, read everything
    return int(json.loads(p.read_text())["round"])


def available_rounds(root: Path = ROOT) -> list[int]:
    return sorted(
        int(re.search(r"r(\d+)", p.stem).group(1))
        for p in root.glob("CORRECTNESS_r*.json")
    )


def load_proofs(root: Path = ROOT, max_round: int | None = None) -> dict[str, int]:
    """name -> latest round with a driver CORRECTNESS row (any verdict:
    a recorded row is a driver visit; failures still count as fresher
    than never-visited). ``max_round`` caps which artifacts count —
    gating callers pass ``manifest_round()`` so artifacts the driver
    dropped after the last commit are invisible to them.

    Names in the manifest's ``reprove_first`` list are treated as
    UNPROVEN (dropped from the map): the builder restructured their
    plan AFTER their latest driver proof, so that proof attests the
    OLD plan and the rotation must put them back inside the window
    (r17 VERDICT #2/#4).  The list is committed alongside PRIORITY, so
    ``--check`` and the ratchet test derive the same order; rotation
    generation clears it once the next CORRECTNESS artifact lands
    (the same lifecycle as ``driver_floor_exclude``)."""
    proofs: dict[str, int] = {}
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", p.stem).group(1))
        if max_round is not None and rnd > max_round:
            continue
        for name in json.loads(p.read_text()):
            proofs[name] = max(proofs.get(name, 0), rnd)
    mp = root / MANIFEST
    if mp.exists():
        for name in json.loads(mp.read_text()).get("reprove_first", []):
            proofs.pop(name, None)
    return proofs


def derive_priority(
    baseline: list[str], proofs: dict[str, int]
) -> list[str]:
    """Pure derivation: a STABLE sort of ``baseline`` by latest proof
    round, never-proven names keyed below every round so they lead.
    Stability makes the tie-break the baseline's own order — for
    ``--check`` the baseline is the committed PRIORITY itself (so the
    check asserts exactly the invariant: already-sorted by staleness),
    which keeps the derivation independent of Python import order
    (QUERIES insertion order shifts when a test imports an operator
    module before ``load_all()`` — the round-9 lesson)."""
    return sorted(baseline, key=lambda n: proofs.get(n, -1))


def generation_baseline() -> list[str]:
    """Committed PRIORITY first (preserves prior tie-breaks), then any
    names registered since the last rotation, in registration order."""
    from dynamodb_streaming_datalake_spark import registry

    registry.load_all()
    listed = set(registry.PRIORITY)
    return list(registry.PRIORITY) + [
        n for n in registry.QUERIES if n not in listed
    ]


def main(argv: list[str]) -> int:
    pinned = manifest_round()
    newest = max(available_rounds(), default=0)
    if "--check" in argv:
        from dynamodb_streaming_datalake_spark.registry import PRIORITY

        proofs = load_proofs(max_round=pinned)
        # Mid-round registrations are allowed to be absent from
        # PRIORITY (they queue behind the window); the committed tuple
        # must already be staleness-sorted on its own members.
        expect = derive_priority(list(PRIORITY), proofs)
        if list(PRIORITY) != expect:
            diffs = [
                (i, a, b)
                for i, (a, b) in enumerate(zip(PRIORITY, expect))
                if a != b
            ]
            print(
                f"PRIORITY drift at {len(diffs)} positions; first: "
                f"{diffs[0] if diffs else (len(PRIORITY), len(expect))}"
            )
            print("regenerate with: python scripts/rotate_window.py")
            return 1
        print(f"PRIORITY matches derivation ({len(PRIORITY)} names)")
        if newest > pinned:
            print(
                f"NOTICE: rotation pending — CORRECTNESS_r{newest}.json is "
                f"newer than the manifest (r{pinned}); run "
                f"`python scripts/rotate_window.py` to rotate it in"
            )
        return 0
    # Generation bumps the manifest to the newest artifact on disk so
    # rotation and pin-advance are one mechanical step at round start.
    if newest > pinned:
        mp = ROOT / MANIFEST
        doc = json.loads(mp.read_text())
        doc["round"] = newest
        # A floor exclusion exists to stop a PRE-fix driver timing from
        # becoming a budget floor.  The bench artifact being rotated in
        # was measured against the POST-fix plan, so the exclusion's
        # justification ends here — clear it rather than letting the
        # escape hatch silently outlive its reason (r13 ADVICE).
        stale_excl = doc.get("driver_floor_exclude", [])
        if stale_excl:
            doc["driver_floor_exclude"] = []
            print(
                f"# cleared driver_floor_exclude {stale_excl}: the r{newest} "
                f"bench measured the post-fix plans; re-add (with a fresh "
                f"reason) only alongside a NEW deliberate speedup",
                file=sys.stderr,
            )
        stale_reprove = doc.get("reprove_first", [])
        if stale_reprove:
            doc["reprove_first"] = []
            print(
                f"# cleared reprove_first ({len(stale_reprove)} names): the "
                f"r{newest} window has now had its shot at them; re-add only "
                f"alongside a NEW post-proof restructuring",
                file=sys.stderr,
            )
        mp.write_text(json.dumps(doc, indent=2) + "\n")
        print(
            f"# manifest bumped r{pinned} -> r{newest} ({MANIFEST})",
            file=sys.stderr,
        )
        pinned = newest
    proofs = load_proofs(max_round=pinned)
    derived = derive_priority(generation_baseline(), proofs)
    latest = max(proofs.values(), default=0)
    n_unproven = sum(1 for n in derived if n not in proofs)
    print(f"# PRIORITY derived by scripts/rotate_window.py from")
    print(f"# CORRECTNESS_r*.json (latest: r{latest}).  Do not hand-order;")
    print(f"# regenerate after each driver round.  Derivation: the")
    print(f"# {n_unproven} never-driver-proven names lead, then proofs")
    print(f"# ascending by round (stable tie-break: prior order).")
    print("PRIORITY: tuple[str, ...] = (")
    prev: object = ...
    for n in derived:
        tag = proofs.get(n)
        if tag != prev:
            label = "never driver-proven" if tag is None else f"proven r{tag}"
            print(f"    # -- {label} --")
            prev = tag
        print(f'    "{n}",')
    print(")")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
